#!/usr/bin/env python
"""On-chip validation of the Pallas dropout-attention kernel.

The TPU interpreter stubs the hardware PRNG with zeros, so these checks
need real hardware (any TPU backend):
  1. determinism per seed / divergence across seeds;
  2. rate=0 equals the plain packed kernel bit-for-bit;
  3. reverse-mode gradients vs directional finite differences (the Pallas
     backward regenerates the identical dropout mask from the same seed);
  4. fwd+bwd wall-clock vs the XLA dropout-attention path at the MMT
     production shape.

Run: PYTHONPATH=. python scripts/validate_dropout_kernel.py
Reference run (v5e, 2026-08-17): grads rel err 1.3-1.8%, XLA 5.28 ms vs
Pallas 2.90 ms fwd+bwd (1.82x); full 4-layer MMT train step 68.4 -> 46.9
ms (1.46x).
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from openvivqa_tpu.ops.fused_attention import (
        fused_attention_packed,
        fused_attention_packed_dropout,
    )

    assert jax.default_backend() == "tpu", "needs real TPU hardware"
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/openvivqa_xla_cache"
        )
    except Exception:  # noqa: BLE001
        pass

    b, h, L, d = 32, 8, 512, 96
    hd = h * d
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, L, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, L, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, L, hd)).astype(np.float32))
    bias_np = np.zeros((b, 1, L, L), np.float32)
    bias_np[:, :, :, L - 40:] = -10e4
    bias = jnp.asarray(bias_np)
    seed = jnp.asarray([42], jnp.int32)
    scale = 1.0 / np.sqrt(d)
    rate = 0.1

    o0 = fused_attention_packed_dropout(q, k, v, bias, seed, scale, h, rate)
    o0b = fused_attention_packed_dropout(q, k, v, bias, seed, scale, h, rate)
    o1 = fused_attention_packed_dropout(
        q, k, v, bias, jnp.asarray([43], jnp.int32), scale, h, rate
    )
    base = fused_attention_packed(q, k, v, bias, scale, h)
    rate0 = fused_attention_packed_dropout(q, k, v, bias, seed, scale, h, 0.0)
    assert bool(jnp.allclose(o0, o0b)), "not deterministic per seed"
    assert not bool(jnp.allclose(o0, o1)), "seed has no effect"
    assert float(jnp.max(jnp.abs(rate0 - base))) == 0.0, "rate 0 != packed"
    print("determinism / seed / rate-0 checks OK")

    cot = jnp.asarray(
        np.random.default_rng(5).normal(size=o0.shape).astype(np.float32)
    ) / o0.size

    def f(q, k, v):
        return jnp.sum(
            fused_attention_packed_dropout(q, k, v, bias, seed, scale, h, rate)
            * cot
        )

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    for idx, name in enumerate("qkv"):
        direction = jnp.asarray(
            np.random.default_rng(idx).normal(
                size=grads[idx].shape
            ).astype(np.float32)
        )
        eps = 0.05
        args = [q, k, v]
        ap = list(args)
        ap[idx] = args[idx] + eps * direction
        am = list(args)
        am[idx] = args[idx] - eps * direction
        num = float((f(*ap) - f(*am)) / (2 * eps))
        ana = float(jnp.vdot(grads[idx], direction))
        rel = abs(num - ana) / max(abs(num), 1e-9)
        print(f"d{name}: fd={num:.6e} vjp={ana:.6e} rel={rel:.4f}")
        assert rel < 0.1, f"gradient check failed for {name}"

    key = jax.random.PRNGKey(0)

    def xla_attn_drop(q, k, v, key):
        qh = q.reshape(b, L, h, d)
        kh = k.reshape(b, L, h, d)
        vh = v.reshape(b, L, h, d)
        logits = (
            jnp.einsum(
                "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
            )
            * scale
            + bias
        )
        w = jax.nn.softmax(logits, -1)
        keep = jax.random.bernoulli(key, 1 - rate, w.shape)
        w = jnp.where(keep, w / (1 - rate), 0.0)
        return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, L, hd)

    def pallas_attn_drop(q, k, v, seed):
        return fused_attention_packed_dropout(
            q, k, v, bias, seed, scale, h, rate
        )

    times = {}
    for label, fn, extra in (
        ("xla", xla_attn_drop, key), ("pallas", pallas_attn_drop, seed)
    ):
        @partial(jax.jit, static_argnames="n")
        def chain(q, k, v, extra, n, fn=fn):
            def body(c, _):
                def loss(q_):
                    return jnp.sum(fn(q_ + c, k, v, extra) ** 2) * 1e-12

                l, g = jax.value_and_grad(loss)(q)
                return l + jnp.mean(g) * 1e-12, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c

        n = 30
        float(chain(q, k, v, extra, n))
        t0 = time.perf_counter()
        float(chain(q, k, v, extra, n))
        times[label] = (time.perf_counter() - t0) / n * 1e3
        print(f"{label}: {times[label]:.3f} ms fwd+bwd")
    print(f"pallas speedup: {times['xla'] / times['pallas']:.2f}x")


if __name__ == "__main__":
    main()
