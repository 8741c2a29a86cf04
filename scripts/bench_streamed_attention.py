#!/usr/bin/env python
"""Key-streaming (flash-style) attention micro-benchmark: XLA vs the
streamed Pallas kernel at long-key shapes where the one-shot packed plan
exceeds VMEM (ROADMAP's named gap: >~640 keys at hd 768).

Chained-iteration methodology (CLAUDE.md: chain N dependent steps in one
jitted program; time a host fetch).

Run on TPU:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_streamed_attention.py
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


# (name, b, h, sq, sk, d, bias_kind) — streaming regime: packed not viable
SHAPES = [
    ("joint_768_hd768", 16, 12, 768, 768, 64, "key"),
    ("joint_1024_hd768", 16, 12, 1024, 1024, 64, "key"),
    ("joint_1024_hd512", 16, 8, 1024, 1024, 64, "full"),
    ("joint_1536_hd768", 8, 12, 1536, 1536, 64, "key"),
    ("cross_512q_2048k", 8, 12, 512, 2048, 64, "key"),
]


def main():
    import jax
    import jax.numpy as jnp

    from openvivqa_tpu.ops.fused_attention import (
        fused_attention_packed_streamed,
        packed_attention_viable,
        plan_streamed_blocks,
        streamed_attention_viable,
    )

    results = []
    for name, b, h, sq, sk, d, bias_kind in SHAPES:
        hd = h * d
        viable = streamed_attention_viable(sq, sk, hd, h)
        packed_ok = packed_attention_viable(sq, sk, hd, h)
        plan = plan_streamed_blocks(sq, sk, hd, h)
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, sq, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, sk, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, sk, hd)).astype(np.float32))
        if bias_kind == "key":
            bias = np.zeros((b, 1, 1, sk), np.float32)
        else:
            bias = np.zeros((b, 1, sq, sk), np.float32)
        bias[..., sk - sk // 10 :] = -10e4
        bias = jnp.asarray(bias)
        scale = 1.0 / float(np.sqrt(d))

        def xla_attn(q, k, v, bias):
            qh = q.reshape(b, sq, h, d)
            kh = k.reshape(b, sk, h, d)
            vh = v.reshape(b, sk, h, d)
            logits = (
                jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                           preferred_element_type=jnp.float32) * scale
            ) + bias
            w = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, sq, hd)

        def streamed_attn(q, k, v, bias):
            return fused_attention_packed_streamed(q, k, v, bias, scale, h)

        out = {}
        if viable:
            fns = (("xla", xla_attn), ("streamed", streamed_attn))
        else:
            fns = (("xla", xla_attn),)
        for label, fn in fns:
            @partial(jax.jit, static_argnames="n")
            def chain(q, k, v, bias, n, fn=fn):
                def body(c, _):
                    o = fn(q + c, k, v, bias)
                    return jnp.mean(o) * 1e-12, None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c

            n = 30
            try:
                float(chain(q, k, v, bias, 2))
                float(chain(q, k, v, bias, n))
                t0 = time.perf_counter()
                float(chain(q, k, v, bias, n))
                dt = (time.perf_counter() - t0) / n * 1e3
            except Exception as exc:  # noqa: BLE001
                out[label] = f"fail: {type(exc).__name__}: {str(exc)[:200]}"
                continue
            out[label] = round(dt, 3)

        ms_xla, ms_str = out.get("xla"), out.get("streamed")
        speedup = (
            round(ms_xla / ms_str, 3)
            if isinstance(ms_xla, float) and isinstance(ms_str, float)
            else None
        )
        results.append({
            "shape": name, "packed_viable": packed_ok, "plan": plan,
            "ms_xla": ms_xla, "ms_streamed": ms_str, "speedup": speedup,
        })
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
