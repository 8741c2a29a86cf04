#!/usr/bin/env python
"""Attention micro-benchmark: XLA vs the Pallas kernel across the
framework's production shapes (chained-iteration methodology, CLAUDE.md).

Run on TPU:  PYTHONPATH=. python scripts/bench_attention_shapes.py
"""

import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


# (name, b, h, sq, sk, d, bias_kind)
SHAPES = [
    ("mcan_ga_train", 64, 8, 100, 100, 64, "key"),      # known XLA win
    ("vit_backbone", 64, 12, 197, 197, 64, "key"),      # ViT-base stream
    ("bert_backbone", 64, 12, 256, 256, 64, "key"),     # mBERT question/backbone
    ("mmt_joint_384", 64, 8, 384, 384, 96, "full"),     # M4C joint stream
    ("mmt_joint_512", 64, 8, 512, 512, 96, "full"),
    ("mmt_joint_640", 32, 8, 640, 640, 96, "full"),
    ("long_768", 32, 8, 768, 768, 64, "key"),
]


def main():
    import jax
    import jax.numpy as jnp

    from openvivqa_tpu.ops.fused_attention import (
        fused_attention,
        fused_attention_packed,
    )

    results = []
    for name, b, h, sq, sk, d, bias_kind in SHAPES:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, h, sq, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, sk, d)).astype(np.float32))
        if bias_kind == "key":
            bias = np.zeros((b, 1, 1, sk), np.float32)
            bias[:, :, :, sk - sk // 10 :] = -10e4
        else:
            bias = np.zeros((b, 1, sq, sk), np.float32)
            bias[:, :, :, sk - sk // 10 :] = -10e4
        bias = jnp.asarray(bias)
        scale = 1.0 / float(np.sqrt(d))

        def xla_attn(q, k, v, bias):
            logits = (
                jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * scale
            ) + bias
            w = jax.nn.softmax(logits, axis=-1)
            return jnp.einsum("bhqk,bhkd->bhqd", w, v)

        def pallas_attn(q, k, v, bias):
            return fused_attention(q, k, v, bias, scale)

        def packed_attn(q, k, v, bias):
            # repack to the production layout outside the timed region is
            # not possible in the chain; time includes the transposes the
            # real call sites avoid (they feed raw projections)
            qp = jnp.transpose(q, (0, 2, 1, 3)).reshape(b, sq, h * d)
            kp = jnp.transpose(k, (0, 2, 1, 3)).reshape(b, sk, h * d)
            vp = jnp.transpose(v, (0, 2, 1, 3)).reshape(b, sk, h * d)
            out = fused_attention_packed(qp, kp, vp, bias, scale, h)
            return jnp.transpose(out.reshape(b, sq, h, d), (0, 2, 1, 3))

        out = {}
        for label, fn in (
            ("xla", xla_attn), ("pallas", pallas_attn), ("packed", packed_attn)
        ):
            @partial(jax.jit, static_argnames="n")
            def chain(q, k, v, bias, n, fn=fn):
                def body(c, _):
                    o = fn(q + c, k, v, bias)
                    return jnp.mean(o) * 1e-12, None
                c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return c

            n = 50
            try:
                float(chain(q, k, v, bias, 2))
                float(chain(q, k, v, bias, n))
                t0 = time.perf_counter()
                float(chain(q, k, v, bias, n))
                dt = (time.perf_counter() - t0) / n * 1e3
            except Exception as exc:  # noqa: BLE001
                out[label] = f"fail: {exc}"
                continue
            out[label] = round(dt, 3)
        def ratio(a, b_):
            return (
                round(a / b_, 3)
                if isinstance(a, float) and isinstance(b_, float)
                else None
            )

        results.append({"shape": name, "ms_xla": out.get("xla"),
                        "ms_pallas": out.get("pallas"),
                        "ms_packed": out.get("packed"),
                        "pallas_speedup": ratio(out.get("xla"), out.get("pallas")),
                        "packed_speedup": ratio(out.get("xla"), out.get("packed"))})
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
