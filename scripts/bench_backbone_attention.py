#!/usr/bin/env python
"""Micro-bench: T5 / DeBERTa frozen-backbone forwards with the 2-bias
packed attention kernel on vs off (VERDICT r2 item 5).

These stacks carry per-head biases (T5 relative-position table, DeBERTa
disentangled c2p+p2c terms) that the head-shared packed kernel could not
take; the fused_attention_packed_2bias variant adds the per-head operand.
Run on the real chip: OPENVIVQA_FUSED_ATTENTION=0/unset toggles the path.

Usage: python scripts/bench_backbone_attention.py
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench(fn_factory, args, n=30):
    import jax

    fn = fn_factory()
    float(np.asarray(fn(*args, 2)).ravel()[0])
    compiled = fn.lower(*args, n).compile()
    float(np.asarray(compiled(*args)).ravel()[0])
    start = time.perf_counter()
    float(np.asarray(compiled(*args)).ravel()[0])
    return time.perf_counter() - start


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".xla_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001
        pass

    from openvivqa_tpu.models.modules.deberta import DebertaV2EncoderStack
    from openvivqa_tpu.models.modules.t5 import T5EncoderStack

    rng = np.random.default_rng(0)
    results = {}

    # ---- T5 (mT5-small dims at the ViT-mT5 wrapper's 256-token stream) ---
    bs, length = 32, 256
    t5 = T5EncoderStack(
        vocab_size=1000, d_model=512, num_layers=8, num_heads=6,
        d_kv=64, d_ff=1024, gated_act=True, act_fn="gelu_new", dropout=0.0,
    )
    tokens = jnp.asarray(rng.integers(0, 1000, size=(bs, length)).astype(np.int32))
    t5_vars = jax.jit(t5.init)(jax.random.PRNGKey(0), tokens)

    def t5_factory():
        @partial(jax.jit, static_argnames="n")
        def chain(params, tokens, n):
            def body(c, _):
                out = t5.apply({"params": params}, tokens, train=False)
                return c + jnp.mean(out) * 1e-12, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        return chain

    # ---- DeBERTa-v3-base dims at 197 tokens (ViT-stream length) ----------
    d_bs, d_len = 16, 197
    deberta = DebertaV2EncoderStack(
        vocab_size=1000, hidden_size=768, num_layers=4, num_heads=12,
        intermediate_size=3072, position_buckets=256, share_att_key=True,
        norm_rel_ebd="layer_norm", dropout=0.0,
    )
    d_tokens = jnp.asarray(
        rng.integers(0, 1000, size=(d_bs, d_len)).astype(np.int32)
    )
    d_vars = jax.jit(deberta.init)(jax.random.PRNGKey(1), d_tokens)

    def deberta_factory():
        @partial(jax.jit, static_argnames="n")
        def chain(params, tokens, n):
            def body(c, _):
                out = deberta.apply({"params": params}, tokens, train=False)
                return c + jnp.mean(out) * 1e-12, None

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return c

        return chain

    n = 30
    for name, factory, args in (
        ("t5_256", t5_factory, (t5_vars["params"], tokens)),
        ("deberta_197", deberta_factory, (d_vars["params"], d_tokens)),
    ):
        os.environ["OPENVIVQA_FUSED_ATTENTION"] = "0"
        xla = bench(factory, args, n)
        os.environ.pop("OPENVIVQA_FUSED_ATTENTION", None)
        fused = bench(factory, args, n)
        results[name] = {
            "xla_ms": round(1000 * xla / n, 3),
            "fused_ms": round(1000 * fused / n, 3),
            "speedup": round(xla / fused, 3),
        }
        print(f"# {name}: {results[name]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
