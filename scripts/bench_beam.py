#!/usr/bin/env python
"""Beam-search eval throughput on one chip (IterativeMCAN, beam 3).

Companion to bench.py's MCAN-eval headline; measures the full generative
path: encode -> beam expand -> 12-step jitted lax.scan decode.  Same
methodology (chained dependent iterations in one XLA program + host fetch,
long chain to amortize the single dispatch round-trip).

Run: PYTHONPATH=. python scripts/bench_beam.py [n_chain]
"""

import json
import sys
import time

import numpy as np


def main(n_chain: int = 60):
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/openvivqa_xla_cache")
    except Exception:  # noqa: BLE001
        pass

    sys.path.insert(0, ".")
    import __graft_entry__ as graft
    from openvivqa_tpu.training.decode import generate

    model = graft._iterative_mcan(d_model=512, layers=3, heads=8)
    vocab = model.vocab
    batch_size, beam = 32, 3
    batch = graft._example_batch(batch_size, vocab, n_regions=36, d_feature=64)

    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )

    from functools import partial

    @partial(jax.jit, static_argnames="n")
    def beam_chain(params, batch, n):
        def body(carry, _):
            feats = batch["region_features"] + carry
            outs, _ = generate(
                model, {"params": params}, {**batch, "region_features": feats},
                batch_size=batch_size, beam_size=beam,
            )
            return jnp.sum(outs).astype(jnp.float32) * 1e-12, None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    params = variables["params"]
    t0 = time.time()
    float(beam_chain(params, batch, 2))
    print(f"# compile: {time.time() - t0:.1f}s", file=sys.stderr)
    float(beam_chain(params, batch, n_chain))
    start = time.perf_counter()
    float(beam_chain(params, batch, n_chain))
    elapsed = time.perf_counter() - start
    sps = batch_size * n_chain / elapsed
    print(
        json.dumps(
            {
                "metric": "iterative_mcan_beam3_eval_samples_per_sec_per_chip",
                "value": round(sps, 2),
                "unit": "samples/sec/chip",
                "ms_per_batch": round(elapsed / n_chain * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
