#!/usr/bin/env python
"""Attribute the MCAN train-step MFU gap (VERDICT r2 item 4).

Eval runs at ~0.47 MFU while the full train step sits at ~0.21; this script
measures where the backward pass loses it by timing chained variants on the
real chip (bench.py methodology: N dependent iterations inside one jitted
program, time a host fetch):

  eval        — forward only (the 0.47 anchor)
  fwd_loss    — forward + NLL loss (no grad)
  grad        — value_and_grad, no optimizer update
  train       — value_and_grad + Adam update (the 0.21 headline)
  train_nodrop— train step with dropout disabled end-to-end (mask cost)
  train_nolstm— same but UsualEmbedding instead of LSTMTextEmbedding
                (isolates the sequential-scan LSTM cost)

Prints one JSON line with samples/sec and MFU for each.

Findings (docs/TRAIN_MFU.md): threefry dropout masks were ~38% of the
step (regenerated in the backward); the production rbg streams moved the
full step 14.1 -> 9.4 ms (MFU 0.207 -> 0.295) against a measured
composite ceiling of ~0.31 at these reference-fixed dims.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _flops_of(compiled) -> float:
    try:
        cost = compiled.cost_analysis()
    except Exception:  # noqa: BLE001
        return 0.0
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0) or 0.0)


def build_model(text_arch: str):
    from openvivqa_tpu.builders import populate
    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.models.mcan import MCAN

    populate()

    class BenchVocab:
        padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
        total_answers = 300
        max_question_length = 16
        max_answer_length = 12
        word_embeddings = None

        def __len__(self):
            return 1000

    attn = {
        "ARCHITECTURE": "ScaledDotProductAttention",
        "HEAD": 8, "D_MODEL": 512, "D_KEY": 64, "D_VALUE": 64, "D_FF": 2048,
        "USE_AOA": False, "CAN_BE_STATEFUL": False, "DROPOUT": 0.1,
    }
    text = {
        "ARCHITECTURE": text_arch, "D_MODEL": 512, "D_EMBEDDING": 300,
        "DROPOUT": 0.1, "WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None,
    }
    config = ConfigNode(
        {
            "ARCHITECTURE": "MCAN", "D_MODEL": 512,
            "VISION_EMBEDDING": {
                "ARCHITECTURE": "FeatureEmbedding",
                "D_FEATURE": 1024, "D_MODEL": 512, "DROPOUT": 0.1,
            },
            "TEXT_EMBEDDING": text,
            "SELF_ENCODER": {
                "ARCHITECTURE": "Encoder", "D_MODEL": 512, "LAYERS": 3,
                "SELF_ATTENTION": attn,
            },
            "GUIDED_ENCODER": {
                "ARCHITECTURE": "GuidedAttentionEncoder", "D_MODEL": 512,
                "LAYERS": 3, "SELF_ATTENTION": attn, "GUIDED_ATTENTION": attn,
            },
            "VISION_ATTR_REDUCE": {"D_MODEL": 512, "DROPOUT": 0.1},
            "TEXT_ATTR_REDUCE": {"D_MODEL": 512, "DROPOUT": 0.1},
        }
    )
    return MCAN(config, BenchVocab()), BenchVocab()


def main():
    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(REPO, ".xla_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001
        pass

    peak = 197e12 if "v5" in jax.devices()[0].device_kind else None
    batch_size, n_regions = 64, 100
    rng = np.random.default_rng(0)
    results = {}

    for text_arch in ("LSTMTextEmbedding", "UsualEmbedding"):
        model, vocab = build_model(text_arch)
        batch = {
            "region_features": jnp.asarray(
                rng.normal(size=(batch_size, n_regions, 1024)).astype(np.float32)
            ),
            "question_tokens": jnp.asarray(
                rng.integers(4, len(vocab), size=(batch_size, 16)).astype(np.int32)
            ),
        }
        answers = jnp.asarray(
            rng.integers(0, 300, size=(batch_size,)).astype(np.int32)
        )
        variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
            jax.random.PRNGKey(0), batch
        )
        params = variables["params"]
        tx = optax.adam(1e-4, b1=0.9, b2=0.98)
        opt_state = tx.init(params)

        # production dropout keys (base_task.py): TPU hardware rbg
        # generator — threefry mask bits alone measured 1.78 ms/step here
        rng_impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
        base_key = jax.random.key(7, impl=rng_impl)

        def loss_fn(p, feats, dropout_rng, train=True):
            out = model.apply(
                {"params": p}, {**batch, "region_features": feats},
                train=train,
                rngs={"dropout": dropout_rng} if train else None,
            )
            onehot = jax.nn.one_hot(answers, out.shape[-1], dtype=out.dtype)
            return -jnp.mean(jnp.sum(out * onehot, axis=-1))

        variants = {}

        @partial(jax.jit, static_argnames="n")
        def eval_chain(params, batch, n):
            def body(c, _):
                out = model.apply(
                    {"params": params},
                    {**batch, "region_features": batch["region_features"] + c},
                    train=False,
                )
                return jnp.mean(out) * 1e-12, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return c

        variants["eval"] = (eval_chain, (params, batch))

        @partial(jax.jit, static_argnames="n")
        def fwd_loss_chain(params, batch, n):
            def body(c, i):
                feats = batch["region_features"] + c
                loss = loss_fn(
                    params, feats, jax.random.fold_in(base_key, i)
                )
                return loss * 1e-12, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(n))
            return c

        variants["fwd_loss"] = (fwd_loss_chain, (params, batch))

        @partial(jax.jit, static_argnames="n")
        def grad_chain(params, batch, n):
            def body(c, i):
                p, s = c
                feats = batch["region_features"] + s
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, feats, jax.random.fold_in(base_key, i)
                )
                # consume grads without an optimizer: tiny scaled add
                p = jax.tree.map(lambda a, g: a - 1e-20 * g, p, grads)
                return (p, loss * 1e-12), None

            c, _ = jax.lax.scan(body, (params, jnp.float32(0.0)), jnp.arange(n))
            return c[1]

        variants["grad"] = (grad_chain, (params, batch))

        @partial(jax.jit, static_argnames="n")
        def train_chain(params, opt_state, batch, n):
            def body(c, i):
                p, o, s = c
                feats = batch["region_features"] + s
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, feats, jax.random.fold_in(base_key, i)
                )
                updates, o = tx.update(grads, o, p)
                return (optax.apply_updates(p, updates), o, loss * 1e-12), None

            c, _ = jax.lax.scan(
                body, (params, opt_state, jnp.float32(0.0)), jnp.arange(n)
            )
            return c[2]

        variants["train"] = (train_chain, (params, opt_state, batch))

        @partial(jax.jit, static_argnames="n")
        def train_nodrop_chain(params, opt_state, batch, n):
            # dropout disabled end-to-end: the train-step ceiling if masks
            # and mask-apply ops were free
            def body(c, i):
                p, o, s = c
                feats = batch["region_features"] + s
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, feats, None, train=False
                )
                updates, o = tx.update(grads, o, p)
                return (optax.apply_updates(p, updates), o, loss * 1e-12), None

            c, _ = jax.lax.scan(
                body, (params, opt_state, jnp.float32(0.0)), jnp.arange(n)
            )
            return c[2]

        variants["train_nodrop"] = (train_nodrop_chain, (params, opt_state, batch))

        n = 50
        tag = "lstm" if text_arch == "LSTMTextEmbedding" else "nolstm"
        for name, (fn, args) in variants.items():
            if tag == "nolstm" and name not in ("eval", "train"):
                continue
            float(fn(*args, 2))
            compiled = fn.lower(*args, n).compile()
            float(compiled(*args))
            start = time.perf_counter()
            float(compiled(*args))
            elapsed = time.perf_counter() - start
            sps = batch_size * n / elapsed
            flops = _flops_of(compiled) * n
            mfu = flops / elapsed / peak if peak and flops else None
            results[f"{name}_{tag}"] = {
                "samples_per_sec": round(sps, 1),
                "mfu": round(mfu, 4) if mfu else None,
                "ms_per_step": round(1000 * elapsed / n, 3),
            }
            print(f"# {name}_{tag}: {results[f'{name}_{tag}']}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
