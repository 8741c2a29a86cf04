#!/usr/bin/env python
"""Headline benchmark: MCAN eval/train throughput + beam decode + MFU.

North-star metric (BASELINE.md, driver-defined): VQA eval samples/sec/chip,
target >= 10x the reference CPU eval throughput.  The reference anchors
were measured with scripts/measure_reference_baseline.py at the same dims
(MCAN @ mcan.yaml: d_model=512, 3 SA + 3 GA layers, batch 64, 100 regions x
1024-d features) and stored in BASELINE_MEASURED.json.

Prints ONE JSON line.  Required driver keys:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
plus honest-performance extras (VERDICT r1 item 5):
  train_samples_per_sec / vs_baseline_train  — full jitted train step
    (loss + grads + Adam) chained sequentially like a real epoch;
  beam_samples_per_sec / vs_baseline_beam — IterativeMCAN beam-3
    generative eval vs the reference's beam loop on torch CPU;
  mmf_greedy_samples_per_sec / vs_baseline_mmf_greedy — MMF_M4C greedy
    decode (incremental projected-KV path) vs the reference's max_iter
    full-re-encode loop on torch CPU at the same dims;
  iterative_greedy_samples_per_sec / vs_baseline_iterative_greedy —
    MMF_IterativeM4C greedy decode (the kernel-E fused cross-attention
    step, VERDICT r4 item 5) vs the reference's max_iter decoder-re-run
    loop on torch CPU at the same dims;
  mmt_train_samples_per_sec / vs_baseline_mmt_train — 4-layer 768-wide
    MMT-dims train step with attention dropout 0.1 (exercises the Pallas
    dropout-attention pair) vs the reference MMT's HF BertEncoder class
    trained on torch CPU at the same dims;
  eval_mfu / train_mfu — XLA cost-analysis FLOPs over wall-clock against
    the chip's bf16 peak (TPU matmuls at default precision execute as
    bf16 passes, CLAUDE.md measured facts).

Fault tolerance (VERDICT r2 item 1; rebuilt per VERDICT r4 item 1 after
THREE consecutive null driver artifacts — the r4 post-mortem measured the
tunnel wedge clearing in 96s while the old 2-attempt canary gave up at
~165s with ~1,335s of the driver's window unspent):
  * The whole run is budgeted against ONE wall-clock deadline
    (TOTAL_WINDOW_S, set under the driver's ~1,500s kill window).
  * A ~90s CANARY subprocess (jax.devices() + one 1-element add + host
    fetch) runs in a PERSISTENCE LOOP: keep probing with short sleeps
    until it passes or until only MIN_WORKER_RESERVE_S of the window
    remains (a warm full bench takes ~4.5 min; the wedge is
    intermittent/held-chip-shaped and has been measured clearing after
    the old policy had already given up).
  * On canary pass, the measurement worker runs in a RETRY LADDER SIZED
    TO THE REMAINING WINDOW (fresh subprocess == fresh TPU client): each
    attempt gets ~60% of what is left, so a late canary pass still gets
    one real attempt and an early pass gets three.
  * The worker streams each metric as a "#PARTIAL {json}" line the
    moment it is measured; the orchestrator persists partials to a
    scratch file so a retry attempt skips already-measured sections, and
    sections are ordered primary-metric-first so a killed attempt still
    lands the headline numbers.
  * The final line is ALWAYS one parseable JSON object; unmeasured
    metrics are null, never 0.0 (a measured zero and "no measurement"
    must not be conflated).

Cache warmth (VERDICT r3 item 2): `python bench.py --precompile` compiles
every chain (both warmup and full-length variants) without the timed
passes, so `.xla_cache/` matches HEAD's HLO.  Run it after the last commit
of a round that touches openvivqa_tpu/ model/ops code; a cold compile of
the five chains takes >10 minutes on this 1-CPU host and cannot fit the
driver window.  The XLA compile cache lives in-repo (.xla_cache/) because
/tmp is wiped between rounds.
"""

import json
import os
import queue
import subprocess
import sys
import tempfile
import threading
import time
from functools import partial

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE_DIR = os.path.join(REPO, ".xla_cache")

# bf16 peak FLOP/s by device kind (public TPU specs); None -> MFU omitted
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}

# Partial-metric defaults; the orchestrator fills these from #PARTIAL lines.
RESULT_KEYS = (
    "value",
    "vs_baseline",
    "train_samples_per_sec",
    "vs_baseline_train",
    "beam_samples_per_sec",
    "vs_baseline_beam",
    "mmf_greedy_samples_per_sec",
    "vs_baseline_mmf_greedy",
    "iterative_greedy_samples_per_sec",
    "vs_baseline_iterative_greedy",
    "mmt_train_samples_per_sec",
    "vs_baseline_mmt_train",
    "mmt_train_mfu",
    "eval_mfu",
    "train_mfu",
    "device_kind",
)

# Canary budget: jax.devices() + first tiny compile over the tunnel is
# ~15-40s healthy; a wedged tunnel hangs a bare jax.devices() >120s.
CANARY_BUDGET_S = 90
CANARY_RETRY_SLEEP_S = 10
# One wall-clock budget for the WHOLE run, kept under the driver's ~1,500s
# kill window.  Everything — canary persistence, worker attempts, sleeps —
# is scheduled against the single deadline so no phase can strand the rest
# of the window (VERDICT r4 item 1: the old fixed 2-attempt canary exited
# at ~165s leaving ~1,335s unused while the wedge cleared at ~111s).
TOTAL_WINDOW_S = 1380
# Keep probing the canary until only this much window remains: a warm full
# bench completes in ~270-330s, so a canary that first passes even ~1,000s
# in can still land the primary metrics.
MIN_WORKER_RESERVE_S = 360
# Floor for a useful worker attempt (enough for device init + the primary
# eval section warm) and reserve for emitting the final JSON line.
MIN_ATTEMPT_S = 75
EMIT_RESERVE_S = 15
RETRY_SLEEP_S = 10


def _emit_partial(**kv) -> None:
    """Stream a metric to the orchestrator the moment it exists."""
    print("#PARTIAL " + json.dumps(kv), flush=True)


def _flops_of(compiled) -> float:
    """Total FLOPs from XLA cost analysis (shape differs across jax vers)."""
    try:
        cost = compiled.cost_analysis()
    except Exception:  # noqa: BLE001
        return 0.0
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0) or 0.0)


def _mcan_model():
    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.models.mcan import MCAN

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
    config = ConfigNode(
        {
            "ARCHITECTURE": "MCAN",
            "D_MODEL": 512,
            "VISION_EMBEDDING": {
                "ARCHITECTURE": "FeatureEmbedding",
                "D_FEATURE": 1024, "D_MODEL": 512, "DROPOUT": 0.1,
            },
            "TEXT_EMBEDDING": {
                "ARCHITECTURE": "LSTMTextEmbedding",
                "D_MODEL": 512, "D_EMBEDDING": 300, "DROPOUT": 0.1,
                "WORD_EMBEDDING": None, "WORD_EMBEDDING_CACHE": None,
            },
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
    vocab = BenchVocab()
    return MCAN(config, vocab), vocab


def _m4c_bench_case(arch: str):
    """Build an M4C-family model + batch at the bench_m4c_decode.py dims
    (768h / 4L MMT / 3L TextBert, bs 32, obj 100 + ocr 100 + q 20, vocab
    5000, max_iter 12) — shared by the MMF_M4C and MMF_IterativeM4C greedy
    sections.  Reference loops: /root/reference/models/mmf_m4c.py:236-256
    (full re-encode per token) and mmf_iterative_m4c.py:253-270 (decoder
    re-run per token)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from openvivqa_tpu.builders import META_ARCHITECTURE
    from openvivqa_tpu.config import ConfigNode

    m4c_h, m4c_vocab_n = 768, 5000
    m4c_bs, m4c_t = 32, 12

    class M4CVocab:
        padding_idx, bos_idx, eos_idx, unk_idx = 0, 1, 2, 3
        max_answer_length = m4c_t

        def __len__(self):
            return m4c_vocab_n

    cfg = ConfigNode(
        {
            "ARCHITECTURE": arch,
            "D_MODEL": m4c_h,
            "DECODING_MODE": "incremental",
            "MMT": {
                "HIDDEN_SIZE": m4c_h, "NUM_HIDDEN_LAYERS": 4,
                "NUM_ATTENTION_HEADS": 8,
            },
            "TEXT_BERT": {"HIDDEN_SIZE": m4c_h, "NUM_HIDDEN_LAYERS": 3},
            "OBJECT_EMBEDDING": {"D_FEATURE": 1024, "DROPOUT": 0.1},
            "OCR_EMBEDDING": {"D_FEATURE": 812, "DROPOUT": 0.1},
            "OCR_PTR_NET": {"HIDDEN_SIZE": m4c_h, "QUERY_KEY_SIZE": 768},
        }
    )
    model = META_ARCHITECTURE.get(arch)(cfg, M4CVocab())
    rng = np.random.default_rng(7)

    def _f(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    q = rng.integers(4, m4c_vocab_n, (m4c_bs, 20)).astype(np.int32)
    q[:, -4:] = 0
    batch = {
        "question_tokens": jnp.asarray(q),
        "region_features": _f(m4c_bs, 100, 1024),
        "region_boxes": _f(m4c_bs, 100, 4),
        "ocr_fasttext_features": _f(m4c_bs, 100, 300),
        "ocr_rec_features": _f(m4c_bs, 100, 256),
        "ocr_det_features": _f(m4c_bs, 100, 256),
        "ocr_boxes": _f(m4c_bs, 100, 4),
        "answer_tokens": jnp.asarray(
            rng.integers(4, m4c_vocab_n + 100, (m4c_bs, m4c_t))
            .astype(np.int32)
        ),
    }
    variables = jax.jit(
        lambda r, b: model.init({"params": r, "dropout": r}, b, train=False)
    )(jax.random.PRNGKey(0), batch)
    return model, variables["params"], batch, m4c_bs


def _greedy_chain_sps(model, params, batch, bs, chain, precompile, label):
    """Time `chain` dependent greedy decodes inside one jitted program
    (tunnel rules, CLAUDE.md).  Returns samples/sec, or None in precompile
    mode (after compiling into the cache)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain_fn(params, batch):
        def body(carry, _):
            b = dict(batch)
            # feed previous tokens back through the features so XLA
            # cannot dedupe chain iterations (tunnel rules, CLAUDE.md)
            b["region_features"] = batch["region_features"] + (
                carry[:, :1, None].astype(jnp.float32) * 1e-6
            )
            out = model.apply({"params": params}, b, method="greedy_decode")
            return out["prev_inds"][:, -1:], None

        final, _ = jax.lax.scan(
            body, jnp.zeros((bs, 1), jnp.int32), None, length=chain
        )
        return final

    compiled = chain_fn.lower(params, batch).compile()
    if precompile:
        print(f"# precompiled {label} chain", flush=True)
        return None
    np.asarray(compiled(params, batch))  # warmup
    start = time.perf_counter()
    np.asarray(compiled(params, batch))
    elapsed = time.perf_counter() - start
    return bs * chain / elapsed


def canary() -> None:
    """Fast TPU-reachability probe: device enumeration + one host fetch."""
    _configure_cache()
    import jax
    import jax.numpy as jnp

    kind = jax.devices()[0].device_kind
    value = float(jnp.ones(()) + 1.0)
    print("#CANARY " + json.dumps({"device_kind": kind, "ok": value == 2.0}),
          flush=True)


def _configure_cache() -> None:
    try:
        import jax

        if os.environ.get("BENCH_FORCE_CPU") == "1":
            # Testing hook: JAX_PLATFORM_NAME=cpu still initializes (and can
            # hang on) the axon plugin; only this config route skips it.
            jax.config.update("jax_platforms", "cpu")
        os.makedirs(CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        # Cache every program: the default min-compile-time threshold skips
        # fast compiles, which leaves retries/next rounds partially cold.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001
        pass


def worker() -> None:
    precompile = os.environ.get("BENCH_PRECOMPILE") == "1"
    # Retry attempts skip sections whose primary metric already streamed
    # out of a previous (killed) worker — the orchestrator persists
    # partials to this scratch file between attempts.
    already: dict = {}
    partials_file = os.environ.get("BENCH_PARTIALS_FILE")
    if partials_file and os.path.isfile(partials_file):
        try:
            with open(partials_file) as handle:
                already = json.load(handle)
        except Exception:  # noqa: BLE001
            already = {}

    def measured(primary_key: str) -> bool:
        return not precompile and already.get(primary_key) is not None

    import numpy as np

    import jax
    import jax.numpy as jnp

    _configure_cache()

    from openvivqa_tpu.builders import populate

    populate()
    model, vocab = _mcan_model()

    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind)
    _emit_partial(device_kind=kind)

    batch_size, n_regions, max_q = 64, 100, vocab.max_question_length
    rng = np.random.default_rng(0)
    batch = {
        "region_features": jnp.asarray(
            rng.normal(size=(batch_size, n_regions, 1024)).astype(np.float32)
        ),
        "question_tokens": jnp.asarray(
            rng.integers(4, len(vocab), size=(batch_size, max_q)).astype(np.int32)
        ),
    }
    answers = jnp.asarray(
        rng.integers(0, vocab.total_answers, size=(batch_size,)).astype(np.int32)
    )

    variables = jax.jit(lambda r, b: model.init(r, b, train=False))(
        jax.random.PRNGKey(0), batch
    )
    params = variables["params"]

    baseline_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    anchor = {}
    if os.path.isfile(baseline_path):
        with open(baseline_path) as handle:
            anchor = json.load(handle)

    # Methodology (CLAUDE.md): over the axon tunnel, repeated identical
    # dispatches can be deduplicated and block_until_ready is unreliable, so
    # chain N dependent forwards inside ONE XLA program (each iteration
    # perturbs the input with the previous output's mean) and time a host
    # fetch of the final scalar.
    @partial(jax.jit, static_argnames="n")
    def eval_chain(params, batch, n):
        def body(carry, _):
            feats = batch["region_features"] + carry
            out = model.apply(
                {"params": params},
                {**batch, "region_features": feats},
                train=False,
            )
            return jnp.mean(out) * 1e-12, None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    n_iters = 200
    if not measured("value"):
        float(eval_chain(params, batch, 2))  # warmup/compile small
        eval_compiled = eval_chain.lower(params, batch, n_iters).compile()
        if precompile:
            print("# precompiled eval chain", flush=True)
        else:
            float(eval_compiled(params, batch))
            start = time.perf_counter()
            float(eval_compiled(params, batch))
            eval_elapsed = time.perf_counter() - start
            eval_sps = batch_size * n_iters / eval_elapsed
            # XLA cost analysis reports a scan body ONCE, not x trip-count
            # (calibrated against a known matmul chain): scale by n
            eval_flops = _flops_of(eval_compiled) * n_iters
            eval_mfu = (
                eval_flops / eval_elapsed / peak if (peak and eval_flops) else None
            )
            vs_baseline = (
                eval_sps / anchor["mcan_eval_samples_per_sec"]
                if anchor.get("mcan_eval_samples_per_sec")
                else None
            )
            _emit_partial(
                value=round(eval_sps, 2),
                vs_baseline=round(vs_baseline, 2) if vs_baseline else None,
                eval_mfu=round(eval_mfu, 4) if eval_mfu else None,
            )

    # ---- train step (loss + grads + Adam), sequential like an epoch -------
    import optax

    tx = optax.adam(learning_rate=1e-4, b1=0.9, b2=0.98)
    opt_state = tx.init(params)

    # production dropout keys (base_task.py): TPU hardware rbg generator —
    # threefry mask generation alone measured 1.78 ms/step at these dims
    rng_impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    train_key = jax.random.key(7, impl=rng_impl)
    mmt_key = jax.random.key(3, impl=rng_impl)

    def loss_fn(p, feats, dropout_rng):
        out = model.apply(
            {"params": p},
            {**batch, "region_features": feats},
            train=True,
            rngs={"dropout": dropout_rng},
        )
        onehot = jax.nn.one_hot(answers, out.shape[-1], dtype=out.dtype)
        return -jnp.mean(jnp.sum(out * onehot, axis=-1))

    @partial(jax.jit, static_argnames="n")
    def train_chain(params, opt_state, batch, n):
        def body(carry, i):
            p, o, signal = carry
            feats = batch["region_features"] + signal
            rng_i = jax.random.fold_in(train_key, i)
            loss, grads = jax.value_and_grad(loss_fn)(p, feats, rng_i)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o, loss * 1e-12), None

        carry, _ = jax.lax.scan(
            body, (params, opt_state, jnp.float32(0.0)), jnp.arange(n)
        )
        return carry[2]

    n_train = 100
    if not measured("train_samples_per_sec"):
        float(train_chain(params, opt_state, batch, 2))
        train_compiled = train_chain.lower(
            params, opt_state, batch, n_train
        ).compile()
        if precompile:
            print("# precompiled train chain", flush=True)
        else:
            float(train_compiled(params, opt_state, batch))
            start = time.perf_counter()
            float(train_compiled(params, opt_state, batch))
            train_elapsed = time.perf_counter() - start
            train_sps = batch_size * n_train / train_elapsed
            # scan body counted once by cost_analysis — ×n
            train_flops = _flops_of(train_compiled) * n_train
            train_mfu = (
                train_flops / train_elapsed / peak
                if (peak and train_flops)
                else None
            )
            vs_baseline_train = (
                train_sps / anchor["mcan_train_samples_per_sec"]
                if anchor.get("mcan_train_samples_per_sec")
                else None
            )
            _emit_partial(
                train_samples_per_sec=round(train_sps, 2),
                vs_baseline_train=(
                    round(vs_baseline_train, 2) if vs_baseline_train else None
                ),
                train_mfu=round(train_mfu, 4) if train_mfu else None,
            )

    # ---- MMT-dims train step (the M4C-family hot stack, dropout 0.1) ------
    # exercises the Pallas dropout-attention kernel pair (on by default)
    try:
        if measured("mmt_train_samples_per_sec"):
            raise _Skip
        from openvivqa_tpu.models.modules.bert import BertEncoderStack
        from openvivqa_tpu.models.modules.masks import MASK_VALUE

        m_bs, m_len, m_hidden, m_heads, m_layers = 32, 512, 768, 8, 4
        stack = BertEncoderStack(
            hidden_size=m_hidden, num_layers=m_layers, num_heads=m_heads,
            dropout=0.1,
        )
        xm = jnp.asarray(
            rng.normal(size=(m_bs, m_len, m_hidden)).astype(np.float32)
        )
        mb = np.zeros((m_bs, 1, m_len, m_len), np.float32)
        mb[:, :, :, m_len - 40:] = MASK_VALUE
        mbias = jnp.asarray(mb)
        mvars = jax.jit(stack.init)(
            jax.random.PRNGKey(1), xm, attention_bias=mbias
        )
        mtx = optax.adam(1e-4)
        mopt = mtx.init(mvars["params"])

        def mmt_loss(p, x, key):
            out = stack.apply(
                {"params": p}, x, attention_bias=mbias, train=True,
                rngs={"dropout": key},
            )
            return jnp.mean(out ** 2)

        @partial(jax.jit, static_argnames="n")
        def mmt_chain(params, opt_state, x, n):
            def body(c, i):
                p, o, s = c
                l, grads = jax.value_and_grad(mmt_loss)(
                    p, x + s, jax.random.fold_in(mmt_key, i)
                )
                updates, o = mtx.update(grads, o, p)
                return (optax.apply_updates(p, updates), o, l * 1e-12), None

            c, _ = jax.lax.scan(
                body, (params, opt_state, jnp.float32(0.0)), jnp.arange(n)
            )
            return c[2]

        n_mmt = 20
        mmt_compiled = mmt_chain.lower(
            mvars["params"], mopt, xm, n_mmt
        ).compile()
        if precompile:
            print("# precompiled mmt train chain", flush=True)
        else:
            float(mmt_compiled(mvars["params"], mopt, xm))
            start = time.perf_counter()
            float(mmt_compiled(mvars["params"], mopt, xm))
            mmt_elapsed = time.perf_counter() - start
            # scan body counted once by cost_analysis (CLAUDE.md) — ×n; the
            # Pallas dropout-attention cells contribute their cost_estimate
            mmt_flops = _flops_of(mmt_compiled) * n_mmt
            mmt_mfu = (
                mmt_flops / mmt_elapsed / peak if (peak and mmt_flops) else None
            )
            mmt_sps = m_bs * n_mmt / mmt_elapsed
            vs_mmt = (
                mmt_sps / anchor["mmt_train_samples_per_sec"]
                if anchor.get("mmt_train_samples_per_sec")
                else None
            )
            _emit_partial(
                mmt_train_samples_per_sec=round(mmt_sps, 2),
                vs_baseline_mmt_train=round(vs_mmt, 2) if vs_mmt else None,
                mmt_train_mfu=round(mmt_mfu, 4) if mmt_mfu else None,
            )
    except _Skip:
        pass
    except Exception as exc:  # noqa: BLE001 — best-effort extra
        print(f"# mmt train bench skipped: {exc}", flush=True)

    # ---- beam-3 generative eval (IterativeMCAN, the flagship decode) ------
    try:
        if measured("beam_samples_per_sec"):
            raise _Skip
        sys.path.insert(0, REPO)
        import __graft_entry__ as graft
        from openvivqa_tpu.training.decode import generate

        beam_model = graft._iterative_mcan(d_model=512, layers=3, heads=8)
        beam_bs, beam = 32, 3
        beam_batch = graft._example_batch(
            beam_bs, beam_model.vocab, n_regions=36, d_feature=64
        )
        beam_vars = jax.jit(lambda r, b: beam_model.init(r, b, train=False))(
            jax.random.PRNGKey(0), beam_batch
        )

        @partial(jax.jit, static_argnames="n")
        def beam_chain(params, batch, n):
            def body(carry, _):
                feats = batch["region_features"] + carry
                outs, _ = generate(
                    beam_model, {"params": params},
                    {**batch, "region_features": feats},
                    batch_size=beam_bs, beam_size=beam,
                )
                return jnp.sum(outs).astype(jnp.float32) * 1e-12, None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return carry

        n_beam = 60  # longer chain amortises dispatch jitter over the tunnel
        beam_compiled = beam_chain.lower(
            beam_vars["params"], beam_batch, n_beam
        ).compile()
        if precompile:
            print("# precompiled beam chain", flush=True)
        else:
            float(beam_compiled(beam_vars["params"], beam_batch))
            start = time.perf_counter()
            float(beam_compiled(beam_vars["params"], beam_batch))
            beam_elapsed = time.perf_counter() - start
            beam_sps = beam_bs * n_beam / beam_elapsed
            vs_beam = (
                beam_sps / anchor["iterative_mcan_beam_eval_samples_per_sec"]
                if anchor.get("iterative_mcan_beam_eval_samples_per_sec")
                else None
            )
            _emit_partial(
                beam_samples_per_sec=round(beam_sps, 2),
                vs_baseline_beam=round(vs_beam, 2) if vs_beam else None,
            )
    except _Skip:
        pass
    except Exception as exc:  # noqa: BLE001 — beam bench is best-effort
        print(f"# beam bench skipped: {exc}", flush=True)

    # ---- MMF_M4C incremental greedy decode (the M4C-family eval loop) ------
    # Reference counterpart: /root/reference/models/mmf_m4c.py:236-256 —
    # max_iter FULL MMT re-encodes per batch.  Ours is the projected-KV +
    # split-gather incremental path at the same dims as the CPU anchor
    # (scripts/bench_m4c_decode.py: 768h/4L MMT, 3L TextBert, bs 32, obj 100
    # + ocr 100 + q 20, vocab 5000, max_iter 12).
    try:
        if measured("mmf_greedy_samples_per_sec"):
            raise _Skip
        m4c, m4c_params, m4c_batch, m4c_bs = _m4c_bench_case("MMF_M4C")
        # chain 32, not 8: the ~24 ms fixed dispatch+fetch cost (CLAUDE.md)
        # inflated chain-8 per-batch times by ~3 ms on a ~9 ms batch —
        # measured 2,558 samples/s at chain 8 vs 3,507 at chain 64
        m4c_sps = _greedy_chain_sps(
            m4c, m4c_params, m4c_batch, m4c_bs, 32, precompile, "mmf greedy"
        )
        if m4c_sps is not None:
            vs_mmf = (
                m4c_sps / anchor["mmf_greedy_samples_per_sec"]
                if anchor.get("mmf_greedy_samples_per_sec")
                else None
            )
            _emit_partial(
                mmf_greedy_samples_per_sec=round(m4c_sps, 2),
                vs_baseline_mmf_greedy=round(vs_mmf, 2) if vs_mmf else None,
            )
    except _Skip:
        pass
    except Exception as exc:  # noqa: BLE001 — best-effort extra
        print(f"# mmf greedy bench skipped: {exc}", flush=True)

    # ---- MMF_IterativeM4C greedy decode (kernel-E fused cross-attn path) --
    # Reference counterpart: mmf_iterative_m4c.py:253-270 — max_iter full
    # decoder re-runs per batch (and NameError-broken as checked out: it
    # uses TextBert/_get_mask without importing them).  Driver visibility
    # for the kernel-E win per VERDICT r4 item 5.
    try:
        if measured("iterative_greedy_samples_per_sec"):
            raise _Skip
        it_model, it_params, it_batch, it_bs = _m4c_bench_case(
            "MMF_IterativeM4C"
        )
        it_sps = _greedy_chain_sps(
            it_model, it_params, it_batch, it_bs, 32, precompile,
            "iterative greedy",
        )
        if it_sps is not None:
            vs_it = (
                it_sps / anchor["iterative_greedy_samples_per_sec"]
                if anchor.get("iterative_greedy_samples_per_sec")
                else None
            )
            _emit_partial(
                iterative_greedy_samples_per_sec=round(it_sps, 2),
                vs_baseline_iterative_greedy=(
                    round(vs_it, 2) if vs_it else None
                ),
            )
    except _Skip:
        pass
    except Exception as exc:  # noqa: BLE001 — best-effort extra
        print(f"# iterative greedy bench skipped: {exc}", flush=True)

    print("#WORKER_DONE", flush=True)


class _Skip(Exception):
    """Section already measured by a previous attempt (partials file)."""


def _final_json(partials: dict, error: str | None) -> str:
    out = {
        "metric": "mcan_eval_samples_per_sec_per_chip",
        # null, not 0.0, when unmeasured: a measured zero and "no
        # measurement" are different claims (VERDICT r3 item 1c).
        "value": partials.get("value"),
        "unit": "samples/sec/chip",
        "vs_baseline": partials.get("vs_baseline"),
    }
    for key in RESULT_KEYS[2:]:
        out[key] = partials.get(key)
    if error:
        out["error"] = error
    return json.dumps(out)


def _run_canary(budget: float = CANARY_BUDGET_S) -> tuple[bool, dict, str]:
    """Probe TPU reachability in a subprocess; never block past `budget`."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--canary"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            timeout=budget,
        )
    except subprocess.TimeoutExpired:
        return False, {}, f"canary hang >{int(budget)}s (jax backend wedged)"
    info: dict = {}
    for line in (proc.stdout or "").splitlines():
        if line.startswith("#CANARY "):
            try:
                info = json.loads(line[len("#CANARY "):])
            except json.JSONDecodeError:
                pass
    if proc.returncode == 0 and info.get("ok"):
        return True, info, ""
    tail = "; ".join((proc.stdout or "").splitlines()[-2:])
    return False, info, f"canary rc={proc.returncode}: {tail}"


def orchestrate(precompile: bool = False) -> None:
    """Run the worker with retries; always print one parseable JSON line."""
    partials: dict = {}
    start = time.monotonic()
    deadline = start + TOTAL_WINDOW_S

    # 1) Reachability canary in a PERSISTENCE LOOP (VERDICT r4 item 1): the
    # wedge is intermittent/held-chip-shaped — measured clearing 96s after
    # a >150s hang — so keep probing until it passes or so little window
    # remains that a worker could not finish anyway.
    ok, info, detail, attempt = False, {}, "never probed", 0
    while True:
        attempt += 1
        remaining = deadline - time.monotonic()
        budget = min(CANARY_BUDGET_S, remaining - EMIT_RESERVE_S)
        if budget < 10:
            break
        ok, info, detail = _run_canary(budget)
        if ok:
            break
        elapsed = time.monotonic() - start
        print(
            f"# canary attempt {attempt} failed at t={elapsed:.0f}s:"
            f" {detail}",
            file=sys.stderr, flush=True,
        )
        if deadline - time.monotonic() <= MIN_WORKER_RESERVE_S:
            break
        time.sleep(CANARY_RETRY_SLEEP_S)
    if info.get("device_kind"):
        partials["device_kind"] = info["device_kind"]
    if not ok:
        detail = f"{detail} ({attempt} canary attempts)"
        print(f"# canary failed: {detail}", file=sys.stderr, flush=True)
        if precompile:
            print(json.dumps({"precompile": "failed",
                              "error": f"tpu_unreachable: {detail}"}))
            sys.exit(1)
        print(_final_json(partials, f"tpu_unreachable: {detail}"))
        sys.exit(0)
    print(
        f"# canary passed on attempt {attempt} at"
        f" t={time.monotonic() - start:.0f}s",
        file=sys.stderr, flush=True,
    )

    # Scratch file lets a retry attempt skip already-measured sections.
    partials_fd, partials_path = tempfile.mkstemp(
        prefix="bench_partials_", suffix=".json"
    )
    os.close(partials_fd)
    env = dict(os.environ)
    env["BENCH_PARTIALS_FILE"] = partials_path
    if precompile:
        env["BENCH_PRECOMPILE"] = "1"

    def _persist():
        try:
            with open(partials_path, "w") as handle:
                json.dump(partials, handle)
        except Exception:  # noqa: BLE001
            pass

    # 2) Worker retry ladder SIZED TO THE REMAINING WINDOW: each attempt
    # gets ~60% of what is left (min one full attempt even after a late
    # canary pass), so an early pass yields ~3 attempts and a late pass
    # still gets one real one.  Partials stream out, so even a killed
    # attempt contributes its already-measured sections.
    error = None
    attempt = 0
    while True:
        remaining = deadline - time.monotonic() - EMIT_RESERVE_S
        if precompile:
            budget = 3600.0
        elif attempt == 0:
            budget = max(MIN_ATTEMPT_S, remaining * 0.6)
        elif remaining < MIN_ATTEMPT_S:
            break
        elif remaining > 4 * MIN_ATTEMPT_S:
            budget = remaining * 0.6
        else:
            budget = remaining  # last chance: spend everything left
        attempt += 1
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        attempt_deadline = time.monotonic() + budget
        tail: list[str] = []
        done = False
        # stdout is drained on a thread: a worker that wedges inside a TPU
        # call with NO output (the transient-fault class this machinery
        # exists for) must still hit the deadline — a blocking readline()
        # here would only re-check the clock after a line arrived.
        lines: queue.Queue = queue.Queue()

        def _drain(stream, q):
            for raw in stream:
                q.put(raw)
            q.put(None)  # EOF sentinel

        reader = threading.Thread(
            target=_drain, args=(proc.stdout, lines), daemon=True
        )
        reader.start()

        def _consume(raw: str):
            nonlocal done
            line = raw.rstrip("\n")
            if line.startswith("#PARTIAL "):
                try:
                    partials.update(json.loads(line[len("#PARTIAL "):]))
                    _persist()
                except json.JSONDecodeError:
                    pass
            elif line == "#WORKER_DONE":
                done = True
            else:
                tail.append(line)
                print(line, file=sys.stderr, flush=True)

        try:
            while True:
                remaining = attempt_deadline - time.monotonic()
                if remaining <= 0:
                    proc.kill()
                    proc.wait()
                    error = f"attempt {attempt}: timeout after {budget:.0f}s"
                    break
                try:
                    raw = lines.get(timeout=min(remaining, 1.0))
                except queue.Empty:
                    continue
                if raw is None:
                    rc = proc.wait()
                    if rc == 0 and done:
                        error = None
                    else:
                        detail = "; ".join(tail[-3:]) or f"rc={rc}"
                        error = f"attempt {attempt}: {detail}"
                    break
                _consume(raw)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
            # drain anything still buffered (killed worker may have
            # emitted #PARTIAL metrics that must survive into the JSON)
            reader.join(timeout=5)
            while True:
                try:
                    raw = lines.get_nowait()
                except queue.Empty:
                    break
                if raw is not None:
                    _consume(raw)
        if error is None or precompile:
            break
        if deadline - time.monotonic() - EMIT_RESERVE_S > (
            MIN_ATTEMPT_S + RETRY_SLEEP_S
        ):
            print(f"# bench {error}; retrying", file=sys.stderr, flush=True)
            time.sleep(RETRY_SLEEP_S)
        else:
            break
    try:
        os.unlink(partials_path)
    except OSError:
        pass
    if precompile:
        print(json.dumps({"precompile": "ok" if error is None else "failed",
                          "error": error}))
        sys.exit(0 if error is None else 1)
    print(_final_json(partials, error))
    sys.exit(0)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    elif "--canary" in sys.argv:
        canary()
    else:
        orchestrate(precompile="--precompile" in sys.argv)
