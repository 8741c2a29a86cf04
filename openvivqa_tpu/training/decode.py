"""Beam search as one jitted `lax.scan`.

Behavioural parity with /root/reference/models/modules/beam_search.py:4-118
(incl. the exact eos semantics: once a beam emits <eos> its log-probs are
frozen, word 0 becomes the only non-(-999) continuation, and recorded
per-step log-probs are multiplied by the beam's alive mask) and with
base_transformer.py:31-54's step/statefulness protocol.

TPU-native redesign (SURVEY.md §7.3.1):
* the reference's stateful-buffer mutation becomes an explicit cache pytree
  carried through the scan; `apply_to_states` is a take_along_axis gather;
* the reference's cur_beam_size=1 special case at t=0 disappears: all
  shapes are (bs*beam, ...) from the start and beams 1..B-1 are disabled at
  t=0 by initialising their cumulative log-prob to -1e18 — selection then
  necessarily picks the top-`beam` tokens of beam 0, which is exactly the
  reference's first expansion;
* everything is static-shape, so one compilation serves a whole split.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e18
EOS_FREEZE = -999.0  # beam_search.py:53 parity


def _gather_beams(tree, selected_beam: jnp.ndarray, bs: int, beam: int):
    """Reorder every (bs*beam, ...) leaf by the per-batch beam indices.
    Beam-invariant buffers are skipped: scalar counters, and the static
    encoder K/V caches ('enc_kv_*' — identical across beams by
    construction, so the gather would be a no-op costing HBM traffic)."""

    # one-hot selection matrix: large float leaves are reordered with a
    # batched matmul instead of a gather — TPU gathers run on the scalar
    # core and dominated the decode step (profiled at ~9 ms per KV-cache
    # leaf per step); the (beam x beam) einsum is VPU/MXU work instead
    onehot = jax.nn.one_hot(selected_beam, beam, dtype=jnp.float32)

    def gather(path, leaf):
        if leaf.ndim == 0 or leaf.shape[0] != bs * beam:
            return leaf
        if any("enc_kv" in str(entry) for entry in path):
            return leaf
        shaped = leaf.reshape((bs, beam) + leaf.shape[1:])
        if leaf.dtype == jnp.float32 and leaf.size >= (1 << 14):
            flat = shaped.reshape(bs, beam, -1)
            out = jnp.einsum(
                "bij,bjr->bir", onehot, flat,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return out.reshape(leaf.shape)
        idx = selected_beam.reshape((bs, beam) + (1,) * (leaf.ndim - 1))
        idx = jnp.broadcast_to(idx, (bs, beam) + leaf.shape[1:])
        return jnp.take_along_axis(shaped, idx, axis=1).reshape(leaf.shape)

    return jax.tree_util.tree_map_with_path(gather, tree)


def beam_search(
    step_fn: Callable[[Dict, jnp.ndarray], Tuple[jnp.ndarray, Dict]],
    init_cache: Dict,
    batch_size: int,
    beam_size: int,
    max_len: int,
    bos_idx: int,
    eos_idx: int,
    out_size: int = 1,
    return_probs: bool = False,
):
    """Run beam search.

    Args:
      step_fn: (cache, tokens (bs*beam, 1)) -> (logprobs (bs*beam, 1, V),
        new_cache).  Must be traceable; encoder outputs are expected to be
        closed over (already expanded to bs*beam rows).
      init_cache: zero-initialised cache pytree with bs*beam leading dims.
    Returns:
      (outputs, log_probs[, all_log_probs]) like beam_search.py:108-118:
      outputs (bs, max_len) when out_size == 1 else (bs, out_size, max_len).
    """
    bs, beam = batch_size, beam_size

    seq_logprob0 = jnp.full((bs, beam, 1), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    carry0 = {
        "cache": init_cache,
        "selected_words": jnp.full((bs * beam, 1), bos_idx, jnp.int32),
        "seq_logprob": seq_logprob0,
        "seq_mask": jnp.ones((bs, beam, 1), jnp.float32),
        "outputs": jnp.zeros((bs, beam, max_len), jnp.int32),
        "log_probs": jnp.zeros((bs, beam, max_len), jnp.float32),
    }

    def body(carry, t):
        word_logprob, new_cache = step_fn(carry["cache"], carry["selected_words"])
        vocab_size = word_logprob.shape[-1]
        word_logprob = word_logprob.reshape(bs, beam, vocab_size)

        candidate = carry["seq_logprob"] + word_logprob

        # freeze finished beams (beam_search.py:48-55); at t=0 the previous
        # words are <bos> so this is a no-op, matching the t>0 guard
        alive = (
            carry["selected_words"].reshape(bs, beam, 1) != eos_idx
        ).astype(jnp.float32)
        seq_mask = carry["seq_mask"] * alive
        masked_word_logprob = word_logprob * seq_mask
        frozen = jnp.broadcast_to(carry["seq_logprob"], candidate.shape)
        frozen = frozen.at[:, :, 1:].set(EOS_FREEZE)
        candidate = seq_mask * candidate + frozen * (1.0 - seq_mask)

        selected_logprob, selected_idx = jax.lax.top_k(
            candidate.reshape(bs, beam * vocab_size), beam
        )
        selected_beam = selected_idx // vocab_size  # (bs, beam)
        selected_words = selected_idx % vocab_size

        new_cache = _gather_beams(new_cache, selected_beam, bs, beam)
        seq_logprob = selected_logprob[..., None]
        seq_mask = jnp.take_along_axis(seq_mask, selected_beam[..., None], axis=1)
        outputs = jnp.take_along_axis(
            carry["outputs"], selected_beam[..., None], axis=1
        )
        outputs = jax.lax.dynamic_update_slice_in_dim(
            outputs, selected_words[..., None], t, axis=2
        )

        # log-prob of the chosen word under the *masked* distribution
        # (beam_search.py:74-79); one-hot matmul instead of a (bs,beam,V)
        # gather for the same scalar-core reason as the cache reorder
        onehot = jax.nn.one_hot(selected_beam, beam, dtype=jnp.float32)
        beam_gathered = jnp.einsum(
            "bij,bjv->biv", onehot, masked_word_logprob,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        this_word_logprob = jnp.take_along_axis(
            beam_gathered, selected_words[..., None], axis=2
        )
        log_probs = jnp.take_along_axis(
            carry["log_probs"], selected_beam[..., None], axis=1
        )
        log_probs = jax.lax.dynamic_update_slice_in_dim(
            log_probs, this_word_logprob, t, axis=2
        )

        new_carry = {
            "cache": new_cache,
            "selected_words": selected_words.reshape(bs * beam, 1),
            "seq_logprob": seq_logprob,
            "seq_mask": seq_mask,
            "outputs": outputs,
            "log_probs": log_probs,
        }
        step_out = masked_word_logprob if return_probs else None
        return new_carry, step_out

    carry, stacked = jax.lax.scan(body, carry0, jnp.arange(max_len))

    # sort beams by final cumulative log-prob (beam_search.py:97-107)
    order = jnp.argsort(-carry["seq_logprob"][:, :, 0], axis=1)  # (bs, beam)
    outputs = jnp.take_along_axis(carry["outputs"], order[..., None], axis=1)
    log_probs = jnp.take_along_axis(carry["log_probs"], order[..., None], axis=1)

    outputs = outputs[:, :out_size]
    log_probs = log_probs[:, :out_size]
    if out_size == 1:
        outputs = outputs[:, 0]
        log_probs = log_probs[:, 0]

    if return_probs:
        all_log_probs = jnp.moveaxis(stacked, 0, 2)  # (bs, beam, T, V)
        all_log_probs = jnp.take_along_axis(
            all_log_probs, order[..., None, None], axis=1
        )
        return outputs, log_probs, all_log_probs
    return outputs, log_probs


def generate(
    model,
    variables: Dict,
    batch: Dict,
    batch_size: int,
    beam_size: int,
    out_size: int = 1,
    return_probs: bool = False,
):
    """Encode once, expand to beams, run the scan (base_transformer.py:46-54
    parity).  Fully traceable: the task layer wraps this in jax.jit with
    static (batch_size, beam_size, out_size)."""
    encoder_features, encoder_bias = model.apply(
        variables, batch, method=model.encode
    )
    # encoder state may be any pytree (e.g. dict of streams); expand every
    # leaf to bs*beam rows
    enc_b = jax.tree.map(
        lambda x: jnp.repeat(x, beam_size, axis=0), encoder_features
    )
    bias_b = (
        jax.tree.map(lambda x: jnp.repeat(x, beam_size, axis=0), encoder_bias)
        if encoder_bias is not None
        else None
    )
    init_cache, decode_prep = init_cache_and_prep(
        model, variables, enc_b, bias_b, model.vocab.bos_idx,
        batch_size * beam_size,
    )
    step_variables = (
        {**variables, "decode_prep": decode_prep} if decode_prep else variables
    )
    step_fn = make_generative_step_fn(model, step_variables)(enc_b, bias_b)
    return beam_search(
        step_fn,
        init_cache,
        batch_size=batch_size,
        beam_size=beam_size,
        max_len=model.max_generation_length,
        bos_idx=model.vocab.bos_idx,
        eos_idx=model.vocab.eos_idx,
        out_size=out_size,
        return_probs=return_probs,
    )


def make_generative_step_fn(model, variables_without_cache: Dict):
    """step_fn factory for GenerativeModel: closes over encoder outputs."""

    def step_factory(encoder_features, encoder_bias):
        def step_fn(cache, tokens):
            out, mutated = model.apply(
                {**variables_without_cache, "cache": cache},
                tokens,
                encoder_features,
                encoder_bias,
                method=model.decode_step,
                mutable=["cache"],
            )
            return out, mutated["cache"]

        return step_fn

    return step_factory


def init_cache_for(model, variables_without_cache, encoder_features, encoder_bias, bos_idx, n_rows):
    """Create the zero cache pytree by tracing one decode step.

    Legacy single-collection variant: the cache it returns matches a
    step_fn built WITHOUT 'decode_prep' (per-step weight casts, enc K/V
    cached in the 'cache' collection).  `generate` uses
    `init_cache_and_prep` instead."""
    dummy = jnp.full((n_rows, 1), bos_idx, jnp.int32)
    _, mutated = model.apply(
        {**variables_without_cache},
        dummy,
        encoder_features,
        encoder_bias,
        method=model.decode_step,
        mutable=["cache"],
    )
    return jax.tree.map(jnp.zeros_like, mutated["cache"])


def init_cache_and_prep(
    model, variables_without_cache, encoder_features, encoder_bias, bos_idx, n_rows
):
    """One decode-step trace with 'decode_prep' mutable: returns the zeroed
    cache pytree PLUS the scan-invariant pre-cast bundle (bf16 fused
    weights + projected enc K/V; see modules/decoders._DecodePrecast).

    The bundle is computed here — OUTSIDE the decode scan — and threaded
    into step_fn as a read-only collection, so the ~45 MB of per-step
    weight/enc-K/V casts the scan body used to re-run every step (XLA does
    not hoist scan invariants) execute exactly once per generate() call.
    The two traces must agree on cache structure, which they do by
    construction: the fused path skips the 'cache'-collection enc K/V
    buffers exactly when a prep bundle is available, in both traces."""
    dummy = jnp.full((n_rows, 1), bos_idx, jnp.int32)
    _, mutated = model.apply(
        {**variables_without_cache},
        dummy,
        encoder_features,
        encoder_bias,
        method=model.decode_step,
        mutable=["cache", "decode_prep"],
    )
    init_cache = jax.tree.map(jnp.zeros_like, mutated["cache"])
    return init_cache, mutated.get("decode_prep", {})
