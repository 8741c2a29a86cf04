"""Beam-search scan vs a slow numpy oracle of the reference algorithm
(SURVEY.md §4.4: decode equivalence on identical logits)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openvivqa_tpu.training.decode import beam_search

V = 7  # vocab
EOS = 2
BOS = 1


def _logit_table(seed):
    rng = np.random.default_rng(seed)
    # log-probs per (prev_token, t): deterministic fake model
    table = rng.normal(size=(V, 10, V)).astype(np.float32)
    table = table - np.log(np.exp(table).sum(-1, keepdims=True))
    return table


def _oracle_beam(table, bs, beam, max_len, out_size=1):
    """Faithful numpy port of the reference BeamSearch.apply semantics
    (beam_search.py:36-118): cur_beam_size=1 at t=0, eos freezing with -999,
    per-step state gather, final sort."""
    seq_mask = np.ones((bs, beam, 1), np.float32)
    seq_logprob = np.zeros((bs, 1, 1), np.float32)
    outputs = []
    log_probs = []
    selected_words = None

    for t in range(max_len):
        cur_beam = 1 if t == 0 else beam
        if t == 0:
            tokens = np.full((bs * cur_beam,), BOS, np.int64)
        else:
            tokens = selected_words.reshape(-1)
        word_logprob = table[tokens, t].reshape(bs, cur_beam, V)
        candidate = seq_logprob + word_logprob

        if t > 0:
            mask = (selected_words.reshape(bs, cur_beam) != EOS).astype(
                np.float32
            )[..., None]
            seq_mask = seq_mask * mask
            word_logprob = word_logprob * seq_mask
            old = np.broadcast_to(seq_logprob, candidate.shape).copy()
            old[:, :, 1:] = -999.0
            candidate = seq_mask * candidate + old * (1 - seq_mask)

        flat = candidate.reshape(bs, -1)
        order = np.argsort(-flat, axis=-1, kind="stable")[:, :beam]
        selected_logprob = np.take_along_axis(flat, order, axis=-1)
        selected_beam = order // V
        selected_words = order % V

        seq_logprob = selected_logprob[..., None]
        seq_mask = np.take_along_axis(seq_mask, selected_beam[..., None], axis=1)
        outputs = [
            np.take_along_axis(o, selected_beam[..., None], axis=1) for o in outputs
        ]
        outputs.append(selected_words[..., None])

        this_word_logprob = np.take_along_axis(
            np.take_along_axis(
                word_logprob,
                np.broadcast_to(selected_beam[..., None], (bs, beam, V)),
                axis=1,
            ),
            selected_words[..., None],
            axis=2,
        )
        log_probs = [
            np.take_along_axis(o, selected_beam[..., None], axis=1)
            for o in log_probs
        ]
        log_probs.append(this_word_logprob)

    seq_logprob_flat = seq_logprob[:, :, 0]
    sort_idx = np.argsort(-seq_logprob_flat, axis=-1, kind="stable")
    outputs = np.concatenate(outputs, axis=-1)
    outputs = np.take_along_axis(outputs, sort_idx[..., None], axis=1)
    log_probs = np.concatenate(log_probs, axis=-1)
    log_probs = np.take_along_axis(log_probs, sort_idx[..., None], axis=1)
    outputs = outputs[:, :out_size]
    log_probs = log_probs[:, :out_size]
    if out_size == 1:
        outputs, log_probs = outputs[:, 0], log_probs[:, 0]
    return outputs, log_probs


def _scan_beam(table, bs, beam, max_len, out_size=1):
    table_j = jnp.asarray(table)

    def step_fn(cache, tokens):
        t = cache["t"]
        logp = table_j[tokens[:, 0], t][:, None, :]  # (bs*beam, 1, V)
        return logp, {"t": t + 1}

    init_cache = {"t": jnp.zeros((bs * beam,), jnp.int32)}
    outs, lps = beam_search(
        step_fn, init_cache, batch_size=bs, beam_size=beam, max_len=max_len,
        bos_idx=BOS, eos_idx=EOS, out_size=out_size,
    )
    return np.asarray(outs), np.asarray(lps)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("beam", [2, 3])
def test_beam_matches_oracle(seed, beam):
    table = _logit_table(seed)
    bs, max_len = 3, 6
    ref_out, ref_lp = _oracle_beam(table, bs, beam, max_len)
    our_out, our_lp = _scan_beam(table, bs, beam, max_len)
    np.testing.assert_array_equal(our_out, ref_out)
    np.testing.assert_allclose(our_lp, ref_lp, atol=1e-5)


def test_beam_out_size_full():
    table = _logit_table(3)
    ref_out, ref_lp = _oracle_beam(table, 2, 3, 5, out_size=3)
    our_out, our_lp = _scan_beam(table, 2, 3, 5, out_size=3)
    np.testing.assert_array_equal(our_out, ref_out)
    np.testing.assert_allclose(our_lp, ref_lp, atol=1e-5)


def test_return_probs_shapes():
    table = _logit_table(4)
    bs, beam, max_len = 2, 3, 5
    table_j = jnp.asarray(table)

    def step_fn(cache, tokens):
        t = cache["t"]
        return table_j[tokens[:, 0], t][:, None, :], {"t": t + 1}

    outs, lps, all_lps = beam_search(
        step_fn, {"t": jnp.zeros((bs * beam,), jnp.int32)},
        batch_size=bs, beam_size=beam, max_len=max_len,
        bos_idx=BOS, eos_idx=EOS, out_size=beam, return_probs=True,
    )
    assert outs.shape == (bs, beam, max_len)
    assert lps.shape == (bs, beam, max_len)
    assert all_lps.shape == (bs, beam, max_len, V)
    assert np.isfinite(np.asarray(all_lps)).all()


def test_eos_freezes_beam():
    """Force eos as the argmax everywhere: every beam should emit eos at
    t=0 then pad (word 0) forever, with log-probs frozen at 0 after."""
    table = np.full((V, 10, V), -10.0, np.float32)
    table[:, :, EOS] = -0.5  # eos always best
    our_out, our_lp = _scan_beam(table, 2, 2, 4)
    assert (our_out[:, 0] == EOS).all()
    assert (our_out[:, 1:] == 0).all()
    np.testing.assert_allclose(our_lp[:, 1:], 0.0)
