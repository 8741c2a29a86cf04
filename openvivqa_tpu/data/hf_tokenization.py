"""Host-side HuggingFace tokenisation for RawQuestion datasets.

The reference tokenises raw question strings INSIDE the HF wrappers at
forward time (text_embeddings.py:329-330).  Strings never enter jit here
(CLAUDE.md invariant), so the equivalent TPU design tokenises once in the
data pipeline: a dataset configured with `HF_TOKENIZER: <name-or-path>`
emits a `question_backbone_tokens` array (padded to the dataset-level max,
static shape) alongside the framework-vocab `question_tokens`, and the
ViT*/pretrained-LM models feed the backbone ids to their converted
backbones.  This is the prerequisite for bit-parity of every HF-backed
config (VERDICT r1 item 6).

Offline rule: the tokenizer must resolve from local files
(`local_files_only=True`).  A configured-but-unresolvable tokenizer is a
hard error — silently falling back to framework-vocab ids would train a
semantically different model.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ..logging_utils import setup_logger

logger = setup_logger()


class HostTokenizer:
    """Thin wrapper over a local AutoTokenizer producing static-shape id
    matrices."""

    def __init__(self, name_or_path: str):
        from transformers import AutoTokenizer

        try:
            self.tokenizer = AutoTokenizer.from_pretrained(
                name_or_path, local_files_only=True
            )
        except Exception as exc:  # noqa: BLE001
            raise FileNotFoundError(
                f"HF_TOKENIZER={name_or_path!r} is configured but no local "
                "tokenizer files resolve (offline environment). Provide a "
                "local path with tokenizer files or remove the key — "
                "falling back silently would change the model."
            ) from exc
        if self.tokenizer.pad_token_id is None:
            # pad-less tokenizers (GPT-2 family): the standard workaround —
            # padding='longest' below would otherwise raise deep inside
            # transformers.  Validity masks come from the tokenizer's own
            # attention_mask, so pad==eos stays unambiguous.
            self.tokenizer.pad_token = self.tokenizer.eos_token
        self.pad_id = int(self.tokenizer.pad_token_id or 0)

    def encode_all(self, texts: Sequence[str]):
        """Tokenise every string in one call, padded to the longest
        (= dataset-level static length when called with the full split) and
        truncated at the tokenizer's own model max (a >model-max question
        would silently index past the backbone's position table).  Returns
        (ids (n, L) int32, validity (n, L) float32)."""
        encoded = self.tokenizer(
            list(texts), padding="longest", truncation=True,
            return_tensors="np",
        )
        return (
            encoded["input_ids"].astype(np.int32),
            encoded["attention_mask"].astype(np.float32),
        )


def backbone_token_table(config, annotations) -> dict:
    """Pre-tokenise every unique raw question of a split; returns
    {raw_question: ((L,) int32 ids, (L,) float32 validity mask)} or None
    when HF_TOKENIZER is unset.  The mask carries the tokenizer's real
    pad id (RoBERTa-family tokenizers pad with 1, not 0), so models never
    have to guess a padding index for the backbone id space."""
    name = config.get("HF_TOKENIZER")
    if not name:
        return None
    tokenizer = HostTokenizer(name)
    uniques: List[str] = list(
        dict.fromkeys(ann["raw_question"] for ann in annotations)
    )
    if not uniques:
        return {}
    # validity comes from the tokenizer's attention_mask, NOT an
    # ids != pad_id compare — with the pad==eos workaround that compare
    # would zero every genuine trailing EOS
    ids, masks = tokenizer.encode_all(uniques)
    logger.info(
        "HF-tokenised %d unique questions with %s (max len %d, pad id %d)",
        len(uniques), name, ids.shape[1], tokenizer.pad_id,
    )
    return {
        question: (ids[i], masks[i]) for i, question in enumerate(uniques)
    }
