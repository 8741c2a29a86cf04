"""MultiModalVocab: Vocab + modality special tokens (img/feat/box/question/
answer) used by the single-stream models.

Parity: /root/reference/data_utils/vocabs/multimodal_vocab.py:6-66 (special
ordering: pad/bos/eos/unk/img/feat/box/question/answer).  The reference
reads token names from `config.VOCAB.*` even though build_vocab already
passes the VOCAB node (a latent crash); we accept both layouts.
"""

from __future__ import annotations

from typing import List

from ..builders import META_VOCAB
from .vocab import Vocab


def _vocab_section(config):
    nested = config.get("VOCAB")
    return nested if nested is not None else config


@META_VOCAB.register()
class MultiModalVocab(Vocab):
    def __init__(self, config):
        section = _vocab_section(config)
        self.img_token = section.get("IMG_TOKEN", "<img>")
        self.feat_token = section.get("FEAT_TOKEN", "<feat>")
        self.box_token = section.get("BOX_TOKEN", "<box>")
        self.question_token = section.get("QUESTION_TOKEN", "<question>")
        self.answer_token = section.get("ANSWER_TOKEN", "<answer>")
        # the base vocab must read TOKENIZER/JSON_PATH/specials from the
        # SAME section the modality tokens came from — mixing layers would
        # crash (full-config layout) or mix token sources
        super().__init__(section)

    def special_tokens(self) -> List[str]:
        return [
            self.padding_token, self.bos_token, self.eos_token, self.unk_token,
            self.img_token, self.feat_token, self.box_token,
            self.question_token, self.answer_token,
        ]

    def register_special_indices(self) -> None:
        self.img_idx = self.stoi[self.img_token]
        self.feat_idx = self.stoi[self.feat_token]
        self.box_idx = self.stoi[self.box_token]
        self.question_idx = self.stoi[self.question_token]
        self.answer_idx = self.stoi[self.answer_token]
