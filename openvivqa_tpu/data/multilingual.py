"""Multilingual (EVJVQA) vocabularies and datasets.

Parity targets:
* MultilingualVocab — vocabs/multilingual_vocab.py:9-33 (Japanese questions
  tokenised char-level, Vietnamese/English word-level).
* MultilingualClassificationVocab — multilingual_classification_vocab.py.
* MultilingualMultiModalVocab / VlspVqaMultiModalVocab —
  multilingual_multimodal_vocab.py, vlsp_vqa_multimodal_vocab.py.
* VlspEvjVqaVocab — vlsp_evjvqa_vocab.py:7-24 (vocab built from train+dev
  only — the EVJVQA test answers are unseen).
* Multilingual / RawQuestion datasets — datasets/multilingual_datasets.py,
  raw_question_datasets.py, raw_question_multilingual_datasets.py.  The
  RawQuestion variants keep the raw question string host-side for HF
  tokenisers AND emit vocab-encoded question_tokens so jitted models always
  have a device-side stream (the reference's DictionaryDataset crashes on
  raw-string questions — fixed by tokenising at annotation load).
"""

from __future__ import annotations

import json
from collections import Counter
from typing import Dict, List

import numpy as np

from ..builders import META_DATASET, META_VOCAB
from ..utils.instance import Instance
from .datasets import (
    DictionaryDataset,
    FeatureClassificationDataset,
    FeatureDataset,
    teacher_forcing_pair,
)
from .multimodal_vocab import MultiModalVocab
from .text_utils import is_japanese_sentence, preprocess_sentence
from .vocab import ClassificationVocab, Vocab


def multilingual_tokenize(text: str, tokenizer) -> List[str]:
    """Char-level for Japanese, preprocess_sentence otherwise."""
    if is_japanese_sentence(text):
        return list(text)
    return preprocess_sentence(text, tokenizer)


class _MultilingualMakeVocabMixin:
    def make_vocab(self, json_paths) -> None:
        self.freqs = Counter()
        self.max_question_length = 0
        self.max_answer_length = 0
        for json_path in json_paths:
            if json_path is None:
                continue
            with open(json_path) as handle:
                json_data = json.load(handle)
            for ann in json_data["annotations"]:
                question = multilingual_tokenize(ann["question"], self.tokenizer)
                for answer in ann["answers"]:
                    if is_japanese_sentence(ann["question"]):
                        answer_tokens = list(answer)
                    else:
                        answer_tokens = preprocess_sentence(answer, self.tokenizer)
                    self.freqs.update(question)
                    self.freqs.update(answer_tokens)
                    self.max_question_length = max(
                        self.max_question_length, len(question) + 2
                    )
                    self.max_answer_length = max(
                        self.max_answer_length, len(answer_tokens) + 2
                    )


@META_VOCAB.register()
class MultilingualVocab(_MultilingualMakeVocabMixin, Vocab):
    pass


@META_VOCAB.register()
class MultilingualClassificationVocab(ClassificationVocab):
    def make_vocab(self, json_paths) -> None:
        self.freqs = Counter()
        answers = set()
        self.max_question_length = 0
        self.max_answer_length = 1
        for json_path in json_paths:
            if json_path is None:
                continue
            with open(json_path) as handle:
                json_data = json.load(handle)
            for ann in json_data["annotations"]:
                question = multilingual_tokenize(ann["question"], self.tokenizer)
                for answer in ann["answers"]:
                    self.freqs.update(question)
                    if is_japanese_sentence(ann["question"]):
                        # store the SAME space-joined char form the dataset
                        # path produces (_MultilingualAnnotationsMixin
                        # char-tokenizes ja answers; encode_answer joins
                        # with spaces — a raw 'ネコ' key would never match
                        # the looked-up 'ネ コ')
                        answers.add(" ".join(list(answer)))
                    else:
                        answers.add(
                            " ".join(preprocess_sentence(answer, self.tokenizer))
                        )
                self.max_question_length = max(
                    self.max_question_length, len(question) + 2
                )
        self.itoa = dict(enumerate(sorted(answers)))
        self.atoi = {a: i for i, a in self.itoa.items()}
        self.total_answers = len(self.atoi)


@META_VOCAB.register()
class MultilingualMultiModalVocab(_MultilingualMakeVocabMixin, MultiModalVocab):
    pass


@META_VOCAB.register()
class VlspEvjVqaVocab(MultilingualVocab):
    """EVJVQA vocab built from train+dev only (vlsp_evjvqa_vocab.py:21-24)."""

    def vocab_json_paths(self, config):
        return [config.JSON_PATH.TRAIN, config.JSON_PATH.DEV]


@META_VOCAB.register()
class VlspVqaMultiModalVocab(MultilingualMultiModalVocab):
    def vocab_json_paths(self, config):
        return [config.JSON_PATH.TRAIN, config.JSON_PATH.DEV]


# -- datasets -----------------------------------------------------------------
class _MultilingualAnnotationsMixin:
    def load_annotations(self, json_data: Dict) -> List[Dict]:
        images = {img["id"]: img for img in json_data["images"]}
        annotations = []
        for ann in json_data["annotations"]:
            image = images.get(ann["image_id"])
            if image is None:
                continue
            is_ja = is_japanese_sentence(ann["question"])
            question = multilingual_tokenize(ann["question"], self.vocab.tokenizer)
            for answer in ann["answers"]:
                answer_tokens = (
                    list(answer)
                    if is_ja
                    else preprocess_sentence(answer, self.vocab.tokenizer)
                )
                annotations.append(
                    {
                        "question": question,
                        "raw_question": ann["question"],
                        "answer": answer_tokens,
                        "image_id": ann["image_id"],
                        "filename": image["filename"],
                    }
                )
        return annotations


@META_DATASET.register()
class MultilingualFeatureDataset(_MultilingualAnnotationsMixin, FeatureDataset):
    pass


@META_DATASET.register()
class MultilingualDictionaryDataset(DictionaryDataset):
    def load_annotations(self, json_data: Dict) -> List[Dict]:
        images = {img["id"]: img for img in json_data["images"]}
        annotations = []
        for ann in json_data["annotations"]:
            image = images.get(ann["image_id"])
            if image is None:
                continue
            # reference keeps word-level answer strings for the metrics even
            # for Japanese (multilingual_datasets.py:45-47)
            answers = [
                " ".join(preprocess_sentence(a, self.vocab.tokenizer))
                for a in ann["answers"]
            ]
            annotations.append(
                {
                    "question_id": ann["id"],
                    "type": ann.get("QA-type"),
                    "question": multilingual_tokenize(
                        ann["question"], self.vocab.tokenizer
                    ),
                    "raw_question": ann["question"],
                    "answers": answers,
                    "image_id": ann["image_id"],
                    "filename": image["filename"],
                }
            )
        return annotations


class _RawQuestionItemMixin:
    """__getitem__ keeps the raw question string host-side and also encodes
    it with the vocab so the device stream exists.  With `HF_TOKENIZER` in
    the dataset config, a `question_backbone_tokens` array (real HF ids for
    the converted backbone, static dataset-level length) is emitted too
    (text_embeddings.py:329-330 parity, tokenised in the pipeline instead
    of inside the model)."""

    def _backbone_table(self):
        if not hasattr(self, "_backbone_ids_by_question"):
            from .hf_tokenization import backbone_token_table

            self._backbone_ids_by_question = backbone_token_table(
                self.config, self.annotations
            )
        return self._backbone_ids_by_question

    def _question_payload(self, item):
        payload = {
            "question": item["raw_question"],
            "question_tokens": self.vocab.encode_question(item["question"]),
        }
        table = self._backbone_table()
        if table is not None:
            ids, mask = table[item["raw_question"]]
            payload["question_backbone_tokens"] = ids
            payload["question_backbone_mask"] = mask
        return payload


@META_DATASET.register()
class RawQuestionFeatureDataset(_RawQuestionItemMixin, FeatureDataset):
    def load_annotations(self, json_data: Dict) -> List[Dict]:
        images = {img["id"]: img for img in json_data["images"]}
        annotations = []
        for ann in json_data["annotations"]:
            image = images.get(ann["image_id"])
            if image is None:
                continue
            question = preprocess_sentence(ann["question"], self.vocab.tokenizer)
            for answer in ann["answers"]:
                annotations.append(
                    {
                        "question": question,
                        "raw_question": ann["question"],
                        "answer": preprocess_sentence(answer, self.vocab.tokenizer),
                        "image_id": ann["image_id"],
                        "filename": image["filename"],
                    }
                )
        return annotations

    def __getitem__(self, idx: int) -> Instance:
        item = self.annotations[idx]
        answer = self.vocab.encode_answer(item["answer"])
        answer, shifted_right = teacher_forcing_pair(
            answer, self.vocab.padding_idx, self.vocab.eos_idx
        )
        features = self.load_features(item["image_id"])
        return Instance(
            image_id=item["image_id"],
            filename=item["filename"],
            answer_tokens=answer,
            shifted_right_answer_tokens=shifted_right,
            **self._question_payload(item),
            **features,
        )


@META_DATASET.register()
class RawQuestionDictionaryDataset(_RawQuestionItemMixin, DictionaryDataset):
    def load_annotations(self, json_data: Dict) -> List[Dict]:
        annotations = super().load_annotations(json_data)
        raw = {ann["id"]: ann["question"] for ann in json_data["annotations"]}
        for ann in annotations:
            ann["raw_question"] = raw.get(ann["question_id"], "")
        return annotations

    def __getitem__(self, idx: int) -> Instance:
        item = self.annotations[idx]
        features = self.load_features(item["image_id"])
        return Instance(
            question_id=item["question_id"],
            type=item["type"],
            image_id=item["image_id"],
            filename=item["filename"],
            answers=item["answers"],
            **self._question_payload(item),
            **features,
        )


@META_DATASET.register()
class RawQuestionMultilingualFeatureDataset(
    _MultilingualAnnotationsMixin, RawQuestionFeatureDataset
):
    pass


@META_DATASET.register()
class RawQuestionMultilingualDictionaryDataset(
    _RawQuestionItemMixin, MultilingualDictionaryDataset
):
    def __getitem__(self, idx: int) -> Instance:
        item = self.annotations[idx]
        features = self.load_features(item["image_id"])
        return Instance(
            question_id=item["question_id"],
            type=item["type"],
            image_id=item["image_id"],
            filename=item["filename"],
            answers=item["answers"],
            **self._question_payload(item),
            **features,
        )
