"""Raw-image datasets (for ViT-backed models).

Parity targets: datasets/image_dataset.py, image_question_datasets.py,
image_question_classification_dataset.py and their multilingual variants.
The reference passes PIL images into the model where a HF ViTFeatureExtractor
preprocesses them (vision_embeddings.py:86-111); strings/PIL objects cannot
cross the jit boundary, so here the dataset preprocesses to `pixel_values`
(H, W, 3) float32 (resize + 0.5/0.5 normalisation, ViT defaults) and the
flax ViT consumes arrays.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from ..builders import META_DATASET
from ..utils.instance import Instance
from .datasets import (
    FeatureClassificationDataset,
    FeatureDataset,
    teacher_forcing_pair,
)
from .multilingual import (
    MultilingualDictionaryDataset,
    MultilingualFeatureDataset,
    RawQuestionDictionaryDataset,
    RawQuestionFeatureDataset,
)


class _ImageLoaderMixin:
    def _init_images(self, config) -> None:
        self.image_path = config.FEATURE_PATH.IMAGE
        self.image_size = int(config.get("IMAGE_SIZE", 224))

    def load_pixel_values(self, filename: str) -> np.ndarray:
        from PIL import Image

        path = os.path.join(self.image_path, filename)
        with Image.open(path) as img:
            img = img.convert("RGB").resize(
                (self.image_size, self.image_size), Image.BILINEAR
            )
            array = np.asarray(img, dtype=np.float32) / 255.0
        return (array - 0.5) / 0.5  # HF ViT mean/std = 0.5/0.5

    # image datasets read pixels instead of .npy features
    def load_features(self, image_id: int) -> Dict:
        return {}


@META_DATASET.register()
class ImageDataset(_ImageLoaderMixin, FeatureDataset):
    """One sample per (question, answer) with raw pixels
    (image_dataset.py parity)."""

    def __init__(self, json_path: str, vocab, config) -> None:
        super().__init__(json_path, vocab, config)
        self._init_images(config)

    def __getitem__(self, idx: int) -> Instance:
        item = self.annotations[idx]
        answer = self.vocab.encode_answer(item["answer"])
        answer, shifted_right = teacher_forcing_pair(
            answer, self.vocab.padding_idx, self.vocab.eos_idx
        )
        return Instance(
            image_id=item["image_id"],
            filename=item["filename"],
            pixel_values=self.load_pixel_values(item["filename"]),
            question_tokens=self.vocab.encode_question(item["question"]),
            answer_tokens=answer,
            shifted_right_answer_tokens=shifted_right,
        )


@META_DATASET.register()
class ImageQuestionDataset(_ImageLoaderMixin, RawQuestionFeatureDataset):
    """Raw question string + pixels (image_question_datasets.py:16-64)."""

    def __init__(self, json_path: str, vocab, config) -> None:
        super().__init__(json_path, vocab, config)
        self._init_images(config)

    def __getitem__(self, idx: int) -> Instance:
        item = self.annotations[idx]
        answer = self.vocab.encode_answer(item["answer"])
        answer, shifted_right = teacher_forcing_pair(
            answer, self.vocab.padding_idx, self.vocab.eos_idx
        )
        return Instance(
            image_id=item["image_id"],
            filename=item["filename"],
            pixel_values=self.load_pixel_values(item["filename"]),
            answer_tokens=answer,
            shifted_right_answer_tokens=shifted_right,
            **self._question_payload(item),
        )


@META_DATASET.register()
class ImageQuestionDictionaryDataset(_ImageLoaderMixin, RawQuestionDictionaryDataset):
    def __init__(self, json_path: str, vocab, config) -> None:
        super().__init__(json_path, vocab, config)
        self._init_images(config)

    def __getitem__(self, idx: int) -> Instance:
        item = self.annotations[idx]
        return Instance(
            question_id=item["question_id"],
            type=item["type"],
            image_id=item["image_id"],
            filename=item["filename"],
            pixel_values=self.load_pixel_values(item["filename"]),
            answers=item["answers"],
            **self._question_payload(item),
        )


@META_DATASET.register()
class ImageQuestionClassificationDataset(_ImageLoaderMixin, FeatureClassificationDataset):
    """Classification targets + pixels + raw question
    (image_question_classification_dataset.py parity)."""

    def __init__(self, json_path: str, vocab, config) -> None:
        super().__init__(json_path, vocab, config)
        self._init_images(config)

    def __getitem__(self, idx: int) -> Instance:
        item = self.annotations[idx]
        return Instance(
            question_id=item["id"],
            image_id=item["image_id"],
            filename=item["filename"],
            pixel_values=self.load_pixel_values(item["filename"]),
            question_tokens=self.vocab.encode_question(item["question"]),
            answer=self.vocab.encode_answer(item["answer"]),
        )


@META_DATASET.register()
class MultilingualImageQuestionDataset(ImageQuestionDataset):
    def load_annotations(self, json_data: Dict) -> List[Dict]:
        return MultilingualFeatureDataset.load_annotations(self, json_data)


@META_DATASET.register()
class MultilingualImageQuestionDictionaryDataset(ImageQuestionDictionaryDataset):
    def load_annotations(self, json_data: Dict) -> List[Dict]:
        annotations = MultilingualDictionaryDataset.load_annotations(self, json_data)
        return annotations

    def __getitem__(self, idx: int) -> Instance:
        item = self.annotations[idx]
        # _question_payload, not hand-rolled fields: with HF_TOKENIZER set
        # the train split emits question_backbone_tokens/mask — dropping
        # them here fed the converted backbone framework-vocab ids at eval
        return Instance(
            question_id=item["question_id"],
            type=item["type"],
            image_id=item["image_id"],
            filename=item["filename"],
            pixel_values=self.load_pixel_values(item["filename"]),
            answers=item["answers"],
            **self._question_payload(item),
        )


@META_DATASET.register()
class MultilingualImageQuestionClassificationDataset(
    ImageQuestionClassificationDataset
):
    def load_annotations(self, json_data: Dict) -> List[Dict]:
        annotations = MultilingualFeatureDataset.load_annotations(self, json_data)
        for i, ann in enumerate(annotations):
            ann.setdefault("id", i)
        return annotations
