"""All component registries and build_* factory functions.

Mirrors the 11 registries of the reference (builders/*_builder.py, each a
Detectron2-style Registry; see SURVEY.md §1.3) in one module.  Registration
happens at import time: importing :mod:`openvivqa_tpu.builders` imports every
component package so that all registries are populated, exactly like
/root/reference/builders/__init__.py:1-9 does.
"""

from __future__ import annotations

from .registry import Registry

META_TASK = Registry("TASK")
META_ARCHITECTURE = Registry("ARCHITECTURE")
META_DATASET = Registry("DATASET")
META_VOCAB = Registry("VOCAB")
META_ENCODER = Registry("ENCODER")
META_DECODER = Registry("DECODER")
META_ATTENTION = Registry("ATTENTION")
META_TEXT_EMBEDDING = Registry("TEXT_EMBEDDING")
META_VISION_EMBEDDING = Registry("VISION_EMBEDDING")
META_WORD_EMBEDDING = Registry("WORD_EMBEDDING")
META_PRETRAINED_LANGUAGE_MODEL = Registry("PRETRAINED_LANGUAGE_MODEL")


def build_task(config):
    task_cls = META_TASK.get(config.TASK)
    return task_cls(config)


def build_model(config, vocab):
    """Instantiate a flax model description (no device move: JAX arrays are
    placed by shardings at call time, unlike model_builder.py:6-10)."""
    name = config.ARCHITECTURE
    # configs/iterative_m4c.yaml names ARCHITECTURE: M4C but carries the
    # home-grown IterativeM4C schema (DYNAMIC_EMBEDDING et al.) — the
    # reference crashes on it; dispatch by schema instead
    if name == "M4C" and config.get("OCR_DET_EMBEDDING") is not None:
        name = "IterativeM4C"
    model_cls = META_ARCHITECTURE.get(name)
    return model_cls(config=config, vocab=vocab)


def build_dataset(json_path, vocab, config):
    if json_path is None:
        return None
    dataset_cls = META_DATASET.get(config.TYPE)
    return dataset_cls(json_path, vocab, config)


def build_vocab(config):
    vocab_cls = META_VOCAB.get(config.TYPE)
    return vocab_cls(config)


def build_encoder(config):
    encoder_cls = META_ENCODER.get(config.ARCHITECTURE)
    return encoder_cls(config=config)


def build_decoder(config, vocab):
    decoder_cls = META_DECODER.get(config.ARCHITECTURE)
    return decoder_cls(config=config, vocab=vocab)


def build_attention(config):
    attention_cls = META_ATTENTION.get(config.ARCHITECTURE)
    return attention_cls(config=config)


def build_text_embedding(config, vocab):
    cls = META_TEXT_EMBEDDING.get(config.ARCHITECTURE)
    return cls(config=config, vocab=vocab)


def build_vision_embedding(config):
    cls = META_VISION_EMBEDDING.get(config.ARCHITECTURE)
    return cls(config=config)


def build_word_embedding(config):
    """One embedding or, reference-style, a LIST of names whose vectors the
    vocab concatenates (builders/word_embedding_builder.py iterates lists;
    Vocab.load_word_embeddings handles both)."""
    names = config.WORD_EMBEDDING
    cache = config.get("WORD_EMBEDDING_CACHE")
    if isinstance(names, (list, tuple)):
        return [META_WORD_EMBEDDING.get(n)(cache) for n in names]
    return META_WORD_EMBEDDING.get(names)(cache)


def build_pretrained_language_model(config, vocab=None):
    cls = META_PRETRAINED_LANGUAGE_MODEL.get(config.ARCHITECTURE)
    return cls(config=config, vocab=vocab)


_POPULATED = False


def populate() -> None:
    """Import all component packages so their registrations run."""
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True
    from . import data  # noqa: F401  (datasets + vocabs)
    from . import models  # noqa: F401  (architectures + modules)
    from . import training  # noqa: F401  (tasks)
