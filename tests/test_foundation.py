"""Foundation-layer tests: registry, config, instance/batch, text utils, vocab."""

import numpy as np
import pytest

from openvivqa_tpu.config import ConfigNode, get_config
from openvivqa_tpu.data.text_utils import is_japanese_sentence, preprocess_sentence
from openvivqa_tpu.data.vocab import ClassificationVocab, Vocab
from openvivqa_tpu.registry import Registry
from openvivqa_tpu.utils.instance import Instance, collate


def test_registry_roundtrip():
    reg = Registry("TEST")

    @reg.register()
    class Foo:
        pass

    assert reg.get("Foo") is Foo
    assert "Foo" in reg
    with pytest.raises(KeyError):
        reg.get("Bar")
    with pytest.raises(KeyError):
        reg.register(Foo)


def test_config_node(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text(
        "TASK: ClassificationTask\nMODEL:\n  D_MODEL: 512\n  DROPOUT: 0.1\n"
        "  WORD_EMBEDDING: null\n"
    )
    cfg = get_config(str(path))
    assert cfg.TASK == "ClassificationTask"
    assert cfg.MODEL.D_MODEL == 512
    assert cfg.MODEL.WORD_EMBEDDING is None
    assert cfg.MODEL.get("MISSING") is None
    with pytest.raises(AttributeError):
        _ = cfg.MODEL.MISSING
    # hashable + equality (needed as jit static argument)
    cfg2 = get_config(str(path))
    assert cfg == cfg2 and hash(cfg) == hash(cfg2)
    merged = cfg.merged({"MODEL": {"D_MODEL": 256}})
    assert merged.MODEL.D_MODEL == 256 and merged.MODEL.DROPOUT == 0.1


def test_preprocess_sentence():
    assert preprocess_sentence("Con mèo MÀU gì?") == ["con", "mèo", "màu", "gì", "?"]
    assert preprocess_sentence('màu "đỏ", (xanh) [vàng] a-b c/d!') == [
        "màu", '"', "đỏ", '"', ",", "(", "xanh", ")", "[", "vàng", "]",
        "a", "-", "b", "c", "/", "d", "!",
    ]
    assert preprocess_sentence("“quoted”") == ['"', "quoted", '"']


def test_is_japanese():
    assert is_japanese_sentence("これは何ですか")
    assert not is_japanese_sentence("con mèo màu gì")


def test_collate_static_shapes():
    samples = [
        Instance(
            question_tokens=np.array([1, 2, 3, 0], dtype=np.int32),
            feats=np.ones((5, 8), dtype=np.float32) * i,
            image_id=i,
            answers=[f"answer {i}"],
        )
        for i in range(3)
    ]
    batch = collate(samples, pad_to={"feats": 7}, batch_pad_to=4)
    assert batch.question_tokens.shape == (4, 4)
    assert batch.feats.shape == (4, 7, 8)
    assert np.all(batch.feats[:, 5:] == 0)  # static pad region
    assert batch.answers == [["answer 0"], ["answer 1"], ["answer 2"]]
    assert batch.sample_valid.tolist() == [True, True, True, False]
    assert batch.batch_size == 4
    arrays = batch.arrays()
    assert set(arrays) == {"question_tokens", "feats", "image_id", "sample_valid"}


def _vocab_config(paths, vocab_type="Vocab"):
    return ConfigNode(
        {
            "TYPE": vocab_type,
            "TOKENIZER": None,
            "MIN_FREQ": 1,
            "WORD_EMBEDDING": None,
            "WORD_EMBEDDING_CACHE": None,
            "PAD_TOKEN": "<pad>",
            "BOS_TOKEN": "<bos>",
            "EOS_TOKEN": "<eos>",
            "UNK_TOKEN": "<unk>",
            "JSON_PATH": {
                "TRAIN": paths["train"],
                "DEV": paths["dev"],
                "TEST": paths["test"],
            },
        }
    )


def test_vocab_roundtrip(synthetic_data):
    vocab = Vocab(_vocab_config(synthetic_data))
    assert vocab.padding_idx == 0 and vocab.bos_idx == 1
    assert vocab.eos_idx == 2 and vocab.unk_idx == 3
    # encode/decode roundtrip
    question = ["con", "mèo", "màu", "gì", "?"]
    vec = vocab.encode_question(question)
    assert vec.shape == (vocab.max_question_length,)
    assert vec[0] == vocab.bos_idx
    decoded = vocab.decode_question(vec[None, :], join_words=False)[0]
    assert decoded == question
    # answers
    answer = ["màu", "đỏ"]
    avec = vocab.encode_answer(answer)
    assert avec.shape == (vocab.max_answer_length,)
    assert vocab.decode_answer(avec[None, :], join_words=True)[0] == "màu đỏ"
    # frequency-then-alpha ordering: most frequent non-special first
    non_special = [vocab.itos[i] for i in range(4, min(10, len(vocab)))]
    freqs = [vocab.freqs[w] for w in non_special]
    assert freqs == sorted(freqs, reverse=True)


def test_classification_vocab(synthetic_data):
    vocab = ClassificationVocab(_vocab_config(synthetic_data, "ClassificationVocab"))
    assert vocab.total_answers == len(vocab.atoi) > 0
    some_answer = vocab.itoa[0].split()
    encoded = vocab.encode_answer(some_answer)
    assert encoded.shape == (1,)
    assert vocab.decode_answer(encoded, join_word=True)[0] == vocab.itoa[0]
    # deterministic ordering across rebuilds
    vocab2 = ClassificationVocab(_vocab_config(synthetic_data, "ClassificationVocab"))
    assert vocab.itoa == vocab2.itoa


def test_loader_process_sharding():
    """Multi-host batch sharding: explicit shards are disjoint, cover every
    batch exactly once, and share the same shuffled order (same seed)."""
    from openvivqa_tpu.data.loader import DataLoader

    class Ds:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return Instance(id=i, value=np.asarray([i], np.float32))

    def ids(loader):
        return [tuple(np.asarray(b["id"]).tolist()) for b in loader]

    full = DataLoader(Ds(), batch_size=4, shuffle=True, seed=5,
                      pad_last_batch=False, num_workers=1)
    shards = [
        DataLoader(Ds(), batch_size=4, shuffle=True, seed=5,
                   pad_last_batch=False, num_workers=1,
                   num_shards=3, shard_id=s)
        for s in range(3)
    ]
    full_batches = ids(full)
    shard_batches = [ids(s) for s in shards]
    assert sum(len(s) for s in shard_batches) == len(full_batches) == 6
    assert [len(s) for s in shards] == [len(b) for b in shard_batches]
    # round-robin partition of the SAME global order
    for s, batches in enumerate(shard_batches):
        assert batches == full_batches[s::3]


def test_loader_sharding_uneven_tail_pads_to_equal_counts():
    """When batches don't divide evenly across shards, every shard is
    padded to the SAME count by wrapping — per-host step counts must match
    or multi-host collectives deadlock at the tail.  Union still covers
    every batch."""
    from openvivqa_tpu.data.loader import DataLoader

    class Ds:
        def __len__(self):
            return 28  # 7 batches of 4 over 3 shards -> per-shard 3

        def __getitem__(self, i):
            return Instance(id=i, value=np.asarray([i], np.float32))

    def ids(loader):
        return [tuple(np.asarray(b["id"]).tolist()) for b in loader]

    full = DataLoader(Ds(), batch_size=4, shuffle=True, seed=5,
                      pad_last_batch=False, num_workers=1)
    shards = [
        DataLoader(Ds(), batch_size=4, shuffle=True, seed=5,
                   pad_last_batch=False, num_workers=1,
                   num_shards=3, shard_id=s)
        for s in range(3)
    ]
    full_batches = ids(full)
    assert len(full_batches) == 7
    shard_batches = [ids(s) for s in shards]
    assert [len(b) for b in shard_batches] == [3, 3, 3]
    assert [len(s) for s in shards] == [3, 3, 3]
    covered = {b for batches in shard_batches for b in batches}
    assert covered == set(full_batches)  # wrap duplicates, never drops


def test_loader_slow_consumer_still_terminates():
    """A consumer slower than the producer leaves the prefetch queue full
    when the producer finishes — the end-of-epoch sentinel must be a
    blocking put, not a drop (a dropped sentinel strands the consumer in
    queue.get() forever; this hung every epoch-long task loop)."""
    import threading
    import time

    from openvivqa_tpu.data.loader import DataLoader

    class Ds:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return Instance(id=i, value=np.asarray([i], np.float32))

    seen = []

    def consume():
        for batch in DataLoader(Ds(), batch_size=4, num_workers=1, prefetch=1):
            time.sleep(0.05)  # slower than production
            seen.append(int(np.asarray(batch["id"])[0]))

    worker = threading.Thread(target=consume, daemon=True)
    worker.start()
    worker.join(timeout=60)
    assert not worker.is_alive(), "loader never delivered the end sentinel"
    assert len(seen) == 4


def test_loader_abandoned_iterator_reaps_producer():
    """Breaking out of an epoch early must not leak the prefetch producer
    thread blocked in queue.put."""
    import threading

    from openvivqa_tpu.data.loader import DataLoader

    class Ds:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return Instance(id=i, value=np.asarray([i], np.float32))

    before = threading.active_count()
    for _ in range(5):
        it = iter(DataLoader(Ds(), batch_size=2, num_workers=2, prefetch=2))
        next(it)
        it.close()  # what GC does when the iterator is abandoned
    # generous slack for unrelated daemon threads, but 5 leaked producers
    # (+ their 2-worker pools) would exceed it
    assert threading.active_count() <= before + 3


def test_build_word_embedding_list_concatenates():
    """Reference-style WORD_EMBEDDING lists (word_embedding_builder.py
    iterates them) build a list of embeddings whose dims the vocab
    concatenates."""
    import os

    from openvivqa_tpu.builders import build_word_embedding, populate
    from openvivqa_tpu.config import ConfigNode

    populate()
    os.environ["OPENVIVQA_ALLOW_RANDOM_EMBEDDINGS"] = "1"
    try:
        cfg = ConfigNode(
            {
                "WORD_EMBEDDING": ["ViFastText", "PhoW2VWord300"],
                "WORD_EMBEDDING_CACHE": None,
            }
        )
        embs = build_word_embedding(cfg)
        assert isinstance(embs, list) and len(embs) == 2
        assert all(e.dim == 300 for e in embs)
    finally:
        del os.environ["OPENVIVQA_ALLOW_RANDOM_EMBEDDINGS"]


def test_backbone_table_rows_rejects_unknown_checkpoint():
    """An unknown PRETRAINED_NAME without PRETRAINED_VOCAB_SIZE must raise:
    nn.Embed clamps out-of-range ids under jit, so a guessed default table
    silently corrupts every high tokenizer id."""
    import pytest

    from openvivqa_tpu.config import ConfigNode
    from openvivqa_tpu.models.modules.pretrained_embeddings import (
        backbone_table_rows,
    )

    assert backbone_table_rows(
        ConfigNode({"PRETRAINED_NAME": "bert-base-uncased"}), 100
    ) == 30522
    assert backbone_table_rows(
        ConfigNode({"PRETRAINED_NAME": "x/unknown",
                    "PRETRAINED_VOCAB_SIZE": 12345}), 100
    ) == 12345
    with pytest.raises(ValueError, match="PRETRAINED_VOCAB_SIZE"):
        backbone_table_rows(ConfigNode({"PRETRAINED_NAME": "x/unknown"}), 100)


def test_config_node_pickle_and_deepcopy():
    """ConfigNode must survive pickle and deepcopy (its raising __setattr__
    plus __slots__ used to break slot-state restoration) — vocab caches and
    checkpoint metadata may embed configs."""
    import copy
    import pickle

    cfg = ConfigNode({"A": 1, "B": {"C": [1, 2]}})
    back = pickle.loads(pickle.dumps(cfg))
    assert back == cfg and back.B.C == (1, 2)
    dup = copy.deepcopy(cfg)
    assert dup == cfg
