"""Base task: vocab caching, model/optimizer build, jitted steps, checkpoints.

Parity: /root/reference/tasks/base_task.py:18-118 — same responsibilities,
TPU-native execution: one jitted train_step with donated state, batch arrays
sharded over the data mesh axis, parameters replicated.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...builders import build_model, build_vocab
from ...logging_utils import setup_logger
from ...parallel.mesh import (
    DATA_AXIS,
    _axis_size,
    get_mesh,
    get_mesh_2d,
    replicate_spec,
    shard_batch_spec,
    shard_state,
)
from ...utils.instance import Batch, collate
from ..checkpoint import LAST_NAME, load_checkpoint, save_checkpoint
from ..optim import make_optimizer, noam_schedule
from ..train_state import TrainState

logger = setup_logger()


class BaseTask:
    def __init__(self, config):
        self.config = config
        self.checkpoint_path = os.path.join(
            config.TRAINING.CHECKPOINT_PATH, config.MODEL.NAME
        )
        os.makedirs(self.checkpoint_path, exist_ok=True)

        vocab_bin = os.path.join(self.checkpoint_path, "vocab.bin")
        if not os.path.isfile(vocab_bin):
            logger.info("Creating vocab")
            self.vocab = self.load_vocab(config.DATASET.VOCAB)
            with open(vocab_bin, "wb") as handle:
                pickle.dump(self.vocab, handle)
        else:
            logger.info("Loading vocab from %s", vocab_bin)
            with open(vocab_bin, "rb") as handle:
                self.vocab = pickle.load(handle)

        logger.info("Loading data")
        self.load_datasets(config.DATASET)
        self.create_dataloaders(config)

        logger.info("Building model")
        self.model = build_model(config.MODEL, self.vocab)
        # TRAINING.MESH: {MODEL_PARALLEL: n, FSDP: bool} switches the task
        # from pure DP (replicated params) to a (data, model) mesh with
        # tensor-parallel kernels and optionally ZeRO-3-style param/optimizer
        # sharding over the data axis.  The reference is single-device.
        mesh_config = config.TRAINING.get("MESH")
        if mesh_config:
            self.mesh = get_mesh_2d(
                model_parallel=int(mesh_config.get("MODEL_PARALLEL", 1))
            )
            self.fsdp = bool(mesh_config.get("FSDP"))
        else:
            self.mesh = get_mesh()
            self.fsdp = False
        logger.info(
            "Device mesh: %s (fsdp=%s)",
            dict(zip(self.mesh.axis_names, self.mesh.devices.shape)),
            self.fsdp,
        )
        # register the mesh for the Pallas kernels: their pallas_calls are
        # GSPMD-opaque, so under a multi-device mesh each kernel wrapper
        # shard_maps itself over the data axis (ops/sharding.py) instead
        # of letting GSPMD replicate the full batch per chip
        from ...ops.sharding import set_kernel_mesh

        set_kernel_mesh(self.mesh)
        # PRNG impl: threefry mask generation measured 1.78 ms/step at MCAN
        # train dims on v5e vs 0.82 ms with the TPU hardware rbg generator —
        # dropout masks were ~17% of the whole train step.  Statistically
        # equivalent streams; override with TRAINING.PRNG_IMPL.
        impl = config.TRAINING.get("PRNG_IMPL")
        if not impl:
            impl = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
        self._rng_impl = str(impl)
        self.rng = jax.random.key(
            int(config.TRAINING.get("SEED", 42)), impl=self._rng_impl
        )

        self.configuring_hyperparameters(config)
        self.state = self._init_state()
        self.epoch = 0

    # -- hooks ---------------------------------------------------------------
    def configuring_hyperparameters(self, config):
        raise NotImplementedError

    def load_vocab(self, config):
        return build_vocab(config)

    def load_datasets(self, config):
        raise NotImplementedError

    def create_dataloaders(self, config):
        raise NotImplementedError

    # -- setup ---------------------------------------------------------------
    def lr_schedule(self):
        return noam_schedule(
            self.config.TRAINING.LEARNING_RATE,
            self.config.MODEL.D_MODEL,
            self.config.TRAINING.WARMUP,
        )

    def example_batch(self) -> Batch:
        """One statically-shaped batch for model init (shapes only)."""
        dataset = self.train_dataset
        bs = min(2, len(dataset))
        samples = [dataset[i] for i in range(bs)]
        return collate(samples, batch_pad_to=bs)

    def _init_state(self) -> TrainState:
        batch = self.example_batch()
        self.rng, init_rng = jax.random.split(self.rng)
        # jit the init: eager flax init compiles every primitive separately
        # (minutes even for tiny models); one jitted trace compiles once
        init_fn = jax.jit(
            lambda rngs, arrays: self.model.init(rngs, arrays, train=False)
        )
        variables = init_fn({"params": init_rng, "dropout": init_rng}, batch.arrays())
        params = variables["params"]
        # Configs naming pretrained backbones must resolve local weights
        # (hard-fail policy + runtime grafting; the reference loads hub
        # weights unconditionally, text_embeddings.py:303-337)
        from ...models.modules.pretrained_loading import apply_pretrained_policy

        params, _ = apply_pretrained_policy(self.config.MODEL, params)
        frozen = dict(variables.get("frozen", {}))
        n_params = sum(p.size for p in jax.tree.leaves(params))
        logger.info("Model parameters: %.2fM", n_params / 1e6)

        tx = make_optimizer(self.lr_schedule())
        state = TrainState.create(self.model.apply, params, frozen, tx)
        return shard_state(state, self.mesh, self.fsdp)

    def put_batch(self, batch: Batch) -> Dict[str, jnp.ndarray]:
        arrays = batch.arrays()
        # TRAINING.TRANSFER_DTYPE (e.g. bfloat16): cast float features on
        # host before the H2D copy — halves transfer bytes.  Epochs are
        # bandwidth-bound once transfers overlap compute (device_batches);
        # matmuls against f32 params promote back to f32 on device.
        transfer_dtype = self.config.TRAINING.get("TRANSFER_DTYPE")
        if transfer_dtype:
            import ml_dtypes

            target = np.dtype(getattr(ml_dtypes, transfer_dtype, transfer_dtype))
            arrays = {
                k: v.astype(target) if v.dtype == np.float32 else v
                for k, v in arrays.items()
            }
        bs = next(iter(arrays.values())).shape[0] if arrays else 0
        if bs % max(_axis_size(self.mesh, DATA_AXIS), 1) == 0:
            spec = shard_batch_spec(self.mesh)
        else:
            # batch not divisible by the data axis (tiny eval batches):
            # replicate rather than fail; XLA still partitions the compute
            spec = replicate_spec(self.mesh)
        return {k: jax.device_put(v, spec) for k, v in arrays.items()}

    def next_dropout_rng(self):
        self.rng, rng = jax.random.split(self.rng)
        return rng

    def epoch_rngs(self, n: int):
        """n dropout keys in ONE device dispatch.  Splitting per step adds a
        host round-trip between consecutive train steps (measured: 15.1 ->
        10.7 ms/step on MCAN @ 64 over the TPU tunnel)."""
        return list(jax.random.split(self.next_dropout_rng(), max(int(n), 1)))

    def device_batches(self, dataloader, depth: int = 2):
        """Yield (host_batch, device_batch) with `depth` batches already
        transferring: device_put is async, so issuing batch i+1's H2D copy
        before consuming batch i overlaps the transfer with the current
        step's compute.  At MCAN bench dims one batch is ~26 MB of features
        — without this the step serializes behind its own input copy."""
        from collections import deque

        iterator = iter(dataloader)
        queue: "deque" = deque()

        def fill() -> None:
            try:
                host = next(iterator)
            except StopIteration:
                return
            queue.append((host, self.put_batch(host)))

        for _ in range(max(1, depth)):
            fill()
        while queue:
            host, device = queue.popleft()
            fill()
            yield host, device

    def maybe_remat(self, forward_fn):
        """TRAINING.REMAT: true wraps the forward in jax.checkpoint so the
        backward pass recomputes activations instead of storing them —
        trades ~1.3x step FLOPs for O(model) activation memory (HBM
        headroom for larger batches; the reference has no equivalent)."""
        if self.config.TRAINING.get("REMAT"):
            return jax.checkpoint(forward_fn)
        return forward_fn

    def dump_json(self, filename: str, payload: Dict[str, Any]) -> None:
        """Primary-process-gated prediction dump into the checkpoint dir
        (multi-host runs on a shared dir would interleave concurrent
        writers into corrupt JSON — same policy as save_checkpoint)."""
        import json

        from ...parallel.multihost import is_primary

        if not is_primary():
            return
        with open(os.path.join(self.checkpoint_path, filename), "w+") as handle:
            json.dump(payload, handle, ensure_ascii=False)

    @staticmethod
    def eval_key(batch, it: int, i: int) -> str:
        """Global sample key for eval dicts: the dataset's question_id when
        present (stable across hosts, so gather_eval_dicts merges the
        duplicate batches that loader sharding wraps in at the uneven
        tail), else a host-unique (process, iteration, row) triple."""
        qids = batch.get("question_id")
        if qids is not None:
            return f"q{qids[i]}"
        return f"h{jax.process_index()}_{it}_{i}"

    # -- observability -----------------------------------------------------------
    def log_metrics(self, payload: Dict[str, Any]) -> None:
        """Append one JSONL record to <ckpt>/metrics.jsonl (the reference
        only logs to console, SURVEY.md §5.5)."""
        import json
        import time as _time

        from ...parallel.multihost import is_primary

        if not is_primary():  # one record per epoch, not one per process
            return
        record = {"epoch": self.epoch, "time": _time.time(), **payload}
        with open(
            os.path.join(self.checkpoint_path, "metrics.jsonl"), "a"
        ) as handle:
            handle.write(json.dumps(record, default=str) + "\n")

    @property
    def profile_dir(self) -> Optional[str]:
        return self.config.TRAINING.get("PROFILE_DIR")

    # -- checkpoints -----------------------------------------------------------
    def save_checkpoint(self, extras: Dict[str, Any]) -> None:
        from ...parallel.multihost import is_primary

        if not is_primary():
            # params/opt-state are replicated (or re-shardable) — on a
            # shared checkpoint dir, concurrent writers to the same tmp
            # path would interleave into a corrupt pickle
            return
        metadata = {
            "epoch": self.epoch,
            # dropout PRNG stream resumes exactly (base_task.py:97-112 saves
            # all RNG states; jax's key is our device-side equivalent)
            "jax_rng_key": np.asarray(jax.random.key_data(self.rng)),
            "jax_rng_impl": self._rng_impl,
            **extras,
        }
        save_checkpoint(
            os.path.join(self.checkpoint_path, LAST_NAME), self.state, metadata
        )

    def load_checkpoint(self, fname: str) -> Optional[Dict[str, Any]]:
        result = load_checkpoint(fname, self.state)
        if result is None:
            return None
        logger.info("Loaded checkpoint from %s", fname)
        self.state = shard_state(result["state"], self.mesh, self.fsdp)
        key = result["metadata"].get("jax_rng_key")
        if key is not None:
            # pre-round-3 checkpoints stored raw threefry key data with no
            # impl tag
            impl = result["metadata"].get("jax_rng_impl", "threefry2x32")
            self._rng_impl = str(impl)
            self.rng = jax.random.wrap_key_data(
                jnp.asarray(key), impl=self._rng_impl
            )
        return result["metadata"]

    def start(self):
        raise NotImplementedError

    def get_predictions(self):
        raise NotImplementedError
