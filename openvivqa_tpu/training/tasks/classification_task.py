"""Answer-classification task (ViVQA).

Parity: /root/reference/tasks/classification_task.py:33-236 — NLL loss over
log-softmax class scores (ignore_index=padding_idx, a reference quirk kept:
class id 0 is ignored by the loss), constant LambdaLR schedule
(effective lr = LEARNING_RATE**2), CIDEr-scored early stopping with
patience, last/best checkpoints, test_results.json dump.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ...builders import META_TASK, build_dataset
from ...data.loader import DataLoader
from ...evaluation import compute_scores
from ...logging_utils import setup_logger
from ..checkpoint import BEST_NAME, LAST_NAME, promote
from ..optim import constant_lambda_schedule
from ..train_state import nll_loss
from .base_task import BaseTask

logger = setup_logger()


@META_TASK.register()
class ClassificationTask(BaseTask):
    def configuring_hyperparameters(self, config):
        self.epoch = 0
        self.score_name = config.TRAINING.SCORE
        self.learning_rate = config.TRAINING.LEARNING_RATE
        self.patience_limit = config.TRAINING.PATIENCE
        self.max_epochs = config.TRAINING.get("MAX_EPOCHS")

    def lr_schedule(self):
        return constant_lambda_schedule(self.learning_rate)

    def load_datasets(self, config):
        self.train_dataset = build_dataset(
            config.JSON_PATH.TRAIN, self.vocab, config.FEATURE_DATASET
        )
        self.dev_dataset = build_dataset(
            config.JSON_PATH.DEV, self.vocab, config.FEATURE_DATASET
        )
        self.test_dataset = build_dataset(
            config.JSON_PATH.TEST, self.vocab, config.FEATURE_DATASET
        )

    def create_dataloaders(self, config):
        fd = config.DATASET.FEATURE_DATASET
        seed = int(config.TRAINING.get("SEED", 42))
        common = dict(
            batch_size=fd.BATCH_SIZE, num_workers=fd.get("WORKERS", 4) or 1, seed=seed
        )
        self.train_dataloader = DataLoader(self.train_dataset, shuffle=True, **common)
        self.dev_dataloader = DataLoader(self.dev_dataset, shuffle=False, **common)
        self.test_dataloader = DataLoader(self.test_dataset, shuffle=False, **common)

    # -- jitted steps ----------------------------------------------------------
    def _train_step(self, state, batch, dropout_rng):
        padding_idx = self.vocab.padding_idx

        forward = self.maybe_remat(
            lambda params: state.apply_fn(
                {"params": params, **({"frozen": state.frozen} if state.frozen else {})},
                batch,
                train=True,
                rngs={"dropout": dropout_rng},
            )
        )

        def loss_fn(params):
            out = forward(params)
            targets = batch["answer"].reshape(-1)
            logprobs = out.reshape(-1, out.shape[-1])
            weights = batch["sample_valid"].astype(out.dtype)
            return nll_loss(logprobs, targets, padding_idx, weights=weights)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    def _eval_step(self, state, batch):
        out = state.apply_fn(
            {"params": state.params, **({"frozen": state.frozen} if state.frozen else {})},
            batch,
            train=False,
        )
        return jnp.argmax(out, axis=-1)

    def _compiled(self):
        if not hasattr(self, "_train_step_jit"):
            self._train_step_jit = jax.jit(self._train_step, donate_argnums=(0,))
            self._eval_step_jit = jax.jit(self._eval_step)
        return self._train_step_jit, self._eval_step_jit

    # -- loops -----------------------------------------------------------------
    def train(self):
        from ..profiling import StepTimer, maybe_trace

        train_step, _ = self._compiled()
        losses = []
        timer = StepTimer()
        start = time.time()
        rngs = self.epoch_rngs(len(self.train_dataloader))
        with maybe_trace(self.profile_dir, enabled=self.epoch == 0):
            for rng, (_, device_batch) in zip(
                rngs, self.device_batches(self.train_dataloader)
            ):
                timer.start()
                self.state, loss = train_step(self.state, device_batch, rng)
                # keep the loss on device — a float() here would sync the
                # host every step and serialize dispatch with compute (over
                # the axon tunnel that is a full RT per step)
                losses.append(loss)
                timer.stop()
        count = len(losses)
        mean_loss = (
            float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        )  # single host sync per epoch
        elapsed = time.time() - start
        logger.info(
            "Epoch %d - training: loss=%.4f (%d it, %.1fs)",
            self.epoch, mean_loss, count, elapsed,
        )
        self.log_metrics(
            {"phase": "train", "loss": mean_loss, "iterations": count,
             "seconds": elapsed, **timer.summary()}
        )

    def _decode_eval(self, preds: np.ndarray, batch):
        """(gt strings, gen strings) for one batch — OCR-choice subclasses
        override with per-sample OCR tables (ocr_tasks.py)."""
        answers_gt = self.vocab.decode_answer(
            batch["answer"].reshape(-1), join_word=True
        )
        answers_gen = self.vocab.decode_answer(preds, join_word=True)
        return answers_gt, answers_gen

    def evaluate_metrics(self, dataloader) -> dict:
        _, eval_step = self._compiled()
        gens, gts = {}, {}
        for it, (batch, device_batch) in enumerate(self.device_batches(dataloader)):
            preds = np.asarray(eval_step(self.state, device_batch))
            answers_gt, answers_gen = self._decode_eval(preds, batch)
            for i, (gt, gen) in enumerate(zip(answers_gt, answers_gen)):
                if not batch["sample_valid"][i]:
                    continue
                key = self.eval_key(batch, it, i)
                gens[key] = [gen]
                gts[key] = [gt]
        from ...parallel.multihost import gather_eval_dicts

        gts, gens = gather_eval_dicts(gts, gens)
        scores, _ = compute_scores(gts, gens)
        return scores

    def _filter_scores(self, scores: dict) -> dict:
        verbose = self.config.TRAINING.get("VERBOSE_SCORES")
        if verbose:
            return {k: v for k, v in scores.items() if k in verbose}
        return scores

    def start(self):
        last = os.path.join(self.checkpoint_path, LAST_NAME)
        metadata = self.load_checkpoint(last) if os.path.isfile(last) else None
        if metadata is not None:
            best_val_score = metadata["best_val_score"]
            patience = metadata["patience"]
            self.epoch = metadata["epoch"] + 1
        else:
            # the reference starts at 0.0 (classification_task.py:160), which
            # never promotes a best checkpoint when scores stay at 0 and then
            # breaks get_predictions; -1 guarantees epoch 1 writes one
            best_val_score, patience = -1.0, 0

        while True:
            self.train()

            scores = self.evaluate_metrics(self.dev_dataloader)
            # early-stop metric from the UNFILTERED dict: a VERBOSE_SCORES
            # list omitting TRAINING.SCORE must not KeyError validation
            val_score = scores[self.score_name]
            scores = self._filter_scores(scores)
            logger.info("Validation scores %s", scores)
            self.log_metrics({"phase": "validation", **scores})

            best = val_score > best_val_score
            if best:
                best_val_score, patience = val_score, 0
            else:
                patience += 1

            # >= not ==: resuming a run that exited AT the limit would
            # overshoot and never terminate (open_ended_task.py same fix)
            exit_train = patience >= self.patience_limit
            if exit_train:
                logger.info("patience reached.")
            if self.max_epochs is not None and self.epoch + 1 >= self.max_epochs:
                exit_train = True

            self.save_checkpoint(
                {"best_val_score": best_val_score, "patience": patience}
            )
            if best:
                promote(
                    os.path.join(self.checkpoint_path, LAST_NAME),
                    os.path.join(self.checkpoint_path, BEST_NAME),
                )
            if exit_train:
                break
            self.epoch += 1

    def get_predictions(self):
        best = os.path.join(self.checkpoint_path, BEST_NAME)
        if not os.path.isfile(best):
            raise FileNotFoundError(
                "Prediction requires a trained model: no best_model checkpoint "
                f"in {self.checkpoint_path}"
            )
        self.load_checkpoint(best)

        _, eval_step = self._compiled()
        results = []
        overall_gens, overall_gts = {}, {}
        for it, (batch, device_batch) in enumerate(
            self.device_batches(self.test_dataloader)
        ):
            preds = np.asarray(eval_step(self.state, device_batch))
            answers_gt, answers_gen = self._decode_eval(preds, batch)
            gens, gts = {}, {}
            for i, (gt, gen) in enumerate(zip(answers_gt, answers_gen)):
                if not batch["sample_valid"][i]:
                    continue
                key = f"{it}_{i}"
                gens[key] = gen
                gts[key] = gt
                overall_gens[key] = [gen]
                overall_gts[key] = [gt]
            results.append(
                {
                    "id": [int(x) for x in np.asarray(batch["question_id"])[
                        np.asarray(batch["sample_valid"])
                    ]],
                    "filename": [
                        f for f, v in zip(batch["filename"], batch["sample_valid"]) if v
                    ],
                    "gens": gens,
                    "gts": gts,
                }
            )

        scores, _ = compute_scores(overall_gts, overall_gens)
        scores = self._filter_scores(scores)
        logger.info("Evaluation scores on test: %s", scores)
        self.dump_json("test_results.json", {"results": results, **scores})
        return scores
