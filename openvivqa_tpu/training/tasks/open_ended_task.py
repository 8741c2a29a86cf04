"""Open-ended (generative) VQA task.

Parity: /root/reference/tasks/open_ended_task.py:23-328 — XE training on
teacher-forced log-probs vs shifted answers, beam-search dev evaluation with
groupby dedup, Noam LR schedule, CIDEr early stopping, SCST self-critical
path (train_scst; disabled in start() like the reference), test prediction
dump.  TrainingSAAATask (training_saaa_task.py:8-25) is the constant-LR
variant.
"""

from __future__ import annotations

import itertools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ...builders import META_TASK, build_dataset
from ...data.loader import DataLoader
from ...evaluation import Cider, compute_scores
from ...logging_utils import setup_logger
from ..checkpoint import BEST_NAME, LAST_NAME, promote
from ..decode import generate
from ..optim import constant_lambda_schedule
from ..train_state import nll_loss
from .base_task import BaseTask

logger = setup_logger()


@META_TASK.register()
class OpenEndedTask(BaseTask):
    def configuring_hyperparameters(self, config):
        self.epoch = 0
        self.warmup = config.TRAINING.WARMUP
        self.score_name = config.TRAINING.SCORE
        self.learning_rate = config.TRAINING.LEARNING_RATE
        self.rl_learning_rate = config.TRAINING.get("RL_LEARNING_RATE", 5e-6)
        self.training_beam_size = config.TRAINING.TRAINING_BEAM_SIZE
        self.evaluating_beam_size = config.TRAINING.EVALUATING_BEAM_SIZE
        self.patience_limit = config.TRAINING.PATIENCE
        self.max_epochs = config.TRAINING.get("MAX_EPOCHS")
        # pre-computed document frequencies for the SCST CIDEr reward
        # (open_ended_task.py:103 parity)
        self.train_cider = Cider(
            {f"{i}": [" ".join(a)] for i, a in enumerate(self.train_dataset.answers)}
        )

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
        self.train_dict_dataset = build_dataset(
            config.JSON_PATH.TRAIN, self.vocab, config.DICT_DATASET
        )
        self.dev_dict_dataset = build_dataset(
            config.JSON_PATH.DEV, self.vocab, config.DICT_DATASET
        )
        self.test_dict_dataset = build_dataset(
            config.JSON_PATH.TEST, self.vocab, config.DICT_DATASET
        )

    def create_dataloaders(self, config):
        fd = config.DATASET.FEATURE_DATASET
        dd = config.DATASET.DICT_DATASET
        seed = int(config.TRAINING.get("SEED", 42))
        workers = fd.get("WORKERS", 4) or 1
        self.train_dataloader = DataLoader(
            self.train_dataset, batch_size=fd.BATCH_SIZE, shuffle=True,
            num_workers=workers, seed=seed,
        )
        self.dev_dataloader = DataLoader(
            self.dev_dataset, batch_size=fd.BATCH_SIZE, shuffle=False,
            num_workers=workers, seed=seed,
        )
        self.test_dataloader = DataLoader(
            self.test_dataset, batch_size=fd.BATCH_SIZE, shuffle=False,
            num_workers=workers, seed=seed,
        )
        # beam memory scales with beam size (open_ended_task.py:72-89);
        # hyperparameters are configured after dataloaders, so read config
        train_dict_bs = max(
            1, dd.BATCH_SIZE // config.TRAINING.TRAINING_BEAM_SIZE
        )
        eval_dict_bs = max(
            1, dd.BATCH_SIZE // config.TRAINING.EVALUATING_BEAM_SIZE
        )
        self.train_dict_dataloader = DataLoader(
            self.train_dict_dataset, batch_size=train_dict_bs, shuffle=True,
            num_workers=workers, seed=seed,
        )
        self.dev_dict_dataloader = DataLoader(
            self.dev_dict_dataset, batch_size=eval_dict_bs, shuffle=False,
            num_workers=workers, seed=seed,
        )
        self.test_dict_dataloader = DataLoader(
            self.test_dict_dataset, batch_size=eval_dict_bs, shuffle=False,
            num_workers=workers, seed=seed,
        )

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
            targets = batch["shifted_right_answer_tokens"]
            weights = jnp.broadcast_to(
                batch["sample_valid"][:, None], targets.shape
            ).astype(out.dtype)
            return nll_loss(
                out.reshape(-1, out.shape[-1]),
                targets.reshape(-1),
                padding_idx,
                weights=weights.reshape(-1),
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    def _compiled(self):
        if not hasattr(self, "_train_step_jit"):
            self._train_step_jit = jax.jit(self._train_step, donate_argnums=(0,))
            self._generate_cache = {}
        return self._train_step_jit

    def _generate_fn(self, batch_size: int, beam_size: int, out_size: int = 1):
        self._compiled()
        key = (batch_size, beam_size, out_size)
        if key not in self._generate_cache:
            model = self.model

            def run(variables, batch):
                return generate(
                    model, variables, batch,
                    batch_size=batch_size, beam_size=beam_size, out_size=out_size,
                )

            self._generate_cache[key] = jax.jit(run)
        return self._generate_cache[key]

    # -- loops -----------------------------------------------------------------
    def train(self):
        from ..profiling import StepTimer, maybe_trace

        train_step = self._compiled()
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
                # device-side accumulation: one host sync per epoch instead
                # of one per step (dispatch stays async)
                losses.append(loss)
                timer.stop()
        count = len(losses)
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        elapsed = time.time() - start
        logger.info(
            "Epoch %d - XE training: loss=%.4f (%d it, %.1fs)",
            self.epoch, mean_loss, count, elapsed,
        )
        self.log_metrics(
            {"phase": "train", "loss": mean_loss, "iterations": count,
             "seconds": elapsed,
             # epoch wall-clock throughput: the device-time regression
             # signal (dispatch is async; the epoch-end loss sync bounds
             # real device time) — compare across runs in metrics.jsonl
             "samples_per_sec": round(
                 count * self.train_dataloader.batch_size / max(elapsed, 1e-9), 2
             ),
             **timer.summary()}
        )

    def _decode_batch(self, outs: np.ndarray, batch=None):
        """Token ids -> deduped strings (open_ended_task.py:139-146);
        OCR-aware subclasses use `batch` for the per-sample OCR tables."""
        token_lists = self.vocab.decode_answer(
            outs.reshape(-1, self.vocab.max_answer_length), join_words=False
        )
        return [
            " ".join(k for k, _ in itertools.groupby(tokens))
            for tokens in token_lists
        ]

    def evaluate_metrics(self, dataloader) -> dict:
        gens, gts = {}, {}
        run = self._generate_fn(dataloader.batch_size, self.evaluating_beam_size)
        for it, (batch, device_batch) in enumerate(self.device_batches(dataloader)):
            outs, _ = run(self.state.variables(), device_batch)
            answers_gen = self._decode_batch(np.asarray(outs), batch)
            for i, (gts_i, gen_i) in enumerate(zip(batch["answers"], answers_gen)):
                if not batch["sample_valid"][i]:
                    continue
                key = self.eval_key(batch, it, i)
                gens[key] = [gen_i]
                gts[key] = gts_i
        from ...parallel.multihost import gather_eval_dicts

        gts, gens = gather_eval_dicts(gts, gens)
        scores, _ = compute_scores(gts, gens)
        return scores

    def train_scst(self):
        """Self-critical sequence training (open_ended_task.py:171-208):
        beam-sample K answers, CIDEr reward vs mean-of-beam baseline,
        policy gradient on the summed log-probs.  Host-side reward between
        two device computations (SURVEY.md §7.3.7)."""
        beam = self.training_beam_size
        run = self._generate_fn(
            self.train_dict_dataloader.batch_size, beam, out_size=beam
        )

        def scst_grad(state, batch, advantages, outs):
            # re-run decode teacher-forced on the sampled sequences to get
            # differentiable log-probs
            def loss_fn(params):
                variables = {
                    "params": params,
                    **({"frozen": state.frozen} if state.frozen else {}),
                }
                bs, k, L = outs.shape
                flat = outs.reshape(bs * k, L)
                rep_batch = {
                    key: jnp.repeat(value, k, axis=0)
                    for key, value in batch.items()
                }
                enc, bias = self.model.apply(
                    variables, rep_batch, method=self.model.encode
                )
                bos = jnp.full((bs * k, 1), self.vocab.bos_idx, flat.dtype)
                dec_in = jnp.concatenate([bos, flat[:, :-1]], axis=1)
                logprobs = self.model.apply(
                    variables, dec_in, enc, bias,
                    method=self.model.decode_teacher_forced,
                )
                tok_lp = jnp.take_along_axis(logprobs, flat[..., None], -1)[..., 0]
                mask = (flat != self.vocab.padding_idx).astype(tok_lp.dtype)
                # reference scales by mean over max_len (open_ended_task.py:197
                # `-torch.mean(log_probs, -1)`), so short answers get
                # proportionally smaller gradients; divide by the static L,
                # not the per-sample token count.  (Loss *value* still differs
                # from the reference, whose post-eos slots hold constant -999
                # fills instead of masked zeros — gradients are identical.)
                seq_lp = jnp.sum(tok_lp * mask, -1) / float(flat.shape[1])
                return jnp.mean(-seq_lp.reshape(bs, k) * advantages)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads), loss

        if not hasattr(self, "_scst_jit"):
            self._scst_jit = jax.jit(scst_grad)

        running_loss = running_reward = 0.0
        count = 0
        # SCST is host-synced per step (CIDEr rewards), but prefetching still
        # overlaps the next batch's H2D copy with this step's decode
        for batch, device_batch in self.device_batches(self.train_dict_dataloader):
            outs, _ = run(self.state.variables(), device_batch)
            outs_np = np.asarray(outs)
            bs = outs_np.shape[0]
            valid = np.asarray(batch["sample_valid"])
            n_real = int(valid.sum())
            answers_gen = self._decode_batch(outs_np[:n_real], batch)
            answers_gt = list(
                itertools.chain(*([a] * beam for a in batch["answers"]))
            )
            gens = {f"{i}": [g] for i, g in enumerate(answers_gen)}
            gts = {f"{i}": gt for i, gt in enumerate(answers_gt)}
            reward = np.zeros((bs, beam), np.float32)
            reward[:n_real] = (
                self.train_cider.compute_score(gts, gens)[1]
                .astype(np.float32)
                .reshape(n_real, beam)
            )
            advantages = jnp.asarray(
                (reward - reward.mean(-1, keepdims=True)) * valid[:, None]
            )
            self.state, loss = self._scst_jit(
                self.state, device_batch, advantages, jnp.asarray(outs_np)
            )
            running_loss += float(loss)
            # real rows only: averaging over the zeroed padding rows of the
            # final partial batch would understate the epoch reward
            running_reward += float(reward[:n_real].mean()) if n_real else 0.0
            count += 1
        mean_loss = running_loss / max(count, 1)
        mean_reward = running_reward / max(count, 1)
        logger.info(
            "Epoch %d - SCST: loss=%.4f reward=%.4f (%d it)",
            self.epoch, mean_loss, mean_reward, count,
        )
        return mean_loss, mean_reward

    def _switch_to_scst(self, resume: bool = False):
        """Swap the optimizer to Adam(rl_learning_rate) for self-critical
        training (the protocol the reference keeps commented out,
        open_ended_task.py:224-266, incl. reloading the best weights).

        Only the XE->RL TRANSITION reloads best and re-initializes the
        optimizer; RESUMING a run already checkpointed in the RL phase
        swaps just the tx — the restored params/Adam-moments/RNG ARE the
        SCST progress and must survive (both phases are optax.adam, so the
        checkpointed opt_state structure matches)."""
        from ..optim import make_optimizer

        tx = make_optimizer(lambda step: jnp.asarray(self.rl_learning_rate))
        if resume:
            self.state = self.state.replace(tx=tx)
        else:
            best = os.path.join(self.checkpoint_path, BEST_NAME)
            if os.path.isfile(best):
                self.load_checkpoint(best)
            self.state = self.state.replace(
                tx=tx, opt_state=tx.init(self.state.params)
            )
        # the SCST step compiles against the new optimizer
        if hasattr(self, "_scst_jit"):
            del self._scst_jit
        logger.info(
            "Switching to SCST (lr=%s)%s",
            self.rl_learning_rate, " [resume]" if resume else "",
        )

    def start(self):
        last = os.path.join(self.checkpoint_path, LAST_NAME)
        metadata = self.load_checkpoint(last) if os.path.isfile(last) else None
        if metadata is not None:
            best_val_score = metadata["best_val_score"]
            patience = metadata["patience"]
            use_rl = metadata.get("use_rl", False)
            self.epoch = metadata["epoch"] + 1
        else:
            best_val_score, patience, use_rl = -1.0, 0, False
        use_scst = bool(self.config.TRAINING.get("USE_SCST", False))
        if use_rl:
            self._switch_to_scst(resume=True)

        while True:
            if use_rl:
                self.train_scst()
            else:
                self.train()

            scores = self.evaluate_metrics(self.dev_dict_dataloader)
            logger.info("Validation scores %s", scores)
            self.log_metrics({"phase": "validation", **scores})
            val_score = scores[self.score_name]

            best = val_score > best_val_score
            if best:
                best_val_score, patience = val_score, 0
            else:
                patience += 1

            exit_train = False
            # >= not ==: the reference's equality test
            # (open_ended_task.py:251) never fires again after resuming a
            # run that exited AT the limit (patience overshoots forever)
            if patience >= self.patience_limit:
                if use_scst and not use_rl:
                    use_rl = True
                    patience = 0
                    self._switch_to_scst()
                else:
                    logger.info("patience reached.")
                    exit_train = True
            if self.max_epochs is not None and self.epoch + 1 >= self.max_epochs:
                exit_train = True

            self.save_checkpoint(
                {
                    "best_val_score": best_val_score,
                    "patience": patience,
                    "use_rl": use_rl,
                }
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

        run = self._generate_fn(
            self.test_dict_dataloader.batch_size, self.evaluating_beam_size
        )
        results = []
        overall_gens, overall_gts = {}, {}
        for it, (batch, device_batch) in enumerate(
            self.device_batches(self.test_dict_dataloader)
        ):
            outs, _ = run(self.state.variables(), device_batch)
            answers_gen = self._decode_batch(np.asarray(outs), batch)
            gens, gts = {}, {}
            for i, (gts_i, gen_i) in enumerate(zip(batch["answers"], answers_gen)):
                if not batch["sample_valid"][i]:
                    continue
                key = f"{it}_{i}"
                gens[key] = gen_i
                gts[key] = gts_i
                overall_gens[key] = [gen_i]
                overall_gts[key] = gts_i
            valid = np.asarray(batch["sample_valid"])
            results.append(
                {
                    "id": [int(x) for x in np.asarray(batch["question_id"])[valid]],
                    "image_id": [
                        int(x) for x in np.asarray(batch["image_id"])[valid]
                    ],
                    "filename": [
                        f for f, v in zip(batch["filename"], valid) if v
                    ],
                    "gens": gens,
                    "gts": gts,
                }
            )

        scores, _ = compute_scores(overall_gts, overall_gens)
        logger.info("Evaluation scores on test: %s", scores)
        self.dump_json("test_results.json", {"results": results, **scores})
        return scores


@META_TASK.register()
class TrainingSAAATask(OpenEndedTask):
    """OpenEndedTask with the constant LambdaLR schedule
    (training_saaa_task.py:8-25 parity)."""

    def lr_schedule(self):
        return constant_lambda_schedule(self.learning_rate)
