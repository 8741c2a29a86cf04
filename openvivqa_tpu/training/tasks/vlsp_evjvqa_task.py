"""EVJVQA contest task (VLSP2022): 4 splits (train/dev/public-test/
private-test).

Parity: /root/reference/tasks/vlsp_evjvqa_task.py:22-383 — OpenEndedTask
protocol with per-split prediction dumps (public_test_results.json /
private_test_results.json); missing test splits are skipped.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ...builders import META_TASK, build_dataset
from ...data.loader import DataLoader
from ...evaluation import compute_scores
from ...logging_utils import setup_logger
from ..checkpoint import BEST_NAME
from .open_ended_task import OpenEndedTask

logger = setup_logger()


@META_TASK.register()
class VlspEvjVqaTask(OpenEndedTask):
    def load_datasets(self, config):
        def build(split, dataset_config):
            path = config.JSON_PATH.get(split)
            return build_dataset(path, self.vocab, dataset_config) if path else None

        self.train_dataset = build("TRAIN", config.FEATURE_DATASET)
        self.dev_dataset = build("DEV", config.FEATURE_DATASET)
        self.public_test_dataset = build("PUBLIC_TEST", config.FEATURE_DATASET)
        self.private_test_dataset = build("PRIVATE_TEST", config.FEATURE_DATASET)
        self.train_dict_dataset = build("TRAIN", config.DICT_DATASET)
        self.dev_dict_dataset = build("DEV", config.DICT_DATASET)
        self.public_test_dict_dataset = build("PUBLIC_TEST", config.DICT_DATASET)
        self.private_test_dict_dataset = build("PRIVATE_TEST", config.DICT_DATASET)
        # the OpenEndedTask protocol's test split maps to public test
        self.test_dataset = self.public_test_dataset
        self.test_dict_dataset = self.public_test_dict_dataset

    def create_dataloaders(self, config):
        fd = config.DATASET.FEATURE_DATASET
        dd = config.DATASET.DICT_DATASET
        seed = int(config.TRAINING.get("SEED", 42))
        workers = fd.get("WORKERS", 4) or 1

        def loader(dataset, batch_size, shuffle):
            if dataset is None:
                return None
            return DataLoader(
                dataset, batch_size=batch_size, shuffle=shuffle,
                num_workers=workers, seed=seed,
            )

        self.train_dataloader = loader(self.train_dataset, fd.BATCH_SIZE, True)
        self.dev_dataloader = loader(self.dev_dataset, fd.BATCH_SIZE, False)
        self.public_test_dataloader = loader(
            self.public_test_dataset, fd.BATCH_SIZE, False
        )
        self.private_test_dataloader = loader(
            self.private_test_dataset, fd.BATCH_SIZE, False
        )

        train_dict_bs = max(1, dd.BATCH_SIZE // config.TRAINING.TRAINING_BEAM_SIZE)
        eval_dict_bs = max(1, dd.BATCH_SIZE // config.TRAINING.EVALUATING_BEAM_SIZE)
        self.train_dict_dataloader = loader(
            self.train_dict_dataset, train_dict_bs, True
        )
        self.dev_dict_dataloader = loader(self.dev_dict_dataset, eval_dict_bs, False)
        self.public_test_dict_dataloader = loader(
            self.public_test_dict_dataset, eval_dict_bs, False
        )
        self.private_test_dict_dataloader = loader(
            self.private_test_dict_dataset, eval_dict_bs, False
        )

    def _predict_split(self, dataloader, out_name: str):
        run = self._generate_fn(dataloader.batch_size, self.evaluating_beam_size)
        results, overall_gens, overall_gts = [], {}, {}
        for it, (batch, device_batch) in enumerate(self.device_batches(dataloader)):
            outs, _ = run(self.state.variables(), device_batch)
            answers_gen = self._decode_batch(np.asarray(outs), batch)
            gens, gts = {}, {}
            valid = np.asarray(batch["sample_valid"])
            for i, (gts_i, gen_i) in enumerate(zip(batch["answers"], answers_gen)):
                if not valid[i]:
                    continue
                key = self.eval_key(batch, it, i)
                gens[key] = gen_i
                gts[key] = gts_i
                overall_gens[key] = [gen_i]
                overall_gts[key] = gts_i
            results.append(
                {
                    "id": [int(x) for x in np.asarray(batch["question_id"])[valid]],
                    "image_id": [
                        int(x) for x in np.asarray(batch["image_id"])[valid]
                    ],
                    "filename": [f for f, v in zip(batch["filename"], valid) if v],
                    "gens": gens,
                    "gts": gts,
                }
            )
        scores, _ = compute_scores(overall_gts, overall_gens)
        logger.info("Evaluation scores on %s: %s", out_name, scores)
        self.dump_json(out_name, {"results": results, **scores})
        return scores

    def get_predictions(self):
        best = os.path.join(self.checkpoint_path, BEST_NAME)
        if not os.path.isfile(best):
            raise FileNotFoundError(
                f"no best_model checkpoint in {self.checkpoint_path}"
            )
        self.load_checkpoint(best)

        scores = {}
        if self.public_test_dict_dataloader is not None:
            scores["public_test"] = self._predict_split(
                self.public_test_dict_dataloader, "public_test_results.json"
            )
        if self.private_test_dict_dataloader is not None:
            scores["private_test"] = self._predict_split(
                self.private_test_dict_dataloader, "private_test_results.json"
            )
        return scores
