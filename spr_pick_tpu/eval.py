"""Standalone evaluation: load checkpoint, dense-infer, export picks.

Parity: `spr_pick/eval.py` (DenoiserEvaluator) — loads either a `.training`
(full state) or `.wt` (weights+cfg) checkpoint, creates an
`NNNNN-eval-...` run dir, and writes `eval_imgs/` artifacts
(`{name}_{desc}.png` / `{name}_{desc}.txt`).
"""

from __future__ import annotations

import logging
import os
from typing import Dict

from spr_pick_tpu.params import ConfigValue
from spr_pick_tpu.train import DenoiserTrainer
from spr_pick_tpu.utils import checkpoint as ckpt
from spr_pick_tpu.utils.logging_helper import setup as setup_logging
from spr_pick_tpu.utils.metrics import separator

logger = logging.getLogger("eval")


class DenoiserEvaluator(DenoiserTrainer):
    def __init__(self, state_path: str, runs_dir: str = "hi_runs", mode: str = "joint"):
        super().__init__({}, mode=mode, runs_dir=runs_dir)
        if not os.path.exists(state_path):
            raise FileNotFoundError(f"Checkpoint does not exist: {state_path}")
        state = ckpt.load(state_path, mode=mode)
        fmt = state.get("format", "")
        if "training" in fmt or "opt_state" in state:
            self.load_state_dict(state)
        else:
            # .wt weights-only (eval.py:50-53, with the missing-mode bug
            # fixed: mode comes from the checkpoint or the caller).
            self.load_weights(state)

    @property
    def run_dir(self) -> str:
        if self._run_dir is None:
            self._run_dir = "{:05d}-eval-{}".format(
                self.next_run_id(), self.config_name()
            )
        return self._run_dir

    def evaluate(self):
        """Parity: eval.py:61-83."""
        if self.testset is None:
            if not self.cfg.get(ConfigValue.TEST_DATA_PATH):
                raise ValueError("Test dataset not set")
            self.testset, self.test_sampler = self.test_data()
        _ = self.writer
        setup_logging(self.run_dir_path, "log.txt")
        logger.info(separator())
        logger.info("EVALUATING...")
        self.reset_metrics(train=False)
        self._evaluate(
            output_callback=self.eval_output_callback(), picks_for_all=True
        )
        logger.info("EVALUATION RESULT: %s", self.eval_state_str())
        logger.info(separator())

    def eval_output_callback(self):
        def callback(idx: int, outputs: Dict, item: Dict):
            output_dir = os.path.join(self.run_dir_path, "eval_imgs")
            fileformat = "{name}_{desc}.png"
            scoreformat = "{name}_{desc}.txt"
            self.save_image_outputs(outputs, item, output_dir, fileformat, scoreformat)

        return callback
