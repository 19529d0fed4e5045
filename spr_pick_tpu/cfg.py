"""Configuration defaults and inference.

Parity: `spr_pick/cfg.py:10-202`.  Defaults are identical to the reference
`base()` dict; the extra TPU keys default to values that reproduce reference
behaviour on a single chip.
"""

from __future__ import annotations

import os
from typing import Dict

from spr_pick_tpu.params import (
    ConfigValue,
    DatasetType,
    NoiseAlgorithm,
    Pipeline,
)

DEFAULT_RUN_DIR = "hi_runs"


def base() -> Dict:
    # Reference defaults: spr_pick/cfg.py:10-43
    return {
        ConfigValue.ITERATIONS: 200000,
        ConfigValue.DETECTLOSS: None,
        ConfigValue.TRAIN_MINIBATCH_SIZE: 16,
        ConfigValue.TEST_MINIBATCH_SIZE: 1,
        ConfigValue.IMAGE_CHANNELS: 1,
        ConfigValue.TRAIN_PATCH_SIZE: 64,
        ConfigValue.LEARNING_RATE: 1e-5,
        ConfigValue.LR_RAMPDOWN_FRACTION: 0.7,
        ConfigValue.LR_RAMPUP_FRACTION: 0.2,
        ConfigValue.EVAL_INTERVAL: 3200,
        ConfigValue.PRINT_INTERVAL: 1280,
        ConfigValue.SNAPSHOT_INTERVAL: 3200,
        ConfigValue.DATALOADER_WORKERS: 4,
        ConfigValue.PIN_DATA_MEMORY: False,
        ConfigValue.DIAGONAL_COVARIANCE: False,
        ConfigValue.TRAIN_DATA_PATH: None,
        ConfigValue.TRAIN_GT_PATH: None,
        ConfigValue.TRAIN_LABEL_PATH: None,
        ConfigValue.TRAIN_DATASET_TYPE: None,
        ConfigValue.TEST_DATA_PATH: None,
        ConfigValue.TEST_LABEL_PATH: None,
        ConfigValue.TEST_GT_PATH: None,
        ConfigValue.TEST_DATASET_TYPE: None,
        ConfigValue.JOINT_LR: 1e-5,
        ConfigValue.ALPHA: 0.8,
        ConfigValue.NMS: 15,
        ConfigValue.NUM_EVAL: 1,
        ConfigValue.NOISE_STYLE: None,
        ConfigValue.TAU: 0.01,
        ConfigValue.BB: 24,
        # TPU-native additions
        ConfigValue.MESH_SHAPE: None,
        ConfigValue.DEVICE_DATA_PATH: True,
        ConfigValue.MAX_PEAKS: 2048,
        ConfigValue.SEED: 0,
        # bf16 compute on the conv path: ~2x MXU rate and half the HBM
        # traffic on TPU; losses/NLL math stay float32.
        ConfigValue.COMPUTE_DTYPE: "bf16",
    }


def infer_datasets(cfg: Dict):
    """Infer dataset type (folder / .txt manifest / hdf5) from the path.

    Parity: spr_pick/cfg.py:105-127.
    """

    def infer_dtype(path: str) -> DatasetType:
        if os.path.isdir(path):
            return DatasetType.FOLDER
        elif path.endswith(".txt"):
            return DatasetType.TXT
        else:
            return DatasetType.HDF5

    if cfg.get(ConfigValue.TRAIN_DATA_PATH, None) is not None:
        if cfg.get(ConfigValue.TRAIN_DATASET_TYPE, None) is None:
            cfg[ConfigValue.TRAIN_DATASET_TYPE] = infer_dtype(
                cfg[ConfigValue.TRAIN_DATA_PATH]
            )
    if cfg.get(ConfigValue.TEST_DATA_PATH, None) is not None:
        if cfg.get(ConfigValue.TEST_DATASET_TYPE, None) is None:
            cfg[ConfigValue.TEST_DATASET_TYPE] = infer_dtype(
                cfg[ConfigValue.TEST_DATA_PATH]
            )


def test_length(cfg: Dict) -> int:
    return cfg[ConfigValue.NUM_EVAL]


def infer_pipeline(algorithm: NoiseAlgorithm) -> Pipeline:
    # Parity: spr_pick/cfg.py:146-158
    if algorithm in [NoiseAlgorithm.SELFSUPERVISED_DENOISING]:
        return Pipeline.SSDN
    elif algorithm in [
        NoiseAlgorithm.SELFSUPERVISED_DENOISING_MEAN_ONLY,
        NoiseAlgorithm.NOISE_TO_NOISE,
        NoiseAlgorithm.NOISE_TO_CLEAN,
    ]:
        return Pipeline.MSE
    elif algorithm in [NoiseAlgorithm.NOISE_TO_VOID]:
        return Pipeline.MASK_MSE
    else:
        raise NotImplementedError("Algorithm does not have a default pipeline.")


def infer_blindspot(algorithm: NoiseAlgorithm) -> bool:
    # Parity: spr_pick/cfg.py:161-174
    if algorithm in [
        NoiseAlgorithm.SELFSUPERVISED_DENOISING,
        NoiseAlgorithm.SELFSUPERVISED_DENOISING_MEAN_ONLY,
    ]:
        return True
    elif algorithm in [
        NoiseAlgorithm.NOISE_TO_NOISE,
        NoiseAlgorithm.NOISE_TO_CLEAN,
        NoiseAlgorithm.NOISE_TO_VOID,
    ]:
        return False
    else:
        raise NotImplementedError("Not known if algorithm requires blindspot.")


def infer(cfg: Dict, model_only: bool = False) -> Dict:
    if cfg.get(ConfigValue.PIPELINE, None) is None:
        cfg[ConfigValue.PIPELINE] = infer_pipeline(cfg[ConfigValue.ALGORITHM])
    if cfg.get(ConfigValue.BLINDSPOT, None) is None:
        cfg[ConfigValue.BLINDSPOT] = infer_blindspot(cfg[ConfigValue.ALGORITHM])
    if not model_only:
        infer_datasets(cfg)
    return cfg


def config_name(cfg: Dict) -> str:
    # Parity: spr_pick/cfg.py:188-202
    cfg = infer(cfg)
    config_lst = [cfg[ConfigValue.ALGORITHM].value]

    inferred_pipeline = infer_pipeline(cfg[ConfigValue.ALGORITHM])
    if cfg[ConfigValue.PIPELINE] != inferred_pipeline:
        config_lst += [cfg[ConfigValue.PIPELINE].value + "_pipeline"]

    config_lst += [cfg[ConfigValue.NOISE_STYLE]]

    return "-".join(config_lst)
