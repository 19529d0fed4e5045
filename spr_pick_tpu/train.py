"""Training orchestration: run dirs, hot loop, intervals, snapshots, eval.

Parity: `spr_pick/train.py` (DenoiserTrainer / resume_run) with a
TPU-native hot loop: the per-iteration work is ONE jitted ``train_step``
over device-resident data (no CPU worker processes, no host<->device
round-trips besides B int32 sampler triples), while intervals, metrics,
snapshots and artifact dumps stay on host exactly like the reference
(eval/print/snapshot every N samples, `[iters] TRAIN | ... [ETA]` lines,
`model_{iter:08d}.training` snapshots, per-eval PNG + `_scores.txt` dumps).
"""

from __future__ import annotations

import logging
import math
import os
from collections import defaultdict
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.data.micrograph import (
    DevicePatchPipeline,
    HostPatchPipeline,
    MicrographDataset,
    unpad,
)
from spr_pick_tpu.data.sampler import FixedLengthSampler, StratifiedCoordinateSampler
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.ops.nms import nms_to_host
from spr_pick_tpu.params import (
    ConfigValue,
    DatasetType,
    HistoryValue,
    Pipeline,
    PipelineOutput,
    StateValue,
)
from spr_pick_tpu.steps import TrainState, init_state, make_eval_step, make_train_step
from spr_pick_tpu.utils import checkpoint as ckpt
from spr_pick_tpu.utils.image_io import (
    ScalarWriter,
    quantize_u8_device,
    save_array_image,
    save_u8_image,
)
from spr_pick_tpu.utils.logging_helper import setup as setup_logging
from spr_pick_tpu.utils.metrics import (
    Metric,
    MetricDict,
    TrackedTime,
    calculate_psnr,
    seconds_to_dhms,
    separator,
)
from spr_pick_tpu.utils.schedule import compute_ramped_lrate

logger = logging.getLogger("train")

DEFAULT_RUN_DIR = cfg_mod.DEFAULT_RUN_DIR


@jax.jit
def _tree_checksum(tree):
    """f32 abs-sum over every leaf of a pytree — a one-scalar weight
    fingerprint (not cryptographic; distinguishes snapshots/checkpoints)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(
        jnp.sum(jnp.abs(leaf.astype(jnp.float32))) for leaf in leaves
    )


def _device_data_budget(mesh=None) -> int:
    """HBM byte budget for device-resident data planes (default 4 GiB
    PER CHIP; override with SPR_DEVICE_DATA_BUDGET, in bytes).

    Under a mesh the image stacks are sharded over the chips straight from
    host memory (DevicePatchPipeline.shard_over), so total capacity scales
    |mesh|-fold — the budget gate compares against the padded TOTAL, hence
    the multiplier."""
    per_chip = int(os.environ.get("SPR_DEVICE_DATA_BUDGET", 4 << 30))
    return per_chip * (int(mesh.devices.size) if mesh is not None else 1)


class DenoiserTrainer:
    """Owns a Denoiser engine, its TrainState, data pipelines and run dir."""

    def __init__(
        self,
        cfg: Optional[Dict],
        mode: str = "joint",
        alpha: Optional[float] = None,
        tau: Optional[float] = None,
        runs_dir: str = DEFAULT_RUN_DIR,
        run_dir: Optional[str] = None,
        profile: bool = False,
    ):
        self.profile = profile
        self.cfg = cfg
        if self.cfg:
            cfg_mod.infer(self.cfg)
        self.runs_dir = runs_dir
        self._run_dir = run_dir
        self.mode = mode
        # cfg is the single source of truth for the loss weights: explicit
        # constructor args write through to cfg (so run naming and the
        # checkpoint always reflect the weights actually trained with), and
        # omitted args read cfg's value.  Keeping them separate let a
        # resumed run silently train with DEFAULT alpha/tau while the
        # checkpointed cfg said otherwise (caught by
        # tests/test_resume_trajectory.py).
        if self.cfg:
            if alpha is not None:
                self.cfg[ConfigValue.ALPHA] = float(alpha)
            if tau is not None:
                self.cfg[ConfigValue.TAU] = float(tau)
            self.alpha = float(self.cfg.get(ConfigValue.ALPHA, 0.8))
            self.tau = float(self.cfg.get(ConfigValue.TAU, 0.01))
        else:
            # Shell trainer (resume/eval): real values arrive with the
            # checkpoint cfg in load_state_dict/load_weights.
            self.alpha = 0.8 if alpha is None else float(alpha)
            self.tau = 0.01 if tau is None else float(tau)

        self.state: Dict = {}
        self.init_state()

        self.denoiser: Optional[Denoiser] = None
        self.train_state: Optional[TrainState] = None
        self._train_step = None
        self._train_scan = None
        self._denoise_scan = None
        self._eval_step = None
        self._writer: Optional[ScalarWriter] = None
        self._rng_key = None

        self.mesh = None
        self._scan_stacks_replicated = False
        # Multi-host eval metric merge state (parallel/dcn.allreduce_metrics
        # `base` protocol); reset whenever the eval history is reset.
        self._eval_merge_base = None
        # Graceful-stop flag set by SIGTERM/SIGINT (preemption awareness —
        # the reference has none, SURVEY.md §5); checked at window
        # boundaries in train().
        self._stop_requested = False
        # Halo-tiled eval engages above this edge length (px).  Tile and
        # halo sizes keep tile+2*halo a multiple of 32 (pad grid) and the
        # halo beyond the detector RF + U-Net decay (parallel/tiling.py).
        self.tile_eval_threshold = 2048
        self.tile_eval_size = 1024
        # int, or "auto" to derive the halo from the model's MEASURED
        # context decay on the first tiled micrograph (parallel/tiling.py
        # calibrate_halo) — the fixed default suits the reference-style
        # trained JointNetwork; atypical weight sets can leak further.
        self.tile_eval_halo = 96
        # (weight fingerprint, halo): the measured decay is weight-set
        # dependent (partially-trained weights leak further than converged
        # ones — tests/test_tiling.py multi-seed finding), so the cached
        # calibration is invalidated whenever the weights change (eval
        # during training re-probes each snapshot; an evaluator re-probes
        # per loaded checkpoint).
        self._auto_halo: Optional[Tuple[Any, int]] = None
        self.trainset: Optional[MicrographDataset] = None
        self.patch_pipeline: Optional[DevicePatchPipeline] = None
        self.train_sampler = None
        self.testset: Optional[MicrographDataset] = None
        self.test_sampler = None

    # ------------------------------------------------------------------
    # State management
    # ------------------------------------------------------------------

    def init_state(self):
        self.state[StateValue.INITIALISED] = True
        self.state[StateValue.ITERATION] = 0
        self.state[StateValue.HISTORY] = {
            HistoryValue.TRAIN: MetricDict(),
            HistoryValue.EVAL: MetricDict(),
            HistoryValue.TIMINGS: defaultdict(TrackedTime),
        }
        self.reset_metrics()

    def new_target(self):
        """Fresh Denoiser + TrainState (train.py:142-146)."""
        self.denoiser = Denoiser(self.cfg, mode=self.mode)
        seed = int(self.cfg.get(ConfigValue.SEED, 0))
        self.train_state = init_state(
            self.denoiser, seed=seed, patch=self.cfg[ConfigValue.TRAIN_PATCH_SIZE]
        )
        self._rng_key = jax.random.PRNGKey(seed + 1)
        self._train_step = None
        self._train_scan = None
        self._denoise_scan = None
        self._eval_step = None
        self._setup_mesh()
        self.init_state()

    def _setup_mesh(self):
        """Data-parallel mesh over local devices (cfg MESH_SHAPE; default all
        devices when more than one is present).  Replaces the reference's
        dormant nn.DataParallel (SURVEY.md §2.7)."""
        from spr_pick_tpu.parallel.mesh import make_mesh, replicate

        self.mesh = None
        n = self.cfg.get(ConfigValue.MESH_SHAPE)
        if n is None:
            n = len(jax.devices())
        if n and n > 1 and len(jax.devices()) >= n:
            if self.cfg[ConfigValue.TRAIN_MINIBATCH_SIZE] % n != 0:
                logger.warning(
                    "batch size %d not divisible by mesh size %d; "
                    "running single-device",
                    self.cfg[ConfigValue.TRAIN_MINIBATCH_SIZE], n,
                )
                return
            self.mesh = make_mesh(n)
            self.train_state = replicate(self.train_state, self.mesh)
            logger.info("data-parallel mesh over %d devices", n)

    def _next_rng(self):
        self._rng_key, sub = jax.random.split(self._rng_key)
        return sub

    @property
    def iteration(self) -> int:
        return self.state[StateValue.ITERATION]

    # ------------------------------------------------------------------
    # Learning rate (parity with call site train.py:430-442)
    # ------------------------------------------------------------------

    @property
    def base_learning_rate(self) -> float:
        """Base LR for the cosine ramp.  The reference hardcodes 1e-4 at
        the call site (train.py:441) and ignores cfg LEARNING_RATE; here
        the cfg carries the same effective default so --lr is live."""
        return float(self.cfg.get(ConfigValue.LEARNING_RATE) or 1e-4)

    @property
    def learning_rate(self) -> float:
        return compute_ramped_lrate(
            self.state[StateValue.ITERATION],
            self.cfg[ConfigValue.ITERATIONS],
            self.cfg[ConfigValue.LR_RAMPDOWN_FRACTION],
            self.cfg[ConfigValue.LR_RAMPUP_FRACTION],
            self.base_learning_rate,
        )

    # ------------------------------------------------------------------
    # Data
    # ------------------------------------------------------------------

    def _build_denoise_scan(self):
        """K-step fused denoise scan for the device data plane.  The batch
        recipe (algorithm / noise style / noise_input) must match what the
        pipeline's own `batch()` fallback produces — both sides read the
        pipeline as the source of truth."""
        kwargs = dict(
            patch=self.cfg[ConfigValue.TRAIN_PATCH_SIZE],
            algorithm=self.patch_pipeline.algorithm,
            noise_style=self.patch_pipeline.noise_style,
            noise_input=self.patch_pipeline.noise_input,
        )
        if self.mesh is not None:
            from spr_pick_tpu.steps import make_denoise_scan_sharded

            return make_denoise_scan_sharded(
                self.denoiser, self.alpha, self.tau, mesh=self.mesh, **kwargs
            )
        from spr_pick_tpu.steps import make_denoise_scan

        return make_denoise_scan(
            self.denoiser, self.alpha, self.tau, **kwargs
        )

    def train_data(self):
        """Build training dataset + sampler + device patch pipeline.

        Parity: train.py:1018-1095 (TXT micrograph path; folder/hdf5 paths
        are served by spr_pick_tpu.data.folder / hdf5 wrappers).
        """
        cfg = self.cfg
        dtype = cfg[ConfigValue.TRAIN_DATASET_TYPE]
        if dtype == DatasetType.TXT:
            dataset = MicrographDataset(
                cfg[ConfigValue.TRAIN_DATA_PATH],
                cfg[ConfigValue.TRAIN_LABEL_PATH],
                radius=3,
                train=True,
                crop=cfg[ConfigValue.TRAIN_PATCH_SIZE],
                gt_path=cfg[ConfigValue.TRAIN_GT_PATH],
                bb=cfg[ConfigValue.BB],
            )
            sampler = StratifiedCoordinateSampler(
                [g for g in dataset.targets],
                balance=0.1,
                size=cfg[ConfigValue.ITERATIONS]
                * cfg[ConfigValue.TRAIN_MINIBATCH_SIZE],
                # Own RandomState (not the np.random global): deterministic
                # runs and a serialisable data plane (data_state_dict).
                random=np.random.RandomState(
                    int(cfg.get(ConfigValue.SEED, 0))
                ),
            )
            pipeline = None
            if os.environ.get("SPR_HOST_JOINT_DATA", "0") != "1":
                try:
                    pipeline = DevicePatchPipeline(
                        dataset, crop=cfg[ConfigValue.TRAIN_PATCH_SIZE],
                        augment=True, max_bytes=_device_data_budget(self.mesh),
                    )
                except ValueError as exc:
                    logger.warning(
                        "device joint data plane unavailable (%s); "
                        "falling back to host batch prep — dataset "
                        "capacity is now host-RAM-bound, like the "
                        "reference's DataLoader path", exc,
                    )
            if pipeline is None:
                pipeline = HostPatchPipeline(
                    dataset, crop=cfg[ConfigValue.TRAIN_PATCH_SIZE],
                    augment=True,
                )
            return dataset, sampler, pipeline

        if self.mode != "denoise":
            raise NotImplementedError(
                "joint training needs particle coordinates (TXT manifest); "
                "folder/hdf5 datasets support denoise-only training."
            )
        from spr_pick_tpu.data.patches import DenoisePatchPipeline

        if dtype == DatasetType.FOLDER:
            from spr_pick_tpu.data.folder import UnlabelledImageFolderDataset

            base = UnlabelledImageFolderDataset(
                cfg[ConfigValue.TRAIN_DATA_PATH], recursive=True,
                channels=cfg[ConfigValue.IMAGE_CHANNELS],
            )
        elif dtype == DatasetType.HDF5:
            from spr_pick_tpu.data.hdf5 import HDF5Dataset

            base = HDF5Dataset(
                cfg[ConfigValue.TRAIN_DATA_PATH],
                channels=cfg[ConfigValue.IMAGE_CHANNELS],
            )
        else:
            raise NotImplementedError("Dataset type not implemented")
        kwargs = dict(
            patch=cfg[ConfigValue.TRAIN_PATCH_SIZE],
            algorithm=cfg[ConfigValue.ALGORITHM],
            noise_style=cfg[ConfigValue.NOISE_STYLE],
            seed=int(cfg.get(ConfigValue.SEED, 0)),
            noise_input=bool(cfg.get(ConfigValue.NOISE_INPUT, False)),
        )
        pipeline = None
        if os.environ.get("SPR_HOST_DENOISE_DATA", "0") != "1":
            from spr_pick_tpu.data.patches import DeviceDenoisePipeline

            try:
                pipeline = DeviceDenoisePipeline(
                    base, max_bytes=_device_data_budget(self.mesh), **kwargs
                )
            except ValueError as exc:
                logger.warning(
                    "device denoise data plane unavailable (%s); "
                    "falling back to host batch prep", exc,
                )
        if pipeline is None:
            pipeline = DenoisePatchPipeline(base, **kwargs)
        return base, None, pipeline

    def test_data(self):
        """Validation dataset (whole micrographs).  Parity: train.py:1119-1195."""
        cfg = self.cfg
        dtype = cfg[ConfigValue.TEST_DATASET_TYPE]
        if dtype == DatasetType.TXT or cfg[ConfigValue.TEST_LABEL_PATH]:
            dataset = MicrographDataset(
                cfg[ConfigValue.TEST_DATA_PATH],
                cfg[ConfigValue.TEST_LABEL_PATH],
                radius=3,
                train=False,
                gt_path=cfg[ConfigValue.TEST_GT_PATH],
                bb=cfg[ConfigValue.BB],
            )
        else:
            from spr_pick_tpu.data.patches import UnlabeledEvalDataset

            if dtype == DatasetType.FOLDER:
                from spr_pick_tpu.data.folder import UnlabelledImageFolderDataset

                base = UnlabelledImageFolderDataset(
                    cfg[ConfigValue.TEST_DATA_PATH], recursive=True,
                    channels=cfg[ConfigValue.IMAGE_CHANNELS],
                )
            elif dtype == DatasetType.HDF5:
                from spr_pick_tpu.data.hdf5 import HDF5Dataset

                base = HDF5Dataset(
                    cfg[ConfigValue.TEST_DATA_PATH],
                    channels=cfg[ConfigValue.IMAGE_CHANNELS],
                )
            else:
                raise NotImplementedError("Dataset type not implemented")
            gt = None
            if cfg[ConfigValue.TEST_GT_PATH]:
                from spr_pick_tpu.data.folder import UnlabelledImageFolderDataset

                gt = UnlabelledImageFolderDataset(
                    cfg[ConfigValue.TEST_GT_PATH], recursive=True
                )
            dataset = UnlabeledEvalDataset(base, gt)
        sampler = FixedLengthSampler(
            len(dataset), num_samples=cfg_mod.test_length(cfg), shuffled=False
        )
        return dataset, sampler

    def set_train_data(self, path: str):
        self.cfg[ConfigValue.TRAIN_DATA_PATH] = path
        self.cfg[ConfigValue.TRAIN_DATASET_TYPE] = None
        cfg_mod.infer_datasets(self.cfg)

    def set_train_label(self, path: str):
        self.cfg[ConfigValue.TRAIN_LABEL_PATH] = path

    def set_train_gt_data(self, path: str):
        self.cfg[ConfigValue.TRAIN_GT_PATH] = path

    def set_test_data(self, path: str):
        self.cfg[ConfigValue.TEST_DATA_PATH] = path
        self.cfg[ConfigValue.TEST_DATASET_TYPE] = None
        cfg_mod.infer_datasets(self.cfg)

    def set_test_label(self, path: str):
        self.cfg[ConfigValue.TEST_LABEL_PATH] = path

    def set_test_gt_data(self, path: str):
        self.cfg[ConfigValue.TEST_GT_PATH] = path

    # ------------------------------------------------------------------
    # Training loop
    # ------------------------------------------------------------------

    def _install_stop_handlers(self):
        """Catch SIGTERM/SIGINT and convert them into a graceful stop.

        TPU pods get preempted; the reference has no signal handling at all
        (SURVEY.md §5 — recovery is manual resume from the last periodic
        snapshot, losing up to SNAPSHOT_INTERVAL iterations).  Here the
        first signal sets a flag the train loop checks at the next window
        boundary: it flushes metrics, writes a resumable snapshot and
        returns cleanly.  A second SIGINT falls through to the default
        KeyboardInterrupt (an impatient Ctrl-C Ctrl-C still kills).

        Returns a restore() callable; no-op off the main thread (signal
        handlers can only be installed there — tests drive trainers from
        worker threads).
        """
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return lambda: None

        def handler(signum, frame):
            if self._stop_requested and signum == signal.SIGINT:
                raise KeyboardInterrupt
            self._stop_requested = True
            logger.warning(
                "received %s - will snapshot and stop at the next window "
                "boundary (repeat Ctrl-C to kill)",
                signal.Signals(signum).name,
            )

        prev = {
            s: signal.signal(s, handler)
            for s in (signal.SIGTERM, signal.SIGINT)
        }

        def restore():
            for s, h in prev.items():
                signal.signal(s, h)

        return restore

    def train(self):
        if self.denoiser is None:
            self.new_target()
        _ = self.writer
        setup_logging(self.run_dir_path, "log.txt")
        logger.info(separator())
        logger.info("Loading Training Dataset...")
        self.trainset, self.train_sampler, self.patch_pipeline = self.train_data()
        self._scan_stacks_replicated = False
        if getattr(self, "_pending_data_state", None):
            self.load_data_state_dict(self._pending_data_state)
            self._pending_data_state = None
            logger.info("restored data-plane state (sampler + augment RNGs)")
        logger.info("Loaded Training Dataset.")
        if self.cfg[ConfigValue.TEST_DATA_PATH]:
            logger.info("Loading Validation Dataset...")
            self.testset, self.test_sampler = self.test_data()
            logger.info("Loaded Validation Dataset.")

        self._stop_requested = False
        _restore_handlers = self._install_stop_handlers()
        try:

            # Banner AFTER handler installation: once "TRAINING STARTED" is in
            # the log, a SIGTERM is guaranteed a graceful snapshot-and-stop.
            logger.info(separator())
            logger.info("TRAINING STARTED")
            logger.info(separator())

            if self._train_step is None:
                self._train_step = make_train_step(self.denoiser, self.alpha, self.tau)
            if self._train_scan is None and isinstance(
                self.patch_pipeline, DevicePatchPipeline
            ):
                if self.mesh is not None:
                    # Mesh: shard the micrograph stack over the chips
                    # (HBM/chip drops |mesh|-fold) and gather batches with
                    # an explicit shard_map psum.
                    from spr_pick_tpu.steps import make_train_scan_sharded

                    self._train_scan = make_train_scan_sharded(
                        self.denoiser, self.alpha, self.tau,
                        crop=self.cfg[ConfigValue.TRAIN_PATCH_SIZE],
                        mesh=self.mesh,
                    )
                else:
                    from spr_pick_tpu.steps import make_train_scan

                    self._train_scan = make_train_scan(
                        self.denoiser, self.alpha, self.tau,
                        crop=self.cfg[ConfigValue.TRAIN_PATCH_SIZE],
                    )
            from spr_pick_tpu.data.patches import DeviceDenoisePipeline

            if self._denoise_scan is None and isinstance(
                self.patch_pipeline, DeviceDenoisePipeline
            ):
                self._denoise_scan = self._build_denoise_scan()

            history = self.state[StateValue.HISTORY]
            batch_size = self.cfg[ConfigValue.TRAIN_MINIBATCH_SIZE]
            # Metrics stay ON DEVICE between print intervals: forcing them to
            # host every step would serialize the async dispatch chain (a
            # ~30 ms/step stall measured over the device transport vs ~9 ms of
            # actual step compute at batch 4).
            pending_metrics = []

            # Optional profiler capture of the first print window (jax trace,
            # viewable in TensorBoard/Perfetto).  SURVEY.md §5: the reference has
            # no profiling surface; here it is a first-class flag.
            profiling = False
            if self.profile:
                jax.profiler.start_trace(os.path.join(self.run_dir_path, "profile"))
                profiling = True

            # Interval work (eval/print/snapshot) fires on interval-multiple
            # CROSSINGS, not exact hits: iteration advances in batch_size
            # (or k*batch_size) jumps, so with a batch size that does not
            # divide the interval an `iteration % interval == 0` test (the
            # reference's pattern, train.py:433-441) silently skips most
            # boundaries — e.g. batch 24 with snapshot interval 3200 would
            # snapshot only every lcm(24,3200)=9600 samples.
            _fired = dict.fromkeys(
                ("eval", "print", "snapshot"),
                self.state[StateValue.ITERATION] - 1,
            )

            def _interval_due(kind: str, interval) -> bool:
                if not interval or interval <= 0:
                    return False
                if iteration // interval > _fired[kind] // interval:
                    _fired[kind] = iteration
                    return True
                return False

            while True:
                iteration = self.state[StateValue.ITERATION]

                if self._stop_requested:
                    # Graceful preemption: flush, snapshot (resumable), return.
                    # Deliberately NO final-{config}.wt — that file means the
                    # run COMPLETED; `train resume` picks up the .training.
                    self._flush_metrics(pending_metrics, batch_size)
                    if profiling:
                        jax.profiler.stop_trace()
                    self.snapshot()
                    logger.info(separator())
                    logger.info(
                        "TRAINING STOPPED at iteration %d (signal) - resume "
                        "with `train resume %s`", iteration, self.run_dir_path,
                    )
                    logger.info(separator())
                    return

                if (
                    self.testset is not None
                    and _interval_due("eval", self.cfg[ConfigValue.EVAL_INTERVAL])
                ):
                    self._flush_metrics(pending_metrics, batch_size)
                    self._evaluate(output_callback=self.validation_output_callback(0))
                if _interval_due("print", self.cfg[ConfigValue.PRINT_INTERVAL]):
                    self._flush_metrics(pending_metrics, batch_size)
                    if profiling and iteration > 0:
                        jax.profiler.stop_trace()
                        profiling = False
                        logger.info("profiler trace written to %s",
                                    os.path.join(self.run_dir_path, "profile"))
                    history[HistoryValue.TIMINGS]["total"].update()
                    last_print = history[HistoryValue.TIMINGS]["last_print"]
                    last_print.update()
                    samples = (
                        history[HistoryValue.EVAL]["n"] + history[HistoryValue.TRAIN]["n"]
                    )
                    self.update_eta(samples, last_print.total)
                    logger.info(self.state_str(eval_prefix="VALID"))
                    self.write_metrics(eval_prefix="valid")
                    last_print.total = 0
                    self.reset_metrics()
                if _interval_due("snapshot", self.cfg[ConfigValue.SNAPSHOT_INTERVAL]):
                    self._flush_metrics(pending_metrics, batch_size)
                    self.snapshot()

                if iteration >= self.cfg[ConfigValue.ITERATIONS]:
                    break

                k_steps = self._chunk_steps(iteration, batch_size)
                # Under a mesh the stack is SHARDED after the first
                # chunk; the per-step path's plain-jit gather on a
                # sharded operand could transiently all-gather the
                # whole stack — route K==1 through the scan instead.
                if (k_steps > 1 or self.mesh is not None) and self._can_scan():
                    # Scan-chunked fast path: K steps + gather in ONE program.
                    k = k_steps
                    packed = self.train_sampler.sample_batch(k * batch_size)
                    flat, ys, xs = self.patch_pipeline.decode(
                        packed.reshape(k, batch_size)
                    )
                    self.patch_pipeline.check_in_bounds(flat, ys, xs)
                    labels = self.patch_pipeline.labels_for(flat, ys, xs)
                    lrs = self._scan_lrs(iteration, k, batch_size)
                    flat, ys, xs = jnp.asarray(flat), jnp.asarray(ys), jnp.asarray(xs)
                    labels = jnp.asarray(labels)
                    rng = self._next_rng()
                    if self.mesh is not None:
                        from spr_pick_tpu.parallel.mesh import (
                            replicate,
                            shard_scan_indices,
                        )

                        (flat, ys, xs, labels) = shard_scan_indices(
                            (flat, ys, xs, labels), self.mesh
                        )
                        lrs, rng = replicate((lrs, rng), self.mesh)
                        if not self._scan_stacks_replicated:
                            # One-time, BEFORE any images_dev access: SHARD
                            # the micrograph stack over the chips — N/|mesh|
                            # images per chip, put straight from the host
                            # stack (it must never transit one chip's HBM;
                            # heatmaps stay on host entirely).
                            self.patch_pipeline.shard_over(self.mesh)
                            self._scan_stacks_replicated = True
                    images_dev = self.patch_pipeline.images_dev
                    self.train_state, metrics = self._train_scan(
                        self.train_state,
                        images_dev,
                        flat, ys, xs, labels,
                        lrs, rng,
                    )
                    pending_metrics.append((metrics, k))
                    self.state[StateValue.ITERATION] += k * batch_size
                    continue

                if (k_steps > 1 or self.mesh is not None) and self._can_scan_denoise():
                    # Denoise-only scan fast path: crop gather + noise synth /
                    # UPS masking + K updates in ONE program.
                    k = k_steps
                    flat, ys, xs = self.patch_pipeline.sample_coords(
                        (k, batch_size)
                    )
                    lrs = self._scan_lrs(iteration, k, batch_size)
                    flat, ys, xs = jnp.asarray(flat), jnp.asarray(ys), jnp.asarray(xs)
                    rng = self._next_rng()
                    if self.mesh is not None:
                        from spr_pick_tpu.parallel.mesh import (
                            replicate,
                            shard_scan_indices,
                        )

                        (flat, ys, xs) = shard_scan_indices(
                            (flat, ys, xs), self.mesh
                        )
                        lrs, rng = replicate((lrs, rng), self.mesh)
                        if not self._scan_stacks_replicated:
                            # SHARD the image stack over the chips (straight
                            # from the host copy — see the joint path above).
                            self.patch_pipeline.shard_over(self.mesh)
                            self._scan_stacks_replicated = True
                    images_dev = self.patch_pipeline.images_dev
                    self.train_state, metrics = self._denoise_scan(
                        self.train_state, images_dev, flat, ys, xs, lrs, rng
                    )
                    pending_metrics.append((metrics, k))
                    self.state[StateValue.ITERATION] += k * batch_size
                    continue

                if self.train_sampler is not None:
                    batch = self.patch_pipeline.batch(
                        self.train_sampler.sample_batch(batch_size)
                    )
                else:
                    batch = self.patch_pipeline.batch(batch_size)
                lr = jnp.float32(self.learning_rate)
                rng = self._next_rng()
                if self.mesh is not None:
                    from spr_pick_tpu.parallel.mesh import replicate, shard_batch

                    batch = shard_batch(batch, self.mesh)
                    rng = replicate(rng, self.mesh)
                    lr = replicate(lr, self.mesh)
                self.train_state, metrics = self._train_step(
                    self.train_state, batch, rng, lr
                )
                pending_metrics.append((metrics, 1))

                self.state[StateValue.ITERATION] += batch_size

            self._flush_metrics(pending_metrics, batch_size)
            if profiling:
                jax.profiler.stop_trace()

            logger.info(separator())
            logger.info("TRAINING FINISHED")
            logger.info(separator())

            self.snapshot()
            self.snapshot(
                output_name="final-{}.wt".format(self.config_name()),
                subdir="",
                model_only=True,
            )
        finally:
            # Exceptions (incl. the handler's own KeyboardInterrupt)
            # must not leave process-wide handlers bound to a dead
            # trainer: restore unconditionally.
            _restore_handlers()

    def _chunk_steps(self, iteration: int, batch_size: int) -> int:
        """Steps until the next eval/print/snapshot/end boundary."""
        intervals = [
            self.cfg[ConfigValue.PRINT_INTERVAL],
            self.cfg[ConfigValue.SNAPSHOT_INTERVAL],
        ]
        if self.testset is not None:
            intervals.append(self.cfg[ConfigValue.EVAL_INTERVAL])
        boundary = min(
            ((iteration // iv) + 1) * iv for iv in intervals if iv > 0
        )
        boundary = min(boundary, self.cfg[ConfigValue.ITERATIONS])
        return max((boundary - iteration) // batch_size, 1)

    def _scan_lrs(self, iteration: int, k: int, batch_size: int):
        """Per-step cosine-ramp learning rates for a K-step scan chunk."""
        return jnp.asarray(
            [
                compute_ramped_lrate(
                    iteration + i * batch_size,
                    self.cfg[ConfigValue.ITERATIONS],
                    self.cfg[ConfigValue.LR_RAMPDOWN_FRACTION],
                    self.cfg[ConfigValue.LR_RAMPUP_FRACTION],
                    self.base_learning_rate,
                )
                for i in range(k)
            ],
            jnp.float32,
        )

    def _mesh_divides_batch(self) -> bool:
        if self.mesh is None:
            return True
        # Mesh path: the per-step batch is sharded over 'data', so it
        # must divide evenly across the chips.
        batch = int(self.cfg[ConfigValue.TRAIN_MINIBATCH_SIZE])
        return batch % int(self.mesh.devices.size) == 0

    def _can_scan(self) -> bool:
        if (
            self.train_sampler is None
            or not isinstance(self.patch_pipeline, DevicePatchPipeline)
            or self._train_scan is None
        ):
            return False
        return self._mesh_divides_batch()

    def _can_scan_denoise(self) -> bool:
        from spr_pick_tpu.data.patches import DeviceDenoisePipeline

        if (
            not isinstance(self.patch_pipeline, DeviceDenoisePipeline)
            or self._denoise_scan is None
        ):
            return False
        return self._mesh_divides_batch()

    def _flush_metrics(self, pending, batch_size: int):
        """Materialise buffered device metrics (per-step dicts or scan-stacked
        dicts) into the history."""

        def as_batched(value):
            arr = np.asarray(value)
            return arr.reshape(1) if arr.ndim == 0 else arr

        train_history = self.state[StateValue.HISTORY][HistoryValue.TRAIN]
        for metrics, steps in pending:
            train_history["n"] += batch_size * steps
            train_history["loss"] += as_batched(metrics["loss"])
            if "denoise_loss" in metrics:
                train_history["denoise_loss"] += as_batched(
                    metrics["denoise_loss"]
                )
            for key in ("det_loss", "aug_loss"):
                if key in metrics:
                    train_history[key] += as_batched(metrics[key])
            for key in (
                PipelineOutput.NOISE_STD_DEV.value,
                PipelineOutput.MODEL_STD_DEV.value,
            ):
                if key in metrics:
                    train_history[key] += as_batched(metrics[key]) * 255
        pending.clear()

    # ------------------------------------------------------------------
    # Evaluation (dense inference over whole micrographs)
    # ------------------------------------------------------------------

    # ------------------------------------------------------------------
    # Threaded artifact export (PNG encode/write is pure host I/O,
    # independent of JAX — parallelising it closes the eval e2e gap vs
    # the device-only ceiling; VERDICT r3 item 4)
    # ------------------------------------------------------------------

    def _submit_export(self, fn, *args) -> None:
        """Run an artifact write on the export pool (inline when
        SPR_EXPORT_THREADS=0).  _flush_exports() joins and re-raises."""
        n = int(os.environ.get("SPR_EXPORT_THREADS", "4"))
        if n <= 0:
            fn(*args)
            return
        if getattr(self, "_export_pool", None) is None:
            from concurrent.futures import ThreadPoolExecutor

            self._export_pool = ThreadPoolExecutor(
                max_workers=n, thread_name_prefix="spr-export"
            )
            self._pending_exports = []
        self._pending_exports.append(self._export_pool.submit(fn, *args))
        # Backpressure: each pending u8 future pins a device-resident
        # array, so an unbounded queue accumulates HBM/host memory when
        # the device outruns the disk (big eval, slow storage).  Past a
        # small multiple of the workers, sweep finished futures (re-raising
        # their failures eagerly) and block on the oldest.
        if len(self._pending_exports) > 4 * n:
            keep = []
            for i, fut in enumerate(self._pending_exports):
                if i == 0 or fut.done():
                    fut.result()
                else:
                    keep.append(fut)
            self._pending_exports = keep

    def _flush_exports(self) -> None:
        """Wait for all in-flight artifact writes; propagate any failure."""
        pending = getattr(self, "_pending_exports", None)
        if not pending:
            return
        self._pending_exports = []
        for fut in pending:
            fut.result()

    def _evaluate(self, output_callback: Optional[Callable] = None,
                  picks_for_all: bool = False):
        """Dense eval pass (train.py:383-414): per test micrograph run the
        filled/dense model, accumulate PSNR when gt is present, and hand
        outputs to the artifact callback.  ``picks_for_all``: the callback
        will export picks for EVERY item (the evaluator), enabling the
        batched group NMS; training validation exports only one item, so
        batch NMS for the rest would be wasted device time."""
        if self._eval_step is None:
            self._eval_step = make_eval_step(self.denoiser, dense=True)
        eval_history = self.state[StateValue.HISTORY][HistoryValue.EVAL]
        batch_size = max(int(self.cfg[ConfigValue.TEST_MINIBATCH_SIZE] or 1), 1)

        # Multi-host runs WITHOUT a global mesh: each host evaluates only
        # its shard of the micrograph list (identity on one process;
        # parallel/dcn.py).  Under a global mesh every process must issue
        # the same computations (SPMD), so the full list is kept and the
        # batch itself is sharded instead.
        indices = list(iter(self.test_sampler))
        host_sharded = False
        if self.mesh is None:
            from spr_pick_tpu.parallel.dcn import host_shard

            indices = host_shard(indices)
            host_sharded = True

        use_contam = bool(self.cfg.get(ConfigValue.EXCLUDE_CONTAM, False))
        nms_radius = int(self.cfg[ConfigValue.NMS])
        max_peaks = int(self.cfg.get(ConfigValue.MAX_PEAKS, 2048))

        def process_group(idx0, group, outputs, batched, picks_dev):
            """Host-side half of one group: trim/run NMS, PSNR, callbacks.

            Runs one group BEHIND the device dispatch (software pipeline):
            while the host pulls arrays and PNG-encodes here, the device is
            already computing the next group's dense program.
            """
            group_picks = None
            if picks_dev is not None:
                from spr_pick_tpu.ops.nms import nms_batch_trim

                # The heatmaps are still device-resident in `outputs`;
                # handing them to the trim lets a capped pick list auto-
                # retry with a doubled buffer (reference-unbounded parity).
                shape = group[0]["image_shape"]
                group_picks = nms_batch_trim(
                    *picks_dev,
                    heatmaps=outputs[PipelineOutput.DETECT][
                        :, : shape[0], : shape[1], 0
                    ],
                    radius=nms_radius, threshold=0.02,
                )
            elif batched:
                # Contamination seeding needs the denoised images on host
                # (find_contamination is a numpy routine), so this NMS
                # cannot be dispatched ahead; it still amortises across
                # the group via one vmapped program.
                from spr_pick_tpu.ops.nms import nms_batch_to_host

                # Heatmaps stay DEVICE-resident (sliced on device, handed
                # to the vmapped kernel as-is); only the denoised images
                # cross to host, where find_contamination lives.
                shape = group[0]["image_shape"]
                hms = outputs[PipelineOutput.DETECT][
                    :, : shape[0], : shape[1], 0
                ]
                suppressed = None
                if use_contam and PipelineOutput.IMG_DENOISED in outputs:
                    from spr_pick_tpu.ops.algorithms import find_contamination

                    den = np.asarray(outputs[PipelineOutput.IMG_DENOISED])[
                        :, : shape[0], : shape[1], 0
                    ]
                    suppressed = np.stack(
                        [find_contamination(den[j]) for j in range(len(group))]
                    ).astype(bool)
                group_picks = nms_batch_to_host(
                    hms, nms_radius, threshold=0.02, max_peaks=max_peaks,
                    suppressed=suppressed,
                )
            for j, item in enumerate(group):
                per = {
                    k: v[j : j + 1]
                    for k, v in outputs.items()
                    if getattr(v, "ndim", 0) == 4
                }
                if group_picks is not None:
                    per["_picks"] = group_picks[j]
                eval_history["n"] += 1
                if item["gt"] is not None:
                    shape = item["image_shape"]
                    for key, name in self.img_outputs(prefix="psnr").items():
                        img = unpad(np.asarray(per[key])[0, :, :, 0], shape)
                        gt = np.asarray(item["gt"])[: shape[0], : shape[1]]
                        eval_history[name] += calculate_psnr(img[None], gt[None])
                if output_callback:
                    output_callback(idx0 + j, per, item)

        pending = None
        carried = None
        idx = 0
        while idx < len(indices):
            # Giant micrographs route through halo tiling (the whole-image
            # forward would exhaust HBM / compile a fresh shape per size).
            # Square padding is only needed when the blind-spot rot4 fold
            # has no rectangular route (dense_blindspot_unet two-lane fold).
            square = bool(
                getattr(self.denoiser, "blindspot", False)
            ) and not getattr(self.denoiser, "supports_rect_dense", False)
            if carried is not None:
                first = carried
                carried = None
            else:
                first = self.testset.test_item(
                    indices[idx], pad_multiple=32, square=square
                )
            if max(first["inp"].shape[1:3]) > self.tile_eval_threshold:
                if pending is not None:
                    process_group(*pending)
                    pending = None
                eval_history["n"] += 1
                per = self._evaluate_tiled(first)
                if first["gt"] is not None:
                    shape = first["image_shape"]
                    for key, name in self.img_outputs(prefix="psnr").items():
                        img = unpad(np.asarray(per[key])[0, :, :, 0], shape)
                        gt = np.asarray(first["gt"])[: shape[0], : shape[1]]
                        eval_history[name] += calculate_psnr(img[None], gt[None])
                if output_callback:
                    output_callback(idx, per, first)
                idx += 1
                continue

            # Group consecutive same-shape micrographs into one batch.
            # A shape-boundary item is CARRIED into the next iteration as
            # its `first` — folder datasets decode from disk on every
            # test_item call, so re-loading it would double boundary I/O.
            group = [first]
            while (
                len(group) < batch_size
                and idx + len(group) < len(indices)
            ):
                nxt = self.testset.test_item(
                    indices[idx + len(group)], pad_multiple=32, square=square
                )
                if nxt["inp"].shape != group[0]["inp"].shape:
                    carried = nxt
                    break
                group.append(nxt)

            inp = np.concatenate([it["inp"] for it in group], axis=0)
            batch = {"inp": jnp.asarray(inp)}
            rng = self._next_rng()
            if self.mesh is not None and inp.shape[0] % self.mesh.devices.size == 0:
                from spr_pick_tpu.parallel.mesh import replicate, shard_batch

                batch = shard_batch(batch, self.mesh)
                rng = replicate(rng, self.mesh)
            outputs = self._eval_step(self.train_state, batch, rng)

            # Batched NMS: when a whole group shares its unpadded shape
            # (the common same-size-micrograph case), all heatmaps go
            # through ONE vmapped multipeak program — the wave fixed
            # costs amortise across the batch (docs/PERF.md).  Without
            # contamination seeding it consumes the DEVICE-resident
            # heatmaps (no host round trip) and is dispatched ahead,
            # behind the dense program in the device queue.
            batched = (
                len(group) > 1
                and picks_for_all
                and PipelineOutput.DETECT in outputs
                and all(
                    it["image_shape"] == group[0]["image_shape"]
                    for it in group
                )
            )
            picks_dev = None
            if batched and not use_contam:
                from spr_pick_tpu.ops.nms import nms_batch_device

                shape = group[0]["image_shape"]
                picks_dev = nms_batch_device(
                    outputs[PipelineOutput.DETECT][
                        :, : shape[0], : shape[1], 0
                    ],
                    nms_radius, threshold=0.02, max_peaks=max_peaks,
                )

            # SPR_EVAL_PIPELINE=1 defers each group's host export by one
            # group so it overlaps the next group's device compute.  On
            # hosts whose device link runs transfers concurrently with
            # compute that hides the export cost; on THIS serialized
            # tunnel an interleaved A/B measured it slightly SLOWER
            # (pulls contend with the in-flight program), so serial order
            # is the default.  The device-side NMS dispatch above is what
            # matters either way: it removed a full heatmap re-upload
            # per group (2.9 -> ~5 micrographs/s e2e).  Since r4 the PNG
            # encode/writes themselves run on the export thread pool
            # (save_image_outputs -> _submit_export), so process_group's
            # serial cost is down to the pick pulls + PSNR — the pool
            # provides the overlap this flag used to be for.
            if pending is not None:
                process_group(*pending)
            pending = (idx, group, outputs, batched, picks_dev)
            if os.environ.get("SPR_EVAL_PIPELINE") != "1":
                process_group(*pending)
                pending = None
            idx += len(group)

        if pending is not None:
            process_group(*pending)
        # Join the threaded artifact writes before reporting: callers (and
        # the e2e bench) must see every PNG/_scores.txt on disk on return.
        self._flush_exports()

        if host_sharded:
            # Each host evaluated only its shard; sum the n/PSNR
            # accumulators across processes so the logged metrics are
            # GLOBAL (identity on single-process runtimes).  The key list
            # is cfg-derived — identical on every host regardless of
            # which metrics its shard touched.
            from spr_pick_tpu.parallel.dcn import allreduce_metrics

            keys = ["n"] + list(self.img_outputs(prefix="psnr").values())
            # The returned base makes a LATER eval over the same un-reset
            # history merge only its delta (post-merge, every host already
            # holds the global totals); reset_metrics drops it.
            self._eval_merge_base = allreduce_metrics(
                eval_history, keys, base=self._eval_merge_base
            )

    def _evaluate_tiled(self, item: Dict) -> Dict:
        """Halo-tiled dense pass for micrographs above `tile_eval_threshold`
        (SURVEY.md §5 long-context analog): fixed-size square tiles with a
        halo covering the U-Net + detector context run through the SAME
        jitted dense step, stitched on host; mesh-sharded when available.
        Returns per-image outputs shaped like the whole-image path."""
        from spr_pick_tpu.parallel.tiling import tiled_dense_apply

        def apply_tiles(chunk):
            # Fresh key per chunk: one shared key would repeat the same
            # reparameterisation noise field in every tile.
            outputs = self._eval_step(
                self.train_state, {"inp": chunk}, self._next_rng()
            )
            return {
                k: v
                for k, v in outputs.items()
                if getattr(v, "ndim", 0) == 4 and v.shape[1:3] == chunk.shape[1:3]
            }

        image = np.asarray(item["inp"])[0, :, :, 0]
        halo = self.tile_eval_halo
        if halo == "auto":
            halo = self._calibrated_halo(
                apply_tiles, image, item.get("image_shape")
            )
        stitched = tiled_dense_apply(
            apply_tiles,
            image,
            tile=self.tile_eval_size,
            halo=halo,
            mesh=self.mesh,
            align=32,
        )
        return {k: v[None, :, :, None] for k, v in stitched.items()}

    def _calibrated_halo(
        self, apply_tiles, image: np.ndarray, image_shape=None
    ) -> int:
        """tile_eval_halo="auto": derive the halo from the model's measured
        context decay on a central crop of the first tiled micrograph
        (calibrate_halo); cached for the rest of the run.  The measured
        deviation includes the reparameterisation noise of a non-zero
        sigma head, so `tol` bounds what the user actually gets, not just
        the context leak.

        Two geometry rules keep the certificate sound:
        * the probe is cropped from the UNPADDED content region
          (`image_shape`) — in square-pad mode a central crop of the canvas
          can be mostly pad zeros, whose flat response understates the
          decay on real content;
        * calibration runs at a SMALLER tile than production, so the probe
          contains window edges with exactly-halo context (at the
          production tile every probe window is clamped into >=2x-halo
          overlap and the curve certifies halos ~2x too small).  The
          certificate transfers: per-pixel deviation depends on distance
          to the truncating edge, not tile size (calibrate_halo docs).

        The cache is keyed on a WEIGHT FINGERPRINT: the decay is
        weight-set dependent (the round-4 multi-seed finding: a 150-step
        model leaks p99 0.1-0.5 past halo 96 while the converged model
        measures ~0.01), so eval-during-training re-probes every snapshot
        and an evaluator re-probes per loaded checkpoint — one cheap
        forward each, instead of reusing a stale certificate."""
        fp = self._weights_fingerprint()
        if self._auto_halo is not None and self._auto_halo[0] == fp:
            return self._auto_halo[1]
        from spr_pick_tpu.parallel.tiling import calibrate_halo, usable_halos

        candidates = (32, 64, 96, 128, 160, 224, 320)
        ih, iw = image_shape if image_shape is not None else image.shape
        ih, iw = min(ih, image.shape[0]), min(iw, image.shape[1])
        side = min(ih, iw, self.tile_eval_size + 2 * max(candidates) + 32)
        side -= side % 32
        y0 = (ih - side) // 2
        x0 = (iw - side) // 2
        probe = image[y0 : y0 + side, x0 : x0 + side]
        cal_tile = min(
            self.tile_eval_size,
            max(128, (side - max(candidates)) // 2 // 32 * 32),
        )
        usable = usable_halos((side, side), cal_tile, candidates)
        try:
            halo, curve = calibrate_halo(
                apply_tiles, probe, tile=cal_tile, halos=candidates,
                align=32, mesh=self.mesh,
            )
            logger.info(
                "tile halo calibrated to %d (probe %dpx, tile %d; "
                "p99 deviation curve: %s)",
                halo, side, cal_tile,
                {k: round(v, 4) for k, v in curve.items()},
            )
        except ValueError as exc:
            halo = max(usable, default=96)
            logger.warning(
                "halo auto-calibration inconclusive (%s); using %d", exc, halo
            )
        self._auto_halo = (fp, halo)
        return halo

    def _weights_fingerprint(self):
        """Cheap, deterministic fingerprint of the current trainable
        weights: (step, f32 abs-sum checksum).  One scalar crosses to the
        host — negligible next to the tiled forward it gates.  Two
        different weight sets loaded at the same step (e.g. two `.wt`
        files) still differ via the checksum."""
        state = self.train_state
        if state is None:
            return None
        return (
            int(state.step),
            float(_tree_checksum(state.trainable)),
        )

    def validation_output_callback(self, output_index: int):
        def callback(idx: int, outputs: Dict, item: Dict):
            if idx == output_index:
                output_dir = os.path.join(self.run_dir_path, "val_imgs_" + self.mode)
                fileformat = "{name}_{iter:08}_{desc}.png"
                scoreformat = "{name}_{iter:08}_{desc}.txt"
                self.save_image_outputs(
                    outputs, item, output_dir, fileformat, scoreformat
                )

        return callback

    def img_outputs(self, prefix: str = None) -> Dict:
        outputs = {PipelineOutput.IMG_DENOISED: "out"}
        if self.cfg[ConfigValue.PIPELINE] == Pipeline.SSDN:
            outputs[PipelineOutput.IMG_MU] = "mu_out"
        if prefix:
            outputs = {k: f"{prefix}_{v}" for k, v in outputs.items()}
        return outputs

    def save_image_outputs(
        self, outputs: Dict, item: Dict, output_dir: str, fileformat: str,
        scoreformat: str = None,
    ):
        """Artifact dumps: nsy/out/out-mu/out-std PNGs + NMS `_scores.txt`.

        Parity: train.py:500-599 (file naming, TSV schema
        `image_name\\tx_coord\\ty_coord\\tscore`, 30 px border filter,
        heatmap floor 0.02).
        """
        os.makedirs(output_dir, exist_ok=True)
        name = item["name"]
        shape = item["image_shape"]
        it = self.state[StateValue.ITERATION]

        def path_for(desc, fmt):
            return os.path.join(
                output_dir, fmt.format(name=name, iter=it, desc=desc)
            )

        def unpad_save(arr, desc):
            if isinstance(arr, jax.Array) and not isinstance(arr, np.ndarray):
                # Device-resident output map: quantise to u8 ON DEVICE and
                # ship 1 byte/px instead of 4 (bit-identical PNG bytes —
                # utils/image_io.quantize_u8_device).  Dispatch here (device
                # queue order preserved); the pull + PNG encode + write run
                # on the export thread pool, overlapping the next group's
                # device compute AND each other.
                u8 = quantize_u8_device(arr, shape)
                self._submit_export(save_u8_image, u8, path_for(desc, fileformat))
                return
            img = unpad(np.asarray(arr)[0, :, :, 0], shape)
            self._submit_export(save_array_image, img, path_for(desc, fileformat))

        unpad_save(item["inp"], "nsy")
        if PipelineOutput.IMG_DENOISED in outputs:
            unpad_save(outputs[PipelineOutput.IMG_DENOISED], "out")
        if PipelineOutput.IMG_MU in outputs:
            unpad_save(outputs[PipelineOutput.IMG_MU], "out-mu")
        if item.get("hm") is not None:
            # Target heatmap dump ("out-target", train.py:587-588).
            unpad_save(np.asarray(item["hm"]), "out-target")
        if PipelineOutput.MODEL_STD_DEV in outputs:
            unpad_save(outputs[PipelineOutput.MODEL_STD_DEV], "out-std")
        if PipelineOutput.DETECT in outputs and scoreformat is not None:
            unpad_save(outputs[PipelineOutput.DETECT], "pred_tar")
            # Keep the heatmap device-resident: write_scores only needs its
            # shape when picks are precomputed, and nms_to_host consumes
            # device arrays directly — fetching the full f32 map here was
            # a pure D2H round trip on the export hot path.
            heatmap = outputs[PipelineOutput.DETECT][0, : shape[0], : shape[1], 0]
            suppressed = None
            if (
                outputs.get("_picks") is None
                and self.cfg.get(ConfigValue.EXCLUDE_CONTAM, False)
                and PipelineOutput.IMG_DENOISED in outputs
            ):
                # Skipped when picks were precomputed: the batched path
                # already seeded its NMS with find_contamination, and
                # write_scores ignores `suppressed` once picks exist.
                from spr_pick_tpu.ops.algorithms import find_contamination

                den = unpad(
                    np.asarray(outputs[PipelineOutput.IMG_DENOISED])[0, :, :, 0],
                    shape,
                )
                suppressed = find_contamination(den).astype(bool)
            self.write_scores(
                heatmap, name, path_for("scores", scoreformat),
                picks=outputs.get("_picks"),
                suppressed=suppressed,
            )

    def write_scores(self, heatmap: np.ndarray, name: str, out_path: str,
                     picks=None, suppressed=None):
        """On-device NMS -> `_scores.txt` rows with the 30 px border filter.

        Parity: train.py:557-571 (including the row/col output order:
        columns are named x_coord/y_coord but the reference writes
        (coords[:,1], coords[:,0]) = (row, col); preserved for downstream
        compatibility with convert_to_star).  `picks` carries precomputed
        (scores, coords) from the batched-NMS path.  ``suppressed`` seeds
        the NMS with an initial suppression mask (the reference's `contam`
        set, algorithms.py:59-77); ignored when `picks` is given (the
        batched path applies it before batch NMS).
        """
        if picks is not None:
            scores, coords = picks
        else:
            scores, coords = nms_to_host(
                heatmap,
                int(self.cfg[ConfigValue.NMS]),
                threshold=0.02,
                max_peaks=int(self.cfg.get(ConfigValue.MAX_PEAKS, 2048)),
                suppressed=suppressed,
            )
        x_max, y_max = heatmap.shape[0] - 30, heatmap.shape[1] - 30
        with open(out_path, "w") as f:
            print("image_name\tx_coord\ty_coord\tscore", file=f)
            for i in range(len(scores)):
                if (
                    30 < coords[i, 1] < x_max
                    and 30 < coords[i, 0] < y_max
                ):
                    print(
                        f"{name}\t{coords[i, 1]}\t{coords[i, 0]}\t{scores[i]}",
                        file=f,
                    )

    # ------------------------------------------------------------------
    # Snapshots / resume
    # ------------------------------------------------------------------

    def snapshot(self, output_name: str = None, subdir: str = None,
                 model_only: bool = False):
        """Parity: train.py:603-636."""
        if subdir is None and self.mode == "joint":
            subdir = "model_jt" if model_only else "training_jt"
        if subdir is None and self.mode == "denoise":
            subdir = "model_dn" if model_only else "training_dn"
        output_dir = os.path.join(self.run_dir_path, subdir)
        os.makedirs(output_dir, exist_ok=True)
        iteration = self.state[StateValue.ITERATION]
        if model_only:
            if output_name is None:
                output_name = "model_{:08d}.wt".format(iteration)
            ckpt.save_weights(
                os.path.join(output_dir, output_name),
                self.train_state.trainable,
                self.train_state.static,
                self.cfg,
                self.mode,
            )
        else:
            if output_name is None:
                output_name = "model_{:08d}.training".format(iteration)
            ckpt.save_training(
                os.path.join(output_dir, output_name),
                self.train_state.trainable,
                self.train_state.static,
                self.train_state.opt_state,
                self.cfg,
                self.mode,
                iteration,
                rng_key=self._rng_key,
                extra={"data_state": self.data_state_dict()},
            )

    def data_state_dict(self):
        """Serialisable data-plane state: sampler position + augment RNGs.

        The reference drops all of this on resume (train.py:975-979 rebuilds
        the sampler from scratch) so a resumed run re-draws early samples;
        here — consistent with the optimizer-state restore — the full
        stochastic data plane is checkpointed: a killed-and-resumed run
        draws the identical next batches.
        """
        state = {}
        if self.train_sampler is not None and hasattr(
            self.train_sampler, "state_dict"
        ):
            state["sampler"] = self.train_sampler.state_dict()
        if self.patch_pipeline is not None and hasattr(
            self.patch_pipeline, "state_dict"
        ):
            state["pipeline"] = self.patch_pipeline.state_dict()
        return state

    def load_data_state_dict(self, state) -> None:
        """Apply a data_state_dict onto freshly-built sampler/pipeline."""
        if not state:
            return
        if "sampler" in state and self.train_sampler is not None:
            self.train_sampler.load_state_dict(state["sampler"])
        if "pipeline" in state and self.patch_pipeline is not None:
            self.patch_pipeline.load_state_dict(state["pipeline"])

    def load_state_dict(self, path_or_state):
        """Load a `.training` checkpoint and rebuild engine + state.

        Parity: train.py:984-1000 (RNG restored; like the reference,
        optimizer state IS stored but a fresh Adam state is used on resume —
        the reference deliberately skips optimizer restore at
        train.py:998-1000; we restore it since it is strictly better, but
        keep the field optional)."""
        state = path_or_state
        if isinstance(state, str):
            state = ckpt.load(state, mode=self.mode)
        self.cfg = state["cfg"]
        self.mode = state.get("mode", self.mode) or self.mode
        # Loss weights travel with the cfg (single source of truth): a
        # resumed run must train with the SAME alpha/tau as the original
        # or the trajectory silently diverges.
        self.alpha = float(self.cfg.get(ConfigValue.ALPHA, self.alpha))
        self.tau = float(self.cfg.get(ConfigValue.TAU, self.tau))
        self.denoiser = Denoiser(self.cfg, mode=self.mode)
        base = init_state(
            self.denoiser, seed=int(self.cfg.get(ConfigValue.SEED, 0)),
            patch=self.cfg[ConfigValue.TRAIN_PATCH_SIZE],
        )
        opt_state = state.get("opt_state")
        if opt_state is None:
            opt_state = base.opt_state
        else:
            opt_state = jax.tree_util.tree_map(
                lambda ref, new: jnp.asarray(new), base.opt_state, opt_state
            )
        self.train_state = TrainState(
            step=jnp.asarray(state["iteration"] // max(
                self.cfg[ConfigValue.TRAIN_MINIBATCH_SIZE], 1), jnp.int32),
            trainable=jax.tree_util.tree_map(jnp.asarray, state["trainable"]),
            static=jax.tree_util.tree_map(jnp.asarray, state["static"]),
            opt_state=opt_state,
        )
        self.state[StateValue.ITERATION] = state["iteration"]
        if state.get("rng_key") is not None:
            self._rng_key = jnp.asarray(state["rng_key"])
        else:
            self._rng_key = jax.random.PRNGKey(0)
        # Data plane (sampler/augment RNGs) is built lazily by train();
        # stash its checkpointed state for application there.
        self._pending_data_state = (state.get("extra") or {}).get("data_state")
        self._train_step = None
        self._train_scan = None
        self._denoise_scan = None
        self._eval_step = None
        self._setup_mesh()

    def load_weights(self, path_or_state):
        """Load a `.wt` weights checkpoint (eval path)."""
        state = path_or_state
        if isinstance(state, str):
            state = ckpt.load(state, mode=self.mode)
        self.cfg = state["cfg"]
        self.mode = state.get("mode", self.mode) or self.mode
        self.alpha = float(self.cfg.get(ConfigValue.ALPHA, self.alpha))
        self.tau = float(self.cfg.get(ConfigValue.TAU, self.tau))
        self.denoiser = Denoiser(self.cfg, mode=self.mode)
        base = init_state(
            self.denoiser, seed=0, patch=self.cfg[ConfigValue.TRAIN_PATCH_SIZE]
        )
        self.train_state = TrainState(
            step=jnp.zeros((), jnp.int32),
            trainable=jax.tree_util.tree_map(jnp.asarray, state["trainable"]),
            static=jax.tree_util.tree_map(jnp.asarray, state["static"]),
            opt_state=base.opt_state,
        )
        self._rng_key = jax.random.PRNGKey(0)

    # ------------------------------------------------------------------
    # Metrics / strings
    # ------------------------------------------------------------------

    def write_metrics(self, eval_prefix: str = "eval"):
        def write_metric_dict(metric_dict, prefix):
            for key, metric in metric_dict.items():
                if isinstance(metric, Metric) and not metric.empty():
                    self.writer.add_scalar(
                        prefix + "/" + str(key),
                        metric.accumulated(),
                        self.state[StateValue.ITERATION],
                    )

        write_metric_dict(self.state[StateValue.HISTORY][HistoryValue.TRAIN], "train")
        self.writer.add_scalar(
            "train/learning_rate", self.learning_rate, self.state[StateValue.ITERATION]
        )
        write_metric_dict(
            self.state[StateValue.HISTORY][HistoryValue.EVAL], eval_prefix
        )

    def state_str(self, eval_prefix: str = "EVAL") -> str:
        state_str = self.train_state_str()
        if self.state[StateValue.HISTORY][HistoryValue.EVAL]["n"] > 0:
            prefix = "{:10} {:>5}".format("", eval_prefix)
            state_str = os.linesep.join([state_str, self.eval_state_str(prefix)])
        return state_str

    def train_state_str(self) -> str:
        def eta_str():
            timings = self.state[StateValue.HISTORY][HistoryValue.TIMINGS]
            eta = timings.get("eta", None)
            if isinstance(eta, (int, float)):
                return "<1s" if eta < 1 else seconds_to_dhms(eta)
            return "???"

        history = self.state[StateValue.HISTORY]
        summary = "[{:08d}] {:>5} | ".format(self.state[StateValue.ITERATION], "TRAIN")
        parts = []
        for key, metric in history[HistoryValue.TRAIN].items():
            if isinstance(metric, Metric) and not metric.empty():
                parts.append("{}={:8.2f}".format(key, float(np.mean(metric.accumulated()))))
        summary += ", ".join(parts)
        total_train = history[HistoryValue.TIMINGS]["total"]
        if parts:
            summary += " | "
        summary += "[{} ~ ETA: {}]".format(
            seconds_to_dhms(total_train.total, trim=False), eta_str()
        )
        return summary

    def eval_state_str(self, prefix: str = "EVAL") -> str:
        summary = "{} | ".format(prefix)
        parts = []
        for key, metric in self.state[StateValue.HISTORY][HistoryValue.EVAL].items():
            if isinstance(metric, Metric) and not metric.empty():
                parts.append("{}={:8.2f}".format(key, float(np.mean(metric.accumulated()))))
        return summary + ", ".join(parts)

    def reset_metrics(self, eval: bool = True, train: bool = True):
        def reset(metric_dict):
            metric_dict["n"] = 0
            for metric in metric_dict.values():
                if isinstance(metric, Metric):
                    metric.reset()

        if train:
            reset(self.state[StateValue.HISTORY][HistoryValue.TRAIN])
        if eval:
            reset(self.state[StateValue.HISTORY][HistoryValue.EVAL])
            # Fresh history: the multi-host merge base is stale now.
            self._eval_merge_base = None

    def update_eta(self, samples: int, elapsed: float, smoothing_factor=0.95):
        """Parity: train.py:890-923."""
        timings = self.state[StateValue.HISTORY][HistoryValue.TIMINGS]
        if samples <= 0:
            return timings.get("eta")
        t = elapsed / samples
        r = self.cfg[ConfigValue.ITERATIONS] - self.state[StateValue.ITERATION]
        if self.testset is not None:
            r += len(self.test_sampler) * math.ceil(
                r / self.cfg[ConfigValue.EVAL_INTERVAL]
            )
        new_eta = t * r
        if "eta" not in timings or isinstance(timings["eta"], TrackedTime):
            timings["eta"] = new_eta
        else:
            sf = smoothing_factor
            timings["eta"] = sf * new_eta + (1 - sf) * timings["eta"]
        return timings["eta"]

    # ------------------------------------------------------------------
    # Run directory naming
    # ------------------------------------------------------------------

    @property
    def writer(self) -> ScalarWriter:
        os.makedirs(self.run_dir_path, exist_ok=True)
        if self._writer is None:
            self._writer = ScalarWriter(
                self.run_dir_path, purge_step=self.state[StateValue.ITERATION] + 1
            )
        return self._writer

    @property
    def run_dir_path(self) -> str:
        return os.path.join(self.runs_dir, self.run_dir)

    @property
    def run_dir(self) -> str:
        if self._run_dir is None:
            self._run_dir = "{:05d}-train-{}".format(
                self.next_run_id(), self.config_name()
            )
        return self._run_dir

    def next_run_id(self) -> int:
        run_ids = []
        if os.path.exists(self.runs_dir):
            for run_dir_path, _, _ in os.walk(self.runs_dir):
                run_dir = run_dir_path.split(os.sep)[-1]
                try:
                    run_ids.append(int(run_dir.split("-")[0]))
                except Exception:
                    continue
        return max(run_ids) + 1 if run_ids else 0

    def config_name(self) -> str:
        """Parity: train.py:925-961."""

        def iter_str() -> str:
            iterations = (
                self.state[StateValue.ITERATION]
                if self.state[StateValue.ITERATION] > 0
                else self.cfg[ConfigValue.ITERATIONS]
            )
            if iterations >= 1000000:
                return "iter%dm" % (iterations // 1000000)
            elif iterations >= 1000:
                return "iter%dk" % (iterations // 1000)
            return "iter%d" % iterations

        lst = [cfg_mod.config_name(self.cfg), iter_str()]
        if self.cfg.get(ConfigValue.TEST_DATASET_NAME, None) is not None:
            lst = [self.cfg[ConfigValue.TEST_DATASET_NAME]] + lst
        if self.cfg.get(ConfigValue.TRAIN_DATASET_NAME, None) is not None:
            lst = [self.cfg[ConfigValue.TRAIN_DATASET_NAME]] + lst
        lst += [str(self.cfg[ConfigValue.ALPHA]), str(self.cfg[ConfigValue.TAU])]
        lst += [self.mode]
        return "-".join(lst)


def resume_run(run_dir: str, iteration: int = None, mode: str = None) -> DenoiserTrainer:
    """Resume training from a `.training` snapshot (latest by default).

    Parity: train.py:1204-1242 — with the `mode` argument actually supplied
    (the reference omits it and would raise; SURVEY.md §7.4).  When ``mode``
    is None it is auto-detected from the run directory: a `training_jt/`
    subdir means a joint run, `training_dn/` a denoise-only (`--dn_only`)
    run — so the CLI can resume either kind without a flag.  ``iteration``
    selects a specific ``model_{iter:08d}.training`` snapshot instead of
    the max-iteration one (rollback / trajectory-replay).
    """
    run_dir = os.path.abspath(run_dir)
    runs_dir = os.path.abspath(os.path.join(run_dir, ".."))
    if mode is None:
        if os.path.isdir(os.path.join(run_dir, "training_jt")):
            mode = "joint"
        elif os.path.isdir(os.path.join(run_dir, "training_dn")):
            mode = "denoise"
        else:
            raise FileNotFoundError(
                f"no training_jt/ or training_dn/ snapshots under {run_dir}"
            )
    subdir = "training_jt" if mode == "joint" else "training_dn"
    if iteration is None:
        path = ckpt.find_latest_training(run_dir, subdir)
    else:
        path = os.path.join(
            run_dir, subdir, f"model_{iteration:08d}.training"
        )
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"no snapshot for iteration {iteration} under "
                f"{os.path.join(run_dir, subdir)}"
            )
    logger.info("Loading from '%s'...", path)
    trainer = DenoiserTrainer(
        None, mode=mode, runs_dir=runs_dir, run_dir=os.path.basename(run_dir)
    )
    trainer.load_state_dict(path)
    logger.info("Loaded training state.")
    for timing in trainer.state[StateValue.HISTORY][HistoryValue.TIMINGS].values():
        if isinstance(timing, TrackedTime):
            timing.forget()
    return trainer
