#!/usr/bin/env python
"""Headline benchmarks: all five BASELINE.json configs.

Workloads (BASELINE.md "Configs to benchmark"):

1. n2c supervised denoise train, gaussian noise, 64px patches, batch 2 —
   the trainer's production folder/hdf5 fast path (device-resident image
   stack, fused K-step scan incl. crop gather + noise synth).
2. n2v masked blind-spot train (incl. device UPS masking), gauss, batch 4.
3. ssdn_u_only blind-spot + sigma-net (noise_value=var) train, batch 4.
4. ssdn joint denoise+detect train (scan-chunked fast path, batch 4 of
   64^2 patches, both flip-TTA forwards, PU + NLL + consistency, Adam,
   BN, HBM patch gather) — the trainer's fast path.
5a. end-to-end evaluator pass: DenoiserEvaluator._evaluate over
   synthetic 1024^2 micrographs INCLUDING artifact export
   (PNG dumps + batched NMS + _scores.txt) — the number users get.
5b. device-only dense joint inference (denoise+detect+NMS, batch 2,
   worst-case 2048-peak NMS, only picks to host) — the HEADLINE, last
   line, with the train number embedded.

Prints one JSON line per metric; the headline line is LAST so drivers
that record a single line capture it (plus the embedded train keys).

`vs_baseline` compares against the PyTorch reference on this host's CPU
(no published numbers exist; SURVEY.md §6), measured with
tools/measure_reference_baseline.py (warmed, multi-iteration): see
REFERENCE_CPU below.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.ops.nms import non_maximum_suppression_multipeak
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue, PipelineOutput
from spr_pick_tpu.steps import init_state, make_train_scan, make_train_step

# Reference (torch CPU, this host) seconds per unit, measured with
# tools/measure_reference_baseline.py.  Keys match the metric lines below.
REFERENCE_CPU = {
    "train_joint": 3.1202,   # s/iter, batch 4   (joint fwd x2 + bwd + Adam)
    "train_n2c": 0.1938,     # s/iter, batch 2   (NoiseNetwork)
    "train_n2v": 0.3551,     # s/iter, batch 4   (NoiseNetwork; mask prep omitted)
    "train_u_only": 1.6209,  # s/iter, batch 4   (blindspot net; sigma-net omitted)
    "eval_e2e": 166.3,       # s/micrograph      (dense fwd + host NMS; writes omitted)
    "dense_infer": 165.2,    # s/micrograph      (fill()-dense fwd, 1+3 warmed iters)
}
_REF_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "reference_cpu_baseline.json")
if os.path.exists(_REF_FILE):
    with open(_REF_FILE) as f:
        REFERENCE_CPU.update(json.load(f))

SIZE = 1024
BATCH = 2
N_WARMUP = 2
N_ITERS = 10

TRAIN_BATCH = 4
TRAIN_CROP = 64
TRAIN_K = 64  # steps per scan chunk


def emit(metric, value, unit, ref_key, extra=None):
    ref = REFERENCE_CPU.get(ref_key)
    line = {"metric": metric, "value": round(value, 4), "unit": unit,
            "vs_baseline": round(value * ref, 2) if ref else None}
    if extra:
        line.update(extra)
    print(json.dumps(line), flush=True)
    return line


def make_denoiser():
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg_mod.infer(c, model_only=True)
    return c, Denoiser(c, mode="joint")


# ---------------------------------------------------------------------------
# Configs 1-3: denoise-only training (production device-data-plane scan path)
# ---------------------------------------------------------------------------


class _ArrayDataset:
    def __init__(self, imgs):
        self.imgs = imgs

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, i):
        return self.imgs[i]


def bench_denoise_train(algorithm, noise_value, batch, n_reps=3):
    """Train throughput for a denoise-only pipeline on the trainer's
    production fast path: HBM-resident image stack + K-step fused scan
    (crop gather, noise synth / n2v UPS masking, update — all one XLA
    program; the host contributes three (K, B) int32 coordinate arrays
    per chunk)."""
    from spr_pick_tpu.data.patches import DeviceDenoisePipeline
    from spr_pick_tpu.steps import make_denoise_scan

    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = algorithm
    c[ConfigValue.NOISE_STYLE] = "gauss25"
    if noise_value is not None:
        c[ConfigValue.NOISE_VALUE] = noise_value
    cfg_mod.infer(c, model_only=True)
    den = Denoiser(c, mode="denoise")
    state = init_state(den, seed=0, patch=TRAIN_CROP)
    scan = make_denoise_scan(
        den, alpha=0.75, tau=0.01, patch=TRAIN_CROP,
        algorithm=algorithm, noise_style="gauss25",
    )

    rng = np.random.RandomState(0)
    imgs = [rng.randn(512, 512).astype(np.float32) for _ in range(4)]
    pipe = DeviceDenoisePipeline(
        _ArrayDataset(imgs), patch=TRAIN_CROP, algorithm=algorithm,
        noise_style="gauss25", seed=0,
    )
    lrs = jnp.full((TRAIN_K,), 1e-4, jnp.float32)

    def chunk(state, i):
        flat, ys, xs = pipe.sample_coords((TRAIN_K, batch))
        return scan(
            state, pipe.images_dev,
            jnp.asarray(flat), jnp.asarray(ys), jnp.asarray(xs),
            lrs, jax.random.PRNGKey(i),
        )

    state, metrics = chunk(state, 0)
    _ = float(np.asarray(metrics["loss"])[-1])  # compile + sync
    t0 = time.time()
    for i in range(n_reps):
        state, metrics = chunk(state, i + 1)
    _ = float(np.asarray(metrics["loss"])[-1])
    return n_reps * TRAIN_K / (time.time() - t0)


# ---------------------------------------------------------------------------
# Config 4: joint scan-chunked training
# ---------------------------------------------------------------------------


def bench_train(den, state):
    """Scan-chunked train throughput (iters/sec at batch 4)."""
    scan = make_train_scan(den, alpha=0.75, tau=0.01, crop=TRAIN_CROP)
    rng = np.random.RandomState(1)
    n_imgs, hw = 4, 512
    images = jnp.asarray(rng.rand(n_imgs, hw, hw), jnp.float32)
    half = TRAIN_CROP // 2

    def sample_indices(k):
        r = np.random.RandomState(k)
        flat = r.randint(0, n_imgs, size=(TRAIN_K, TRAIN_BATCH)).astype(np.int32)
        ys = r.randint(half, hw - half, size=(TRAIN_K, TRAIN_BATCH)).astype(np.int32)
        xs = r.randint(half, hw - half, size=(TRAIN_K, TRAIN_BATCH)).astype(np.int32)
        # Host label point-reads (the production path's labels_for).
        labels = ((r.rand(TRAIN_K, TRAIN_BATCH) > 0.99).astype(np.float32)
                  * 2 - 1)
        return (jnp.asarray(flat), jnp.asarray(ys), jnp.asarray(xs),
                jnp.asarray(labels))

    lrs = jnp.full((TRAIN_K,), 1e-4, jnp.float32)
    key = jax.random.PRNGKey(0)

    flat, ys, xs, labels = sample_indices(0)
    state, metrics = scan(state, images, flat, ys, xs, labels, lrs, key)
    _ = float(np.asarray(metrics["loss"])[-1])  # compile + sync

    reps = 3
    t0 = time.time()
    for i in range(reps):
        flat, ys, xs, labels = sample_indices(i + 1)
        state, metrics = scan(state, images, flat, ys, xs, labels, lrs, key)
        _ = float(np.asarray(metrics["loss"])[-1])
    dt = (time.time() - t0) / (reps * TRAIN_K)
    # The scan donates its input state; hand the live one back so the
    # caller's buffers aren't dead.
    return 1.0 / dt, state


def bench_train_scaling(den):
    """Batch-scaling sweep of the joint scan path: batch 16 (the
    reference's own default, cfg.py:12-42), 64 and 256 — the TPU-native
    high-throughput regime the batch-4 parity number hides (VERDICT r3:
    train MFU at batch 4 is ~1.5% of chip peak; users provisioning a slice
    need the samples/sec curve).  Emits iters/sec, samples/sec and
    achieved TFLOP/s (XLA cost model) per point."""
    half = TRAIN_CROP // 2
    n_imgs, hw = 4, 512
    rng0 = np.random.RandomState(1)
    images = jnp.asarray(rng0.rand(n_imgs, hw, hw), jnp.float32)
    out = []
    for batch, k, reps in ((16, 32, 3), (64, 16, 3), (256, 8, 3)):
        state = init_state(den, seed=0, patch=TRAIN_CROP)
        scan = make_train_scan(den, alpha=0.75, tau=0.01, crop=TRAIN_CROP)

        def sample(i):
            r = np.random.RandomState(i * 7 + batch)
            flat = r.randint(0, n_imgs, size=(k, batch)).astype(np.int32)
            ys = r.randint(half, hw - half, size=(k, batch)).astype(np.int32)
            xs = r.randint(half, hw - half, size=(k, batch)).astype(np.int32)
            labels = ((r.rand(k, batch) > 0.99).astype(np.float32) * 2 - 1)
            return (jnp.asarray(flat), jnp.asarray(ys), jnp.asarray(xs),
                    jnp.asarray(labels))

        lrs = jnp.full((k,), 1e-4, jnp.float32)
        key = jax.random.PRNGKey(0)
        flat, ys, xs, labels = sample(0)
        flops = None
        try:
            ca = scan.lower(
                state, images, flat, ys, xs, labels, lrs, key
            ).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
        state, metrics = scan(state, images, flat, ys, xs, labels, lrs, key)
        _ = float(np.asarray(metrics["loss"])[-1])  # compile + sync
        t0 = time.time()
        for i in range(reps):
            flat, ys, xs, labels = sample(i + 1)
            state, metrics = scan(state, images, flat, ys, xs, labels, lrs, key)
            _ = float(np.asarray(metrics["loss"])[-1])
        dt = time.time() - t0
        iters = reps * k / dt
        point = {
            "batch": batch,
            "iters_per_sec": round(iters, 2),
            "samples_per_sec": round(iters * batch, 1),
            "tflops_per_sec": round(flops * reps / dt / 1e12, 3)
            if flops else None,
        }
        out.append(point)
    return out


# ---------------------------------------------------------------------------
# Config 5a: true end-to-end evaluator (incl. artifact export)
# ---------------------------------------------------------------------------


def bench_eval_e2e(n_micrographs=4, size=1024):
    """DenoiserEvaluator._evaluate over synthetic micrographs, including
    every host artifact the evaluator delivers: PNG dumps (nsy/out/...,
    pred_tar), batched NMS and `_scores.txt` — the end-to-end
    micrographs/sec a user observes, not just the device program."""
    from spr_pick_tpu.data import mrc as mrc_mod
    from spr_pick_tpu.eval import DenoiserEvaluator
    from spr_pick_tpu.utils import checkpoint as ckpt_mod

    tmp = tempfile.mkdtemp(prefix="bench_eval_")
    try:
        rng = np.random.RandomState(0)
        rows = []
        for i in range(n_micrographs):
            img = rng.randn(size, size).astype(np.float32) * 0.5
            path = os.path.join(tmp, f"mic{i}.mrc")
            mrc_mod.write(path, img)
            rows.append(f"mic{i}\t{path}")
        images_txt = os.path.join(tmp, "imgs.txt")
        with open(images_txt, "w") as f:
            f.write("image_name\tpath\n" + "\n".join(rows) + "\n")

        c, den = make_denoiser()
        state = init_state(den, seed=0, patch=TRAIN_CROP)
        wt = os.path.join(tmp, "model.wt")
        ckpt_mod.save_weights(wt, state.trainable, state.static, c, "joint")

        evaluator = DenoiserEvaluator(
            wt, runs_dir=os.path.join(tmp, "runs"), mode="joint"
        )
        evaluator.cfg[ConfigValue.TEST_MINIBATCH_SIZE] = 2
        evaluator.set_test_data(images_txt)
        # Warm pass compiles the dense program; timed pass measures the
        # steady-state number on a FRESH evaluator (histories reset).
        evaluator.evaluate()
        evaluator.reset_metrics(train=False)
        t0 = time.time()
        evaluator._evaluate(
            output_callback=evaluator.eval_output_callback(), picks_for_all=True
        )
        dt = (time.time() - t0) / n_micrographs
        return 1.0 / dt
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_FAILED_SECTIONS = []


def _section(label, fn):
    """Run one bench section fault-isolated: a mid-run failure (e.g. the
    TPU tunnel drifting dead between sections) must not wipe the whole
    artifact — later sections and the headline line still run.  The
    failure itself is loud: full traceback to stderr, an "error" JSON
    line, AND a nonzero exit code after the headline (main() checks
    _FAILED_SECTIONS), so a genuine regression cannot pass an rc gate
    silently."""
    import traceback

    try:
        return fn()
    except Exception as exc:  # noqa: BLE001 — survive, report, continue
        traceback.print_exc()
        print(json.dumps({"metric": label, "error": repr(exc)}), flush=True)
        _FAILED_SECTIONS.append(label)
        return None


def main():
    c, den = make_denoiser()
    state = init_state(den, seed=0, patch=64)
    nms_radius = int(c[ConfigValue.NMS])
    max_peaks = int(c[ConfigValue.MAX_PEAKS])

    # Configs 1-3
    n2c = _section("n2c train", partial(
        bench_denoise_train, NoiseAlgorithm.NOISE_TO_CLEAN, None, batch=2))
    if n2c is not None:
        emit("n2c train (batch 2, fused device data plane), single chip",
             n2c, "iters/sec", "train_n2c",
             extra={"denominator_note": "reference host data prep omitted "
                    "from the baseline denominator - vs_baseline is "
                    "conservative (understates the speedup)"})
    n2v = _section("n2v train", partial(
        bench_denoise_train, NoiseAlgorithm.NOISE_TO_VOID, None, batch=4))
    if n2v is not None:
        emit("n2v train (batch 4, fused device UPS masking), single chip",
             n2v, "iters/sec", "train_n2v",
             extra={"denominator_note": "reference n2v mask prep omitted "
                    "from the baseline denominator - vs_baseline is "
                    "conservative (understates the speedup)"})
    u_only = _section("ssdn_u_only train", partial(
        bench_denoise_train,
        NoiseAlgorithm.SELFSUPERVISED_DENOISING_MEAN_ONLY,
        NoiseValue.UNKNOWN_VARIABLE, batch=4))
    if u_only is not None:
        emit("ssdn_u_only train (batch 4, sigma-net, fused device data plane), single chip",
             u_only, "iters/sec", "train_u_only",
             extra={"denominator_note": "reference sigma-net forward "
                    "omitted from the baseline denominator - vs_baseline "
                    "is conservative (understates the speedup)"})

    # Config 4
    train_iters_per_sec = None
    res = _section("joint train", lambda: bench_train(den, state))
    if res is not None:
        train_iters_per_sec, _ = res
        emit("joint train step (batch 4, scan-chunked), single chip",
             train_iters_per_sec, "iters/sec", "train_joint")

    # Config 4b: batch-scaling sweep (high-throughput training regime)
    scaling = _section("joint train scaling", lambda: bench_train_scaling(den))
    if scaling:
        for point in scaling:
            emit(
                f"joint train step (batch {point['batch']}, scan-chunked), "
                "single chip",
                point["samples_per_sec"], "samples/sec", None,
                extra={k: v for k, v in point.items() if k != "samples_per_sec"},
            )

    # Config 5a: end-to-end evaluator incl. artifacts
    e2e = _section("eval e2e", bench_eval_e2e)
    if e2e is not None:
        emit("end-to-end eval incl. artifact export (PNGs+NMS+scores), single chip",
             e2e, "micrographs/sec", "eval_e2e")

    # Config 5b: device-only dense inference headline (LAST line)
    # Fresh init for inference: the worst-case-NMS claim (sigmoid ~0.5
    # everywhere -> 2048-peak cap) holds for untrained weights; timing on
    # the just-trained state would quietly lighten the NMS workload.
    state = init_state(den, seed=0, patch=64)

    nms = partial(
        non_maximum_suppression_multipeak,
        radius=nms_radius,
        threshold=0.02,
        max_peaks=max_peaks,
    )

    @jax.jit
    def infer(state, inp, rng):
        _, (outputs, _) = den.run_pipeline(
            state.trainable, state.static, {"inp": inp}, rng,
            train=False, dense=True,
        )
        hm = outputs[PipelineOutput.DETECT][..., 0]  # (B, H, W)
        scores, coords, count = jax.vmap(nms)(hm)
        # Denoised image checksum keeps the PME computation live without
        # shipping megabytes to the host.
        checksum = jnp.sum(outputs[PipelineOutput.IMG_DENOISED])
        return checksum, scores, coords, count

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 1), jnp.float32)
    key = jax.random.PRNGKey(0)

    def run_once():
        checksum, scores, coords, count = infer(state, x, key)
        float(checksum)
        np.asarray(scores)
        np.asarray(coords)
        np.asarray(count)

    for _ in range(N_WARMUP):
        run_once()

    t0 = time.time()
    for _ in range(N_ITERS):
        run_once()
    dt = (time.time() - t0) / (N_ITERS * BATCH)

    ref_tr = REFERENCE_CPU.get("train_joint")
    have_tr = train_iters_per_sec is not None
    emit(
        "dense joint 1024^2 inference (denoise+detect+NMS), single chip",
        1.0 / dt, "micrographs/sec", "dense_infer",
        extra={
            "train_iters_per_sec": round(train_iters_per_sec, 2)
            if have_tr else None,
            "train_vs_baseline": round(train_iters_per_sec * ref_tr, 2)
            if (have_tr and ref_tr) else None,
            "eval_e2e_micrographs_per_sec": round(e2e, 4)
            if e2e is not None else None,
        },
    )

    if _FAILED_SECTIONS:
        # The headline is out; now make the failure visible to rc-gating
        # drivers too (every failed section already printed its traceback
        # and error JSON line above).
        import sys

        sys.stderr.write(
            f"bench.py: {len(_FAILED_SECTIONS)} section(s) failed: "
            f"{', '.join(_FAILED_SECTIONS)}\n"
        )
        sys.exit(1)


def _gate_backend():
    """Fail FAST with a clear message if the TPU tunnel is dead.

    The axon client can hang for many minutes in init before an
    UNAVAILABLE; without this gate a driver invoking bench.py would sit on
    a silent hang instead of recording an actionable error.  CPU fallback
    is deliberately NOT offered — CPU numbers would corrupt the benchmark
    record.
    """
    import sys

    from spr_pick_tpu.utils.cpuforce import default_backend_alive

    timeout = float(os.environ.get("SPR_TPU_PROBE_TIMEOUT", "90"))
    if not default_backend_alive(timeout=timeout):
        sys.stderr.write(
            "bench.py: default jax backend unreachable (TPU tunnel "
            f"dead/hung; probe timeout {timeout:.0f}s) - refusing to "
            "bench.  Retry when the TPU client is healthy.\n"
        )
        sys.exit(1)


if __name__ == "__main__":
    _gate_backend()
    main()
