#!/usr/bin/env python
"""End-to-end spr_pick_tpu walkthrough on synthetic data.

Runs the complete workflow a reference (nextpyp/spr_pick) user follows —
train a joint denoise+pick model from a handful of labelled coordinates,
evaluate it densely over whole micrographs, export RELION-ready picks —
plus the programmatic Picker API this framework adds.

    python examples/quickstart.py [-o OUTDIR] [--iterations N] [--size S]

Everything lands under OUTDIR (default: a fresh temp dir, printed at the
end).  With the default tiny settings this takes a few minutes on one
TPU chip (first XLA compile dominates) and also runs fine on CPU.

Each stage prints the equivalent `joint ...` CLI command, so this file
doubles as a live translation table from the reference workflow
(reference: README.md "Training" / "Evaluation" sections).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.data import mrc
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue


def synthesize_dataset(out_dir: str, n_images: int, size: int, seed: int = 0):
    """Micrographs with bright Gaussian 'particles' at known coordinates,
    written as MRC files + the two TSV manifests the trainer consumes
    (`image_name\\tpath` and `image_name\\tx_coord\\ty_coord` — the same
    format `generate_train_files.py` emits from real data)."""
    rng = np.random.RandomState(seed)
    img_dir = os.path.join(out_dir, "micrographs")
    os.makedirs(img_dir, exist_ok=True)
    rows_img, rows_coord = [], []
    for i in range(n_images):
        img = rng.randn(size, size).astype(np.float32) * 0.5
        for _ in range(8):
            # Keep particles inside the PU sampler's border margins.
            x = rng.randint(85, size - 150)
            y = rng.randint(85, size - 150)
            yy, xx = np.mgrid[-12:13, -12:13]
            img[y - 12 : y + 13, x - 12 : x + 13] += (
                np.exp(-(xx**2 + yy**2) / (2 * 4.0**2)) * 4.0
            )
            rows_coord.append(f"mic{i}\t{x}\t{y}")
        path = os.path.join(img_dir, f"mic{i}.mrc")
        mrc.write(path, img)
        rows_img.append(f"mic{i}\t{path}")

    images_txt = os.path.join(out_dir, "train_images.txt")
    coords_txt = os.path.join(out_dir, "train_coords.txt")
    with open(images_txt, "w") as f:
        f.write("image_name\tpath\n" + "\n".join(rows_img) + "\n")
    with open(coords_txt, "w") as f:
        f.write("image_name\tx_coord\ty_coord\n" + "\n".join(rows_coord) + "\n")
    return images_txt, coords_txt


def train(images_txt, coords_txt, runs_dir, iterations, batch):
    """Joint training: blind-spot U-Net denoiser + PU-trained detector.

    CLI equivalent:
      joint train start -a ssdn --noise_value const -n gauss \\
          -t IMAGES -l COORDS --alpha 0.75 --tau 0.05 \\
          --iterations N --train_batch_size B --runs_dir RUNS
    """
    from spr_pick_tpu.train import DenoiserTrainer

    cfg = cfg_mod.base()
    cfg[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    cfg[ConfigValue.NOISE_STYLE] = "gauss"
    cfg[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    cfg[ConfigValue.ITERATIONS] = iterations
    cfg[ConfigValue.TRAIN_MINIBATCH_SIZE] = batch
    cfg[ConfigValue.EVAL_INTERVAL] = iterations  # one validation at the end
    cfg[ConfigValue.PRINT_INTERVAL] = max(iterations // 4, 1)
    cfg[ConfigValue.SNAPSHOT_INTERVAL] = iterations
    cfg[ConfigValue.NUM_EVAL] = 1

    trainer = DenoiserTrainer(
        cfg, mode="joint", alpha=0.75, tau=0.05, runs_dir=runs_dir
    )
    trainer.set_train_data(images_txt)
    trainer.set_train_label(coords_txt)
    trainer.set_test_data(images_txt)
    trainer.set_test_label(coords_txt)
    trainer.train()
    return trainer.run_dir_path


def resume(run_dir):
    """Crash recovery: pick up from the latest `.training` snapshot with
    the exact optimizer, RNG and data-plane state (the resumed run draws
    the identical batches the uninterrupted run would have).

    CLI equivalent:  joint train resume RUN_DIR
    """
    from spr_pick_tpu.train import resume_run

    trainer = resume_run(run_dir)
    # This demo run already hit its iteration target, so train() adds no
    # training steps — it re-runs the final validation pass and rewrites
    # the final snapshot/.wt before stopping.
    trainer.train()


def evaluate(run_dir, images_txt, coords_txt, runs_dir, star_out):
    """Dense whole-micrograph eval: per-pixel heatmap -> greedy NMS ->
    `_scores.txt` + PNG artifacts + one aggregated RELION .star.

    CLI equivalent (star_threshold/scale 0/1 match the convert() call
    below — production defaults are 0.13/4.0, tuned for the reference's
    8x->2x binned preprocessing):
      joint eval -m RUN/final-*.wt -d IMAGES -l COORDS --num N \\
          --runs_dir RUNS --export_star OUT.star \\
          --star_threshold 0 --star_scale 1
    """
    from spr_pick_tpu.data.star_export import convert
    from spr_pick_tpu.eval import DenoiserEvaluator

    wt = [f for f in os.listdir(run_dir) if f.endswith(".wt")]
    assert wt, f"no final .wt checkpoint in {run_dir}"
    model = os.path.join(run_dir, wt[0])

    evaluator = DenoiserEvaluator(model, runs_dir=runs_dir, mode="joint")
    evaluator.set_test_data(images_txt)
    evaluator.set_test_label(coords_txt)
    evaluator.evaluate()
    # Production values are threshold=0.13, scale=4 (undo the 8x->2x
    # binning of the reference preprocessing); the demo model is barely
    # trained and unbinned, so export everything at native scale.
    n = convert(
        os.path.join(evaluator.run_dir_path, "eval_imgs"), star_out,
        threshold=0.0, scale=1.0,
    )
    print(f"[eval] wrote {n} particles to {star_out}")
    return model


def api_demo(model, images_txt):
    """The programmatic Picker API (new — the reference has none):
    pick/denoise micrographs from Python in three lines."""
    from spr_pick_tpu import Picker

    with open(images_txt) as f:
        first_path = f.readlines()[1].strip().split("\t")[1]

    picker = Picker(model)
    # ONE dense forward -> (picks DataFrame, denoised float32 image);
    # picker.pick / picker.denoise exist separately too.
    picks, clean = picker.process(first_path)
    print(f"[api] {len(picks)} picks on {os.path.basename(first_path)}; "
          f"denoised image {clean.shape} "
          f"range [{clean.min():.2f}, {clean.max():.2f}]")
    print(picks.head().to_string(index=False))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-o", "--out", default=None,
                    help="output dir (default: fresh temp dir)")
    ap.add_argument("--iterations", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_images", type=int, default=2)
    ap.add_argument("--size", type=int, default=384)
    args = ap.parse_args()
    if args.size < 236:
        # synthesize_dataset places particles in [85, size-150) so they sit
        # inside the PU sampler's border margins.
        ap.error("--size must be >= 236")

    out = args.out or tempfile.mkdtemp(prefix="spr_quickstart_")
    os.makedirs(out, exist_ok=True)
    runs_dir = os.path.join(out, "runs")

    print(f"[1/5] synthesizing {args.n_images} micrographs under {out}")
    images_txt, coords_txt = synthesize_dataset(out, args.n_images, args.size)

    print(f"[2/5] training joint model ({args.iterations} iterations)")
    run_dir = train(images_txt, coords_txt, runs_dir, args.iterations, args.batch)

    print("[3/5] resuming from the snapshot (crash-recovery demo)")
    resume(run_dir)

    star_out = os.path.join(out, "picks.star")
    print("[4/5] dense eval + RELION star export")
    model = evaluate(run_dir, images_txt, coords_txt, runs_dir, star_out)

    print("[5/5] programmatic Picker API")
    api_demo(model, images_txt)

    print(f"\ndone — artifacts under {out}:")
    print(f"  run dir     {run_dir}")
    print(f"  star export {star_out}")


if __name__ == "__main__":
    main()
