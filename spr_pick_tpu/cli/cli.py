"""`joint` command line interface.

Parity: `spr_pick/cli/cli.py`, `spr_pick/cli/cmds/{train,eval}.py` — the
`joint train start|resume` and `joint eval` subcommands with the same flag
surface (--algorithm, --noise_style, --noise_value, --alpha, --tau, --bb,
--nms, --num, --iterations, batch/patch sizes, intervals, --dn_only,
dataset/label/gt paths).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Dict, List, Optional

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue


def _add_shared_args(parser: argparse.ArgumentParser, start: bool):
    parser.add_argument("--train_dataset", "-t", required=start,
                        help="Path to training dataset (TXT manifest / folder / h5).")
    parser.add_argument("--alpha", "-ap", type=float, required=start,
                        help="alpha value (denoise-vs-detect blend)")
    parser.add_argument("--tau", "-tau", type=float, required=start,
                        help="tau for PU learning - expected fraction of positives")
    parser.add_argument("--train_gt", "-gt", help="Path to ground truth dataset")
    parser.add_argument("--train_label", "-l", required=start,
                        help="Path to training coordinate labels")
    parser.add_argument("--validation_dataset", "-v", help="Validation dataset path")
    parser.add_argument("--validation_label", "-vl", help="Validation labels path")
    parser.add_argument("--validation_gt", "-vgt", help="Validation ground truth path")
    parser.add_argument("--iterations", "-iter", required=start, type=int,
                        help="Number of training iterations")
    parser.add_argument("--num", "-num", type=int, default=1,
                        help="Number of eval samples during training")
    parser.add_argument("--lr", "-lr", type=float, help="learning rate")
    parser.add_argument("--nms", "-nms", type=int,
                        help="non-maximum suppression radius")
    parser.add_argument("--max_peaks", type=int,
                        help="static per-map cap of the on-device NMS "
                        "(default 2048); a warning is logged if any map "
                        "hits it")
    parser.add_argument("--bb", "-bb", type=int,
                        help="bounding box radius of particles")
    parser.add_argument("--eval_interval", type=int)
    parser.add_argument("--checkpoint_interval", type=int)
    parser.add_argument("--print_interval", type=int)
    parser.add_argument("--train_batch_size", type=int)
    parser.add_argument("--validation_batch_size", type=int)
    parser.add_argument("--patch_size", type=int)
    parser.add_argument("--seed", type=int, help="Base PRNG seed")
    parser.add_argument("--mesh", type=int,
                        help="Data-parallel mesh size (defaults to all local devices)")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="joint", description="TPU-native joint cryo-EM denoising + picking"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    # --- train ---
    train = sub.add_parser("train", help="Train or resume a model")
    train_sub = train.add_subparsers(dest="train_cmd", required=True)

    start = train_sub.add_parser("start", help="Start a new training run")
    _add_shared_args(start, True)
    start.add_argument(
        "--algorithm", "-a", required=True,
        choices=[a.value for a in NoiseAlgorithm],
        help="The algorithm to train.",
    )
    start.add_argument(
        "--noise_style", "-n", required=True,
        help="Noise style: gauss{SD}[_{MAX}][_nc] or poisson{LAM}[_{MAX}][_nc]",
    )
    start.add_argument(
        "--noise_value", choices=[v.value for v in NoiseValue],
        help="Whether the noise sigma is known / const / var-estimated",
    )
    start.add_argument("--dn_only", action="store_true", help="denoising only")
    start.add_argument(
        "--noise_input", action="store_true",
        help="Also add the synthetic noise to the network INPUT (clean "
        "benchmark datasets; the reference ships this switch disabled, "
        "noise_wrapper.py:123)",
    )
    start.add_argument("--runs_dir", default=cfg_mod.DEFAULT_RUN_DIR)
    start.add_argument("--profile", action="store_true",
                       help="Capture a jax profiler trace of the first print window")

    resume = train_sub.add_parser("resume", help="Resume a training run")
    resume.add_argument("run_dir", help="Run directory to resume")
    resume.add_argument(
        "--iteration", type=int, default=None,
        help="Resume from a specific model_{iter:08d}.training snapshot "
        "instead of the latest (rollback)",
    )
    _add_shared_args(resume, False)

    # --- eval ---
    ev = sub.add_parser("eval", help="Evaluate a trained model")
    ev.add_argument("--model", "-m", required=True, help=".training or .wt checkpoint")
    ev.add_argument("--dataset", "-d", required=True, help="Eval dataset path")
    ev.add_argument("--gt_dataset", "-gt", "-g",
                    help="Clean ground-truth dataset path")
    ev.add_argument("--labels", "-l", help="Eval coordinate labels (optional)")
    ev.add_argument("--runs_dir", default=cfg_mod.DEFAULT_RUN_DIR)
    ev.add_argument("--batch_size", type=int)
    ev.add_argument("--nms", "-nms", type=int)
    ev.add_argument("--max_peaks", type=int,
                    help="static per-map cap of the on-device NMS "
                    "(default 2048); a warning is logged if any map "
                    "hits it")
    ev.add_argument("--num", "-num", type=int)
    ev.add_argument(
        "--exclude_contam",
        action="store_true",
        help="Seed NMS with a contamination mask detected on the denoised "
        "output (reference find_contamination hook)",
    )
    ev.add_argument(
        "--export_star", metavar="PATH", nargs="?", const="particles.star",
        help="After eval, aggregate the *_scores.txt picks into a RELION "
        ".star (one-command version of convert_to_star.py; default "
        "particles.star inside the eval run dir)",
    )
    ev.add_argument("--star_threshold", type=float, default=0.13,
                    help="Score threshold for --export_star")
    ev.add_argument("--star_scale", type=float, default=4.0,
                    help="Coordinate upscale for --export_star (binning undo)")
    ev.add_argument("--star_borders", type=int, nargs=4, default=None,
                    metavar=("XMIN", "XMAX", "YMIN", "YMAX"),
                    help="Keep-window for --export_star, applied after "
                    "scaling (reference run used 15 1425 15 1009)")

    # --- pick (programmatic Picker as a command; no run dirs) ---
    pick = sub.add_parser(
        "pick",
        help="Pick (and/or denoise) micrographs straight to a picks "
        "table — no run directories, no eval artifacts",
    )
    pick.add_argument("--model", "-m", required=True,
                      help=".training or .wt checkpoint")
    pick.add_argument(
        "images", nargs="+",
        help="Micrograph paths, directories (searched recursively for "
        "images), and/or TSV manifests (image_name<TAB>path)",
    )
    pick.add_argument(
        "--output", "-o", default="picks.txt",
        help="Picks output: *_scores.txt-schema TSV, a RELION .star "
        "(by extension), or '-' for TSV on stdout (default picks.txt)",
    )
    pick.add_argument("--nms", type=int,
                      help="NMS radius (default: checkpoint cfg)")
    pick.add_argument("--threshold", type=float, default=0.02,
                      help="Heatmap score floor (default 0.02)")
    pick.add_argument("--border", type=int, default=30,
                      help="Edge exclusion in px (default 30; 0 keeps edge picks)")
    pick.add_argument("--max_peaks", type=int,
                      help="Pick cap per micrograph (default: checkpoint cfg)")
    pick.add_argument("--batch_size", type=int, default=4,
                      help="Same-shape micrographs per dense forward (default 4)")
    pick.add_argument("--standardize", action="store_true",
                      help="Header-based MRC normalisation at load")
    pick.add_argument("--seed", type=int, default=0)
    pick.add_argument(
        "--denoise_dir", metavar="DIR",
        help="Also write the denoised micrographs into DIR (picks and "
        "denoised come from the same forward)",
    )
    pick.add_argument("--denoise_format", choices=["mrc", "png"],
                      default="mrc",
                      help="Denoised output format (mrc: float32 data; "
                      "png: min-max 8-bit view)")
    pick.add_argument("--star_threshold", type=float, default=0.13,
                      help="Score threshold for .star outputs")
    pick.add_argument("--star_scale", type=float, default=4.0,
                      help="Coordinate upscale for .star outputs")
    pick.add_argument("--star_borders", type=int, nargs=4, default=None,
                      metavar=("XMIN", "XMAX", "YMIN", "YMAX"),
                      help="Keep-window for .star outputs, applied after scaling")
    return parser


def _apply_shared(cfg: Dict, trainer, args: Dict):
    if args.get("train_dataset") is not None:
        trainer.set_train_data(args["train_dataset"])
    if args.get("train_gt") is not None:
        trainer.set_train_gt_data(args["train_gt"])
    if args.get("train_label") is not None:
        trainer.set_train_label(args["train_label"])
    if args.get("validation_dataset") is not None:
        trainer.set_test_data(args["validation_dataset"])
    if args.get("validation_gt") is not None:
        trainer.set_test_gt_data(args["validation_gt"])
    if args.get("validation_label") is not None:
        trainer.set_test_label(args["validation_label"])

    mapping = {
        "iterations": ConfigValue.ITERATIONS,
        "num": ConfigValue.NUM_EVAL,
        "eval_interval": ConfigValue.EVAL_INTERVAL,
        "checkpoint_interval": ConfigValue.SNAPSHOT_INTERVAL,
        "print_interval": ConfigValue.PRINT_INTERVAL,
        "train_batch_size": ConfigValue.TRAIN_MINIBATCH_SIZE,
        "validation_batch_size": ConfigValue.TEST_MINIBATCH_SIZE,
        "patch_size": ConfigValue.TRAIN_PATCH_SIZE,
        "alpha": ConfigValue.ALPHA,
        "tau": ConfigValue.TAU,
        "seed": ConfigValue.SEED,
        "mesh": ConfigValue.MESH_SHAPE,
    }
    for arg, key in mapping.items():
        if args.get(arg) is not None:
            cfg[key] = args[arg]
    # Loss weights live in cfg (single source of truth) but the trainer
    # caches them as attributes for the jitted step factories — keep a
    # resumed trainer in sync when --alpha/--tau are re-passed.
    if ConfigValue.ALPHA in cfg:
        trainer.alpha = float(cfg[ConfigValue.ALPHA])
    if ConfigValue.TAU in cfg:
        trainer.tau = float(cfg[ConfigValue.TAU])


def run_train(args: Dict):
    from spr_pick_tpu.train import DenoiserTrainer, resume_run

    if args["train_cmd"] == "start":
        if args["algorithm"] == "ssdn" and args.get("noise_value") is None:
            print("error: SSDN requires --noise_value", file=sys.stderr)
            sys.exit(2)
        cfg = cfg_mod.base()
        cfg[ConfigValue.ALGORITHM] = NoiseAlgorithm(args["algorithm"])
        cfg[ConfigValue.NOISE_STYLE] = args["noise_style"]
        if args.get("noise_value") is not None:
            cfg[ConfigValue.NOISE_VALUE] = NoiseValue(args["noise_value"])
        if args.get("lr") is not None:
            cfg[ConfigValue.LEARNING_RATE] = args["lr"]
        if args.get("bb") is not None:
            cfg[ConfigValue.BB] = args["bb"]
        if args.get("nms") is not None:
            cfg[ConfigValue.NMS] = args["nms"]
        if args.get("max_peaks") is not None:
            cfg[ConfigValue.MAX_PEAKS] = args["max_peaks"]
        if args.get("noise_input"):
            if not args["dn_only"]:
                # Only the denoise data plane (NoisyDataset analog) reads
                # NOISE_INPUT; silently recording it in a joint run's cfg
                # would make users believe the switch was active.
                raise SystemExit(
                    "--noise_input only applies to denoise-only training "
                    "(--dn_only): the joint micrograph path adds no "
                    "synthetic noise"
                )
            cfg[ConfigValue.NOISE_INPUT] = True
        profile = bool(args.get("profile"))
        if args["dn_only"]:
            trainer = DenoiserTrainer(
                cfg, mode="denoise", runs_dir=args["runs_dir"], profile=profile
            )
        else:
            trainer = DenoiserTrainer(
                cfg, mode="joint", alpha=args["alpha"], tau=args["tau"],
                runs_dir=args["runs_dir"], profile=profile,
            )
    else:
        trainer = resume_run(args["run_dir"], iteration=args.get("iteration"))
        cfg = trainer.cfg

    _apply_shared(cfg, trainer, args)
    trainer.train()


def run_eval(args: Dict):
    from spr_pick_tpu.eval import DenoiserEvaluator

    evaluator = DenoiserEvaluator(args["model"], runs_dir=args["runs_dir"])
    evaluator.set_test_data(args["dataset"])
    if args.get("labels") is not None:
        evaluator.set_test_label(args["labels"])
    if args.get("gt_dataset") is not None:
        evaluator.set_test_gt_data(args["gt_dataset"])
    if args.get("batch_size") is not None:
        evaluator.cfg[ConfigValue.TEST_MINIBATCH_SIZE] = args["batch_size"]
    if args.get("nms") is not None:
        evaluator.cfg[ConfigValue.NMS] = args["nms"]
    if args.get("max_peaks") is not None:
        evaluator.cfg[ConfigValue.MAX_PEAKS] = args["max_peaks"]
    if args.get("num") is not None:
        evaluator.cfg[ConfigValue.NUM_EVAL] = args["num"]
    if args.get("exclude_contam"):
        evaluator.cfg[ConfigValue.EXCLUDE_CONTAM] = True
    evaluator.evaluate()

    if args.get("export_star"):
        from spr_pick_tpu.data.star_export import convert

        out = args["export_star"]
        if not os.path.isabs(out):
            out = os.path.join(evaluator.run_dir_path, out)
        try:
            n = convert(
                os.path.join(evaluator.run_dir_path, "eval_imgs"), out,
                threshold=args.get("star_threshold", 0.13),
                scale=args.get("star_scale", 4.0),
                borders=args.get("star_borders"),
            )
        except FileNotFoundError as exc:
            # E.g. a denoise-only model exports no *_scores.txt; don't
            # traceback after an otherwise-successful eval.
            raise SystemExit(f"--export_star: {exc}")
        logging.getLogger("cli").info("wrote %d particles to %s", n, out)


def _expand_pick_inputs(items: List[str]):
    """Expand the `joint pick` positional inputs.

    Each item is a micrograph path, a directory (searched recursively for
    image files), or a TSV manifest with a `path` column (names taken from
    `image_name` when present, matching generate_train_files.py output).
    Returns aligned (paths, names).
    """
    import pandas as pd

    from spr_pick_tpu.api import Picker
    from spr_pick_tpu.data.folder import find_images

    paths: List[str] = []
    names: List[Optional[str]] = []
    for item in items:
        if os.path.isdir(item):
            found = sorted(find_images(item))
            if not found:
                raise SystemExit(f"pick: no images found under {item}")
            paths.extend(found)
            names.extend([None] * len(found))
        elif item.lower().endswith((".txt", ".tsv", ".tab")):
            table = pd.read_csv(item, sep="\t")
            if "path" not in table.columns:
                raise SystemExit(
                    f"pick: manifest {item} has no 'path' column "
                    "(expected image_name<TAB>path)"
                )
            # Paths are used verbatim (absolute or cwd-relative) — the
            # same semantics as the trainer's manifest loader.
            for _, row in table.iterrows():
                paths.append(str(row["path"]))
                names.append(
                    str(row["image_name"])
                    if "image_name" in table.columns else None
                )
        else:
            paths.append(item)
            names.append(None)
    names = [
        nm if nm is not None else Picker._name_for(p)
        for nm, p in zip(names, paths)
    ]
    # Basename-derived names can collide across input dirs/manifests
    # (dirA/mic1.mrc + dirB/mic1.mrc).  Left as-is they'd silently
    # overwrite each other's --denoise_dir output and merge their rows
    # under one image_name in the picks table; disambiguate
    # deterministically and warn.
    counts: Dict[str, int] = {}
    unique = []
    n_dups = 0
    for nm in names:
        if nm in counts:
            n_dups += 1
            counts[nm] += 1
            cand = f"{nm}-{counts[nm]}"
            while cand in counts:
                counts[nm] += 1
                cand = f"{nm}-{counts[nm]}"
            counts[cand] = 1
            unique.append(cand)
        else:
            counts[nm] = 1
            unique.append(nm)
    if n_dups:
        logging.getLogger("cli").warning(
            "pick: %d duplicate image name(s) across inputs; "
            "suffixed -2, -3, ... to keep outputs distinct", n_dups
        )
    return paths, unique


def run_pick(args: Dict):
    from spr_pick_tpu.api import Picker
    from spr_pick_tpu.utils import logging_helper

    logging_helper.setup()
    log = logging.getLogger("cli")
    paths, names = _expand_pick_inputs(args["images"])
    picker = Picker(
        args["model"],
        nms_radius=args.get("nms"),
        threshold=args["threshold"],
        max_peaks=args.get("max_peaks"),
        border=args["border"],
        seed=args["seed"],
    )

    if args.get("denoise_dir"):
        # One forward per micrograph yields BOTH the picks and the
        # denoised image (Picker.process) — no second pass.
        import pandas as pd

        ddir = args["denoise_dir"]
        os.makedirs(ddir, exist_ok=True)
        frames = []
        for path, name in zip(paths, names):
            picks, den = picker.process(
                path, name=name, standardize=args["standardize"]
            )
            if picks is not None:
                frames.append(picks)
            out_path = os.path.join(ddir, f"{name}.{args['denoise_format']}")
            if args["denoise_format"] == "mrc":
                from spr_pick_tpu.data import mrc

                mrc.write(out_path, den)
            else:
                from spr_pick_tpu.utils.image_io import save_array_image

                save_array_image(den, out_path)
        log.info("wrote %d denoised micrographs to %s", len(paths), ddir)
        if not frames:
            log.warning(
                "skipping picks: checkpoint has no detector head "
                "(denoise-only model)"
            )
            return
        table = pd.concat(frames, ignore_index=True)
    else:
        try:
            table = picker.pick_many(
                paths, names=names, standardize=args["standardize"],
                batch_size=args["batch_size"],
            )
        except ValueError as exc:
            raise SystemExit(f"pick: {exc}")

    out = args["output"]
    if out == "-":
        table.to_csv(sys.stdout, sep="\t", index=False)
    elif out.lower().endswith(".star"):
        from spr_pick_tpu.data.star_export import frame_to_star

        n = frame_to_star(
            table, out, threshold=args["star_threshold"],
            scale=args["star_scale"], borders=args.get("star_borders"),
        )
        log.info("wrote %d particles (of %d picks) to %s",
                 n, len(table), out)
    else:
        table.to_csv(out, sep="\t", index=False)
        log.info("wrote %d picks to %s", len(table), out)


def start(argv: Optional[List[str]] = None):
    parser = build_parser()
    args = vars(parser.parse_args(argv))
    if args["command"] == "train":
        run_train(args)
    elif args["command"] == "eval":
        run_eval(args)
    elif args["command"] == "pick":
        run_pick(args)


if __name__ == "__main__":
    start()
