#!/usr/bin/env python
"""Measure the PyTorch reference's CPU throughput for the headline workload.

Runs the reference implementation (mounted read-only at /root/reference) on
the BASELINE.json workloads:
  * dense joint inference on a 1024x1024 micrograph (fill()-ed detector),
  * joint train step on batch 4 of 64x64 patches (fwd+bwd+Adam).

Missing optional deps (cv2 / torchvision / imagesize...) are stubbed since
only the model forward path is exercised.  The numbers printed here are the
`vs_baseline` denominators recorded in bench.py.
"""

from __future__ import annotations

import sys
import time
import types

# Stub modules the reference imports at package level but that the model
# forward path never touches.
for name in ("cv2", "torchvision", "imagesize", "colorlog",
              "colored_traceback", "h5py"):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
sys.modules["colorlog"].ColoredFormatter = object
sys.modules["colored_traceback"].Colorizer = object
sys.modules["torchvision"].transforms = types.ModuleType("transforms")
sys.modules["torchvision"].transforms.functional = types.ModuleType("functional")
sys.modules["torchvision.transforms"] = sys.modules["torchvision"].transforms
sys.modules["torchvision.transforms.functional"] = (
    sys.modules["torchvision"].transforms.functional
)
sys.modules["torchvision"].utils = types.ModuleType("utils")
sys.modules["torchvision.utils"] = sys.modules["torchvision"].utils
sys.modules["torchvision"].datasets = types.ModuleType("datasets")
sys.modules["torchvision.datasets"] = sys.modules["torchvision"].datasets
folder = types.ModuleType("folder")
folder.default_loader = None
folder.IMG_EXTENSIONS = []
sys.modules["torchvision.datasets.folder"] = folder
sys.modules["torchvision"].datasets.folder = folder

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

from spr_pick.models.joint_network_v2 import JointNetwork  # noqa: E402


def bench_dense_inference(n_warm=1, n_iter=3, size=1024):
    model = JointNetwork(in_channels=1, out_channels=2, blindspot=True, detect=True)
    model.eval()
    model.fill()
    x = torch.randn(1, 1, size, size)
    with torch.no_grad():
        for _ in range(n_warm):
            model(x)
        t0 = time.time()
        for i in range(n_iter):
            model(x)
            print(f"  dense iter {i}: {time.time() - t0:.1f}s cumulative", flush=True)
        dt = (time.time() - t0) / n_iter
    return dt


def bench_denoise_train_step(model_ctor, n_warm=2, n_iter=5, batch=4, patch=64):
    """Denoise-only reference train step (fwd+bwd+Adam), CONSERVATIVE lower
    bound on the reference's per-iteration cost: no data loading, no noise
    synthesis, no sigma network — so `vs_baseline` understates the rebuild's
    advantage for configs 1-3."""
    model = model_ctor()
    model.train()
    opt = torch.optim.Adam(model.parameters(), betas=[0.9, 0.99], lr=1e-4)
    x = torch.rand(batch, 1, patch, patch)

    def step():
        opt.zero_grad()
        out = model(x)
        loss = (out ** 2).mean()
        loss.backward()
        opt.step()

    for _ in range(n_warm):
        step()
    t0 = time.time()
    for _ in range(n_iter):
        step()
    return (time.time() - t0) / n_iter


def bench_reference_nms(size=1024, r=15, threshold=0.02):
    """Reference host NMS on a worst-case (untrained-net) heatmap: sigmoid
    of small logits, virtually every pixel above the 0.02 floor."""
    from spr_pick.utils.algorithms import non_maximum_suppression

    rng = np.random.RandomState(0)
    hm = 1.0 / (1.0 + np.exp(-0.1 * rng.randn(size, size).astype(np.float32)))
    t0 = time.time()
    scores, coords = non_maximum_suppression(hm, r, set(), threshold)
    dt = time.time() - t0
    print(f"  reference NMS: {len(scores)} picks in {dt:.1f}s", flush=True)
    return dt


def bench_train_step(n_warm=2, n_iter=5, batch=4, patch=64):
    model = JointNetwork(in_channels=1, out_channels=2, blindspot=True, detect=True)
    model.train()
    model.unfill()
    opt = torch.optim.Adam(model.parameters(), betas=[0.9, 0.99], lr=1e-4)
    x = torch.rand(batch, 1, patch, patch)

    def step():
        opt.zero_grad()
        out, det = model(x)
        out_f, det_f = model(x.flip(-1))
        loss = (out ** 2).mean() + (det ** 2).mean() + (det_f ** 2).mean()
        loss.backward()
        opt.step()

    for _ in range(n_warm):
        step()
    t0 = time.time()
    for _ in range(n_iter):
        step()
    return (time.time() - t0) / n_iter


if __name__ == "__main__":
    import json
    import os

    torch.set_num_threads(torch.get_num_threads())
    from spr_pick.models.noise_network import NoiseNetwork  # noqa: E402

    results = {}

    dt = bench_denoise_train_step(
        lambda: NoiseNetwork(in_channels=1, out_channels=1, blindspot=False),
        batch=2,
    )
    results["train_n2c"] = round(dt, 4)
    print(f"reference n2c train step (batch 2): {dt*1000:.1f} ms/step", flush=True)

    dt = bench_denoise_train_step(
        lambda: NoiseNetwork(in_channels=1, out_channels=1, blindspot=False),
        batch=4,
    )
    results["train_n2v"] = round(dt, 4)
    print(f"reference n2v train step (batch 4): {dt*1000:.1f} ms/step", flush=True)

    dt = bench_denoise_train_step(
        lambda: NoiseNetwork(in_channels=1, out_channels=2, blindspot=True),
        batch=4,
    )
    results["train_u_only"] = round(dt, 4)
    print(f"reference u_only train step (batch 4, blindspot): {dt*1000:.1f} ms/step",
          flush=True)

    dt_tr = bench_train_step()
    results["train_joint"] = round(dt_tr, 4)
    print(f"reference joint train step (batch 4, 64^2): {dt_tr*1000:.1f} ms/step "
          f"({1/dt_tr:.2f} it/s)", flush=True)

    dt_nms = bench_reference_nms()
    dt_inf = bench_dense_inference()
    results["dense_infer"] = round(dt_inf, 2)
    # End-to-end eval = dense forward + host NMS (PNG/TSV writes omitted:
    # conservative lower bound on the reference's cost).
    results["eval_e2e"] = round(dt_inf + dt_nms, 2)
    print(f"reference dense 1024^2 joint inference: {dt_inf:.3f} s/micrograph "
          f"({1/dt_inf:.3f} micrographs/s) [torch CPU, {torch.get_num_threads()} threads]")

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "reference_cpu_baseline.json",
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}: {results}")
