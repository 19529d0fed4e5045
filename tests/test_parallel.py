"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

SURVEY.md §4(d): a sharded step must be numerically equal to the
single-chip step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spr_pick_tpu import cfg as cfg_mod
from spr_pick_tpu.denoiser import Denoiser
from spr_pick_tpu.params import ConfigValue, NoiseAlgorithm, NoiseValue
from spr_pick_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from spr_pick_tpu.steps import init_state, make_train_step


def _cfg():
    c = cfg_mod.base()
    c[ConfigValue.ALGORITHM] = NoiseAlgorithm.SELFSUPERVISED_DENOISING
    c[ConfigValue.NOISE_STYLE] = "gauss"
    c[ConfigValue.NOISE_VALUE] = NoiseValue.UNKNOWN_CONSTANT
    # Sharding-semantics equality is asserted in f32; bf16 (the production
    # default) amplifies cross-shard reduction-order noise.
    c[ConfigValue.COMPUTE_DTYPE] = "f32"
    cfg_mod.infer(c, model_only=True)
    return c


@pytest.mark.slow
def test_sharded_step_matches_single(cpu_mesh_devices, rng):
    den = Denoiser(_cfg(), mode="joint")

    cpu0 = cpu_mesh_devices[0]
    with jax.default_device(cpu0):
        state = init_state(den, seed=0)
        step = make_train_step(den, alpha=0.75, tau=0.01)

        b = 8
        # patch must exceed the detector RF (63); 64 matches training.
        batch = {
            "inp": jnp.asarray(rng.rand(b, 64, 64, 1), jnp.float32),
            "target": jnp.asarray(
                np.where(np.arange(b) % 2 == 0, 1.0, -1.0), jnp.float32
            ),
        }
        key = jax.random.PRNGKey(0)
        lr = jnp.float32(1e-4)

        # Single-device run
        state1 = jax.device_put(state, cpu0)
        batch1 = jax.device_put(batch, cpu0)
        new1, m1 = step(state1, batch1, key, lr)
        loss1 = np.asarray(m1["loss"])

    # 8-device data-parallel run
    mesh = make_mesh(8, devices=cpu_mesh_devices)
    state8 = replicate(init_state(den, seed=0), mesh)
    batch8 = shard_batch(batch, mesh)
    new8, m8 = step(state8, batch8, replicate(key, mesh), replicate(lr, mesh))
    loss8 = np.asarray(m8["loss"])

    # Reduction order differs across shards (psum of partials); equality is
    # up to float32 accumulation noise.
    np.testing.assert_allclose(loss1, loss8, rtol=1e-3, atol=1e-4)

    # Updated weights equal too
    w1 = np.asarray(
        new1.trainable["model"]["denoise_branch"]["enc1_conv0"]["conv"]["kernel"]
    )
    w8 = np.asarray(
        new8.trainable["model"]["denoise_branch"]["enc1_conv0"]["conv"]["kernel"]
    )
    np.testing.assert_allclose(w1, w8, rtol=1e-3, atol=5e-6)


def test_scan_gather_sharding_mechanism(cpu_mesh_devices, rng):
    """The sharded scan-chunk MECHANISM in miniature: the exact pattern of
    steps.make_train_scan — lax.scan over K steps, each gathering a patch
    batch via vmap(dynamic_slice) from a replicated stack with (K, B)
    indices sharded over 'data', grad + update inside — must equal the
    single-device run.  (The full joint-model version below is gated: its
    XLA *CPU* compile alone runs for hours on 1-core hosts.)"""
    from spr_pick_tpu.parallel.mesh import shard_scan_indices

    devs = cpu_mesh_devices
    crop, half = 8, 4
    images = jnp.asarray(rng.rand(2, 32, 32), jnp.float32)
    k, b = 3, 8
    flat = jnp.asarray(rng.randint(0, 2, (k, b)), jnp.int32)
    ys = jnp.asarray(rng.randint(half, 28, (k, b)), jnp.int32)
    xs = jnp.asarray(rng.randint(half, 28, (k, b)), jnp.int32)
    w0 = jnp.asarray(rng.rand(crop * crop, 4), jnp.float32)

    def step(params, imgs, fl, y, x):
        def g(n, yy, xx):
            return jax.lax.dynamic_slice(
                imgs, (n, yy - half, xx - half), (1, crop, crop)
            )[0]

        patches = jax.vmap(g)(fl, y, x).reshape(fl.shape[0], -1)

        def loss_fn(p):
            return jnp.mean((patches @ p) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return params - 0.01 * grads, loss

    @jax.jit
    def scan_fn(params, imgs, flat, ys, xs):
        def body(p, inp):
            f, y, x = inp
            return step(p, imgs, f, y, x)

        return jax.lax.scan(body, params, (flat, ys, xs))

    cpu0 = devs[0]
    with jax.default_device(cpu0):
        p1, losses1 = scan_fn(
            *(jax.device_put(v, cpu0) for v in (w0, images, flat, ys, xs))
        )
        losses1 = np.asarray(losses1)

    mesh = make_mesh(8, devices=devs)
    w8, images8 = replicate((w0, images), mesh)
    flat8, ys8, xs8 = shard_scan_indices((flat, ys, xs), mesh)
    p8, losses8 = scan_fn(w8, images8, flat8, ys8, xs8)
    np.testing.assert_allclose(losses1, np.asarray(losses8), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), rtol=1e-5)


def test_sharded_gather_in_scan_with_grads(cpu_mesh_devices, rng):
    """_sharded_patch_gather composed the way the production scan uses it —
    inside a lax.scan body feeding a grad update, stack sharded, indices
    sharded, params replicated — equals the single-device run.  (Cheap
    stand-in for the full-model test below, whose XLA CPU compile runs for
    ~an hour; gated behind SPR_EXHAUSTIVE.)"""
    from spr_pick_tpu.parallel.mesh import (
        shard_scan_indices,
        shard_stack,
    )
    from spr_pick_tpu.steps import _sharded_patch_gather

    devs = cpu_mesh_devices
    mesh = make_mesh(8, devices=devs)
    crop, half = 8, 4
    n_imgs, hw, k, b = 3, 32, 3, 16
    images = jnp.asarray(rng.rand(n_imgs, hw, hw), jnp.float32)
    flat = jnp.asarray(rng.randint(0, n_imgs, (k, b)), jnp.int32)
    ys = jnp.asarray(rng.randint(half, hw - half, (k, b)), jnp.int32)
    xs = jnp.asarray(rng.randint(half, hw - half, (k, b)), jnp.int32)
    w0 = jnp.asarray(rng.rand(crop * crop, 4), jnp.float32)

    def make_scan(gather):
        @jax.jit
        def scan_fn(params, imgs, flat, ys, xs):
            def body(p, inp):
                f, y, x = inp
                patches = gather(imgs, f, y, x).reshape(f.shape[0], -1)

                def loss_fn(q):
                    return jnp.mean((patches @ q) ** 2)

                loss, grads = jax.value_and_grad(loss_fn)(p)
                return p - 0.01 * grads, loss

            return jax.lax.scan(body, params, (flat, ys, xs))

        return scan_fn

    def plain_gather(imgs, f, y, x):
        def one(n, yy, xx):
            return jax.lax.dynamic_slice(
                imgs[n], (yy - half, xx - half), (crop, crop)
            )

        return jax.vmap(one)(f, y, x)

    cpu0 = devs[0]
    with jax.default_device(cpu0):
        p1, losses1 = make_scan(plain_gather)(
            *(jax.device_put(v, cpu0) for v in (w0, images, flat, ys, xs))
        )
        losses1 = np.asarray(losses1)

    sm_gather = _sharded_patch_gather(mesh, "data", crop, centered=True)

    def mesh_gather(imgs, f, y, x):
        return sm_gather(imgs, f, y, x, jnp.zeros(f.shape, jnp.int32))

    w8 = replicate(w0, mesh)
    images8 = shard_stack(images, mesh)
    flat8, ys8, xs8 = shard_scan_indices((flat, ys, xs), mesh)
    p8, losses8 = make_scan(mesh_gather)(w8, images8, flat8, ys8, xs8)
    np.testing.assert_allclose(losses1, np.asarray(losses8), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), rtol=1e-5)


def test_sharded_stack_gather_bit_identical(cpu_mesh_devices, rng):
    """steps._sharded_patch_gather on a mesh-SHARDED image stack must
    reproduce the replicated-stack gather BIT-identically: each patch is
    sliced on exactly one owner chip and psum adds exact zeros from the
    rest (the out-of-core data-plane mechanism, VERDICT r3 item 1)."""
    from spr_pick_tpu.parallel.mesh import shard_stack
    from spr_pick_tpu.steps import _sharded_patch_gather

    devs = cpu_mesh_devices
    mesh = make_mesh(8, devices=devs)
    crop, half = 8, 4
    n_imgs, hw, b = 3, 32, 16  # N=3 not divisible by 8: pad path covered
    images = jnp.asarray(rng.rand(n_imgs, hw, hw), jnp.float32)
    flat = jnp.asarray(rng.randint(0, n_imgs, (b,)), jnp.int32)
    ys = jnp.asarray(rng.randint(half, hw - half, (b,)), jnp.int32)
    xs = jnp.asarray(rng.randint(half, hw - half, (b,)), jnp.int32)
    flips = jnp.asarray(rng.randint(0, 2, (b,)), jnp.int32)

    # Reference: plain single-device gather (the DevicePatchPipeline one).
    def plain(n, y, x, fl):
        patch = jax.lax.dynamic_slice(
            images[n], (y - half, x - half), (crop, crop)
        )
        return jnp.where(fl > 0, jnp.flip(patch, axis=1), patch)

    want = np.asarray(jax.vmap(plain)(flat, ys, xs, flips))

    images_sh = shard_stack(images, mesh)
    assert images_sh.shape[0] == 8  # padded 3 -> 8
    # per-chip shard holds exactly one image row (N/D), not the full stack
    assert images_sh.sharding.shard_shape(images_sh.shape)[0] == 1
    gather = _sharded_patch_gather(mesh, "data", crop, centered=True)
    from spr_pick_tpu.parallel.mesh import shard_batch

    flat8, ys8, xs8, flips8 = shard_batch((flat, ys, xs, flips), mesh)
    got = np.asarray(jax.jit(gather)(images_sh, flat8, ys8, xs8, flips8))
    np.testing.assert_array_equal(want, got)

    # corner-addressed (denoise) variant
    gather_c = _sharded_patch_gather(mesh, "data", crop, centered=False)
    ys_c = jnp.asarray(rng.randint(0, hw - crop, (b,)), jnp.int32)
    xs_c = jnp.asarray(rng.randint(0, hw - crop, (b,)), jnp.int32)
    none8 = shard_batch(jnp.zeros((b,), jnp.int32), mesh)
    ys_c8, xs_c8 = shard_batch((ys_c, xs_c), mesh)
    got_c = np.asarray(jax.jit(gather_c)(images_sh, flat8, ys_c8, xs_c8, none8))

    def plain_c(n, y, x):
        return jax.lax.dynamic_slice(images[n], (y, x), (crop, crop))

    want_c = np.asarray(jax.vmap(plain_c)(flat, ys_c, xs_c))
    np.testing.assert_array_equal(want_c, got_c)


@pytest.mark.slow
def test_sharded_eval_matches_single(cpu_mesh_devices, rng):
    """Data-parallel dense EVAL over the mesh (the evaluator shards a
    same-shape micrograph group over 'data' when it divides the mesh,
    train.py `_evaluate`): outputs must equal the single-device run.
    Partitionable threefry makes the per-example sample-RNG draws
    identical under sharding (see test_denoise_parallel for the data-plane
    analog)."""
    from spr_pick_tpu.params import PipelineOutput
    from spr_pick_tpu.steps import make_eval_step

    den = Denoiser(_cfg(), mode="joint")
    cpu0 = cpu_mesh_devices[0]
    with jax.default_device(cpu0):
        state = init_state(den, seed=0)
        step = make_eval_step(den, dense=True)
        # 96 = smallest multiple of 32 above the detector RF (63).
        batch = {"inp": jnp.asarray(rng.rand(8, 96, 96, 1), jnp.float32)}
        key = jax.random.PRNGKey(7)

        out1 = step(
            jax.device_put(state, cpu0), jax.device_put(batch, cpu0), key
        )
        det1 = np.asarray(out1[PipelineOutput.DETECT])
        img1 = np.asarray(out1[PipelineOutput.IMG_DENOISED])

    mesh = make_mesh(8, devices=cpu_mesh_devices)
    out8 = step(
        replicate(init_state(den, seed=0), mesh),
        shard_batch(batch, mesh),
        replicate(key, mesh),
    )
    # Per-example math is identical, but XLA picks different conv blocking
    # for batch-8 (single device) vs batch-1-per-shard programs -> f32
    # reassociation noise ~1e-4 absolute at the network outputs (measured
    # 5.7e-5 on one host CPU, 1.03e-4 on another; codegen is host-dependent).
    np.testing.assert_allclose(
        det1, np.asarray(out8[PipelineOutput.DETECT]), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out1[PipelineOutput.IMG_MU]),
        np.asarray(out8[PipelineOutput.IMG_MU]), rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out1[PipelineOutput.MODEL_STD_DEV]),
        np.asarray(out8[PipelineOutput.MODEL_STD_DEV]), rtol=1e-3, atol=2e-4,
    )
    # The ssdn posterior mean divides by the UNTRAINED model variance
    # (sigma_x ~ 0.01 at init), amplifying that conv noise by up to
    # ~(x-mu)/sigma — measured 2.25e-3 max on a host whose batch-8 vs
    # batch-1 codegen diverges at 1e-4.  The equality claim for the
    # posterior is therefore conv-noise * amplification, not 2e-4.
    np.testing.assert_allclose(
        img1, np.asarray(out8[PipelineOutput.IMG_DENOISED]),
        rtol=1e-3, atol=5e-3,
    )


@pytest.mark.slow
@pytest.mark.skipif(
    not __import__("os").environ.get("SPR_EXHAUSTIVE"),
    reason="joint-scan XLA CPU compile takes ~1 h on 1-core hosts; "
    "set SPR_EXHAUSTIVE=1 to run.  Last green run: round 3 "
    "(SPR_EXHAUSTIVE=1 python -m pytest "
    "tests/test_parallel.py::test_scan_chunk_sharded_matches_single -x -q "
    "-> 1 passed in 3272s; see ROUND_NOTES.md)",
)
def test_scan_chunk_sharded_matches_single(cpu_mesh_devices, rng):
    """The scan-chunked fast path under the mesh with the REAL joint model
    AND the image stack SHARDED over the chips (the production r4 path:
    make_train_scan_sharded + shard_stack): K sharded steps in one lax.scan
    equal the same scan on one device.  The gather mechanism is covered
    cheaply above (test_sharded_stack_gather_bit_identical)."""
    from spr_pick_tpu.parallel.mesh import (
        shard_scan_indices,
        shard_stack,
    )
    from spr_pick_tpu.steps import make_train_scan, make_train_scan_sharded

    den = Denoiser(_cfg(), mode="joint")
    cpu0 = cpu_mesh_devices[0]

    k, b = 2, 8
    n_imgs, hw, crop = 2, 128, 64
    half = crop // 2
    images = jnp.asarray(rng.rand(n_imgs, hw, hw), jnp.float32)
    flat = jnp.asarray(rng.randint(0, n_imgs, size=(k, b)), jnp.int32)
    ys = jnp.asarray(rng.randint(half, hw - half, size=(k, b)), jnp.int32)
    xs = jnp.asarray(rng.randint(half, hw - half, size=(k, b)), jnp.int32)
    labels = jnp.asarray(
        (rng.rand(k, b) > 0.5).astype(np.float32) * 2 - 1
    )
    lrs = jnp.full((k,), 1e-4, jnp.float32)
    key = jax.random.PRNGKey(5)

    scan = make_train_scan(den, alpha=0.75, tau=0.01, crop=crop)

    with jax.default_device(cpu0):
        state1 = jax.device_put(init_state(den, seed=0), cpu0)
        new1, m1 = scan(state1, images, flat, ys, xs, labels, lrs, key)
        loss1 = np.asarray(m1["loss"])

    mesh = make_mesh(8, devices=cpu_mesh_devices)
    scan_sh = make_train_scan_sharded(
        den, alpha=0.75, tau=0.01, crop=crop, mesh=mesh
    )
    state8 = replicate(init_state(den, seed=0), mesh)
    images8 = shard_stack(images, mesh)  # N=2 padded to 8, 1 image/chip
    flat8, ys8, xs8, labels8 = shard_scan_indices((flat, ys, xs, labels), mesh)
    lrs8, key8 = replicate((lrs, key), mesh)
    new8, m8 = scan_sh(state8, images8, flat8, ys8, xs8, labels8, lrs8, key8)
    loss8 = np.asarray(m8["loss"])

    np.testing.assert_allclose(loss1, loss8, rtol=1e-3, atol=1e-4)
    w1 = np.asarray(
        new1.trainable["model"]["denoise_branch"]["enc1_conv0"]["conv"]["kernel"]
    )
    w8 = np.asarray(
        new8.trainable["model"]["denoise_branch"]["enc1_conv0"]["conv"]["kernel"]
    )
    np.testing.assert_allclose(w1, w8, rtol=1e-3, atol=5e-6)


def test_graft_entry_compiles():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    net_out, detect = out
    assert net_out.shape == (2, 64, 64, 2)


def test_shard_over_places_shards_straight_from_host(cpu_mesh_devices, rng, tmp_path):
    """Out-of-core capacity contract (round-4 review): shard_over() on a
    still-host-resident pipeline must put N/|mesh| images per chip straight
    from the host stack — the full stack never transits one device — and
    shard_stack must pad a NUMPY stack in numpy (device-free)."""
    from spr_pick_tpu.data.micrograph import (
        DevicePatchPipeline,
        MicrographDataset,
    )
    from spr_pick_tpu.parallel.mesh import shard_stack
    from tests.test_e2e import make_synthetic_dataset

    # Pure-numpy pad path: no jax arrays created before device_put.
    mesh = make_mesh(8, devices=cpu_mesh_devices)
    host = rng.rand(3, 16, 16).astype(np.float32)
    sharded = shard_stack(host, mesh)
    assert sharded.shape[0] == 8
    assert sharded.sharding.shard_shape(sharded.shape)[0] == 1
    np.testing.assert_array_equal(np.asarray(sharded)[:3], host)
    np.testing.assert_array_equal(np.asarray(sharded)[3:], 0.0)

    images_txt, coords_txt = make_synthetic_dataset(
        tmp_path, rng, n_images=2, size=384, n_particles=4
    )
    dataset = MicrographDataset(
        images_txt, coords_txt, radius=3, train=True, crop=32, bb=24,
        verbose=False,
    )
    pipe = DevicePatchPipeline(dataset, crop=32, augment=True)
    # Lazy placement: nothing on device yet.
    assert pipe._images_dev is None and pipe._images_host is not None
    pipe.shard_over(mesh)
    assert pipe._images_host is None
    dev = pipe.images_dev
    assert dev.sharding.shard_shape(dev.shape)[0] * 8 == dev.shape[0]

    # The lazy property alone (no mesh) still places the stack.
    pipe2 = DevicePatchPipeline(dataset, crop=32, augment=True)
    assert pipe2._images_dev is None
    assert pipe2.images_dev.shape[0] == 2
    assert pipe2._images_host is None
