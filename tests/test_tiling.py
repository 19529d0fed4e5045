"""Halo-tiled inference tests: stitched output == direct dense output."""

import jax
import jax.numpy as jnp
import numpy as np

from spr_pick_tpu.parallel.tiling import (
    extract_tiles,
    stitch_tiles,
    tiled_dense_apply,
)


def test_extract_stitch_roundtrip(rng):
    img = rng.rand(200, 300).astype(np.float32)
    tiles, grid = extract_tiles(img, tile=128, halo=16)
    assert grid == (2, 3)
    assert tiles.shape == (6, 160, 160)
    out = stitch_tiles(tiles, grid, 128, 16, img.shape)
    np.testing.assert_array_equal(out, img)


def test_tiled_matches_direct_conv(rng):
    """A local (small-RF) dense model must be exactly stitchable."""
    img = rng.rand(250, 190).astype(np.float32)
    kernel = jnp.asarray(rng.rand(9, 9).astype(np.float32))

    def conv2d_same(x):
        # depthwise 9x9 SAME conv on (B, H, W, 1)
        return jax.lax.conv_general_dilated(
            x, kernel[:, :, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def apply_tiles(batch):
        return {"out": conv2d_same(batch)}

    direct = np.asarray(conv2d_same(jnp.asarray(img)[None, :, :, None]))[0, :, :, 0]
    stitched = tiled_dense_apply(apply_tiles, img, tile=64, halo=8)["out"]
    # Interior matches exactly (borders differ: reflect pad vs zero pad of
    # SAME conv, confined to the 4-px kernel apron).
    np.testing.assert_allclose(
        stitched[8:-8, 8:-8], direct[8:-8, 8:-8], rtol=1e-5, atol=1e-6
    )


def test_tiled_with_mesh(cpu_mesh_devices, rng):
    from spr_pick_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, devices=cpu_mesh_devices)
    img = rng.rand(256, 256).astype(np.float32)

    def apply_tiles(batch):
        return {"out": batch * 2.0}

    out = tiled_dense_apply(apply_tiles, img, tile=64, halo=8, mesh=mesh)["out"]
    np.testing.assert_allclose(out, img * 2.0)
