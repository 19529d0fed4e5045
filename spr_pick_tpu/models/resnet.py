"""Topaz-style ResNet feature extractors with a declarative dense plan.

Parity: `spr_pick/models/feature_extractor.py` (ResNet6/8/16, BasicConv2d,
ResidA, MaxPool) and `spr_pick/models/classifier.py` (LinearClassifier).

The reference converts the strided/valid conv stack into a stride-1 dilated
("filled") network by *mutating* modules in place (`fill()`/`unfill()`,
feature_extractor.py:31-61,261-318,363-382).  Here the same geometry is a
static attribute: every layer knows its accumulated input stride
(``dense_factor``) at construction, and ``dense=True`` builds the dilated
stride-1 network directly.  Both variants share one parameter tree (same
module names / kernel shapes), so weights trained with ``dense=False`` are
applied densely by re-binding — no mutation, fully jit/pjit friendly.

Dense-mode padding parity: the reference zero-pads the input by
``width // 2`` (feature_extractor.py:50-61) and keeps all convs VALID;
identical here.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from spr_pick_tpu.models.blindspot import TORCH_CONV_DEFAULT
from spr_pick_tpu.utils.schedule import insize_from_outsize


def _batch_norm(train: bool, name: str, dtype=None):
    # torch BatchNorm2d defaults: momentum 0.1 (flax decay 0.9), eps 1e-5.
    # Stats are always accumulated in float32 regardless of compute dtype.
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=name,
    )


class BasicConv2d(nn.Module):
    """conv -> [bn] -> relu, VALID padding.

    Parity: feature_extractor.py:279-324.  ``dense_factor`` is the product of
    strides of preceding layers; in dense mode the conv runs with
    dilation = og_dilation * dense_factor and stride 1 (fill(), :306-311).
    """

    features: int
    kernel_size: int
    dilation: int = 1
    stride: int = 1
    bn: bool = False
    dense_factor: int = 1
    dense: bool = False
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dilation * (self.dense_factor if self.dense else 1)
        s = 1 if self.dense else self.stride
        k = self.kernel_size
        y = nn.Conv(
            self.features,
            (k, k),
            strides=(s, s),
            kernel_dilation=(d, d),
            padding="VALID",
            use_bias=not self.bn,
            kernel_init=TORCH_CONV_DEFAULT,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.bn:
            y = _batch_norm(train, "bn", self.dtype)(y)
        return nn.relu(y)


class MaxPoolLayer(nn.Module):
    """Dilatable max pool.  Parity: feature_extractor.py:241-277."""

    kernel_size: int
    stride: int = 1
    dense_factor: int = 1
    dense: bool = False

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.dense_factor if self.dense else 1
        s = 1 if self.dense else self.stride
        k = self.kernel_size
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, k, k, 1),
            window_strides=(1, s, s, 1),
            padding="VALID",
            window_dilation=(1, d, d, 1),
        )


class ResidA(nn.Module):
    """Residual block: conv3 -> conv3(dilated[, strided]) + cropped skip.

    Parity: feature_extractor.py:326-415.  The skip path crops
    ``edge = d_conv0 + d_conv1`` pixels per side (matching the two VALID
    convs' receptive loss), then applies a 1x1 projection (if nin != nout) or
    stride-subsampling.
    """

    nin: int
    nhidden: int
    nout: int
    dilation: int = 1
    stride: int = 1
    bn: bool = False
    dense_factor: int = 1
    dense: bool = False
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        f = self.dense_factor if self.dense else 1
        d0 = f
        d1 = self.dilation * f
        s = 1 if self.dense else self.stride

        h = nn.Conv(
            self.nhidden,
            (3, 3),
            kernel_dilation=(d0, d0),
            padding="VALID",
            use_bias=not self.bn,
            kernel_init=TORCH_CONV_DEFAULT,
            dtype=self.dtype,
            name="conv0",
        )(x)
        if self.bn:
            h = _batch_norm(train, "bn0", self.dtype)(h)
        h = nn.relu(h)

        y = nn.Conv(
            self.nout,
            (3, 3),
            strides=(s, s),
            kernel_dilation=(d1, d1),
            padding="VALID",
            use_bias=not self.bn,
            kernel_init=TORCH_CONV_DEFAULT,
            dtype=self.dtype,
            name="conv1",
        )(h)

        edge = d0 + d1
        xc = x[:, edge:-edge, edge:-edge, :]
        if self.nin != self.nout:
            xc = nn.Conv(
                self.nout,
                (1, 1),
                strides=(s, s),
                use_bias=False,
                kernel_init=TORCH_CONV_DEFAULT,
                dtype=self.dtype,
                name="proj",
            )(xc)
        elif s > 1:
            xc = xc[:, :: self.stride, :: self.stride, :]

        y = y + xc
        if self.bn:
            y = _batch_norm(train, "bn1", self.dtype)(y)
        return nn.relu(y)


class ResNet8(nn.Module):
    """Topaz ResNet8: RF width 63, total stride 4.

    Parity: feature_extractor.py:102-144 (pooling=None path: stride=2).
    """

    units: Sequence[int] = (32, 64, 128)
    bn: bool = True
    dense: bool = False
    dtype: jnp.dtype = None

    # (kernel_size, stride) metadata per composite layer for width calc;
    # ResidA composite kernel = 2*dilation + 3 (feature_extractor.py:348).
    _META = (
        dict(kernel_size=7, stride=2),
        dict(kernel_size=7, stride=1),
        dict(kernel_size=7, stride=2),
        dict(kernel_size=7, stride=1),
        dict(kernel_size=3, stride=1),
    )

    @property
    def width(self) -> int:
        return insize_from_outsize(list(self._META), 1)

    @property
    def latent_dim(self) -> int:
        return self.units[2]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        u = self.units
        if self.dense:
            p = self.width // 2
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        acc = 1
        x = BasicConv2d(
            u[0], 7, stride=2, bn=self.bn, dense_factor=acc, dense=self.dense,
            dtype=self.dtype, name="layer0",
        )(x, train)
        acc *= 2
        x = ResidA(
            u[0], u[0], u[0], dilation=2, bn=self.bn, dense_factor=acc,
            dense=self.dense, dtype=self.dtype, name="layer1",
        )(x, train)
        x = ResidA(
            u[0], u[0], u[1], dilation=2, stride=2, bn=self.bn, dense_factor=acc,
            dense=self.dense, dtype=self.dtype, name="layer2",
        )(x, train)
        acc *= 2
        x = ResidA(
            u[1], u[1], u[1], dilation=2, bn=self.bn, dense_factor=acc,
            dense=self.dense, dtype=self.dtype, name="layer3",
        )(x, train)
        x = BasicConv2d(
            u[2], 3, bn=self.bn, dense_factor=acc, dense=self.dense,
            dtype=self.dtype, name="layer4",
        )(x, train)
        return x


class ResNet6(nn.Module):
    """Parity: feature_extractor.py:65-99."""

    units: Sequence[int] = (32, 64, 128)
    bn: bool = True
    dense: bool = False

    _META = (
        dict(kernel_size=5, stride=1),
        dict(kernel_size=3, stride=1),
        dict(kernel_size=11, stride=1),
        dict(kernel_size=3, stride=2),
        dict(kernel_size=7, stride=1),
        dict(kernel_size=3, stride=1),
    )

    @property
    def width(self) -> int:
        return insize_from_outsize(list(self._META), 1)

    @property
    def latent_dim(self) -> int:
        return self.units[2]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        u = self.units
        if self.dense:
            p = self.width // 2
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        acc = 1
        x = BasicConv2d(
            u[0], 5, bn=self.bn, dense_factor=acc, dense=self.dense, name="layer0"
        )(x, train)
        x = MaxPoolLayer(3, stride=1, dense_factor=acc, dense=self.dense)(x)
        x = ResidA(
            u[0], u[0], u[1], dilation=4, bn=self.bn, dense_factor=acc,
            dense=self.dense, name="layer1",
        )(x, train)
        x = MaxPoolLayer(3, stride=2, dense_factor=acc, dense=self.dense)(x)
        acc *= 2
        x = ResidA(
            u[1], u[1], u[1], dilation=2, bn=self.bn, dense_factor=acc,
            dense=self.dense, name="layer2",
        )(x, train)
        x = BasicConv2d(
            u[2], 3, bn=self.bn, dense_factor=acc, dense=self.dense, name="layer3"
        )(x, train)
        return x


class ResNet16(nn.Module):
    """Parity: feature_extractor.py:191-238."""

    units: Sequence[int] = (32, 64, 128)
    bn: bool = True
    dense: bool = False

    _META = (
        dict(kernel_size=7, stride=1),
        dict(kernel_size=5, stride=2),
        dict(kernel_size=5, stride=1),
        dict(kernel_size=5, stride=1),
        dict(kernel_size=5, stride=1),
        dict(kernel_size=5, stride=2),
        dict(kernel_size=5, stride=1),
        dict(kernel_size=5, stride=1),
        dict(kernel_size=5, stride=1),
    )

    @property
    def width(self) -> int:
        return insize_from_outsize(list(self._META), 1)

    @property
    def latent_dim(self) -> int:
        return self.units[2]

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        u = self.units
        if self.dense:
            p = self.width // 2
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
        acc = 1
        x = BasicConv2d(
            u[0], 7, bn=self.bn, dense_factor=acc, dense=self.dense, name="layer0"
        )(x, train)
        x = ResidA(
            u[0], u[0], u[0], stride=2, bn=self.bn, dense_factor=acc,
            dense=self.dense, name="layer1",
        )(x, train)
        acc *= 2
        for i in range(3):
            x = ResidA(
                u[0], u[0], u[0], bn=self.bn, dense_factor=acc, dense=self.dense,
                name=f"layer{2 + i}",
            )(x, train)
        x = ResidA(
            u[0], u[0], u[1], stride=2, bn=self.bn, dense_factor=acc,
            dense=self.dense, name="layer5",
        )(x, train)
        acc *= 2
        for i in range(2):
            x = ResidA(
                u[1], u[1], u[1], bn=self.bn, dense_factor=acc, dense=self.dense,
                name=f"layer{6 + i}",
            )(x, train)
        x = BasicConv2d(
            u[2], 5, bn=self.bn, dense_factor=acc, dense=self.dense, name="layer8"
        )(x, train)
        return x


class LinearClassifier(nn.Module):
    """1x1-conv head over a feature extractor.  Parity: classifier.py:7-38."""

    features: nn.Module

    @property
    def width(self) -> int:
        return self.features.width

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        z = self.features(x, train)
        return nn.Conv(
            1, (1, 1), kernel_init=TORCH_CONV_DEFAULT, name="classifier"
        )(z)
