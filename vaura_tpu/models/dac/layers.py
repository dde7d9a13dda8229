"""DAC building blocks (flax, channels-last).

JAX reimplementation of the Descript Audio Codec's layers (the reference
consumes the ``descript-audio-codec`` pip package, see reference
``models/modules/dac/model.py:4-25``). Everything runs channels-last
(``[B, T, C]``) — the natural TPU layout — with torch-layout conversion
handled by the checkpoint converter (``vaura_tpu/models/dac/convert.py``).

Weight-normalized convs are stored *folded* (``W = g * v / ||v||``): the
codec is frozen in this framework (reference freezes it too,
``models/vaura_model.py:89-92``), so the reparameterization is dead weight
at inference and folding it removes a normalize per conv per step.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class Snake1d(nn.Module):
    """Snake activation ``x + sin^2(alpha x) / alpha`` with per-channel
    alpha (DAC's periodic activation)."""

    channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.ones, (self.channels,), jnp.float32)
        a = alpha[None, None, :].astype(x.dtype)
        return x + jnp.sin(a * x) ** 2 / (a + 1e-9)


class Conv1d(nn.Module):
    """1D conv over ``[B, T, C]`` matching torch ``Conv1d`` semantics
    (explicit symmetric padding, dilation, stride)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            kernel_dilation=(self.dilation,),
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvTranspose1d(nn.Module):
    """1D transposed conv over ``[B, T, C]`` matching torch
    ``ConvTranspose1d(stride=s, kernel=k, padding=p)``:
    ``out_len = (T-1)*s - 2p + k``.

    Implemented via ``lax.conv_transpose`` with edge padding ``k-1-p`` and a
    gradient-style (flipped) kernel.
    """

    features: int
    kernel_size: int
    stride: int
    padding: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        # (W, in, out) — with transpose_kernel=True the "WOI" spec's O slot
        # carries the input channels (gradient-of-conv semantics), matching
        # torch ConvTranspose1d's (in, out, W) layout up to a transpose.
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        pad = self.kernel_size - 1 - self.padding
        out = jax.lax.conv_transpose(
            x,
            kernel.astype(x.dtype),
            strides=(self.stride,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WOI", "NWC"),
            transpose_kernel=True,
        )
        return out + bias.astype(x.dtype)[None, None, :]


class ResidualUnit(nn.Module):
    """Snake -> dilated k=7 conv -> Snake -> k=1 conv with residual add
    (same-length paddings make the DAC's residual trim a no-op)."""

    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = ((7 - 1) * self.dilation) // 2
        y = Snake1d(self.dim, name="snake1")(x)
        y = Conv1d(self.dim, 7, padding=pad, dilation=self.dilation, name="conv1")(y)
        y = Snake1d(self.dim, name="snake2")(y)
        y = Conv1d(self.dim, 1, name="conv2")(y)
        return x + y


class EncoderBlock(nn.Module):
    """Three residual units then a strided downsampling conv."""

    dim: int  # output channels
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        half = self.dim // 2
        x = ResidualUnit(half, dilation=1, name="res1")(x)
        x = ResidualUnit(half, dilation=3, name="res2")(x)
        x = ResidualUnit(half, dilation=9, name="res3")(x)
        x = Snake1d(half, name="snake")(x)
        return Conv1d(
            self.dim,
            2 * self.stride,
            stride=self.stride,
            padding=math.ceil(self.stride / 2),
            name="down",
        )(x)


class DecoderBlock(nn.Module):
    """Upsampling transposed conv then three residual units."""

    input_dim: int
    output_dim: int
    stride: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Snake1d(self.input_dim, name="snake")(x)
        x = ConvTranspose1d(
            self.output_dim,
            2 * self.stride,
            stride=self.stride,
            padding=math.ceil(self.stride / 2),
            name="up",
        )(x)
        x = ResidualUnit(self.output_dim, dilation=1, name="res1")(x)
        x = ResidualUnit(self.output_dim, dilation=3, name="res2")(x)
        x = ResidualUnit(self.output_dim, dilation=9, name="res3")(x)
        return x
