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
import numpy as np


def _sin2_poly(y: jax.Array) -> jax.Array:
    """``sin^2(y)`` via parity-folded range reduction + an even Taylor
    polynomial for ``cos``: ``sin^2(y) = (1 - (-1)^n cos(r)) / 2`` with
    ``r = 2y - n*pi`` in ``[-pi/2, pi/2]``. Max abs error ~5e-7 over the
    activation range — below bf16 resolution (~4e-3 relative), so codec
    outputs are bit-comparable in bf16 and within float tolerance in f32.

    Why: XLA's transcendental ``sin`` dominated the whole DAC waveform
    decode on v5e (730 of 1048 ms/batch at B=128 — measured by snake
    ablation); this ~20-flop VPU polynomial removes that wall."""
    t = y.astype(jnp.float32) * 2.0
    n = jnp.round(t * (1.0 / np.pi))
    r = t - n * np.pi
    r2 = r * r
    # cos(r), Taylor to r^10 (|r| <= pi/2)
    cos_r = 1.0 + r2 * (
        -0.5
        + r2 * (
            1.0 / 24
            + r2 * (-1.0 / 720 + r2 * (1.0 / 40320 - r2 * (1.0 / 3628800)))
        )
    )
    sign = 1.0 - 2.0 * (n - 2.0 * jnp.floor(n * 0.5))  # (-1)^n
    return 0.5 * (1.0 - sign * cos_r)


class Snake1d(nn.Module):
    """Snake activation ``x + sin^2(alpha x) / alpha`` with per-channel
    alpha (DAC's periodic activation). ``exact`` switches the fast
    polynomial ``sin^2`` (default; see :func:`_sin2_poly`) back to the
    transcedental ``jnp.sin``."""

    channels: int
    exact: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", nn.initializers.ones, (self.channels,), jnp.float32)
        a = alpha[None, None, :].astype(x.dtype)
        if self.exact:
            return x + jnp.sin(a * x) ** 2 / (a + 1e-9)
        s2 = _sin2_poly((a * x).astype(jnp.float32))
        return x + (s2 / (a.astype(jnp.float32) + 1e-9)).astype(x.dtype)


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
        # (W, in, out) — torch ConvTranspose1d's (in, out, W) layout up to a
        # transpose (see vaura_tpu/models/convert.py::_convT1d).
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if self.kernel_size % self.stride == 0 and self.stride > 1:
            out = self._polyphase(x, kernel)
        else:
            pad = self.kernel_size - 1 - self.padding
            # "WOI" + transpose_kernel=True: the O slot carries the input
            # channels (gradient-of-conv semantics)
            out = jax.lax.conv_transpose(
                x,
                kernel.astype(x.dtype),
                strides=(self.stride,),
                padding=[(pad, pad)],
                dimension_numbers=("NWC", "WOI", "NWC"),
                transpose_kernel=True,
            )
        return out + bias.astype(x.dtype)[None, None, :]

    def _polyphase(self, x: jax.Array, kernel: jax.Array) -> jax.Array:
        """Exact ConvTranspose as a dense regular conv + interleave.

        XLA lowers ``conv_transpose(stride=s)`` to a conv over an
        s-dilated (zero-stuffed) input — ``s``x wasted MACs and poor MXU
        tiling at the decoder's small channel counts. For ``k = m*s`` the
        transpose factors exactly into ``s`` polyphase filters:

            out[t*s + q] = sum_u x[t - u] . W[q + s*u]      (u in [0, m))

        i.e. ONE regular conv with ``m`` taps producing ``s * features``
        channels per input step (a dense [m*C_in, s*C_out] matmul), then
        a reshape-interleave and edge trim. Measured throughput-neutral
        for the DAC decoder at B=128 on v5e (XLA already lowers the
        zero-stuffed form well there); kept because it guarantees the
        dense lowering independent of XLA's transposed-conv handling.
        Parity with torch ConvTranspose1d is locked by tests/test_dac.py.
        """
        s, k, C = self.stride, self.kernel_size, self.features
        m = k // s
        B, T, in_ch = x.shape
        # taps grouped phase-major: W[q + s*u] = kernel_r[u, q]
        kernel_r = kernel.reshape(m, s, in_ch, C)
        # conv kernel position w corresponds to u = m-1-w (x[t-u] under
        # VALID conv over an x padded with m-1 zeros on both sides)
        K = (
            kernel_r[::-1]
            .transpose(0, 2, 1, 3)
            .reshape(m, in_ch, s * C)
            .astype(x.dtype)
        )
        x_pad = jnp.pad(x, ((0, 0), (m - 1, m - 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            x_pad, K, (1,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )  # [B, T + m - 1, s*C]
        full = y.reshape(B, (T + m - 1) * s, C)
        out_len = (T - 1) * s - 2 * self.padding + k
        return jax.lax.slice_in_dim(
            full, self.padding, self.padding + out_len, axis=1
        )


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
