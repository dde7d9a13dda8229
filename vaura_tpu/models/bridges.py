"""Visual-feature bridges (flax).

Adapters between the visual encoder and the AR sampler; behavioral
equivalents of reference ``models/modules/misc/bridges.py``. The default
experiment config uses the identity bridge
(``configs/modules/bridges/dummy_bridge.yaml``).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax


class IdentityBridge(nn.Module):
    """Identity pass-through (reference uses ``torch.nn.Identity``)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x


class MLPBridge(nn.Module):
    """Two-layer MLP bridge (reference ``bridges.py:40-63``)."""

    input_dim: int
    hidden_dim: int
    output_dim: int
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = {"relu": nn.relu, "gelu": nn.gelu}[self.activation]
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = act(x)
        return nn.Dense(self.output_dim, name="fc2")(x)


class ConvBridgeVisual(nn.Module):
    """3D conv + GELU bridge (reference ``bridges.py:20-31``).

    Operates on ``[B, C, T, H, W]`` features (reference torch layout); the
    conv itself runs channels-last on TPU and transposes at the boundary.
    """

    in_channels: int
    out_channels: int
    kernel_size: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.transpose(0, 2, 3, 4, 1)  # -> [B, T, H, W, C]
        x = nn.Conv(
            self.out_channels,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.stride),
            name="conv",
        )(x)
        x = nn.gelu(x)
        return x.transpose(0, 4, 1, 2, 3)


class ConvBridge2D(nn.Module):
    """2D conv + GELU bridge (reference ``bridges.py:34-37``)."""

    in_channels: int
    out_channels: int
    kernel_size: Sequence[int] = (1, 1)
    stride: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.transpose(0, 2, 3, 1)  # [B, C, H, W] -> [B, H, W, C]
        x = nn.Conv(
            self.out_channels,
            kernel_size=tuple(self.kernel_size),
            strides=tuple(self.stride),
            name="conv",
        )(x)
        x = nn.gelu(x)
        return x.transpose(0, 3, 1, 2)
