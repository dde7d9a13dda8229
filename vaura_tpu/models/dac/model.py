"""DAC neural audio codec in JAX (inference: encode -> codes, codes -> wav).

JAX/TPU reimplementation of the Descript Audio Codec consumed by the
reference through the ``descript-audio-codec`` pip package (reference
``models/modules/dac/model.py``; conda env pins it in
``conda_env_cuda12.1.yaml``). The V-AURA pipeline uses the codec frozen:
``encode`` produces the 9-codebook token targets, ``decode`` renders
generated tokens to a 44.1 kHz waveform.

Model family (selected by ``model_sr`` like the reference wrapper):
  * 44100 Hz: enc rates [2,4,8,8], dec rates [8,8,4,2], 9 codebooks x 1024,
    codebook_dim 8, hop 512 -> ~86.13 tokens/s/codebook.
  * 24000 Hz: enc [2,4,8,8], dec [8,8,4,2], 32 codebooks (24khz model).
  * 16000 Hz: enc [2,4,8,8], 12 codebooks.

Pretrained torch checkpoints load through
``vaura_tpu.models.dac.convert.convert_torch_state_dict`` (weight-norm
folded).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vaura_tpu.models.dac.layers import (
    Conv1d,
    ConvTranspose1d,
    DecoderBlock,
    EncoderBlock,
    Snake1d,
)

MODEL_SR = [16000, 24000, 44000, 44100]


@dataclasses.dataclass(frozen=True)
class DacConfig:
    sample_rate: int = 44100
    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 4, 8, 8)
    decoder_dim: int = 1536
    decoder_rates: Tuple[int, ...] = (8, 8, 4, 2)
    latent_dim: Optional[int] = None
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    # compute dtype for the conv stacks (params stay f32). bf16 roughly
    # halves codec HBM traffic; waveform differs from f32 by ~1e-3 —
    # inaudible, but keep f32 for bit-parity checks.
    dtype: Any = jnp.float32

    @property
    def resolved_latent_dim(self) -> int:
        if self.latent_dim is not None:
            return self.latent_dim
        return self.encoder_dim * (2 ** len(self.encoder_rates))

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.hop_length

    @property
    def decoder_receptive_field_frames(self) -> int:
        """Half receptive field of the decoder in LATENT frames — how many
        context frames a windowed decode needs on each side for its
        interior samples to equal a full decode's (streaming emit margin,
        ``VauraSystem.generate_long_stream``). Analytic walk of the
        decoder stack; exactness at this margin is locked by
        ``tests/test_stream.py``.

        Per level with stride ``s`` at cumulative upsampling ``f``:
        ConvTranspose(k=2s, p=ceil(s/2)) spreads an input's influence at
        most ``1.5s - 1`` output positions from its center; the three
        residual units' dilated k=7 convs add ``3*(1+3+9) = 39``; both
        measured in post-upsample positions, i.e. ``1/f`` frames each.
        Flagship (8,8,4,2): ~11 frames (~128 ms). Small-hop test configs
        have proportionally larger frame RFs.
        """
        half = 3.0  # conv_in k=7 pad 3
        f = 1
        for s in self.decoder_rates:
            f *= s
            half += (1.5 * s - 1.0) / f
            half += 39.0 / f
        half += 3.0 / f  # conv_out k=7
        return math.ceil(half)

    def build(self) -> "Dac":
        return Dac(self)


def config_for_sample_rate(model_sr: int) -> DacConfig:
    """Hyperparameters of the published DAC models, keyed like the
    reference wrapper's ``model_sr`` (``dac/model.py:12-25``)."""
    assert model_sr in MODEL_SR, f"Invalid model samplerate {model_sr}"
    if model_sr in (44000, 44100):
        return DacConfig(sample_rate=44100, n_codebooks=9)
    if model_sr == 24000:
        return DacConfig(sample_rate=24000, n_codebooks=32)
    return DacConfig(sample_rate=16000, n_codebooks=12)


class DacEncoder(nn.Module):
    config: DacConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, 1] -> [B, T/hop, latent]
        cfg = self.config
        d = cfg.encoder_dim
        x = Conv1d(d, 7, padding=3, name="conv_in")(x)
        for i, stride in enumerate(cfg.encoder_rates):
            d *= 2
            x = EncoderBlock(d, stride, name=f"block{i}")(x)
        x = Snake1d(d, name="snake_out")(x)
        return Conv1d(cfg.resolved_latent_dim, 3, padding=1, name="conv_out")(x)


class DacDecoder(nn.Module):
    config: DacConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:  # [B, T, latent] -> [B, T*hop, 1]
        cfg = self.config
        x = Conv1d(cfg.decoder_dim, 7, padding=3, name="conv_in")(z)
        dim = cfg.decoder_dim
        for i, stride in enumerate(cfg.decoder_rates):
            x = DecoderBlock(dim, dim // 2, stride, name=f"block{i}")(x)
            dim //= 2
        x = Snake1d(dim, name="snake_out")(x)
        x = Conv1d(1, 7, padding=3, name="conv_out")(x)
        return jnp.tanh(x)


class ResidualVectorQuantize(nn.Module):
    """RVQ over the encoder latent: per stage, project to ``codebook_dim``,
    nearest-neighbor on L2-normalized vectors, project back, subtract.

    Parameters per stage ``i``: ``codebook_i [V, cd]``, folded
    ``in_proj_i``/``out_proj_i`` 1x1 convs. Stages are stacked on a leading
    axis and the encode loop is a ``lax.scan`` over stages.
    """

    config: DacConfig

    def setup(self):
        cfg = self.config
        K, V, cd, D = (
            cfg.n_codebooks,
            cfg.codebook_size,
            cfg.codebook_dim,
            cfg.resolved_latent_dim,
        )
        init = nn.initializers.normal(1.0)
        self.codebooks = self.param("codebooks", init, (K, V, cd), jnp.float32)
        self.in_proj_w = self.param(
            "in_proj_w", nn.initializers.lecun_normal(), (K, D, cd), jnp.float32
        )
        self.in_proj_b = self.param(
            "in_proj_b", nn.initializers.zeros, (K, cd), jnp.float32
        )
        self.out_proj_w = self.param(
            "out_proj_w", nn.initializers.lecun_normal(), (K, cd, D), jnp.float32
        )
        self.out_proj_b = self.param(
            "out_proj_b", nn.initializers.zeros, (K, D), jnp.float32
        )

    def encode(self, z: jax.Array) -> jax.Array:  # [B, T, D] -> [B, K, T] int32
        def stage(residual, stacked):
            cb, wi, bi, wo, bo = stacked
            z_e = residual @ wi + bi  # [B, T, cd]
            z_en = z_e / (jnp.linalg.norm(z_e, axis=-1, keepdims=True) + 1e-8)
            cbn = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-8)
            sim = jnp.einsum(
                "btc,vc->btv", z_en, cbn, preferred_element_type=jnp.float32
            )
            idx = jnp.argmax(sim, axis=-1)  # [B, T]
            z_q = jnp.take(cb, idx, axis=0)  # [B, T, cd]
            z_q = z_q @ wo + bo  # [B, T, D]
            return residual - z_q, idx

        stacked = (
            self.codebooks,
            self.in_proj_w,
            self.in_proj_b,
            self.out_proj_w,
            self.out_proj_b,
        )
        _, codes = jax.lax.scan(stage, z.astype(jnp.float32), stacked)
        return jnp.transpose(codes, (1, 0, 2)).astype(jnp.int32)  # [B, K, T]

    def from_codes(self, codes: jax.Array) -> jax.Array:  # [B, K, T] -> [B, T, D]
        K = self.config.n_codebooks
        B, Kc, T = codes.shape
        assert Kc <= K
        # one fused gather over a flattened [K*V, cd] table, then per-stage
        # out-projection as a single batched matmul
        V = self.config.codebook_size
        flat = self.codebooks[:Kc].reshape(Kc * V, -1)
        idx = codes.astype(jnp.int32) + (jnp.arange(Kc, dtype=jnp.int32) * V)[None, :, None]
        z_p = jnp.take(flat, idx.reshape(-1), axis=0).reshape(B, Kc, T, -1)
        z_q = jnp.einsum(
            "bktc,kcd->btd", z_p, self.out_proj_w[:Kc],
            preferred_element_type=jnp.float32,
        )
        z_q = z_q + jnp.sum(self.out_proj_b[:Kc], axis=0)[None, None, :]
        return z_q

    def __call__(self, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
        codes = self.encode(z)
        return self.from_codes(codes), codes


class Dac(nn.Module):
    """Encoder + RVQ + decoder. ``__call__`` is the full round trip used by
    init; ``encode``/``decode`` are the deployment entry points."""

    config: DacConfig

    def setup(self):
        self.encoder = DacEncoder(self.config, name="encoder")
        self.quantizer = ResidualVectorQuantize(self.config, name="quantizer")
        self.decoder = DacDecoder(self.config, name="decoder")

    def preprocess(self, wav: jax.Array) -> jax.Array:
        """Right-pad to a hop-length multiple (DAC's ``preprocess``).
        ``wav``: [B, 1, T] (torch layout kept at the API boundary)."""
        T = wav.shape[-1]
        hop = self.config.hop_length
        pad = (hop - T % hop) % hop
        return jnp.pad(wav, ((0, 0), (0, 0), (0, pad)))

    def encode(self, wav: jax.Array) -> jax.Array:
        """[B, 1, T] waveform -> [B, K, T/hop] int32 codes
        (reference wrapper ``dac/model.py:30-39``)."""
        wav = self.preprocess(wav)
        x = jnp.transpose(wav, (0, 2, 1)).astype(self.config.dtype)  # [B, T, 1]
        z = self.encoder(x)
        return self.quantizer.encode(z.astype(jnp.float32))

    def decode(self, codes: jax.Array) -> jax.Array:
        """[B, K, T] codes -> [B, 1, T*hop] waveform
        (reference wrapper ``dac/model.py:41-48``)."""
        z_q = self.quantizer.from_codes(codes)
        wav = self.decoder(z_q.astype(self.config.dtype))
        return jnp.transpose(wav, (0, 2, 1)).astype(jnp.float32)

    def __call__(self, wav: jax.Array) -> jax.Array:
        return self.decode(self.encode(wav))


def DacSpec(model_sr: int = 44100, ckpt_path: Optional[str] = None, **overrides):
    """Config shim for ``{target, params}`` instantiation, accepting the
    reference wrapper's parameters (``model_sr``, ``ckpt_path``) plus
    optional ``DacConfig`` field overrides (used by tiny test/smoke
    configs). Returns an object with ``.config`` and ``.ckpt_path``."""
    base = config_for_sample_rate(model_sr)
    if overrides:
        valid = {f.name for f in dataclasses.fields(DacConfig)}
        unknown = set(overrides) - valid
        if unknown:
            raise TypeError(f"Unknown DAC config keys: {sorted(unknown)}")
        for key in ("encoder_rates", "decoder_rates"):
            if key in overrides:
                overrides[key] = tuple(overrides[key])
        base = dataclasses.replace(base, **overrides)

    class _Spec:
        config = base

    spec = _Spec()
    spec.ckpt_path = ckpt_path
    return spec
