"""Checkpoint-converter parity tests.

Build miniature *torch* models with the reference ecosystem's module
structure and state-dict naming (DAC codec blocks with weight-normed convs;
the llama-style decoder's projections), convert their state dicts with
``vaura_tpu.models.convert``, and check the JAX modules produce the same
outputs. This validates every layout/fold convention the real checkpoint
conversion relies on.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from vaura_tpu.models.convert import (  # noqa: E402
    convert_dac_state_dict,
    convert_sampler_state_dict,
)
from vaura_tpu.models.dac.model import Dac, DacConfig  # noqa: E402


# ------------------------------------------------------------------ #
# torch mini-DAC with descript-style structure & naming
# ------------------------------------------------------------------ #
def WNConv1d(*a, **k):
    return nn.utils.weight_norm(nn.Conv1d(*a, **k))


def WNConvTranspose1d(*a, **k):
    return nn.utils.weight_norm(nn.ConvTranspose1d(*a, **k))


class TSnake(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.alpha = nn.Parameter(torch.rand(1, ch, 1) + 0.5)

    def forward(self, x):
        return x + torch.sin(self.alpha * x) ** 2 / (self.alpha + 1e-9)


class TResUnit(nn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = nn.Sequential(
            TSnake(dim),
            WNConv1d(dim, dim, 7, dilation=dilation, padding=pad),
            TSnake(dim),
            WNConv1d(dim, dim, 1),
        )

    def forward(self, x):
        return x + self.block(x)


class TEncBlock(nn.Module):
    def __init__(self, dim, stride):
        super().__init__()
        self.block = nn.Sequential(
            TResUnit(dim // 2, 1),
            TResUnit(dim // 2, 3),
            TResUnit(dim // 2, 9),
            TSnake(dim // 2),
            WNConv1d(dim // 2, dim, 2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)),
        )

    def forward(self, x):
        return self.block(x)


class TDecBlock(nn.Module):
    def __init__(self, in_dim, out_dim, stride):
        super().__init__()
        self.block = nn.Sequential(
            TSnake(in_dim),
            WNConvTranspose1d(in_dim, out_dim, 2 * stride, stride=stride,
                              padding=math.ceil(stride / 2)),
            TResUnit(out_dim, 1),
            TResUnit(out_dim, 3),
            TResUnit(out_dim, 9),
        )

    def forward(self, x):
        return self.block(x)


class TVectorQuantize(nn.Module):
    def __init__(self, input_dim, codebook_size, codebook_dim):
        super().__init__()
        self.in_proj = WNConv1d(input_dim, codebook_dim, 1)
        self.codebook = nn.Embedding(codebook_size, codebook_dim)
        self.out_proj = WNConv1d(codebook_dim, input_dim, 1)


class TDac(nn.Module):
    def __init__(self, cfg: DacConfig):
        super().__init__()
        d = cfg.encoder_dim
        enc = [WNConv1d(1, d, 7, padding=3)]
        for s in cfg.encoder_rates:
            d *= 2
            enc.append(TEncBlock(d, s))
        enc += [TSnake(d), WNConv1d(d, cfg.resolved_latent_dim, 3, padding=1)]
        self.encoder = nn.Sequential(*enc)
        self.quantizer = nn.Module()
        self.quantizer.quantizers = nn.ModuleList(
            [
                TVectorQuantize(
                    cfg.resolved_latent_dim, cfg.codebook_size, cfg.codebook_dim
                )
                for _ in range(cfg.n_codebooks)
            ]
        )
        dec = [WNConv1d(cfg.resolved_latent_dim, cfg.decoder_dim, 7, padding=3)]
        dim = cfg.decoder_dim
        for s in cfg.decoder_rates:
            dec.append(TDecBlock(dim, dim // 2, s))
            dim //= 2
        dec += [TSnake(dim), WNConv1d(dim, 1, 7, padding=3), nn.Tanh()]
        self.decoder = nn.Sequential(*dec)

    # naming shim: state_dict uses encoder.block.N / decoder.model.N
    def state_dict_ref_style(self):
        sd = {}
        for k, v in self.state_dict().items():
            k = k.replace("encoder.", "encoder.block.", 1).replace(
                "decoder.", "decoder.model.", 1
            )
            sd[k] = v
        return sd


TINY = DacConfig(
    encoder_dim=8,
    encoder_rates=(2, 4),
    decoder_dim=32,
    decoder_rates=(4, 2),
    latent_dim=32,
    n_codebooks=3,
    codebook_size=16,
    codebook_dim=4,
)


def test_dac_conversion_parity():
    torch.manual_seed(0)
    tmodel = TDac(TINY).eval()
    sd = tmodel.state_dict_ref_style()
    params = convert_dac_state_dict(
        sd, n_enc_blocks=2, n_dec_blocks=2, n_codebooks=3
    )

    jmodel = Dac(TINY)
    wav = np.random.default_rng(0).normal(size=(1, 1, TINY.hop_length * 6)).astype(
        np.float32
    ) * 0.3

    # encoder parity
    with torch.no_grad():
        t_z = tmodel.encoder(torch.from_numpy(wav)).numpy()  # [1, D, T]
    j_z = jmodel.apply(
        {"params": params},
        jnp.asarray(wav.transpose(0, 2, 1)),
        method=lambda m, x: m.encoder(x),
    )
    np.testing.assert_allclose(
        np.asarray(j_z), t_z.transpose(0, 2, 1), atol=2e-4
    )

    # quantizer from_codes parity
    codes = np.random.default_rng(1).integers(
        0, TINY.codebook_size, size=(1, 3, 10)
    )
    with torch.no_grad():
        t_zq = sum(
            q.out_proj(q.codebook(torch.from_numpy(codes[:, i])).transpose(1, 2))
            for i, q in enumerate(tmodel.quantizer.quantizers)
        ).numpy()
    j_zq = jmodel.apply(
        {"params": params},
        jnp.asarray(codes),
        method=lambda m, c: m.quantizer.from_codes(c),
    )
    np.testing.assert_allclose(
        np.asarray(j_zq), t_zq.transpose(0, 2, 1), atol=2e-4
    )

    # decoder parity
    with torch.no_grad():
        t_wav = tmodel.decoder(torch.from_numpy(t_zq)).numpy()
    j_wav = jmodel.apply(
        {"params": params}, jnp.asarray(j_zq), method=lambda m, z: m.decoder(z)
    )
    np.testing.assert_allclose(
        np.asarray(j_wav)[:, :, 0], t_wav[:, 0, :], atol=2e-4
    )

    # full encode parity (nearest-neighbor codes must match exactly)
    with torch.no_grad():
        z = tmodel.encoder(torch.from_numpy(wav))
        residual = z
        t_codes = []
        for q in tmodel.quantizer.quantizers:
            z_e = q.in_proj(residual)  # [1, cd, T]
            z_en = torch.nn.functional.normalize(z_e, dim=1)
            cb = torch.nn.functional.normalize(q.codebook.weight, dim=1)
            sim = torch.einsum("bct,vc->bvt", z_en, cb)
            idx = sim.argmax(dim=1)
            t_codes.append(idx)
            z_q = q.out_proj(q.codebook(idx).transpose(1, 2))
            residual = residual - z_q
        t_codes = torch.stack(t_codes, dim=1).numpy()
    j_codes = jmodel.apply(
        {"params": params}, jnp.asarray(wav), method=jmodel.encode
    )
    match = (np.asarray(j_codes) == t_codes).mean()
    assert match > 0.98, f"code match only {match}"


# ------------------------------------------------------------------ #
# sampler conversion parity (projection layers)
# ------------------------------------------------------------------ #
def test_sampler_conversion_structure():
    """Structural + numeric checks on the decoder converter with a
    synthetic reference-style state dict."""
    L, K, D, V, cd = 2, 3, 48, 16, 4
    hidden = 128
    rng = np.random.default_rng(0)
    sd = {}
    sd["cls_embeddings.projection.fc1.weight"] = torch.randn(16, 24)
    sd["cls_embeddings.projection.fc2.weight"] = torch.randn(16, 16)
    sd["cls_embeddings.uncond_embedding"] = torch.randn(8, 24)
    sd["empty_video_emb"] = torch.randn(1, 1, 16)
    for k in range(K):
        sd[f"tok_embeddings.{k}.emb.weight"] = torch.randn(V + 1, cd)
        sd[f"tok_embeddings.{k}.out_proj.weight_v"] = torch.randn(32, cd, 1)
        sd[f"tok_embeddings.{k}.out_proj.weight_g"] = torch.rand(32, 1, 1) + 0.5
        sd[f"tok_embeddings.{k}.out_proj.bias"] = torch.randn(32)
    for i in range(L):
        sd[f"layers.{i}.attention.wqkv.weight"] = torch.randn(3 * D, D)
        sd[f"layers.{i}.attention.wo.weight"] = torch.randn(D, D)
        sd[f"layers.{i}.feed_forward.w1.weight"] = torch.randn(hidden, D)
        sd[f"layers.{i}.feed_forward.w2.weight"] = torch.randn(D, hidden)
        sd[f"layers.{i}.feed_forward.w3.weight"] = torch.randn(hidden, D)
        sd[f"layers.{i}.attention_norm.weight"] = torch.ones(D)
        sd[f"layers.{i}.ffn_norm.weight"] = torch.ones(D)
    sd["norm.weight"] = torch.ones(D)
    for k in range(K):
        sd[f"lm_heads.{k}.weight"] = torch.randn(V, D)

    params = convert_sampler_state_dict(sd, num_layers=L, num_codebooks=K, vocab=V)
    assert params["layers"]["attention"]["wqkv"]["kernel"].shape == (L, D, 3 * D)
    assert params["lm_head"]["kernel"].shape == (D, K * V)
    # fused head column k matches lm_heads.k
    np.testing.assert_allclose(
        params["lm_head"]["kernel"][:, V : 2 * V],
        sd["lm_heads.1.weight"].numpy().T,
    )
    # factored embedding: effective W == g * v/||v|| (torch weight_norm)
    v = sd["tok_embeddings.0.out_proj.weight_v"].numpy()[:, :, 0]
    g = sd["tok_embeddings.0.out_proj.weight_g"].numpy()[:, 0, 0]
    expected = g[:, None] * v / np.linalg.norm(v, axis=1, keepdims=True)
    pv = params["tok_embeddings"]["proj_v"][0]
    pg = params["tok_embeddings"]["proj_g"][0]
    eff = pg * pv / np.linalg.norm(pv, axis=-1, keepdims=True)
    np.testing.assert_allclose(eff, expected, rtol=1e-5)


@pytest.mark.slow
def test_motionformer_trajectory_conversion_structure():
    """Trajectory-variant torch checkpoints (attn.proj_q/proj_kv keys,
    reference vit_helper.py:174-313) convert into a tree that loads
    directly into MotionFormer(attn_layer='trajectory')."""
    import torch

    import jax
    import jax.numpy as jnp

    from vaura_tpu.models.convert import convert_motionformer_state_dict
    from vaura_tpu.models.motionformer import MotionFormer, MotionFormerConfig

    cfg = MotionFormerConfig(
        img_size=32, patch_size=16, embed_dim=24, depth=2, num_heads=3,
        temporal_resolution=2, z_block_size=2, attn_layer="trajectory",
        factorize_space_time=False, dtype=jnp.float32,
    )
    D, L = cfg.embed_dim, cfg.depth
    hw = cfg.num_spatial_patches

    sd = {
        "patch_embed_3d.proj.weight": torch.randn(D, 3, 2, 16, 16),
        "patch_embed_3d.proj.bias": torch.randn(D),
        "cls_token": torch.randn(1, 1, D),
        "pos_embed": torch.randn(1, hw + 1, D),
        "temp_embed": torch.randn(1, cfg.temporal_resolution, D),
        "norm.weight": torch.ones(D),
        "norm.bias": torch.zeros(D),
    }
    for i in range(L):
        p = f"blocks.{i}"
        for nm in ("norm1", "norm2"):
            sd[f"{p}.{nm}.weight"] = torch.ones(D)
            sd[f"{p}.{nm}.bias"] = torch.zeros(D)
        sd[f"{p}.attn.qkv.weight"] = torch.randn(3 * D, D)
        sd[f"{p}.attn.qkv.bias"] = torch.randn(3 * D)
        sd[f"{p}.attn.proj_q.weight"] = torch.randn(D, D)
        sd[f"{p}.attn.proj_q.bias"] = torch.randn(D)
        sd[f"{p}.attn.proj_kv.weight"] = torch.randn(2 * D, D)
        sd[f"{p}.attn.proj_kv.bias"] = torch.randn(2 * D)
        sd[f"{p}.attn.proj.weight"] = torch.randn(D, D)
        sd[f"{p}.attn.proj.bias"] = torch.randn(D)
        sd[f"{p}.mlp.fc1.weight"] = torch.randn(4 * D, D)
        sd[f"{p}.mlp.fc1.bias"] = torch.randn(4 * D)
        sd[f"{p}.mlp.fc2.weight"] = torch.randn(D, 4 * D)
        sd[f"{p}.mlp.fc2.bias"] = torch.randn(D)

    converted = convert_motionformer_state_dict(sd, depth=L)

    model = MotionFormer(cfg)
    frames = jnp.zeros((1, 1, 3, 4, 32, 32))
    init_params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        frames,
    )["params"]
    # identical tree structure and shapes
    got = jax.tree.map(lambda x: jnp.asarray(x).shape, converted)
    want = jax.tree.map(lambda x: x.shape, init_params)
    assert got == want
    # converted weights actually run
    out, _ = model.apply(
        {"params": jax.tree.map(jnp.asarray, converted)}, frames
    )
    assert np.isfinite(np.asarray(out)).all()
