"""MotionFormer tests: shape contract + divided-attention parity against a
torch replica of the reference's vendored Motionformer (vit_helper.py
DividedAttention/DividedSpaceTimeBlock and the Synchformer spatial
aggregation layer), weights moved through the checkpoint converter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
from einops import rearrange, repeat  # noqa: E402

from vaura_tpu.models.convert import convert_motionformer_state_dict  # noqa: E402
from vaura_tpu.models.motionformer import (  # noqa: E402
    MotionFormer,
    MotionFormerConfig,
)

CFG = MotionFormerConfig(
    img_size=32,
    patch_size=8,
    embed_dim=24,
    depth=2,
    num_heads=2,
    temporal_resolution=2,
    z_block_size=2,
    drop_path_rate=0.0,
    drop_rate=0.0,
    dtype=jnp.float32,
)


# ------------------------------------------------------------------ #
# torch replica (reference vit_helper.py structure & naming)
# ------------------------------------------------------------------ #
class TDividedAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.h = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, einops_from, einops_to, **dims):
        h = self.h
        q, k, v = self.qkv(x).chunk(3, dim=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b n (h d) -> (b h) n d", h=h), (q, k, v)
        )
        q = q * self.scale
        (cls_q, q_), (cls_k, k_), (cls_v, v_) = map(
            lambda t: (t[:, 0:1], t[:, 1:]), (q, k, v)
        )
        cls_out = (cls_q @ k.transpose(1, 2)).softmax(-1) @ v
        q_, k_, v_ = map(
            lambda t: rearrange(t, f"{einops_from} -> {einops_to}", **dims),
            (q_, k_, v_),
        )
        r = q_.shape[0] // cls_k.shape[0]
        cls_k, cls_v = map(
            lambda t: repeat(t, "b () d -> (b r) () d", r=r), (cls_k, cls_v)
        )
        k_ = torch.cat((cls_k, k_), dim=1)
        v_ = torch.cat((cls_v, v_), dim=1)
        out = (q_ @ k_.transpose(1, 2)).softmax(-1) @ v_
        out = rearrange(out, f"{einops_to} -> {einops_from}", **dims)
        out = torch.cat((cls_out, out), dim=1)
        out = rearrange(out, "(b h) n d -> b n (h d)", h=h)
        return self.proj(out)


class TBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TDividedAttention(dim, heads)
        self.timeattn = TDividedAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.norm3 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, dim * mlp_ratio)
        self.mlp.fc2 = nn.Linear(dim * mlp_ratio, dim)

    def forward(self, x, f, n):
        t = self.timeattn(
            self.norm3(x), "b (f n) d", "(b n) f d", n=n
        )
        x = x + t
        s = self.attn(self.norm1(x), "b (f n) d", "(b f) n d", f=f)
        x = x + s
        h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + h


class TMotionFormer(nn.Module):
    def __init__(self, cfg: MotionFormerConfig):
        super().__init__()
        D = cfg.embed_dim
        self.patch_embed_3d = nn.Module()
        self.patch_embed_3d.proj = nn.Conv3d(
            3, D,
            kernel_size=(cfg.z_block_size, cfg.patch_size, cfg.patch_size),
            stride=(cfg.z_block_size, cfg.patch_size, cfg.patch_size),
        )
        hw = cfg.num_spatial_patches
        self.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, hw + 1, D) * 0.02)
        self.temp_embed = nn.Parameter(
            torch.randn(1, cfg.temporal_resolution, D) * 0.02
        )
        self.blocks = nn.ModuleList(
            [TBlock(D, cfg.num_heads, cfg.mlp_ratio) for _ in range(cfg.depth)]
        )
        self.norm = nn.LayerNorm(D, eps=1e-6)
        # spatial aggregation (TransformerEncoderLayer, norm_first, GELU)
        agg = nn.Module()
        agg.cls_token = nn.Parameter(torch.randn(1, 1, D) * 0.02)
        agg.self_attn = nn.MultiheadAttention(D, cfg.num_heads, batch_first=True)
        agg.linear1 = nn.Linear(D, cfg.mlp_ratio * D)
        agg.linear2 = nn.Linear(cfg.mlp_ratio * D, D)
        agg.norm1 = nn.LayerNorm(D, eps=1e-6)
        agg.norm2 = nn.LayerNorm(D, eps=1e-6)
        self.spatial_attn_agg = agg
        self.cfg = cfg

    def forward(self, x):  # x: [BS, C, T, H, W]
        cfg = self.cfg
        BS = x.shape[0]
        hw = cfg.num_spatial_patches
        t = cfg.temporal_resolution
        x = self.patch_embed_3d.proj(x).flatten(2).transpose(1, 2)  # [BS, t*hw, D]
        cls = self.cls_token.expand(BS, -1, -1)
        x = torch.cat((cls, x), dim=1)
        tile_pos = self.pos_embed[:, 1:].repeat(1, t, 1)
        tile_temp = self.temp_embed.repeat_interleave(hw, 1)
        total = torch.cat(
            [self.pos_embed[:, :1], tile_pos + tile_temp], dim=1
        )
        x = x + total
        for blk in self.blocks:
            x = blk(x, f=t, n=hw)
        x = x[:, 1:]
        x = self.norm(x)
        # restore dims + spatial agg
        x = x.reshape(BS, t, hw, -1).reshape(BS * t, hw, -1)
        agg = self.spatial_attn_agg
        cls = agg.cls_token.expand(x.shape[0], -1, -1)
        y = torch.cat((cls, x), dim=1)
        h = agg.norm1(y)
        attn_out, _ = agg.self_attn(h, h, h, need_weights=False)
        y = y + attn_out
        h = agg.norm2(y)
        h = agg.linear2(torch.nn.functional.gelu(agg.linear1(h)))
        y = y + h
        return y[:, 0].reshape(BS, t, -1)

    def state_dict_ref_style(self):
        sd = dict(self.state_dict())
        # MultiheadAttention already exposes in_proj_weight/bias + out_proj
        return sd


@pytest.mark.slow
def test_motionformer_parity_with_torch():
    torch.manual_seed(0)
    tmodel = TMotionFormer(CFG).eval()
    sd = tmodel.state_dict_ref_style()
    params = convert_motionformer_state_dict(sd, depth=CFG.depth)

    jmodel = MotionFormer(CFG)
    B, S, C, T = 2, 2, 3, CFG.temporal_resolution * CFG.z_block_size
    frames = np.random.default_rng(0).normal(
        size=(B, S, C, T, CFG.img_size, CFG.img_size)
    ).astype(np.float32)

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(frames.reshape(B * S, C, T, CFG.img_size, CFG.img_size)))
        t_out = t_out.reshape(B, S, CFG.temporal_resolution, CFG.embed_dim).numpy()

    j_out, _ = jmodel.apply({"params": params}, jnp.asarray(frames), train=False)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=3e-4)


@pytest.mark.slow
def test_motionformer_output_shape():
    model = MotionFormer(CFG)
    frames = jnp.zeros((1, 3, 3, 4, CFG.img_size, CFG.img_size))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        frames,
    )["params"]
    out, glob = model.apply({"params": params}, frames)
    assert out.shape == (1, 3, CFG.temporal_resolution, CFG.embed_dim)
    assert glob is None


@pytest.mark.slow
def test_motionformer_temporal_and_global_aggregation():
    """agg_time_module=TransformerEncoderLayer pools (B,S,t,D) -> (B,S,D);
    add_global_repr aggregates segments -> (B,D) via a CLS encoder layer
    with a segment positional embedding (reference motionformer.py:191-216,
    294-301)."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG,
        agg_time_module="TransformerEncoderLayer",
        add_global_repr=True,
        max_segments=8,
    )
    model = MotionFormer(cfg)
    frames = jnp.zeros((2, 3, 3, 4, cfg.img_size, cfg.img_size))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        frames,
    )["params"]
    out, glob = model.apply({"params": params}, frames)
    assert out.shape == (2, 3, cfg.embed_dim)
    assert glob.shape == (2, cfg.embed_dim)
    assert "temp_attn_agg" in params and "global_attn_agg" in params
    assert params["global_attn_agg"]["pos_emb"].shape == (1, 9, cfg.embed_dim)

    # AveragePooling variants
    cfg2 = dataclasses.replace(
        cfg, agg_time_module="AveragePooling", agg_segments_module="AveragePooling"
    )
    model2 = MotionFormer(cfg2)
    params2 = model2.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        frames,
    )["params"]
    out2, glob2 = model2.apply({"params": params2}, frames)
    assert out2.shape == (2, 3, cfg.embed_dim)
    assert glob2.shape == (2, cfg.embed_dim)
