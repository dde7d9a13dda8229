"""Regenerate the published-checkpoint key-schema manifests in
``tests/fixtures/``.

Day-one real-weight insurance (zero egress here): the manifests snapshot
the exact state-dict key names + shapes of

  * the descript-audio-codec 44 kHz 8 kbps release
    (``weights_44khz_8kbps_0.0.1.pth`` — the reference wraps it via
    ``dac.DAC.load``, reference ``models/modules/dac/model.py:23``), keyed
    exactly as descript's ``Sequential``-indexed modules with legacy
    ``weight_norm`` (``weight_g``/``weight_v``) parametrization — the
    naming the converter's torch twin (``tests/test_convert.py::TDac``)
    reproduces and ``test_dac_conversion_parity`` validates numerically;
  * the AVCLIP/Synchformer stage-I VGGSound checkpoint the reference's
    feature extractor consumes (``state_dict`` with ``module.v_encoder.``
    prefixes filtered + stripped, reference
    ``avclip/motionformer.py:219-227``) — generated from the reference's
    OWN vendored ``MotionFormer`` module so the key set is exact, plus
    ``module.a_encoder.*`` decoys that the filter must drop.

``tests/test_converter_fixtures.py`` synthesizes tensors to these schemas
and drives the converters against them.

Run: ``python tests/make_converter_fixtures.py``
"""

import json
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE))
sys.path.insert(0, str(HERE.parent))

FIXTURES = HERE / "fixtures"


def dac_manifest() -> dict:
    import torch  # noqa: F401

    from test_convert import TDac
    from vaura_tpu.models.dac.model import config_for_sample_rate

    cfg = config_for_sample_rate(44100)
    model = TDac(cfg)
    keys = {
        k: list(v.shape) for k, v in model.state_dict_ref_style().items()
    }
    return {
        "source": "descript-audio-codec weights_44khz_8kbps_0.0.1.pth",
        "wrapper": {
            "metadata": {"kwargs": "model constructor kwargs (unused)"},
            "state_dict": "<keys below>",
        },
        "config": {
            "encoder_dim": cfg.encoder_dim,
            "encoder_rates": list(cfg.encoder_rates),
            "decoder_dim": cfg.decoder_dim,
            "decoder_rates": list(cfg.decoder_rates),
            "n_codebooks": cfg.n_codebooks,
            "codebook_size": cfg.codebook_size,
            "codebook_dim": cfg.codebook_dim,
            "sample_rate": cfg.sample_rate,
        },
        "keys": keys,
    }


def avclip_manifest() -> dict:
    import types

    from ref_oracle import install_stubs, import_ref

    install_stubs()
    import torch

    torch.manual_seed(0)

    def ns(**kw):
        return types.SimpleNamespace(**kw)

    # full published scale: ViT-B/16 divided space-time, 224^2 crops,
    # 16 frames / z-block 2 (the divided_224_16x4.yaml the reference
    # resolves for stage-I ckpts, avclip/motionformer.py:82-125)
    cfg = ns(
        DATA=ns(TRAIN_CROP_SIZE=224),
        TRAIN=ns(DATASET="vggsound"),
        MODEL=ns(NUM_CLASSES=0),
        VIT=ns(
            PATCH_SIZE=16, PATCH_SIZE_TEMP=2, CHANNELS=3, EMBED_DIM=768,
            DEPTH=12, NUM_HEADS=12, MLP_RATIO=4, QKV_BIAS=True,
            VIDEO_INPUT=True, TEMPORAL_RESOLUTION=8, USE_MLP=False,
            DROP=0.0, POS_DROPOUT=0.0, DROP_PATH=0.2, HEAD_DROPOUT=0.0,
            ATTN_DROPOUT=0.0, HEAD_ACT="tanh", POS_EMBED="separate",
            ATTN_LAYER="divided", USE_ORIGINAL_TRAJ_ATTN_CODE=True,
            APPROX_ATTN_TYPE="none", APPROX_ATTN_DIM=64,
        ),
    )
    vmb = import_ref("motionformer_src.video_model_builder")
    mf = import_ref("models.modules.feature_extractors.avclip.motionformer")
    vt = vmb.VisionTransformer(cfg)
    agg_kwargs = dict(
        d_model=768, nhead=12, activation=torch.nn.GELU(),
        batch_first=True, dim_feedforward=4 * 768, dropout=0.0,
        layer_norm_eps=1e-6, norm_first=True,
    )
    # stage-I v_encoder = VisionTransformer + spatial agg (temp_attn_agg
    # is Identity in the stage-I config — the reference load warning
    # documents it as expectedly missing, avclip/motionformer.py:230-233)
    sagg = mf.SpatialTransformerEncoderLayer(**agg_kwargs)
    keys = {
        f"module.v_encoder.{k}": list(v.shape)
        for k, v in vt.state_dict().items()
    }
    keys.update({
        f"module.v_encoder.spatial_attn_agg.{k}": list(v.shape)
        for k, v in sagg.state_dict().items()
    })
    # the published ckpt carries the audio tower too; the loader must
    # filter it out (reference avclip/motionformer.py:219-224)
    decoys = {
        "module.a_encoder.patch_embed.proj.weight": [768, 1, 16, 16],
        "module.a_encoder.blocks.0.attn.qkv.weight": [2304, 768],
        "module.a_encoder.norm.weight": [768],
    }
    return {
        "source": "AVCLIP (Synchformer stage-I) VGGSound checkpoint",
        "wrapper": {"state_dict": "<keys below>", "args": "stage-I cfg"},
        "keys": {**keys, **decoys},
    }


if __name__ == "__main__":
    FIXTURES.mkdir(exist_ok=True)
    out = FIXTURES / "dac_44khz_8kbps.keys.json"
    out.write_text(json.dumps(dac_manifest(), indent=1) + "\n")
    print(f"wrote {out}")
    out = FIXTURES / "avclip_stage1_vggsound.keys.json"
    out.write_text(json.dumps(avclip_manifest(), indent=1) + "\n")
    print(f"wrote {out}")
