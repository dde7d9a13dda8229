"""int8 encoder inference (MotionFormerConfig.quantize): param-tree
transform integrity + closeness of the quantized forward to the float
one. The float path's exact nn.Dense equivalence is covered by the
oracle suite (test_motionformer.py / test_reference_oracle_vit.py) —
EncDense keeps the same param names, shapes and math when quantize is
off. Random weights are a HARSHER quantization case than trained ViT
weights (no learned margins), so the tolerance here is an upper bound."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vaura_tpu.models.motionformer import MotionFormer, MotionFormerConfig
from vaura_tpu.ops.quantization import (
    ENCODER_QUANT_PATHS,
    quantize_encoder_params,
)

CFG = MotionFormerConfig(
    img_size=32,
    patch_size=8,
    embed_dim=48,
    depth=2,
    num_heads=2,
    temporal_resolution=2,
    z_block_size=2,
    drop_path_rate=0.0,
    drop_rate=0.0,
    dtype=jnp.float32,
    fused_divided_attention=False,
)


def _params_and_frames():
    model = MotionFormer(CFG)
    rng = jax.random.PRNGKey(0)
    frames = jax.random.normal(
        jax.random.PRNGKey(1), (2, 2, 3, 4, 32, 32), jnp.float32
    )
    params = model.init(rng, frames)["params"]
    return model, params, frames


@pytest.mark.slow
def test_quantize_encoder_params_tree():
    """Every divided-block kernel becomes kernel_q int8 + scale f32 with
    the stacked depth axis preserved; all other leaves are untouched."""
    from flax.traverse_util import flatten_dict

    _, params, _ = _params_and_frames()
    qparams = quantize_encoder_params(params)
    flat = {"/".join(map(str, k)): v for k, v in flatten_dict(params).items()}
    qflat = {"/".join(map(str, k)): v
             for k, v in flatten_dict(qparams).items()}
    for path in ENCODER_QUANT_PATHS:
        base = path.rsplit("/", 1)[0]
        assert path not in qflat
        kq, sc = qflat[base + "/kernel_q"], qflat[base + "/scale"]
        assert kq.dtype == jnp.int8
        w = flat[path]
        assert kq.shape == w.shape  # [depth, in, out]
        assert sc.shape == (w.shape[0], w.shape[-1])  # [depth, out]
        # dequantized weight close to the original (per-channel symmetric)
        deq = np.asarray(kq, np.float32) * np.asarray(sc)[:, None, :]
        err = np.abs(deq - np.asarray(w)).max()
        assert err <= np.abs(np.asarray(w)).max() / 127.0 * 1.01
    # untouched leaves (biases, LN, patch embed, agg) survive bit-exact
    for path, v in flat.items():
        if path not in ENCODER_QUANT_PATHS:
            assert path in qflat
            np.testing.assert_array_equal(np.asarray(v), np.asarray(qflat[path]))


@pytest.mark.slow
def test_quantized_forward_close_to_float():
    """int8 weights + dynamic int8 activations stay close to the float
    forward at random (worst-case) weights."""
    import dataclasses

    model, params, frames = _params_and_frames()
    ref, _ = model.apply({"params": params}, frames, False)

    qmodel = MotionFormer(dataclasses.replace(CFG, quantize=True))
    qparams = quantize_encoder_params(params)
    out, _ = qmodel.apply({"params": qparams}, frames, False)

    ref = np.asarray(ref, np.float32).reshape(-1)
    out = np.asarray(out, np.float32).reshape(-1)
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    cos = float((out @ ref) / (np.linalg.norm(out) * np.linalg.norm(ref)))
    assert rel < 0.05, rel
    assert cos > 0.995, cos
