"""Weight-only int8 quantization for the decode path.

The AR decode loop is weight-streaming-bound at small batch (694M params
read every step); storing the big matmul weights as int8 with per-output-
channel scales halves that traffic vs bf16. XLA fuses the upcast into the
matmul, so the HBM read is the int8 tensor.

Usage: train/convert in f32/bf16, then::

    qparams = quantize_sampler_params(params["sampler"])
    sampler = Sampler(dataclasses.replace(cfg, quantize_weights=True))
    sampler.apply({"params": qparams}, ...)

Symmetric per-channel: ``W ~ q * scale[None, :]`` with
``scale = max|W|/127`` per output column, so
``x @ W == (x @ q) * scale`` exactly commutes.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# kernels quantized inside the scanned decoder blocks + the fused LM head
QUANT_PATHS: Sequence[str] = (
    "layers/attention/wqkv/kernel",
    "layers/attention/wo/kernel",
    "layers/feed_forward/w1/kernel",
    "layers/feed_forward/w2/kernel",
    "layers/feed_forward/w3/kernel",
    "lm_head/kernel",
)


def quantize_weight(w: np.ndarray) -> Dict[str, np.ndarray]:
    """[.., in, out] float -> {kernel_q int8, scale f32[..., out]}."""
    w = np.asarray(w, np.float32)
    scale = np.max(np.abs(w), axis=-2, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-8)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return {"kernel_q": q, "scale": np.squeeze(scale, axis=-2).astype(np.float32)}


def quantize_sampler_params(sampler_params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the big matmul kernels of a Sampler param tree in place
    (returns a new tree; other leaves unchanged)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = dict(flatten_dict(sampler_params))
    out = {}
    for key, value in flat.items():
        path = "/".join(map(str, key))
        if path in QUANT_PATHS:
            qd = quantize_weight(np.asarray(value))
            base = key[:-1]
            out[base + ("kernel_q",)] = jnp.asarray(qd["kernel_q"])
            out[base + ("scale",)] = jnp.asarray(qd["scale"])
        else:
            out[key] = value
    return unflatten_dict(out)


# divided-block matmul kernels in a MotionFormer param tree (stacked
# [depth, in, out] under the nn.scan axis; biases stay float). The block
# stack is ~92% of encoder time (bench.py --mode encoder --layers sweep),
# so these six kernels are where the int8 MXU rate pays.
ENCODER_QUANT_PATHS: Sequence[str] = (
    "blocks/timeattn/qkv/kernel",
    "blocks/timeattn/proj/kernel",
    "blocks/attn/qkv/kernel",
    "blocks/attn/proj/kernel",
    "blocks/mlp/fc1/kernel",
    "blocks/mlp/fc2/kernel",
)


def quantize_encoder_params(encoder_params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the divided-block Dense kernels of a MotionFormer param
    tree for ``MotionFormerConfig.quantize=True`` inference (int8 weights
    + dynamic int8 activations; see ``models.motionformer.EncDense``).
    Returns a new tree; every other leaf (biases, LayerNorms, patch
    embed, agg layers, attention internals) is unchanged."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = dict(flatten_dict(encoder_params))
    out = {}
    for key, value in flat.items():
        path = "/".join(map(str, key))
        if path in ENCODER_QUANT_PATHS:
            qd = quantize_weight(np.asarray(value))
            base = key[:-1]
            out[base + ("kernel_q",)] = jnp.asarray(qd["kernel_q"])
            out[base + ("scale",)] = jnp.asarray(qd["scale"])
        else:
            out[key] = value
    return unflatten_dict(out)


def quant_dense(x: jax.Array, params: Dict[str, jax.Array]) -> jax.Array:
    """y = (x @ int8_kernel) * scale — the upcast fuses into the matmul so
    HBM reads stay int8."""
    q = params["kernel_q"]
    scale = params["scale"]
    y = jnp.dot(
        x, q.astype(x.dtype), preferred_element_type=jnp.float32
    )
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def quantize_kv(x: jax.Array) -> tuple:
    """Symmetric int8 over the last axis (head_dim): returns
    ``(q int8, scale f32[..., ])`` with ``x ~ q * scale[..., None]``.
    Used for KV-cache quantization — the per-(position, head) scale folds
    outside the attention dots (scores *= k_scale; probs *= v_scale), so
    both matmuls run on the upcast int8 directly."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_kv4(x: jax.Array) -> tuple:
    """Symmetric int4 over the last axis, nibble-packed into int8: returns
    ``(packed int8 [..., hd//2], scale f32[...])``.

    Pack layout is half-split (NOT interleaved): packed element ``j`` holds
    value ``j`` in the low nibble and value ``j + hd//2`` in the high
    nibble, so :func:`unpack_int4` is two shifts + one concat (no
    interleave relayout on the minor axis). ``jnp.int4`` itself is unusable
    through the axon relay (jit recursion on S4 scalars — PERFORMANCE.md),
    hence the manual packing. Range is symmetric [-7, 7]."""
    hd = x.shape[-1]
    assert hd % 2 == 0, "head_dim must be even for nibble packing"
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 7.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -7, 7).astype(jnp.int8)
    lo = q[..., : hd // 2]
    hi = q[..., hd // 2 :]
    packed = jnp.bitwise_or(
        jnp.bitwise_and(lo, jnp.int8(0x0F)),
        jnp.left_shift(hi, jnp.int8(4)),
    )
    return packed, scale


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of :func:`quantize_kv4`'s packing: int8 [..., hd//2] ->
    int8 [..., hd] with sign-extended nibbles (low nibble = first half of
    head_dim, high nibble = second half)."""
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(packed, jnp.int8(4)), jnp.int8(4)
    )
    hi = jax.lax.shift_right_arithmetic(packed, jnp.int8(4))
    return jnp.concatenate([lo, hi], axis=-1)


def quantize_rows(x: jax.Array) -> tuple:
    """Dynamic symmetric int8 over the last axis for activations (the
    decode-step q vector / attention-prob rows): ``(q int8, scale f32)``
    with ``x ~ q * scale[..., None]``. Enables int8 x int8 attention dots
    (``SamplerConfig.int8_dots``) so the MXU consumes the int8 cache
    directly instead of widening it to bf16 first."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q, scale
