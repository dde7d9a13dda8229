"""VGGish audio embedder (Hershey et al. 2017) — the standard FAD embedding
network — with a torchvggish-checkpoint weight converter.

The reference delegates FAD/KLD to external frameworks built on
VGGish/PANNs embeddings (reference ``README.md:93``). This module makes
those numbers producible in-repo: drop in the published ``vggish.pth``
(torchvggish state-dict naming) and ``scripts/eval_metrics.py --embedder
vggish --embedder-ckpt vggish.pth`` reports comparable FAD.

Three parts, all matching the published spec (TF-slim ``vggish_params`` /
``mel_features``, which torchvggish vendors verbatim):

* ``log_mel_patches`` — waveform -> [N, 96, 96, 64]-style examples:
  16 kHz mono, 25 ms periodic-Hann window / 10 ms hop magnitude STFT,
  64 HTK-mel bands over 125-7500 Hz, ``log(mel + 0.01)``, framed into
  non-overlapping 0.96 s examples (96 frames x 64 bands).
* ``vggish_embed`` — the conv stack (4 blocks: 64/128/256x2/512x2, 3x3
  convs, 2x2 max-pools) + 3-layer FC head to a 128-d embedding, in JAX
  (NHWC — which matches torchvggish's transpose-before-flatten layout,
  so the FC weights convert without permutation).
* ``convert_vggish_state_dict`` — torchvggish ``features.*``/
  ``embeddings.*`` tensors -> the param pytree used here.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

SAMPLE_RATE = 16000
STFT_WINDOW = 400  # 25 ms
STFT_HOP = 160  # 10 ms
NUM_MEL_BINS = 64
MEL_MIN_HZ = 125.0
MEL_MAX_HZ = 7500.0
LOG_OFFSET = 0.01
EXAMPLE_FRAMES = 96  # 0.96 s at the 10 ms hop


def _hz_to_mel(f):
    return 1127.0 * np.log1p(np.asarray(f, np.float64) / 700.0)


def _mel_matrix(num_spec_bins: int) -> np.ndarray:
    """[num_spec_bins, NUM_MEL_BINS] triangular weights (HTK mel), per the
    published ``mel_features.spectrogram_to_mel_matrix``."""
    nyquist = SAMPLE_RATE / 2.0
    spec_hz = np.linspace(0.0, nyquist, num_spec_bins)
    spec_mel = _hz_to_mel(spec_hz)
    band_edges = np.linspace(
        _hz_to_mel(MEL_MIN_HZ), _hz_to_mel(MEL_MAX_HZ), NUM_MEL_BINS + 2
    )
    weights = np.zeros((num_spec_bins, NUM_MEL_BINS))
    for i in range(NUM_MEL_BINS):
        lo, center, hi = band_edges[i : i + 3]
        lower = (spec_mel - lo) / (center - lo)
        upper = (hi - spec_mel) / (hi - center)
        weights[:, i] = np.maximum(0.0, np.minimum(lower, upper))
    weights[0, :] = 0.0  # DC bin excluded
    return weights


def log_mel_patches(wav: np.ndarray, sr: int) -> np.ndarray:
    """Waveform -> [N, 96, 64] log-mel examples (float32). Returns an empty
    [0, 96, 64] array for clips shorter than one example."""
    wav = np.asarray(wav, np.float32).reshape(-1)
    if sr != SAMPLE_RATE:
        from vaura_tpu.ops.audio import resample_poly

        wav = np.asarray(resample_poly(wav, sr, SAMPLE_RATE)).reshape(-1)
    if wav.shape[0] < STFT_WINDOW:
        return np.zeros((0, EXAMPLE_FRAMES, NUM_MEL_BINS), np.float32)
    n_frames = 1 + (wav.shape[0] - STFT_WINDOW) // STFT_HOP
    idx = (
        np.arange(STFT_WINDOW)[None, :]
        + STFT_HOP * np.arange(n_frames)[:, None]
    )
    frames = wav[idx]
    window = 0.5 - 0.5 * np.cos(
        2.0 * np.pi / STFT_WINDOW * np.arange(STFT_WINDOW)
    )  # periodic Hann (mel_features.periodic_hann)
    mag = np.abs(np.fft.rfft(frames * window, n=512))  # fft_length 512
    mel = mag @ _mel_matrix(mag.shape[1])
    logmel = np.log(mel + LOG_OFFSET)
    n_ex = logmel.shape[0] // EXAMPLE_FRAMES
    if n_ex == 0:
        return np.zeros((0, EXAMPLE_FRAMES, NUM_MEL_BINS), np.float32)
    return (
        logmel[: n_ex * EXAMPLE_FRAMES]
        .reshape(n_ex, EXAMPLE_FRAMES, NUM_MEL_BINS)
        .astype(np.float32)
    )


# --------------------------------------------------------------------- #
# network
# --------------------------------------------------------------------- #
_CONV_CHANNELS = (64, 128, 256, 256, 512, 512)
_POOL_AFTER = {0, 1, 3, 5}  # maxpool follows these conv indices


def vggish_embed(params: Dict[str, Any], patches) -> Any:
    """[N, 96, 64] log-mel examples -> [N, 128] embeddings (jnp).

    Jitted (cached per patch count): the eval loop calls this once per
    clip, and the 13-op conv stack would otherwise dispatch eagerly.
    """
    global _VGGISH_JIT
    import jax

    if _VGGISH_JIT is None:
        _VGGISH_JIT = jax.jit(_vggish_embed_impl)
    return _VGGISH_JIT(params, jax.numpy.asarray(patches))


_VGGISH_JIT = None


def _vggish_embed_impl(params: Dict[str, Any], patches) -> Any:
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(patches, jnp.float32)[..., None]  # NHWC, C=1
    for i in range(len(_CONV_CHANNELS)):
        w = params[f"conv{i}"]["kernel"]
        b = params[f"conv{i}"]["bias"]
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        x = jax.nn.relu(x)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    # [N, 6, 4, 512] -> flatten in NHWC order (torchvggish transposes to
    # (h, w, c) before .view, so the FC kernels align without permutation)
    x = x.reshape(x.shape[0], -1)
    for j, name in enumerate(("fc0", "fc1", "fc2")):
        x = x @ params[name]["kernel"] + params[name]["bias"]
        x = jax.nn.relu(x)
    return x


def convert_vggish_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvggish state dict -> param pytree.

    torchvggish layout: ``features.{0,3,6,8,11,13}`` are the convs
    (interleaved with ReLU/MaxPool), ``embeddings.{0,2,4}`` the FC stack.
    Conv [O, I, kh, kw] -> HWIO; Linear [out, in] -> [in, out].
    """

    def _np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    conv_ids = (0, 3, 6, 8, 11, 13)
    params: Dict[str, Any] = {}
    for i, fid in enumerate(conv_ids):
        w = _np(sd[f"features.{fid}.weight"])  # [O, I, kh, kw]
        params[f"conv{i}"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": _np(sd[f"features.{fid}.bias"]),
        }
    for j, eid in enumerate((0, 2, 4)):
        params[f"fc{j}"] = {
            "kernel": _np(sd[f"embeddings.{eid}.weight"]).T,
            "bias": _np(sd[f"embeddings.{eid}.bias"]),
        }
    return params


class VGGishEmbedder:
    """Pluggable embedder for :mod:`vaura_tpu.ops.fad`: returns one 128-d
    row per 0.96 s example (FAD statistics are computed over examples, as
    in the published evaluation protocols)."""

    name = "vggish"

    def __init__(self, ckpt_path: str):
        import torch

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        self.params = convert_vggish_state_dict(sd)

    def __call__(self, wav: np.ndarray, sr: int) -> np.ndarray:
        patches = log_mel_patches(wav, sr)
        if patches.shape[0] == 0:
            return np.zeros((0, 128), np.float32)
        return np.asarray(vggish_embed(self.params, patches))
