"""PANNs CNN14 audio tagger (Kong et al. 2020) — embeddings for FAD and
class posteriors for paired KLD — with a published-checkpoint converter.

Together with :mod:`vaura_tpu.ops.vggish` this makes both halves of the
published audio-generation eval protocol producible in-repo (the reference
delegates FAD/KLD to external frameworks, reference ``README.md:93``):
drop in the released ``Cnn14_mAP=0.431.pth`` and
``scripts/eval_metrics.py --fad --embedder panns --embedder-ckpt ...``
reports ``fad_panns`` and ``kld_panns``.

Pipeline per the published implementation (torchlibrosa frontend):

* 32 kHz mono; power STFT (n_fft 1024, hop 320, centered, reflect pad,
  Hann); 64-band *slaney* mel filterbank over 50-14000 Hz;
  ``10 log10(clamp(mel, 1e-10))``.
* ``bn0`` BatchNorm over the mel axis, then six Conv(3x3)-BN-ReLU x2 +
  2x2 avg-pool blocks (64..2048 ch), mel-mean, (max+mean) time pool,
  ``fc1`` + ReLU -> 2048-d embedding, ``fc_audioset`` -> 527 sigmoid
  class posteriors (AudioSet ontology).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

SAMPLE_RATE = 32000
N_FFT = 1024
HOP = 320
N_MELS = 64
FMIN, FMAX = 50.0, 14000.0
AMIN = 1e-10


def _hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    # linear below 1 kHz, logarithmic above (librosa htk=False)
    mel = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    mel = np.where(
        log_region,
        15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
        mel,
    )
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f = m * (200.0 / 3.0)
    log_region = m >= 15.0
    return np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)


def _mel_filterbank() -> np.ndarray:
    """[n_fft//2+1, N_MELS] slaney-normalized triangular filters
    (librosa.filters.mel defaults, which torchlibrosa uses)."""
    n_bins = N_FFT // 2 + 1
    fft_hz = np.linspace(0.0, SAMPLE_RATE / 2.0, n_bins)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(FMIN), _hz_to_mel_slaney(FMAX), N_MELS + 2
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)
    weights = np.zeros((n_bins, N_MELS))
    for i in range(N_MELS):
        lo, center, hi = hz_pts[i : i + 3]
        lower = (fft_hz - lo) / max(center - lo, 1e-10)
        upper = (hi - fft_hz) / max(hi - center, 1e-10)
        tri = np.maximum(0.0, np.minimum(lower, upper))
        # slaney norm: scale to constant energy per band
        weights[:, i] = tri * (2.0 / (hi - lo))
    return weights


def log_mel_spectrogram(wav: np.ndarray, sr: int) -> np.ndarray:
    """Waveform -> [T, 64] log-mel frames, torchlibrosa-compatible."""
    wav = np.asarray(wav, np.float32).reshape(-1)
    if sr != SAMPLE_RATE:
        from vaura_tpu.ops.audio import resample_poly

        wav = np.asarray(resample_poly(wav, sr, SAMPLE_RATE)).reshape(-1)
    if wav.shape[0] < N_FFT:
        wav = np.pad(wav, (0, N_FFT - wav.shape[0]))
    # centered frames with reflect padding (torchlibrosa Spectrogram)
    half = N_FFT // 2
    padded = np.pad(wav, (half, half), mode="reflect")
    n_frames = 1 + (padded.shape[0] - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = padded[idx]
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)  # periodic Hann
    power = np.abs(np.fft.rfft(frames * window, n=N_FFT)) ** 2
    mel = power @ _mel_filterbank()
    return (10.0 * np.log10(np.maximum(mel, AMIN))).astype(np.float32)


# --------------------------------------------------------------------- #
# network
# --------------------------------------------------------------------- #
_BLOCK_CH = (64, 128, 256, 512, 1024, 2048)


def _bn(x, p, axis=-1):
    import jax.numpy as jnp

    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]

    def r(v):
        return jnp.asarray(v, jnp.float32).reshape(shape)

    return (x - r(p["mean"])) / jnp.sqrt(r(p["var"]) + 1e-5) * r(p["scale"]) + r(
        p["bias"]
    )


def cnn14_forward(params: Dict[str, Any], logmel) -> Tuple[Any, Any]:
    """[N, T, 64] log-mel -> (embedding [N, 2048], class probs [N, 527]).

    Jitted (cached; one graph per logmel shape) — the eval loop calls
    this per clip and the 12-conv stack would dispatch eagerly.
    """
    global _CNN14_JIT
    import jax

    if _CNN14_JIT is None:
        _CNN14_JIT = jax.jit(_cnn14_forward_impl)
    return _CNN14_JIT(params, jax.numpy.asarray(logmel))


_CNN14_JIT = None


def _cnn14_forward_impl(params: Dict[str, Any], logmel) -> Tuple[Any, Any]:
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(logmel, jnp.float32)
    # bn0 normalizes the mel axis (applied channel-wise over 64 bins)
    x = _bn(x, params["bn0"], axis=-1)
    x = x[..., None]  # NHWC: [N, T, 64, 1]
    for i in range(6):
        blk = params[f"conv_block{i + 1}"]
        for j in (1, 2):
            w = blk[f"conv{j}"]["kernel"]  # HWIO
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = _bn(x, blk[f"bn{j}"], axis=-1)
            x = jax.nn.relu(x)
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0
    x = jnp.mean(x, axis=2)  # mel axis -> [N, T', 2048]
    x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)  # time pool
    emb = jax.nn.relu(
        x @ params["fc1"]["kernel"] + params["fc1"]["bias"]
    )
    logits = emb @ params["fc_audioset"]["kernel"] + params["fc_audioset"]["bias"]
    return emb, jax.nn.sigmoid(logits)


def convert_cnn14_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Published CNN14 checkpoint (``model`` sub-dict of
    ``Cnn14_mAP=0.431.pth``) -> param pytree. Spectrogram-extractor conv
    weights (torchlibrosa STFT/mel banks) are recomputed analytically here
    and skipped."""

    def _np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)

    def bn(prefix):
        return {
            "scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"]),
            "mean": _np(sd[f"{prefix}.running_mean"]),
            "var": _np(sd[f"{prefix}.running_var"]),
        }

    params: Dict[str, Any] = {"bn0": bn("bn0")}
    for i in range(1, 7):
        p = f"conv_block{i}"
        params[p] = {
            "conv1": {"kernel": _np(sd[f"{p}.conv1.weight"]).transpose(2, 3, 1, 0)},
            "bn1": bn(f"{p}.bn1"),
            "conv2": {"kernel": _np(sd[f"{p}.conv2.weight"]).transpose(2, 3, 1, 0)},
            "bn2": bn(f"{p}.bn2"),
        }
    for name in ("fc1", "fc_audioset"):
        params[name] = {
            "kernel": _np(sd[f"{name}.weight"]).T,
            "bias": _np(sd[f"{name}.bias"]),
        }
    return params


class PANNsEmbedder:
    """Pluggable embedder for :mod:`vaura_tpu.ops.fad`: 2048-d embedding
    rows for FAD plus AudioSet class posteriors for paired KLD
    (``last_probs`` holds the posteriors of the most recent call)."""

    name = "panns"

    def __init__(self, ckpt_path: str):
        import torch

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        self.params = convert_cnn14_state_dict(sd)
        self.last_probs: np.ndarray | None = None

    def __call__(self, wav: np.ndarray, sr: int) -> np.ndarray:
        logmel = log_mel_spectrogram(wav, sr)[None]  # one clip = one row
        emb, probs = cnn14_forward(self.params, logmel)
        self.last_probs = np.asarray(probs)[0]
        return np.asarray(emb)
