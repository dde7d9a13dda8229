"""Objective audio metrics over generated clips.

The reference delegates evaluation (FAD/KLD/sync) to an external framework
(reference ``README.md:93``, ``main.py:109-111``); this tool provides the
in-repo objective metrics that don't need pretrained embedding models:

  * multi-scale log-mel spectrogram distance (generated vs reference wav)
  * SI-SNR
  * loudness (LUFS) delta

Usage::

    python scripts/eval_metrics.py GENERATED_DIR REFERENCE_DIR [--out report.json]

Pairs files by basename (``<stem>.wav``).
"""

from __future__ import annotations

if __package__ in (None, ""):  # direct `python scripts/X.py` invocation
    import sys as _sys
    from pathlib import Path as _P

    _sys.path.insert(0, str(_P(__file__).resolve().parents[1]))

import argparse
import json
import logging
from pathlib import Path

import numpy as np
from vaura_tpu.ops.audio import integrated_loudness, read_wav, resample_poly

logger = logging.getLogger(__name__)


from vaura_tpu.ops.audio import log_mel  # noqa: E402  (shared with ops.fad)


def spectral_distance(a: np.ndarray, b: np.ndarray, sr: int) -> float:
    """Multi-scale log-mel L1 (the melspec term of AudioCraft-style
    reconstruction metrics)."""
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    dists = []
    for n_fft in (512, 1024, 2048):
        ma, mb = log_mel(a, sr, n_fft), log_mel(b, sr, n_fft)
        tmin = min(ma.shape[1], mb.shape[1])
        dists.append(float(np.mean(np.abs(ma[:, :tmin] - mb[:, :tmin]))))
    return float(np.mean(dists))


def si_snr(est: np.ndarray, ref: np.ndarray) -> float:
    n = min(len(est), len(ref))
    est, ref = est[:n] - est[:n].mean(), ref[:n] - ref[:n].mean()
    s = (np.dot(est, ref) / (np.dot(ref, ref) + 1e-9)) * ref
    e = est - s
    return float(10 * np.log10((np.dot(s, s) + 1e-9) / (np.dot(e, e) + 1e-9)))


def evaluate_pair(gen_path: Path, ref_path: Path) -> dict:
    g, gsr = read_wav(gen_path)
    r, rsr = read_wav(ref_path)
    g, r = g[0], r[0]
    if gsr != rsr:
        r = resample_poly(r, rsr, gsr)
    return {
        "melspec_l1": spectral_distance(g, r, gsr),
        "si_snr_db": si_snr(g, r),
        "loudness_delta_lufs": float(
            integrated_loudness(g, gsr) - integrated_loudness(r, gsr)
        ),
    }


def make_embedder(name: str, ckpt: "str | None" = None):
    """Named FAD embedders behind the pluggable interface
    (``vaura_tpu.ops.fad``): ``melstats`` is offline/deterministic (not
    comparable to published numbers); ``vggish`` loads a torchvggish
    checkpoint and produces the standard published-FAD embedding."""
    if name == "melstats":
        from vaura_tpu.ops.fad import MelStatsEmbedder

        return MelStatsEmbedder()
    if name == "vggish":
        assert ckpt, "vggish embedder needs --embedder-ckpt vggish.pth"
        from vaura_tpu.ops.vggish import VGGishEmbedder

        return VGGishEmbedder(ckpt)
    if name == "panns":
        assert ckpt, "panns embedder needs --embedder-ckpt Cnn14_mAP=0.431.pth"
        from vaura_tpu.ops.panns import PANNsEmbedder

        return PANNsEmbedder(ckpt)
    raise ValueError(f"unknown embedder {name!r}")


def evaluate_dirs(
    generated_dir: Path,
    reference_dir: Path,
    fad: bool = False,
    embedder: str = "melstats",
    embedder_ckpt: "str | None" = None,
) -> dict:
    """Pairwise metrics over ``<stem>.wav`` pairs + optional set-level FAD
    with a named embedder. Returns ``{"per_file", "mean", "n"}``."""
    results = {}
    gen_embs, ref_embs = [], []
    gen_probs, ref_probs = [], []
    emb = make_embedder(embedder, embedder_ckpt) if fad else None

    def _rows(e):
        e = np.asarray(e)
        return e[None] if e.ndim == 1 else e  # embedders may emit [N, D]

    for gen in sorted(Path(generated_dir).glob("*.wav")):
        ref = Path(reference_dir) / gen.name
        if not ref.exists():
            logger.warning("no reference for %s", gen.name)
            continue
        results[gen.stem] = evaluate_pair(gen, ref)
        if emb is not None:
            g, gsr = read_wav(gen)
            r, rsr = read_wav(ref)
            gen_embs.append(_rows(emb(g[0], gsr)))
            if getattr(emb, "last_probs", None) is not None:
                gen_probs.append(emb.last_probs)
            ref_embs.append(_rows(emb(r[0], rsr)))
            if getattr(emb, "last_probs", None) is not None:
                ref_probs.append(emb.last_probs)
    if not results:
        return {"per_file": {}, "mean": {}, "n": 0}
    agg = {
        key: float(np.mean([r[key] for r in results.values()]))
        for key in next(iter(results.values()))
    }
    if emb is not None:
        ge = np.concatenate(gen_embs) if gen_embs else np.zeros((0, 1))
        re_ = np.concatenate(ref_embs) if ref_embs else np.zeros((0, 1))
        if len(ge) > 1 and len(re_) > 1:
            from vaura_tpu.ops.fad import frechet_audio_distance

            agg[f"fad_{embedder}"] = frechet_audio_distance(re_, ge)
        if gen_probs and len(gen_probs) == len(ref_probs):
            # paired KLD over classifier posteriors (panns embedder)
            from vaura_tpu.ops.fad import paired_kl_divergence_from_probs

            agg[f"kld_{embedder}"] = paired_kl_divergence_from_probs(
                np.stack(ref_probs), np.stack(gen_probs)
            )
    return {"per_file": results, "mean": agg, "n": len(results)}


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("generated_dir", type=Path)
    ap.add_argument("reference_dir", type=Path)
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument(
        "--fad", action="store_true",
        help="also compute a set-level Frechet Audio Distance with the "
             "embedder chosen by --embedder",
    )
    ap.add_argument(
        "--embedder", choices=["melstats", "vggish", "panns"], default="melstats",
        help="FAD embedding network: melstats (offline, deterministic, "
             "NOT comparable to published numbers), vggish (torchvggish "
             "weights; the standard published-FAD embedding) or panns "
             "(CNN14 checkpoint; also reports paired kld_panns)",
    )
    ap.add_argument("--embedder-ckpt", type=str, default=None)
    ap.add_argument(
        "--platform", type=str, default=None,
        help="force the JAX backend (e.g. cpu) — embedder networks run "
             "through JAX; without this the default backend (possibly an "
             "exclusive TPU) is claimed",
    )
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    report = evaluate_dirs(
        args.generated_dir, args.reference_dir, args.fad,
        embedder=args.embedder, embedder_ckpt=args.embedder_ckpt,
    )
    if report["n"] == 0:
        logger.error("no pairs evaluated")
        return
    print(json.dumps(report["mean"], indent=2))
    if args.out:
        args.out.write_text(json.dumps(report, indent=2))
        logger.info("wrote %s", args.out)


if __name__ == "__main__":
    main()
