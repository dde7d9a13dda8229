"""Demo checkpoint resolution (reference ``utils/demo_utils.py``).

The reference auto-downloads the released V-AURA checkpoint and the
Segment-AVCLIP (Synchformer stage-I) weights (``demo_utils.py:12-14,
56-79``). This environment has no egress, so the helper documents the
URLs, downloads them when the network allows, and otherwise instructs the
user; downloaded torch checkpoints are converted with
``vaura_tpu.models.convert``.
"""

from __future__ import annotations

import logging
import tarfile
import urllib.request
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

# released artifact URLs (reference demo_utils.py:12-14)
VAURA_CKPT_URL = (
    "https://a3s.fi/swift/v1/AUTH_a235c0f452d648828f745589cde1219a"
    "/v-aura-public/v-aura-visual-sound.tar.gz"
)
AVCLIP_CKPT_URL = (
    "https://a3s.fi/swift/v1/AUTH_a235c0f452d648828f745589cde1219a"
    "/sync/sync_models/24-01-04T16-39-21/epoch_best.pt"
)


def download(url: str, dest: Path, chunk: int = 1 << 20) -> Path:
    dest.parent.mkdir(parents=True, exist_ok=True)
    if dest.exists():
        return dest
    logger.info("downloading %s -> %s", url, dest)
    with urllib.request.urlopen(url) as r, open(dest, "wb") as f:
        while True:
            data = r.read(chunk)
            if not data:
                break
            f.write(data)
    return dest


def fetch_demo_checkpoints(cache_dir: str | Path = "./checkpoints") -> dict:
    """Download + extract the released checkpoints; returns paths.
    Raises with instructions when the network is unavailable."""
    cache = Path(cache_dir)
    out = {}
    try:
        tar_path = download(VAURA_CKPT_URL, cache / "v-aura-visual-sound.tar.gz")
        extract_dir = cache / "v-aura-visual-sound"
        if not extract_dir.exists():
            with tarfile.open(tar_path) as tf:
                # "data" filter: refuse absolute paths/links escaping the
                # cache dir (and silences the 3.12+ extraction warning)
                tf.extractall(cache, filter="data")
        # best-val-loss pick over the extracted tree (the reference's
        # resolve_ckpt_demo semantics, demo_utils.py:56-79) — never the
        # alphabetically-first file
        from vaura_tpu.utils.reference_ckpt import resolve_ckpt

        out["vaura_ckpt"] = str(resolve_ckpt(extract_dir))
        out["avclip_ckpt"] = str(
            download(AVCLIP_CKPT_URL, cache / "avclip_epoch_best.pt")
        )
    except Exception as e:
        raise RuntimeError(
            "Could not download demo checkpoints (no network?). Fetch them "
            f"manually:\n  {VAURA_CKPT_URL}\n  {AVCLIP_CKPT_URL}\n"
            "then convert with scripts/convert_checkpoints.py and pass "
            "--ckpt to demo.py."
        ) from e
    return out


def load_demo_model(cache_dir: str | Path = "./checkpoints"):
    """Download (or reuse) the released checkpoints and hand off to the
    reference-experiment loader: returns ``(model_cfg, params_tree,
    ckpt_path)`` ready for ``build_system`` (the reference's
    ``resolve_ckpt_demo`` + ``load_from_checkpoint`` flow,
    ``demo_utils.py:56-102``, in one call). Works identically on a
    manually downloaded + extracted tree."""
    from vaura_tpu.utils.reference_ckpt import load_reference_experiment

    ckpts = fetch_demo_checkpoints(cache_dir)
    assert ckpts.get("vaura_ckpt"), "no .ckpt found in the downloaded tar"
    return load_reference_experiment(ckpts["vaura_ckpt"])
