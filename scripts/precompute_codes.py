"""Precompute DAC codec tokens for a dataset (one-time offline pass).

The codec is frozen (reference ``vaura_model.py:89-92``), yet the
reference re-encodes every batch's audio on every training step. Measured
on v5e at the flagship config this costs 74 of 274 ms/step (27%);
precomputing the codes once gives **200 ms/step** (+37% training
throughput). This tool runs the encode over a datamodule split and writes
``<clip stem>.codes.npy`` (``[K, T]`` int16) next to (or into ``--out``);
point the dataset at them with ``codes_dir`` and training consumes the
``codes`` batch key directly (``train_forward(codes=...)``).

Usage::

    python scripts/precompute_codes.py CONFIG.yaml --split train \
        [--out codes_dir] [--platform tpu] [--batch 64]
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

logger = logging.getLogger(__name__)


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", type=Path)
    ap.add_argument("--split", default="train",
                    choices=["train", "validation", "test"])
    ap.add_argument("--out", type=Path, default=None,
                    help="output dir (default: alongside each clip)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from vaura_tpu.config import assemble_config
    from vaura_tpu.data import get_datamodule_from_type
    from vaura_tpu.models.factory import build_system, maybe_load_pretrained

    repo = Path(__file__).resolve().parents[1]
    cfg = assemble_config(
        [f"config={args.config}"],
        defaults_path=repo / "configs" / "vaura_defaults.yaml",
        base_dir=repo,
    )
    dl_cfg = dict(cfg["dataloader"])
    dl_cfg["batch_size"] = args.batch
    # we are producing the sidecars; don't let the dataset pre-filter on
    # (or try to load) codes that don't exist yet
    dl_cfg.pop("codes_dir", None)
    if args.split == "train":
        # Train crops are normally re-sampled every epoch; codes encoded
        # from one random crop would mismatch later epochs' frames/audio.
        # Force stable per-clip crops here — training with codes_dir must
        # set the same flag (the dataset enforces it).
        dl_cfg["deterministic_train_crops"] = True
        logger.info(
            "train split: forcing deterministic_train_crops=true so the "
            "precomputed codes align with training crops"
        )
    system = build_system(cfg["model"])
    params = system.init_params(jax.random.PRNGKey(0))
    params = maybe_load_pretrained(params, cfg["model"])

    datamodule = get_datamodule_from_type(dl_cfg["dataset_type"], dl_cfg)
    datamodule.setup(args.split)
    loader = {
        "train": datamodule.train_dataloader,
        "validation": datamodule.val_dataloader,
        "test": datamodule.test_dataloader,
    }[args.split]()

    if args.out:
        args.out.mkdir(parents=True, exist_ok=True)

    encode = jax.jit(
        lambda audio: system.encode_audio(params, audio)
    )
    # crop-parameter manifest: the dataset verifies these at codes_dir load
    # time — codes are only aligned with crops drawn under the same
    # seed/video_length (vggsound.py::_verify_codes_manifest)
    dataset = getattr(datamodule, "datasets", {}).get(args.split)
    manifest = None
    if dataset is not None and hasattr(dataset, "video_len"):
        manifest = json.dumps({
            "seed": int(getattr(dataset, "seed", 0)),
            "video_len": float(dataset.video_len),
            "split": args.split,
            "deterministic_train_crops": bool(
                getattr(dataset, "deterministic_train_crops", False)
            ),
        })
    out_dirs = set()
    n = 0
    for batch in loader:
        audio = np.asarray(batch["audio"], np.float32)
        if audio.ndim == 4:  # clip-partitioned [B, n, 1, T] -> [B, 1, n*T]
            audio = audio.transpose(0, 2, 1, 3).reshape(audio.shape[0], 1, -1)
        codes = np.asarray(encode(jnp.asarray(audio)), np.int16)  # [B, K, T]
        for i, fp in enumerate(batch["meta"]["filepath"]):
            stem = Path(fp).stem
            out_dir = args.out or Path(fp).parent
            np.save(out_dir / f"{stem}.codes.npy", codes[i])
            out_dirs.add(out_dir)
            n += 1
        if args.limit is not None and n >= args.limit:
            break
    if manifest is not None:
        for d in out_dirs:
            (d / f"codes_meta.{args.split}.json").write_text(
                manifest, encoding="utf-8"
            )
    logger.info("wrote %d code files (+%d manifests)", n, len(out_dirs))


if __name__ == "__main__":
    main()
