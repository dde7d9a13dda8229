"""Checkpoint conversion CLI: torch reference checkpoints -> orbax trees.

Supports:
  * full V-AURA Lightning ``.ckpt`` (sampler + frozen DAC + AVCLIP encoder)
  * descript-audio-codec ``.pth`` weights
  * Synchformer stage-I AVCLIP ``.pt`` / Motionformer ``.pyth`` checkpoints

Usage::

    python scripts/convert_checkpoints.py vaura  model.ckpt  out_dir/
    python scripts/convert_checkpoints.py dac    weights.pth out_dir/
    python scripts/convert_checkpoints.py avclip ckpt.pt     out_dir/
"""

from __future__ import annotations

if __package__ in (None, ""):  # direct `python scripts/X.py` invocation
    import sys as _sys
    from pathlib import Path as _P

    _sys.path.insert(0, str(_P(__file__).resolve().parents[1]))

import argparse
import logging
from pathlib import Path

logger = logging.getLogger(__name__)


def save_tree(tree: dict, out_dir: Path) -> None:
    import orbax.checkpoint as ocp

    out_dir = Path(out_dir).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out_dir, tree)
    ckptr.wait_until_finished()
    logger.info("saved converted params to %s", out_dir)


def main() -> None:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("kind", choices=["vaura", "dac", "avclip", "motionformer"])
    ap.add_argument("src", type=Path)
    ap.add_argument("out", type=Path)
    ap.add_argument("--num-layers", type=int, default=None,
                    help="default: inferred from the state dict")
    ap.add_argument("--num-codebooks", type=int, default=None,
                    help="default: inferred from the state dict")
    ap.add_argument("--encoder-depth", type=int, default=None,
                    help="default: inferred from the state dict")
    ap.add_argument("--platform", type=str, default=None,
                    help="jax platform override (e.g. cpu; conversion "
                         "never needs the TPU and a bare run on a TPU box "
                         "claims the exclusive chip)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", str(args.platform))
    import torch

    from vaura_tpu.models import convert as C

    if args.kind == "vaura":
        tree = C.convert_vaura_checkpoint(
            str(args.src),
            num_layers=args.num_layers,
            num_codebooks=args.num_codebooks,
            encoder_depth=args.encoder_depth,
        )
    elif args.kind == "dac":
        ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        if "metadata" in ckpt and "state_dict" in ckpt:
            sd = ckpt["state_dict"]
        tree = {"dac": C.convert_dac_state_dict(sd, n_codebooks=args.num_codebooks)}
    else:  # avclip / motionformer
        ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt.get("model_state", ckpt))
        sd = C.strip_avclip_prefix(sd)
        tree = {
            "encoder": C.convert_motionformer_state_dict(
                sd, depth=args.encoder_depth
            )
        }
    save_tree(tree, args.out)


if __name__ == "__main__":
    main()
