"""precompute_codes CLI: one offline encode pass writes {stem}.codes.npy
files whose geometry matches the system's codec (the codes_dir ->
`codes` batch-key consumption is covered in test_vggsound_integration)."""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_precompute_codes_cli(tmp_path, monkeypatch):
    from scripts.precompute_codes import main

    out = tmp_path / "codes"
    monkeypatch.setattr(
        sys, "argv",
        [
            "precompute_codes.py",
            str(REPO / "configs/experiments/dummy.yaml"),
            "--split", "validation",
            "--out", str(out),
            "--batch", "2",
            "--limit", "4",
        ],
    )
    main()
    files = sorted(out.glob("*.codes.npy"))
    assert len(files) >= 4
    codes = np.load(files[0])
    assert codes.dtype == np.int16
    # dummy codec: 3 codebooks; token count = audio_len / hop
    assert codes.ndim == 2 and codes.shape[0] == 3 and codes.shape[1] > 0
    assert codes.min() >= 0
