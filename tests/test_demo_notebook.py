"""demo.ipynb is a real executable walkthrough (reference demo.ipynb
cells 1-8), not a shim: execute every code cell top-to-bottom with the
CPU-safe smoke preset and assert the artifacts and invariants the
markdown promises."""

import json
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _code_cells() -> list:
    nb = json.loads((REPO / "demo.ipynb").read_text())
    out = []
    for c in nb["cells"]:
        if c["cell_type"] != "code":
            continue
        src = c["source"]
        out.append("".join(src) if isinstance(src, list) else src)
    return out


def test_notebook_structure():
    nb = json.loads((REPO / "demo.ipynb").read_text())
    md = "\n".join(
        "".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "markdown"
    )
    # the reference walkthrough's steps are all present as sections
    for section in (
        "dataloader", "Visual features", "Single-chunk generation",
        "Chunked generation", "Streaming", "Mux",
    ):
        assert section in md, f"missing walkthrough section {section!r}"
    assert len(_code_cells()) >= 8


@pytest.mark.slow
def test_demo_notebook_smoke_executes(tmp_path, monkeypatch):
    monkeypatch.chdir(REPO)  # flagship cells resolve repo-relative paths
    cells = _code_cells()
    g: dict = {"__name__": "__demo_nb__"}
    exec(compile(cells[0], "nb-cell-0", "exec"), g)
    g.update(PRESET="smoke", PLATFORM=None, OUT=str(tmp_path / "out"))
    for i, src in enumerate(cells[1:], start=1):
        exec(compile(src, f"nb-cell-{i}", "exec"), g)
    out = tmp_path / "out"
    assert (out / "generated.wav").exists()
    assert (out / "generated.mp4").exists()
    # streamed increments concatenate exactly to the one-shot long waveform
    # (increments are [B, T]; the one-shot decode is [B, 1, T])
    assert g["streamed"].size == g["wav_long"].size
    assert g["codes"].shape[-1] == g["n_tokens"]
