"""The shipped data assets (data/splits, data/meta, data/test_sets — carried
from the reference distribution) drive the real ingestion paths:

* dataset construction from the REAL visualsound split + meta CSV
  (meta ∩ split membership, reference vggsound_dataset.py:126-133)
* fixed eval start points from the REAL test_sets CSVs
  (reference :91-101,205-214)
* schema checks on every shipped asset family
* ImageBind / in-sync exclusion formats (golden fixtures in the documented
  schema — the reference's own copies are git-LFS-only upstream)
"""

import csv
import json
from pathlib import Path

import pytest

from vaura_tpu.data.vggsound import VggSoundDataset

REPO = Path(__file__).resolve().parents[1]
DATA = REPO / "data"


def _read_split(path: Path) -> list:
    return [l.strip() for l in path.read_text().splitlines() if l.strip()]


# --------------------------------------------------------------------- #
# schema checks on the shipped files
# --------------------------------------------------------------------- #
@pytest.mark.parametrize("ds", ["vggsound", "visualsound", "audioset", "greatesthit"])
def test_split_lists_shipped_and_nonempty(ds):
    d = DATA / "splits" / ds
    for split in ("train", "validation", "test", "predict"):
        f = d / f"{ds}_{split}.txt"
        if not f.exists():
            # audioset_train.txt is git-LFS-only upstream (data/README.md)
            assert (ds, split) == ("audioset", "train"), f"missing {f}"
            continue
        names = _read_split(f)
        assert names, f"{ds}_{split}.txt empty"
        if ds != "greatesthit":  # greatesthit uses basenames, others clip ids
            name = names[0]
            ms = name.rsplit("_", 2)
            assert len(ms) == 3 and ms[1].isdigit() and ms[2].isdigit(), name


def test_visualsound_meta_schema():
    with (DATA / "meta/visualsound/visualsound.csv").open() as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["filename", "start", "desc", "split"]
    assert len(rows) > 10000
    assert all(float(r[1]) >= 0 for r in rows[1:100])


def test_fixed_start_sets_schema_and_membership():
    """Every fixed-start row names a clip from the matching test split —
    the shipped assets are mutually consistent."""
    for name, split_file in (
        ("vggsound_test.csv", DATA / "splits/vggsound/vggsound_test.txt"),
        ("visualsound.csv", DATA / "splits/visualsound/visualsound_test.txt"),
    ):
        with (DATA / "test_sets" / name).open() as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["file", "start_sec"]
        starts = {r[0]: float(r[1]) for r in rows[1:]}
        assert starts and all(0 <= v <= 10 for v in starts.values())
        members = set(_read_split(split_file))
        missing = set(starts) - members
        assert not missing, f"{name}: {len(missing)} rows not in split"


def test_greatesthit_meta_schema():
    with (DATA / "meta/greatesthit/greatesthit.csv").open() as f:
        rows = list(csv.reader(f))
    assert rows[0][:4] == ["filename", "start_time", "occurring_time", "end_time"]
    assert rows[0][4:] == ["material", "action_type", "effect"]
    assert len(rows) > 1000


def test_audioset_labels_schema():
    with (DATA / "meta/audioset/audioset_labels.csv").open() as f:
        rows = list(csv.reader(f))
    # index, MID, display name (no header) — reference audioset label map
    assert rows[0][0] == "0" and rows[0][1].startswith("/m/")
    assert len(rows) > 500


# --------------------------------------------------------------------- #
# real-asset dataset construction (no media needed)
# --------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def visualsound_test_ds(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("vs_videos")  # empty: construction only
    return VggSoundDataset(
        split="test",
        split_dir_path=DATA / "splits" / "visualsound",
        data_path=data_dir,
        meta_path=DATA / "meta/visualsound/visualsound.csv",
        fixed_start_pts_file_path=DATA / "test_sets/visualsound.csv",
        video_length=2.56,
        run_additional_checks=False,
    )


def test_visualsound_split_meta_intersection(visualsound_test_ds):
    ds = visualsound_test_ds
    split_names = set(
        _read_split(DATA / "splits/visualsound/visualsound_test.txt")
    )
    assert 0 < len(ds) <= len(split_names)
    # every retained clip is split-member AND meta-derivable
    for f in ds.files[:50]:
        assert f.stem in split_names
        assert f.stem.rsplit("_", 2)[0] in ds.video2target


def test_visualsound_fixed_eval_crops(visualsound_test_ds):
    """The reference's published eval conditions: each test clip gets its
    pinned start second from test_sets/visualsound.csv."""
    ds = visualsound_test_ds
    with (DATA / "test_sets/visualsound.csv").open() as f:
        rows = list(csv.reader(f))[1:]
    pinned = {r[0]: float(r[1]) for r in rows}
    covered = [f for f in ds.files if f.stem in pinned]
    assert covered, "no test clip has a pinned start"
    for f in covered[:20]:
        assert ds._start_pts(f, duration=10.0) == pytest.approx(pinned[f.stem])


def test_visualsound_labels_resolved(visualsound_test_ds):
    ds = visualsound_test_ds
    from vaura_tpu.data.vggsound import _clip_id

    targets = [ds.video2target.get(_clip_id(f.stem), -1) for f in ds.files[:200]]
    assert all(t >= 0 for t in targets), "unresolved labels in test split"
    assert len(ds.label2target) > 100  # VGGSound-style class inventory


# --------------------------------------------------------------------- #
# exclusion formats (golden fixtures; upstream files are LFS-only)
# --------------------------------------------------------------------- #
def test_imagebind_exclusion_on_real_split(tmp_path):
    names = _read_split(DATA / "splits/visualsound/visualsound_test.txt")[:4]
    scores = {f"some/dir/{names[0]}.mp4": 0.05, names[1]: 0.9}
    p = tmp_path / "imagebind_scores.json"
    p.write_text(json.dumps(scores))
    ds = VggSoundDataset(
        split="test",
        split_dir_path=DATA / "splits" / "visualsound",
        data_path=tmp_path,
        meta_path=DATA / "meta/visualsound/visualsound.csv",
        filter_by_imagebind_score=True,
        imagebind_score_threshold=0.2,
        imagebind_score_file_path=str(p),
        run_additional_checks=False,
    )
    stems = {f.stem for f in ds.files}
    assert names[0] not in stems  # scored 0.05 < 0.2 -> excluded
    assert names[1] in stems  # scored 0.9 -> kept


# --------------------------------------------------------------------- #
# bundled demo / VAS / ImageBind assets (upstream: git-LFS-only; shipped
# here as schema-identical synthetic stand-ins, scripts/make_demo_assets.py)
# --------------------------------------------------------------------- #
DEMO_CLIPS = (
    "76UZQRJq028_181000_191000.mp4",
    "Vi7kQhNcaOs_114000_124000.mp4",
    "xK-7W3ZPd3o_94000_104000.mp4",
)


def test_demo_assets_shipped():
    d = DATA / "demo"
    for name in DEMO_CLIPS:
        f = d / name
        assert f.exists() and f.stat().st_size > 50_000, f
    assert (d / "dataloader_config.yaml").exists()
    lines = (d / "test" / "data.jsonl").read_text().splitlines()
    assert len(lines) == len(DEMO_CLIPS)
    for ln in lines:
        meta = json.loads(ln)
        p = REPO / meta["filepath"]
        assert p.exists(), p
        assert meta["duration"] > 5.0
        assert meta["video_codec_name"] == "h264"
        assert meta["audio_codec_name"] == "aac"


def test_vas_assets_shipped_and_resolvable():
    lines = (DATA / "vas" / "test" / "data.jsonl").read_text().splitlines()
    assert len(lines) >= 4
    for ln in lines:
        meta = json.loads(ln)
        assert (REPO / meta["filepath"]).exists()
    # the generate_vas config points test_meta at the dataset ROOT; the
    # datamodule appends the split subdir (reference
    # video_datamodule.py:87-90)
    from vaura_tpu.data.video_dataset import VideoDataModule

    dm = VideoDataModule(batch_size=1, test_meta=str(DATA / "vas"))
    dm.setup("test")
    assert len(dm.datasets["test"]) >= 4


def test_demo_dataloader_config_loads_one_item():
    """data/demo/dataloader_config.yaml drives the real on-the-fly
    resample path (30 fps / 48 kHz clips -> 25 fps / 44.1 kHz mono)."""
    import numpy as np
    import yaml

    from vaura_tpu.data import get_datamodule_from_type

    cfg = yaml.safe_load((DATA / "demo" / "dataloader_config.yaml").read_text())
    cfg.pop("dataset_to_use", None)
    dm = get_datamodule_from_type(cfg.pop("dataset_type"), cfg)
    dm.setup("test")
    item = next(iter(dm.test_dataloader()))
    frames, audio = np.asarray(item["frames"]), np.asarray(item["audio"])
    assert frames.shape[1:] == (4, 3, 16, 224, 224)  # 4 segs x 16f @ 224^2
    assert audio.shape[-1] == int(2.56 * 44100)
    assert frames.dtype == np.float32


def test_shipped_imagebind_scores_schema():
    d = DATA / "excluded_files"
    raw = json.loads(
        (d / "filtered_examples_vggsound" / "imagebind_scores.json").read_text()
    )
    norm = json.loads(
        (d / "filtered_examples_vggsound" / "imagebind_scores_norm.json").read_text()
    )
    assert set(raw) == set(norm) and len(raw) > 10_000
    assert all(0.0 <= v <= 1.0 for v in list(norm.values())[:1000])
    # norm covers the full [0,1] range (min-max normalized)
    vals = list(norm.values())
    assert min(vals) == 0.0 and max(vals) == 1.0
    # keys are split members (scores cover the shipped split lists)
    members = set(_read_split(DATA / "splits/vggsound/vggsound_test.txt"))
    assert members & set(raw)
    aud = json.loads(
        (d / "filtered_examples_audioset" / "imagebind_scores_audioset.json").read_text()
    )
    assert len(aud) > 10_000


def test_insync_exclusion_on_real_split(tmp_path):
    names = _read_split(DATA / "splits/visualsound/visualsound_test.txt")[:3]
    # documented header-less format: vid,offset,vstart,is_correct,is_tol
    rows = []
    for i in range(10):
        rows.append([names[0], "0.0", "1.0", "1", "1"])  # sum=10 >= 5 keep
        rows.append([names[1], "0.0", "1.0", "0", "0"])  # sum=0 < 5 drop
    p = tmp_path / "insync_test.csv"
    p.write_text("\n".join(",".join(r) for r in rows))
    ds = VggSoundDataset(
        split="test",
        split_dir_path=DATA / "splits" / "visualsound",
        data_path=tmp_path,
        meta_path=DATA / "meta/visualsound/visualsound.csv",
        filter_by_insync=True,
        insync_file_path=str(p),
        insync_filter_key="is_correct",
        insync_filter_threshold=-1,  # -> eval default 5
        run_additional_checks=False,
    )
    stems = {f.stem for f in ds.files}
    assert names[0] in stems
    assert names[1] not in stems
    # names[2] has no insync rows at all -> kept (only measured vids excludable)
    assert names[2] in stems
