"""Data-layer tests: loader determinism/prefetch, dummy dataset contract,
clip partitioning, segment transform, JSONL metadata round trip."""

import json

import numpy as np
import pytest

from vaura_tpu.data.core import DataLoader, default_collate
from vaura_tpu.data.dummy import DummyDataModule, DummyDataset
from vaura_tpu.data.transforms import GenerateMultipleSegments
from vaura_tpu.data.video_dataset import VideoMeta, load_video_meta
from vaura_tpu.data.vjepa import get_clip_indices, partition_audio, partition_video


def test_dummy_dataset_shapes():
    ds = DummyDataset("train", frame_shape=(32, 32), sample_rate_audio=400)
    assert len(ds) == 666
    item = ds[3]
    assert item["frames"].shape == (4, 3, 16, 32, 32)
    assert (item["frames"] == 3.0).all()
    assert item["audio"].shape == (1, int(np.ceil(2.56 * 400)))
    assert item["meta"]["clip_indices"].shape == (4, 16)


def test_dummy_eval_split_size():
    assert len(DummyDataset("validation")) == 66


def test_loader_shuffle_deterministic():
    ds = DummyDataset("train", frame_shape=(8, 8), sample_rate_audio=100)
    l1 = DataLoader(ds, 4, shuffle=True, seed=7)
    l2 = DataLoader(ds, 4, shuffle=True, seed=7)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["frames"], b2["frames"])
    l1.set_epoch(1)
    b3 = next(iter(l1))
    assert not np.array_equal(b1["frames"], b3["frames"])  # epoch reshuffle


def test_loader_threaded_matches_sync():
    ds = DummyDataset("validation", frame_shape=(8, 8), sample_rate_audio=100)
    sync = list(DataLoader(ds, 8, num_workers=0))
    threaded = list(DataLoader(ds, 8, num_workers=3))
    assert len(sync) == len(threaded) == 66 // 8
    for a, b in zip(sync, threaded):
        np.testing.assert_array_equal(a["frames"], b["frames"])


def test_loader_process_workers_match_sync():
    ds = DummyDataset("validation", frame_shape=(8, 8), sample_rate_audio=100)
    sync = list(DataLoader(ds, 8, num_workers=0))
    procs = list(
        DataLoader(ds, 8, num_workers=2, worker_type="process", prefetch=1)
    )
    assert len(sync) == len(procs)
    for a, b in zip(sync, procs):
        np.testing.assert_array_equal(a["frames"], b["frames"])
        assert a["meta"]["filepath"] == b["meta"]["filepath"]


def test_loader_process_worker_error_propagates():
    import pytest

    class Exploding(DummyDataset):
        def __getitem__(self, idx):
            if idx == 3:
                raise ValueError("boom at 3")
            return super().__getitem__(idx)

    ds = Exploding("validation", frame_shape=(8, 8), sample_rate_audio=100)
    loader = DataLoader(
        ds, 2, num_workers=2, worker_type="process", shuffle=False
    )
    with pytest.raises(RuntimeError, match="boom at 3"):
        list(loader)


def test_loader_threaded_backpressure_completes():
    # prefetch=1 with more batches than the in-flight window: must not
    # deadlock and must stay ordered
    ds = DummyDataset("validation", frame_shape=(8, 8), sample_rate_audio=100)
    out = list(DataLoader(ds, 4, num_workers=2, prefetch=1))
    ref = list(DataLoader(ds, 4, num_workers=0))
    assert len(out) == len(ref)
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(a["frames"], b["frames"])


def test_loader_drop_last():
    ds = DummyDataset("validation", frame_shape=(8, 8), sample_rate_audio=100)
    assert len(DataLoader(ds, 7, drop_last=True)) == 66 // 7
    assert len(DataLoader(ds, 7, drop_last=False)) == -(-66 // 7)


def test_collate_meta_strings_stay_lists():
    items = [
        {"x": np.ones(3), "meta": {"filepath": f"/f/{i}.mp4", "n": i}}
        for i in range(2)
    ]
    batch = default_collate(items)
    assert batch["x"].shape == (2, 3)
    assert batch["meta"]["filepath"] == ["/f/0.mp4", "/f/1.mp4"]
    assert batch["meta"]["n"].tolist() == [0, 1]


def test_partition_video_and_audio():
    video = np.arange(3 * 32 * 2 * 2).reshape(3, 32, 2, 2)
    clips = partition_video(video, frames_per_clip=16, frame_step=1, num_clips=2)
    assert clips.shape == (2, 3, 16, 2, 2)
    np.testing.assert_array_equal(clips[1], video[:, 16:32])
    audio = np.arange(2 * 1000).reshape(2, 1000).astype(np.float32)[:1]
    aclips = partition_audio(audio, 16, 1, vfps=25.0, afps=400, num_clips=2)
    assert aclips.shape == (2, 1, int(16 / 25 * 400))


def test_get_clip_indices_monotonic():
    idx = get_clip_indices(64, num_clips=4, frames_per_clip=16, frame_step=1)
    assert idx.shape == (4, 16)
    assert (np.diff(idx.ravel()) >= 0).all()
    assert idx.max() < 64


def test_segment_transform_centered():
    tr = GenerateMultipleSegments(segment_size_vframes=16, n_segments=2)
    item = {
        "video": np.arange(48)[:, None].repeat(3, 1).reshape(48, 3),
        "meta": {"video": {"fps": [25]}, "audio": {"framerate": [400]}},
    }
    out = tr(item)
    assert out["video"].shape == (2, 16, 3)
    # centered window: (48 - 32) // 2 = 8
    assert out["video"][0, 0, 0] == 8


def test_video_meta_jsonl_roundtrip(tmp_path):
    metas = [
        VideoMeta(filepath=f"/v/{i}.mp4", duration=10.0 + i, video_fps=25.0,
                  audio_fps=44100)
        for i in range(3)
    ]
    p = tmp_path / "data.jsonl"
    with open(p, "w") as f:
        for m in metas:
            f.write(json.dumps(m.to_dict()) + "\n")
    back = load_video_meta(p)
    assert [m.filepath for m in back] == [m.filepath for m in metas]
    assert back[2].duration == 12.0


def test_dummy_datamodule_batches():
    dm = DummyDataModule(batch_size=2, frame_shape=(8, 8), sample_rate_audio=100)
    dm.setup()
    batch = next(iter(dm.train_dataloader()))
    assert batch["frames"].shape[0] == 2
    assert batch["audio"].shape == (2, 1, 256)
    pred = next(iter(dm.predict_dataloader()))
    assert pred["frames"].shape[0] == 1
