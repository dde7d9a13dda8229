"""Family-A dataset integration test: synthesize tiny MP4s with the native
media module, build split/meta files, and load through VggSoundDataset —
covering the split/meta plumbing, fixed start points, ImageBind/insync
filtering, and clip partitioning end to end."""

import csv
import json

import numpy as np
import pytest

from vaura_tpu.data import media
from vaura_tpu.data.vggsound import VggSoundDataModule, VggSoundDataset

pytestmark = pytest.mark.skipif(
    not media.available(), reason="native media module unavailable"
)


@pytest.fixture(scope="module")
def vgg_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("vgg")
    data_dir = root / "videos"
    data_dir.mkdir()
    sr = 44100
    rng = np.random.default_rng(0)
    # reference-conformant clip naming: {video_id}_{start_ms}_{end_ms}
    # (vggsound_dataset.py:126-133 builds the split membership from the
    # meta rows as f"{id}_{start*1000}_{(start+10)*1000}")
    names = [f"vid{i}_0_10000" for i in range(3)]
    for i, name in enumerate(names):
        n, h, w = 40, 64, 64  # 1.6 s at 25 fps
        frames = rng.integers(0, 255, size=(n, h, w, 3), dtype=np.uint8)
        audio = (rng.standard_normal(int(1.6 * sr)) * 0.1).astype(np.float32)
        media.write_video(
            data_dir / f"{name}.mp4", frames, fps=25.0, audio=audio,
            audio_sample_rate=sr,
        )
    split_dir = root / "splits" / "vggsound"
    split_dir.mkdir(parents=True)
    for split in ("train", "test"):
        (split_dir / f"vggsound_{split}.txt").write_text(
            "\n".join(names) + "\n"
        )
    meta = root / "meta.csv"
    with open(meta, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["id", "start", "label"])
        for i, name in enumerate(names):
            w.writerow([name.rsplit("_", 2)[0], 0, f"class_{i % 2}"])
    # fixed start points for eval
    fsp = root / "fixed.csv"
    with open(fsp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file", "start_sec"])  # test_sets CSV schema
        w.writerow(["vid0_0_10000", 0.2])
    return {
        "root": root,
        "data": data_dir,
        "splits": split_dir,
        "meta": meta,
        "fixed": fsp,
        "names": names,
    }


def _dataset(vgg_root, split="train", **kw):
    return VggSoundDataset(
        split=split,
        split_dir_path=vgg_root["splits"],
        data_path=vgg_root["data"],
        meta_path=vgg_root["meta"],
        video_length=0.64,
        sample_rate_audio=44100,
        sample_rate_video=25.0,
        frames_per_clip=16,
        num_clips=1,
        run_additional_checks=False,
        seed=0,
        **kw,
    )


def test_item_contract(vgg_root):
    ds = _dataset(vgg_root)
    assert len(ds) == 3
    item = ds[0]
    assert item["frames"].shape == (1, 3, 16, 64, 64)
    assert item["frames"].dtype == np.float32
    assert item["audio"].shape == (1, int(np.ceil(0.64 * 44100)))
    assert item["meta"]["target"] in (0, 1)


def test_fixed_start_pts(vgg_root):
    ds = _dataset(vgg_root, split="test",
                  fixed_start_pts_file_path=vgg_root["fixed"])
    # clip0 has a pinned 0.2 s start
    idx = [i for i, f in enumerate(ds.files) if f.stem == "vid0_0_10000"][0]
    item = ds[idx]
    assert item["meta"]["start_pts"] == pytest.approx(0.2)


def test_included_filter(vgg_root, tmp_path):
    inc = tmp_path / "included.txt"
    inc.write_text("vid1_0_10000.mp4\n")
    ds = _dataset(vgg_root, included_files_path=inc)
    assert [f.stem for f in ds.files] == ["vid1_0_10000"]


def test_imagebind_filter(vgg_root, tmp_path):
    scores = tmp_path / "ib.json"
    scores.write_text(json.dumps({
        "a/b/vid0_0_10000.mp4": 0.9,  # keys may be full paths (Path(k).stem)
        "vid1_0_10000": 0.1,
        "vid2_0_10000": 0.5,
    }))
    ds = _dataset(
        vgg_root,
        filter_by_imagebind_score=True,
        imagebind_score_threshold=0.4,
        imagebind_score_file_path=str(scores),
    )
    assert sorted(f.stem for f in ds.files) == ["vid0_0_10000", "vid2_0_10000"]


def test_datamodule_batches(vgg_root):
    dm = VggSoundDataModule(
        batch_size=2,
        data_dir=str(vgg_root["data"]),
        split_dir=str(vgg_root["splits"]),
        meta_file=str(vgg_root["meta"]),
        video_length=0.64,
        sample_rate_audio=44100,
        frames_per_clip=16,
        num_clips=1,
        run_additional_checks=False,
    )
    dm.setup()
    batch = next(iter(dm.train_dataloader()))
    assert batch["frames"].shape == (2, 1, 3, 16, 64, 64)
    assert batch["audio"].shape[0] == 2
    assert len(batch["meta"]["filepath"]) == 2


def test_codes_manifest_verification(vgg_root, tmp_path):
    """The codes_meta.<split>.json manifest written by precompute_codes is
    verified at codes_dir load time: mismatched seed (for seed-dependent
    crops) or video_length means the sidecars pair with the wrong
    audio/frames and must be refused, not silently consumed."""
    rng = np.random.default_rng(3)
    for name in vgg_root["names"]:
        np.save(tmp_path / f"{name}.codes.npy",
                rng.integers(0, 17, size=(3, 12)).astype(np.int16))

    def manifest(**kv):
        base = {"seed": 0, "video_len": 0.64, "split": "train",
                "deterministic_train_crops": True}
        base.update(kv)
        (tmp_path / "codes_meta.train.json").write_text(json.dumps(base))

    manifest()
    ds = _dataset(vgg_root, codes_dir=tmp_path,
                  deterministic_train_crops=True)
    assert len(ds) == 3

    manifest(seed=7)
    with pytest.raises(ValueError, match="seed"):
        _dataset(vgg_root, codes_dir=tmp_path,
                 deterministic_train_crops=True)

    manifest(video_len=2.56)
    with pytest.raises(ValueError, match="video_length"):
        _dataset(vgg_root, codes_dir=tmp_path,
                 deterministic_train_crops=True)

    # eval splits ignore a seed mismatch (fixed-start CSV crops) but not a
    # video_length mismatch
    (tmp_path / "codes_meta.train.json").unlink()
    (tmp_path / "codes_meta.test.json").write_text(json.dumps(
        {"seed": 99, "video_len": 0.64, "split": "test"}
    ))
    _dataset(vgg_root, split="test", codes_dir=tmp_path)


@pytest.mark.slow
def test_precomputed_codes_batch_and_train_step(vgg_root, tmp_path):
    """codes_dir plumbs precomputed DAC tokens into batches, and the train
    step consumes the `codes` key instead of re-encoding the frozen codec
    every step (measured 274->200 ms/step at flagship on v5e)."""
    import jax
    import jax.numpy as jnp

    K, T = 3, 12
    rng = np.random.default_rng(9)
    for name in vgg_root["names"]:
        np.save(tmp_path / f"{name}.codes.npy",
                rng.integers(0, 17, size=(K, T)).astype(np.int16))
    # random train crops + codes_dir is refused (crop/code mismatch);
    # deterministic_train_crops aligns precompute with training
    with pytest.raises(ValueError, match="deterministic_train_crops"):
        _dataset(vgg_root, codes_dir=tmp_path)
    ds = _dataset(vgg_root, codes_dir=tmp_path,
                  deterministic_train_crops=True)
    item = ds[0]
    assert item["codes"].shape == (K, T) and item["codes"].dtype == np.int32
    # the deterministic crop is stable across dataset instances
    ds2 = _dataset(vgg_root, codes_dir=tmp_path,
                   deterministic_train_crops=True)
    p = ds.files[0]
    assert ds._start_pts(p, 10.0) == ds2._start_pts(p, 10.0)

    # a missing sidecar drops the clip at init (consistent batch key set)
    (tmp_path / f"{vgg_root['names'][0]}.codes.npy").unlink()
    ds_drop = _dataset(vgg_root, codes_dir=tmp_path,
                       deterministic_train_crops=True)
    assert len(ds_drop) == len(ds) - 1
    np.save(tmp_path / f"{vgg_root['names'][0]}.codes.npy",
            rng.integers(0, 17, size=(K, T)).astype(np.int16))

    from vaura_tpu.data.core import DataLoader

    batch = next(iter(DataLoader(ds, 2)))
    assert batch["codes"].shape == (2, K, T)

    # the train step prefers batch codes over audio
    import sys as _s
    _s.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_lora import DAC_TINY, TINY

    from vaura_tpu.models.vaura import VauraSystem
    from vaura_tpu.train.state import TrainState, make_optimizer
    from vaura_tpu.train.steps import make_train_step, split_params

    sys_ = VauraSystem(sampler_config=TINY, dac_config=DAC_TINY,
                       encoder_config=None, use_visual_conditioning=True)
    params = sys_.init_params(jax.random.PRNGKey(0))
    trainable, frozen = split_params(sys_, params)
    state = TrainState.create(trainable, make_optimizer(1e-3))
    step = make_train_step(sys_, donate=False)
    train_batch = {
        "frames": jnp.asarray(
            rng.standard_normal((2, 4, 768)).astype(np.float32)
        ),
        "codes": jnp.asarray(batch["codes"]),
        # no "audio" key at all: codes path must not require it
    }
    state2, metrics = step(state, frozen, train_batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
