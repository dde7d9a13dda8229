"""Datamodule registry (reference ``utils/train_utils.py:37-48,73-98``:
``DATALOADER_TYPES`` + ``get_datamodule_from_type``)."""

from __future__ import annotations

from typing import Callable, Dict

from vaura_tpu.data.core import DataLoader, DataModule, Dataset, default_collate
from vaura_tpu.data.dummy import DummyDataModule, DummyDataset


def _lazy(modpath: str, attr: str) -> Callable:
    def factory(**kwargs):
        import importlib

        mod = importlib.import_module(modpath)
        return getattr(mod, attr)(**kwargs)

    return factory


DATALOADER_TYPES: Dict[str, Callable] = {
    "dummy": DummyDataModule,
    "vggsound": _lazy("vaura_tpu.data.vggsound", "VggSoundDataModule"),
    "visualsound": _lazy("vaura_tpu.data.vggsound", "VggSoundDataModule"),
    "audioset": _lazy("vaura_tpu.data.audioset", "AudioSetDataModule"),
    "greatesthit": _lazy("vaura_tpu.data.greatesthit", "GreatestHitDataModule"),
    "video": _lazy("vaura_tpu.data.video_dataset", "VideoDataModule"),
    "vjepa": _lazy("vaura_tpu.data.vjepa", "VJEPADataModule"),
    "vjepa_gen": _lazy("vaura_tpu.data.vjepa", "VJEPAGenDataModule"),
    "motionformer": _lazy("vaura_tpu.data.motionformer_data", "MotionFormerDataModule"),
    "motionformer_gen": _lazy(
        "vaura_tpu.data.motionformer_data", "MotionFormerGenDataModule"
    ),
}


def get_datamodule_from_type(dataset_type: str, cfg: dict) -> DataModule:
    """Build the datamodule named by ``dataset_type`` from a dataloader
    config block (reference ``utils/train_utils.py:73-98``)."""
    if dataset_type not in DATALOADER_TYPES:
        raise ValueError(
            f"Unknown dataset_type {dataset_type!r}; known: "
            f"{sorted(DATALOADER_TYPES)}"
        )
    kwargs = {k: v for k, v in cfg.items() if k != "dataset_type"}
    return DATALOADER_TYPES[dataset_type](**kwargs)


__all__ = [
    "DATALOADER_TYPES",
    "DataLoader",
    "DataModule",
    "Dataset",
    "DummyDataModule",
    "DummyDataset",
    "default_collate",
    "get_datamodule_from_type",
]
