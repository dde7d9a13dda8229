"""Greatest Hits dataset/datamodule (reference
``models/data/greatesthit_dataset.py`` / ``greatesthit_datamodule.py``):
basename-glob file discovery, lazily-fixed eval start points, and
material/motion annotations parsed from the clip filename
(``greatesthit_dataset.py:79-83,135-140,183-197``)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np

from vaura_tpu.data.core import DataLoader, DataModule
from vaura_tpu.data.vggsound import EPS, VggSoundDataModule, VggSoundDataset

logger = logging.getLogger(__name__)


class GreatestHitDataset(VggSoundDataset):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # basename glob within the split list: the preprocessor cuts each
        # source video into multiple `<stem>_denoised_<idx>.mp4` clips
        with self.split_file_path.open(encoding="utf-8") as f:
            stems = [line.strip() for line in f if line.strip()]
        files = []
        for stem in stems:
            files.extend(sorted(self.data_path.glob(f"{Path(stem).stem}*.mp4")))
        if files:
            self.files = files
        self._lazy_start_pts = {}

    def _start_pts(self, path: Path, duration: float) -> float:
        if self.split != "train":
            # lazily fix the eval start point per file so repeated epochs
            # see identical crops (reference greatesthit_dataset.py:135-140)
            if path.name not in self._lazy_start_pts:
                hi = max(duration - self.video_len - EPS, 0.0)
                self._lazy_start_pts[path.name] = float(self._rng.uniform(0, hi))
            return self._lazy_start_pts[path.name]
        return super()._start_pts(path, duration)

    def __getitem__(self, idx: int) -> dict:
        item = super().__getitem__(idx)
        # material/motion meta from the annotation-derived filename
        stem = Path(item["meta"]["filepath"]).stem
        parts = stem.split("_")
        item["meta"]["material"] = parts[-2] if len(parts) >= 2 else ""
        item["meta"]["motion"] = parts[-1] if parts else ""
        return item


class GreatestHitDataModule(VggSoundDataModule):
    dataset_cls = GreatestHitDataset
