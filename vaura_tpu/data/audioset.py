"""AudioSet dataset/datamodule (reference ``models/data/audioset_dataset.py``
/ ``audioset_datamodule.py``): same shape as VGGSound plus a multi-label
CSV (``audioset_dataset.py:87-92``)."""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Optional

from vaura_tpu.data.core import DataLoader, DataModule
from vaura_tpu.data.vggsound import VggSoundDataModule, VggSoundDataset


class AudioSetDataset(VggSoundDataset):
    def __init__(self, *args, label_csv_path: Optional[str] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.video2labels = {}
        if label_csv_path:
            with open(label_csv_path, encoding="utf-8") as f:
                for row in csv.reader(f):
                    if len(row) >= 2:
                        self.video2labels[Path(row[0]).stem] = row[1].split(";")

    def __getitem__(self, idx: int) -> dict:
        item = super().__getitem__(idx)
        stem = Path(item["meta"]["filepath"]).stem
        item["meta"]["labels"] = ";".join(self.video2labels.get(stem, []))
        return item


class AudioSetDataModule(VggSoundDataModule):
    dataset_cls = AudioSetDataset
