"""TensorBoard observability (scalars, per-codebook groups, audio, video,
histograms).

Equivalent of the reference's TB logging surface
(``utils/train_utils.py:158-171``, ``vaura_model.py:297-317,618-688,
739-773``): train/val/test loss (step + epoch), per-codebook CE with a
custom multiline scalar-group layout, generated-audio clips, conditioned
frames video, and sampled-index histograms. Backed by ``tensorboardX``
(no torch dependency).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    from tensorboardX import SummaryWriter

    _HAVE_TB = True
except Exception:  # pragma: no cover
    SummaryWriter = None
    _HAVE_TB = False


class TBLogger:
    def __init__(self, log_dir: str, experiment_name: str = ""):
        self.enabled = _HAVE_TB
        self.writer = SummaryWriter(str(log_dir)) if _HAVE_TB else None

    def add_custom_scalar_layout(self, num_codebooks: int) -> None:
        """Group per-codebook losses (reference ``vaura_model.py:739-773``)."""
        if not self.enabled:
            return
        layout = {
            "metrics": {
                f"{stage}_loss_per_codebook": [
                    "Multiline",
                    [
                        f"{stage}_loss_per_codebook_{i}"
                        for i in range(num_codebooks)
                    ],
                ]
                for stage in ("train", "val")
            }
        }
        self.writer.add_custom_scalars(layout)

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self.enabled:
            self.writer.add_scalar(tag, float(value), step)

    def scalars_per_codebook(
        self, prefix: str, values: Sequence[float], step: int
    ) -> None:
        for i, v in enumerate(np.asarray(values).tolist()):
            self.scalar(f"{prefix}_{i}", v, step)

    def audio(self, tag: str, wav: np.ndarray, step: int, sample_rate: int) -> None:
        """wav: [T] or [1, T] float in [-1, 1]."""
        if self.enabled:
            wav = np.asarray(wav).reshape(-1, 1)
            self.writer.add_audio(tag, wav, step, sample_rate=sample_rate)

    def video(self, tag: str, frames: np.ndarray, step: int, fps: float) -> None:
        """frames: [T, H, W, C] uint8 or [N, T, C, H, W] float in [0,1]."""
        if not self.enabled:
            return
        frames = np.asarray(frames)
        if frames.ndim == 4:  # [T, H, W, C] -> [1, T, C, H, W]
            frames = frames.transpose(0, 3, 1, 2)[None]
        if frames.dtype != np.uint8:
            frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
        self.writer.add_video(tag, frames, step, fps=int(fps))

    def histogram(self, tag: str, values: np.ndarray, step: int) -> None:
        if self.enabled:
            self.writer.add_histogram(tag, np.asarray(values), step)

    def flush(self) -> None:
        if self.enabled:
            self.writer.flush()

    def close(self) -> None:
        if self.enabled:
            self.writer.close()
