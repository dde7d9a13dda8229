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
        """wav: [T] or [1, T] float in [-1, 1].

        Emits the Summary.Audio proto directly with WAV bytes from our
        own encoder: tensorboardX's ``add_audio`` imports ``soundfile``
        (a libsndfile binding not present in this image), so the
        convenience API raises and the reference-parity audio logging
        (``vaura_model.py:618-636``) would silently degrade.
        """
        if not self.enabled:
            return
        import io

        from tensorboardX.proto.summary_pb2 import Summary

        from vaura_tpu.ops.audio import write_wav

        wav = np.asarray(wav, np.float32).reshape(1, -1)
        buf = io.BytesIO()
        write_wav(buf, wav, sample_rate)
        audio = Summary.Audio(
            sample_rate=float(sample_rate),
            num_channels=1,
            length_frames=wav.shape[-1],
            encoded_audio_string=buf.getvalue(),
            content_type="audio/wav",
        )
        self.writer._get_file_writer().add_summary(
            Summary(value=[Summary.Value(tag=tag, audio=audio)]), step
        )

    def video(self, tag: str, frames: np.ndarray, step: int, fps: float) -> None:
        """frames: [T, H, W, C] uint8 or [N, T, C, H, W] float in [0,1].

        Animated-GIF image summary built with PIL (exactly what
        tensorboardX's ``add_video`` produces, but without its moviepy
        dependency, absent from this image).
        """
        if not self.enabled:
            return
        import io

        from PIL import Image
        from tensorboardX.proto.summary_pb2 import Summary

        frames = np.asarray(frames)
        if frames.ndim == 5:  # [N, T, C, H, W] -> first clip, [T, H, W, C]
            frames = frames[0].transpose(0, 2, 3, 1)
        if frames.dtype != np.uint8:
            frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
        if frames.shape[-1] == 1:
            frames = np.repeat(frames, 3, axis=-1)
        ims = [Image.fromarray(f) for f in frames]
        buf = io.BytesIO()
        ims[0].save(
            buf, format="GIF", save_all=True, append_images=ims[1:],
            duration=max(1, int(1000 / max(fps, 1e-3))), loop=0,
        )
        h, w = frames.shape[1:3]
        img = Summary.Image(
            height=h, width=w, colorspace=3,
            encoded_image_string=buf.getvalue(),
        )
        self.writer._get_file_writer().add_summary(
            Summary(value=[Summary.Value(tag=tag, image=img)]), step
        )

    def histogram(self, tag: str, values: np.ndarray, step: int) -> None:
        if self.enabled:
            self.writer.add_histogram(tag, np.asarray(values), step)

    def flush(self) -> None:
        if self.enabled:
            self.writer.flush()

    def close(self) -> None:
        if self.enabled:
            self.writer.close()
