"""vaura_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-to-audio generation
framework with the capabilities of V-AURA (ilpoviertola/V-AURA).

The framework generates temporally-aligned audio for video: a frozen
Segment-AVCLIP/MotionFormer video encoder produces visual features, a
multi-codebook autoregressive Llama-style decoder generates DAC audio-codec
tokens conditioned on them, and a frozen DAC neural codec decodes the tokens
to a 44.1 kHz waveform.

Layer map (TPU-first redesign of the reference, see SURVEY.md):
  - ``vaura_tpu.config``   — layered-YAML config engine + component registry
  - ``vaura_tpu.ops``      — pure jittable ops: codebook patterns, sampling,
                             losses, LR schedules, RoPE, Pallas kernels
  - ``vaura_tpu.models``   — flax model defs: AR sampler, DAC codec,
                             MotionFormer encoder, bridges, composite model
  - ``vaura_tpu.parallel`` — device mesh + NamedSharding partitioning rules
  - ``vaura_tpu.data``     — datasets/datamodules + host media pipeline
  - ``vaura_tpu.train``    — train state, train/eval loops, checkpointing
  - ``vaura_tpu.utils``    — logging, media helpers, misc
"""

__version__ = "0.1.0"
