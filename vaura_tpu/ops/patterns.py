"""Codebook interleave patterns, TPU-first.

Behavioral contract follows the reference's AudioCraft-style pattern system
(reference ``models/modules/misc/codebook_patterns.py``): a *pattern* maps a
dense multi-codebook code tensor ``[B, K, T]`` to an interleaved sequence
``[B, K, S]`` and back, filling non-pattern coordinates with a special token.
Five providers are supported: delayed (default), parallel, unrolled, VALL-E,
and MusicLM.

TPU-first redesign: the layout is lowered once (on host, numpy) into static
int32 scatter-index tables; ``build``/``revert`` are then pure ``jnp.take``
gathers with fully static shapes, so they fuse into surrounding jitted code
and never recompile per step. Index tables are lru-cached per call shape,
mirroring the reference's ``lru_cache`` on its scatter-index builders
(``codebook_patterns.py:55-59``).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

LayoutCoord = Tuple[int, int]  # (timestep t, codebook q)
PatternLayout = List[List[LayoutCoord]]


@dataclass
class Pattern:
    """A pattern layout over ``timesteps`` steps and ``n_q`` codebooks.

    ``layout[s]`` lists the (t, q) coordinates written at sequence step
    ``s``; ``layout[0]`` is always empty so that step 0 carries only the
    special (BOS) token.
    """

    layout: PatternLayout
    timesteps: int
    n_q: int

    def __post_init__(self):
        assert len(self.layout) > 0
        assert self.layout[0] == []
        self._validate_layout()
        # per-instance caches over hashable args (reference caches the same
        # way at codebook_patterns.py:55-59)
        self._build_seq_tables = functools.lru_cache(100)(self._build_seq_tables)
        self._revert_tables = functools.lru_cache(100)(self._revert_tables)

    def _validate_layout(self):
        q_timesteps = {q: 0 for q in range(self.n_q)}
        for s, seq_coords in enumerate(self.layout):
            if seq_coords:
                qs = set()
                for t, q in seq_coords:
                    qs.add(q)
                    assert t >= q_timesteps[q], (
                        f"Past timesteps found for codebook {q} at step {s}"
                    )
                    q_timesteps[q] = t
                assert len(qs) == len(seq_coords), (
                    f"Multiple entries for one codebook at step {s}"
                )

    # ------------------------------------------------------------------ #
    # properties
    # ------------------------------------------------------------------ #
    @property
    def num_sequence_steps(self) -> int:
        return len(self.layout) - 1

    @property
    def max_delay(self) -> int:
        max_t = 0
        for seq_coords in self.layout[1:]:
            for t, _ in seq_coords:
                max_t = max(max_t, t + 1)
        return max_t - self.timesteps

    @property
    def valid_layout(self) -> PatternLayout:
        valid_step = len(self.layout) - self.max_delay
        return self.layout[:valid_step]

    def get_sequence_coords_with_timestep(self, t: int, q: Optional[int] = None):
        assert t <= self.timesteps
        coords = []
        for s, seq_codes in enumerate(self.layout):
            for code in seq_codes:
                if code[0] == t and (q is None or code[1] == q):
                    coords.append((s, code))
        return coords

    def get_steps_with_timestep(self, t: int, q: Optional[int] = None) -> List[int]:
        return [s for s, _ in self.get_sequence_coords_with_timestep(t, q)]

    def get_first_step_with_timesteps(self, t: int, q: Optional[int] = None):
        steps = self.get_steps_with_timestep(t, q)
        return steps[0] if steps else None

    # ------------------------------------------------------------------ #
    # static index-table lowering (host, numpy)
    # ------------------------------------------------------------------ #
    def _ref_layout(self, keep_only_valid_steps: bool) -> PatternLayout:
        return self.valid_layout if keep_only_valid_steps else self.layout

    def _build_seq_tables(self, timesteps: int, keep_only_valid_steps: bool):
        """Indexes [K, S] into flattened codes [K*timesteps (+1 special)].

        Mirrors reference ``_build_pattern_sequence_scatter_indexes``
        (``codebook_patterns.py:137-178``): the pattern may be applied to
        code tensors shorter than ``self.timesteps``; coordinates beyond
        ``timesteps`` map to the special slot.
        """
        K = self.n_q
        assert timesteps <= self.timesteps, (
            "invalid number of timesteps used to build the sequence"
        )
        ref_layout = self._ref_layout(keep_only_valid_steps)
        indexes = np.full((K, len(ref_layout)), K * timesteps, dtype=np.int32)
        mask = np.zeros((K, len(ref_layout)), dtype=bool)
        for s, coords in enumerate(ref_layout):
            for t, q in coords:
                if t < timesteps:
                    indexes[q, s] = t + q * timesteps
                    mask[q, s] = True
        return indexes, mask

    def _revert_tables(
        self,
        sequence_steps: int,
        keep_only_valid_steps: bool,
        is_model_output: bool,
    ):
        """Indexes [K, T] into flattened sequence [K*sequence_steps (+1)].

        Mirrors reference ``_build_reverted_sequence_scatter_indexes``
        (``codebook_patterns.py:209-258``).
        """
        K, T = self.n_q, self.timesteps
        ref_layout = self._ref_layout(keep_only_valid_steps)
        assert sequence_steps <= len(ref_layout), (
            f"sequence to revert is longer than the pattern: "
            f"{sequence_steps} > {len(ref_layout)}"
        )
        if is_model_output:
            ref_layout = ref_layout[1:]
        indexes = np.full((K, T), K * sequence_steps, dtype=np.int32)
        mask = np.zeros((K, T), dtype=bool)
        for s, coords in enumerate(ref_layout):
            if s < sequence_steps:
                for t, q in coords:
                    if t < T:
                        indexes[q, t] = s + q * sequence_steps
                        mask[q, t] = True
        return indexes, mask

    # ------------------------------------------------------------------ #
    # jittable apply (device, jnp)
    # ------------------------------------------------------------------ #
    def build_pattern_sequence(
        self, z, special_token: int, keep_only_valid_steps: bool = False
    ):
        """[B, K, T] codes -> [B, K, S] interleaved sequence.

        Returns ``(values, indexes, mask)`` like reference
        ``codebook_patterns.py:180-207``.
        """
        B, K, T = z.shape
        assert K == self.n_q, f"codebooks mismatch: {K} != {self.n_q}"
        np_idx, np_mask = self._build_seq_tables(T, keep_only_valid_steps)
        flat = jnp.reshape(z, (B, K * T))
        flat = jnp.concatenate(
            [flat, jnp.full((B, 1), special_token, dtype=z.dtype)], axis=1
        )
        idx = jnp.asarray(np_idx)
        values = jnp.take(flat, idx.reshape(-1), axis=1).reshape(B, K, -1)
        return values, idx, jnp.asarray(np_mask)

    def revert_pattern_sequence(
        self, s, special_token: int, keep_only_valid_steps: bool = False
    ):
        """[B, K, S] interleaved sequence -> [B, K, T] codes
        (reference ``codebook_patterns.py:260-285``)."""
        B, K, S = s.shape
        assert K == self.n_q
        np_idx, np_mask = self._revert_tables(S, keep_only_valid_steps, False)
        flat = jnp.reshape(s, (B, K * S))
        flat = jnp.concatenate(
            [flat, jnp.full((B, 1), special_token, dtype=s.dtype)], axis=1
        )
        idx = jnp.asarray(np_idx)
        values = jnp.take(flat, idx.reshape(-1), axis=1).reshape(B, K, -1)
        return values, idx, jnp.asarray(np_mask)

    def revert_pattern_logits(
        self, logits, special_token: float, keep_only_valid_steps: bool = False
    ):
        """[B, card, K, S] model logits -> [B, card, K, T] aligned to codes.

        Keeps the logits of the first sequence step (prediction made from the
        BOS special token) and drops the trailing step with no target, like
        reference ``codebook_patterns.py:287-313``.
        """
        B, card, K, S = logits.shape
        assert K == self.n_q
        np_idx, np_mask = self._revert_tables(S, keep_only_valid_steps, True)
        flat = jnp.reshape(logits, (B, card, K * S))
        flat = jnp.concatenate(
            [flat, jnp.full((B, card, 1), special_token, dtype=logits.dtype)],
            axis=-1,
        )
        idx = jnp.asarray(np_idx)
        values = jnp.take(flat, idx.reshape(-1), axis=2).reshape(B, card, K, -1)
        return values, idx, jnp.asarray(np_mask)


class CodebooksPatternProvider:
    """Base class for pattern providers (reference
    ``codebook_patterns.py:316-347``)."""

    def __init__(self, n_q: int):
        assert n_q > 0
        self.n_q = n_q
        self.get_pattern = functools.lru_cache(100)(self.get_pattern)  # type: ignore

    def get_pattern(self, timesteps: int) -> Pattern:
        raise NotImplementedError


class DelayedPatternProvider(CodebooksPatternProvider):
    """Delay codebook ``k`` by ``delays[k]`` steps (default: ``k``).

    Reference ``codebook_patterns.py:350-406``.
    """

    def __init__(
        self,
        n_q: int,
        delays: Optional[Sequence[int]] = None,
        flatten_first: int = 0,
        empty_initial: int = 0,
    ):
        super().__init__(n_q)
        if delays is None:
            delays = list(range(n_q))
        self.delays = list(delays)
        self.flatten_first = flatten_first
        self.empty_initial = empty_initial
        assert len(self.delays) == self.n_q
        assert sorted(self.delays) == self.delays

    def get_pattern(self, timesteps: int) -> Pattern:
        out: PatternLayout = [[]]
        max_delay = max(self.delays)
        if self.empty_initial:
            out += [[] for _ in range(self.empty_initial)]
        if self.flatten_first:
            for t in range(min(timesteps, self.flatten_first)):
                for q in range(self.n_q):
                    out.append([(t, q)])
        for t in range(self.flatten_first, timesteps + max_delay):
            v = []
            for q, delay in enumerate(self.delays):
                t_for_q = t - delay
                if t_for_q >= self.flatten_first:
                    v.append((t_for_q, q))
            out.append(v)
        return Pattern(out, timesteps=timesteps, n_q=self.n_q)


class ParallelPatternProvider(DelayedPatternProvider):
    """No delay: all codebooks advance in lockstep."""

    def __init__(self, n_q: int):
        super().__init__(n_q, [0] * n_q)


class UnrolledPatternProvider(CodebooksPatternProvider):
    """Partial/total flattening of codebooks with optional per-codebook delay.

    Reference ``codebook_patterns.py:422-548``.
    """

    def __init__(
        self,
        n_q: int,
        flattening: Optional[Sequence[int]] = None,
        delays: Optional[Sequence[int]] = None,
    ):
        super().__init__(n_q)
        if flattening is None:
            flattening = list(range(n_q))
        if delays is None:
            delays = [0] * n_q
        assert len(flattening) == n_q
        assert len(delays) == n_q
        assert sorted(flattening) == list(flattening)
        assert sorted(delays) == list(delays)
        self._flattened: dict = {}
        for q, (inner_step, delay) in enumerate(zip(flattening, delays)):
            if inner_step not in self._flattened:
                self._flattened[inner_step] = {"codebooks": [q], "delay": delay}
            else:
                entry = self._flattened[inner_step]
                assert entry["delay"] == delay, (
                    "codebooks flattened to the same step must share a delay"
                )
                entry["codebooks"].append(q)
        self.max_delay = max(delays)

    @property
    def _num_inner_steps(self) -> int:
        return max(self._flattened.keys()) + 1

    def num_virtual_steps(self, timesteps: int) -> int:
        return timesteps * self._num_inner_steps + 1

    def get_pattern(self, timesteps: int) -> Pattern:
        indexed_out: list = [(-1, [])]
        max_timesteps = timesteps + self.max_delay
        for t in range(max_timesteps):
            for step in range(self._num_inner_steps):
                if step in self._flattened:
                    entry = self._flattened[step]
                    t_for_q = t + entry["delay"]
                    coords = [(t, q) for q in entry["codebooks"]]
                    if t_for_q < max_timesteps and t < max_timesteps:
                        indexed_out.append((t_for_q, coords))
                else:
                    indexed_out.append((t, []))
        out = [coords for _, coords in sorted(indexed_out)]
        return Pattern(out, timesteps=timesteps, n_q=self.n_q)


class VALLEPattern(CodebooksPatternProvider):
    """First codebook fully, then the rest (optionally delayed).

    Reference ``codebook_patterns.py:551-581``.
    """

    def __init__(self, n_q: int, delays: Optional[Sequence[int]] = None):
        super().__init__(n_q)
        if delays is None:
            delays = [0] * (n_q - 1)
        self.delays = list(delays)
        assert len(self.delays) == self.n_q - 1
        assert sorted(self.delays) == self.delays

    def get_pattern(self, timesteps: int) -> Pattern:
        out: PatternLayout = [[]]
        for t in range(timesteps):
            out.append([(t, 0)])
        max_delay = max(self.delays) if self.delays else 0
        for t in range(timesteps + max_delay):
            v = []
            for q, delay in enumerate(self.delays):
                t_for_q = t - delay
                if t_for_q >= 0:
                    v.append((t_for_q, q + 1))
            out.append(v)
        return Pattern(out, timesteps=timesteps, n_q=self.n_q)


class MusicLMPattern(CodebooksPatternProvider):
    """Group-wise flattening (reference ``codebook_patterns.py:584-603``)."""

    def __init__(self, n_q: int, group_by: int = 2):
        super().__init__(n_q)
        self.group_by = group_by

    def get_pattern(self, timesteps: int) -> Pattern:
        out: PatternLayout = [[]]
        for offset in range(0, self.n_q, self.group_by):
            for t in range(timesteps):
                for q in range(offset, offset + self.group_by):
                    out.append([(t, q)])
        return Pattern(out, timesteps=timesteps, n_q=self.n_q)
