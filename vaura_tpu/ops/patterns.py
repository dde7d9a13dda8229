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

Derivation note: the provider *layouts* are a behavioral contract defined
by the reference (which vendors them from AudioCraft, MIT); each
``get_pattern`` here derives the same layout from its own formulation and
is locked bit-exactly against the reference implementation by
``tests/test_reference_oracle.py``.
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
        """A layout is valid iff (a) no sequence step writes one codebook
        twice and (b) each codebook's timesteps appear in non-decreasing
        order along the sequence (no future-before-past)."""
        frontier = np.zeros(self.n_q, dtype=np.int64)  # watermark per codebook
        for s, coords in enumerate(self.layout):
            if not coords:
                continue
            qs = [q for _, q in coords]
            assert len(set(qs)) == len(qs), (
                f"Multiple entries for one codebook at step {s}"
            )
            ts = np.array([t for t, _ in coords])
            assert (ts >= frontier[qs]).all(), (
                f"Past timesteps found at step {s}"
            )
            frontier[qs] = ts

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
        """Layout derivation (behavioral spec = reference
        ``codebook_patterns.py:377-406``, itself vendored from AudioCraft;
        bit-exactness locked by ``tests/test_reference_oracle.py``):

        after the BOS row, ``empty_initial`` blank rows and an optional
        fully-flattened head (one ``(t, q)`` per row, row-major over the
        first ``flatten_first`` timesteps), row ``r`` of the delayed body
        carries, for every codebook ``q``, the coordinate
        ``(flatten_first + r - delays[q], q)`` whenever that timestep has
        cleared the flattened head."""
        ff, n_q = self.flatten_first, self.n_q
        head: PatternLayout = [[]] * (1 + self.empty_initial)
        flat: PatternLayout = [
            [(t, q)] for t in range(min(timesteps, ff)) for q in range(n_q)
        ]
        n_body = timesteps + max(self.delays) - ff
        body: PatternLayout = [
            [
                (ff + r - d, q)
                for q, d in enumerate(self.delays)
                if 0 <= r - d
            ]
            for r in range(n_body)
        ]
        return Pattern(head + flat + body, timesteps=timesteps, n_q=n_q)


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
        """Layout derivation (behavioral spec = reference
        ``codebook_patterns.py:505-548`` / AudioCraft; bit-exactness locked
        by ``tests/test_reference_oracle.py``):

        every timestep expands into ``_num_inner_steps`` virtual rows. The
        row of inner step ``i`` carries all codebooks flattened onto ``i``,
        scheduled ``delay`` rows later (rows past the horizon are dropped);
        an inner step with no codebooks contributes a blank row at its own
        time. Rows are merged in schedule order — on ties blank rows come
        first, then lower source timesteps (tuple order)."""
        horizon = timesteps + self.max_delay
        rows: list = [(-1, [])]  # BOS row sorts before everything
        for i in range(self._num_inner_steps):
            grp = self._flattened.get(i)
            if grp is None:
                rows += [(t, []) for t in range(horizon)]
            else:
                rows += [
                    (t + grp["delay"], [(t, q) for q in grp["codebooks"]])
                    for t in range(horizon - grp["delay"])
                ]
        return Pattern(
            [coords for _, coords in sorted(rows)],
            timesteps=timesteps,
            n_q=self.n_q,
        )


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
        """Codebook 0 streams alone first; the remaining codebooks follow
        as one delayed block (row ``r``: codebook ``q+1`` at timestep
        ``r - delays[q]`` once non-negative). Spec = reference
        ``codebook_patterns.py:568-581``; locked by the oracle tests."""
        solo: PatternLayout = [[(t, 0)] for t in range(timesteps)]
        block: PatternLayout = [
            [(r - d, q + 1) for q, d in enumerate(self.delays) if r >= d]
            for r in range(timesteps + max(self.delays, default=0))
        ]
        return Pattern([[]] + solo + block, timesteps=timesteps, n_q=self.n_q)


class MusicLMPattern(CodebooksPatternProvider):
    """Group-wise flattening (reference ``codebook_patterns.py:584-603``)."""

    def __init__(self, n_q: int, group_by: int = 2):
        super().__init__(n_q)
        self.group_by = group_by

    def get_pattern(self, timesteps: int) -> Pattern:
        """Fully flattened, one coordinate per row, iterated group-major:
        all timesteps of codebook group [g, g+group_by) before the next
        group. Spec = reference ``codebook_patterns.py:597-603``; locked by
        the oracle tests."""
        layout: PatternLayout = [[]] + [
            [(t, q)]
            for g in range(0, self.n_q, self.group_by)
            for t in range(timesteps)
            for q in range(g, g + self.group_by)
        ]
        return Pattern(layout, timesteps=timesteps, n_q=self.n_q)
