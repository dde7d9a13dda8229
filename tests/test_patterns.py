"""Pattern provider tests: layout shapes, round-trip properties, and the
documented delayed-pattern example (reference ``codebook_patterns.py``
behavior contract)."""

import numpy as np
import pytest

from vaura_tpu.ops.patterns import (
    DelayedPatternProvider,
    MusicLMPattern,
    ParallelPatternProvider,
    UnrolledPatternProvider,
    VALLEPattern,
)

SPECIAL = 1024
UNKNOWN = -1


def codes(B, K, T, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1024, size=(B, K, T)).astype(np.int32)


def test_delayed_pattern_docstring_example():
    """Reference docstring (codebook_patterns.py:355-364): timesteps=4,
    n_q=3 delays the k-th codebook by k and prepends one special step."""
    p = DelayedPatternProvider(n_q=3).get_pattern(4)
    z = np.arange(1, 5)[None, None, :].repeat(3, axis=1)  # [[1,2,3,4]]*3
    seq, _, mask = p.build_pattern_sequence(z, special_token=0)
    expected = np.array(
        [
            [0, 1, 2, 3, 4, 0, 0],
            [0, 0, 1, 2, 3, 4, 0],
            [0, 0, 0, 1, 2, 3, 4],
        ]
    )
    np.testing.assert_array_equal(np.asarray(seq)[0], expected)
    np.testing.assert_array_equal(np.asarray(mask), expected != 0)


@pytest.mark.parametrize(
    "provider_fn",
    [
        lambda: DelayedPatternProvider(n_q=4),
        lambda: ParallelPatternProvider(n_q=4),
        lambda: UnrolledPatternProvider(n_q=4),
        lambda: VALLEPattern(n_q=4),
        lambda: MusicLMPattern(n_q=4, group_by=2),
        lambda: DelayedPatternProvider(n_q=4, delays=[0, 2, 4, 6]),
        lambda: DelayedPatternProvider(n_q=4, flatten_first=2),
        lambda: UnrolledPatternProvider(
            n_q=4, flattening=[0, 1, 1, 2], delays=[0, 0, 0, 0]
        ),
    ],
)
def test_build_revert_roundtrip(provider_fn):
    """build then revert recovers the original codes at all valid positions."""
    provider = provider_fn()
    T = 12
    p = provider.get_pattern(T)
    z = codes(2, 4, T)
    seq, _, mask = p.build_pattern_sequence(z, SPECIAL)
    rec, _, rec_mask = p.revert_pattern_sequence(np.asarray(seq), SPECIAL)
    rec, rec_mask = np.asarray(rec), np.asarray(rec_mask)
    assert rec.shape == z.shape
    np.testing.assert_array_equal(rec[:, rec_mask], z[:, rec_mask])
    # for these providers every (q, t) coordinate appears in the layout
    assert rec_mask.all()
    np.testing.assert_array_equal(rec, z)


def test_build_shorter_than_pattern():
    """The training path builds with T-1 codes against a pattern made for T
    (reference vaura_model.py:157-167)."""
    T = 10
    p = DelayedPatternProvider(n_q=3).get_pattern(T)
    z = codes(1, 3, T - 1)
    seq, _, mask = p.build_pattern_sequence(z, SPECIAL)
    assert np.asarray(seq).shape[-1] == len(p.layout)
    rec, _, rec_mask = p.revert_pattern_sequence(np.asarray(seq), UNKNOWN)
    rec = np.asarray(rec)
    # first T-1 timesteps recoverable; step T was never provided
    np.testing.assert_array_equal(rec[..., : T - 1], z)


def test_revert_logits_alignment():
    """Logits at sequence step s predict the tokens placed at step s+1:
    reverting with is_model_output=True must align prediction t with
    target t for every codebook."""
    K, T = 3, 6
    p = DelayedPatternProvider(n_q=K).get_pattern(T)
    S = len(p.layout)
    card = 5
    # fabricate logits whose value encodes the sequence step that produced them
    logits = np.zeros((1, card, K, S), dtype=np.float32)
    for s in range(S):
        logits[:, :, :, s] = s
    values, _, mask = p.revert_pattern_logits(logits, float("nan"))
    values, mask = np.asarray(values), np.asarray(mask)
    assert values.shape == (1, card, K, T)
    # delayed pattern: prediction for (q, t) is made at sequence step t + q
    # (the step *before* the token is placed at t + q + 1)
    for q in range(K):
        for t in range(T):
            assert mask[q, t]
            assert values[0, 0, q, t] == t + q


def test_masked_positions_are_special():
    p = DelayedPatternProvider(n_q=3).get_pattern(5)
    z = codes(2, 3, 5)
    seq, _, mask = p.build_pattern_sequence(z, SPECIAL)
    seq, mask = np.asarray(seq), np.asarray(mask)
    assert (seq[:, ~mask] == SPECIAL).all()


def test_first_step_with_timesteps():
    p = DelayedPatternProvider(n_q=3).get_pattern(8)
    assert p.get_first_step_with_timesteps(0) == 1
    assert p.get_first_step_with_timesteps(4) == 5
    assert p.max_delay == 2
    assert p.num_sequence_steps == 8 + 2


def test_valid_layout_truncation():
    p = DelayedPatternProvider(n_q=3).get_pattern(6)
    z = codes(1, 3, 6)
    seq, _, mask = p.build_pattern_sequence(z, SPECIAL, keep_only_valid_steps=True)
    assert np.asarray(seq).shape[-1] == len(p.layout) - p.max_delay
