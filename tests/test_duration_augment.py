"""Direct unit tests for duration augmentation.

Reference semantics (``litfass/dataset/datasets.py:796-816``): a random
``augment_fraction`` subset of phones receives rounded N(0,1) jitter,
compensated on the same subset so sum(durations) is preserved, clipped >= 0.
Previously only exercised indirectly through dataset tests.
"""

import numpy as np
import pytest

from lightningfastspeech2_tpu.audio.features import augment_durations


def test_total_duration_preserved():
    rng = np.random.default_rng(0)
    for seed in range(20):
        rng = np.random.default_rng(seed)
        d = rng.integers(0, 12, size=37).astype(np.int64)
        out = augment_durations(d, rng, 0.25)
        assert out.sum() == d.sum()
        assert (out >= 0).all()
        assert out.dtype == d.dtype


def test_zero_fraction_is_identity():
    rng = np.random.default_rng(1)
    d = np.array([3, 1, 4, 1, 5], dtype=np.int64)
    out = augment_durations(d, rng, 0.0)
    np.testing.assert_array_equal(out, d)


def test_tiny_sequence_rounds_to_no_op():
    # fraction * n rounds to 0 selected phones -> unchanged
    rng = np.random.default_rng(2)
    d = np.array([2, 2], dtype=np.int64)
    out = augment_durations(d, rng, 0.1)
    np.testing.assert_array_equal(out, d)


def test_only_selected_fraction_changes():
    rng = np.random.default_rng(3)
    d = np.full(100, 10, dtype=np.int64)
    out = augment_durations(d, rng, 0.1)
    changed = int((out != d).sum())
    # jitter + compensation both land on the selected subset (<= 10 phones)
    assert changed <= 10
    assert out.sum() == d.sum()


def test_input_not_mutated():
    rng = np.random.default_rng(4)
    d = np.arange(20, dtype=np.int64) % 7
    snapshot = d.copy()
    augment_durations(d, rng, 0.5)
    np.testing.assert_array_equal(d, snapshot)


def test_all_zero_durations_stay_nonnegative():
    rng = np.random.default_rng(5)
    d = np.zeros(16, dtype=np.int64)
    out = augment_durations(d, rng, 0.5)
    assert (out >= 0).all()
    assert out.sum() == 0
