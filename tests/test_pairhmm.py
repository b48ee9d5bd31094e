"""Pair-HMM kernel tests: JAX row-scan kernels vs scalar float64 oracle."""

import numpy as np
import pytest

from reveal_tpu.hmm.pairhmm import (
    LOG_ZERO,
    backward_np,
    forward_np,
    posterior_np,
    posterior_oracle,
)

CASES = [
    ("ACGT", "ACGT"),
    ("ACGT", "AGT"),
    ("AAACCCGGGTTT", "AAACCGGTTTT"),
    ("ACACACAC", "GTGTGTGT"),
    ("A", "A"),
    ("ACGTACGTAA", "ACGT"),
    ("NNNACGT", "ACGTNNN"),
]


@pytest.mark.parametrize("s1,s2", CASES)
def test_posterior_matches_oracle(s1, s2):
    p_jax, tot_jax = posterior_np(s1, s2)
    p_ref, tot_ref = posterior_oracle(s1, s2)
    assert p_jax.shape == p_ref.shape
    assert abs(tot_jax - tot_ref) < 1e-2 * max(1.0, abs(tot_ref))
    np.testing.assert_allclose(p_jax, p_ref, atol=2e-3)


def test_posterior_peaks_on_diagonal():
    s = "ACGTTGCAATCGCGCT"
    p, tot = posterior_np(s, s)
    # identical sequences: diagonal cells should dominate
    diag = np.array([p[i, i] for i in range(1, len(s) + 1)])
    assert diag.mean() > 0.9


def test_random_pairs():
    rng = np.random.default_rng(0)
    for _ in range(3):
        l1 = int(rng.integers(3, 40))
        l2 = int(rng.integers(3, 40))
        s1 = "".join(rng.choice(list("ACGT"), size=l1))
        s2 = "".join(rng.choice(list("ACGT"), size=l2))
        p_jax, tot_jax = posterior_np(s1, s2)
        p_ref, tot_ref = posterior_oracle(s1, s2)
        np.testing.assert_allclose(p_jax, p_ref, atol=2e-3)


def test_batched_matches_single():
    from reveal_tpu.hmm.pairhmm import batch_posteriors

    pairs = [
        ("ACGTACGT", "ACGTTCGT"),
        ("AAAA", "AAAATTTT"),
        ("GATTACA", "GATACA"),
    ]
    res = batch_posteriors(pairs)
    for (s1, s2), (p, tot) in zip(pairs, res):
        p_ref, tot_ref = posterior_oracle(s1, s2)
        assert p.shape == p_ref.shape
        np.testing.assert_allclose(p, p_ref, atol=2e-3)
        assert abs(tot - tot_ref) < 1e-2 * max(1.0, abs(tot_ref))
