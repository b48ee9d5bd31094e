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


def test_sparse_transfer_exact_above_cutoff(monkeypatch):
    """Wide posteriors travel device->host as per-row top-K; every entry
    the MSA can see (>= POSTERIOR_CUTOFF=0.01) must be exact, totals
    unchanged."""
    import reveal_tpu.hmm.pairhmm as ph

    rng = np.random.default_rng(7)
    base = "".join(rng.choice(list("ACGT"), size=600))
    mut = list(base)
    for _ in range(30):
        mut[int(rng.integers(0, len(mut)))] = "ACGT"[int(rng.integers(0, 4))]
    pair = (base, "".join(mut))

    # bucket width for 600bp is 1024 >= 513: the sparse path activates
    sparse = ph.batch_posteriors([pair])[0]
    # force the dense path for the oracle comparison
    monkeypatch.setattr(ph, "SPARSE_TRANSFER_MIN_WIDTH", 1 << 30)
    dense = ph.batch_posteriors([pair])[0]

    p_s, tot_s = sparse
    p_d, tot_d = dense
    assert p_s.shape == p_d.shape
    assert tot_s == tot_d
    hi = p_d >= 0.01
    assert hi.any()
    np.testing.assert_array_equal(p_s[hi], p_d[hi])
    # below the cutoff entries are either exact (made top-K) or zeroed
    low = ~hi
    keep = p_s[low] != 0
    np.testing.assert_array_equal(p_s[low][keep], p_d[low][keep])
    # per-row at most K nonzeros
    assert (np.count_nonzero(p_s, axis=-1) <= ph.SPARSE_TRANSFER_K).all()
