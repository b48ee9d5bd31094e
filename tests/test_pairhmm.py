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


def test_native_post_batch_matches_oracle():
    """Native host pair-HMM batch (esa.cpp rtpu_pairhmm_post_batch) is
    BIT-IDENTICAL to the float64 scalar oracle: same recurrence order,
    double DP state, float32 output rounding (reference semantics:
    ProbabilisticModel.h:102-331)."""
    from reveal_tpu.hmm.msa import _mea_dp_fast, _sparsify
    from reveal_tpu.native import pairhmm_post_batch_native

    rng = np.random.default_rng(11)
    pairs = list(CASES)
    for L in (33, 150, 400):
        a = "".join(rng.choice(list("ACGT"), size=L))
        b = "".join(rng.choice(list("ACGT"), size=L - 7))
        pairs.append((a, b))
    res = pairhmm_post_batch_native(pairs)
    if res is None:
        pytest.skip("native library unavailable")
    for (a, b), (p_n, tot_n, sc_n) in zip(pairs, res):
        p_o, tot_o = posterior_oracle(a, b)
        p32 = np.asarray(p_o, dtype=np.float32)
        assert p_n.shape == (len(a) + 1, len(b) + 1)
        np.testing.assert_array_equal(p_n, _sparsify(p32))
        assert tot_n == tot_o
        assert sc_n == _mea_dp_fast(p32)[1]


def test_native_post_batch_threaded_deterministic():
    """Thread count must not change a single output byte."""
    from reveal_tpu.native import pairhmm_post_batch_native

    rng = np.random.default_rng(3)
    pairs = [
        (
            "".join(rng.choice(list("ACGT"), size=rng.integers(5, 200))),
            "".join(rng.choice(list("ACGT"), size=rng.integers(5, 200))),
        )
        for _ in range(20)
    ]
    r1 = pairhmm_post_batch_native(pairs, nthreads=1)
    r4 = pairhmm_post_batch_native(pairs, nthreads=4)
    if r1 is None:
        pytest.skip("native library unavailable")
    for (p1, t1, s1), (p4, t4, s4) in zip(r1, r4):
        np.testing.assert_array_equal(p1, p4)
        assert t1 == t4 and s1 == s4
