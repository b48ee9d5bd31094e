"""Hardware-gated oracle test for the on-device sparsified posterior
transfer (pairhmm.fetch_posteriors_cut / msa.batch_posteriors_cut): the
cutoff-compacted fetch must equal host _sparsify of the dense fetch
cell for cell, and the device MEA scores must match the host
_mea_dp_fast recurrence."""

import numpy as np


def _pairs(B, L, seed=0):
    r = np.random.default_rng(seed)
    out = []
    for _ in range(B):
        base = r.choice(list("ACGT"), size=L - 10)
        mut = base.copy()
        idx = r.integers(0, len(mut), size=max(1, L // 20))
        mut[idx] = r.choice(list("ACGT"), size=len(idx))
        out.append(("".join(base), "".join(mut[: L - 5])))
    return out


def test_cut_fetch_matches_dense_sparsify():
    import jax

    assert jax.default_backend() != "cpu"
    from reveal_tpu.hmm.msa import (
        _mea_dp_fast,
        _sparsify,
        batch_posteriors,
        batch_posteriors_cut,
    )

    # similar pairs (realistic concentrated posteriors) + random pairs
    # (diffuse posteriors, stresses the per-row count/overflow logic)
    pairs = _pairs(8, 600, seed=1) + [
        (a[::-1], b) for a, b in _pairs(4, 600, seed=2)
    ]
    dense = batch_posteriors(pairs)
    cut = batch_posteriors_cut(pairs)
    assert len(dense) == len(cut)
    from reveal_tpu.hmm.msa import SparsePost

    for (p, tot), (pc, totc, score) in zip(dense, cut):
        want = _sparsify(p)
        assert isinstance(pc, SparsePost)
        assert pc.shape == want.shape
        np.testing.assert_array_equal(pc.dense(), want)
        # csr view must match too (the long-pair consistency input)
        np.testing.assert_array_equal(
            pc.tocsr().toarray().astype(np.float32), want
        )
        assert abs(tot - totc) < 1e-6
        _, hscore = _mea_dp_fast(p)
        assert abs(score - hscore) < 1e-4 * max(1.0, abs(hscore)), (
            score,
            hscore,
        )
