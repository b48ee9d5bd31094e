"""ProbCons-style MSA pipeline tests."""

import numpy as np
import pytest

from reveal_tpu.hmm.msa import (
    _mea_dp,
    _mea_dp_fast,
    probcons_align,
)


def test_mea_fast_matches_scalar():
    rng = np.random.default_rng(0)
    for _ in range(20):
        L1 = int(rng.integers(1, 15))
        L2 = int(rng.integers(1, 15))
        post = rng.random((L1 + 1, L2 + 1), dtype=np.float32)
        post[0, :] = 0
        post[:, 0] = 0
        # sparsify-like zeros
        post[post < 0.3] = 0
        e1, t1 = _mea_dp(post)
        e2, t2 = _mea_dp_fast(post)
        assert abs(t1 - t2) < 1e-5
        assert np.array_equal(e1, e2)


def _check_alignment(aobjs, aln):
    cols = {len(s) for _, s in aln}
    assert len(cols) == 1
    for (name, orig), (name2, row) in zip(aobjs, aln):
        assert name == name2
        assert row.replace("-", "") == orig


def test_pair_alignment():
    aobjs = [("a", "ACGTACGT"), ("b", "ACGTCGT")]
    aln, conf = probcons_align(aobjs, consistency=0, refinement=0)
    _check_alignment(aobjs, aln)
    assert len(conf) == len(aln[0][1])
    # high-confidence columns exist where sequences agree (for 2 seqs the
    # score maxes at 200*P/2 = 100)
    assert max(conf) > 90


def test_three_way_alignment():
    aobjs = [
        ("a", "ACGGTACGTTAGCAT"),
        ("b", "ACGGTACGTAGCAT"),
        ("c", "ACGGTTCGTTAGCAT"),
    ]
    aln, conf = probcons_align(aobjs, consistency=2, refinement=10)
    _check_alignment(aobjs, aln)
    # the shared prefix should align into full columns: count columns where
    # all three have bases
    full = sum(
        1
        for i in range(len(aln[0][1]))
        if all(row[i] != "-" for _, row in aln)
    )
    assert full >= 12


def test_identical_sequences_align_perfectly():
    s = "ACGTTGCAGGCT"
    aobjs = [("x", s), ("y", s), ("z", s)]
    aln, conf = probcons_align(aobjs, consistency=1, refinement=5)
    _check_alignment(aobjs, aln)
    assert all(row == s for _, row in aln)
    # conf caps at 200*C(n,2)/(n*(n-1)) = 100
    assert min(conf) > 90


def test_mea_native_and_fallback_agree():
    """Native mea_dp vs the numpy vectorized path vs the scalar oracle."""
    from reveal_tpu import native as natmod
    from reveal_tpu.hmm import msa as m

    rng = np.random.default_rng(7)
    for _ in range(10):
        L1 = int(rng.integers(1, 40))
        L2 = int(rng.integers(1, 40))
        post = rng.random((L1 + 1, L2 + 1), dtype=np.float32)
        post[0, :] = 0
        post[:, 0] = 0
        post[post < 0.4] = 0
        e_sc, t_sc = m._mea_dp(post)
        res = natmod.mea_dp_native(post)
        if res is not None:
            e_nat, t_nat = res
            assert np.array_equal(e_nat, e_sc)
            assert abs(t_nat - t_sc) < 1e-5


def test_posterior_accum_native_matches_numpy():
    from reveal_tpu.native import posterior_accum_native

    rng = np.random.default_rng(8)
    for transpose in (False, True):
        l1, l2, L1, L2 = 5, 7, 11, 13
        P = rng.random((l1 + 1, l2 + 1)).astype(np.float32)
        P[P < 0.5] = 0
        m1 = np.sort(
            rng.choice(np.arange(1, L1 + 1), size=l1, replace=False)
        )
        m1 = np.concatenate([[0], m1]).astype(np.int64)
        m2 = np.sort(
            rng.choice(np.arange(1, L2 + 1), size=l2, replace=False)
        )
        m2 = np.concatenate([[0], m2]).astype(np.int64)
        ref = np.zeros((L1 + 1, L2 + 1), dtype=np.float32)
        Pin = P.T.copy() if transpose else P
        ref[np.ix_(m1, m2)] += Pin.T if transpose else Pin
        out = np.zeros((L1 + 1, L2 + 1), dtype=np.float32)
        ok = posterior_accum_native(out, Pin, m1, m2, transpose=transpose)
        if ok:
            np.testing.assert_allclose(out, ref, atol=0)

def test_refine_rounds_native_matches_python_loop():
    """The one-call native refinement stage must reproduce the per-round
    Python loop byte-for-byte: same projections, same f32 scatter-add
    order, same MEA tie choices, same merge order."""
    from reveal_tpu.hmm import msa as m
    from reveal_tpu.native import refine_rounds_native

    rng = np.random.default_rng(11)
    for trial in range(6):
        N = int(rng.integers(2, 6))
        lens = [int(rng.integers(2, 25)) for _ in range(N)]
        seqs = [
            "".join(rng.choice(list("ACGT"), size=l)) for l in lens
        ]
        # random sparsified posterior mats in pair order
        mats = {}
        for a in range(N):
            for b in range(a + 1, N):
                P = rng.random(
                    (lens[a] + 1, lens[b] + 1), dtype=np.float32
                )
                P[P < 0.55] = 0
                P[0, :] = 0
                P[:, 0] = 0
                mats[(a, b)] = P
        # a trivially valid starting alignment: block-diagonal layout
        L0 = sum(lens)
        rows = []
        off = 0
        for k in range(N):
            rows.append(
                "-" * off + seqs[k] + "-" * (L0 - off - lens[k])
            )
            off += lens[k]
        aln0 = m._Aln(list(range(N)), rows)
        masks = rng.integers(0, 2, size=(40, N)).astype(np.uint8)
        # include degenerate all-ones / all-zeros rounds
        masks[3, :] = 1
        masks[7, :] = 0

        # python reference loop
        aln = aln0
        for mask in masks:
            g1 = [k for k in range(N) if mask[k]]
            g2 = [k for k in range(N) if not mask[k]]
            if not g1 or not g2:
                continue
            aln = m._refine_once(aln, g1, g2, mats)

        rows0 = np.stack(
            [
                np.frombuffer(r.encode("latin1"), dtype=np.uint8)
                for r in aln0.rows
            ]
        )
        mats_list = [
            mats[(a, b)] for a in range(N) for b in range(a + 1, N)
        ]
        res = refine_rounds_native(rows0, mats_list, masks)
        if res is None:
            pytest.skip("native kernels unavailable")
        got = [res[k].tobytes().decode("latin1") for k in range(N)]
        assert got == aln.rows, "trial %d" % trial
        for k in range(N):
            assert got[k].replace("-", "") == seqs[k]


def test_sparsepost_dense_csr_roundtrip():
    """SparsePost (the compact device transfer form) must reproduce
    _sparsify(dense) exactly through both views, including rows with
    zero survivors and ties."""
    import numpy as np

    from reveal_tpu.hmm.msa import POSTERIOR_CUTOFF, SparsePost, _sparsify

    rng = np.random.default_rng(5)
    L1, L2, K = 37, 53, 64
    p = rng.random((L1, L2)).astype(np.float32) * 0.03
    p[3] = 0.0  # empty row
    p[5, 7] = p[5, 9] = 0.02  # ties
    want = _sparsify(p)
    # emulate the device cut: top-K of the sparsified rows
    q = want.copy()
    cnt = (q >= POSTERIOR_CUTOFF).sum(axis=1).astype(np.int32)
    assert cnt.max() <= K, "test needs K >= max survivors"
    idx = np.argsort(-q, axis=1, kind="stable")[:, :K]
    v = np.take_along_axis(q, idx, axis=1)
    sp = SparsePost(v, idx.astype(np.int16), cnt, (L1, L2))
    np.testing.assert_array_equal(sp.dense(), want)
    np.testing.assert_array_equal(
        sp.tocsr().toarray().astype(np.float32), want
    )
    assert sp.nnz == int((want > 0).sum())
    np.testing.assert_allclose(sp.sum(axis=1), want.sum(axis=1), rtol=1e-6)
    np.testing.assert_allclose(sp.sum(axis=0), want.sum(axis=0), rtol=1e-6)


def test_probcons_align_accepts_sparsepost():
    """probcons_align(precomputed=[SparsePost...]) must produce the same
    alignment as with dense precomputed posteriors (short pairs densify
    on entry; long pairs feed the csr consistency path)."""
    import numpy as np

    from reveal_tpu.hmm.msa import (
        POSTERIOR_CUTOFF,
        SparsePost,
        _mea_dp_fast,
        _sparsify,
        batch_posteriors,
        probcons_align,
    )

    rng = np.random.default_rng(11)
    base = "".join(rng.choice(list("ACGT"), size=90))
    seqs = []
    for _ in range(3):
        m = list(base)
        for _ in range(6):
            m[int(rng.integers(0, len(m)))] = "ACGT"[int(rng.integers(4))]
        seqs.append("".join(m))
    aobjs = [("s%d" % i, s) for i, s in enumerate(seqs)]
    pair_keys = [(a, b) for a in range(3) for b in range(a + 1, 3)]
    res = batch_posteriors(
        [(seqs[a], seqs[b]) for a, b in pair_keys]
    )
    dense_pre = [(p, tot) for p, tot in res]
    scores = [_mea_dp_fast(p)[1] for p, _ in res]
    sparse_pre = []
    K = 64
    for p, tot in res:
        q = _sparsify(p)
        cnt = (q >= POSTERIOR_CUTOFF).sum(axis=1).astype(np.int32)
        idx = np.argsort(-q, axis=1, kind="stable")[:, :K]
        v = np.take_along_axis(q, idx, axis=1)
        sparse_pre.append(
            (SparsePost(v, idx.astype(np.int32), cnt, q.shape), tot)
        )
    a1 = probcons_align(aobjs, precomputed=dense_pre, seed=3)
    a2 = probcons_align(
        aobjs, precomputed=sparse_pre, precomputed_scores=scores, seed=3
    )
    assert a1 == a2
