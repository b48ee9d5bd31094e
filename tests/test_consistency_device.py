"""Batched device consistency transform vs the host float64 loop."""

import numpy as np

from reveal_tpu.hmm.msa import (
    _sparsify,
    batch_consistency,
    batch_posteriors,
    probcons_align,
)


def _host_consistency(seqs, res, rounds=2, consgap=True):
    """The probcons_align stage-2 loop, extracted verbatim."""
    N = len(seqs)
    pair_keys = [(a, b) for a in range(N) for b in range(a + 1, N)]
    mats = {}
    for (a, b), (p, tot) in zip(pair_keys, res):
        mats[(a, b)] = _sparsify(np.asarray(p))
    for _ in range(rounds):
        new_mats = {}
        for (a, b) in pair_keys:
            P = mats[(a, b)]
            acc = 2.0 * P.astype(np.float64)
            for z in range(N):
                if z == a or z == b:
                    continue
                Paz = mats[(a, z)] if a < z else mats[(z, a)].T
                Pzb = mats[(z, b)] if z < b else mats[(b, z)].T
                acc += Paz.astype(np.float64) @ Pzb.astype(np.float64)
                if consgap:
                    pgx = 1.0 - Paz.sum(axis=1)
                    pgy = 1.0 - Pzb.sum(axis=0)
                    acc += np.outer(pgx, pgy)
            acc /= N
            acc[P == 0] = 0
            from reveal_tpu.hmm.msa import POSTERIOR_CUTOFF

            q = np.where(acc >= POSTERIOR_CUTOFF, acc, 0.0).astype(
                np.float32
            )
            q[0, :] = 0
            q[:, 0] = 0
            new_mats[(a, b)] = q
        mats = new_mats
    return mats


def _mk_problem(seed, n=4, L=60):
    rng = np.random.default_rng(seed)
    base = "".join(rng.choice(list("ACGT"), size=L))
    seqs = []
    for _ in range(n):
        mut = list(base)
        for _ in range(6):
            i = int(rng.integers(0, len(mut)))
            if rng.random() < 0.6:
                mut[i] = "ACGT"[int(rng.integers(0, 4))]
            else:
                del mut[i]
        seqs.append("".join(mut))
    pairs = [
        (seqs[a], seqs[b])
        for a in range(n)
        for b in range(a + 1, n)
    ]
    res = batch_posteriors(pairs)
    return seqs, res


def test_batch_consistency_matches_host():
    problems = [_mk_problem(s, n=4, L=50 + 10 * s) for s in range(3)]
    for consgap in (True, False):
        got = batch_consistency(problems, consistency=2, consgap=consgap)
        for (seqs, res), mats in zip(problems, got):
            want = _host_consistency(seqs, res, rounds=2, consgap=consgap)
            assert set(mats) == set(want)
            for k in want:
                assert mats[k].shape == want[k].shape, k
                # float32 einsum vs float64 loop: small numeric drift,
                # same sparsity decisions away from the cutoff edge
                d = np.abs(mats[k] - want[k])
                assert d.max() < 5e-3, (k, d.max())


def test_probcons_align_precomputed_mats_roundtrip():
    seqs, res = _mk_problem(9, n=3, L=40)
    aobjs = [("s%d" % i, s) for i, s in enumerate(seqs)]
    mats = batch_consistency([(seqs, res)], consistency=2)[0]
    aln1, conf1 = probcons_align(aobjs, precomputed=res)
    aln2, conf2 = probcons_align(
        aobjs, precomputed=res, precomputed_mats=mats
    )
    # same alignment columns (float drift cannot flip this tiny case)
    assert [s for _n, s in aln1] == [s for _n, s in aln2]


def test_batch_stage12_device_matches_host():
    """Fused device chain (posterior -> MEA distance -> consistency)
    equals stage 1+2 of the host path."""
    from reveal_tpu.hmm.msa import _mea_dp_fast, batch_stage12_device

    problems = [_mk_problem(s, n=3, L=40 + 8 * s) for s in range(3)]
    got = batch_stage12_device(
        [seqs for seqs, _res in problems], consistency=2, consgap=True
    )
    for (seqs, res), (mats, dist) in zip(problems, got):
        want = _host_consistency(seqs, res, rounds=2, consgap=True)
        assert set(mats) == set(want)
        for k in want:
            assert mats[k].shape == want[k].shape, k
            d = np.abs(mats[k] - want[k])
            assert d.max() < 5e-3, (k, d.max())
        # distances from the device MEA scan vs the host DP
        n = len(seqs)
        k = 0
        for a in range(n):
            for b in range(a + 1, n):
                p, _tot = res[k]
                _edit, score = _mea_dp_fast(np.asarray(p))
                wantd = score / max(1, min(len(seqs[a]), len(seqs[b])))
                assert abs(dist[a, b] - wantd) < 1e-4, (a, b)
                k += 1


def test_probcons_align_stage12_roundtrip():
    """precomputed_mats+dist path reproduces the plain alignment."""
    from reveal_tpu.hmm.msa import batch_stage12_device

    seqs, res = _mk_problem(11, n=3, L=40)
    aobjs = [("s%d" % i, s) for i, s in enumerate(seqs)]
    mats, dist = batch_stage12_device([seqs], consistency=2, consgap=True)[0]
    aln1, conf1 = probcons_align(aobjs, consgap=True)
    aln2, conf2 = probcons_align(
        aobjs, precomputed_mats=mats, precomputed_dist=dist, consgap=True
    )
    assert [s for _n, s in aln1] == [s for _n, s in aln2]
    assert conf1 == conf2


def test_stage12_oversized_problem_isolated(monkeypatch):
    """A problem past CHAIN_BYTES_CAP must come back as None (per-bubble
    fallback) without poisoning the other problems in the batch — one
    oversized bubble used to throw the whole refine onto the host path."""
    from reveal_tpu.hmm import msa

    monkeypatch.setattr(msa, "CHAIN_BYTES_CAP", 4 * 64 * 64 * 4)
    problems = [
        ["ACGTACGTAC", "ACGAACGTAC"],          # Lq=32 -> under the cap
        ["A" * 200, "C" * 195],                # Lq=256 -> over the cap
    ]
    out = msa.batch_stage12_device(problems)
    assert out[0] is not None
    mats, dist = out[0]
    assert (0, 1) in mats and dist.shape == (2, 2)
    assert out[1] is None


def test_sparse_host_consistency_matches_dense(monkeypatch):
    """_consistency_round_sparse == the dense f64 round (up to summation
    order) — the long-bubble host path must relax identically."""
    from reveal_tpu.hmm import msa

    rng = np.random.default_rng(7)
    N, L = 4, 40
    pair_keys = [(a, b) for a in range(N) for b in range(a + 1, N)]
    mats = {}
    for k in pair_keys:
        p = rng.random((L + 1, L + 1)).astype(np.float32)
        p[p < 0.95] = 0.0  # sparse-ish rows
        mats[k] = p

    dense = {k: m.copy() for k, m in mats.items()}
    for _ in range(2):
        new = {}
        for (a, b) in pair_keys:
            P = dense[(a, b)]
            acc = 2.0 * P.astype(np.float64)
            for z in range(N):
                if z in (a, b):
                    continue
                Paz = dense[(a, z)] if a < z else dense[(z, a)].T
                Pzb = dense[(z, b)] if z < b else dense[(b, z)].T
                acc += Paz.astype(np.float64) @ Pzb.astype(np.float64)
                pgx = 1.0 - Paz.sum(axis=1)
                pgy = 1.0 - Pzb.sum(axis=0)
                acc += np.outer(pgx, pgy)
            acc /= N
            acc[P == 0] = 0
            new[(a, b)] = msa._sparsify(acc.astype(np.float32))
        dense = new

    sparse = {k: m.copy() for k, m in mats.items()}
    for _ in range(2):
        sparse = msa._consistency_round_sparse(
            sparse, pair_keys, N, consgap=True
        )

    for k in pair_keys:
        np.testing.assert_allclose(dense[k], sparse[k], atol=2e-5)
