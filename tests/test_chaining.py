"""Unit tests for the chaining helpers: gap-cost models, overlap
trimming, and the chain DP against a brute-force oracle."""

import itertools

import numpy as np
import pytest

from reveal_tpu.align.chaining import chain, gapcost, trim_overlap


def test_gapcost_models():
    a, b = (10, 20), (16, 22)
    # sumofpairs: |d0 - d1| = |6 - 2| = 4
    assert gapcost(a, b, model="sumofpairs") == 4
    # star-avg: |(10-16) + (20-22)| / 2 = 8/2
    assert gapcost(a, b, model="star-avg") == 4.0
    # star-med: sorted(|6|, |2|)[1] = 6
    assert gapcost(a, b, model="star-med") == 6
    # epsilon adds min(D) * eps
    assert gapcost(a, b, model="sumofpairs", epsilon_=2) == 4 + 2 * 2
    # unknown model -> 0 (reference falls through)
    assert gapcost(a, b, model="nope") == 0


def test_gapcost_symmetric_and_zero():
    assert gapcost((5, 5), (5, 5)) == 0
    a, b = (3, 9, 14), (7, 9, 20)
    assert gapcost(a, b) == gapcost(b, a)


def _mk(l, p0, p1):
    return (l, 2, ((0, p0), (1, p1)))


def test_trim_overlap_disjoint_untouched():
    mums = [_mk(10, 0, 0), _mk(10, 50, 50), _mk(10, 100, 100)]
    out = trim_overlap(list(mums))
    assert sorted(out) == sorted(mums)


def test_trim_overlap_shrinks_overlapping():
    # two 20bp matches overlapping by 5 in both dims
    mums = [_mk(20, 0, 0), _mk(20, 15, 15)]
    out = trim_overlap(list(mums))
    # no position is covered twice in any dimension afterwards
    for coord in (0, 1):
        seen = set()
        for m in out:
            ps = m[2][coord][1]
            rng = range(ps, ps + m[0])
            assert not (seen & set(rng))
            seen |= set(rng)
    # total coverage shrank from 40 to the non-overlapping extent
    assert sum(m[0] for m in out) <= 35


def test_trim_overlap_contained_dropped():
    # second match fully inside the first along dim 0
    mums = [_mk(30, 0, 0), _mk(5, 10, 100)]
    out = trim_overlap(list(mums))
    lens = sorted(m[0] for m in out)
    # the contained 5bp match cannot survive intact
    assert lens != [5, 30]


def _brute_chain_score(mums, left, right, wscore=1, wpen=1):
    """Best-scoring subset of mums forming a strictly increasing chain in
    every dimension, scored like the reference: sum(wscore*l*npairs)
    - wpen*gapcost between consecutive anchors (including left/right)."""
    dims = list(left[2].keys())
    npairs = len(dims) * (len(dims) - 1) // 2 or 1

    def endpoint(m):
        return {k: m[2][k] + m[0] for k in dims}

    best = None
    for r in range(len(mums) + 1):
        for subset in itertools.permutations(mums, r):
            ok = True
            prev = left
            score = 0.0
            for m in subset:
                pe = (
                    {k: prev[2][k] + prev[0] for k in dims}
                    if prev is not left
                    else {k: left[2][k] + 1 for k in dims}
                )
                if any(m[2][k] < pe[k] for k in dims):
                    ok = False
                    break
                score += wscore * m[0] * npairs
                d = [
                    abs(
                        (m[2][dims[i]] - pe[dims[i]])
                        - (m[2][dims[j]] - pe[dims[j]])
                    )
                    for i in range(len(dims))
                    for j in range(i + 1, len(dims))
                ]
                score -= wpen * sum(d)
                prev = m
            if not ok:
                continue
            if best is None or score > best:
                best = score
    return best


def test_chain_prefers_colinear():
    # three colinear anchors + one off-diagonal distractor
    left = (0, 0, {0: -1, 1: -1})
    right = (0, 0, {0: 200, 1: 200})
    colinear = [
        (20, 2, {0: 10, 1: 10}),
        (20, 2, {0: 60, 1: 60}),
        (20, 2, {0: 120, 1: 120}),
    ]
    distractor = (25, 2, {0: 65, 1: 150})
    out = chain(colinear + [distractor], left, right)
    picked = [m for m, s in out]
    assert distractor not in picked
    assert len(picked) == 3


def test_chain_single_anchor():
    left = (0, 0, {0: -1, 1: -1})
    right = (0, 0, {0: 100, 1: 100})
    m = (30, 2, {0: 10, 1: 20})
    out = chain([m], left, right)
    assert [x for x, s in out] == [m]


def test_chain_matches_python_fallback():
    """Native chain DP vs the pure-python hybrid on random anchors."""
    import reveal_tpu.native as native

    rng = np.random.default_rng(3)
    for trial in range(5):
        k = int(rng.integers(3, 25))
        mums = []
        for _ in range(k):
            p0 = int(rng.integers(0, 1000))
            p1 = p0 + int(rng.integers(-30, 30))
            mums.append((int(rng.integers(5, 40)), 2, {0: p0, 1: max(p1, 0)}))
        # unique ref starts (native fast-path requirement)
        seen = set()
        mums = [m for m in mums if not (
            m[2][0] in seen or seen.add(m[2][0]))]
        left = (0, 0, {0: -1, 1: -1})
        right = (0, 0, {0: 2000, 1: 2000})
        got_native = chain(list(mums), left, right)
        orig = native.chain_native
        try:
            native.chain_native = lambda *a, **kw: None
            got_py = chain(list(mums), left, right)
        finally:
            native.chain_native = orig
        assert [
            (m, round(s, 6)) for m, s in got_native
        ] == [(m, round(s, 6)) for m, s in got_py], trial


def test_chain_cmd_norecurse_and_gcmodels(tmp_path, capsys):
    """kdchain options: --norecurse still yields a valid graph; star
    gap-cost models run end to end."""
    from reveal_tpu.cli import main
    from reveal_tpu.core.io_fasta import fasta_writer

    rng = np.random.default_rng(12)
    base = "".join(rng.choice(list("ACGT"), size=3000))
    mut = list(base)
    for _ in range(25):
        mut[int(rng.integers(0, len(mut)))] = "ACGT"[int(rng.integers(0, 4))]
    fasta_writer(str(tmp_path / "x.fa"), [("x", base)])
    fasta_writer(str(tmp_path / "y.fa"), [("y", "".join(mut))])

    for extra, tag in (
        (["--norecurse"], "nr"),
        (["--gcmodel", "star-avg"], "sa"),
        (["--gcmodel", "star-med"], "sm"),
    ):
        out = str(tmp_path / ("c_" + tag))
        rc = main(["chain", str(tmp_path / "x.fa"), str(tmp_path / "y.fa"),
                   "-m", "20", "-o", out, "--backend", "np"] + extra)
        assert rc == 0 or rc is None
        main(["extract", out + ".gfa", "x.fa"])
        got = "".join(capsys.readouterr().out.split("\n")[1:]).strip()
        assert got == base, tag
