"""Differential tests: native C++ boundary repair (bubble_sort port) vs
the numpy/Python implementation, plus an end-to-end rem equivalence."""

import numpy as np
import pytest

from reveal_tpu.core.textstore import TextStore
from reveal_tpu.index.suffix import lcp_from_sa_np, suffix_array_np


class _FakeMain:
    def __init__(self, SAi):
        self.SAi = SAi


class _FakeIdx:
    def __init__(self, SA, LCP, SAi):
        self.SA = SA
        self.LCP = LCP
        self.main = _FakeMain(SAi)


def _random_state(seed, m=400):
    rng = np.random.default_rng(seed)
    base = "".join(rng.choice(list("ACGT"), size=m))
    mut = list(base)
    for _ in range(m // 40):
        mut[int(rng.integers(0, len(mut)))] = "ACGT"[int(rng.integers(0, 4))]
    ts = TextStore()
    ts.add_sample("a")
    ts.add_sequence(base)
    ts.add_sample("b")
    ts.add_sequence("".join(mut))
    T, SO, nsep = ts.build()
    SA = suffix_array_np(T).astype(np.int64)
    LCP = lcp_from_sa_np(T, SA).astype(np.int64)
    SAi = np.empty(len(SA), dtype=np.int64)
    SAi[SA] = np.arange(len(SA))
    return T, SA, LCP, SAi, rng


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_native_repair_matches_python(seed):
    from reveal_tpu.index.esa_index import _repair_leading_py
    from reveal_tpu.native import repair_leading_native

    T, SA, LCP, SAi, rng = _random_state(seed)
    n = len(SA)
    begins = sorted(int(x) for x in rng.integers(1, n - 1, size=3))
    intervals = [(b, b + 20) for b in begins]

    sa_p, lcp_p, sai_p = SA.copy(), LCP.copy(), SAi.copy()
    _repair_leading_py(_FakeIdx(sa_p, lcp_p, sai_p), intervals)

    sa_n, lcp_n, sai_n = SA.copy(), LCP.copy(), SAi.copy()
    ok = repair_leading_native(sa_n, lcp_n, sai_n, begins)
    assert ok, "native library unavailable"

    assert np.array_equal(sa_p, sa_n)
    assert np.array_equal(lcp_p, lcp_n)
    assert np.array_equal(sai_p, sai_n)


def test_rem_same_graph_with_and_without_native_repair(
    tmp_path, monkeypatch
):
    import reveal_tpu.native as native
    from reveal_tpu.core.io_fasta import fasta_writer
    from reveal_tpu.cli import main

    rng = np.random.default_rng(42)
    base = "".join(rng.choice(list("ACGT"), size=3000))
    mut = list(base)
    for _ in range(40):
        i = int(rng.integers(0, len(mut)))
        if rng.random() < 0.5:
            mut[i] = "ACGT"[int(rng.integers(0, 4))]
        else:
            del mut[i]
    fasta_writer(str(tmp_path / "a.fa"), [("a", base)])
    fasta_writer(str(tmp_path / "b.fa"), [("b", "".join(mut))])

    out1 = str(tmp_path / "native.gfa")
    main(["rem", str(tmp_path / "a.fa"), str(tmp_path / "b.fa"), "-o",
          out1, "--backend", "np"])

    monkeypatch.setattr(
        native, "repair_leading_native", lambda *a, **k: False
    )
    out2 = str(tmp_path / "python.gfa")
    main(["rem", str(tmp_path / "a.fa"), str(tmp_path / "b.fa"), "-o",
          out2, "--backend", "np"])
    assert open(out1).read() == open(out2).read()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_multimums_matches_numpy_and_oracle(seed):
    """Native stack-walk multimums == vectorized numpy == literal
    oracle, including result order."""
    import reveal_tpu.native as native
    from reveal_tpu.index.mums import multimums, multimums_oracle

    rng = np.random.default_rng(seed)
    base = "".join(rng.choice(list("ACGT"), size=500))
    ts = TextStore()
    seqs = []
    for k in range(4):
        mut = list(base)
        for _ in range(10):
            mut[int(rng.integers(0, len(mut)))] = "ACGT"[
                int(rng.integers(0, 4))
            ]
        seqs.append("".join(mut))
        ts.add_sample("s%d" % k)
        ts.add_sequence(seqs[-1])
    T, SO, nsep = ts.build()
    SA = suffix_array_np(T).astype(np.int64)
    LCP = lcp_from_sa_np(T, SA).astype(np.int64)

    got_native = multimums(T, SA, LCP, SO, 4, minl=20, minn=2)
    orig = native.multimums_native
    try:
        native.multimums_native = lambda *a, **k: None
        got_np = multimums(T, SA, LCP, SO, 4, minl=20, minn=2)
    finally:
        native.multimums_native = orig
    assert got_native == got_np
    want = multimums_oracle(T, SA, LCP, SO, 4, minl=20, minn=2)
    assert sorted(got_native) == sorted(want)
    assert len(got_native) > 0


def test_multimems_allows_repeats():
    """multimems: same-sample repeats allowed; n = distinct samples
    (reveal.c:292-434 semantics)."""
    from reveal_tpu.index.mums import multimems, multimums

    # a 30bp unit occurring twice in sample a and once in sample b
    unit = "ACGTTGCAAGTCCGATTAGCATCGGATTCA"
    ts = TextStore()
    ts.add_sample("a")
    ts.add_sequence("GGGG" + unit + "CCCC" + unit + "TTTT")
    ts.add_sample("b")
    ts.add_sequence("AAAA" + unit + "GGGG")
    T, SO, nsep = ts.build()
    SA = suffix_array_np(T).astype(np.int64)
    LCP = lcp_from_sa_np(T, SA).astype(np.int64)

    mems = multimems(T, SA, LCP, SO, 2, minl=30, minn=2)
    # the 3-occurrence repeat appears as a MEM with 2 distinct samples
    assert any(
        m[0] >= 30 and m[1] == 2 and len(m[2]) == 3 for m in mems
    ), mems
    # but NOT as a multiMUM (sample a occurs twice)
    mums = multimums(T, SA, LCP, SO, 2, minl=30, minn=2)
    assert not any(len(m[2]) == 3 for m in mums)


def test_multimems_wide_interval_no_cap():
    """Intervals wider than the vectorized bucket (64) are still
    enumerated: the reference getmultimems has no width cap
    (reveal.c:292-434)."""
    from reveal_tpu.index.mums import multimems

    rng = np.random.default_rng(7)
    unit = "".join(rng.choice(list("ACGT"), size=40))
    parts = []
    for _ in range(80):  # 80 scattered occurrences in sample a
        parts.append(unit)
        parts.append("".join(rng.choice(list("ACGT"), size=25)))
    ts = TextStore()
    ts.add_sample("a")
    ts.add_sequence("".join(parts))
    ts.add_sample("b")
    ts.add_sequence(
        "".join(rng.choice(list("ACGT"), size=30)) + unit
        + "".join(rng.choice(list("ACGT"), size=30))
    )
    T, SO, nsep = ts.build()
    SA = suffix_array_np(T).astype(np.int64)
    LCP = lcp_from_sa_np(T, SA).astype(np.int64)

    mems = multimems(T, SA, LCP, SO, 2, minl=40, minn=2)
    wide = [m for m in mems if len(m[2]) >= 81]
    assert wide, "expected the 81-occurrence repeat interval"
    assert all(m[1] == 2 for m in wide)
