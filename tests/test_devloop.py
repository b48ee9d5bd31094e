"""Whole-recursion device kernel (index/devloop.py) vs the host engine.

The device loop must reproduce the serial LIFO engine's GFA
byte-for-byte: the kernel's per-segment picks were validated against a
762-case traced corpus, the repair loop against a 385-case corpus, and
these tests pin the end-to-end composition (anchors + pop-order replay
+ text lowercase) on fuzz genomes and edge shapes.
"""

import os

import numpy as np
import pytest

import reveal_tpu.index.devloop as devloop
from reveal_tpu.align.rem import align_genomes
from reveal_tpu.core.io_fasta import fasta_writer
from reveal_tpu.core.io_gfa import write_gfa


def _gfa_bytes(G, T, tmp_path, name):
    fn = str(tmp_path / name)
    write_gfa(G, T, fn)
    with open(fn, "rb") as fh:
        return fh.read()


def _mutate(base, rng, nmut, indels=True):
    mut = list(base)
    for _ in range(nmut):
        i = int(rng.integers(0, len(mut)))
        r = rng.random()
        if not indels or r < 0.5:
            mut[i] = "ACGT"[int(rng.integers(0, 4))]
        elif r < 0.75:
            del mut[i]
        else:
            mut.insert(i, "ACGT"[int(rng.integers(0, 4))])
    return "".join(mut)


def _run_both(tmp_path, seqa, seqb, mode="full", **kw):
    """Host-engine vs device GFA bytes; mode selects the device path
    (full = one-dispatch whole recursion, hybrid = host prefix +
    deferred device forest)."""
    import reveal_tpu.align.rem as remmod

    fa1 = str(tmp_path / "a.fa")
    fa2 = str(tmp_path / "b.fa")
    fasta_writer(fa1, [("a", seqa)])
    fasta_writer(fa2, [("b", seqb)])

    os.environ["REVEAL_TPU_DISABLE_DEVLOOP"] = "1"
    try:
        G1, idx1 = align_genomes([fa1, fa2], backend="np", **kw)
    finally:
        del os.environ["REVEAL_TPU_DISABLE_DEVLOOP"]
    b1 = _gfa_bytes(G1, idx1.main.T, tmp_path, "h.gfa")

    calls = []
    if mode == "hybrid":
        orig = remmod._rem_device_hybrid

        def spy(*a, **k):
            res = orig(*a, **k)
            calls.append(res is not None)
            return res

        remmod._rem_device_hybrid = spy
    else:
        orig = devloop.rem_device_loop

        def spy(*a, **k):
            res = orig(*a, **k)
            calls.append(res is not None)
            return res

        devloop.rem_device_loop = spy
    os.environ["REVEAL_TPU_DEVLOOP_MODE"] = mode
    try:
        G2, idx2 = align_genomes(
            [fa1, fa2], backend="np", frontier=True, **kw
        )
    finally:
        del os.environ["REVEAL_TPU_DEVLOOP_MODE"]
        if mode == "hybrid":
            remmod._rem_device_hybrid = orig
        else:
            devloop.rem_device_loop = orig
    b2 = _gfa_bytes(G2, idx2.main.T, tmp_path, "d.gfa")
    return b1, b2, idx1, idx2, calls


@pytest.mark.parametrize("mode", ["full", "hybrid"])
@pytest.mark.parametrize("seed,n,nmut", [(3, 2000, 25), (7, 5000, 60)])
def test_devloop_gfa_byte_identical(tmp_path, seed, n, nmut, mode):
    rng = np.random.default_rng(seed)
    base = "".join(rng.choice(list("ACGT"), size=n))
    mut = _mutate(base, rng, nmut)
    b1, b2, idx1, idx2, calls = _run_both(tmp_path, base, mut, mode=mode)
    assert calls == [True], "device loop did not engage"
    assert b1 == b2
    assert np.array_equal(idx1.main.T, idx2.main.T)


@pytest.mark.parametrize("mode", ["full", "hybrid"])
def test_devloop_identical_sequences(tmp_path, mode):
    rng = np.random.default_rng(11)
    s = "".join(rng.choice(list("ACGT"), size=800))
    b1, b2, _, _, calls = _run_both(tmp_path, s, s, mode=mode)
    assert calls == [True]
    assert b1 == b2


@pytest.mark.parametrize("mode", ["full", "hybrid"])
def test_devloop_no_matches(tmp_path, mode):
    # no shared 20-mers: nothing to anchor, zero-anchor replay
    b1, b2, _, _, calls = _run_both(
        tmp_path, "A" * 400, "C" * 400, mode=mode
    )
    assert calls == [True]
    assert b1 == b2


@pytest.mark.parametrize("mode", ["full", "hybrid"])
def test_devloop_short_minlength(tmp_path, mode):
    rng = np.random.default_rng(13)
    base = "".join(rng.choice(list("ACGT"), size=600))
    mut = _mutate(base, rng, 12)
    b1, b2, _, _, calls = _run_both(
        tmp_path, base, mut, minlength=8, mode=mode
    )
    assert calls == [True]
    assert b1 == b2


def test_devloop_declines_multicontig(tmp_path):
    rng = np.random.default_rng(17)
    c1 = "".join(rng.choice(list("ACGT"), size=900))
    c2 = "".join(rng.choice(list("ACGT"), size=700))
    fa1 = str(tmp_path / "m1.fa")
    fa2 = str(tmp_path / "m2.fa")
    fasta_writer(fa1, [("x1", c1), ("x2", c2)])
    fasta_writer(fa2, [("y1", _mutate(c1, rng, 9)), ("y2", c2)])

    calls = []
    orig = devloop.rem_device_loop

    def spy(*a, **k):  # pragma: no cover - must not be reached
        calls.append(1)
        return orig(*a, **k)

    devloop.rem_device_loop = spy
    try:
        align_genomes([fa1, fa2], backend="np", frontier=True)
    finally:
        devloop.rem_device_loop = orig
    assert calls == []  # multicontig roots are not eligible


def test_pop_order_tree():
    # root(0) -> lead(1), trail(2); 2 -> lead(3); 1 -> trail(4)
    parents = np.array([-1, 0, 0, 2, 1])
    cls = np.array([0, 1, 2, 1, 2])
    # pop order: 0, trail subtree first: 2, then 2's trail (none),
    # 2's lead 3; then 1, 1's trail 4
    assert devloop.pop_order(parents, cls).tolist() == [0, 2, 3, 1, 4]


@pytest.mark.parametrize("mode", ["full", "hybrid"])
def test_devloop_fixture_1a1b(tmp_path, mode):
    fa1 = "/root/reference/tests/1a.fa"
    fa2 = "/root/reference/tests/1b.fa"
    if not os.path.exists(fa1):  # pragma: no cover
        pytest.skip("reference fixtures unavailable")

    os.environ["REVEAL_TPU_DISABLE_DEVLOOP"] = "1"
    try:
        G1, idx1 = align_genomes([fa1, fa2], backend="np")
    finally:
        del os.environ["REVEAL_TPU_DISABLE_DEVLOOP"]
    b1 = _gfa_bytes(G1, idx1.main.T, tmp_path, "h.gfa")
    os.environ["REVEAL_TPU_DEVLOOP_MODE"] = mode
    try:
        G2, idx2 = align_genomes([fa1, fa2], backend="np", frontier=True)
    finally:
        del os.environ["REVEAL_TPU_DEVLOOP_MODE"]
    b2 = _gfa_bytes(G2, idx2.main.T, tmp_path, "d.gfa")
    # the device loop must actually have run (abort falls back to the
    # host engine and would make this test pass vacuously)
    assert devloop.LAST_STATS.get("abort") == 0, devloop.LAST_STATS
    assert b1 == b2
    assert np.array_equal(idx1.main.T, idx2.main.T)


@pytest.mark.parametrize("mode", ["full", "hybrid"])
@pytest.mark.parametrize("seed", [5, 19])
def test_devloop_repetitive_content(tmp_path, seed, mode):
    """Tandem repeats stress the deep repair-lookback path (long
    LCP>=thr runs force the whole-array cond fallback) and tmpw ties in
    the chain winner selection; output must stay byte-identical and
    the kernel must not abort."""
    rng = np.random.default_rng(seed)
    unit = "".join(rng.choice(list("ACGT"), size=40))
    # repeat block > WREP(4096) so insertion points can sit beyond the
    # fast window and take the exact whole-array fallback
    base = (unit * 120) + "".join(rng.choice(list("ACGT"), size=1500))
    base += unit * 10
    mut = _mutate(base, rng, 60)
    b1, b2, _, _, calls = _run_both(tmp_path, base, mut, mode=mode)
    assert calls == [True]
    assert devloop.LAST_STATS.get("abort") == 0, devloop.LAST_STATS
    assert b1 == b2
