"""Golden differential test of the RECURSION ITSELF: the per-step
picked anchor sequence under threads=0 LIFO semantics, pinned against
``refbench --remtrace`` — an independent C transliteration of the
reference's actual picker (schemes.graphmumpicker + chain +
trim_overlap, reveal/schemes.py:20-104,161-191,197-361) driving the
reference's split/repair recursion (reveal.c:582-727,1295-1324).

The fixture records one ``ma mb l aBeg aEnd bBeg bEnd`` line per anchor
in serial pop order (trailing subtree first).  The repo's host engine
(native rem2_loop -> pick_pairwise_dp, an independent implementation of
the same semantics) must reproduce it anchor-for-anchor.

Deviations shared by both sides (documented): sentinel-capped Kasai LCP
(a cross-'$' "common prefix" is meaningless for anchoring) and
seedsize=0 live picking at every step (the reference CLI default of
10000 switches children of long chains to precomputed midpoint picks).
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = "/root/reference/tests"
FIXDIR = os.path.join(REPO, "tests", "fixtures", "ref_golden")


def _ensure_fixture(tag, files):
    fix = os.path.join(FIXDIR, tag + ".remtrace.txt")
    if os.path.exists(fix):
        return fix
    exe = os.path.join(REPO, "refbench", "refbench")
    if not os.path.exists(exe):
        if not os.path.exists("/root/reference/divsufsort"):
            pytest.skip("reference sources unavailable")
        subprocess.run(
            [os.path.join(REPO, "refbench", "build.sh")],
            check=True,
            capture_output=True,
        )
    subprocess.run(
        [exe, "--remtrace"]
        + [TESTS + "/" + f for f in files]
        + ["--fixture", os.path.join(FIXDIR, tag)],
        check=True,
        capture_output=True,
    )
    return fix


def _repo_anchors(files):
    from reveal_tpu.align.rem import (
        IntervalIndex,
        PanGraph,
        PickerConfig,
        read_fasta_into,
    )
    from reveal_tpu.core.textstore import TextStore
    from reveal_tpu.index.esa_index import ESAIndex
    from reveal_tpu.native import rem2_loop_native

    ts = TextStore()
    t = IntervalIndex()
    G = PanGraph()
    rn = set()
    for f in files:
        read_fasta_into(TESTS + "/" + f, ts, t, G, rn)
    idx = ESAIndex.construct(ts)
    m = idx.main
    cfg = PickerConfig()
    anch = rem2_loop_native(
        m.T,
        idx.SA,
        idx.LCP,
        m.SAi,
        int(m.nsep[0]),
        cfg.minlength,
        cfg.trim,
        cfg.maxmums,
        int(cfg.wscore),
        float(cfg.wpen),
        cfg.pcutoff,
    )
    if anch is None:
        pytest.skip("native host engine unavailable")
    return anch


@pytest.mark.parametrize("tag,files", [("1a1b", ["1a.fa", "1b.fa"])])
def test_rem_recursion_trace_matches_reference(tag, files):
    if not os.path.exists(TESTS + "/" + files[0]):  # pragma: no cover
        pytest.skip("reference fixtures unavailable")
    fix = _ensure_fixture(tag, files)
    ref = np.loadtxt(fix, dtype=np.int64).reshape(-1, 7)
    got = _repo_anchors(files)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)


@pytest.mark.slow
def test_rem_recursion_trace_matches_reference_2a2b():
    if not os.path.exists(TESTS + "/2a.fa"):  # pragma: no cover
        pytest.skip("reference fixtures unavailable")
    fix = _ensure_fixture("2a2b", ["2a.fa", "2b.fa"])
    ref = np.loadtxt(fix, dtype=np.int64).reshape(-1, 7)
    got = _repo_anchors(["2a.fa", "2b.fa"])
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)
