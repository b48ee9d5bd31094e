"""Golden differential test ABOVE the pairwise index layer: the 6-way
multiMUM enumeration pinned against the REFERENCE engine's own
getmultimums walk (reveal.c:436-580 + ismultimum :227-259), regenerated
in place by ``refbench --multimums`` from /root/reference sources.

The fixture records every multiMUM as ``l n so:pos ...`` in the walk's
emission order; the repo's enumerate (native LCP-interval stack scan,
esa.cpp multimums_scan) must produce the identical multiset of
(l, n, {(sample, pos)}) entries on the same input bytes.
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = "/root/reference/tests"
FILES = ["1a.fa", "1b.fa", "1c.fa", "1d.fa", "1e.fa", "1f.fa"]
FIXTURE = os.path.join(
    REPO, "tests", "fixtures", "ref_golden", "6way.mmums.txt"
)


def _ensure_fixture():
    if os.path.exists(FIXTURE):
        return
    exe = os.path.join(REPO, "refbench", "refbench")
    if not os.path.exists(exe):
        build = os.path.join(REPO, "refbench", "build.sh")
        if not os.path.exists("/root/reference/divsufsort"):
            pytest.skip("reference sources unavailable")
        subprocess.run([build], check=True, capture_output=True)
    subprocess.run(
        [exe, "--multimums"]
        + [TESTS + "/" + f for f in FILES]
        + ["--minl", "20", "--fixture", FIXTURE[: -len(".mmums.txt")]],
        check=True,
        capture_output=True,
    )


def _load_fixture():
    out = []
    with open(FIXTURE) as fh:
        for line in fh:
            parts = line.split()
            l, n = int(parts[0]), int(parts[1])
            coords = frozenset(
                (int(sp.split(":")[0]), int(sp.split(":")[1]))
                for sp in parts[2:]
            )
            assert len(coords) == n
            out.append((l, n, coords))
    return out


def test_6way_multimums_match_reference():
    if not os.path.exists(TESTS + "/1a.fa"):  # pragma: no cover
        pytest.skip("reference fixtures unavailable")
    _ensure_fixture()
    ref = _load_fixture()

    from reveal_tpu.core.io_fasta import fasta_reader
    from reveal_tpu.core.textstore import TextStore
    from reveal_tpu.index.esa_index import ESAIndex

    ts = TextStore()
    for f in FILES:
        ts.add_sample(f)
        for _name, seq in fasta_reader(TESTS + "/" + f):
            ts.add_sequence(seq)
    idx = ESAIndex.construct(ts)
    mums = idx.getmultimums(minlength=20, minn=2)
    ours = []
    for l, n, coords in mums:
        ours.append((int(l), int(n), frozenset(
            (int(s), int(p)) for s, p in coords
        )))

    assert len(ours) == len(ref), (len(ours), len(ref))
    # same multiset; order may differ between the two stack walks'
    # emission orders, so compare sorted
    key = lambda m: (m[0], m[1], tuple(sorted(m[2])))
    assert sorted(ours, key=key) == sorted(ref, key=key)
