"""Differential tests against golden fixtures emitted by the REFERENCE
engine's own C code (refbench/refbench.c, which links the reference's
libdivsufsort compiled in place and re-runs its Kasai-LCP + getmums
scan; reveallib/interface.c:216-253, reveallib/reveal.c:55-131).

These pin our index layer to the reference's actual ground truth —
text construction, suffix order, LCP convention and MUM semantics —
rather than only to our own numpy twin.  Fixtures are committed under
tests/fixtures/ref_golden/ (regenerate with refbench/build.sh +
`refbench a.fa b.fa 20 --fixture PREFIX --no-rem`).
"""

import json
import pathlib

import numpy as np
import pytest

FIXDIR = pathlib.Path(__file__).parent / "fixtures" / "ref_golden"

CASES = ["1a1b", "2a2b"]


def _fnv1a64(data: bytes) -> str:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return "%016x" % h


def _fnv1a64_np(arr: np.ndarray) -> str:
    # byte-identical to refbench's fnv1a64 over the int32 array
    return _fnv1a64(np.ascontiguousarray(arr, dtype=np.int32).tobytes())


def _build(case, ref_fixture_dir):
    from reveal_tpu.core.io_fasta import fasta_reader
    from reveal_tpu.core.textstore import TextStore

    names = {"1a1b": ("1a.fa", "1b.fa"), "2a2b": ("2a.fa", "2b.fa")}[case]
    ts = TextStore()
    for fn in names:
        path = ref_fixture_dir / fn
        if not path.exists():
            pytest.skip("reference fasta %s not available" % fn)
        ts.add_sample(str(path))
        for _, seq in fasta_reader(str(path)):
            ts.add_sequence(seq)
    return ts.build()


@pytest.fixture(scope="module", params=CASES)
def golden(request, ref_fixture_dir):
    case = request.param
    meta_path = FIXDIR / ("%s.json" % case)
    if not meta_path.exists():
        pytest.skip("golden fixture %s missing" % case)
    meta = json.loads(meta_path.read_text())
    T, SO, nsep = _build(case, ref_fixture_dir)
    from reveal_tpu.index.suffix import lcp_from_sa_np, suffix_array_np

    try:
        from reveal_tpu.native import build_esa_native

        SA, LCP, SAi = build_esa_native(T)
    except Exception:
        SA = suffix_array_np(T)
        LCP = lcp_from_sa_np(T, SA)
    return case, meta, T, SO, nsep, np.asarray(SA), np.asarray(LCP)


def test_text_matches_reference(golden):
    case, meta, T, SO, nsep, SA, LCP = golden
    assert len(T) == meta["n"], "text construction differs from reference"
    assert int(nsep[0]) == meta["nsep0"]


def test_sa_matches_reference_divsufsort(golden):
    case, meta, T, SO, nsep, SA, LCP = golden
    assert SA[:8].tolist() == meta["sa_head"]
    assert SA[-8:].tolist() == meta["sa_tail"]
    assert _fnv1a64_np(SA) == meta["sa_fnv1a64"], (
        "suffix order differs from reference divsufsort on %s" % case
    )


def test_lcp_matches_reference_kasai(golden):
    """Our LCP equals the reference Kasai with matches stopped at '$'.

    Deliberate deviation (TODO.md "known deviations"): the reference
    lets '$'=='$' extend an LCP across sample boundaries (a handful of
    cells per text, meaningless for anchoring); we cap at the
    sentinel.  The fixture carries both hashes so the deviation stays
    pinned to exactly that — any other divergence still fails."""
    case, meta, T, SO, nsep, SA, LCP = golden
    assert int(LCP.max()) == meta["lcp_max"]
    assert _fnv1a64_np(LCP) == meta["lcp_sentinel_capped_fnv1a64"], (
        "LCP differs from sentinel-capped reference Kasai on %s" % case
    )


def test_mums_match_reference_getmums(golden):
    case, meta, T, SO, nsep, SA, LCP = golden
    from reveal_tpu.index.mums import pairwise_mums

    ours = pairwise_mums(
        T, SA, LCP, int(nsep[0]), minl=meta["minl"], rem_format=False
    )
    got = [(int(l), int(a), int(b)) for l, (a, b), _rc in ours]
    want = [
        tuple(int(x) for x in line.split())
        for line in (FIXDIR / ("%s.mums.txt" % case)).read_text().splitlines()
    ]
    assert len(got) == meta["n_mums"] == len(want)
    # reference emits in SA-scan order; ours is also SA-scan order
    assert got == want, "MUM list differs from reference getmums on %s" % case
