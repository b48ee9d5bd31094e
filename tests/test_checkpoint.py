"""Checkpoint/resume of the rem recursion via the anchor-decision log
(align/anchorlog.py): the deterministic LIFO pop order means replaying
logged picks rebuilds the exact alignment state, so a truncated log
(simulating preemption) must resume to a byte-identical graph."""

import json

import numpy as np
import pytest

from reveal_tpu.align.rem import align_genomes
from reveal_tpu.core.io_fasta import fasta_writer
from reveal_tpu.core.io_gfa import write_gfa


def _mkpair(tmp_path, n=1500, seed=3):
    rng = np.random.default_rng(seed)
    base = "".join(rng.choice(list("ACGT"), size=n))
    mut = list(base)
    for _ in range(12):
        mut[int(rng.integers(0, len(mut)))] = "ACGT"[
            int(rng.integers(0, 4))
        ]
    fa1, fa2 = str(tmp_path / "a.fa"), str(tmp_path / "b.fa")
    fasta_writer(fa1, [("a", base)])
    fasta_writer(fa2, [("b", "".join(mut))])
    return [fa1, fa2]


def _gfa_bytes(tmp_path, G, idx, name):
    out = str(tmp_path / name)
    write_gfa(G, idx.main.T, out)
    with open(out, "rb") as f:
        return f.read()


def test_checkpoint_full_run_matches_plain(tmp_path):
    files = _mkpair(tmp_path)
    ck = str(tmp_path / "anchors.jsonl")
    G1, i1 = align_genomes(files, minlength=8)
    G2, i2 = align_genomes(files, minlength=8, checkpoint=ck)
    assert _gfa_bytes(tmp_path, G1, i1, "p.gfa") == _gfa_bytes(
        tmp_path, G2, i2, "c.gfa"
    )
    with open(ck) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    assert len(lines) > 2  # header + several decisions
    # a third run replays the complete log and still matches
    G3, i3 = align_genomes(files, minlength=8, checkpoint=ck)
    assert _gfa_bytes(tmp_path, G1, i1, "p2.gfa") == _gfa_bytes(
        tmp_path, G3, i3, "r.gfa"
    )


def test_checkpoint_resume_from_truncated_log(tmp_path):
    files = _mkpair(tmp_path, seed=11)
    ck = str(tmp_path / "anchors.jsonl")
    G1, i1 = align_genomes(files, minlength=8, checkpoint=ck)
    want = _gfa_bytes(tmp_path, G1, i1, "full.gfa")
    with open(ck) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    total = len(lines) - 1
    assert total >= 4, "fixture too small to truncate meaningfully"
    # simulate preemption: keep the header and the first half of the
    # decisions, plus a torn partial record from a crash mid-append
    with open(ck, "w") as f:
        f.write("\n".join(lines[: 1 + total // 2]) + "\n")
        f.write('{"m": [13,')  # torn line
    G2, i2 = align_genomes(files, minlength=8, checkpoint=ck)
    assert _gfa_bytes(tmp_path, G2, i2, "res.gfa") == want
    # the resumed run must have re-logged the remainder
    with open(ck) as f:
        relines = [ln for ln in f.read().splitlines() if ln]
    assert len(relines) == len(lines)
    for a, b in zip(relines, lines):
        assert json.loads(a) == json.loads(b)


def test_checkpoint_multigenome_resume(tmp_path):
    """3-way alignment: multiMUM picks (w>2 coordinate tuples) must
    round-trip through the log and resume byte-identically."""
    rng = np.random.default_rng(23)
    base = "".join(rng.choice(list("ACGT"), size=1200))
    files = []
    for i, name in enumerate(["ga", "gb", "gc"]):
        mut = list(base)
        for _ in range(6 + 4 * i):
            mut[int(rng.integers(0, len(mut)))] = "ACGT"[
                int(rng.integers(0, 4))
            ]
        fn = str(tmp_path / (name + ".fa"))
        fasta_writer(fn, [(name, "".join(mut))])
        files.append(fn)
    ck = str(tmp_path / "anchors.jsonl")
    G1, i1 = align_genomes(files, minlength=8, checkpoint=ck)
    want = _gfa_bytes(tmp_path, G1, i1, "full3.gfa")
    with open(ck) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    assert len(lines) >= 5
    with open(ck, "w") as f:
        f.write("\n".join(lines[: 1 + (len(lines) - 1) // 2]) + "\n")
    G2, i2 = align_genomes(files, minlength=8, checkpoint=ck)
    assert _gfa_bytes(tmp_path, G2, i2, "res3.gfa") == want


def test_checkpoint_generic_picker_path(tmp_path, monkeypatch):
    """With the native fast pick disabled the picker takes the generic
    tuple path (trim/maptooffsets/chain in Python); its picks must
    round-trip the log identically too."""
    monkeypatch.setenv("REVEAL_TPU_DISABLE_FASTPICK", "1")
    files = _mkpair(tmp_path, seed=17)
    ck = str(tmp_path / "anchors.jsonl")
    G1, i1 = align_genomes(files, minlength=8, checkpoint=ck)
    want = _gfa_bytes(tmp_path, G1, i1, "g.gfa")
    with open(ck) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    with open(ck, "w") as f:
        f.write("\n".join(lines[: 1 + (len(lines) - 1) // 2]) + "\n")
    G2, i2 = align_genomes(files, minlength=8, checkpoint=ck)
    assert _gfa_bytes(tmp_path, G2, i2, "gr.gfa") == want


def test_checkpoint_header_mismatch_refuses(tmp_path):
    files = _mkpair(tmp_path, seed=5)
    ck = str(tmp_path / "anchors.jsonl")
    align_genomes(files, minlength=8, checkpoint=ck)
    # different picker settings -> refuse
    with pytest.raises(ValueError, match="header mismatch"):
        align_genomes(files, minlength=9, checkpoint=ck)
    # different inputs -> refuse
    (tmp_path / "o").mkdir(exist_ok=True)
    other = _mkpair(tmp_path / "o", seed=6)
    with pytest.raises(ValueError, match="header mismatch"):
        align_genomes(other, minlength=8, checkpoint=ck)


def test_checkpoint_rejects_other_drivers(tmp_path):
    files = _mkpair(tmp_path, seed=7)
    ck = str(tmp_path / "anchors.jsonl")
    with pytest.raises(ValueError, match="serial LIFO"):
        align_genomes(files, minlength=8, checkpoint=ck, threads=2)
