"""refine --checkpoint: per-bubble result log (hmm/refinelog.py).
Resuming from a truncated log must skip the stored bubbles' MSA work
and still produce a byte-identical refined graph."""

import numpy as np
import pytest

from reveal_tpu.core.io_gfa import read_gfa, seq2node, write_gfa
from reveal_tpu.hmm.refine import refine_all


@pytest.fixture(scope="module")
def bubbly_gfa(tmp_path_factory):
    """A pairwise alignment graph with several refinable bubbles."""
    from reveal_tpu.align.graphops import prune_nodes
    from reveal_tpu.align.rem import align_genomes
    from reveal_tpu.core.io_fasta import fasta_writer

    td = tmp_path_factory.mktemp("ckr")
    rng = np.random.default_rng(31)
    base = "".join(rng.choice(list("ACGT"), size=2000))
    mut = list(base)
    # clustered edits -> multi-node bubbles the selector accepts
    for c in range(6):
        lo = 150 + 300 * c
        for k in range(4):
            mut[lo + k * 3] = "ACGT"[int(rng.integers(0, 4))]
    fa1, fa2 = str(td / "x.fa"), str(td / "y.fa")
    fasta_writer(fa1, [("x", base)])
    fasta_writer(fa2, [("y", "".join(mut))])
    G, idx = align_genomes([fa1, fa2], minlength=8)
    prune_nodes(G, T=idx.main.T)
    seq2node(G, idx.main.T)
    fn = str(td / "bubbly.gfa")
    write_gfa(G, None, outputfile=fn)
    return fn


def _refine_bytes(gfa, tmp_path, name, **kw):
    G = read_gfa(gfa)
    G = refine_all(G, minlength=1, minsize=1, nrefinements=3, **kw)
    out = str(tmp_path / name)
    write_gfa(G, None, outputfile=out)
    with open(out, "rb") as f:
        return f.read()


def test_refine_checkpoint_matches_plain(bubbly_gfa, tmp_path):
    ck = str(tmp_path / "bubbles.jsonl")
    plain = _refine_bytes(bubbly_gfa, tmp_path, "plain.gfa")
    ckd = _refine_bytes(
        bubbly_gfa, tmp_path, "ck.gfa", checkpoint=ck
    )
    assert ckd == plain
    with open(ck) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    assert len(lines) >= 3, "expected several logged bubbles"

    # full-log resume: every bubble served from the log
    again = _refine_bytes(
        bubbly_gfa, tmp_path, "ck2.gfa", checkpoint=ck
    )
    assert again == plain


def test_refine_checkpoint_resume_truncated(bubbly_gfa, tmp_path):
    ck = str(tmp_path / "bubbles.jsonl")
    plain = _refine_bytes(bubbly_gfa, tmp_path, "p.gfa")
    _refine_bytes(bubbly_gfa, tmp_path, "full.gfa", checkpoint=ck)
    with open(ck) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    total = len(lines) - 1
    assert total >= 2
    # keep header + first record + a torn tail
    with open(ck, "w") as f:
        f.write("\n".join(lines[:2]) + "\n")
        f.write('{"k": [7, 9], "r": "dGVhcg')  # torn
    resumed = _refine_bytes(
        bubbly_gfa, tmp_path, "res.gfa", checkpoint=ck
    )
    assert resumed == plain
    with open(ck) as f:
        relines = [ln for ln in f.read().splitlines() if ln]
    assert len(relines) == len(lines)


def test_refine_checkpoint_header_mismatch(bubbly_gfa, tmp_path):
    ck = str(tmp_path / "bubbles.jsonl")
    _refine_bytes(bubbly_gfa, tmp_path, "a.gfa", checkpoint=ck)
    with pytest.raises(ValueError, match="header mismatch"):
        _refine_bytes(
            bubbly_gfa,
            tmp_path,
            "b.gfa",
            checkpoint=ck,
            mindiff=1,
        )
    with pytest.raises(ValueError, match="header mismatch"):
        _refine_bytes(
            bubbly_gfa,
            tmp_path,
            "c.gfa",
            checkpoint=ck,
            checkpoint_meta={"gfa_sha1": "different"},
        )
