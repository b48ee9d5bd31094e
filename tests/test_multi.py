"""MultiDiGraph-mode rem: inversion ('-') edges and '*' original-layout
paths of gfa inputs ride through the alignment (reference rem.py:527 +
utils.py Multi branches)."""

import gzip
import os

import numpy as np
import pytest

from reveal_tpu.cli import main
from reveal_tpu.core.encoding import rc_str
from reveal_tpu.core.io_fasta import fasta_writer
from reveal_tpu.core.io_gfa import read_gfa
from reveal_tpu.graph.pangraph import MultiPanGraph


def run(args):
    rc = main([str(a) for a in args])
    assert rc == 0 or rc is None


def _seqs(seed=13):
    rng = np.random.default_rng(seed)
    A = "".join(rng.choice(list("ACGT"), size=600))
    B = "".join(rng.choice(list("ACGT"), size=400))
    C = "".join(rng.choice(list("ACGT"), size=600))
    return A, B, C


def _write_inversion_gfa(path, A, B, C):
    """ref walks A+ B+ C+; '*q' walks A+ B- C+ (B inverted)."""
    with open(path, "w") as f:
        f.write("H\tVN:Z:1.0\n")
        f.write("S\t1\t%s\n" % A)
        f.write("S\t2\t%s\n" % B)
        f.write("S\t3\t%s\n" % C)
        f.write("L\t1\t+\t2\t+\t0M\n")
        f.write("L\t2\t+\t3\t+\t0M\n")
        f.write("L\t1\t+\t2\t-\t0M\n")
        f.write("L\t2\t-\t3\t+\t0M\n")
        f.write("P\tref\t1+,2+,3+\t0M,0M\n")
        f.write("P\t*q\t1+,2-,3+\t0M,0M\n")


def test_read_gfa_multi_keeps_inversions(tmp_path):
    A, B, C = _seqs()
    gfa = str(tmp_path / "inv.gfa")
    _write_inversion_gfa(gfa, A, B, C)

    # DiGraph flavor: '-' edges and '*q' dropped
    Gd = read_gfa(gfa)
    assert list(Gd.graph["path2id"]) == ["ref"]
    assert all(
        d["ofrom"] == "+" and d["oto"] == "+"
        for _, _, d in Gd.edges(data=True)
        if not isinstance(_, str)
    )

    # Multi flavor: both survive
    Gm = read_gfa(gfa, graph=MultiPanGraph(), remap=True)
    assert set(Gm.graph["path2id"]) == {"ref", "*q"}
    orients = {
        (d["ofrom"], d["oto"])
        for u, v, d in Gm.edges(data=True)
        if not isinstance(u, str) and not isinstance(v, str)
    }
    assert ("+", "-") in orients and ("-", "+") in orients
    qid = Gm.graph["path2id"]["*q"]
    # '*q' rides the inversion edges
    inv_paths = set()
    for u, v, d in Gm.edges(data=True):
        if d["ofrom"] == "-" or d["oto"] == "-":
            inv_paths |= d["paths"]
    assert qid in inv_paths


def test_rem_multi_threads_structural_path(tmp_path, capsys):
    A, B, C = _seqs()
    gfa = str(tmp_path / "inv.gfa")
    _write_inversion_gfa(gfa, A, B, C)

    # a second genome: the ref layout with a few substitutions
    rng = np.random.default_rng(5)
    g2 = list(A + B + C)
    for _ in range(20):
        g2[int(rng.integers(0, len(g2)))] = "ACGT"[int(rng.integers(0, 4))]
    fasta_writer(str(tmp_path / "g2.fa"), [("g2", "".join(g2))])

    out = str(tmp_path / "m.gfa")
    run(["rem", gfa, tmp_path / "g2.fa", "-o", out, "--multi",
         "--backend", "np"])

    txt = open(out).read()
    plines = {
        l.split("\t")[1]: l.split("\t")[2]
        for l in txt.split("\n")
        if l.startswith("P\t")
    }
    assert set(plines) == {"ref", "*q", "g2"}
    # the original-layout path still traverses at least one '-' step
    assert "-" in plines["*q"]
    llines = [l for l in txt.split("\n") if l.startswith("L\t")]
    assert any(l.split("\t")[2] == "-" or l.split("\t")[4] == "-"
               for l in llines)

    # the aligned (non-'*') paths round-trip via the DiGraph reader
    run(["extract", out, "ref"])
    got = "".join(capsys.readouterr().out.split("\n")[1:]).strip()
    assert got == A + B + C
    run(["extract", out, "g2"])
    got2 = "".join(capsys.readouterr().out.split("\n")[1:]).strip()
    assert got2 == "".join(g2)

    # and real alignment happened between the graph and g2
    G = read_gfa(out)
    shared = sum(
        (n[1] - n[0]) if isinstance(n, tuple) else len(G.nodes[n]["seq"])
        for n in G.nodes
        if not isinstance(n, str) and len(G.nodes[n]["offsets"]) > 1
    )
    assert shared > 1000


def test_transform_rem_multi_closure(tmp_path, capsys, monkeypatch):
    """transform output (breakpoint graph with '*' path) -> rem --multi:
    the reference's intended closure (align_genomes reads the transform
    graph as MultiDiGraph, rem.py:526-547)."""
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(31)
    A = "".join(rng.choice(list("ACGT"), size=3000))
    B = "".join(rng.choice(list("ACGT"), size=3000))
    ref = A + B
    qry = A + rc_str(B)  # inversion of the second half
    fasta_writer("ref.fa", [("chr1", ref)])
    fasta_writer("qry.fa", [("ctg1", qry)])
    run(["transform", "ref.fa", "qry.fa", "-m", "30", "-c", "100",
         "--mincluster", "30", "--minchainsum", "30",
         "--backend", "np", "-o", "bp"])

    g3 = list(ref)
    for _ in range(30):
        g3[int(rng.integers(0, len(g3)))] = "ACGT"[int(rng.integers(0, 4))]
    fasta_writer("g3.fa", [("g3", "".join(g3))])

    run(["rem", "bp.gfa.gz", "g3.fa", "-o", "closure.gfa", "--multi",
         "--backend", "np"])
    txt = open("closure.gfa").read()
    names = [l.split("\t")[1] for l in txt.split("\n")
             if l.startswith("P\t")]
    # transform names its paths <prefix>_<chrom>_<n> / *<ctg>_<n>
    assert any(n.startswith("*ctg1") for n in names) and "g3" in names
    run(["extract", "closure.gfa", "g3"])
    got = "".join(capsys.readouterr().out.split("\n")[1:]).strip()
    assert got == "".join(g3)
