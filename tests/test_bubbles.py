"""Bubble detection and variant calling tests."""

import io

from reveal_tpu.core.io_gfa import read_gfa, seq2node
from reveal_tpu.graph.bubbles import Variant, bubbles
from reveal_tpu.graph.varcall import VariantFilter, write_variants
from reveal_tpu.align.rem import align_seqs


def make_gfa(tmp_path, text):
    p = tmp_path / "g.gfa"
    p.write_text(text)
    return str(p)


GFA_SNP_INDEL = """H\tVN:Z:1.0
S\t1\tAAAC
S\t2\tG
S\t3\tT
S\t4\tCCTA
S\t5\tGGGG
S\t6\tTTAA
L\t1\t+\t2\t+\t0M
L\t1\t+\t3\t+\t0M
L\t2\t+\t4\t+\t0M
L\t3\t+\t4\t+\t0M
L\t4\t+\t5\t+\t0M
L\t4\t+\t6\t+\t0M
L\t5\t+\t6\t+\t0M
P\tx\t1+,2+,4+,5+,6+\t0M
P\ty\t1+,3+,4+,6+\t0M
"""


def test_snp_and_indel_bubbles(tmp_path):
    G = read_gfa(make_gfa(tmp_path, GFA_SNP_INDEL))
    bl = list(bubbles(G))
    assert len(bl) == 2
    vs = [Variant(b) for b in bl]
    types = {v.vtype for v in vs}
    assert types == {"snp", "indel"}
    snp = next(v for v in vs if v.vtype == "snp")
    assert sorted(snp.genotypes) == ["G", "T"]
    indel = next(v for v in vs if v.vtype == "indel")
    assert sorted(indel.genotypes) == ["-", "GGGG"]
    assert snp.calls["x"] != snp.calls["y"]


def test_vcf_output(tmp_path):
    G = read_gfa(make_gfa(tmp_path, GFA_SNP_INDEL))
    buf = io.StringIO()
    n = write_variants(G, fmt="vcf", out=buf)
    assert n == 2
    lines = [l for l in buf.getvalue().splitlines() if not l.startswith("#")]
    assert len(lines) == 2
    snp_line = next(l for l in lines if "snp" in l)
    f = snp_line.split("\t")
    assert f[0] == "x"  # reference defaults to first sorted path
    assert f[3] == "G" and f[4] == "T"  # ref path x carries G
    assert f[1] == "5"  # 1-based position after AAAC
    indel_line = next(l for l in lines if "indel" in l)
    f = indel_line.split("\t")
    # anchor-base prepend: last base of source "CCTA" -> REF=AGGGG, ALT=A
    assert f[3] == "AGGGG" and f[4] == "A"
    # genotype columns: x=0, y=1
    assert f[9].startswith("0:") and f[10].startswith("1:")


def test_bubbles_from_alignment():
    base = (
        "ATCGATCGGGTACGTAGCTAGCTAGCTTGCATCGATTTGGCCAAGCTAGCATCGAT"
        "CGGGTACGTAGCTCGCTAGCTTGCATCGATTTGGCCAAGCTAGC"
    )
    mut = base[:30] + "T" + base[31:]  # single substitution
    assert base[30] != "T"
    G, idx = align_seqs([("p", base), ("q", mut)], minlength=5, backend="np")
    seq2node(G, idx.main.T)
    # re-add start/end markers as the variant caller sees a read_gfa graph;
    # instead check bubble structure directly: expect at least one snp
    vs = [Variant(b) for b in bubbles(G)]
    assert any(v.vtype == "snp" for v in vs)
