"""Unit tests: repeat classification (annotate) and bubble unzip
wiggle semantics."""

import io

from reveal_tpu.graph.annotate import annotate_vcf, classify_allele


def test_classify_allele_classes():
    assert classify_allele("AAAAAA") == "homopolymer"
    assert classify_allele("ACACACAC") == "microsatellite"  # unit 2
    assert classify_allele("ACGTGA" * 3) == "microsatellite"  # unit 6
    assert classify_allele("ACGTGAC" * 3) == "minisatellite"  # unit 7
    unit = "ACGT" * 30  # 120bp unit
    assert classify_allele(unit * 1) == "microsatellite"  # 4bp period
    big = ("ACGTTGCA" * 13 + "TTT")[:101]  # aperiodic 101bp


def test_classify_nonrepeat():
    # aperiodic short sequence: no 2+ copies of any unit
    assert classify_allele("ACGTTGCA") in ("other", "mei")


def test_annotate_vcf_stream():
    vcf = (
        "##fileformat=VCFv4.1\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t100\t.\tA\tAACACAC\t.\t.\t.\n"
        "chr1\t200\t.\tATTTTTT\tA\t.\t.\t.\n"
        "chr1\t300\t.\tA\tC\t.\t.\t.\n"
    )
    out = io.StringIO()
    n = annotate_vcf(io.StringIO(vcf), out)
    assert n == 3
    lines = [
        l for l in out.getvalue().split("\n")
        if l and not l.startswith("#")
    ]
    assert len(lines) == 3
    # indel alleles classified by the inserted/deleted sequence
    assert "reveal_type=microsatellite" in lines[0]
    assert "reveal_type=homopolymer" in lines[1]
    assert "reveal_type=" in lines[2]
    # the INFO header line was added exactly once
    assert out.getvalue().count("ID=reveal_type") == 1


def _snp_graph():
    """start - AAATTT - (C | G) - GGGCCC - end for two samples."""
    from reveal_tpu.graph.pangraph import PanGraph

    G = PanGraph()
    G.graph.update(
        {
            "paths": ["s1", "s2"],
            "path2id": {"s1": 0, "s2": 1},
            "id2path": {0: "s1", 1: "s2"},
            "startnodes": [1],
            "endnodes": [4],
            "id2end": {0: 13, 1: 13},
            "noffset": 10,
        }
    )
    G.add_node(1, seq="AAATTT", offsets={0: 0, 1: 0}, aligned=1)
    G.add_node(2, seq="C", offsets={0: 6}, aligned=0)
    G.add_node(3, seq="G", offsets={1: 6}, aligned=0)
    G.add_node(4, seq="GGGCCC", offsets={0: 7, 1: 7}, aligned=1)
    G.add_edge(1, 2, paths={0}, ofrom="+", oto="+")
    G.add_edge(1, 3, paths={1}, ofrom="+", oto="+")
    G.add_edge(2, 4, paths={0}, ofrom="+", oto="+")
    G.add_edge(3, 4, paths={1}, ofrom="+", oto="+")
    return G


def test_snp_bubble_has_no_wiggle():
    from reveal_tpu.graph.bubbles import bubbles

    G = _snp_graph()
    bl = list(bubbles(G))
    assert len(bl) == 1
    b = bl[0]
    assert b.source == 1 and b.sink == 4
    # flanks disagree with the alleles: a SNP cannot shift
    assert b.getwiggle() == (0, 0)


def test_unzip_noop_on_snp():
    from reveal_tpu.graph.unzip import unzip_graph

    G = _snp_graph()
    before = {n: dict(G.nodes[n]) for n in G.nodes}
    unzip_graph(G, minunzip=0)
    # SNP bubble with zero wiggle: graph unchanged
    assert set(G.nodes) == set(before)
    for n in before:
        assert G.nodes[n].get("seq") == before[n].get("seq")


def test_contract_collapses_unary_chains():
    """simplify.contract merges runs of single-successor/predecessor
    nodes into one (utils.contract semantics)."""
    from reveal_tpu.graph.pangraph import PanGraph
    from reveal_tpu.graph.simplify import contract

    G = PanGraph()
    G.graph.update(
        {
            "paths": ["s"],
            "path2id": {"s": 0},
            "id2path": {0: "s"},
            "startnodes": [],
            "endnodes": [],
            "id2end": {0: 9},
        }
    )
    # chain 1 -> 2 -> 3, then a branch point 3 -> {4, 5}
    G.add_node(1, seq="AAA", offsets={0: 0}, aligned=0)
    G.add_node(2, seq="CCC", offsets={0: 3}, aligned=0)
    G.add_node(3, seq="GGG", offsets={0: 6}, aligned=0)
    G.add_node(4, seq="T", offsets={0: 9}, aligned=0)
    G.add_node(5, seq="A", offsets={}, aligned=0)
    G.add_edge(1, 2, paths={0}, ofrom="+", oto="+")
    G.add_edge(2, 3, paths={0}, ofrom="+", oto="+")
    G.add_edge(3, 4, paths={0}, ofrom="+", oto="+")
    G.add_edge(3, 5, paths=set(), ofrom="+", oto="+")
    order = G.topological_sort()
    contract(G, order)
    # 1-2-3 collapse into one node carrying the concatenated sequence
    seqs = {G.nodes[n].get("seq") for n in G.nodes}
    assert "AAACCCGGG" in seqs
    assert not {"AAA", "CCC"} & seqs
