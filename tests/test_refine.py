"""Bubble refinement end-to-end tests."""

from reveal_tpu.core.io_gfa import read_gfa
from reveal_tpu.graph.extract import extract
from reveal_tpu.hmm.refine import refine_all

GFA_REGION = """H\tVN:Z:1.0
S\t1\tAAAACC
S\t2\tGGTACGTAGGA
S\t3\tGGTACCTAGG
S\t4\tTTTTGG
L\t1\t+\t2\t+\t0M
L\t1\t+\t3\t+\t0M
L\t2\t+\t4\t+\t0M
L\t3\t+\t4\t+\t0M
P\tx\t1+,2+,4+\t0M
P\ty\t1+,3+,4+\t0M
"""


def test_refine_region_bubble(tmp_path):
    p = tmp_path / "g.gfa"
    p.write_text(GFA_REGION)
    G = read_gfa(str(p))

    before_x = extract(G, "x")
    before_y = extract(G, "y")
    assert before_x == "AAAACC" + "GGTACGTAGGA" + "TTTTGG"

    G = refine_all(G, minlength=1, minsize=1, nrefinements=5)

    # paths survive refinement byte-for-byte
    assert extract(G, "x") == before_x
    assert extract(G, "y") == before_y

    # the bubble should now contain shared aligned nodes
    aligned = [
        n
        for n in G.nodes
        if not isinstance(n, str)
        and G.nodes[n].get("aligned", 0)
        and len(G.nodes[n]["offsets"]) == 2
        and n not in (1, 4)
    ]
    assert aligned, "expected shared aligned nodes inside the refined bubble"


def test_refine_noop_when_no_bubbles(tmp_path):
    gfa = """H\tVN:Z:1.0
S\t1\tAAAA
S\t2\tCCCC
L\t1\t+\t2\t+\t0M
P\tx\t1+,2+\t0M
P\ty\t1+,2+\t0M
"""
    p = tmp_path / "g2.gfa"
    p.write_text(gfa)
    G = read_gfa(str(p))
    G2 = refine_all(G, minlength=1)
    assert extract(G2, "x") == "AAAACCCC"


def test_refine_nproc_deterministic(tmp_path):
    """The --nproc thread pool must produce the same graph as the serial
    loop (results collected, splice applied in input order)."""
    from reveal_tpu.core.io_gfa import write_gfa

    outs = []
    for nproc in (1, 4):
        p = tmp_path / ("g%d.gfa" % nproc)
        p.write_text(GFA_REGION)
        G = read_gfa(str(p))
        G = refine_all(
            G, minlength=1, minsize=1, nrefinements=5, nproc=nproc
        )
        of = str(tmp_path / ("out%d.gfa" % nproc))
        write_gfa(G, None, outputfile=of)
        outs.append(open(of).read())
    assert outs[0] == outs[1]
