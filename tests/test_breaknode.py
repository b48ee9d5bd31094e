"""Unit tests for breaknode's orientation handling (rem.py:14-129):
nodes traversed by '-' paths get reverse chain edges and opposite-end
reattachment."""

import pytest

from reveal_tpu.align.graphops import IntervalIndex, breaknode
from reveal_tpu.graph.pangraph import MultiPanGraph, PanGraph


def _setup(multi=False):
    G = MultiPanGraph() if multi else PanGraph()
    G.graph["id2path"] = {0: "ref", 1: "*q"}
    G.graph["path2id"] = {"ref": 0, "*q": 1}
    t = IntervalIndex()
    # left (0,10) -> node (10,40) -> right (40,50), ref forward;
    # '*q' traverses (10,40) in reverse: in-edge oto='-' from right,
    # out-edge ofrom='-' to left
    for iv in [(0, 10), (10, 40), (40, 50)]:
        G.add_node(iv, offsets={0: iv[0]}, aligned=0)
        t.add(iv)
    G.add_edge((0, 10), (10, 40), paths={0}, ofrom="+", oto="+")
    G.add_edge((10, 40), (40, 50), paths={0}, ofrom="+", oto="+")
    G.add_edge((40, 50), (10, 40), paths={1}, ofrom="+", oto="-")
    G.add_edge((10, 40), (0, 10), paths={1}, ofrom="-", oto="+")
    return G, t


@pytest.mark.parametrize("multi", [False, True])
def test_breaknode_negstrand(multi):
    G, t = _setup(multi)
    mn, other = breaknode(G, t, (10, 40), 20, 10)
    assert mn == (20, 30)
    assert other == {(10, 20), (30, 40)}

    # forward chain: pn -> mn -> sn with '+/+' carrying the ref path
    assert {0} <= set().union(
        *(d["paths"] for _, _, d in G.out_edges((10, 20), data=True)
          if d["ofrom"] == "+")
    )
    # reverse chain edges exist for the '-' path
    rev1 = [d for _, v, d in G.out_edges((20, 30), data=True)
            if v == (10, 20) and d["ofrom"] == "-"]
    rev2 = [d for _, v, d in G.out_edges((30, 40), data=True)
            if v == (20, 30) and d["ofrom"] == "-"]
    assert rev1 and rev1[0]["paths"] == {1}
    assert rev2 and rev2[0]["paths"] == {1}

    # external reattachment: the '-' in-edge (oto='-') lands on the
    # SUFFIX node; the '-' out-edge (ofrom='-') leaves from the PREFIX
    inn = [(u, d) for u, _, d in G.in_edges((30, 40), data=True)
           if u == (40, 50)]
    assert inn and inn[0][1]["oto"] == "-"
    out = [(v, d) for _, v, d in G.out_edges((10, 20), data=True)
           if v == (0, 10)]
    assert out and out[0][1]["ofrom"] == "-"

    # interval index updated: old node gone, three children present
    assert t.lookup(15) == (10, 20)
    assert t.lookup(35) == (30, 40)
    assert (10, 40) not in set(t)


@pytest.mark.parametrize("multi", [False, True])
def test_breaknode_whole_node_match(multi):
    G, t = _setup(multi)
    mn, other = breaknode(G, t, (10, 40), 10, 30)
    assert mn == (10, 40) and other == set()
    assert (10, 40) not in set(t)  # removed from unaligned index
    assert (10, 40) in G.nodes  # but stays in the graph


def test_breaknode_mixed_strand_same_path_asserts():
    G, t = _setup(False)
    # a path using both orientations through one node violates the
    # reference's invariant (rem.py:72-75)
    G.add_edge((0, 10), (10, 40), paths={1}, ofrom="+", oto="+")
    with pytest.raises(AssertionError):
        breaknode(G, t, (10, 40), 20, 10)
