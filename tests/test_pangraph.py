"""Unit tests for the graph containers (PanGraph / MultiPanGraph)."""

import pytest

from reveal_tpu.graph.pangraph import MultiPanGraph, PanGraph


def test_pangraph_add_edge_updates():
    G = PanGraph()
    G.add_edge(1, 2, paths={0}, ofrom="+", oto="+")
    G.add_edge(1, 2, paths={1})  # DiGraph: updates in place
    assert G.number_of_edges() == 1
    assert G.edge(1, 2)["paths"] == {1}


def test_multipangraph_parallel_edges():
    G = MultiPanGraph()
    k1 = G.add_edge(1, 2, paths={0}, ofrom="+", oto="+")
    k2 = G.add_edge(1, 2, paths={1}, ofrom="-", oto="-")
    assert k1 != k2
    assert G.number_of_edges() == 2
    assert G.has_edge(1, 2)
    # iterators yield one triple per parallel edge
    assert len(list(G.out_edges(1, data=True))) == 2
    assert len(list(G.in_edges(2, data=True))) == 2
    assert len(list(G.edges(data=True, keys=True))) == 2
    # keyed access
    assert G.edge(1, 2, k1)["ofrom"] == "+"
    assert G.edge(1, 2, k2)["ofrom"] == "-"
    with pytest.raises(ValueError):
        G.edge(1, 2)  # ambiguous without key
    # remove one key: edge remains; remove all: gone
    G.remove_edge(1, 2, k1)
    assert G.number_of_edges() == 1
    assert G.edge(1, 2)["ofrom"] == "-"
    G.remove_edge(1, 2)
    assert not G.has_edge(1, 2)
    assert 2 not in G.succ[1]


def test_multipangraph_remove_node_cleans_parallel():
    G = MultiPanGraph()
    G.add_edge(1, 2, paths={0}, ofrom="+", oto="+")
    G.add_edge(1, 2, paths={1}, ofrom="-", oto="-")
    G.add_edge(2, 3, paths={0}, ofrom="+", oto="+")
    G.remove_node(2)
    assert G.number_of_edges() == 0
    assert 2 not in G.nodes
    assert list(G.successors(1)) == []


def test_multipangraph_copy_and_subgraph():
    G = MultiPanGraph()
    G.add_node(1, offsets={0: 0})
    G.add_node(2, offsets={0: 5})
    G.add_node(3, offsets={0: 9})
    G.add_edge(1, 2, paths={0}, ofrom="+", oto="+")
    G.add_edge(1, 2, paths={1}, ofrom="-", oto="-")
    G.add_edge(2, 3, paths={0}, ofrom="+", oto="+")

    H = G.copy()
    assert isinstance(H, MultiPanGraph)
    assert H.number_of_edges() == 3
    # deep-ish: path sets are copies
    next(iter(H.succ[1][2].values()))["paths"].add(99)
    assert 99 not in {
        p for kd in [G.succ[1][2]] for d in kd.values() for p in d["paths"]
    }

    S = G.subgraph([1, 2])
    assert isinstance(S, MultiPanGraph)
    assert S.number_of_edges() == 2
    assert 3 not in S.nodes


def test_multipangraph_cycle_tolerated_by_components():
    # inversion back-edges create cycles; component traversal must cope
    G = MultiPanGraph()
    G.add_edge(1, 2, paths={0}, ofrom="+", oto="+")
    G.add_edge(2, 1, paths={1}, ofrom="-", oto="-")
    comps = G.weakly_connected_components()
    assert len(comps) == 1 and set(comps[0]) == {1, 2}
    with pytest.raises(ValueError):
        G.topological_sort()
