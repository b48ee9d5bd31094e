"""Graph simplification: unary-chain contraction.

Port of utils.contract/contract_nodes
(/root/reference/reveal/utils.py:23-59): stretches of nodes connected by
single in/out edges are merged into their first node, concatenating
sequences.
"""

from __future__ import annotations

from typing import List

from .pangraph import PanGraph


def contract(G: PanGraph, topsort: List) -> List:
    if not topsort:
        return topsort
    newtopsort = [topsort[0]]
    stretches = [[]]
    pnode = topsort[0]
    for node in topsort[1:]:
        pred = list(G.predecessors(node))
        suc = list(G.successors(pnode))
        if pred == [pnode] and suc == [node]:
            if len(stretches[-1]) == 0:
                stretches[-1].append(pnode)
            stretches[-1].append(node)
        else:
            if len(stretches[-1]) != 0:
                stretches.append([])
            newtopsort.append(node)
        pnode = node

    for stretch in stretches:
        if stretch:
            contract_nodes(G, stretch)
    return newtopsort


def contract_nodes(G: PanGraph, nodes: List) -> None:
    G.nodes[nodes[0]]["seq"] = "".join(
        G.nodes[n].get("seq", "") for n in nodes
    )
    for _, n2, data in list(G.out_edges(nodes[-1], data=True)):
        G.add_edge(nodes[0], n2, **data)
    for n in nodes[1:]:
        G.remove_node(n)
