"""End-to-end REM alignment tests.

Primary oracle (like the reference suite's extract round-trip,
test_reveal.py:151-159): every path through the produced variation graph
must reproduce its input sequence exactly.
"""

import numpy as np
import pytest

from reveal_tpu.align.rem import align_seqs
from reveal_tpu.core.io_gfa import read_gfa, seq2node, write_gfa


def path_seq(G, T, name):
    """Reconstruct a sample's sequence by offset-sorted traversal."""
    sid = G.graph["path2id"][name]
    nodes = [
        (d["offsets"][sid], n)
        for n, d in G.nodes.items()
        if not isinstance(n, str) and sid in d.get("offsets", {})
    ]
    nodes.sort(key=lambda x: x[0])
    out = []
    pos = 0
    for off, n in nodes:
        assert off == pos, "offset gap for %s at node %s: %d != %d" % (
            name,
            n,
            off,
            pos,
        )
        if "seq" in G.nodes[n]:
            s = G.nodes[n]["seq"]
        else:
            s = T[n[0] : n[1]].tobytes().decode()
        out.append(s.upper())
        pos = off + len(s)
    return "".join(out)


def test_tiny_pair():
    s1 = "ACTTGCTAGCTTAGCCTGATCGGACT"
    s2 = "ACTAGCTTAGCCTGATCGAACT"
    G, idx = align_seqs([("1", s1), ("2", s2)], minlength=1, backend="np")
    assert path_seq(G, idx.main.T, "1") == s1
    assert path_seq(G, idx.main.T, "2") == s2
    # some alignment must have happened
    aligned = [
        n
        for n, d in G.nodes.items()
        if d.get("aligned", 0) != 0 and not isinstance(n, str)
    ]
    assert aligned


def _mutate(rng, seq, nsubs, nindel):
    s = list(seq)
    for _ in range(nsubs):
        i = int(rng.integers(0, len(s)))
        s[i] = "ACGT"[int(rng.integers(0, 4))]
    for _ in range(nindel):
        i = int(rng.integers(0, len(s)))
        if rng.random() < 0.5:
            s.insert(i, "ACGT"[int(rng.integers(0, 4))])
        else:
            del s[i]
    return "".join(s)


def test_random_pair_roundtrip():
    rng = np.random.default_rng(42)
    base = "".join(rng.choice(list("ACGT"), size=3000))
    mut = _mutate(rng, base, 30, 10)
    G, idx = align_seqs([("a", base), ("b", mut)], minlength=15, backend="np")
    assert path_seq(G, idx.main.T, "a") == base
    assert path_seq(G, idx.main.T, "b") == mut


def test_three_way_roundtrip():
    rng = np.random.default_rng(7)
    base = "".join(rng.choice(list("ACGT"), size=2000))
    seqs = [("g%d" % i, _mutate(rng, base, 20, 5)) for i in range(3)]
    G, idx = align_seqs(seqs, minlength=15, backend="np")
    for name, seq in seqs:
        assert path_seq(G, idx.main.T, name) == seq


def test_gfa_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    base = "".join(rng.choice(list("ACGT"), size=1500))
    mut = _mutate(rng, base, 15, 5)
    G, idx = align_seqs([("x", base), ("y", mut)], minlength=15, backend="np")

    # emulate the CLI path: attach seqs, add start/end bookkeeping, write
    seq2node(G, idx.main.T)
    # align_seqs strips the global markers; rebuild minimal start bookkeeping
    # for the writer by declaring sources/sinks
    import uuid

    for name in ("x", "y"):
        sid = G.graph["path2id"][name]
        first = min(
            (
                (d["offsets"][sid], n)
                for n, d in G.nodes.items()
                if sid in d.get("offsets", {})
            ),
        )[1]
        last_off, last = max(
            (
                (d["offsets"][sid], n)
                for n, d in G.nodes.items()
                if sid in d.get("offsets", {})
            ),
        )
        s = uuid.uuid4().hex
        e = uuid.uuid4().hex
        G.add_node(s, offsets={sid: 0}, endpoint=True)
        G.add_node(e, offsets={sid: G.graph["id2end"][sid]}, endpoint=True)
        G.graph["startnodes"].append(s)
        G.graph["endnodes"].append(e)
        G.add_edge(s, first, paths={sid}, ofrom="+", oto="+")
        G.add_edge(last, e, paths={sid}, ofrom="+", oto="+")

    out = str(tmp_path / "pair.gfa")
    write_gfa(G, idx.main.T, outputfile=out)

    H = read_gfa(out)
    assert set(H.graph["paths"]) == {"x", "y"}
    assert path_seq(H, None, "x") == base
    assert path_seq(H, None, "y") == mut
