"""Graph-vs-graph and graph-vs-genome alignment (reference tests 05/06)."""

import numpy as np

from reveal_tpu.align.graphops import prune_nodes
from reveal_tpu.align.rem import align_genomes
from reveal_tpu.core.io_fasta import fasta_writer
from reveal_tpu.core.io_gfa import seq2node, write_gfa


def path_seq(G, T, name):
    sid = G.graph["path2id"][name]
    nodes = sorted(
        (d["offsets"][sid], n)
        for n, d in G.nodes.items()
        if not isinstance(n, str) and sid in d.get("offsets", {})
    )
    out = []
    pos = 0
    for off, n in nodes:
        assert off == pos, (name, n, off, pos)
        s = G.nodes[n].get("seq") or T[n[0] : n[1]].tobytes().decode()
        out.append(s.upper())
        pos = off + len(s)
    return "".join(out)


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


def _make_pair_gfa(tmp_path, tag, seqs):
    files = []
    for name, seq in seqs:
        fn = str(tmp_path / ("%s.fa" % name))
        fasta_writer(fn, [(name, seq)])
        files.append(fn)
    G, idx = align_genomes(files, minlength=15, backend="np")
    seq2node(G, idx.main.T)
    out = str(tmp_path / ("%s.gfa" % tag))
    write_gfa(G, idx.main.T, outputfile=out)
    return out


def test_graph_vs_graph(tmp_path):
    rng = np.random.default_rng(11)
    base = "".join(rng.choice(list("ACGT"), size=2500))
    seqs = {
        "s%d" % i: _mutate(rng, base, 25, 8) for i in range(4)
    }
    g1 = _make_pair_gfa(
        tmp_path, "ab", [("s0", seqs["s0"]), ("s1", seqs["s1"])]
    )
    g2 = _make_pair_gfa(
        tmp_path, "cd", [("s2", seqs["s2"]), ("s3", seqs["s3"])]
    )

    G, idx = align_genomes([g1, g2], minlength=15, backend="np")
    T = idx.main.T
    for name, seq in seqs.items():
        assert path_seq(G, T, name) == seq, name
    # cross-graph alignment must have happened
    cross = [
        n
        for n, d in G.nodes.items()
        if not isinstance(n, str)
        and d.get("aligned", 0)
        and len(
            {G.graph["path2id"][k] for k in ("s0", "s1")}
            & set(d["offsets"])
        )
        and len(
            {G.graph["path2id"][k] for k in ("s2", "s3")}
            & set(d["offsets"])
        )
    ]
    assert cross, "no cross-graph aligned nodes"


def test_graph_vs_fasta(tmp_path):
    rng = np.random.default_rng(12)
    base = "".join(rng.choice(list("ACGT"), size=2000))
    s0 = _mutate(rng, base, 20, 5)
    s1 = _mutate(rng, base, 20, 5)
    s2 = _mutate(rng, base, 20, 5)
    g1 = _make_pair_gfa(tmp_path, "ab2", [("t0", s0), ("t1", s1)])
    f2 = str(tmp_path / "t2.fa")
    fasta_writer(f2, [("t2", s2)])

    G, idx = align_genomes([g1, f2], minlength=15, backend="np")
    T = idx.main.T
    for name, seq in (("t0", s0), ("t1", s1), ("t2", s2)):
        assert path_seq(G, T, name) == seq, name
