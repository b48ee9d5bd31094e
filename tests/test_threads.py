"""Threaded host recursion (rem -t/--threads) vs the serial LIFO loop.

The reference's `rem -t` runs a pthread pool whose queue order races, so
node ids vary run to run (reveal.c:731-1338).  Here the threaded loop is
level-synchronous and deterministic: same aligned node state as the
serial loop (same intervals, offsets, lowercasing), independent of the
thread count, and byte-identical output across repeat runs.
"""

import numpy as np

from reveal_tpu.align.rem import align_genomes, align_seqs
from reveal_tpu.core.io_fasta import fasta_writer


def _node_state(G):
    return sorted(
        (n, tuple(sorted(G.nodes[n]["offsets"].items())),
         G.nodes[n].get("aligned", 0))
        for n in G.nodes
        if isinstance(n, tuple)
    )


def _pair(tmp_path, seed=2, n=4000, nmut=40):
    rng = np.random.default_rng(seed)
    base = "".join(rng.choice(list("ACGT"), size=n))
    mut = list(base)
    for _ in range(nmut):
        i = int(rng.integers(0, len(mut)))
        if rng.random() < 0.5:
            mut[i] = "ACGT"[int(rng.integers(0, 4))]
        else:
            del mut[i]
    fa1 = str(tmp_path / "a.fa")
    fa2 = str(tmp_path / "b.fa")
    fasta_writer(fa1, [("a", base)])
    fasta_writer(fa2, [("b", "".join(mut))])
    return fa1, fa2


def test_threads_match_serial_pairwise(tmp_path):
    fa1, fa2 = _pair(tmp_path)
    G1, idx1 = align_genomes([fa1, fa2])
    G2, idx2 = align_genomes([fa1, fa2], threads=3)
    assert _node_state(G1) == _node_state(G2)
    assert np.array_equal(idx1.main.T, idx2.main.T)  # same lowercasing


def test_threads_match_serial_multigenome(tmp_path):
    rng = np.random.default_rng(17)
    base = "".join(rng.choice(list("ACGT"), size=3000))
    files = []
    for k in range(4):
        mut = list(base)
        for _ in range(25):
            i = int(rng.integers(0, len(mut)))
            if rng.random() < 0.5:
                mut[i] = "ACGT"[int(rng.integers(0, 4))]
            else:
                del mut[i]
        fa = str(tmp_path / ("g%d.fa" % k))
        fasta_writer(fa, [("g%d" % k, "".join(mut))])
        files.append(fa)
    G1, idx1 = align_genomes(files)
    G2, idx2 = align_genomes(files, threads=4)
    assert _node_state(G1) == _node_state(G2)
    assert np.array_equal(idx1.main.T, idx2.main.T)


def test_threads_match_serial_repair_path(tmp_path):
    """Repetitive text exercises the boundary repair inside the
    parallel phase 3."""
    rng = np.random.default_rng(23)
    unit = "".join(rng.choice(list("ACGT"), size=120))
    base = (unit * 12) + "".join(rng.choice(list("ACGT"), size=2000))
    mut = list(base)
    for _ in range(20):
        i = int(rng.integers(0, len(mut)))
        mut[i] = "ACGT"[int(rng.integers(0, 4))]
    fa1 = str(tmp_path / "r1.fa")
    fa2 = str(tmp_path / "r2.fa")
    fasta_writer(fa1, [("a", base)])
    fasta_writer(fa2, [("b", "".join(mut))])
    G1, idx1 = align_genomes([fa1, fa2], minlength=15)
    G2, idx2 = align_genomes([fa1, fa2], minlength=15, threads=3)
    assert _node_state(G1) == _node_state(G2)
    assert np.array_equal(idx1.main.T, idx2.main.T)


def test_threads_deterministic_across_counts(tmp_path):
    """Output is independent of the worker count (unlike the
    reference's pthread mode) and stable across repeat runs —
    including node ids, so GFA output is byte-identical."""
    from reveal_tpu.core.io_gfa import seq2node, write_gfa

    fa1, fa2 = _pair(tmp_path, seed=5)
    outs = []
    for threads in (1, 3, 3):
        G, idx = align_genomes([fa1, fa2], threads=threads)
        seq2node(G, idx.main.T)
        fn = str(tmp_path / ("t%d_%d.gfa" % (threads, len(outs))))
        write_gfa(G, None, outputfile=fn)
        with open(fn, "rb") as f:
            outs.append(f.read())
    assert outs[0] == outs[1] == outs[2]


def test_threads_library_api_seedsize():
    """align_seqs(threads=) incl. the seedsize skip-chain carry."""
    rng = np.random.default_rng(11)
    base = "".join(rng.choice(list("ACGT"), size=2500))
    mut = list(base)
    for _ in range(12):
        i = int(rng.integers(0, len(mut)))
        mut[i] = "ACGT"[int(rng.integers(0, 4))]
    G1, idx1 = align_seqs(
        [("a", base), ("b", "".join(mut))], seedsize=100
    )
    G2, idx2 = align_seqs(
        [("a", base), ("b", "".join(mut))], seedsize=100, threads=2
    )
    assert _node_state(G1) == _node_state(G2)
    assert np.array_equal(idx1.main.T, idx2.main.T)
