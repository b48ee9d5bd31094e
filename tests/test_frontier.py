"""Batched device-frontier recursion vs the LIFO reference loop.

Per-segment decisions are independent, so both drivers must produce the
same aligned node set (same intervals, same offsets) — only traversal
and hence GFA numbering order may differ."""

import numpy as np
import pytest

from reveal_tpu.align.rem import align_genomes
from reveal_tpu.core.io_fasta import fasta_writer
from reveal_tpu.index.frontier import frontier_mums, pack_segments


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


def _node_state(G):
    return sorted(
        (n, tuple(sorted(G.nodes[n]["offsets"].items())),
         G.nodes[n].get("aligned", 0))
        for n in G.nodes
        if isinstance(n, tuple)
    )


def test_frontier_matches_lifo(tmp_path):
    fa1, fa2 = _pair(tmp_path)
    G1, idx1 = align_genomes([fa1, fa2], backend="np")
    G2, idx2 = align_genomes([fa1, fa2], backend="np", frontier=True)
    assert _node_state(G1) == _node_state(G2)
    assert np.array_equal(idx1.main.T, idx2.main.T)  # same lowercasing


def test_frontier_matches_lifo_multicontig(tmp_path):
    rng = np.random.default_rng(9)
    c1 = "".join(rng.choice(list("ACGT"), size=1500))
    c2 = "".join(rng.choice(list("ACGT"), size=1200))
    m1 = list(c1)
    for _ in range(15):
        m1[int(rng.integers(0, len(m1)))] = "ACGT"[int(rng.integers(0, 4))]
    fa1 = str(tmp_path / "m1.fa")
    fa2 = str(tmp_path / "m2.fa")
    fasta_writer(fa1, [("x1", c1), ("x2", c2)])
    fasta_writer(fa2, [("y1", "".join(m1)), ("y2", c2)])
    G1, _ = align_genomes([fa1, fa2], backend="np")
    G2, _ = align_genomes([fa1, fa2], backend="np", frontier=True)
    assert _node_state(G1) == _node_state(G2)


def test_packed_mask_matches_per_segment():
    """frontier_mums over a packed pair of segments == per-segment host
    scans."""
    import jax.numpy as jnp

    from reveal_tpu.core.textstore import TextStore
    from reveal_tpu.index.mums import pairwise_mums
    from reveal_tpu.index.suffix import lcp_from_sa_np, suffix_array_np

    rng = np.random.default_rng(3)
    base = "".join(rng.choice(list("ACGT"), size=700))
    mut = list(base)
    for _ in range(10):
        mut[int(rng.integers(0, len(mut)))] = "ACGT"[int(rng.integers(0, 4))]
    ts = TextStore()
    ts.add_sample("a")
    ts.add_sequence(base)
    ts.add_sample("b")
    ts.add_sequence("".join(mut))
    T, SO, nsep = ts.build()
    SA = suffix_array_np(T)
    LCP = lcp_from_sa_np(T, SA)

    # split the root SA into two interleaved pseudo-segments with valid
    # per-segment LCPs (running-min recompute, like split_segments does)
    sel = np.zeros(len(SA), dtype=bool)
    sel[::2] = True

    def child(mask):
        pos = np.nonzero(mask)[0]
        csa = SA[pos]
        clcp = np.zeros(len(pos), dtype=np.int64)
        for j in range(1, len(pos)):
            clcp[j] = LCP[pos[j - 1] + 1 : pos[j] + 1].min()
        return csa.astype(np.int32), clcp.astype(np.int32)

    segs = [child(sel), child(~sel)]
    got = frontier_mums(segs, jnp.asarray(T), int(nsep[0]), 15)
    for (csa, clcp), mums in zip(segs, got):
        want = pairwise_mums(
            T, csa.astype(np.int64), clcp.astype(np.int64),
            int(nsep[0]), minl=15,
        )
        assert sorted(mums) == sorted(want)


def test_pack_segments_shapes():
    segs = [
        (np.arange(5, dtype=np.int32), np.zeros(5, np.int32)),
        (np.arange(3, dtype=np.int32), np.zeros(3, np.int32)),
    ]
    SA, LCP, SEG = pack_segments(segs, n_groups=2)
    assert SA.shape == LCP.shape == SEG.shape
    assert SA.shape[0] == 2
    assert (SA.shape[1] & (SA.shape[1] - 1)) == 0  # power of two
    # each segment lives wholly in one group
    for si in range(2):
        rows = {g for g in range(2) if (SEG[g] == si).any()}
        assert len(rows) == 1
    assert (SEG == -1).sum() == SA.size - 8


def test_frontier_multigenome_matches_lifo(tmp_path):
    """>2-sample alignments ride the batched device multiMUM path (the
    PSV/NSV re-expression of reveal.c:436-580) — no host fallback — and
    must match the LIFO loop's node state exactly."""
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

    G1, idx1 = align_genomes(files, backend="np")
    G2, idx2 = align_genomes(files, backend="np", frontier=True)
    assert _node_state(G1) == _node_state(G2)
    assert np.array_equal(idx1.main.T, idx2.main.T)


def test_frontier_repair_path(tmp_path):
    """Repetitive text exercises the boundary-repair (bubble_sort)
    detection + host fix-up; graphs must still match the LIFO loop."""
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

    G1, idx1 = align_genomes([fa1, fa2], backend="np", minlength=15)
    G2, idx2 = align_genomes(
        [fa1, fa2], backend="np", minlength=15, frontier=True
    )
    assert _node_state(G1) == _node_state(G2)
    assert np.array_equal(idx1.main.T, idx2.main.T)
