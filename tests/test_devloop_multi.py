"""Byte-identity tests for the multi-genome whole-recursion device
loop (index/devloop.rem_device_multi + align/rem._rem_device_multi_loop
replay): the complete multi recursion — windowed multiMUM enumeration,
all-live-sample filter + segment() subset, positional trim_overlap,
sum-of-pairs chain, largest pick, 3-class split (leading/trailing/
parallel), per-dim boundary repair — as ONE dispatch, replayed in
serial LIFO pop order.  GFA must equal the host engine's byte for
byte."""

import os
import tempfile

import numpy as np
import pytest


def _genomes(seed, L, N, nmut):
    rng = np.random.default_rng(seed)
    anc = rng.integers(0, 4, L)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    out = []
    for k in range(N):
        g = anc.copy()
        m = rng.random(L) < 0.02
        g[m] = (g[m] + rng.integers(1, 4, int(m.sum()))) % 4
        s = bytearray(bases[g].tobytes())
        for _ in range(nmut):
            p = int(rng.integers(0, len(s)))
            ln = int(rng.integers(1, 30))
            if rng.random() < 0.5:
                del s[p:p + ln]
            else:
                s[p:p] = bases[rng.integers(0, 4, ln)].tobytes()
        out.append(("g%d" % k, bytes(s).decode()))
    return out


def _gfa(gen, frontier):
    from reveal_tpu.align.graphops import prune_nodes
    from reveal_tpu.align.rem import align_seqs
    from reveal_tpu.core.io_gfa import seq2node, write_gfa

    G, idx = align_seqs(gen, minlength=20, frontier=frontier)
    prune_nodes(G, T=idx.main.T)
    seq2node(G, idx.main.T)
    fn = tempfile.mktemp(suffix=".gfa")
    write_gfa(G, None, outputfile=fn)
    with open(fn, "rb") as fh:
        b = fh.read()
    os.unlink(fn)
    return b


@pytest.mark.parametrize(
    "seed,L,N,nmut",
    [
        (3, 2000, 3, 4),
        (13, 1000, 6, 5),
        (19, 1200, 6, 12),
        (37, 2200, 7, 7),
    ],
)
def test_multi_device_loop_byte_identical(seed, L, N, nmut):
    gen = _genomes(seed, L, N, nmut)
    host = _gfa(gen, frontier=False)
    dev = _gfa(gen, frontier=True)
    assert dev == host


def test_multi_device_loop_engaged(caplog):
    """The frontier path must actually run the one-dispatch multi loop
    (not silently fall back) on an eligible input."""
    from reveal_tpu.align.rem import align_seqs
    from reveal_tpu.index import devloop

    gen = _genomes(3, 2000, 3, 4)
    devloop.LAST_STATS.clear()
    align_seqs(gen, minlength=20, frontier=True)
    assert devloop.LAST_STATS.get("dispatches", 0) >= 1
    assert devloop.LAST_STATS.get("abort") == 0
