"""Mesh rem at real scale: 1 Mbp pairwise over the 8-device CPU mesh
must reproduce the single-device engine's graph and lowercased text
exactly.  This is the O(n/P) shard_map frontier path end-to-end
(enumerate halos + distributed text gather, comparator-network level
sort, shard-local repair windows) — ~4 min on the emulated mesh (8
virtual devices convoying on 4 cores; a real pod runs the layers on
ICI).  Set REVEAL_TPU_SKIP_SLOW=1 to skip locally."""

import os

import numpy as np
import pytest


@pytest.mark.skipif(
    bool(os.environ.get("REVEAL_TPU_SKIP_SLOW")),
    reason="slow test skipped by env",
)
def test_mesh_rem_1mbp_matches_single_device(tmp_path):
    import jax

    from reveal_tpu.align.rem import align_genomes
    from reveal_tpu.core.io_fasta import fasta_writer
    from reveal_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    rng = np.random.default_rng(101)
    base = "".join(rng.choice(list("ACGT"), size=500_000))
    mut = list(base)
    for _ in range(2500):
        i = int(rng.integers(0, len(mut)))
        r = rng.random()
        if r < 0.5:
            mut[i] = "ACGT"[int(rng.integers(0, 4))]
        elif r < 0.75:
            del mut[i]
        else:
            mut.insert(i, "ACGT"[int(rng.integers(0, 4))])
    fa1 = str(tmp_path / "a.fa")
    fa2 = str(tmp_path / "b.fa")
    fasta_writer(fa1, [("a", base)])
    fasta_writer(fa2, [("b", "".join(mut))])

    def node_state(G):
        return sorted(
            (n, tuple(sorted(G.nodes[n]["offsets"].items())),
             G.nodes[n].get("aligned", 0))
            for n in G.nodes
            if isinstance(n, tuple)
        )

    G1, i1 = align_genomes([fa1, fa2], backend="np")
    mesh = make_mesh(8)
    G2, i2 = align_genomes([fa1, fa2], backend="np", mesh=mesh)
    assert node_state(G1) == node_state(G2)
    assert np.array_equal(i1.main.T, i2.main.T)
