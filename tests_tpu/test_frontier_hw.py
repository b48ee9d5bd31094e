"""Hardware-gated test of the device-resident frontier recursion.

tests/test_frontier.py pins the frontier-vs-LIFO equivalence on the CPU
backend; this exercises the same enum/apply/repair Pallas+XLA kernels on
the real accelerator (TODO item: extend the hardware-gated suite to the
frontier kernels).  Small input so the per-shape executable loads stay
within test budget."""

import numpy as np


def _node_state(G):
    return sorted(
        (n, tuple(sorted(G.nodes[n]["offsets"].items())),
         G.nodes[n].get("aligned", 0))
        for n in G.nodes
        if isinstance(n, tuple)
    )


def test_frontier_device_matches_host(tpu_backend, tmp_path):
    from reveal_tpu.align.rem import align_genomes
    from reveal_tpu.core.io_fasta import fasta_writer

    rng = np.random.default_rng(11)
    base = "".join(rng.choice(list("ACGT"), size=1200))
    mut = list(base)
    for _ in range(12):
        i = int(rng.integers(0, len(mut)))
        if rng.random() < 0.5:
            mut[i] = "ACGT"[int(rng.integers(0, 4))]
        else:
            del mut[i]
    fa1 = str(tmp_path / "a.fa")
    fa2 = str(tmp_path / "b.fa")
    fasta_writer(fa1, [("a", base)])
    fasta_writer(fa2, [("b", "".join(mut))])

    # host LIFO reference (numpy backend, no device involvement)
    G1, idx1 = align_genomes([fa1, fa2], backend="np")
    # device frontier: enum/apply/repair kernels run on the accelerator
    G2, idx2 = align_genomes([fa1, fa2], backend="np", frontier=True)
    assert _node_state(G1) == _node_state(G2)
    assert np.array_equal(idx1.main.T, idx2.main.T)  # same lowercasing
