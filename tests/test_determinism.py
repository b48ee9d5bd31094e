"""Determinism and backend-equivalence guarantees."""

import numpy as np

from reveal_tpu.align.rem import align_seqs
from reveal_tpu.core.io_gfa import seq2node, write_gfa


def _graph_sig(G, T):
    seq2node(G, T)
    nodes = sorted(
        (str(n), G.nodes[n]["seq"], tuple(sorted(G.nodes[n]["offsets"].items())))
        for n in G.nodes
        if not isinstance(n, str)
    )
    edges = sorted(
        (str(u), str(v), tuple(sorted(d["paths"])))
        for u, v, d in G.edges(data=True)
    )
    return nodes, edges


def _pop(seed, n=3, length=4000):
    rng = np.random.default_rng(seed)
    base = "".join(rng.choice(list("ACGT"), size=length))

    def mut(seq):
        s = list(seq)
        for _ in range(25):
            i = int(rng.integers(0, len(s)))
            s[i] = "ACGT"[int(rng.integers(0, 4))]
        for _ in range(8):
            i = int(rng.integers(0, len(s)))
            if rng.random() < 0.5:
                s.insert(i, "ACGT"[int(rng.integers(0, 4))])
            else:
                del s[i]
        return "".join(s)

    return [("g%d" % i, mut(base)) for i in range(n)]


def test_rem_is_deterministic():
    aobjs = _pop(21)
    G1, i1 = align_seqs(list(aobjs), minlength=15, backend="np")
    G2, i2 = align_seqs(list(aobjs), minlength=15, backend="np")
    assert _graph_sig(G1, i1.main.T) == _graph_sig(G2, i2.main.T)


def test_native_and_numpy_engines_agree():
    """The native C fast paths (ESA, MUM scan, split, chain) must produce
    the same graph as the pure-numpy engine."""
    import reveal_tpu.native as nat

    if nat.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")

    aobjs = _pop(22)
    G1, i1 = align_seqs(list(aobjs), minlength=15, backend="np")

    # disable every native entry point
    saved = (
        nat.pairwise_mums_native,
        nat.split3_native,
        nat.chain_native,
    )
    nat.pairwise_mums_native = lambda *a, **k: None
    nat.split3_native = lambda *a, **k: None
    nat.chain_native = lambda *a, **k: None
    try:
        G2, i2 = align_seqs(list(aobjs), minlength=15, backend="np")
    finally:
        (
            nat.pairwise_mums_native,
            nat.split3_native,
            nat.chain_native,
        ) = saved
    assert _graph_sig(G1, i1.main.T) == _graph_sig(G2, i2.main.T)


def test_full_pipeline_deterministic(tmp_path, monkeypatch):
    """rem + unzip + refine twice -> byte-identical outputs (the MSA's
    random-bipartition refinement is seeded)."""
    import numpy as np

    from reveal_tpu.cli import main
    from reveal_tpu.core.io_fasta import fasta_writer

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(6)
    base = "".join(rng.choice(list("ACGT"), size=3000))
    mut = list(base)
    for _ in range(50):
        i = int(rng.integers(0, len(mut)))
        if rng.random() < 0.5:
            mut[i] = "ACGT"[int(rng.integers(0, 4))]
        else:
            del mut[i]
    fasta_writer("a.fa", [("a", base)])
    fasta_writer("b.fa", [("b", "".join(mut))])

    outs = []
    for run_i in range(2):
        pre = "r%d" % run_i
        main(["rem", "a.fa", "b.fa", "-o", pre + ".gfa",
              "--backend", "np"])
        main(["unzip", pre + ".gfa", "-u10"])
        main(["refine", pre + ".unzipped.gfa", "--all",
              "--maxsize", "2000", "-o", pre + ".ref.gfa",
              "--backend", "np"])
        outs.append(open(pre + ".ref.gfa").read())
    assert outs[0] == outs[1]


def test_index_widths_agree():
    """The 32-bit native index twin (texts < 2^31, reference
    setup.py:21-31 builds reveallib + reveallib64) must produce the same
    graph as the 64-bit twin on the same input."""
    import reveal_tpu.native as nat

    if nat.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")

    aobjs = _pop(23)
    G1, i1 = align_seqs(list(aobjs), minlength=15, backend="native")
    assert i1.main.SAi.dtype == np.int32  # small text -> 32-bit twin

    saved = nat.index_dtype
    nat.index_dtype = lambda n: np.int64
    try:
        G2, i2 = align_seqs(list(aobjs), minlength=15, backend="native")
        assert i2.main.SAi.dtype == np.int64
    finally:
        nat.index_dtype = saved
    assert _graph_sig(G1, i1.main.T) == _graph_sig(G2, i2.main.T)


def test_fast_pick_path_agrees(tmp_path, monkeypatch):
    """The pairwise array fast path (picker.pick_pairwise: native trim +
    arithmetic offset map + native chain) must write a byte-identical GFA
    to the generic tuple path on file inputs."""
    import reveal_tpu.native as nat

    if nat.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")

    from reveal_tpu.cli import main
    from reveal_tpu.core.io_fasta import fasta_writer

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(31)
    base = "".join(rng.choice(list("ACGT"), size=20000))
    mut = list(base)
    for _ in range(220):
        i = int(rng.integers(0, len(mut)))
        r = rng.random()
        if r < 0.5:
            mut[i] = "ACGT"[int(rng.integers(0, 4))]
        elif r < 0.75:
            mut.insert(i, "ACGT"[int(rng.integers(0, 4))])
        else:
            del mut[i]
    fasta_writer("a.fa", [("a", base)])
    fasta_writer("b.fa", [("b", "".join(mut))])

    main(["rem", "a.fa", "b.fa", "-o", "fast.gfa", "-m", "15"])
    monkeypatch.setenv("REVEAL_TPU_DISABLE_FASTPICK", "1")
    main(["rem", "a.fa", "b.fa", "-o", "gen.gfa", "-m", "15"])
    assert open("fast.gfa").read() == open("gen.gfa").read()

    # and with seeding enabled (exercises the skip-list construction)
    monkeypatch.delenv("REVEAL_TPU_DISABLE_FASTPICK")
    main(["rem", "a.fa", "b.fa", "-o", "fast_s.gfa", "-m", "15",
          "--seedsize", "200"])
    monkeypatch.setenv("REVEAL_TPU_DISABLE_FASTPICK", "1")
    main(["rem", "a.fa", "b.fa", "-o", "gen_s.gfa", "-m", "15",
          "--seedsize", "200"])
    assert open("fast_s.gfa").read() == open("gen_s.gfa").read()


def test_trim_overlap_native_matches_python():
    """Randomized differential test of the native trim kernel."""
    import reveal_tpu.native as nat

    if nat.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")

    from reveal_tpu.align.chaining import trim_overlap
    from reveal_tpu.native import trim_overlap_native

    rng = np.random.default_rng(7)
    for _ in range(500):
        k = int(rng.integers(0, 12))
        L = rng.integers(1, 30, size=k)
        A = rng.integers(0, 120, size=k)
        B = rng.integers(200, 320, size=k)
        mums = [
            (int(L[i]), 2, ((0, int(A[i])), (1, int(B[i]))))
            for i in range(k)
        ]
        try:
            ref = trim_overlap(list(mums))
        except IndexError:
            continue  # the reference path raises on this input
        P = (
            np.stack([A, B], axis=1)
            if k
            else np.zeros((0, 2), np.int64)
        )
        Lt, Pt = trim_overlap_native(L, P)
        got = [
            (int(Lt[i]), 2, ((0, int(Pt[i, 0])), (1, int(Pt[i, 1]))))
            for i in range(len(Lt))
        ]
        assert got == ref


def test_multi_fast_pick_agrees(tmp_path, monkeypatch):
    """The native d-dim multiMUM pick must write a byte-identical GFA to
    the generic tuple path on a multi-genome run."""
    import reveal_tpu.native as nat

    if nat.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")

    from reveal_tpu.cli import main
    from reveal_tpu.core.io_fasta import fasta_writer

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(37)
    base = "".join(rng.choice(list("ACGT"), size=12000))
    names = []
    for gi in range(4):
        mut = list(base)
        for _ in range(140):
            i = int(rng.integers(0, len(mut)))
            r = rng.random()
            if r < 0.5:
                mut[i] = "ACGT"[int(rng.integers(0, 4))]
            elif r < 0.75:
                mut.insert(i, "ACGT"[int(rng.integers(0, 4))])
            else:
                del mut[i]
        nm = "g%d" % gi
        fasta_writer(nm + ".fa", [(nm, "".join(mut))])
        names.append(nm + ".fa")

    main(["rem"] + names + ["-o", "fast.gfa", "-m", "15"])
    monkeypatch.setenv("REVEAL_TPU_DISABLE_FASTPICK", "1")
    main(["rem"] + names + ["-o", "gen.gfa", "-m", "15"])
    assert open("fast.gfa").read() == open("gen.gfa").read()

    monkeypatch.delenv("REVEAL_TPU_DISABLE_FASTPICK")
    main(["rem"] + names + ["-o", "fast_s.gfa", "-m", "15",
          "--seedsize", "150"])
    monkeypatch.setenv("REVEAL_TPU_DISABLE_FASTPICK", "1")
    main(["rem"] + names + ["-o", "gen_s.gfa", "-m", "15",
          "--seedsize", "150"])
    assert open("fast_s.gfa").read() == open("gen_s.gfa").read()
