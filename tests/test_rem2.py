"""The whole-recursion native fast path (rem2_loop, native/esa.cpp +
align/rem._rem2_native_loop): the complete pairwise LIFO recursion runs
in one native call and the anchor log is replayed through breaknode/
mergenodes — the result must be byte-identical to the per-step engine,
including node insertion order (GFA bytes compare equal)."""

import numpy as np
import pytest


def _native_or_skip():
    import reveal_tpu.native as nat

    if nat.get_lib() is None:
        pytest.skip("native lib unavailable")


def _mutate(rng, base, nsub, nins, ndel):
    mut = list(base)
    for _ in range(nsub):
        i = int(rng.integers(0, len(mut)))
        mut[i] = "ACGT"[int(rng.integers(0, 4))]
    for _ in range(nins):
        i = int(rng.integers(0, len(mut)))
        mut.insert(i, "ACGT"[int(rng.integers(0, 4))])
    for _ in range(ndel):
        i = int(rng.integers(0, len(mut)))
        del mut[i]
    return "".join(mut)


def _gfa_pair(tmp_path, monkeypatch, a, b, minl=15):
    from reveal_tpu.cli import main
    from reveal_tpu.core.io_fasta import fasta_writer

    monkeypatch.chdir(tmp_path)
    fasta_writer("a.fa", [("a", a)])
    fasta_writer("b.fa", [("b", b)])
    main(["rem", "a.fa", "b.fa", "-o", "fast.gfa", "-m", str(minl)])
    monkeypatch.setenv("REVEAL_TPU_DISABLE_FASTPICK", "1")
    main(["rem", "a.fa", "b.fa", "-o", "gen.gfa", "-m", str(minl)])
    monkeypatch.delenv("REVEAL_TPU_DISABLE_FASTPICK")
    return open("fast.gfa").read(), open("gen.gfa").read()


def test_rem2_engages(tmp_path, monkeypatch):
    """The native whole-loop actually handles the pairwise fasta case
    (guards against the fast path silently always falling back)."""
    _native_or_skip()
    import reveal_tpu.align.rem as rem

    calls = []
    orig = rem._rem2_native_loop

    def spy(G, t, root, cfg):
        r = orig(G, t, root, cfg)
        calls.append(r)
        return r

    monkeypatch.setattr(rem, "_rem2_native_loop", spy)
    rng = np.random.default_rng(7)
    base = "".join(rng.choice(list("ACGT"), size=12000))
    fast, gen = _gfa_pair(
        tmp_path, monkeypatch, base, _mutate(rng, base, 120, 20, 20)
    )
    # first CLI run engages the native loop; the second runs with
    # REVEAL_TPU_DISABLE_FASTPICK and must refuse
    assert calls[0] is not None and calls[0] > 0
    assert calls[-1] is None
    assert fast == gen


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_rem2_fuzz_byte_identical(tmp_path, monkeypatch, seed):
    _native_or_skip()
    rng = np.random.default_rng(seed)
    size = int(rng.integers(3000, 20000))
    base = "".join(rng.choice(list("ACGT"), size=size))
    b = _mutate(
        rng,
        base,
        int(rng.integers(10, 200)),
        int(rng.integers(0, 60)),
        int(rng.integers(0, 60)),
    )
    fast, gen = _gfa_pair(tmp_path, monkeypatch, base, b)
    assert fast == gen


def test_rem2_structural_edges(tmp_path, monkeypatch):
    """Anchors at sequence boundaries, whole-sequence match pieces, and
    highly repetitive content (trim + chain DP under pressure)."""
    _native_or_skip()
    rng = np.random.default_rng(11)
    core = "".join(rng.choice(list("ACGT"), size=4000))
    rep = "ACGTACGTAC" * 60
    a = core + rep + core[:1500]
    b = core + rep[:300] + core[800:2500]
    fast, gen = _gfa_pair(tmp_path, monkeypatch, a, b)
    assert fast == gen
    # identical pair: one whole-sequence anchor
    fast, gen = _gfa_pair(tmp_path, monkeypatch, core, core)
    assert fast == gen


def test_rem2_respects_config_gates(tmp_path, monkeypatch):
    """Configs outside the fast case (seedsize) must still byte-match
    the generic path (rem2 refuses; per-step loop runs)."""
    _native_or_skip()
    from reveal_tpu.cli import main
    from reveal_tpu.core.io_fasta import fasta_writer

    rng = np.random.default_rng(23)
    base = "".join(rng.choice(list("ACGT"), size=15000))
    monkeypatch.chdir(tmp_path)
    fasta_writer("a.fa", [("a", base)])
    fasta_writer("b.fa", [("b", _mutate(rng, base, 150, 25, 25))])
    main(["rem", "a.fa", "b.fa", "-o", "s_fast.gfa", "-m", "15",
          "--seedsize", "300"])
    monkeypatch.setenv("REVEAL_TPU_DISABLE_FASTPICK", "1")
    main(["rem", "a.fa", "b.fa", "-o", "s_gen.gfa", "-m", "15",
          "--seedsize", "300"])
    monkeypatch.delenv("REVEAL_TPU_DISABLE_FASTPICK")
    assert open("s_fast.gfa").read() == open("s_gen.gfa").read()
