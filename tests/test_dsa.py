"""Distributed suffix-array construction (parallel/dsa.py) on the
8-virtual-device CPU mesh: oracle equality, plus proof that the
compiled module really communicates (collective-permute / all-gather
in the HLO) and — unlike the GSPMD route, which all-gathers full-size
sort operands — keeps every per-device array O(n/P)."""

import numpy as np
import pytest

from reveal_tpu.index.suffix import lcp_from_sa_np, suffix_array_np
from reveal_tpu.parallel.dsa import build_esa_distributed
from reveal_tpu.parallel.mesh import make_mesh


def _mktext(rng, n, nseq=2):
    """Concatenated samples with $ sentinels, reveal text conventions."""
    parts = []
    per = max(1, n // nseq - 1)
    for _ in range(nseq):
        parts.append(rng.choice(list(b"ACGT"), size=per).astype(np.uint8))
        parts.append(np.frombuffer(b"$", dtype=np.uint8))
    return np.concatenate(parts)


@pytest.mark.parametrize("n,nseq", [(64, 1), (1000, 2), (4096, 3), (5000, 4)])
def test_dsa_matches_oracle(n, nseq):
    rng = np.random.default_rng(n)
    T = _mktext(rng, n, nseq)
    mesh = make_mesh(8)
    sa, lcp, sai = build_esa_distributed(T, mesh)
    sa_ref = suffix_array_np(T)
    np.testing.assert_array_equal(sa, sa_ref)
    np.testing.assert_array_equal(lcp, lcp_from_sa_np(T, sa_ref))
    np.testing.assert_array_equal(sai[sa], np.arange(len(T)))


def test_network_layers_shapes():
    """Bitonic depth for power-of-two meshes, odd-even otherwise."""
    from reveal_tpu.parallel.dsa import _network_layers

    assert len(_network_layers(8)) == 6       # log2(8)*(log2(8)+1)/2
    assert len(_network_layers(256)) == 36    # pod scale: 36 vs 256
    assert len(_network_layers(6)) == 6       # odd-even fallback
    # every layer is an involution partnered consistently
    for part, keep_low in _network_layers(8):
        for i, p in enumerate(part):
            assert part[p] == i
            if p != i:
                assert keep_low[i] != keep_low[p]


@pytest.mark.parametrize("P", [4, 6])
def test_dsa_submesh_sizes(P):
    """Both network branches on real meshes: P=4 bitonic, P=6 odd-even."""
    rng = np.random.default_rng(100 + P)
    T = _mktext(rng, 777, 2)
    mesh = make_mesh(P)
    sa, lcp, sai = build_esa_distributed(T, mesh)
    np.testing.assert_array_equal(sa, suffix_array_np(T))
    np.testing.assert_array_equal(lcp, lcp_from_sa_np(T, sa))
    np.testing.assert_array_equal(sai[sa], np.arange(len(T)))


def test_dsa_with_n_runs():
    rng = np.random.default_rng(7)
    T = _mktext(rng, 900, 2)
    T[100:140] = ord("N")
    mesh = make_mesh(8)
    sa, lcp, sai = build_esa_distributed(T, mesh)
    np.testing.assert_array_equal(sa, suffix_array_np(T))
    np.testing.assert_array_equal(lcp, lcp_from_sa_np(T, sa))


def test_rem_with_jax_dist_backend(tmp_path):
    """End-to-end: `rem --backend jax-dist` builds its ESA with the
    distributed suffix sort and produces the same graph as numpy."""
    from reveal_tpu.align.rem import align_genomes
    from reveal_tpu.core.io_fasta import fasta_writer

    rng = np.random.default_rng(21)
    base = "".join(rng.choice(list("ACGT"), size=800))
    mut = list(base)
    for _ in range(8):
        mut[int(rng.integers(0, len(mut)))] = "ACGT"[
            int(rng.integers(0, 4))
        ]
    fa1 = str(tmp_path / "a.fa")
    fa2 = str(tmp_path / "b.fa")
    fasta_writer(fa1, [("a", base)])
    fasta_writer(fa2, [("b", "".join(mut))])
    G1, idx1 = align_genomes([fa1, fa2], backend="np")
    G2, idx2 = align_genomes([fa1, fa2], backend="jax-dist")

    def state(G):
        return sorted(
            (n, tuple(sorted(G.nodes[n]["offsets"].items())))
            for n in G.nodes
            if isinstance(n, tuple)
        )

    assert state(G1) == state(G2)
    assert np.array_equal(idx1.main.T, idx2.main.T)


def test_dsa_force64_matches_32():
    """int64 twin of the distributed build (the path texts >= 2^31
    take), exercised at reduced scale like the single-device use64."""
    rng = np.random.default_rng(13)
    T = _mktext(rng, 700, 2)
    mesh = make_mesh(8)
    sa32, lcp32, sai32 = build_esa_distributed(T, mesh)
    sa64, lcp64, sai64 = build_esa_distributed(T, mesh, force64=True)
    np.testing.assert_array_equal(sa32, sa64)
    np.testing.assert_array_equal(lcp32, lcp64)
    np.testing.assert_array_equal(sai32, sai64)


@pytest.mark.parametrize("stride", [1, 3, "sqrt", 100])
def test_dsa_lcp_ckpt_stride_matches_stored(stride):
    """Low-HBM LCP mode: checkpoint-every-s-levels + regenerate-on-
    descent must reproduce the stored-levels LCP exactly (stride 1 =
    checkpoint everything, 100 > nlev = regenerate everything from the
    byte ranks, 'sqrt' = the memory-optimal stride)."""
    rng = np.random.default_rng(31)
    T = _mktext(rng, 1200, 3)
    mesh = make_mesh(8)
    sa0, lcp0, sai0 = build_esa_distributed(T, mesh)
    sa1, lcp1, sai1 = build_esa_distributed(
        T, mesh, lcp_ckpt_stride=stride
    )
    np.testing.assert_array_equal(sa0, sa1)
    np.testing.assert_array_equal(lcp0, lcp1)
    np.testing.assert_array_equal(sai0, sai1)
    np.testing.assert_array_equal(lcp0, lcp_from_sa_np(T, sa0))


def test_dsa_ckpt_stride_rejects_bad():
    mesh = make_mesh(8)
    T = _mktext(np.random.default_rng(1), 100, 1)
    with pytest.raises(ValueError):
        build_esa_distributed(T, mesh, lcp_ckpt_stride=0)


def test_dsa_rejects_zero_bytes():
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        build_esa_distributed(np.zeros(16, np.uint8), mesh)


def test_dsa_hlo_is_actually_distributed():
    """The module must contain real collectives — guards against the
    GSPMD failure mode where the 'sharded' build compiles replicated."""
    import jax
    import jax.numpy as jnp

    from reveal_tpu.parallel.dsa import _get_dsa_fn

    mesh = make_mesh(8)
    fn = _get_dsa_fn(mesh, sh=128, nlev=11, use64=False)
    txt = (
        fn.lower(jnp.zeros(1024, jnp.uint8))
        .compile()
        .as_text()
    )
    assert txt.count("collective-permute") > 0
    assert txt.count("all-gather") > 0
    # memory scaling: no device ever touches a full-size (1024,) array —
    # shards are 128 wide, merge buffers 256
    assert "s32[1024]" not in txt and "u8[1024]" not in txt
