"""Multi-device mesh tests on the virtual 8-device CPU mesh
(conftest provisions it): the sharded pipeline step's psum-merged MUM
count must equal the host per-segment scans, and the sharded pair-HMM
totals must match the single-device kernels."""

import numpy as np
import pytest

from reveal_tpu.core.textstore import TextStore
from reveal_tpu.index.frontier import pack_segments
from reveal_tpu.index.mums import pairwise_mums
from reveal_tpu.index.suffix import lcp_from_sa_np, suffix_array_np


@pytest.fixture(scope="module")
def mesh8():
    import jax

    from reveal_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_pipeline_step_counts_match_host(mesh8):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from reveal_tpu.hmm.pairhmm import _pad_with_dummy, posterior_np
    from reveal_tpu.parallel.mesh import build_pipeline_step

    rng = np.random.default_rng(21)
    base = "".join(rng.choice(list("ACGT"), size=500))
    mut = list(base)
    for _ in range(8):
        mut[int(rng.integers(0, len(mut)))] = "ACGT"[int(rng.integers(0, 4))]
    ts = TextStore()
    ts.add_sample("a")
    ts.add_sequence(base)
    ts.add_sample("b")
    ts.add_sequence("".join(mut))
    T, SO, nsep = ts.build()
    sa = suffix_array_np(T)
    lcp = lcp_from_sa_np(T, sa)

    # 16 pseudo-segments with per-segment running-min LCPs
    nseg = 16
    segs = []
    for s in range(nseg):
        pos = np.arange(s, len(sa), nseg)
        csa = sa[pos]
        clcp = np.zeros(len(pos), dtype=np.int64)
        for j in range(1, len(pos)):
            clcp[j] = lcp[pos[j - 1] + 1 : pos[j] + 1].min()
        segs.append((csa.astype(np.int32), clcp.astype(np.int32)))
    SA, LCP, SEG = pack_segments(segs, n_groups=8)

    # host truth: per-segment scans with minl=1 (the step counts all
    # valid candidates, so compare against minl=1)
    want = sum(
        len(
            pairwise_mums(
                T, csa.astype(np.int64), clcp.astype(np.int64),
                int(nsep[0]), minl=1,
            )
        )
        for csa, clcp in segs
    )

    B, L = 8, 32
    s1 = ["".join(rng.choice(list("ACGT"), size=24)) for _ in range(B)]
    s2 = ["".join(rng.choice(list("ACGT"), size=28)) for _ in range(B)]
    xb = np.stack([_pad_with_dummy(x.encode(), L) for x in s1])
    yb = np.stack([_pad_with_dummy(x.encode(), L) for x in s2])
    lx = np.array([len(x) for x in s1], dtype=np.int32)
    ly = np.array([len(x) for x in s2], dtype=np.int32)

    mesh = mesh8
    axis = mesh.axis_names[0]
    step = build_pipeline_step(mesh, nsep0=int(nsep[0]))
    shard = NamedSharding(mesh, P(axis))
    grouped = NamedSharding(mesh, P(axis, None))
    out = step(
        jax.device_put(T, NamedSharding(mesh, P())),
        jax.device_put(SA, grouped),
        jax.device_put(LCP, grouped),
        jax.device_put(SEG, grouped),
        jax.device_put(xb, grouped),
        jax.device_put(yb, grouped),
        jax.device_put(lx, shard),
        jax.device_put(ly, shard),
    )
    count, cl, cp, cells, logprob = jax.block_until_ready(out)
    assert int(count) == want
    assert int(cells) == int(np.sum(lx.astype(np.int64) * ly))
    # psum'd pair-HMM log-prob equals the sum of scalar-oracle totals
    tot = sum(posterior_np(a, b)[1] for a, b in zip(s1, s2))
    assert abs(float(logprob) - tot) < 1e-2 * max(1.0, abs(tot))


def test_make_mesh_sizes():
    import jax

    from reveal_tpu.parallel.mesh import make_mesh

    for n in (1, 2, 4, 8):
        if len(jax.devices()) < n:
            continue
        m = make_mesh(n)
        assert m.devices.size == n


def test_mesh_frontier_rem_matches_single_device(tmp_path):
    """Distributed rem: the frontier state sharded over an 8-device mesh
    (GSPMD partitions the kernels + inserts collectives) must produce the
    same graph as the single-device frontier and the LIFO loop."""
    import numpy as np

    from reveal_tpu.align.rem import align_genomes
    from reveal_tpu.core.io_fasta import fasta_writer
    from reveal_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(31)
    base = "".join(rng.choice(list("ACGT"), size=5000))
    mut = list(base)
    for _ in range(40):
        i = int(rng.integers(0, len(mut)))
        if rng.random() < 0.5:
            mut[i] = "ACGT"[int(rng.integers(0, 4))]
        else:
            del mut[i]
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


def test_mesh_enumerate_multi_matches_gspmd(mesh8):
    """The O(n/P) shard_map multi enumerate (radius-W NSV scans +
    distributed text gather + replicated-nsep sample ids) must return
    exactly the GSPMD enum_mm candidate set on the same frontier
    state — including the sa/so window matrices and the ok flags."""
    import numpy as np

    from reveal_tpu.index.devfrontier import DeviceFrontier

    rng = np.random.default_rng(47)
    base = "".join(rng.choice(list("ACGT"), size=1500))
    ts = TextStore()
    for s in range(4):
        seq = list(base)
        for _ in range(12):
            i = int(rng.integers(0, len(seq)))
            r = rng.random()
            if r < 0.6:
                seq[i] = "ACGT"[int(rng.integers(0, 4))]
            elif r < 0.8:
                del seq[i]
            else:
                seq.insert(i, "ACGT"[int(rng.integers(0, 4))])
        ts.add_sample("s%d" % s)
        ts.add_sequence("".join(seq))
    T, SO, nsep = ts.build()
    sa = suffix_array_np(T).astype(np.int64)
    lcp = lcp_from_sa_np(T, sa).astype(np.int64)

    single = DeviceFrontier(T, sa, lcp, SO, int(nsep[0]), 4)
    sharded = DeviceFrontier(
        T, sa, lcp, SO, int(nsep[0]), 4, mesh=mesh8, nsep=nsep
    )
    for minl, minn in ((20, 2), (10, 3), (8, 4)):
        got1 = single.enumerate_multi(minl, minn)
        got2 = sharded.enumerate_multi(minl, minn)
        assert len(got1) == len(got2)
        for a1, a2 in zip(got1, got2):
            assert np.array_equal(np.asarray(a1), np.asarray(a2)), (
                minl, minn,
            )


def test_mesh_frontier_rem_multi_matches_single_device(tmp_path):
    """4-genome mesh rem end-to-end: the O(n/P) multi enumerate feeds
    the same picker/apply chain and must reproduce the single-device
    frontier graph node-for-node."""
    import numpy as np

    from reveal_tpu.align.rem import align_genomes
    from reveal_tpu.core.io_fasta import fasta_writer
    from reveal_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(53)
    base = "".join(rng.choice(list("ACGT"), size=2500))
    fas = []
    for s in range(4):
        seq = list(base)
        for _ in range(15):
            i = int(rng.integers(0, len(seq)))
            if rng.random() < 0.5:
                seq[i] = "ACGT"[int(rng.integers(0, 4))]
            else:
                del seq[i]
        fa = str(tmp_path / ("m%d.fa" % s))
        fasta_writer(fa, [("m%d" % s, "".join(seq))])
        fas.append(fa)

    def node_state(G):
        return sorted(
            (n, tuple(sorted(G.nodes[n]["offsets"].items())),
             G.nodes[n].get("aligned", 0))
            for n in G.nodes
            if isinstance(n, tuple)
        )

    G1, i1 = align_genomes(fas, backend="np", frontier=True)
    mesh = make_mesh(8)
    G2, i2 = align_genomes(fas, backend="np", mesh=mesh)
    assert node_state(G1) == node_state(G2)
    assert np.array_equal(i1.main.T, i2.main.T)
