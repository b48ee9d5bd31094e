"""2-host emulation of the jax.distributed mesh (two CPU subprocesses,
one device each) running the sharded candidate-MUM step."""

import os
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, %(root)r)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from reveal_tpu.parallel.distributed import init_distributed, global_mesh
    init_distributed(
        coordinator_address=%(coord)r,
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2  # one CPU device per host

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    mesh = global_mesh()
    axis = mesh.axis_names[0]

    # per-shard candidate lengths -> global psum + all_gather
    def step(lens):
        total = jax.lax.psum(jnp.sum(lens), axis)
        gathered = jax.lax.all_gather(lens, axis, tiled=True)
        return total, gathered

    fn = jax.jit(shard_map(step, mesh=mesh,
                           in_specs=P(axis), out_specs=(P(), P()),
                           check_vma=False))
    local = np.arange(4, dtype=np.int32) + 10 * (jax.process_index() + 1)
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis)), local, (8,)
    )
    total, gathered = fn(garr)
    # total = sum over both hosts' shards
    want = sum(range(4)) + 4 * 10 + sum(range(4)) + 4 * 20
    assert int(total) == want, (int(total), want)

    # distributed SA build over the 2-host mesh (parallel/dsa.py): each
    # process feeds its local text shard, checks its local SA shard
    from reveal_tpu.parallel.dsa import _get_dsa_fn
    from reveal_tpu.index.suffix import lcp_from_sa_np, suffix_array_np

    rng = np.random.default_rng(5)
    T = np.concatenate([
        rng.choice(list(b"ACGT"), size=63).astype(np.uint8),
        np.frombuffer(b"$", dtype=np.uint8),
    ])  # n = 64 = npad: no padding, SA comparable directly
    sh = 32
    me = jax.process_index()
    Tg = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(axis)), T[me * sh : (me + 1) * sh], (64,)
    )
    sa, sai, lcp = _get_dsa_fn(mesh, sh=sh, nlev=7, use64=False)(Tg)
    local_sa = np.asarray(sa.addressable_shards[0].data)
    local_lcp = np.asarray(lcp.addressable_shards[0].data)
    sa_ref = suffix_array_np(T)
    lcp_ref = lcp_from_sa_np(T, sa_ref)
    assert np.array_equal(local_sa, sa_ref[me * sh : (me + 1) * sh]), (
        "distributed SA shard mismatch on process %%d" %% me
    )
    assert np.array_equal(local_lcp, lcp_ref[me * sh : (me + 1) * sh]), (
        "distributed LCP shard mismatch on process %%d" %% me
    )

    # low-HBM LCP mode (ckpt_stride=2, every other level regenerated on
    # the descent): the regenerated segments add collectives mid-chain,
    # so this is the gloo posting-order gauntlet for that path
    sa2, sai2, lcp2 = _get_dsa_fn(
        mesh, sh=sh, nlev=7, use64=False, ckpt_stride=2
    )(Tg)
    assert np.array_equal(
        np.asarray(sa2.addressable_shards[0].data),
        sa_ref[me * sh : (me + 1) * sh],
    ), "ckpt-stride SA shard mismatch on process %%d" %% me
    assert np.array_equal(
        np.asarray(lcp2.addressable_shards[0].data),
        lcp_ref[me * sh : (me + 1) * sh],
    ), "ckpt-stride LCP shard mismatch on process %%d" %% me

    # stride 4 with nlev=7: the TOP descend level (6) is NOT a
    # checkpoint multiple, so the very first regeneration fires while
    # the descent carry h is still h0 (no collective dep) — the
    # configuration where an unchained regen forms an independent
    # collective chain (ADVICE r2 high).  Run it twice so the second
    # call executes the warm/cached executable (fresh JIT often passes
    # the posting-order hazard; the cached load is what reorders).
    fn4 = _get_dsa_fn(mesh, sh=sh, nlev=7, use64=False, ckpt_stride=4)
    for rep in range(2):
        sa4, sai4, lcp4 = fn4(Tg)
        assert np.array_equal(
            np.asarray(sa4.addressable_shards[0].data),
            sa_ref[me * sh : (me + 1) * sh],
        ), "stride-4 SA shard mismatch (rep %%d) on process %%d" %% (rep, me)
        assert np.array_equal(
            np.asarray(lcp4.addressable_shards[0].data),
            lcp_ref[me * sh : (me + 1) * sh],
        ), "stride-4 LCP shard mismatch (rep %%d) on process %%d" %% (rep, me)
    print("OK process", jax.process_index())
    """
)


def test_two_host_mesh(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = "localhost:37631"
    script = WORKER % {"root": root, "coord": coord}
    fn = tmp_path / "worker.py"
    fn.write_text(script)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one device per process
    procs = [
        subprocess.Popen(
            [sys.executable, str(fn), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "process %d failed:\n%s" % (i, out)
        assert "OK process" in out


REM_WORKER = textwrap.dedent(
    """
    import hashlib, os, sys, time
    sys.path.insert(0, %(root)r)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from reveal_tpu.parallel.distributed import init_distributed, global_mesh
    init_distributed(
        coordinator_address=%(coord)r,
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    import numpy as np
    from reveal_tpu.align.rem import align_genomes
    from reveal_tpu.core.io_fasta import fasta_writer

    rng = np.random.default_rng(3)
    base = "".join(rng.choice(list("ACGT"), size=60_000))
    mut = list(base)
    for _ in range(300):
        i = int(rng.integers(0, len(mut)))
        r = rng.random()
        if r < 0.5:
            mut[i] = "ACGT"[int(rng.integers(0, 4))]
        elif r < 0.75:
            del mut[i]
        else:
            mut.insert(i, "ACGT"[int(rng.integers(0, 4))])
    wd = %(wd)r
    fa1, fa2 = wd + "/a.fa", wd + "/b.fa"
    if int(sys.argv[1]) == 0:
        # write-then-rename: exists() on the final path implies the
        # content is complete (a plain write is visible before flush)
        fasta_writer(fa1 + ".tmp", [("a", base)])
        os.rename(fa1 + ".tmp", fa1)
        fasta_writer(fa2 + ".tmp", [("b", "".join(mut))])
        os.rename(fa2 + ".tmp", fa2)
    while not (os.path.exists(fa1) and os.path.exists(fa2)):
        time.sleep(0.2)

    def state_hash(G):
        state = sorted(
            (n, tuple(sorted(G.nodes[n]["offsets"].items())),
             G.nodes[n].get("aligned", 0))
            for n in G.nodes if isinstance(n, tuple))
        return hashlib.sha256(repr(state).encode()).hexdigest()

    # FULL rem over the 2-process mesh: every process holds one device,
    # the frontier state is mesh-sharded, host graph surgery runs
    # replicated and deterministically on both processes
    G, idx = align_genomes([fa1, fa2], mesh=global_mesh())
    h = state_hash(G)
    # reference: single-process host path
    G2, _ = align_genomes([fa1, fa2], backend="np")
    assert state_hash(G2) == h, "2-host mesh rem != single-process rem"
    print("OK process", jax.process_index(), h[:16])
    """
)


def test_two_host_full_rem(tmp_path):
    """A full rem alignment over a 2-process jax.distributed mesh must
    produce the same graph as the single-process host path — on every
    process (SURVEY 2.3 P6: the distributed rem, multi-host emulation)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = "localhost:37653"
    script = REM_WORKER % {
        "root": root, "coord": coord, "wd": str(tmp_path)
    }
    fn = tmp_path / "worker_rem.py"
    fn.write_text(script)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(fn), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=500)
        outs.append(out)
    hashes = set()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "process %d failed:\n%s" % (i, out)
        for line in out.splitlines():
            if line.startswith("OK process"):
                hashes.add(line.split()[-1])
    assert len(hashes) == 1, hashes  # both processes agree


MULTI_WORKER = textwrap.dedent(
    """
    import hashlib, os, sys, time
    sys.path.insert(0, %(root)r)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from reveal_tpu.parallel.distributed import init_distributed, global_mesh
    init_distributed(
        coordinator_address=%(coord)r,
        num_processes=2,
        process_id=int(sys.argv[1]),
    )
    import numpy as np
    from reveal_tpu.align.rem import align_genomes
    from reveal_tpu.core.io_fasta import fasta_writer

    rng = np.random.default_rng(9)
    base = "".join(rng.choice(list("ACGT"), size=30_000))
    wd = %(wd)r
    fas = [wd + "/m%%d.fa" %% s for s in range(3)]
    if int(sys.argv[1]) == 0:
        for s, fa in enumerate(fas):
            seq = list(base)
            for _ in range(150):
                i = int(rng.integers(0, len(seq)))
                r = rng.random()
                if r < 0.5:
                    seq[i] = "ACGT"[int(rng.integers(0, 4))]
                elif r < 0.75:
                    del seq[i]
                else:
                    seq.insert(i, "ACGT"[int(rng.integers(0, 4))])
            # write-then-rename so exists() implies complete content
            fasta_writer(fa + ".tmp", [("m%%d" %% s, "".join(seq))])
            os.rename(fa + ".tmp", fa)
    while not all(os.path.exists(f) for f in fas):
        time.sleep(0.2)

    def state_hash(G):
        state = sorted(
            (n, tuple(sorted(G.nodes[n]["offsets"].items())),
             G.nodes[n].get("aligned", 0))
            for n in G.nodes if isinstance(n, tuple))
        return hashlib.sha256(repr(state).encode()).hexdigest()

    # MULTI-genome rem over the 2-process mesh: exercises the O(n/P)
    # shard_map multiMUM enumerate (radius-W scans + dist_gather2 +
    # window psum) across many warm re-invocations of one executable —
    # the gloo posting-order hazard class (parallel/dsa.after) only
    # shows multi-process
    G, idx = align_genomes(fas, mesh=global_mesh())
    h = state_hash(G)
    G2, _ = align_genomes(fas, backend="np", frontier=True)
    assert state_hash(G2) == h, "2-host multi rem != single-process"
    print("OK process", jax.process_index(), h[:16])
    """
)


def test_two_host_multi_rem(tmp_path):
    """3-genome rem over a 2-process jax.distributed mesh: the mesh
    multiMUM enumerate's collective chain must hold across processes
    (warm executables re-dispatched every level) and the graph must
    match the single-process frontier on every process."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = "localhost:37661"
    script = MULTI_WORKER % {
        "root": root, "coord": coord, "wd": str(tmp_path)
    }
    fn = tmp_path / "worker_multi.py"
    fn.write_text(script)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(fn), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=500)
        outs.append(out)
    hashes = set()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "process %d failed:\n%s" % (i, out)
        for line in out.splitlines():
            if line.startswith("OK process"):
                hashes.add(line.split()[-1])
    assert len(hashes) == 1, hashes
