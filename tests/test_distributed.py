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
