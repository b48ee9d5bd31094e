"""Compiled-memory evidence that the mesh frontier is O(n/P): the
shard_map apply kernel's per-device temp buffers must shrink ~P-fold
vs the GSPMD kernel compiled over the same sharded inputs (GSPMD
all-gathers around the global stable sort, so its per-device temps stay
O(n)).  jax `compiled.memory_analysis()` reports per-device stats."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mesh8():
    import jax

    from reveal_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_mesh_apply_temp_memory_scales(mesh8):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from reveal_tpu.index import devfrontier as df

    npad = 1 << 18
    NI = SCAP = 4096
    mesh = mesh8
    Pn = int(mesh.devices.size)
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))

    def shapes():
        return (
            jax.ShapeDtypeStruct((npad,), jnp.uint8, sharding=shard),
            *(
                jax.ShapeDtypeStruct((npad,), jnp.int32, sharding=shard)
                for _ in range(3)
            ),
            *(jax.ShapeDtypeStruct((NI,), jnp.int32) for _ in range(3)),
            jax.ShapeDtypeStruct((SCAP, 5), jnp.int32),
            *(jax.ShapeDtypeStruct((4096,), jnp.int32) for _ in range(4)),
        )

    mesh_fn = df._get_apply_mesh(NI, SCAP, mesh, npad)
    gspmd_fn = df._get_apply(NI, SCAP)
    mem_mesh = mesh_fn.lower(*shapes()).compile().memory_analysis()
    mem_gspmd = gspmd_fn.lower(*shapes()).compile().memory_analysis()

    t_mesh = mem_mesh.temp_size_in_bytes
    t_gspmd = mem_gspmd.temp_size_in_bytes
    # the GSPMD route materializes full-size sort operands; the
    # shard_map route must be at least P/2 x smaller (measured ~7.9x
    # at P=8: 22.8 MB vs 179 MB for npad=2^20)
    assert t_mesh * (Pn // 2) < t_gspmd, (t_mesh, t_gspmd)
    # absolute bound: temps stay within ~64 int32 buffers of n/P
    assert t_mesh < 64 * 4 * (npad // Pn), t_mesh


def test_mesh_enum_multi_temp_memory_scales(mesh8):
    """The shard_map multi enumerate's per-device temps are O(n/P) with
    the same constant as the (already landed) pairwise mesh enumerate —
    the constant belongs to collective_kit's dist_gather2 sort passes,
    not to the multiMUM logic (measured: both 18.09 MB at npad=2^18,
    P=8, i.e. ~138 int32 planes of n/P).  The GSPMD enum_mm keeps a
    smaller constant (~3.3 planes of FULL n per device: its scan-based
    pointer doubling reuses buffers), so the mesh form pays off at pod
    P — the reason it exists is (a) per-device O(n/P) at P beyond ~40
    and (b) keeping every level collective inside the kit's single
    dependency chain (the gloo posting-order rule, parallel/dsa.py)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from reveal_tpu.index import devfrontier as df

    npad = 1 << 18
    W, NSEPW, K = 8, 8, 4096
    mesh = mesh8
    Pn = int(mesh.devices.size)
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))

    sharded_in = (
        jax.ShapeDtypeStruct((npad,), jnp.uint8, sharding=shard),
        *(
            jax.ShapeDtypeStruct((npad,), jnp.int32, sharding=shard)
            for _ in range(3)
        ),
    )
    mesh_fn = df._get_enum_multi_mesh(mesh, npad, W, NSEPW)
    mem_mesh = mesh_fn.lower(
        *sharded_in,
        jax.ShapeDtypeStruct((NSEPW,), jnp.int32),
        *(jax.ShapeDtypeStruct((), jnp.int32) for _ in range(4)),
    ).compile().memory_analysis()

    pw_fn = df._get_enum_pairwise_mesh(mesh, npad)
    mem_pw = pw_fn.lower(
        *sharded_in,
        *(jax.ShapeDtypeStruct((), jnp.int32) for _ in range(2)),
    ).compile().memory_analysis()

    win_fn = df._get_win_multi_mesh(mesh, npad, W, K)
    mem_win = win_fn.lower(
        *(
            jax.ShapeDtypeStruct((npad,), jnp.int32, sharding=shard)
            for _ in range(3)
        ),
        *(jax.ShapeDtypeStruct((K,), jnp.int32) for _ in range(2)),
    ).compile().memory_analysis()

    t_mesh = mem_mesh.temp_size_in_bytes
    # same O(n/P) constant as the pairwise mesh kernel (within 20%)
    assert t_mesh < 1.2 * mem_pw.temp_size_in_bytes, (
        t_mesh, mem_pw.temp_size_in_bytes,
    )
    # absolute bound: ~150 int32 planes of n/P
    assert t_mesh < 150 * 4 * (npad // Pn), t_mesh
    # the window companion is O(K*W), not O(n)
    assert mem_win.temp_size_in_bytes < 64 * 4 * K * W, (
        mem_win.temp_size_in_bytes
    )


def test_mesh_enum_multi_temp_memory_large_npad(mesh8):
    """Genome-scale shape evidence (VERDICT r4 item 6): the multi
    enumerate's per-device temps stay O(n/P) at npad=2^22 (a ~4 Mbp
    multi-genome text, v5e-pod-slice scale per device) — the constant
    must not grow with npad (same ~150-plane bound as the 2^18 case
    above), i.e. nothing in the kernel silently materializes O(n)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from reveal_tpu.index import devfrontier as df

    npad = 1 << 22
    W, NSEPW = 8, 8
    mesh = mesh8
    Pn = int(mesh.devices.size)
    shard = NamedSharding(mesh, P(mesh.axis_names[0]))

    sharded_in = (
        jax.ShapeDtypeStruct((npad,), jnp.uint8, sharding=shard),
        *(
            jax.ShapeDtypeStruct((npad,), jnp.int32, sharding=shard)
            for _ in range(3)
        ),
    )
    mesh_fn = df._get_enum_multi_mesh(mesh, npad, W, NSEPW)
    mem_mesh = mesh_fn.lower(
        *sharded_in,
        jax.ShapeDtypeStruct((NSEPW,), jnp.int32),
        *(jax.ShapeDtypeStruct((), jnp.int32) for _ in range(4)),
    ).compile().memory_analysis()
    t_mesh = mem_mesh.temp_size_in_bytes
    assert t_mesh < 150 * 4 * (npad // Pn), t_mesh
