"""Suffix-array + LCP construction, TPU-first.

The reference builds its generalized enhanced suffix array with libdivsufsort
(/root/reference/divsufsort/divsufsort.c:332-358) and a Kasai LCP pass that
stops at '$'/'N' (/root/reference/reveallib/interface.c:97-114).  Both are
inherently sequential CPU algorithms.  Here the same arrays are produced with
sort-based prefix doubling, which maps onto XLA's fast multi-million-element
sorts:

* ``suffix_array``: O(log n) rounds of 64-bit key argsort.  Each round sorts
  (rank[i], rank[i+k]) packed into one int64.  All rounds run on device under
  one jit; ranks per round are kept so the LCP can be derived without a
  sequential Kasai pass.
* ``lcp_array``: longest-common-prefix of SA-adjacent suffixes via rank
  doubling descent (O(log n) vectorized gathers), then capped at the first
  '$'/'N' after each suffix start — bit-identical to the reference's
  compute_lcp semantics (capped_lcp = min(plain_lcp, dist_to_stop)).

Both have numpy twins (suffix Doubling as well) used as CPU oracle/fallback.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

from ..core.encoding import N_BYTE, SENTINEL


# --------------------------------------------------------------------------
# numpy reference/fallback implementations
# --------------------------------------------------------------------------

def suffix_array_np(T: np.ndarray) -> np.ndarray:
    """Prefix-doubling suffix array (numpy). T: uint8[n] -> int64[n]."""
    n = len(T)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = T.astype(np.int64)
    k = 1
    while True:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        key = (rank << 32) | (key2 + 1)
        sa = np.argsort(key, kind="stable")
        sk = key[sa]
        newrank = np.empty(n, dtype=np.int64)
        newrank[sa] = np.cumsum(np.r_[0, (sk[1:] != sk[:-1]).astype(np.int64)])
        rank = newrank
        if rank[sa[-1]] == n - 1:
            return sa.astype(np.int64)
        k *= 2


def _rank_levels_np(T: np.ndarray):
    """All doubling rank arrays [(k, rank_k)], for LCP descent."""
    n = len(T)
    levels = []
    # dense single-char ranks (preserves equality & order; makes the
    # "all-distinct" check valid even when no doubling round runs)
    sa0 = np.argsort(T, kind="stable")
    sk = T[sa0].astype(np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa0] = np.cumsum(np.r_[0, (sk[1:] != sk[:-1]).astype(np.int64)])
    levels.append((1, rank))
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        key = (rank << 32) | (key2 + 1)
        sa = np.argsort(key, kind="stable")
        sk = key[sa]
        newrank = np.empty(n, dtype=np.int64)
        newrank[sa] = np.cumsum(np.r_[0, (sk[1:] != sk[:-1]).astype(np.int64)])
        rank = newrank
        k *= 2
        levels.append((k, rank))
        if rank[sa[-1]] == n - 1:
            break
    return levels


def _stop_distance_np(T: np.ndarray) -> np.ndarray:
    """d[i] = distance from i to the first '$' or 'N' at or after i."""
    n = len(T)
    idx = np.where((T == SENTINEL) | (T == N_BYTE), np.arange(n), n)
    # suffix-min
    sufmin = np.minimum.accumulate(idx[::-1])[::-1]
    return sufmin - np.arange(n)


def lcp_from_sa_np(T: np.ndarray, SA: np.ndarray) -> np.ndarray:
    """LCP[i] = capped lcp(suffix SA[i-1], suffix SA[i]); LCP[0]=0.

    Kasai with '$'/'N' cap, matching interface.c:97-114.  Implemented as
    plain-lcp via rank doubling descent, then min() with the stop distance.
    """
    n = len(T)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    return _lcp_from_levels_np(T, SA, _rank_levels_np(T))


def _lcp_from_levels_np(T, SA, levels) -> np.ndarray:
    n = len(T)
    a = SA[:-1].copy()
    b = SA[1:].copy()
    h = np.zeros(n - 1, dtype=np.int64)
    for k, rank in reversed(levels):
        ok = (a + k <= n) & (b + k <= n)
        # guard gathers
        ai = np.minimum(a, n - 1)
        bi = np.minimum(b, n - 1)
        eq = ok & (rank[ai] == rank[bi])
        h = np.where(eq, h + k, h)
        a = np.where(eq, a + k, a)
        b = np.where(eq, b + k, b)
    d = _stop_distance_np(T)
    plain = h
    lcp = np.minimum(plain, np.minimum(d[SA[:-1]], d[SA[1:]]))
    return np.r_[0, lcp].astype(np.int64)


def sufcheck(T: np.ndarray, SA: np.ndarray) -> bool:
    """Validate that SA is the suffix array of T (like divsufsort's sufcheck,
    /root/reference/divsufsort/utils.c:161, but vectorized)."""
    n = len(T)
    if sorted(SA.tolist()) != list(range(n)):
        return False
    # adjacent order check using doubling ranks
    levels = _rank_levels_np(T)
    _, rank = levels[-1]
    return bool(np.all(rank[SA] == np.arange(n)))


# --------------------------------------------------------------------------
# JAX implementations
# --------------------------------------------------------------------------

def _num_levels(n: int) -> int:
    return max(1, int(math.ceil(math.log2(max(n, 2)))) + 1)


_jit_cache = {}


def _make_build_body(use64: bool = False):
    """The (un-jitted) doubling build body; shared by the single-device
    and the mesh-sharded builders so both compile the same HLO."""
    import jax
    import jax.numpy as jnp

    from ..core.jaxconfig import configure_jax

    configure_jax()

    idt = jnp.int64 if use64 else jnp.int32

    def _build(T, nlev):
        n = T.shape[0]
        i32 = idt
        rank0 = T.astype(i32)
        iar = jnp.arange(n, dtype=i32)

        def round_fn(carry, lev):
            rank, done, sa = carry
            k = (i32(1) << lev).astype(i32)
            key2 = jnp.where(iar + k < n, rank[(iar + k) % n], i32(-1))
            # lexicographic sort by (rank, rank[i+k]) carrying the index
            sk1, sk2, new_sa = jax.lax.sort((rank, key2, iar), num_keys=2)
            diff = jnp.concatenate(
                [
                    jnp.zeros(1, i32),
                    ((sk1[1:] != sk1[:-1]) | (sk2[1:] != sk2[:-1])).astype(i32),
                ]
            )
            new_rank = jnp.zeros(n, i32).at[new_sa].set(jnp.cumsum(diff))
            new_done = new_rank[new_sa[-1]] == n - 1
            rank = jnp.where(done, rank, new_rank)
            sa = jnp.where(done, sa, new_sa)
            return (rank, done | new_done, sa), rank

        init_sa = jnp.argsort(rank0).astype(i32)
        init_done = rank0[init_sa[-1]] == n - 1
        (rank, _, sa), rank_hist = jax.lax.scan(
            round_fn,
            (rank0, init_done, init_sa),
            jnp.arange(nlev - 1, dtype=i32),
        )
        # ranks[lev] ranks substrings of length 2^lev
        ranks = jnp.concatenate([rank0[None], rank_hist], axis=0)

        # ---- LCP via doubling descent over rank levels ----
        a0 = sa[:-1]
        b0 = sa[1:]

        def lcp_level(carry, lev_rev):
            a, b, h = carry
            lev = i32(nlev - 1) - lev_rev
            k = (i32(1) << lev).astype(i32)
            rk = ranks[lev]
            ok = (a + k <= n) & (b + k <= n)
            ai = jnp.minimum(a, n - 1)
            bi = jnp.minimum(b, n - 1)
            eq = ok & (rk[ai] == rk[bi])
            h = jnp.where(eq, h + k, h)
            a = jnp.where(eq, a + k, a)
            b = jnp.where(eq, b + k, b)
            return (a, b, h), None

        h0 = jnp.zeros(n - 1, dtype=i32)
        (_, _, plain), _ = jax.lax.scan(
            lcp_level, (a0, b0, h0), jnp.arange(nlev, dtype=i32)
        )

        stop = jnp.where((T == SENTINEL) | (T == N_BYTE), iar, i32(n))
        sufmin = jax.lax.associative_scan(jnp.minimum, stop, reverse=True)
        d = sufmin - iar
        lcp = jnp.minimum(plain, jnp.minimum(d[sa[:-1]], d[sa[1:]]))
        lcp = jnp.concatenate([jnp.zeros(1, i32), lcp])

        sai = jnp.zeros(n, i32).at[sa].set(iar)
        return sa, lcp, sai

    return _build


def _get_build_fn(use64: bool = False):
    """Module-level cached jitted builder (one compile per size bucket).

    use64 builds with int64 ranks/indices — the device twin of the
    reference's reveallib64 module (setup.py:21-31) for texts at or
    beyond 2^31; requires jax_enable_x64 at call time (build_esa_jax
    toggles it around the dispatch)."""
    key = "build64" if use64 else "build"
    fn = _jit_cache.get(key)
    if fn is not None:
        return fn

    import jax

    fn = partial(jax.jit, static_argnums=(1,))(_make_build_body(use64))
    _jit_cache[key] = fn
    return fn


def _get_build_fn_sharded(mesh, use64: bool = False):
    """Mesh-sharded builder: input text and output SA/LCP/SAi sharded
    over the mesh's first axis; GSPMD partitions the doubling sorts,
    gathers, and scans and inserts the collectives (the all-to-alls of a
    distributed sort, all-gathers for the rank gathers).  This is the
    multi-chip SA construction path of SURVEY §7 step 9 — one logical
    ESA, N devices."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = ("build_sharded", id(mesh), use64)
    fn = _jit_cache.get(key)
    if fn is not None:
        return fn

    axis = mesh.axis_names[0]
    shard = NamedSharding(mesh, P(axis))
    fn = jax.jit(
        _make_build_body(use64),
        static_argnums=(1,),
        in_shardings=(shard,),
        out_shardings=(shard, shard, shard),
    )
    _jit_cache[key] = fn
    return fn


def build_esa_sharded(T_np: np.ndarray, mesh, force64: bool = False):
    """Device construction of (SA, LCP, SAi) sharded over a mesh.

    Same zero-padding and stripping semantics as build_esa_jax; the text
    is padded to a power-of-two bucket (always divisible by the mesh
    size), placed sharded, and the full doubling pipeline runs as one
    GSPMD program across the devices."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = int(len(T_np))
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    npad = 1 << max(
        1,
        int(math.ceil(math.log2(max(n, mesh.devices.size)))),
    )
    T_padded = np.zeros(npad, dtype=np.uint8)
    T_padded[:n] = T_np
    nlev = int(math.log2(npad)) + 1
    use64 = force64 or npad >= 2**31

    axis = mesh.axis_names[0]
    Td = jax.device_put(
        jnp.asarray(T_padded), NamedSharding(mesh, P(axis))
    )
    if use64:
        prev = bool(jax.config.jax_enable_x64)
        jax.config.update("jax_enable_x64", True)
        try:
            sa, lcp, sai = _get_build_fn_sharded(mesh, use64=True)(
                Td, nlev
            )
        finally:
            jax.config.update("jax_enable_x64", prev)
    else:
        sa, lcp, sai = _get_build_fn_sharded(mesh)(Td, nlev)
    sa = np.asarray(jax.device_get(sa), dtype=np.int64)
    lcp = np.asarray(jax.device_get(lcp), dtype=np.int64)
    sai = np.asarray(jax.device_get(sai), dtype=np.int64)
    off = npad - n
    if off:
        sa = sa[off:]
        lcp = lcp[off:].copy()
        lcp[0] = 0
        sai = sai[:n] - off
    return sa, lcp, sai


def build_esa_jax(T_np: np.ndarray, force64: bool = False):
    """Device construction of (SA, LCP, SAi) for uint8 text.

    Runs the full doubling pipeline on the default JAX device under jit.
    Returns numpy int64 arrays (host) — downstream recursion bookkeeping is
    host-side; hot rescans go back to device.

    Texts of 2^31 bytes or more automatically use the int64 builder (the
    device twin of the reference's dual reveallib/reveallib64 build,
    setup.py:21-31); force64 selects it explicitly so the 64-bit path
    can be exercised at reduced scale.
    """
    import jax
    import jax.numpy as jnp

    n = int(len(T_np))
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z, z

    # Pad to the next power-of-two bucket with 0x00 bytes.  Zero sorts below
    # every real byte, so zero-padding mimics "end of string" exactly: the
    # padded SA is [pad positions ...] + [real SA], and capped LCPs of real
    # pairs are unchanged (no real suffix pair can share a prefix through a
    # zero byte).  This keeps jit recompilation to one per size bucket.
    npad = 1 << max(1, int(math.ceil(math.log2(n))))
    T_padded = np.zeros(npad, dtype=np.uint8)
    T_padded[:n] = T_np
    T_np = T_padded
    nlev = int(math.log2(npad)) + 1

    use64 = force64 or npad >= 2**31
    if use64:
        # int64 array math requires the x64 flag; scope it to this
        # dispatch (jit caches are keyed on the flag, so toggling is safe)
        prev = bool(jax.config.jax_enable_x64)
        jax.config.update("jax_enable_x64", True)
        try:
            sa, lcp, sai = _get_build_fn(use64=True)(
                jnp.asarray(T_np), nlev
            )
        finally:
            jax.config.update("jax_enable_x64", prev)
    else:
        sa, lcp, sai = _get_build_fn()(jnp.asarray(T_np), nlev)
    sa = np.asarray(jax.device_get(sa), dtype=np.int64)
    lcp = np.asarray(jax.device_get(lcp), dtype=np.int64)
    sai = np.asarray(jax.device_get(sai), dtype=np.int64)
    # strip the zero-padding: all npad-n pad suffixes sort first
    off = npad - n
    if off:
        sa = sa[off:]
        lcp = lcp[off:].copy()
        lcp[0] = 0
        sai = sai[:n] - off
    return sa, lcp, sai


def build_esa(T_np: np.ndarray, backend: str = "auto"):
    """(SA, LCP, SAi) with backend in {'auto','jax','jax-dist','np'}.

    Backends: 'native' = C++ SA-IS + capped Kasai (fastest host path,
    1.9s at 3.1 Mbp); 'jax' = on-device prefix doubling (the multi-chip
    path; 5.2s warm at 3.1 Mbp incl. transfers); 'jax-dist' = explicit
    shard_map prefix doubling over a mesh of all local devices with
    O(n/P) per-device memory (parallel/dsa.py); 'np' = pure-numpy
    oracle.  'auto' prefers native, then numpy.
    """
    if backend == "jax-dist":
        import os

        from ..parallel.dsa import build_esa_distributed
        from ..parallel.mesh import make_mesh

        # low-HBM LCP descent knob (int or "sqrt"): regenerate rank
        # levels from sparse checkpoints instead of storing all of them
        stride = os.environ.get("REVEAL_TPU_DSA_LCP_STRIDE") or None
        if stride is not None and stride != "sqrt":
            stride = int(stride)
        return build_esa_distributed(
            T_np, make_mesh(), lcp_ckpt_stride=stride
        )
    if backend == "auto":
        try:
            from ..native import build_esa_native

            return build_esa_native(T_np)
        except Exception:
            return build_esa(T_np, backend="np")
    if backend == "native":
        from ..native import build_esa_native

        return build_esa_native(T_np)
    if backend == "np":
        n = len(T_np)
        if n == 0:
            z = np.empty(0, np.int64)
            return z, z, z
        # single doubling pass: ranks feed both the SA and the LCP descent
        levels = _rank_levels_np(T_np)
        _, rank = levels[-1]
        sa = np.empty(n, dtype=np.int64)
        sa[rank] = np.arange(n)
        lcp = _lcp_from_levels_np(T_np, sa, levels)
        sai = rank.copy()
        return sa, lcp, sai
    try:
        return build_esa_jax(T_np)
    except Exception:
        if backend == "jax":
            raise
        return build_esa(T_np, backend="np")
