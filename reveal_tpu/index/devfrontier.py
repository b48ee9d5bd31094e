"""Device-resident recursion frontier.

The BASELINE.json north-star engine: the whole ESA recursion state
(T, SA, LCP, per-slot segment id, SO) lives on the device across frontier
levels; each level runs TWO fused jitted dispatches —

* ``enumerate``: candidate MUMs for every live segment at once.  Pairwise
  mode evaluates the reveal.c:119-180 conditions elementwise (straddle /
  left-maximality / uniqueness, with segment-boundary guards); multi mode
  derives LCP-intervals via PSV/NSV pointer doubling (the segmented
  re-expression of the reveal.c:436-580 stack walk) and applies the
  ismultimum checks (distinct samples + some adjacent pair left-maximal,
  reveal.c:227-259) over padded interval rows.  Candidates are compacted
  on device (jnp.nonzero with static size) so only K×few int32 come back
  over the wire.

* ``apply``: given the host picker/graph-surgery decisions as a flat
  interval table (begin, end, class) + a (segment × class) -> new-segment
  map, classify every SA slot by searchsorted over the disjoint
  intervals, recompute child LCPs as per-class segmented running-min
  scans over the parent layout (the split() running-min of
  reveal.c:582-664), stable-sort slots by new segment id, lowercase the
  matched text, and flag slots whose LCP crosses a new match boundary
  (bubble_sort candidates, reveal.c:666-727).

Only the graph surgery (host data structure), the anchor picking, and the
rare boundary repairs (fetched per affected child, fixed by the native
C++ repair kernel, scattered back) stay on the host.  Host SA/SAi copies
are never materialized.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass, field
from typing import List

import numpy as np

log = logging.getLogger(__name__)

_kern_cache = {}


def _next_pow2(x: int) -> int:
    return 1 << max(1, int(math.ceil(math.log2(max(x, 2)))))


def _bucket8(x: int) -> int:
    """Coarse power-of-8 ladder for padded table sizes: fewer distinct
    jit shapes (each (NI, NM, NK, SCAP) combination is one compile, and
    compiles are expensive over a remote-compile tunnel)."""
    b = 8
    while b < x:
        b *= 8
    return b


# Floors for the static table sizes of the apply kernel.  Padding costs
# device-trivial work (wider searchsorted ladders, bigger seg_map
# transfers: ~100 KB/level), while every DISTINCT (NI, SCAP) pair is a
# full recompile of the 3-way-split kernel at text scale — tens of
# minutes over a remote-compile tunnel.  With the floors a typical run
# compiles exactly one apply variant; only levels with >4096 intervals
# or segments escalate (pow8, so at most one more shape in practice).
TABLE_FLOOR = 4096


def _table_bucket(x: int) -> int:
    return max(TABLE_FLOOR, _bucket8(x))


# Width of the speculative result prefix fetched together with the
# candidate count in one device round trip (device link latency is the
# per-level cost floor; most levels yield fewer candidates than this).
_SPEC_PREFIX = 1024


# ---------------------------------------------------------------------------
# segment descriptor (host bookkeeping; no SA/LCP copies)
# ---------------------------------------------------------------------------

@dataclass
class SegDesc:
    """Host-side view of one live segment of the packed device arrays.

    Mirrors the reference RevealIndex recursion fields (reveal.h:17-40)
    minus the array slices, which stay on device; ``start``/``n`` locate
    the segment's contiguous slot range after the level sort."""

    sid: int
    start: int
    n: int
    depth: int
    nsamples: int
    nodes: set = field(default_factory=set)
    left_node: object = None
    right_node: object = None
    skipmums: list = field(default_factory=list)

    # the MumPicker reads idx.main.nsamples via ESAIndex; here the driver
    # passes global sample count separately, so keep a compatible shim
    main = None


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _get_enum_pairwise(K1: int):
    key = ("pw", K1)
    fn = _kern_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp

    from ..core.encoding import N_BYTE, SENTINEL
    from ..core.jaxconfig import configure_jax

    configure_jax()

    @jax.jit
    def enum_pw(T, SA, LCP, SEG, nsep0, minl):
        n = SA.shape[0]
        prev = jnp.roll(SA, 1)
        seg_prev = jnp.roll(SEG, 1)
        l = LCP
        straddle = (SA > nsep0) != (prev > nsep0)
        a = jnp.minimum(SA, prev)
        b = jnp.maximum(SA, prev)
        ta = T[jnp.maximum(a - 1, 0)]
        tb = T[jnp.maximum(b - 1, 0)]
        lower = (ta >= ord("a")) & (ta <= ord("z"))
        leftmax = (
            (a == 0)
            | (b == 0)
            | (ta != tb)
            | (ta == N_BYTE)
            | (ta == SENTINEL)
            | lower
        )
        lcp_next = jnp.concatenate([LCP[1:], jnp.zeros(1, LCP.dtype)])
        lcp_prev = jnp.roll(LCP, 1)
        unique = (lcp_prev < l) & (lcp_next < l)
        iar = jnp.arange(n)
        mask = (
            (iar >= 1)
            & (SEG >= 0)
            & (SEG == seg_prev)
            & (l >= minl)
            & (l > 0)
            & straddle
            & leftmax
            & unique
        )
        count = jnp.sum(mask.astype(jnp.int32))
        (slots,) = jnp.nonzero(mask, size=K1, fill_value=n - 1)
        valid = jnp.arange(K1) < count
        return (
            slots.astype(jnp.int32),
            l[slots].astype(jnp.int32),
            a[slots].astype(jnp.int32),
            b[slots].astype(jnp.int32),
            valid,
            count,
        )

    _kern_cache[key] = enum_pw
    return enum_pw


def _get_enum_pairwise_mesh(mesh, npad):
    """O(n/P)-memory pairwise enumerate: the getmums_rem conditions
    evaluated shard-locally with packed halo ppermutes; the two text
    probes T[a-1]/T[b-1] (arbitrary global positions) go through the
    sort-based distributed gather (parallel/dsa.collective_kit
    .dist_gather2), and candidates are compacted by a comparator-network
    sort on (candidate? slot : BIG) — ascending global slot order,
    exactly the jnp.nonzero order of the single-device kernel.  Every
    collective rides one dependency chain (kit.after)."""
    key = ("pw_mesh", id(mesh), npad)
    fn = _kern_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    from ..core.encoding import N_BYTE, SENTINEL
    from ..core.jaxconfig import configure_jax
    from ..parallel.dsa import collective_kit

    configure_jax()

    axis = mesh.axis_names[0]
    P = int(mesh.devices.size)
    assert npad % P == 0
    sh = npad // P
    kit = collective_kit(axis, P, sh)
    net_sort = kit.make_net_sort(sh)
    i32 = jnp.int32
    BIG = jnp.int32(2**31 - 1)

    def shard_fn(T, SA, LCP, SEG, nsep0, minl):
        me = jax.lax.axis_index(axis)
        iar_g = me.astype(i32) * sh + jnp.arange(sh, dtype=i32)

        # prev halo of (SA, SEG, LCP) — ONE packed (3,) ppermute; the
        # global slot 0 is masked below (iar >= 1), fill is irrelevant
        h = jax.lax.ppermute(
            jnp.stack([SA[-1], SEG[-1], LCP[-1]]),
            axis,
            [(j, j + 1) for j in range(P - 1)],
        )
        prev = jnp.concatenate([h[0][None], SA[:-1]])
        seg_prev = jnp.concatenate(
            [jnp.where(me == 0, jnp.int32(-9), h[1])[None], SEG[:-1]]
        )
        lcp_prev = jnp.concatenate([h[2][None], LCP[:-1]])
        # next halo of LCP (zero-fill on the last shard, matching the
        # single-device concat-with-zero), threaded behind h
        nx = jax.lax.ppermute(
            kit.after(LCP[:1], h), axis,
            [(j, j - 1) for j in range(1, P)],
        )
        lcp_next = jnp.concatenate(
            [LCP[1:], jnp.where(me == P - 1, jnp.int32(0), nx[0])[None]]
        )

        l = LCP
        straddle = (SA > nsep0) != (prev > nsep0)
        a = jnp.minimum(SA, prev)
        b = jnp.maximum(SA, prev)
        # the two text probes are arbitrary global positions ->
        # distributed gather (threaded behind nx)
        ta, tb = kit.dist_gather2(
            kit.after(T.astype(i32), nx),
            jnp.maximum(a - 1, 0),
            jnp.maximum(b - 1, 0),
            iar_g,
            me,
        )
        lower = (ta >= ord("a")) & (ta <= ord("z"))
        leftmax = (
            (a == 0)
            | (b == 0)
            | (ta != tb)
            | (ta == N_BYTE)
            | (ta == SENTINEL)
            | lower
        )
        unique = (lcp_prev < l) & (lcp_next < l)
        mask = (
            (iar_g >= 1)
            & (SEG >= 0)
            & (SEG == seg_prev)
            & (l >= minl)
            & (l > 0)
            & straddle
            & leftmax
            & unique
        )
        count = jax.lax.psum(
            jnp.sum(mask.astype(i32)), axis
        )
        # compaction: global sort by (candidate? slot : BIG); ties among
        # dead rows carry junk that the driver never reads past count
        skey = jnp.where(mask, iar_g, BIG)
        skey = kit.after(skey, count)
        slots_s, l_s, a_s, b_s = net_sort(
            (skey, l.astype(i32), a.astype(i32), b.astype(i32)),
            nkeys=1,
        )
        return slots_s, l_s, a_s, b_s, count

    sharded = Pspec(axis)
    repl = Pspec()
    fn = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(sharded,) * 4 + (repl,) * 2,
            out_specs=(sharded,) * 4 + (repl,),
            check_vma=False,
        )
    )
    _kern_cache[key] = fn
    return fn


def _get_prefix_fetch_mesh(spec: int, nargs: int, mesh, npad: int):
    """Replicated prefix fetch for mesh-sharded arrays: each shard
    contributes its overlap of the first ``spec`` slots into a zero
    buffer, ONE packed psum replicates the prefix on every process —
    device_get then works in multi-process runs (a sharded array
    spanning non-addressable devices cannot be fetched directly)."""
    key = ("prefix_mesh", spec, nargs, id(mesh), npad)
    fn = _kern_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    axis = mesh.axis_names[0]
    P = int(mesh.devices.size)
    sh = npad // P
    i32 = jnp.int32

    def fetch_fn(*arrs):
        me = jax.lax.axis_index(axis)
        base = me.astype(i32) * sh
        loc = jnp.arange(spec, dtype=i32) - base
        inb = (loc >= 0) & (loc < sh)
        locc = jnp.clip(loc, 0, sh - 1)
        contrib = jnp.stack(
            [jnp.where(inb, a[locc].astype(i32), 0) for a in arrs]
        )
        out = jax.lax.psum(contrib, axis)
        return tuple(out[t] for t in range(nargs))

    fn = jax.jit(
        shard_map(
            fetch_fn,
            mesh=mesh,
            in_specs=(Pspec(axis),) * nargs,
            out_specs=(Pspec(),) * nargs,
            check_vma=False,
        )
    )
    _kern_cache[key] = fn
    return fn


def _get_enum_multi(K2: int, W: int):
    key = ("mm", K2, W)
    fn = _kern_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp

    from ..core.encoding import N_BYTE, SENTINEL
    from ..core.jaxconfig import configure_jax

    configure_jax()

    @jax.jit
    def enum_mm(T, SA, LCP, SEG, SO, minl, minn, nsamples_main):
        n = SA.shape[0]
        iar = jnp.arange(n, dtype=jnp.int32)

        # PSV/NSV by pointer doubling (segment-local for free: every
        # segment's first slot has LCP 0, which stops any l >= 1 run)
        def psv_round(psv, _):
            valid = psv >= 0
            tgt = jnp.where(valid, psv, 0)
            jump = valid & (LCP[tgt] >= LCP)
            return jnp.where(jump, psv[tgt], psv), None

        def nsv_round(nsv, _):
            valid = nsv < n
            tgt = jnp.where(valid, nsv, n - 1)
            jump = valid & (LCP[tgt] >= LCP)
            return jnp.where(jump, nsv[tgt], nsv), None

        rounds = max(2, int(math.ceil(math.log2(max(n, 2)))) + 2)
        psv0 = iar - 1
        nsv0 = iar + 1
        psv, _ = jax.lax.scan(psv_round, psv0, None, length=rounds)
        nsv, _ = jax.lax.scan(nsv_round, nsv0, None, length=rounds)

        lb = jnp.maximum(psv, 0)
        ub = nsv - 1
        width = ub - lb + 1
        cand = (
            (SEG >= 0)
            & (LCP >= jnp.maximum(minl, 1))
            & (width >= minn)
            & (width <= nsamples_main)
        )
        count = jnp.sum(cand.astype(jnp.int32))
        (slots,) = jnp.nonzero(cand, size=K2, fill_value=n - 1)
        valid = jnp.arange(K2) < count

        lbs = lb[slots]
        ubs = ub[slots]
        ls = LCP[slots]

        cols = lbs[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        inrow = cols <= ubs[:, None]
        cols_c = jnp.minimum(cols, n - 1)
        sa_rows = SA[cols_c]
        so_rows = SO[sa_rows].astype(jnp.int32)
        # distinct samples: sort each padded row with unique fillers
        so_pad = jnp.where(
            inrow,
            so_rows,
            jnp.int32(-1) - jnp.arange(W, dtype=jnp.int32)[None, :],
        )
        so_sorted = jnp.sort(so_pad, axis=1)
        distinct = jnp.all(so_sorted[:, 1:] != so_sorted[:, :-1], axis=1)

        a = sa_rows[:, :-1]
        b = sa_rows[:, 1:]
        ta = T[jnp.maximum(a - 1, 0)]
        tb = T[jnp.maximum(b - 1, 0)]
        lower = (ta >= ord("a")) & (ta <= ord("z"))
        lm = (
            (a == 0)
            | (b == 0)
            | (ta != tb)
            | (ta == N_BYTE)
            | (ta == SENTINEL)
            | lower
        ) & inrow[:, 1:]
        anymax = jnp.any(lm, axis=1)

        ok = valid & distinct & anymax
        return (
            ls.astype(jnp.int32),
            lbs.astype(jnp.int32),
            ubs.astype(jnp.int32),
            sa_rows.astype(jnp.int32),
            so_rows.astype(jnp.int32),
            ok,
            count,
        )

    _kern_cache[key] = enum_mm
    return enum_mm


def _get_enum_multi_mesh(mesh, npad: int, W: int, NSEPW: int):
    """O(n/P)-memory multiMUM enumerate (shard_map twin of enum_mm).

    The GSPMD enum_mm materializes O(n) per device: its PSV/NSV pointer
    doubling does log(n) rounds of arbitrary-distance gathers.  But a
    multiMUM interval that survives the ``width <= nsamples`` gate has
    its PSV within W = nsamples slots below and its NSV within W slots
    above (width = nsv - max(psv,0)), so a RADIUS-W scan over a W-wide
    halo finds the true psv/nsv of every kept candidate; rows whose
    nearest smaller value lies farther get a sentinel that fails the
    width gate exactly like the true (wider) interval would.  Sample
    ids come from a searchsorted over the replicated (tiny) nsep table
    instead of the position-sharded SO, the left-maximality text probes
    T[a-1]/T[b-1] ride ONE sort-based distributed gather per level
    (parallel/dsa.collective_kit.dist_gather2), and candidates compact
    by a comparator-network sort on (candidate? slot : BIG) — ascending
    global slot order, exactly the jnp.nonzero order of enum_mm.  Every
    collective is threaded into one dependency chain (kit.after), and
    simultaneous per-array halo moves ride stacked ppermutes.

    Replaces: the LCP-interval stack walk of getmultimums
    (reveallib/reveal.c:436-580) at multi-chip scale."""
    key = ("mm_mesh", id(mesh), npad, W, NSEPW)
    fn = _kern_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    from ..core.encoding import N_BYTE, SENTINEL
    from ..core.jaxconfig import configure_jax
    from ..parallel.dsa import collective_kit

    configure_jax()

    axis = mesh.axis_names[0]
    P = int(mesh.devices.size)
    assert npad % P == 0
    sh = npad // P
    kit = collective_kit(axis, P, sh)
    net_sort = kit.make_net_sort(sh)
    i32 = jnp.int32
    BIG = jnp.int32(2**31 - 1)

    def shard_fn(T, SA, LCP, SEG, nsep, nreal, minl, minn, nsmp):
        me = jax.lax.axis_index(axis)
        iar_l = jnp.arange(sh, dtype=i32)
        iar_g = me.astype(i32) * sh + iar_l

        # W-wide halo blocks of (LCP, SA) both sides — one stacked
        # ppermute per direction; LCP fills are -1 so the radius scans
        # "hit" past either end (psv=-1 / nsv=npad, the enum_mm stop
        # values), SA fills are never read (window cols are clipped
        # into [0, npad))
        hp = jax.lax.ppermute(
            jnp.stack([LCP[-W:], SA[-W:]]), axis,
            [(j, j + 1) for j in range(P - 1)],
        )
        neg = jnp.full(W, -1, i32)
        lcp_p = jnp.where(me == 0, neg, hp[0])
        sa_p = jnp.where(me == 0, jnp.zeros(W, i32), hp[1])
        hn = jax.lax.ppermute(
            kit.after(jnp.stack([LCP[:W], SA[:W]]), hp), axis,
            [(j, j - 1) for j in range(1, P)],
        )
        lcp_n = jnp.where(me == P - 1, neg, hn[0])
        sa_n = jnp.where(me == P - 1, jnp.zeros(W, i32), hn[1])
        lcp_ext = jnp.concatenate([lcp_p, LCP, lcp_n])
        sa_ext = jnp.concatenate([sa_p, SA, sa_n])

        # radius-W nearest-smaller-value scans (see docstring)
        found_p = jnp.zeros(sh, bool)
        dp = jnp.zeros(sh, i32)
        found_n = jnp.zeros(sh, bool)
        dn = jnp.zeros(sh, i32)
        for d in range(1, W + 1):
            cp = jax.lax.dynamic_slice(lcp_ext, (W - d,), (sh,))
            hit = ~found_p & (cp < LCP)
            dp = jnp.where(hit, d, dp)
            found_p = found_p | hit
            cn = jax.lax.dynamic_slice(lcp_ext, (W + d,), (sh,))
            hit = ~found_n & (cn < LCP)
            dn = jnp.where(hit, d, dn)
            found_n = found_n | hit
        psv = jnp.where(found_p, iar_g - dp, iar_g - W - 1)
        nsv = jnp.where(found_n, iar_g + dn, iar_g + W + 1)

        lb = jnp.maximum(psv, 0)
        ub = nsv - 1
        width = ub - lb + 1
        cand = (
            (SEG >= 0)
            & (LCP >= jnp.maximum(minl, 1))
            & (width >= minn)
            & (width <= nsmp)
        )

        # per-slot left-maximality flag for the pair (slot-1, slot):
        # the two text probes are arbitrary global positions -> one
        # distributed gather (threaded behind the halos)
        a_pair = jax.lax.dynamic_slice(sa_ext, (W - 1,), (sh,))
        b_pair = SA
        ta, tb = kit.dist_gather2(
            kit.after(T.astype(i32), hn),
            jnp.maximum(a_pair - 1, 0),
            jnp.maximum(b_pair - 1, 0),
            iar_g,
            me,
        )
        lower = (ta >= ord("a")) & (ta <= ord("z"))
        lm = (
            (a_pair == 0)
            | (b_pair == 0)
            | (ta != tb)
            | (ta == N_BYTE)
            | (ta == SENTINEL)
            | lower
        )
        # per-slot sample ordinal (replicated nsep; SO[pos] ==
        # searchsorted(nsep, pos) by textstore construction)
        ssid = jnp.searchsorted(
            nsep, jnp.clip(SA, 0, nreal - 1), side="left"
        ).astype(i32)

        count = jax.lax.psum(
            kit.after(jnp.sum(cand.astype(i32)), lm), axis
        )
        # compaction: global net sort by (candidate? slot : BIG) over
        # the 4 scalar planes only; the (K, W) window matrices are
        # built by the companion kernel (_get_win_multi_mesh) for just
        # the fetched candidates — carrying 2W window columns through
        # the comparator network would make per-device temps ~8W
        # planes (measured 18 MB at sh=2^15) for data the host only
        # needs for `count` rows
        skey = jnp.where(cand, iar_g, BIG)
        skey = kit.after(skey, count)
        sorted_out = net_sort(
            (skey, LCP.astype(i32), lb.astype(i32), ub.astype(i32)),
            nkeys=1,
        )
        return sorted_out[1:] + (lm.astype(i32), ssid, count)

    sharded = Pspec(axis)
    repl = Pspec()
    fn = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(sharded,) * 4 + (repl,) * 5,
            out_specs=(sharded,) * 5 + (repl,),
            check_vma=False,
        )
    )
    _kern_cache[key] = fn
    return fn


def _get_win_multi_mesh(mesh, npad: int, W: int, K: int):
    """Companion to _get_enum_multi_mesh: (K, W) window matrices + ok
    flags for the fetched candidate rows.  Each global slot is owned by
    exactly one shard, so every shard contributes its overlap of each
    row's window [lb, lb+W) into a zero buffer and ONE packed psum
    replicates the result — no halos, O(K·W) per device."""
    key = ("mm_win", id(mesh), npad, W, K)
    fn = _kern_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    from ..core.jaxconfig import configure_jax

    configure_jax()

    axis = mesh.axis_names[0]
    P = int(mesh.devices.size)
    assert npad % P == 0
    sh = npad // P
    i32 = jnp.int32

    def win_fn(SA, lm, ssid, qlb, qub):
        me = jax.lax.axis_index(axis)
        base = me.astype(i32) * sh
        cols = qlb[:, None] + jnp.arange(W, dtype=i32)[None, :]
        cc = jnp.clip(cols, 0, npad - 1)
        loc = cc - base
        own = (loc >= 0) & (loc < sh)
        locc = jnp.clip(loc, 0, sh - 1)
        contrib = jnp.stack(
            [
                jnp.where(own, SA[locc], 0),
                jnp.where(own, ssid[locc], 0),
                jnp.where(own, lm[locc], 0),
            ]
        )
        out = jax.lax.psum(contrib, axis)
        sa_win, so_win, lm_win = out[0], out[1], out[2]
        # ok flags exactly as enum_mm: distinct samples over the
        # in-row window + at least one left-maximal adjacent pair
        inrow = cols <= qub[:, None]
        so_pad = jnp.where(
            inrow,
            so_win,
            jnp.int32(-1) - jnp.arange(W, dtype=i32)[None, :],
        )
        so_sorted = jnp.sort(so_pad, axis=1)
        distinct = jnp.all(
            so_sorted[:, 1:] != so_sorted[:, :-1], axis=1
        )
        anymax = jnp.any(
            (lm_win[:, 1:] > 0) & (cols[:, 1:] <= qub[:, None]), axis=1
        )
        return sa_win, so_win, distinct & anymax

    sharded = Pspec(axis)
    repl = Pspec()
    fn = jax.jit(
        shard_map(
            win_fn,
            mesh=mesh,
            in_specs=(sharded,) * 3 + (repl,) * 2,
            out_specs=(repl,) * 3,
            check_vma=False,
        )
    )
    _kern_cache[key] = fn
    return fn


def _get_apply(NI: int, SCAP: int):
    """Level-apply kernel, keyed on interval-table bucket NI and segment
    bucket SCAP (both static)."""
    key = ("apply", NI, SCAP)
    fn = _kern_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp

    from ..core.jaxconfig import configure_jax

    configure_jax()

    def seg_min_scan(values, reset):
        """min of values since the last slot where reset was True
        (inclusive of the current slot)."""

        def combine(x, y):
            m1, f1 = x
            m2, f2 = y
            return jnp.where(f2, m2, jnp.minimum(m1, m2)), f1 | f2

        m, _ = jax.lax.associative_scan(combine, (values, reset))
        return m

    def pair_search(ks, kb, qs, qb, right: bool):
        """Vectorized lower/upper bound over sorted (sid, begin) pairs."""
        import jax.numpy as jnp

        m = ks.shape[0]
        lo = jnp.zeros_like(qs)
        hi = jnp.full_like(qs, m)
        steps = max(1, int(math.ceil(math.log2(max(m, 2)))) + 1)
        for _ in range(steps):
            act = lo < hi
            mid = (lo + hi) // 2
            midc = jnp.clip(mid, 0, m - 1)
            s = ks[midc]
            bgn = kb[midc]
            if right:
                go = (s < qs) | ((s == qs) & (bgn <= qb))
            else:
                go = (s < qs) | ((s == qs) & (bgn < qb))
            lo = jnp.where(act & go, mid + 1, lo)
            hi = jnp.where(act & ~go, mid, hi)
        return lo

    @jax.jit
    def apply_level(
        T, SA, LCP, SEG, begins, ends, cls_tab, seg_map, mbegins, mends,
        mk_sid, mk_beg,
    ):
        n = SA.shape[0]
        iar = jnp.arange(n, dtype=jnp.int32)

        # ---- classify slots by text position over disjoint intervals --
        pos = SA
        ii = jnp.searchsorted(begins, pos, side="right") - 1
        ii_c = jnp.clip(ii, 0, NI - 1)
        hit = (ii >= 0) & (pos < ends[ii_c])
        cls = jnp.where(hit, cls_tab[ii_c], 0).astype(jnp.int32)

        # ---- per-class child LCP: segmented running-min over parents --
        seg_prev = jnp.concatenate([jnp.full(1, -2, SEG.dtype), SEG[:-1]])
        segstart = SEG != seg_prev
        cls_prev = jnp.concatenate([jnp.zeros(1, jnp.int32), cls[:-1]])
        newlcp = jnp.zeros_like(LCP)
        for c in (1, 2, 4):
            reset = segstart | ((cls_prev == c) & ~segstart)
            m = seg_min_scan(LCP, reset)
            newlcp = jnp.where(cls == c, m, newlcp)

        # ---- new segment ids ------------------------------------------
        seg_c = jnp.clip(SEG, 0, SCAP - 1)
        nseg = jnp.where(
            (SEG >= 0) & (cls > 0) & (cls != 3),
            seg_map[seg_c, cls],
            jnp.int32(-1),
        )
        dead = nseg < 0
        sortkey = jnp.where(dead, jnp.int32(SCAP), nseg)

        # ---- stable partition by child id -----------------------------
        skey, _slot, new_sa, new_lcp = jax.lax.sort(
            (sortkey, iar, SA, newlcp), num_keys=2
        )
        new_seg = jnp.where(skey >= SCAP, jnp.int32(-1), skey)
        # first slot of each child gets LCP 0
        sprev = jnp.concatenate([jnp.full(1, -2, new_seg.dtype), new_seg[:-1]])
        first = new_seg != sprev
        new_lcp = jnp.where(first | (new_seg < 0), 0, new_lcp)

        counts = jax.ops.segment_sum(
            (new_seg >= 0).astype(jnp.int32),
            jnp.clip(new_seg, 0, SCAP - 1),
            num_segments=SCAP,
        )

        # ---- lowercase matched text (reveal.c:1230-1234) --------------
        tpos = jnp.arange(T.shape[0], dtype=jnp.int32)
        mi = jnp.searchsorted(mbegins, tpos, side="right") - 1
        mi_c = jnp.clip(mi, 0, mbegins.shape[0] - 1)
        inm = (mi >= 0) & (tpos < mends[mi_c])
        up = (T >= ord("A")) & (T <= ord("Z"))
        new_T = jnp.where(inm & up, T + 32, T)

        # ---- boundary-repair candidates (reveal.c:666-727 trigger) ----
        # a slot needs repair when one of ITS OWN leading child's new
        # match begins lies inside (SA, SA + max(LCP, next LCP)); the
        # per-child begins are encoded as sorted sid*stride+begin keys
        lcp_next = jnp.concatenate([new_lcp[1:], jnp.zeros(1, new_lcp.dtype)])
        nxt_same = jnp.concatenate(
            [new_seg[1:] == new_seg[:-1], jnp.zeros(1, bool)]
        )
        win = jnp.maximum(
            new_lcp, jnp.where(nxt_same, lcp_next, new_lcp)
        )
        klo = pair_search(mk_sid, mk_beg, new_seg, new_sa, right=True)
        khi = pair_search(
            mk_sid, mk_beg, new_seg, new_sa + win, right=False
        )
        cross = (khi > klo) & (new_seg >= 0)
        rcount = jax.ops.segment_sum(
            cross.astype(jnp.int32),
            jnp.clip(new_seg, 0, SCAP - 1),
            num_segments=SCAP,
        )

        return new_T, new_sa, new_lcp, new_seg, counts, rcount

    _kern_cache[key] = apply_level
    return apply_level



def _get_apply_mesh(NI, SCAP, mesh, npad):
    """O(n/P)-memory level-apply: the same computation as _get_apply but
    written in shard_map with explicit collectives, so no step
    materializes a full-size operand on any device (the GSPMD route
    all-gathers around the global stable sort — per-device memory stays
    O(n)).  The global partition sort is the comparator-network
    merge-split of parallel/dsa.py (bitonic layers for power-of-two P);
    scans cross shards via packed halo ppermutes + one all_gather of
    per-shard scan summaries; counts come back via one psum.  Every
    collective is threaded into one dependency chain (kit.after) — the
    gloo posting-order rule of parallel/dsa.py applies to any shard_map
    program that may run multi-process."""
    key = ("apply_mesh", NI, SCAP, id(mesh), npad)
    fn = _kern_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp
    from functools import partial
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    from ..core.jaxconfig import configure_jax
    from ..parallel.dsa import collective_kit

    configure_jax()

    axis = mesh.axis_names[0]
    P = int(mesh.devices.size)
    assert npad % P == 0
    sh = npad // P
    kit = collective_kit(axis, P, sh)
    net_sort = kit.make_net_sort(sh)
    i32 = jnp.int32
    BIGM = jnp.int32(2**30)

    def pair_search(ks, kb, qs, qb, right: bool):
        """Vectorized lower/upper bound over sorted (sid, begin) pairs
        (replicated tables, local queries)."""
        m = ks.shape[0]
        lo = jnp.zeros_like(qs)
        hi = jnp.full_like(qs, m)
        steps = max(1, int(math.ceil(math.log2(max(m, 2)))) + 1)
        for _ in range(steps):
            act = lo < hi
            mid = (lo + hi) // 2
            midc = jnp.clip(mid, 0, m - 1)
            s = ks[midc]
            bgn = kb[midc]
            if right:
                go = (s < qs) | ((s == qs) & (bgn <= qb))
            else:
                go = (s < qs) | ((s == qs) & (bgn < qb))
            lo = jnp.where(act & go, mid + 1, lo)
            hi = jnp.where(act & ~go, mid, hi)
        return lo

    def local_seg_min(values, reset):
        """Inclusive (min-since-reset, any-reset-yet) scan of one shard."""

        def combine(x, y):
            m1, f1 = x
            m2, f2 = y
            return jnp.where(f2, m2, jnp.minimum(m1, m2)), f1 | f2

        return jax.lax.associative_scan(combine, (values, reset))

    def shard_fn(
        T, SA, LCP, SEG, begins, ends, cls_tab, seg_map, mbegins, mends,
        mk_sid, mk_beg,
    ):
        me = jax.lax.axis_index(axis)
        iar_g = me.astype(i32) * sh + jnp.arange(sh, dtype=i32)

        # ---- classify slots (replicated interval tables, local) ------
        pos = SA
        ii = jnp.searchsorted(begins, pos, side="right") - 1
        ii_c = jnp.clip(ii, 0, NI - 1)
        hit = (ii >= 0) & (pos < ends[ii_c])
        cls = jnp.where(hit, cls_tab[ii_c], 0).astype(i32)

        # ---- prev halo for SEG and cls (ONE packed ppermute; pack the
        # last elements into one (2,) vector — kit.prev_halo slices the
        # leading axis, so a (2,1) stack would only ship its last row)
        h = jax.lax.ppermute(
            jnp.stack([SEG[-1], cls[-1]]),
            axis,
            [(j, j + 1) for j in range(P - 1)],
        )
        seg_pm1 = jnp.where(me == 0, jnp.int32(-2), h[0])
        cls_pm1 = jnp.where(me == 0, jnp.int32(0), h[1])
        seg_prev = jnp.concatenate([seg_pm1[None], SEG[:-1]])
        cls_prev = jnp.concatenate([cls_pm1[None], cls[:-1]])
        segstart = SEG != seg_prev

        # ---- per-class child LCP: segmented min with cross-shard carry
        ms, fs, resets = [], [], []
        for c in (1, 2, 4):
            reset = segstart | ((cls_prev == c) & ~segstart)
            m, f = local_seg_min(LCP, reset)
            ms.append(m)
            fs.append(f)
            resets.append(reset)
        # one all_gather of the 3 per-shard (last-min, any-reset) pairs,
        # threaded behind the halo chain (after): summaries (2, 3)
        summ = jnp.stack(
            [
                jnp.stack([m[-1] for m in ms]),
                jnp.stack([f[-1].astype(i32) for f in fs]),
            ]
        )
        summ = kit.after(summ, h)
        gath = jax.lax.all_gather(summ, axis)  # (P, 2, 3)

        newlcp = jnp.zeros_like(LCP)
        for k, c in enumerate((1, 2, 4)):
            # exclusive combine of shards < me: the latest shard with a
            # reset wins; min over trailing reset-free shards
            mvals = gath[:, 0, k]
            fvals = gath[:, 1, k] > 0
            pidx = jnp.arange(P)
            before = pidx < me
            # carry = min over shards j in (last-reset-shard .. me-1) of
            # mvals[j]; computed as a small reverse scan over P entries
            def comb(xc, yc):
                m1, f1 = xc
                m2, f2 = yc
                return jnp.where(f2, m2, jnp.minimum(m1, m2)), f1 | f2

            mm, ff = jax.lax.associative_scan(
                comb,
                (
                    jnp.where(before, mvals, BIGM),
                    jnp.where(before, fvals, False),
                ),
            )
            carry = mm[P - 1]
            out = jnp.where(
                fs[k], ms[k], jnp.minimum(carry, ms[k])
            )
            newlcp = jnp.where(cls == c, out, newlcp)

        # ---- new segment ids ------------------------------------------
        seg_c = jnp.clip(SEG, 0, SCAP - 1)
        nseg = jnp.where(
            (SEG >= 0) & (cls > 0) & (cls != 3),
            seg_map[seg_c, cls],
            jnp.int32(-1),
        )
        dead = nseg < 0
        sortkey = jnp.where(dead, jnp.int32(SCAP), nseg)
        sortkey = kit.after(sortkey, gath)  # single collective chain

        # ---- global stable partition by child id (comparator network)
        skey, _slot, new_sa, new_lcp = net_sort(
            (sortkey, iar_g, SA, newlcp), nkeys=2
        )
        new_seg = jnp.where(skey >= SCAP, jnp.int32(-1), skey)

        # ---- first-slot LCP zero: prev halo of new_seg ----------------
        h2 = kit.prev_halo(new_seg[-1:])
        sprev0 = jnp.where(me == 0, jnp.int32(-2), h2[0])
        sprev = jnp.concatenate([sprev0[None], new_seg[:-1]])
        first = new_seg != sprev
        new_lcp = jnp.where(first | (new_seg < 0), 0, new_lcp)

        counts = jax.ops.segment_sum(
            (new_seg >= 0).astype(i32),
            jnp.clip(new_seg, 0, SCAP - 1),
            num_segments=SCAP,
        )

        # ---- lowercase matched text (local positions) -----------------
        tpos = iar_g
        mi = jnp.searchsorted(mbegins, tpos, side="right") - 1
        mi_c = jnp.clip(mi, 0, mbegins.shape[0] - 1)
        inm = (mi >= 0) & (tpos < mends[mi_c])
        up = (T >= ord("A")) & (T <= ord("Z"))
        new_T = jnp.where(inm & up, T + 32, T)

        # ---- boundary-repair candidates -------------------------------
        # next halo of (new_seg, new_lcp) as ONE packed (2,) ppermute,
        # threaded behind h2
        nh_in = kit.after(jnp.stack([new_seg[0], new_lcp[0]]), h2)
        nh = jax.lax.ppermute(
            nh_in, axis, [(j, j - 1) for j in range(1, P)]
        )
        nseg_next = jnp.where(me == P - 1, jnp.int32(-3), nh[0])
        nlcp_next = jnp.where(me == P - 1, jnp.int32(0), nh[1])
        lcp_next = jnp.concatenate([new_lcp[1:], nlcp_next[None]])
        seg_next = jnp.concatenate([new_seg[1:], nseg_next[None]])
        nxt_same = seg_next == new_seg
        win = jnp.maximum(
            new_lcp, jnp.where(nxt_same, lcp_next, new_lcp)
        )
        klo = pair_search(mk_sid, mk_beg, new_seg, new_sa, right=True)
        khi = pair_search(
            mk_sid, mk_beg, new_seg, new_sa + win, right=False
        )
        cross = (khi > klo) & (new_seg >= 0)
        rcount = jax.ops.segment_sum(
            cross.astype(i32),
            jnp.clip(new_seg, 0, SCAP - 1),
            num_segments=SCAP,
        )

        # ---- ONE psum for (counts, rcount), chained behind nh ---------
        both = kit.after(jnp.stack([counts, rcount]), nh)
        both = jax.lax.psum(both, axis)

        return new_T, new_sa, new_lcp, new_seg, both[0], both[1]

    sharded = Pspec(axis)
    repl = Pspec()
    fn = jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(sharded,) * 4 + (repl,) * 8,
            out_specs=(sharded,) * 4 + (repl,) * 2,
            check_vma=False,
        )
    )
    _kern_cache[key] = fn
    return fn


# ---------------------------------------------------------------------------
# driver-facing state
# ---------------------------------------------------------------------------

class DeviceFrontier:
    """Owns the packed device arrays and the per-level dispatches."""

    def __init__(
        self, T, SA, LCP, SO, nsep0: int, nsamples: int, mesh=None,
        nsep=None,
    ):
        """mesh: optional jax.sharding.Mesh — the packed slot arrays are
        sharded over its first axis and the SAME kernels run under GSPMD,
        which partitions the elementwise work per shard and inserts the
        collectives (halo exchanges for the adjacent-slot conditions,
        all-to-alls for the distributed stable sort) automatically.  This
        is the multi-chip rem path: one logical frontier, N devices."""
        import jax.numpy as jnp

        self.mesh = mesh
        self.n = int(len(SA))
        self.nsep0 = int(nsep0)
        self.nsamples = int(nsamples)
        # full sentinel table (replicated, tiny) — lets the O(n/P) mesh
        # multi enumerate derive sample ordinals without touching the
        # position-sharded SO (SO[pos] == searchsorted(nsep, pos))
        self.nsep = (
            None if nsep is None else np.asarray(nsep, dtype=np.int64)
        )
        # pad every device array to a power-of-two bucket so kernel
        # compiles are shared across input sizes (dead tail: SEG = -1)
        npad = _next_pow2(self.n)
        T_p = np.zeros(npad, dtype=np.uint8)
        T_p[: len(T)] = np.asarray(T, dtype=np.uint8)
        SA_p = np.full(npad, self.n - 1, dtype=np.int32)
        SA_p[: self.n] = np.asarray(SA, dtype=np.int32)
        LCP_p = np.zeros(npad, dtype=np.int32)
        LCP_p[: self.n] = np.asarray(LCP, dtype=np.int32)
        SO_p = np.zeros(npad, dtype=np.int32)
        SO_p[: len(SO)] = np.asarray(SO, dtype=np.int32)
        SEG_p = np.full(npad, -1, dtype=np.int32)
        SEG_p[: self.n] = 0
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            shard = NamedSharding(mesh, P(axis))
            put = lambda x: jax.device_put(jnp.asarray(x), shard)  # noqa: E731
            self.T = put(T_p)
            self.SA = put(SA_p)
            self.LCP = put(LCP_p)
            self.SO = put(SO_p)
            self.SEG = put(SEG_p)
        else:
            self.T = jnp.asarray(T_p)
            self.SA = jnp.asarray(SA_p)
            self.LCP = jnp.asarray(LCP_p)
            self.SO = jnp.asarray(SO_p)
            self.SEG = jnp.asarray(SEG_p)
        self._K1 = max(1024, _next_pow2(self.n // 8))
        self._K2 = max(1024, _next_pow2(self.n // 8))

    # -- enumeration ------------------------------------------------------
    def enumerate_pairwise(self, minl: int):
        """{slot-sorted candidates} -> dict sid -> [(l,2,((0,a),(1,b)))]
        in SA-slot order, exactly getmums_rem's per-segment order."""
        import jax
        import jax.numpy as jnp

        npad = int(self.SA.shape[0])
        if self.mesh is not None and npad % int(self.mesh.devices.size) == 0:
            # O(n/P) shard_map kernel: full-width sort compaction, no
            # K1 capacity loop (count <= npad by construction)
            fn = _get_enum_pairwise_mesh(self.mesh, npad)
            out = fn(
                self.T, self.SA, self.LCP, self.SEG,
                jnp.int32(self.nsep0), jnp.int32(minl),
            )
            spec = min(_SPEC_PREFIX, npad)
            count, slots, l, a, b = jax.device_get(
                (out[4],)
                + tuple(_get_prefix_fetch_mesh(
                    spec, 4, self.mesh, npad
                )(out[0], out[1], out[2], out[3]))
            )
            count = int(count)
            if count > spec:
                K = _fetch_bucket(count, npad)
                slots, l, a, b = jax.device_get(
                    _get_prefix_fetch_mesh(K, 4, self.mesh, npad)(
                        out[0], out[1], out[2], out[3]
                    )
                )
            slots, l, a, b = (
                np.asarray(x)[:count] for x in (slots, l, a, b)
            )
            return slots, l, a, b

        while True:
            fn = _get_enum_pairwise(self._K1)
            out = fn(
                self.T, self.SA, self.LCP, self.SEG,
                jnp.int32(self.nsep0), jnp.int32(minl),
            )
            # speculative fetch: the scalar count AND a small prefix of
            # the K1-wide result arrays in ONE device round trip — late
            # levels have a handful of candidates, so this usually
            # completes the enumeration; only when count exceeds the
            # speculative width is a second (pow4-bucketed) prefix
            # fetched.  A full-width transfer would dominate the level
            # time on a bandwidth-constrained device link.
            spec = min(_SPEC_PREFIX, self._K1)
            count, slots, l, a, b = jax.device_get(
                (out[5],)
                + tuple(_get_prefix_fetch(spec)(
                    out[0], out[1], out[2], out[3]
                ))
            )
            count = int(count)
            if count <= self._K1:
                break
            self._K1 = _next_pow2(count)
        if count > spec:
            K = _fetch_bucket(count, self._K1)
            slots, l, a, b = jax.device_get(
                _get_prefix_fetch(K)(out[0], out[1], out[2], out[3])
            )
        slots, l, a, b = (
            np.asarray(x)[:count] for x in (slots, l, a, b)
        )
        return slots, l, a, b

    def enumerate_multi(self, minl: int, minn: int):
        """LCP-interval multiMUM candidates: (l, lb, ub, sa_rows, so_rows)
        for valid intervals (pre-dedup)."""
        import jax
        import jax.numpy as jnp

        W = max(2, self.nsamples)
        npad = int(self.SA.shape[0])
        if (
            self.mesh is not None
            and self.nsep is not None
            and npad % int(self.mesh.devices.size) == 0
            # the one-neighbor halo needs shard width >= radius W, or
            # the kernel fails at trace time; fall through to GSPMD
            and npad // int(self.mesh.devices.size) >= W
        ):
            # O(n/P) shard_map twin (radius-W NSV scans + one
            # distributed text gather; no K2 capacity loop)
            NSEPW = max(2, _next_pow2(len(self.nsep)))
            nsep_pad = np.full(NSEPW, npad, dtype=np.int32)
            nsep_pad[: len(self.nsep)] = self.nsep.astype(np.int32)
            fn = _get_enum_multi_mesh(self.mesh, npad, W, NSEPW)
            out = fn(
                self.T, self.SA, self.LCP, self.SEG,
                jnp.asarray(nsep_pad), jnp.int32(self.n),
                jnp.int32(minl), jnp.int32(minn),
                jnp.int32(self.nsamples),
            )
            spec = min(_SPEC_PREFIX, npad)
            fetched = jax.device_get(
                (out[5],)
                + _get_prefix_fetch_mesh(spec, 3, self.mesh, npad)(
                    *out[:3]
                )
            )
            count = int(fetched[0])
            ls, lbs, ubs = fetched[1:]
            if count > spec:
                K = _fetch_bucket(count, npad)
                ls, lbs, ubs = jax.device_get(
                    _get_prefix_fetch_mesh(K, 3, self.mesh, npad)(
                        *out[:3]
                    )
                )
            ls = np.asarray(ls)[:count]
            lbs = np.asarray(lbs)[:count]
            ubs = np.asarray(ubs)[:count]
            if count == 0:
                e = np.empty(0, np.int32)
                e2 = np.empty((0, W), np.int32)
                return e, e, e, e2, e2
            # companion kernel: (K, W) windows + ok for the fetched rows
            K = _fetch_bucket(count, npad)
            qlb = np.zeros(K, dtype=np.int32)
            qub = np.full(K, -1, dtype=np.int32)  # empty row: ok=False
            qlb[:count] = lbs
            qub[:count] = ubs
            wfn = _get_win_multi_mesh(self.mesh, npad, W, K)
            sa_rows, so_rows, ok = jax.device_get(
                wfn(
                    self.SA, out[3], out[4],
                    jnp.asarray(qlb), jnp.asarray(qub),
                )
            )
            ok = np.asarray(ok)[:count].astype(bool)
            sa_rows = np.asarray(sa_rows)[:count]
            so_rows = np.asarray(so_rows)[:count]
            return (
                ls[ok], lbs[ok], ubs[ok], sa_rows[ok], so_rows[ok]
            )
        while True:
            fn = _get_enum_multi(self._K2, W)
            out = fn(
                self.T, self.SA, self.LCP, self.SEG, self.SO,
                jnp.int32(minl), jnp.int32(minn),
                jnp.int32(self.nsamples),
            )
            # speculative count+prefix fetch (see enumerate_pairwise)
            spec = min(_SPEC_PREFIX, self._K2)
            fetched = jax.device_get(
                (out[6],)
                + tuple(_get_prefix_fetch(spec)(
                    out[0], out[1], out[2], out[3], out[4], out[5]
                ))
            )
            count = int(fetched[0])
            ls, lbs, ubs, sa_rows, so_rows, ok = fetched[1:]
            if count <= self._K2:
                break
            self._K2 = _next_pow2(count)
        if count > spec:
            K = _fetch_bucket(count, self._K2)
            ls, lbs, ubs, sa_rows, so_rows, ok = jax.device_get(
                _get_prefix_fetch(K)(
                    out[0], out[1], out[2], out[3], out[4], out[5]
                )
            )
        ok = np.asarray(ok)[:count]
        ls = np.asarray(ls)[:count][ok]
        lbs = np.asarray(lbs)[:count][ok]
        ubs = np.asarray(ubs)[:count][ok]
        sa_rows = np.asarray(sa_rows)[:count][ok]
        so_rows = np.asarray(so_rows)[:count][ok]
        return ls, lbs, ubs, sa_rows, so_rows

    # -- level application ------------------------------------------------
    def apply_level(
        self, intervals, seg_map_rows, match_intervals, repair_jobs=()
    ):
        """intervals: [(begin, end, cls)] disjoint across the text;
        seg_map_rows: (S, 5) int32 parent-sid × class -> new sid (-1 dead);
        match_intervals: sorted [(begin, end)] newly matched this level;
        repair_jobs: [(leading child sid, [match begins])] — candidates
        are detected per child against its OWN begins only.

        Returns (counts, repair_counts) per new sid."""
        import jax
        import jax.numpy as jnp

        S = seg_map_rows.shape[0]
        SCAP = _table_bucket(max(S, int(seg_map_rows.max()) + 1, 2))
        seg_map = np.full((SCAP, 5), -1, dtype=np.int32)
        seg_map[:S] = seg_map_rows

        iv = sorted(intervals)
        NI = _table_bucket(max(len(iv), 1))
        begins = np.full(NI, self.n + 1, dtype=np.int32)
        ends = np.full(NI, self.n + 1, dtype=np.int32)
        cls_tab = np.zeros(NI, dtype=np.int32)
        for i, (bgn, end, c) in enumerate(iv):
            begins[i] = bgn
            ends[i] = end
            cls_tab[i] = c

        mv = sorted(match_intervals)
        NM = _table_bucket(max(len(mv), 1))
        mbegins = np.full(NM, self.n + 1, dtype=np.int32)
        mends = np.full(NM, self.n + 1, dtype=np.int32)
        for i, (bgn, end) in enumerate(mv):
            mbegins[i] = bgn
            mends[i] = end

        pairs = sorted(
            (sid, bgn) for sid, bgns in repair_jobs for bgn in bgns
        )
        NK = _table_bucket(max(len(pairs), 1))
        mk_sid = np.full(NK, 2**30, dtype=np.int32)
        mk_beg = np.zeros(NK, dtype=np.int32)
        for i, (sid, bgn) in enumerate(pairs):
            mk_sid[i] = sid
            mk_beg[i] = bgn

        npad = int(self.SA.shape[0])
        if self.mesh is not None and npad % int(self.mesh.devices.size) == 0:
            # O(n/P) explicit-collective kernel (comparator-network
            # sort + halo scans); GSPMD would all-gather around the
            # global sort and keep per-device memory O(n)
            fn = _get_apply_mesh(NI, SCAP, self.mesh, npad)
        else:
            fn = _get_apply(NI, SCAP)
        self.T, self.SA, self.LCP, self.SEG, counts, rcount = fn(
            self.T, self.SA, self.LCP, self.SEG,
            jnp.asarray(begins), jnp.asarray(ends), jnp.asarray(cls_tab),
            jnp.asarray(seg_map), jnp.asarray(mbegins), jnp.asarray(mends),
            jnp.asarray(mk_sid), jnp.asarray(mk_beg),
        )
        counts, rcount = jax.device_get((counts, rcount))
        return np.asarray(counts), np.asarray(rcount)

    # -- boundary repair --------------------------------------------------
    def repair_child(self, start: int, n: int, begins: List[int]):
        """Fetch one child's slice, run the exact bubble_sort repair
        (native/esa.cpp repair_leading; numpy fallback), scatter back.

        Fetch/scatter go through dynamic_slice windows whose width is a
        power-of-8 bucket and whose start is a traced scalar, so every
        repair of a similar-sized child reuses ONE compiled executable —
        a raw ``self.SA[start:start+n]`` bakes (start, n) into the jaxpr
        and recompiles per child (minutes of tunnel compiles per run)."""
        import jax

        if n == 0 or not begins:
            return
        npad = self.SA.shape[0]
        W = min(_bucket8(max(n, 8)), npad)
        start_eff = min(start, npad - W)
        off = start - start_eff
        fetch, scatter = _get_repair_window(W)
        sa_w, lcp_w = fetch(self.SA, self.LCP, start_eff)
        sa_w = np.array(jax.device_get(sa_w))  # writable copies
        lcp_w = np.array(jax.device_get(lcp_w))
        sa = sa_w[off : off + n].astype(np.int64)
        lcp = lcp_w[off : off + n].astype(np.int64)
        _repair_host(sa, lcp, sorted(begins))
        sa_w[off : off + n] = sa.astype(np.int32)
        lcp_w[off : off + n] = lcp.astype(np.int32)
        self.SA, self.LCP = scatter(
            self.SA, self.LCP, sa_w, lcp_w, start_eff
        )


    def repair_children(self, jobs):
        """Batched boundary repair: ONE windowed gather + ONE scatter for
        every affected child of a level (jobs: [(start, n, begins)]).
        The per-child host repair walk is unchanged; only the device
        traffic is batched (385 per-child round trips -> 2 per level on
        the 1a/1b trace)."""
        import jax

        jobs = [(s, n, b) for s, n, b in jobs if n > 0 and b]
        if not jobs:
            return
        npad = int(self.SA.shape[0])
        # group by window bucket so one near-full-size child doesn't
        # inflate every row's padded width (R × Wmax transfer blow-up);
        # pow2 buckets (not pow8): transfer bytes dominate compile count
        # over the device link.  Floors (W >= 1024, R >= 8) keep the
        # number of distinct (R, W) gather/scatter compiles small.
        groups = {}
        for s, n, b in jobs:
            W = min(max(1024, _next_pow2(max(n, 8))), npad)
            groups.setdefault(W, []).append((s, n, b))
        for W, grp in sorted(groups.items()):
            R = max(8, _next_pow2(len(grp)))
            starts = np.zeros(R, dtype=np.int32)
            ns = np.zeros(R, dtype=np.int32)
            for r, (s, n, _b) in enumerate(grp):
                starts[r] = s
                ns[r] = n
            if (
                self.mesh is not None
                and npad % int(self.mesh.devices.size) == 0
            ):
                fetch, scatter = _get_repair_rows_mesh(
                    R, W, npad, self.mesh
                )
            else:
                fetch, scatter = _get_repair_rows(R, W, npad)
            sa_rows, lcp_rows = fetch(self.SA, self.LCP, starts)
            sa_rows = np.array(jax.device_get(sa_rows))
            lcp_rows = np.array(jax.device_get(lcp_rows))
            for r, (s, n, begins) in enumerate(grp):
                sa = sa_rows[r, :n].astype(np.int64)
                lcp = lcp_rows[r, :n].astype(np.int64)
                _repair_host(sa, lcp, sorted(begins))
                sa_rows[r, :n] = sa.astype(np.int32)
                lcp_rows[r, :n] = lcp.astype(np.int32)
            self.SA, self.LCP = scatter(
                self.SA, self.LCP, sa_rows, lcp_rows, starts, ns
            )


def _fetch_bucket(count: int, cap: int) -> int:
    """pow4 ladder (1024 floor) for the two-phase result fetch width —
    few distinct prefix-slice compiles, at most 4x transfer overshoot."""
    k = 1024
    while k < count:
        k *= 4
    return min(k, cap)


def _get_prefix_fetch(K: int):
    """Jitted static-prefix slice of N same-length device arrays (first
    axis), one compile per (K, arity, row-shape) combination."""
    key = ("prefix", K)
    fn = _kern_cache.get(key)
    if fn is not None:
        return fn

    import jax

    @jax.jit
    def fetch(*arrs):
        return tuple(a[:K] for a in arrs)

    _kern_cache[key] = fetch
    return fetch


def _get_repair_rows(R: int, W: int, npad: int):
    """Jitted (R, W)-windowed row gather + masked scatter (rows beyond a
    child's length drop via out-of-bounds 'drop' mode)."""
    key = ("repair_rows", R, W, npad)
    fns = _kern_cache.get(key)
    if fns is not None:
        return fns

    import jax
    import jax.numpy as jnp

    @jax.jit
    def fetch(SA, LCP, starts):
        idx = jnp.clip(
            starts[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :],
            0,
            npad - 1,
        )
        return SA[idx], LCP[idx]

    @jax.jit
    def scatter(SA, LCP, sa_rows, lcp_rows, starts, ns):
        j = jnp.arange(W, dtype=jnp.int32)[None, :]
        idx = starts[:, None] + j
        idx = jnp.where(j < ns[:, None], idx, npad)  # OOB rows drop
        flat = idx.reshape(-1)
        SA = SA.at[flat].set(sa_rows.reshape(-1), mode="drop")
        LCP = LCP.at[flat].set(lcp_rows.reshape(-1), mode="drop")
        return SA, LCP

    _kern_cache[key] = (fetch, scatter)
    return fetch, scatter


def _get_repair_rows_mesh(R: int, W: int, npad: int, mesh):
    """Mesh twin of _get_repair_rows: each shard contributes its overlap
    of every (start, W) window via a local clipped gather, ONE psum of
    the disjoint contributions replicates the rows; the scatter is
    purely shard-local (each shard takes its own overlap back).  No
    full-size operand is ever materialized — GSPMD lowers the
    dynamic-slice fetch to all-gathers of the O(n) arrays."""
    key = ("repair_rows_mesh", R, W, npad, id(mesh))
    fns = _kern_cache.get(key)
    if fns is not None:
        return fns

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as Pspec

    axis = mesh.axis_names[0]
    P = int(mesh.devices.size)
    assert npad % P == 0
    sh = npad // P
    i32 = jnp.int32

    def fetch_fn(SA, LCP, starts):
        me = jax.lax.axis_index(axis)
        base = me.astype(i32) * sh
        g = starts[:, None] + jnp.arange(W, dtype=i32)[None, :]
        loc = g - base
        inb = (loc >= 0) & (loc < sh)
        locc = jnp.clip(loc, 0, sh - 1)
        sa_c = jnp.where(inb, SA[locc], 0)
        lcp_c = jnp.where(inb, LCP[locc], 0)
        both = jax.lax.psum(jnp.stack([sa_c, lcp_c]), axis)
        return both[0], both[1]

    def scatter_fn(SA, LCP, sa_rows, lcp_rows, starts, ns):
        me = jax.lax.axis_index(axis)
        base = me.astype(i32) * sh
        j = jnp.arange(W, dtype=i32)[None, :]
        loc = starts[:, None] + j - base
        # rows beyond a child's length and out-of-shard positions drop
        loc = jnp.where(j < ns[:, None], loc, sh)
        loc = jnp.where((loc >= 0) & (loc < sh), loc, sh)
        flat = loc.reshape(-1)
        SA = SA.at[flat].set(sa_rows.reshape(-1), mode="drop")
        LCP = LCP.at[flat].set(lcp_rows.reshape(-1), mode="drop")
        return SA, LCP

    sharded = Pspec(axis)
    repl = Pspec()
    fetch = jax.jit(
        shard_map(
            fetch_fn, mesh=mesh,
            in_specs=(sharded, sharded, repl),
            out_specs=(repl, repl),
            check_vma=False,
        )
    )
    scatter = jax.jit(
        shard_map(
            scatter_fn, mesh=mesh,
            in_specs=(sharded, sharded, repl, repl, repl, repl),
            out_specs=(sharded, sharded),
            check_vma=False,
        )
    )
    _kern_cache[key] = (fetch, scatter)
    return fetch, scatter


def _get_repair_window(W: int):
    """Jitted fixed-width window fetch + write-back (one compile per
    power-of-8 width bucket; start is a traced scalar)."""
    fns = _kern_cache.get(("repair", W))
    if fns is not None:
        return fns

    import jax

    @jax.jit
    def fetch(SA, LCP, start):
        sa = jax.lax.dynamic_slice(SA, (start,), (W,))
        lcp = jax.lax.dynamic_slice(LCP, (start,), (W,))
        return sa, lcp

    @jax.jit
    def scatter(SA, LCP, sa_w, lcp_w, start):
        SA = jax.lax.dynamic_update_slice(SA, sa_w, (start,))
        LCP = jax.lax.dynamic_update_slice(LCP, lcp_w, (start,))
        return SA, LCP

    _kern_cache[("repair", W)] = (fetch, scatter)
    return fetch, scatter


def _repair_host(SA: np.ndarray, LCP: np.ndarray, begins) -> None:
    """bubble_sort (reveal.c:666-727) on a detached child slice.  Uses the
    native kernel with a scratch inverse array (the packed design derives
    classification from positions, so no global SAi is maintained)."""
    scratch = np.empty(int(SA.max()) + 2 if len(SA) else 1, dtype=np.int64)
    try:
        from ..native import repair_leading_native

        if repair_leading_native(SA, LCP, scratch, list(begins)):
            return
    except Exception:
        pass
    # numpy fallback: same walk as esa_index._repair_leading_py
    n = len(SA)
    for begin in begins:
        cross_cur = (SA < begin) & (SA + LCP > begin)
        lcp_next = np.empty(n, dtype=LCP.dtype)
        lcp_next[: n - 1] = LCP[1:]
        lcp_next[n - 1] = 0
        cross_next = (SA < begin) & (SA + lcp_next > begin)
        cand = np.nonzero(cross_cur | cross_next)[0]
        for i in cand.tolist():
            if SA[i] < begin and SA[i] + LCP[i] > begin:
                tmp_sa = SA[i]
                tmp_lcp = LCP[i]
                thr = begin - tmp_sa
                x = i
                while x > 0 and LCP[x] >= thr:
                    x -= 1
                if x < i:
                    SA[x + 1 : i + 1] = SA[x:i]
                    LCP[x + 1 : i + 1] = LCP[x:i]
                SA[x] = tmp_sa
                LCP[x + 1] = thr
                if i < n - 1 and tmp_lcp < LCP[i + 1]:
                    LCP[i + 1] = tmp_lcp
            else:
                if (
                    i < n - 1
                    and SA[i] < begin
                    and SA[i] + lcp_next[i] > begin
                    and LCP[i + 1] > LCP[i]
                ):
                    LCP[i + 1] = begin - SA[i]
