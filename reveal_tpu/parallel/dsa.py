"""Distributed suffix-array construction over an explicit device mesh.

The GSPMD route (index/suffix.build_esa_sharded) hands the doubling
build to the partitioner, which does distribute it (sharded entry,
collective-permutes) but leans on all-gathers around the sorts — each
device materializes full-size operands, so per-device memory stays
O(n) and the build cannot outgrow one chip's HBM.  This module is the
memory-scaling construction: prefix doubling written in shard_map with
explicit collectives — the `ppermute`-based sort/merge SURVEY §2.3-P6
and §7 step 9 call for — where every array a device touches is
O(n/P).

Per doubling round (prefix length 2^lev):

1. rank2 halo shift      rank2[i] = rank[i + 2^lev]: one or two
                         `ppermute`s move whole-shard offsets, a local
                         concat handles the in-shard remainder; devices
                         past the end zero-fill, which is exactly the
                         "pad byte 0 = unique smallest" convention the
                         single-device builder uses.
2. distributed sort      a comparator network over shard-sized blocks:
                         local lexsort, then one partner exchange
                         (`ppermute`) + merge-split per network layer
                         (the "keep low" side takes the lower half).
                         Any sorting network lifts to sorted blocks
                         this way (0-1 principle; Knuth TAOCP 5.3.4
                         ex. 38): power-of-two meshes run the bitonic
                         network — log2(P)·(log2(P)+1)/2 layers, the
                         pod-scale schedule — others fall back to
                         P-phase odd-even transposition.  Static
                         shapes throughout — no ragged all-to-alls.
3. dense re-rank         neighbour-equality flags with a one-element
                         `ppermute` halo, local cumsum, shard offsets
                         via `all_gather` of the P shard totals.
4. scatter back          a second odd-even sort keyed on the suffix
                         index realigns ranks to text order (a
                         distributed scatter with static shapes).

SA = the final round's sorted indices; SAi via one extra index-keyed
sort.

LCP also runs distributed (``host_lcp=True`` falls back to host Kasai):
the rank arrays of every doubling level are kept on-mesh (O(n/P·log n)
per device) and the plain LCP of
each SA-adjacent pair descends the levels exactly like the
single-device builder (suffix._lcp_from_levels_np): at level k, pairs
whose length-k prefixes still agree advance by k.  The per-level
random-access reads rank_k[a+h] become a **sort-based distributed
gather** (dist_gather2): the level's a AND b queries ride one
3*sh-wide pass — concat (position, value) entries with both query
entry sets, network-sort by (key, entry-tag) so every query lands
right after the value entry for its key, forward-propagate values
locally + one all_gather for the cross-shard carry, then network-sort
back with the DESTINATION SLOT as the key, which lands each shard's
a/b answers in its first two local blocks with no redistribute —
O(n/P) static shapes throughout.  All collectives are threaded into
one dependency chain (see ``after``).  The $/N cap uses a distributed
reverse min-scan for stop distances and one index-keyed sort to
realign them to SA order (matching interface.c:97-114 semantics).

``lcp_ckpt_stride=s`` trades the stored-levels memory for recompute
(the pod-scale HBM knob): only every s-th rank level is kept as a
checkpoint (O(n/P·log(n)/s)); on the descent each s-level segment is
regenerated once from its checkpoint by re-running doubling rounds
(O(s) live temporaries while inside the segment, ~nlev extra rounds
total), so s = sqrt(log n) gives O(n/P·sqrt(log n)) peak memory at
~2x the LCP-stage sort count.  Regenerated-segment collectives are
threaded behind the descent carry (``after``) so the single collective
chain invariant holds.

Replaces: divsufsort (reveal/divsufsort/divsufsort.c:332) at multi-chip
scale; the reference has no distributed analog (reveal parallelism is
pthreads on one host, SURVEY §2.3).

"""

from __future__ import annotations

import logging
import math

import numpy as np

from ..core.encoding import N_BYTE, SENTINEL

log = logging.getLogger(__name__)

_fn_cache = {}


def _partners(P: int, phase: int):
    """Partner table for odd-even transposition phase; self at borders."""
    out = list(range(P))
    for a in range(phase % 2, P - 1, 2):
        out[a], out[a + 1] = a + 1, a
    return out


def _network_layers(P: int):
    """Comparator layers of the block-sort network as
    ``(partner[P], keep_low[P])`` tuples (partner == self means idle).

    Power-of-two P: the bitonic network, log2(P)(log2(P)+1)/2 layers —
    the schedule that scales to pod meshes (36 layers at P=256 vs 256
    odd-even phases).  Other P: odd-even transposition, P layers.
    Either network sorts all 0-1 inputs, so replacing every
    compare-exchange with a merge-split of two sorted shard blocks
    sorts the blocked array (Knuth TAOCP 5.3.4 ex. 38); a descending
    comparator is simply a merge-split that keeps the high half on the
    lower-indexed side.
    """
    layers = []
    if P > 1 and (P & (P - 1)) == 0:
        k = 2
        while k <= P:
            j = k >> 1
            while j >= 1:
                part = list(range(P))
                keep_low = [True] * P
                for i in range(P):
                    p = i ^ j
                    if p > i:
                        asc = (i & k) == 0
                        part[i], part[p] = p, i
                        keep_low[i] = asc
                        keep_low[p] = not asc
                layers.append((part, keep_low))
                j >>= 1
            k <<= 1
    else:
        for phase in range(P):
            part = _partners(P, phase)
            keep_low = [i <= part[i] for i in range(P)]
            layers.append((part, keep_low))
    return layers


class _Kit:
    """Namespace for collective_kit's helpers."""


def collective_kit(axis: str, P: int, sh: int, idt=None):
    """Explicit-collective building blocks for shard_map kernels over a
    1-D mesh axis of size P with shard width sh: single-chain ``after``
    threading (the gloo posting-order rule, see ``after``), whole-shard
    halo moves, the comparator-network global sort (bitonic layers for
    power-of-two P), and the sort-based distributed gather.  Shared by
    the distributed ESA build (_get_dsa_fn) and the mesh frontier
    (index/devfrontier._get_apply_mesh)."""
    import jax
    import jax.numpy as jnp

    if idt is None:
        idt = jnp.int32
    npad_c = sh * P

    def after(x, dep):
        """Make x's consumers depend on dep (opaque, survives XLA opt).

        Every collective in shard_fn is threaded into ONE dependency
        chain with this: the gloo CPU transport matches messages on a
        channel by posting order, and independent collective chains may
        be posted in different orders by different processes (observed:
        a cached/AOT-loaded executable interleaves independent chains
        differently than the freshly jitted one — two emulated hosts
        then pair a 3*sh-wide merge-split against an sh-wide one and
        crash in gloo; with equal widths it would silently miswire).
        A real data dependency forces every executor to one order."""
        x, _ = jax.lax.optimization_barrier((x, dep))
        return x

    def from_ahead(x, q):
        """Local block of the shard q places ahead (zero-fill past end)."""
        if q == 0:
            return x
        if q >= P:
            return jnp.zeros_like(x)
        return jax.lax.ppermute(
            x, axis, [(j, j - q) for j in range(q, P)]
        )

    def shift_left(x, s):
        """Global left shift by s: out[i] = global_x[i + s], 0 past end."""
        q, o = divmod(s, sh)
        a = from_ahead(x, q)
        if o == 0:
            return a
        b = from_ahead(after(x, a), q + 1)  # after: see `after`
        return jnp.concatenate([a[o:], b[:o]])

    def local_sort(arrs, nkeys):
        order = jnp.lexsort(tuple(reversed(arrs[:nkeys])))
        return tuple(a[order] for a in arrs)

    layers = _network_layers(P)

    def make_net_sort(width):
        """Global sort of width-`width` shard-blocked arrays by the
        first nkeys (lexicographic); remaining arrays are carried
        values.  One merge-split exchange per layer of the comparator
        network (bitonic for power-of-two P, odd-even otherwise)."""

        def net_sort(arrs, nkeys):
            me = jax.lax.axis_index(axis)
            arrs = local_sort(arrs, nkeys)
            for part, keep_low in layers:
                partner = jnp.asarray(np.array(part, np.int32))[me]
                keep_lo = jnp.asarray(np.array(keep_low, np.bool_))[me]
                perm = [(j, part[j]) for j in range(P)]
                # ONE packed ppermute per layer: per-array ppermutes
                # would be mutually independent collectives on the same
                # channel (see `after`)
                recv_st = jax.lax.ppermute(jnp.stack(arrs), axis, perm)
                recv = tuple(recv_st[t] for t in range(len(arrs)))
                is_first = me < partner
                is_self = me == partner
                # canonical concat order (lower-indexed block first):
                # both partners must sort the SAME sequence, or
                # stable-sort ties resolve differently on each side and
                # an element can be kept by both or neither
                cat = tuple(
                    jnp.concatenate(
                        [
                            jnp.where(is_first, a, r),
                            jnp.where(is_first, r, a),
                        ]
                    )
                    for a, r in zip(arrs, recv)
                )
                merged = local_sort(cat, nkeys)
                kept = tuple(
                    jnp.where(keep_lo, m[:width], m[width:])
                    for m in merged
                )
                arrs = tuple(
                    jnp.where(is_self, a, k)
                    for a, k in zip(arrs, kept)
                )
            return arrs

        return net_sort

    oe_sort3 = make_net_sort(3 * sh)

    def prev_halo(x):
        """Last element of the previous shard (zero-fill on shard 0)."""
        return jax.lax.ppermute(
            x[-1:], axis, [(j, j + 1) for j in range(P - 1)]
        )

    def dist_gather2(val, qa, qb, iar_g, me):
        """(val_global[qa[j]], val_global[qb[j]]) in ONE sort pass.

        Sort-based distributed gather (module docstring), batched for
        the LCP descent's paired a/b rank queries: sh value entries
        (key=position, payload=value) and 2*sh query entries (key=q,
        payload=qid) network-sort together by (key, tag) — every
        position exists as a value entry, so each query's nearest
        preceding entry in the sorted order is exactly its answer.
        Forward-propagate values (local max-scan + one all_gather for
        the cross-shard carry), then sort back.  One 3*sh-wide pass
        replaces two 2*sh-wide single-query gathers — half the
        per-level sort count (2 sorts of 1.5x width vs 4).

        The back-sort key IS the destination slot: a-answer for global
        qid g goes to slot 3*(g//sh)*sh + g%sh, the b-answer sh later,
        and value entries (original position pos) fill their shard's
        third block at 3*(pos//sh)*sh + 2*sh + pos%sh — together the
        keys cover [0, 3*npad) exactly once, so after the sort every
        shard reads its a/b answers from its first two local blocks
        with NO redistribute.  (An earlier six-ppermute 2-of-3 block
        redistribute was rejected: the a/b ppermute chains were
        mutually independent, and per-process XLA thunk schedules may
        order independent collectives differently — gloo then pairs
        mismatched messages across processes; the single dependent
        chain here leaves the scheduler no such freedom.)"""
        key = jnp.concatenate([iar_g, qa, qb])
        tag = jnp.concatenate(
            [jnp.zeros(sh, idt), jnp.ones(2 * sh, idt)]
        )
        pay = jnp.concatenate([val, iar_g, idt(npad_c) + iar_g])
        k_s, t_s, p_s = oe_sort3((key, tag, pay), nkeys=2)
        isval = t_s == 0
        pos = jnp.arange(3 * sh)
        idxv = jnp.where(isval, pos, -1)
        lastidx = jax.lax.associative_scan(jnp.maximum, idxv)
        li = lastidx[-1]
        shard_last = p_s[jnp.maximum(li, 0)]
        has = (li >= 0).astype(idt)
        # one fused all_gather for (carry value, has-value flag): the two
        # vectors ride one collective, both for bandwidth and to avoid
        # independent same-channel sends (see docstring)
        both = jnp.stack([shard_last, has])
        gathered = jax.lax.all_gather(both, axis)  # (P, 2)
        lasts = gathered[:, 0]
        hass = gathered[:, 1]
        pidx = jnp.arange(P)
        score = jnp.where((hass > 0) & (pidx < me), pidx, -1)
        j = jnp.argmax(score)
        carry = jnp.where(jnp.max(score) >= 0, lasts[j], idt(0))
        localval = jnp.where(
            lastidx >= 0, p_s[jnp.maximum(lastidx, 0)], carry
        )
        # destination-keyed back-sort (see docstring)
        g = jnp.where(
            isval, k_s, jnp.where(p_s >= npad_c, p_s - npad_c, p_s)
        )
        block = (g // idt(sh)).astype(idt)
        offs = jnp.where(
            isval,
            idt(2 * sh),
            jnp.where(p_s >= npad_c, idt(sh), idt(0)),
        )
        backkey = g + idt(2) * block * idt(sh) + offs
        _, ansq = oe_sort3((backkey, localval), nkeys=1)
        return ansq[:sh], ansq[sh : 2 * sh]

    def next_halo(x):
        """First element of the next shard (zero-fill on shard P-1)."""
        return jax.lax.ppermute(
            x[:1], axis, [(j, j - 1) for j in range(1, P)]
        )

    kit = _Kit()
    kit.axis, kit.P, kit.sh, kit.idt, kit.npad_c = axis, P, sh, idt, npad_c
    kit.after = after
    kit.from_ahead = from_ahead
    kit.shift_left = shift_left
    kit.local_sort = local_sort
    kit.make_net_sort = make_net_sort
    kit.prev_halo = prev_halo
    kit.next_halo = next_halo
    kit.dist_gather2 = dist_gather2
    return kit


def _get_dsa_fn(mesh, sh: int, nlev: int, use64: bool, ckpt_stride=None):
    """Cached jitted shard_map builder for (mesh, shard size, levels).

    ``ckpt_stride`` selects the LCP-descent memory mode: None stores
    every rank level (lax.scan descent); an int s stores every s-th
    level and regenerates the in-between levels on the (unrolled)
    descent — see module docstring."""
    key = (id(mesh), sh, nlev, use64, ckpt_stride)
    fn = _fn_cache.get(key)
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
    idt = jnp.int64 if use64 else jnp.int32

    kit = collective_kit(axis, P, sh, idt)
    after = kit.after
    from_ahead = kit.from_ahead
    shift_left = kit.shift_left
    local_sort = kit.local_sort
    oe_sort = kit.make_net_sort(sh)
    oe_sort3 = kit.make_net_sort(3 * sh)
    npad_c = kit.npad_c
    prev_halo = kit.prev_halo
    dist_gather2 = kit.dist_gather2

    def shard_fn(T_local):
        me = jax.lax.axis_index(axis)
        iar_l = jnp.arange(sh, dtype=idt)
        iar_g = me.astype(idt) * sh + iar_l
        rank = T_local.astype(idt)
        # Rank VALUES are < npad, so in the int64 regime below 2^31 the
        # stored levels/checkpoints (the dominant memory term) narrow to
        # int32 and widen back per level on read.
        store_dt = jnp.int32 if npad_c < 2**31 else idt

        def doubling_round(rank, lev):
            """One prefix-doubling round: (new text-order rank, the
            round's SA-order suffix indices).  Deterministic in its
            inputs — regenerated levels are bit-equal to stored ones."""
            key2 = shift_left(rank, 1 << lev)
            k1, k2, sa = oe_sort((rank, key2, iar_g), nkeys=2)
            # dense re-rank: global inclusive cumsum of neq flags
            # (k1/k2 halos packed into one ppermute, see `after`)
            halos = prev_halo(jnp.stack([k1, k2], axis=1))
            p1 = jnp.concatenate([halos[:, 0], k1[:-1]])
            p2 = jnp.concatenate([halos[:, 1], k2[:-1]])
            neq = ((k1 != p1) | (k2 != p2)).astype(idt)
            neq = jnp.where(
                (me == 0) & (jnp.arange(sh) == 0), idt(0), neq
            )
            loc = jnp.cumsum(neq)
            tots = jax.lax.all_gather(loc[-1:], axis, tiled=True)
            offset = jnp.sum(
                jnp.where(jnp.arange(P) < me, tots, idt(0))
            )
            rankval = loc + offset
            # distributed scatter: realign ranks to text order
            _, rank = oe_sort((sa, rankval), nkeys=1)
            return rank, sa

        ranks_hist = [rank] if ckpt_stride is None else None
        ckpts = (
            None if ckpt_stride is None else {0: rank.astype(store_dt)}
        )
        sa = iar_g
        for lev in range(nlev - 1):
            rank, sa = doubling_round(rank, lev)
            if ckpt_stride is None:
                ranks_hist.append(rank)
            elif (lev + 1) % ckpt_stride == 0:
                ckpts[lev + 1] = rank.astype(store_dt)
        # SAi: positions of text order in SA order, same scatter trick
        # (`after` chains: sa predates the last level's scatter sort)
        _, sai = oe_sort((after(sa, rank), iar_g), nkeys=1)

        # ---- distributed LCP: rank descent over the kept levels ----
        # mirrors suffix._lcp_from_levels_np with dist_gather2 replacing
        # the random-access reads; O(n/P * log n) per device stored, or
        # O(n/P * (log n / s + s)) with ckpt_stride=s (module docstring).
        npc = idt(npad_c)
        a0 = jnp.concatenate([prev_halo(after(sa, sai)), sa[:-1]])
        b0 = sa

        def descend_level(a, b, h, k, rk):
            ok = (a + k <= npc) & (b + k <= npc)
            qa, qb = dist_gather2(
                rk,
                jnp.minimum(a, npc - 1),
                jnp.minimum(b, npc - 1),
                iar_g,
                me,
            )
            eq = ok & (qa == qb)
            h = jnp.where(eq, h + k, h)
            a = jnp.where(eq, a + k, a)
            b = jnp.where(eq, b + k, b)
            return a, b, h

        h0 = iar_g * idt(0)  # zeros, but shard-varying for the scan vma
        if ckpt_stride is None:
            ranks_all = jnp.stack(
                [r.astype(store_dt) for r in ranks_hist]
            )

            def lcp_body(carry, lev_rev):
                a, b, h = carry
                lev = nlev - 1 - lev_rev
                k = (idt(1) << lev).astype(idt)
                rk = ranks_all[lev].astype(idt)
                return descend_level(a, b, h, k, rk), None

            (_, _, plain), _ = jax.lax.scan(
                lcp_body, (a0, b0, h0), jnp.arange(nlev)
            )
        else:
            # unrolled descent (nlev is static); each s-level segment is
            # regenerated ONCE from its checkpoint on first (= highest-
            # level) use, then consumed downward and dropped.  The
            # regeneration's first input is threaded behind the descent
            # carry (`after`) so its collectives join the single chain.
            a, b, h = a0, b0, h0
            seg = {}
            for lev in range(nlev - 1, -1, -1):
                if lev % ckpt_stride == 0:
                    rk = ckpts[lev].astype(idt)
                else:
                    base = lev - lev % ckpt_stride
                    if lev not in seg:
                        seg = {}
                        # thread behind BOTH h and a: on the first
                        # regeneration h is still h0 (no collective
                        # dep) but a0 carries the chain tail via
                        # prev_halo(after(sa, sai)) — without it the
                        # regen rounds form an independent collective
                        # chain (gloo posting-order hazard, see after())
                        r = after(ckpts[base].astype(idt), (h, a))
                        for j in range(base, lev):
                            r, _ = doubling_round(r, j)
                            seg[j + 1] = r
                    rk = seg[lev]
                a, b, h = descend_level(
                    a, b, h, idt(1 << lev), rk
                )
            plain = h
        # $/N cap: distributed reverse min-scan for stop distances,
        # realigned to SA order with one index-keyed sort
        # (`after` chains this block's collectives behind the scan's)
        stop = jnp.where(
            (T_local == SENTINEL) | (T_local == N_BYTE), iar_g, npc
        )
        stop = after(stop, plain)
        sufmin = jax.lax.associative_scan(
            jnp.minimum, stop, reverse=True
        )
        mins = jax.lax.all_gather(sufmin[:1], axis, tiled=True)
        carry_in = jnp.min(jnp.where(jnp.arange(P) > me, mins, npc))
        d_loc = jnp.minimum(sufmin, carry_in) - iar_g
        _, d_sa = oe_sort((sai, d_loc), nkeys=1)
        d_prev = jnp.concatenate([prev_halo(d_sa), d_sa[:-1]])
        lcp = jnp.minimum(plain, jnp.minimum(d_prev, d_sa))
        lcp = jnp.where((me == 0) & (iar_l == 0), idt(0), lcp)
        return sa, sai, lcp

    inner = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(Pspec(axis),),
        out_specs=(Pspec(axis), Pspec(axis), Pspec(axis)),
    )
    fn = jax.jit(inner)
    _fn_cache[key] = fn
    return fn


def build_esa_distributed(
    T_np: np.ndarray,
    mesh,
    force64: bool = False,
    host_lcp: bool = False,
    lcp_ckpt_stride=None,
):
    """(SA, LCP, SAi) with the suffix sort AND the LCP rank-descent
    running distributed over the mesh via explicit shard_map
    collectives (see module docstring).

    Same API/stripping semantics as suffix.build_esa_sharded.  Real text
    bytes must be nonzero (ASCII here) — byte 0 is the pad sentinel.
    ``host_lcp=True`` recomputes LCP on the host with Kasai-style
    rank descent instead (suffix.lcp_from_sa_np) — the cross-check
    path.  ``lcp_ckpt_stride``: None keeps every doubling level for the
    LCP descent; an int s >= 1 keeps every s-th level and regenerates
    in between (low-HBM mode, module docstring); the string "sqrt"
    picks s = round(sqrt(#levels)), the memory-optimal stride.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    from ..index.suffix import lcp_from_sa_np

    n = int(len(T_np))
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    if T_np.min() == 0:
        raise ValueError("text contains byte 0 (reserved pad sentinel)")
    P = int(mesh.devices.size)
    npad = 1 << max(1, int(math.ceil(math.log2(max(n, P)))))
    npad = ((npad + P - 1) // P) * P  # non-pow2 mesh sizes
    sh = npad // P
    T_padded = np.zeros(npad, dtype=np.uint8)
    T_padded[:n] = T_np
    nlev = int(math.ceil(math.log2(npad))) + 1
    if lcp_ckpt_stride == "sqrt":
        lcp_ckpt_stride = max(1, round(math.sqrt(nlev)))
    if lcp_ckpt_stride is not None:
        lcp_ckpt_stride = int(lcp_ckpt_stride)
        if lcp_ckpt_stride < 1:
            raise ValueError("lcp_ckpt_stride must be >= 1")
    # 2**29: the batched gather's sort-back key is 2*npad + position,
    # so int32 needs 3*npad < 2**31
    use64 = force64 or npad >= 2**29

    axis = mesh.axis_names[0]
    Td = jax.device_put(
        jnp.asarray(T_padded), NamedSharding(mesh, Pspec(axis))
    )
    if use64:
        prev = bool(jax.config.jax_enable_x64)
        jax.config.update("jax_enable_x64", True)
        try:
            sa, sai, lcp = _get_dsa_fn(
                mesh, sh, nlev, True, lcp_ckpt_stride
            )(Td)
        finally:
            jax.config.update("jax_enable_x64", prev)
    else:
        sa, sai, lcp = _get_dsa_fn(
            mesh, sh, nlev, False, lcp_ckpt_stride
        )(Td)
    sa = np.asarray(jax.device_get(sa), dtype=np.int64)
    sai = np.asarray(jax.device_get(sai), dtype=np.int64)
    lcp = np.asarray(jax.device_get(lcp), dtype=np.int64)
    off = npad - n
    if off:
        sa = sa[off:]
        sai = sai[:n] - off
        lcp = lcp[off:].copy()
        lcp[0] = 0  # pad-vs-real boundary pair
    if host_lcp:
        lcp = lcp_from_sa_np(
            np.asarray(T_np, dtype=np.uint8), sa
        ).astype(np.int64)
    return sa, lcp, sai
