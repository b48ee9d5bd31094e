"""Batched device frontier: MUM enumeration for MANY recursion segments
in one jitted call.

This is the BASELINE.json north-star formulation of the recursion: the
reference processes its segment worklist one segment at a time from C
worker threads (reveal.c:966-1366); here a whole frontier level's
segments are packed along one axis (each segment keeps its own SA/LCP
slice, tagged with a segment id) and the pairwise-MUM conditions
(reveal.c:119-180: straddle, left-maximality, uniqueness) are evaluated
elementwise over the packed arrays — one device dispatch per level
instead of one host scan per segment.  Multi-device: segments are
grouped per device (whole segments only, so every adjacent-pair
condition stays shard-local) and the groups are sharded over a mesh
axis; candidate counts are psum-merged (parallel/mesh.py).

Segment-boundary correctness falls out of the ESA invariants: every
segment's LCP[0] is 0, so a neighbor read that crosses into the next
segment's first slot reads 0 — exactly the value the per-segment scan
uses at its boundary.  Only the pair mask needs the explicit
same-segment guard.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

_cache = {}


def _get_packed_mask_fn():
    fn = _cache.get("packed")
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp

    from ..core.encoding import N_BYTE, SENTINEL
    from ..core.jaxconfig import configure_jax

    configure_jax()

    def packed_mum_mask(T, SA, LCP, SEG, nsep0, minl):
        """(G, Lp) packed arrays -> per-slot MUM mask + (l, a, b).

        Slot (g, i) pairs SA[g, i-1] with SA[g, i]; valid only when both
        slots belong to the same segment (SEG equal, not padding)."""
        prev = jnp.roll(SA, 1, axis=-1)
        seg_prev = jnp.roll(SEG, 1, axis=-1)
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
        # uniqueness: within-segment neighbor LCPs; cross-boundary reads
        # see the next segment's LCP[0] == 0, matching the scan edge case
        lcp_next = jnp.concatenate(
            [LCP[..., 1:], jnp.zeros(LCP.shape[:-1] + (1,), LCP.dtype)],
            axis=-1,
        )
        lcp_prev = jnp.roll(LCP, 1, axis=-1)
        unique = (lcp_prev < l) & (lcp_next < l)
        iar = jnp.arange(SA.shape[-1])
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
        return mask, l, a, b, count

    fn = jax.jit(packed_mum_mask)
    _cache["packed"] = fn
    return fn


def pack_segments(
    segments: List[Tuple[np.ndarray, np.ndarray]],
    n_groups: int = 1,
):
    """Pack per-segment (SA, LCP) arrays into (n_groups, Lp) int32 arrays
    plus a segment-id array (-1 = padding).  Whole segments only per
    group (largest-first balance), Lp padded to a power of two so jit
    recompiles stay bucketed."""
    order = sorted(
        range(len(segments)), key=lambda i: -len(segments[i][0])
    )
    groups = [[] for _ in range(n_groups)]
    gsize = [0] * n_groups
    for si in order:
        g = int(np.argmin(gsize))
        groups[g].append(si)
        gsize[g] += len(segments[si][0])
    width = max(1, max(gsize))
    Lp = 1
    while Lp < width:
        Lp *= 2
    SA = np.zeros((n_groups, Lp), dtype=np.int32)
    LCP = np.zeros((n_groups, Lp), dtype=np.int32)
    SEG = np.full((n_groups, Lp), -1, dtype=np.int32)
    for g, sids in enumerate(groups):
        o = 0
        for si in sids:
            sa, lcp = segments[si]
            k = len(sa)
            SA[g, o : o + k] = sa
            LCP[g, o : o + k] = lcp
            SEG[g, o : o + k] = si
            o += k
    return SA, LCP, SEG


def frontier_mums(
    segments: List[Tuple[np.ndarray, np.ndarray]],
    T_dev,
    nsep0: int,
    minl: int,
) -> List[list]:
    """One device dispatch for a whole frontier level: returns, per input
    segment, the getmums_rem-format list (l, 2, ((0, a), (1, b)))."""
    import jax
    import jax.numpy as jnp

    if not segments:
        return []
    SA, LCP, SEG = pack_segments(segments, n_groups=1)
    fn = _get_packed_mask_fn()
    mask, l, a, b, _ = fn(
        T_dev,
        jnp.asarray(SA),
        jnp.asarray(LCP),
        jnp.asarray(SEG),
        jnp.int32(nsep0),
        jnp.int32(minl),
    )
    mask = np.asarray(jax.device_get(mask)).ravel()
    idx = np.nonzero(mask)[0]
    seg = SEG.ravel()[idx]
    ls = np.asarray(jax.device_get(l)).ravel()[idx]
    aa = np.asarray(jax.device_get(a)).ravel()[idx]
    bb = np.asarray(jax.device_get(b)).ravel()[idx]
    out = [[] for _ in segments]
    for s, li, ai, bi in zip(
        seg.tolist(), ls.tolist(), aa.tolist(), bb.tolist()
    ):
        out[s].append((li, 2, ((0, ai), (1, bi))))
    return out
