"""Whole-recursion device kernel for the pairwise fasta case.

ONE jitted dispatch runs the complete REM recursion on device: a
``lax.while_loop`` over frontier levels whose body fuses

* enumerate  — the getmums_rem conditions (reveal.c:119-180) elementwise
  over adjacent SA slots, all live segments at once;
* pick       — trim_overlap (schemes.py:161-191) and the sparse
  chaining DP (schemes.py:20-104) with the reference's exact traversal
  and tie-breaking order, and the ``largest`` split selection
  (schemes.py:298-317);
* split      — per-slot classification into leading/trailing children,
  child LCP as per-class segmented running-min (split(),
  reveal.c:582-664), one stable partition sort, matched-text lowercase
  (reveal.c:1230-1234);
* repair     — bubble_sort (reveal.c:666-727) boundary repair, batched:
  per iteration a head batch of pending crossing suffixes is resolved
  on the live SA/LCP and every mutually-independent one (disjoint
  edit windows) is applied at once through fixed-width window updates.

Unlike the round-3 kernel (which executed one sequential while_loop
step per candidate — ~437k steps at 137us on the 2a2b pair), the inner
loops here are PARALLEL:

* trim       — the sequential carry (cur_end, cur_idx, cur_len) of the
  overlap scan is three chained ``associative_scan``s: the cur_end
  transition is a 2-piece step function of the incoming end (closed
  under composition), cur_len is a clamped-subtract map max(x-a, b)
  (also closed), and cur_idx is a last-reset-value scan; the back-cut
  emission becomes one batched scatter-add.
* chain      — values-first: scores are computed in wavefront rounds
  (a row is blocked while a compat predecessor outside its own run is
  unscored; each "run" — a maximal block of consecutively-chainable
  candidates — advances its unblocked prefix per round through a
  tropical-affine associative scan in phi = score + wpen*diag space),
  then links/winners are reconstructed exactly afterwards with chunked
  candidate-x-candidate lex-max passes (tmpw, score, -act, -row) where
  act is the geometric activation step (min dominating row), matching
  the reference's active-list traversal order (schemes.py:46-87).

Validated cell-by-cell against the sequential formulations on
randomized property tests and 374 real per-segment chain inputs traced
from the host engine, plus byte-identical-GFA differential tests
(tests/test_devloop.py).

The kernel logs every anchor with its parent anchor and child class;
the host reconstructs the serial LIFO pop order (push parallel/leading/
trailing, pop reversed — reveal.c:21-27,1295-1324) by a trailing-first
pre-order walk of that tree and replays the anchors through the exact
graph surgery (align/rem._rem2_replay), reproducing the per-step
engine's GFA byte-for-byte.

Numerics: all chain arithmetic is int32-exact (requires integer wscore/
wpen, the defaults); any capacity overflow or a duplicate-ref-start
chain (which the host resolves through its dict-aliasing code path)
sets an abort code; retryable capacity aborts re-dispatch with doubled
capacity, anything else falls back to the host engine.
"""

from __future__ import annotations

import logging
import math
import os

import numpy as np

log = logging.getLogger(__name__)

_kern_cache = {}

# abort codes
ABORT_CAND_OVERFLOW = 1     # more candidates than K in one level
ABORT_SEG_OVERFLOW = 2      # more live children than SMAX
ABORT_ANCHOR_OVERFLOW = 3   # anchor log full
ABORT_DUP_REF = 4           # duplicate ref starts in one segment's chain
ABORT_LEVEL_OVERFLOW = 5    # runaway level count
ABORT_REPAIR_OVERFLOW = 6   # more repair candidates than CCAP in a pass
ABORT_MAXMUMS = 7           # a segment exceeded maxmums candidates
ABORT_CHAIN_ROUNDS = 8      # chain wavefront exceeded the round cap
ABORT_REPAIR_WINDOW = 9     # a repair insertion point escaped the window
ABORT_SEG_WIDTH = 10        # a segment exceeded the dense chain width CW

_LMAX = 512
_RMAX = 384     # chain wavefront rounds per level
_WREP = 4096    # repair window lookback (insertion point must be inside)
_WRV = 256      # vectorized repair resolve window: the insertion-point
                # search looks back this many slots per candidate (p90
                # lookback is a few hundred on real genomes);
                # window-miss movers fall back to the exact sequential
                # resolve (full WREP window + whole-array deep scan)

# capacity aborts that a re-dispatch with a doubled capacity can fix
_RETRYABLE = {
    ABORT_CAND_OVERFLOW: "K",
    ABORT_SEG_OVERFLOW: "SMAX",
    ABORT_ANCHOR_OVERFLOW: "ACAP",
    ABORT_REPAIR_OVERFLOW: "CCAP",
    ABORT_SEG_WIDTH: "CW",
}

# stats of the most recent rem_device_loop call (bench/diagnostics):
# levels of the recursion, device dispatches made (1 + capacity
# retries), anchors logged, abort code; trim_steps = candidate rows
# trimmed (all in parallel now), chain_steps = wavefront rounds summed
# over levels, repair_steps = batched repair iterations.
LAST_STATS = {}


def _next_pow2(x: int) -> int:
    return 1 << max(1, int(math.ceil(math.log2(max(x, 2)))))


def _make_window_resolve(WRV: int, RBV: int, npad: int):
    """Pallas windowed insertion-point resolve for the repair round:
    y[r] = max{ j in [q[r]-WRV, q[r]) : LCP[j] < thr[r] }, -1 if none.

    The XLA general-gather lowering of the (RBV, WRV) window fetch runs
    ~42 M elements/s on TPU (profiled r5: 6.2 ms per round at
    RBV=1024 x WRV=256 — 30 s of the 35.5 s forest dispatch).  Here the
    LCP is viewed (npad/128, 128) and each candidate's window arrives
    as WRV/128+1 ALIGNED row-block DMAs (1-D dynamic-offset DMAs fail
    Mosaic compile on this backend); the max-position reduction runs
    in-kernel, so only the (RBV,) result leaves.  8 rows per grid step,
    8 DMAs in flight."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 8
    WB = WRV // 128 + 1
    NR = npad // 128
    assert RBV % R == 0 and npad % 128 == 0

    def kernel(q_ref, thr_ref, lcp_ref, out_ref, scratch, sems):
        i = pl.program_id(0)

        def dma(r):
            q = q_ref[i * R + r]
            s2 = jnp.clip((q - WRV) // 128, 0, NR - WB)
            return s2, pltpu.make_async_copy(
                lcp_ref.at[pl.ds(s2, WB), :], scratch.at[r], sems.at[r]
            )

        s2s = []
        for r in range(R):
            s2, d = dma(r)
            s2s.append(s2)
            d.start()
        for r in range(R):
            _, d = dma(r)
            d.wait()
        for r in range(R):
            q = q_ref[i * R + r]
            thr = thr_ref[i * R + r]
            pos = (
                s2s[r] * 128
                + jax.lax.broadcasted_iota(jnp.int32, (WB, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (WB, 128), 1)
            )
            vals = scratch[r]
            mask = (pos >= q - WRV) & (pos < q) & (vals < thr)
            y = jnp.max(jnp.where(mask, pos, -1))
            out_ref[r, :] = jnp.full((128,), y, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(RBV // R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((R, 128), lambda i, q, t: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((R, WB, 128), jnp.int32),
            pltpu.SemaphoreType.DMA((R,)),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((RBV, 128), jnp.int32),
    )

    def run(lcp, q, thr):
        return fn(q, thr, lcp.reshape(NR, 128))[:, 0]

    return run


def _build_kernel(
    npad: int, K: int, SMAX: int, ACAP: int, CCAP: int, ntext=None,
    chain_width=None,
):
    """One compiled variant per (npad, K, SMAX, ACAP, CCAP, ntext,
    chain_width).

    npad is the SA/LCP slot count; ntext (defaults to npad) is the
    padded text length — they differ in the forest case, where the
    packed deferred slots are far fewer than the text positions they
    point into.  chain_width selects the dense (SMAX, CW+1) chain/pick
    formulation (forest path, every segment bounded by CW candidates);
    None keeps the flat M-row wavefront (single-root path)."""
    if ntext is None:
        ntext = npad
    CW = chain_width
    key = (npad, K, SMAX, ACAP, CCAP, ntext, CW)
    fn = _kern_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp

    from ..core.encoding import N_BYTE, SENTINEL
    from ..core.jaxconfig import configure_jax

    configure_jax()

    i32 = jnp.int32
    NEG = jnp.int32(-(2**31) + 1)
    BIG = jnp.int32(2**31 - 1)
    A30 = jnp.int32(2**30)

    # Pallas row-window DMA gather for the repair resolve (TPU only;
    # one backend per process, so build-time detection is safe —
    # see CLAUDE.md mixed-backend rule).  REVEAL_TPU_NO_PALLAS_REPAIR=1
    # falls back to the XLA gather for A/B measurement.
    _use_pallas = False
    try:
        _use_pallas = (
            jax.default_backend() == "tpu"
            and not os.environ.get("REVEAL_TPU_NO_PALLAS_REPAIR")
        )
    except Exception:  # pragma: no cover
        pass

    M = K + SMAX
    CH = 2048 if M % 2048 == 0 else 1024
    NCH = M // CH
    # repair window: full-array on tiny inputs (always exact there)
    WREP = min(_WREP, npad - 2)

    def seg_min_scan(values, reset):
        def combine(x, y):
            m1, f1 = x
            m2, f2 = y
            return jnp.where(f2, m2, jnp.minimum(m1, m2)), f1 | f2

        m, _ = jax.lax.associative_scan(combine, (values, reset))
        return m

    def seg_max_scan(values, reset):
        def combine(x, y):
            m1, f1 = x
            m2, f2 = y
            return jnp.where(f2, m2, jnp.maximum(m1, m2)), f1 | f2

        m, _ = jax.lax.associative_scan(combine, (values, reset))
        return m

    def last_value_scan(values, flags):
        """Per row: last value at or before it whose flag is set."""
        def combine(x, y):
            v1, f1 = x
            v2, f2 = y
            return jnp.where(f2, v2, v1), f1 | f2

        v, _ = jax.lax.associative_scan(combine, (values, flags))
        return v

    def sort_by(keys, vals):
        """Total-order sort (callers append an arrival-index key)."""
        out = jax.lax.sort(tuple(keys) + tuple(vals), num_keys=len(keys))
        return out[len(keys):]

    def shift1(x, fill):
        return jnp.concatenate([jnp.full(1, fill, x.dtype), x[:-1]])

    # ------------------------------------------------------------------
    # trim_overlap, one dimension (schemes.py:161-191): containment drop
    # + the overlap trim as three associative scans.  Arrays are K-wide;
    # dead rows have seg == BIG and sort to the end.
    # ------------------------------------------------------------------
    def trim_dim(seg, l, a, b, coord):
        iar = jnp.arange(K, dtype=i32)
        pos = a if coord == 0 else b
        # stable sort by (seg, pos, -l): arrival index keeps python's
        # list.sort stability on (rare) key ties
        seg, l, a, b = sort_by(
            (seg, jnp.where(seg < BIG, pos, BIG), -l, iar),
            (seg, l, a, b),
        )
        pos = a if coord == 0 else b
        alive = seg < BIG
        end = jnp.where(alive, pos + l, BIG)
        seg_prev = shift1(seg, -9)
        seg_next = jnp.concatenate([seg[1:], jnp.full(1, -9, seg.dtype)])
        first = seg != seg_prev
        last = seg != seg_next
        end_prev = shift1(end, 0)
        end_next = jnp.concatenate([end[1:], jnp.zeros(1, end.dtype)])
        # per-seg last end (the python mums[-1] wraparound): propagate
        # the end at each segment-last slot backward over the segment
        last_end_rev = last_value_scan(
            jnp.flip(jnp.where(last, end, 0)), jnp.flip(last)
        )
        seg_last_end = jnp.flip(last_end_rev)
        # keep rule (schemes.py:169-172, incl. the i==0 wraparound
        # quirk); single-entry segments always survive
        keep_first = (~last & (end_next > end)) | (seg_last_end < end)
        keep = alive & jnp.where(first, keep_first | last, end_prev < end)
        seg = jnp.where(keep, seg, BIG)
        # compact kept rows to the front, preserving order
        seg, l, a, b = sort_by((seg, iar), (seg, l, a, b))
        pos = a if coord == 0 else b
        alive = seg < BIG
        n_alive = jnp.sum(alive.astype(i32))
        first = (seg != shift1(seg, -9)) & alive

        # --- scan 1: incoming cur_end per row.  The sequential carry
        # transition is the 2-piece step function
        #   f(ce) = pos      if ce >= pos + l   (candidate swallowed)
        #         = pos + l  otherwise
        # with segment-first rows the constant pos + l; step functions
        # (T, A, B) are closed under composition (the threshold of the
        # composition is the FIRST function's).
        pl = pos + l
        T0 = jnp.where(first | ~alive, jnp.int32(-1), pl)
        Av = jnp.where(alive, pl, 0)
        Bv = jnp.where(first, pl, jnp.where(alive, pos, 0))
        Tx, Ax, Bx = shift1(T0, -1), shift1(Av, 0), shift1(Bv, 0)

        def comb_step(x, y):
            t1, a1, b1 = x
            t2, a2, b2 = y
            return (
                t1,
                jnp.where(a1 >= t2, b2, a2),
                jnp.where(b1 >= t2, b2, a2),
            )

        Tc, Ac, Bc = jax.lax.associative_scan(comb_step, (Tx, Ax, Bx))
        ce_in = jnp.where(0 >= Tc, Bc, Ac)

        ov = jnp.where(first, 0, ce_in - pos)
        hit = alive & ~first & (ov > 0)
        ovh = jnp.where(hit, ov, 0)
        li = l - ovh
        front = jnp.where(hit, ovh, 0)

        # --- scan 2: incoming cur_len per row.  Transitions are the
        # clamped-subtract class phi(cl) = max(cl - a, b) (constants
        # via a = 2^30): no-hit -> const l, partial cut -> const li,
        # swallowed -> max(cl - ov, 0).
        deep = hit & (li <= 0)
        a_r = jnp.where(deep, ovh, A30)
        b_r = jnp.where(alive, jnp.where(deep, 0, jnp.where(hit, li, l)), 0)
        ax, bx = shift1(a_r, A30), shift1(b_r, 0)

        def comb_cl(x, y):
            a1, b1 = x
            a2, b2 = y
            return jnp.minimum(a1 + a2, A30), jnp.maximum(b1 - a2, b2)

        ac, bc = jax.lax.associative_scan(comb_cl, (ax, bx))
        cl_in = jnp.maximum(-ac, bc)
        prev_alive = (cl_in - ovh) > 0

        # --- scan 3: incoming cur_idx per row (last reset value):
        # reset to the row itself unless the candidate was swallowed
        # with a still-alive current (keep), or to the K scratch row
        # when the current died too.
        reset = (~deep) | (deep & ~prev_alive)
        rval = jnp.where(~deep, iar, jnp.int32(K))
        ci_in = last_value_scan(shift1(rval, K), shift1(reset, True))

        back = jnp.zeros(K + 1, i32)
        back = back.at[jnp.where(hit, ci_in, K)].add(ovh, mode="drop")
        back = back[:K]

        newl = l - front - back
        ok = (seg < BIG) & (newl > 0)
        seg = jnp.where(ok, seg, BIG)
        return seg, newl, a + front, b + front, n_alive

    # ------------------------------------------------------------------
    # chain + pick, flat M-row formulation (single-root path: one
    # segment may hold thousands of candidates, so per-segment rows
    # are unbounded and the wavefront/runs machinery is required)
    # ------------------------------------------------------------------
    def chain_flat(cseg, cl, caa, cbb, seg_tab, seg_live, abort,
                   steps, ws, wp):
        iar_m = jnp.arange(M, dtype=i32)
        sarange = jnp.arange(SMAX, dtype=i32)
        # ---- chain DP (schemes.py:20-104), values-first -----------
        # one right-pseudo row per live segment: l=0 at (a_end,
        # b_end); candidates have a < a_end so the pseudo sorts last
        # within its segment
        gseg = jnp.concatenate(
            [cseg, jnp.where(seg_live, sarange, BIG)]
        )
        gl = jnp.concatenate([cl, jnp.zeros(SMAX, i32)])
        ga = jnp.concatenate(
            [caa, jnp.where(seg_live, seg_tab[:, 1], 0)]
        )
        gb = jnp.concatenate(
            [cbb, jnp.where(seg_live, seg_tab[:, 3], 0)]
        )
        gpseudo = jnp.concatenate(
            [jnp.zeros(K, i32), jnp.ones(SMAX, i32)]
        )
        gseg, gl, ga, gb, gpseudo = sort_by(
            (gseg, jnp.where(gseg < BIG, ga, BIG), iar_m),
            (gseg, gl, ga, gb, gpseudo),
        )
        galive = gseg < BIG
        # duplicate ref starts within a segment: the host resolves
        # them through its dict-aliasing path; abort instead
        dup = (
            (gseg[1:] == gseg[:-1]) & (ga[1:] == ga[:-1])
            & (gseg[1:] < BIG) & (gpseudo[1:] == 0)
            & (gpseudo[:-1] == 0)
        )
        abort = jnp.where(
            jnp.any(dup), jnp.int32(ABORT_DUP_REF), abort
        )

        gea = ga + gl
        geb = gb + gl
        gu = gea - geb
        gv = ga - gb
        gsc = jnp.clip(gseg, 0, SMAX - 1)
        gla = seg_tab[gsc, 0] - 1   # left pseudo (text coords;
        glb = seg_tab[gsc, 2] - 1   # gap costs shift-invariant)
        gmul = ws * gl
        dl_ = (ga - gla) - (gb - glb)
        gwl = jnp.where(galive, gmul - wp * jnp.abs(dl_), NEG)

        # runs: maximal blocks of consecutively-chainable rows where
        # every in-run predecessor pair is exactly branch-1 of the
        # |gap| split (u_j <= v_i with dominance, transitively)
        gfirst = (gseg != shift1(gseg, -9)) & galive
        chain_ok = (
            (shift1(gea, BIG) <= ga) & (shift1(geb, BIG) <= gb)
            & (shift1(gu, BIG) <= gv)
        )
        brk0 = (gfirst | ~chain_ok) & galive
        pmu = seg_max_scan(gu, brk0)
        brk = (brk0 | (shift1(pmu, BIG) > gv)) & galive
        runid = jnp.cumsum(brk.astype(i32)) - 1
        runid = jnp.where(galive, runid, -1)

        # --- wavefront rounds: scores only -------------------------
        def cc_blocked_out(score, done):
            """Chunked candidate-x-candidate pass: per row i,
            blocked = any compat pred neither done nor earlier in
            i's run; outv = max over done compat preds of
            score_j - wp*|v_i - u_j|."""
            blocked = []
            outv = []
            for c in range(NCH):
                sl = slice(c * CH, (c + 1) * CH)
                seg_i = gseg[sl][:, None]
                a_i = ga[sl][:, None]
                b_i = gb[sl][:, None]
                v_i = gv[sl][:, None]
                r_i = runid[sl][:, None]
                i_i = iar_m[sl][:, None]
                compat = (
                    (gseg[None, :] == seg_i) & galive[None, :]
                    & (gea[None, :] <= a_i) & (geb[None, :] <= b_i)
                    & (iar_m[None, :] < i_i)
                )
                inrun = (runid[None, :] == r_i) & (
                    iar_m[None, :] < i_i
                )
                blocked.append(
                    jnp.any(compat & ~done[None, :] & ~inrun, axis=1)
                )
                tw = jnp.where(
                    compat & done[None, :],
                    score[None, :]
                    - wp * jnp.abs(v_i - gu[None, :]),
                    NEG,
                )
                outv.append(jnp.max(tw, axis=1))
            return jnp.concatenate(blocked), jnp.concatenate(outv)

        def round_body(c):
            score, done, rnd, rabort = c
            blocked, outv = cc_blocked_out(score, done)
            # commit = per-run prefix of unblocked undone rows
            okrow = done | (~blocked & galive)
            okpref = seg_min_scan(
                okrow.astype(i32), brk
            ) > 0
            commit = galive & ~done & okpref
            # value scan in phi-space: f(M) = max(M + P, Q).
            # Exclusive segmented prefix: elements shift right by
            # one, and positions at run starts become the reset
            # element (0, NEG) so a run-start row sees an empty
            # prefix rather than the previous run's tail.
            base = jnp.maximum(gwl, outv + gmul)
            psi = gmul - wp * (gv - gu)
            P = jnp.where(commit, jnp.maximum(psi, 0), 0)
            phi_done = score + wp * gu
            Q = jnp.where(
                done & galive, phi_done,
                jnp.where(commit, base + wp * gu, NEG),
            )

            def comb_aff(x, y):
                p1, q1, r1 = x
                p2, q2, r2 = y
                keep = ~r2
                return (
                    jnp.where(keep, jnp.minimum(p1 + p2, A30), p2),
                    jnp.where(
                        keep,
                        jnp.maximum(q1 + p2, q2),
                        q2,
                    ),
                    r1 | r2,
                )

            Pp = jnp.where(brk, 0, shift1(P, 0))
            Qp = jnp.where(brk, NEG, shift1(Q, NEG))
            Rp = brk | (iar_m == 0)
            _, Qc, _ = jax.lax.associative_scan(
                comb_aff, (Pp, Qp, Rp)
            )
            m_in = Qc  # applied to initial NEG: max(NEG+P, Q) = Q
            # guard: an empty prefix (m_in = NEG) must not wrap
            # int32 when the (possibly negative) row offset is added
            sc_new = jnp.where(
                m_in > NEG // 2,
                jnp.maximum(base, m_in + gmul - wp * gv),
                base,
            )
            score = jnp.where(commit, sc_new, score)
            done = done | commit
            progress = jnp.any(commit)
            rabort = jnp.where(
                progress, rabort, jnp.int32(ABORT_CHAIN_ROUNDS)
            )
            return score, done, rnd + 1, rabort

        def round_cond(c):
            score, done, rnd, rabort = c
            return (
                jnp.any(galive & ~done) & (rnd < _RMAX)
                & (rabort == 0)
            )

        score, cdone, rounds, rabort = jax.lax.while_loop(
            round_cond,
            round_body,
            (
                jnp.zeros(M, i32), ~galive, jnp.int32(0),
                jnp.int32(0),
            ),
        )
        abort = jnp.where(
            (abort == 0) & (rabort != 0), rabort, abort
        )
        abort = jnp.where(
            (abort == 0) & jnp.any(galive & ~cdone),
            jnp.int32(ABORT_CHAIN_ROUNDS),
            abort,
        )
        steps = steps.at[1].add(rounds)

        # --- act: geometric activation step (min dominating row) --
        act_cols = []
        for c in range(NCH):
            sl = slice(c * CH, (c + 1) * CH)
            seg_j = gseg[sl][None, :]
            ea_j = gea[sl][None, :]
            eb_j = geb[sl][None, :]
            dom = (
                (gseg[:, None] == seg_j) & galive[:, None]
                & (ga[:, None] >= ea_j) & (gb[:, None] >= eb_j)
            )
            act_cols.append(
                jnp.min(
                    jnp.where(dom, iar_m[:, None], BIG), axis=0
                )
            )
        act = jnp.concatenate(act_cols)
        act = jnp.where(galive, act, BIG)

        # --- links: exact winner reconstruction with all scores ----
        # lex key (tmpw, score_j, -act_j, -row_j); the left pseudo
        # wins ties per the reference's traversal order
        # (schemes.py:64-87): wl > mx, or wl == mx and best tied
        # score <= 0
        link_parts = []
        for c in range(NCH):
            sl = slice(c * CH, (c + 1) * CH)
            seg_i = gseg[sl][:, None]
            a_i = ga[sl][:, None]
            b_i = gb[sl][:, None]
            v_i = gv[sl][:, None]
            i_i = iar_m[sl][:, None]
            compat = (
                (gseg[None, :] == seg_i) & galive[None, :]
                & (gea[None, :] <= a_i) & (geb[None, :] <= b_i)
                & (iar_m[None, :] < i_i)
            )
            tw = jnp.where(
                compat,
                score[None, :] - wp * jnp.abs(v_i - gu[None, :]),
                NEG,
            )
            mx = jnp.max(tw, axis=1)
            t1 = tw == mx[:, None]
            sc2 = jnp.where(t1, score[None, :], NEG)
            mx2 = jnp.max(sc2, axis=1)
            t2 = t1 & (sc2 == mx2[:, None])
            # min (act, row): min act first, then first row among
            # the act-minimal (argmax picks the first True)
            a3 = jnp.where(t2, act[None, :], BIG)
            amn = jnp.min(a3, axis=1)
            t3 = t2 & (a3 == amn[:, None])
            brow = jnp.argmax(t3, axis=1).astype(i32)
            has = mx > NEG
            wl_i = gwl[sl]
            mxg = mx + gmul[sl]
            use_left = (~has) | (wl_i > mxg) | (
                (wl_i == mxg) & (mx2 <= 0)
            )
            link_parts.append(
                jnp.where(use_left, jnp.int32(-1), brow)
            )
        link = jnp.concatenate(link_parts)
        link = jnp.where(galive, link, jnp.int32(-2))

        # ---- backtrack + largest (schemes.py:298-301) -------------
        # pointer-doubling along link chains: per row, the best
        # (strictly-greater wins, nearest wins ties) candidate l on
        # the path from it to the left pseudo
        is_pseudo = (gpseudo == 1) & galive
        pseudo_pos = jax.ops.segment_max(
            jnp.where(is_pseudo, iar_m, -1),
            jnp.clip(gseg, 0, SMAX - 1),
            num_segments=SMAX,
        )
        ptr0 = jnp.where(
            seg_live & (pseudo_pos >= 0),
            link[jnp.clip(pseudo_pos, 0, M - 1)],
            jnp.int32(-1),
        )
        nxt = jnp.where(link >= 0, link, jnp.int32(M))
        nxt = jnp.concatenate([nxt, jnp.full(1, M, i32)])
        bl = jnp.concatenate(
            [jnp.where(galive & (gpseudo == 0), gl, -1),
             jnp.full(1, -1, i32)]
        )
        bs = jnp.concatenate([iar_m, jnp.full(1, -1, i32)])
        def dbl_body(c):
            bl, bs, nxt = c
            bl2 = bl[nxt]
            bs2 = bs[nxt]
            take_far = bl2 > bl
            bl = jnp.where(take_far, bl2, bl)
            bs = jnp.where(take_far, bs2, bs)
            return bl, bs, nxt[nxt]

        # log-depth pointer doubling, stopping as soon as every
        # chain has collapsed into the sentinel
        bl, bs, nxt = jax.lax.while_loop(
            lambda c: jnp.any(c[2][:M] != M),
            dbl_body,
            (bl, bs, nxt),
        )
        ptr0c = jnp.clip(ptr0, 0, M)
        blp = jnp.where(ptr0 >= 0, bl[ptr0c], -1)
        bsp = jnp.where((ptr0 >= 0) & (blp > -1), bs[ptr0c], -1)
        # v1 semantics: walking from the pseudo, only rows with
        # l > -1 beat the init; pseudo rows on the path have l=0
        # which beats -1 — but the path starts at link[pseudo], and
        # pseudo rows never appear as links of other rows' chains
        # within a segment (their a >= every candidate end), so the
        # chain contains candidates only.
        bs_seg = bsp

        # single-candidate segments bypass the chain entirely
        # (picker __call__: len(relmums)==1)
        candrow = jax.ops.segment_max(
            jnp.where(galive & (gpseudo == 0), iar_m, -1),
            jnp.clip(gseg, 0, SMAX - 1),
            num_segments=SMAX,
        )
        candcnt = jax.ops.segment_sum(
            (galive & (gpseudo == 0)).astype(i32),
            jnp.clip(gseg, 0, SMAX - 1),
            num_segments=SMAX,
        )
        single = seg_live & (candcnt == 1)
        bs_seg = jnp.where(single, candrow, bs_seg)
        picked = seg_live & (bs_seg >= 0)
        bsc = jnp.clip(bs_seg, 0, M - 1)
        s_l = jnp.where(picked, gl[bsc], 0)
        s_ma = jnp.where(picked, ga[bsc], 0)
        s_mb = jnp.where(picked, gb[bsc], 0)
        return picked, s_l, s_ma, s_mb, abort, steps


    # ------------------------------------------------------------------
    # chain + pick, dense (SMAX, CW+1) formulation (forest path: every
    # segment holds at most CW candidates, so the whole level's chain
    # DP is a short sequential column scan advancing the rank-j
    # candidate of EVERY segment together — no M x M passes, no
    # wavefront).  Scores, traversal order and tie-breaks are exactly
    # chain_flat's / the reference's (schemes.py:20-104).
    # ------------------------------------------------------------------
    def chain_dense(cseg, cl, caa, cbb, seg_tab, seg_live, abort,
                    steps, ws, wp):
        CW1 = CW + 1          # + pseudo column (always last)
        iar = jnp.arange(K, dtype=i32)
        cols = jnp.arange(CW1, dtype=i32)

        # stable (seg, a) order; per-segment rank
        cseg, cl, caa, cbb = sort_by(
            (cseg, jnp.where(cseg < BIG, caa, BIG), iar),
            (cseg, cl, caa, cbb),
        )
        alive = cseg < BIG
        dup = (
            (cseg[1:] == cseg[:-1]) & (caa[1:] == caa[:-1])
            & (cseg[1:] < BIG)
        )
        abort = jnp.where(
            jnp.any(dup), jnp.int32(ABORT_DUP_REF), abort
        )
        first = (cseg != shift1(cseg, -9)) & alive
        firstpos = last_value_scan(jnp.where(first, iar, 0), first)
        rank = jnp.where(alive, iar - firstpos, 0)
        abort = jnp.where(
            jnp.any(alive & (rank >= CW)),
            jnp.int32(ABORT_SEG_WIDTH),
            abort,
        )
        csc = jnp.clip(cseg, 0, SMAX - 1)
        # dead rows get unique spill slots so the scatters stay
        # honestly unique-indexed (collisions only under the
        # ABORT_SEG_WIDTH retry, whose results are discarded)
        didx = jnp.where(
            alive,
            csc * CW1 + jnp.minimum(rank, CW - 1),
            SMAX * CW1 + iar,
        )

        def scat(v):
            return (
                jnp.zeros(SMAX * CW1 + K, i32)
                .at[didx].set(v, unique_indices=True)[: SMAX * CW1]
                .reshape(SMAX, CW1)
            )

        dA = scat(caa)
        dB = scat(cbb)
        dL = scat(cl)
        dal = scat(alive.astype(i32))
        dA = dA.at[:, CW].set(seg_tab[:, 1])
        dB = dB.at[:, CW].set(seg_tab[:, 3])
        dal = dal.at[:, CW].set(seg_live.astype(i32))
        dalb = dal > 0
        dEA = dA + dL
        dEB = dB + dL
        dU = dEA - dEB
        dV = dA - dB
        dmul = ws * dL
        ddl = (dA - (seg_tab[:, 0] - 1)[:, None]) - (
            dB - (seg_tab[:, 2] - 1)[:, None]
        )
        dwl = jnp.where(dalb, dmul - wp * jnp.abs(ddl), NEG)
        candb = dalb & (cols[None, :] < CW)
        candcnt = jnp.sum(candb.astype(i32), axis=1)

        # act: min dominating column (the geometric activation step;
        # the pseudo always dominates, so act <= CW for live columns)
        CB = 16
        act_parts = []
        for c0 in range(0, CW1, CB):
            ce = min(c0 + CB, CW1)
            dom = (
                (dA[:, None, :] >= dEA[:, c0:ce, None])
                & (dB[:, None, :] >= dEB[:, c0:ce, None])
                & dalb[:, None, :]
            )
            act_parts.append(
                jnp.min(
                    jnp.where(dom, cols[None, None, :], BIG), axis=2
                )
            )
        dact = jnp.concatenate(act_parts, axis=1)

        # scores: sequential pass over candidate columns, early exit
        # at the widest live segment
        maxcnt = jnp.max(jnp.where(seg_live, candcnt, 0))

        def col_body(st):
            score, j = st
            a_j = jax.lax.dynamic_index_in_dim(
                dA, j, axis=1, keepdims=False
            )
            b_j = jax.lax.dynamic_index_in_dim(
                dB, j, axis=1, keepdims=False
            )
            l_j = jax.lax.dynamic_index_in_dim(
                dL, j, axis=1, keepdims=False
            )
            wl_j = jax.lax.dynamic_index_in_dim(
                dwl, j, axis=1, keepdims=False
            )
            al_j = jax.lax.dynamic_index_in_dim(
                dalb, j, axis=1, keepdims=False
            )
            v_j = a_j - b_j
            compat = (
                dalb
                & (dEA <= a_j[:, None])
                & (dEB <= b_j[:, None])
                & (cols[None, :] < j)
            )
            tw = jnp.where(
                compat,
                score - wp * jnp.abs(v_j[:, None] - dU),
                NEG,
            )
            mx = jnp.max(tw, axis=1)
            sc_new = jnp.maximum(
                wl_j,
                jnp.where(mx > NEG // 2, mx + ws * l_j, NEG),
            )
            sc_new = jnp.where(al_j, sc_new, NEG)
            score = jax.lax.dynamic_update_index_in_dim(
                score, sc_new, j, axis=1
            )
            return score, j + 1

        score, rounds = jax.lax.while_loop(
            lambda st: st[1] < maxcnt,
            col_body,
            (jnp.full((SMAX, CW1), NEG, i32), jnp.int32(0)),
        )
        steps = steps.at[1].add(rounds)

        # links: exact winner reconstruction, lex key
        # (tmpw, score_j, -act_j, -col_j); left pseudo wins per the
        # reference's traversal order (schemes.py:64-87)
        link_parts = []
        for c0 in range(0, CW1, CB):
            ce = min(c0 + CB, CW1)
            compat = (
                dalb[:, None, :]
                & (dEA[:, None, :] <= dA[:, c0:ce, None])
                & (dEB[:, None, :] <= dB[:, c0:ce, None])
                & (cols[None, None, :] < cols[None, c0:ce, None])
            )
            tw = jnp.where(
                compat,
                score[:, None, :]
                - wp * jnp.abs(dV[:, c0:ce, None] - dU[:, None, :]),
                NEG,
            )
            mx = jnp.max(tw, axis=2)
            t1 = tw == mx[:, :, None]
            sc2 = jnp.where(t1, score[:, None, :], NEG)
            mx2 = jnp.max(sc2, axis=2)
            t2 = t1 & (sc2 == mx2[:, :, None])
            a3 = jnp.where(t2, dact[:, None, :], BIG)
            amn = jnp.min(a3, axis=2)
            t3 = t2 & (a3 == amn[:, :, None])
            brow = jnp.argmax(t3, axis=2).astype(i32)
            has = mx > NEG
            wl_b = dwl[:, c0:ce]
            mxg = mx + dmul[:, c0:ce]
            use_left = (
                (~has) | (wl_b > mxg) | ((wl_b == mxg) & (mx2 <= 0))
            )
            link_parts.append(
                jnp.where(use_left, jnp.int32(-1), brow)
            )
        dlink = jnp.concatenate(link_parts, axis=1)
        dlink = jnp.where(dalb, dlink, jnp.int32(-2))

        # backtrack + largest (schemes.py:298-301): pointer doubling
        # along link chains, sentinel column CW1
        def pad(x, fill):
            return jnp.concatenate(
                [x, jnp.full((SMAX, 1), fill, i32)], axis=1
            )

        nxt = pad(
            jnp.where(dlink >= 0, dlink, jnp.int32(CW1)), CW1
        )
        bl = pad(jnp.where(candb, dL, -1), -1)
        bs = pad(
            jnp.broadcast_to(cols[None, :], (SMAX, CW1)).astype(i32),
            -1,
        )
        cols2 = jnp.arange(CW1 + 1, dtype=i32)

        def gsel(x, idx):
            # y[s, i] = x[s, idx[s, i]] as a one-hot select (exact
            # int32; take_along_axis gathers profiled ~0.2 GB/s here)
            oh = idx[:, :, None] == cols2[None, None, :]
            return jnp.sum(jnp.where(oh, x[:, None, :], 0), axis=2)

        def dbl_body(c):
            bl, bs, nxt = c
            bl2 = gsel(bl, nxt)
            bs2 = gsel(bs, nxt)
            take_far = bl2 > bl
            bl = jnp.where(take_far, bl2, bl)
            bs = jnp.where(take_far, bs2, bs)
            return bl, bs, gsel(nxt, nxt)

        bl, bs, nxt = jax.lax.while_loop(
            lambda c: jnp.any(c[2][:, :CW1] != CW1),
            dbl_body,
            (bl, bs, nxt),
        )
        ptr0 = jnp.where(seg_live, dlink[:, CW], jnp.int32(-1))
        ptr0c = jnp.clip(ptr0, 0, CW1)[:, None]
        blp = jnp.where(ptr0 >= 0, gsel(bl, ptr0c)[:, 0], -1)
        bsp = jnp.where(
            (ptr0 >= 0) & (blp > -1), gsel(bs, ptr0c)[:, 0], -1
        )
        bs_seg = bsp
        # single-candidate segments bypass the chain entirely
        # (picker __call__: len(relmums)==1); the candidate is rank 0
        single = seg_live & (candcnt == 1)
        bs_seg = jnp.where(single, 0, bs_seg)
        picked = seg_live & (bs_seg >= 0)
        bsc = jnp.clip(bs_seg, 0, CW1 - 1)[:, None]
        ohp = bsc[:, :, None] == cols[None, None, :]

        def psel(x):
            return jnp.sum(jnp.where(ohp, x[:, None, :], 0), axis=2)[
                :, 0
            ]

        s_l = jnp.where(picked, psel(dL), 0)
        s_ma = jnp.where(picked, psel(dA), 0)
        s_mb = jnp.where(picked, psel(dB), 0)
        return picked, s_l, s_ma, s_mb, abort, steps

    # ------------------------------------------------------------------
    # the fused level loop
    # ------------------------------------------------------------------
    @jax.jit
    def run(
        Tu8, SA, LCP, SEG, seg_tab, nseg0, nsep0, minl, maxmums,
        ws, wp, dbg,
    ):
        """seg_tab: int32[SMAX, 8]: a_beg a_end b_beg b_end parent cls
        ma mb (ma/mb = the parent's anchor begins, for repair).
        nseg0 = live initial segments (1 for the root case, the forest
        size in the deferred-hybrid case; roots carry parent = -2-did
        so the host can splice each subtree at its placeholder).

        The text crosses the link as uint8 both ways (4x less tunnel
        volume than the int32 working form) and is widened on device;
        the BWT column is one device gather off the widened text —
        u8 GATHERS are the slow path on TPU (~100x, profiled), a u8
        elementwise widen is free."""
        T = Tu8.astype(i32)
        # BWT column (T[SA-1]; SA==0 wraps to slot 0 — the a_==0 guard
        # in enumerate makes the value irrelevant, in-bounds is enough)
        BWT = T[jnp.maximum(SA - 1, 0)]

        anchors0 = jnp.zeros((ACAP + 1, 9), i32)
        iar_n = jnp.arange(npad, dtype=i32)
        iar_k = jnp.arange(K, dtype=i32)
        iar_m = jnp.arange(M, dtype=i32)
        sarange = jnp.arange(SMAX, dtype=i32)

        def cond(st):
            nseg, abort, level = st[6], st[9], st[10]
            # dbg >= 2 caps the level count at dbg-2 (timing
            # attribution only — output is truncated)
            lcap = jnp.where(dbg >= 2, dbg - 2, jnp.int32(_LMAX))
            return (nseg > 0) & (abort == 0) & (level < lcap)

        def body(st):
            (T, SA, LCP, BWT, SEG, seg_tab, nseg, anchors, acount,
             abort, level, steps) = st

            # ---- enumerate (reveal.c:119-180 conditions) --------------
            prev = jnp.roll(SA, 1)
            seg_prev = jnp.roll(SEG, 1)
            lv = LCP
            straddle = (SA > nsep0) != (prev > nsep0)
            a_ = jnp.minimum(SA, prev)
            b_ = jnp.maximum(SA, prev)
            lcp_nx = jnp.concatenate([LCP[1:], jnp.zeros(1, LCP.dtype)])
            lcp_pv = jnp.roll(LCP, 1)
            unique = (lcp_pv < lv) & (lcp_nx < lv)
            # left chars from the carried BWT (BWT[i] = T[SA[i]-1],
            # permuted with SA and lowercased alongside T) — the
            # direct text gathers ran at ~0.5 GB/s in-kernel
            bwtp = jnp.roll(BWT, 1)
            cur_is_a = SA < prev
            ta = jnp.where(cur_is_a, BWT, bwtp)
            tb = jnp.where(cur_is_a, bwtp, BWT)
            lower = (ta >= ord("a")) & (ta <= ord("z"))
            leftmax = (
                (a_ == 0) | (b_ == 0) | (ta != tb)
                | (ta == N_BYTE) | (ta == SENTINEL) | lower
            )
            mask = (
                (iar_n >= 1) & (SEG >= 0) & (SEG == seg_prev)
                & (lv >= minl) & (lv > 0) & straddle & leftmax & unique
            )
            ccount = jnp.sum(mask.astype(i32))
            abort = jnp.where(
                ccount > K, jnp.int32(ABORT_CAND_OVERFLOW), abort
            )
            # compaction via rank scatter (jnp.nonzero lowers ~40x
            # slower in-kernel, profiled); rank>=K collisions only
            # under the abort whose results are discarded
            rankm = jnp.cumsum(mask.astype(i32)) - 1
            sidx = jnp.where(mask, rankm, K + iar_n)
            slots = (
                jnp.full(K + npad, npad - 1, i32)
                .at[sidx].set(iar_n, mode="drop", unique_indices=True)
                [:K]
            )
            valid = iar_k < jnp.minimum(ccount, K)
            cseg = jnp.where(valid, SEG[slots], BIG)
            cl = jnp.where(valid, lv[slots], 0)
            caa = jnp.where(valid, a_[slots], 0)
            cbb = jnp.where(valid, b_[slots], 0)

            # maxmums: the host keeps the largest `maxmums` after trim;
            # rare — abort to the host engine instead of replicating
            percnt = jax.ops.segment_sum(
                jnp.where(cseg < BIG, 1, 0).astype(i32),
                jnp.clip(cseg, 0, SMAX - 1),
                num_segments=SMAX,
            )
            abort = jnp.where(
                jnp.max(percnt) > maxmums,
                jnp.int32(ABORT_MAXMUMS),
                abort,
            )

            # ---- trim both dimensions ---------------------------------
            cseg, cl, caa, cbb, na0 = trim_dim(cseg, cl, caa, cbb, 0)
            steps = steps.at[0].add(na0)
            cseg, cl, caa, cbb, na1 = trim_dim(cseg, cl, caa, cbb, 1)
            steps = steps.at[0].add(na1)

            seg_live = sarange < nseg
            chain = chain_flat if CW is None else chain_dense
            (picked, s_l, s_ma, s_mb, abort, steps) = chain(
                cseg, cl, caa, cbb, seg_tab, seg_live, abort, steps,
                ws, wp,
            )

            # ---- anchor log -------------------------------------------
            npicked = jnp.sum(picked.astype(i32))
            abort = jnp.where(
                acount + npicked > ACAP,
                jnp.int32(ABORT_ANCHOR_OVERFLOW),
                abort,
            )
            prank = jnp.cumsum(picked.astype(i32)) - 1
            lslot = jnp.where(
                picked, jnp.minimum(acount + prank, ACAP), ACAP
            )
            rows = jnp.stack(
                [
                    s_ma, s_mb, s_l,
                    seg_tab[:, 0], seg_tab[:, 1],
                    seg_tab[:, 2], seg_tab[:, 3],
                    seg_tab[:, 4], seg_tab[:, 5],
                ],
                axis=1,
            )
            # (not unique_indices: every non-picked row shares the
            # ACAP spill slot)
            anchors = anchors.at[lslot].set(
                jnp.where(picked[:, None], rows, anchors[lslot])
            )

            # ---- children ---------------------------------------------
            lead_live = picked & (s_ma > seg_tab[:, 0]) & (
                s_mb > seg_tab[:, 2]
            )
            trail_live = picked & (s_ma + s_l < seg_tab[:, 1]) & (
                s_mb + s_l < seg_tab[:, 3]
            )
            nl = jnp.cumsum(lead_live.astype(i32))
            nt = jnp.cumsum(trail_live.astype(i32))
            n_lead = nl[-1]
            lead_id = jnp.where(lead_live, nl - 1, SMAX)
            trail_id = jnp.where(trail_live, n_lead + nt - 1, SMAX)
            nseg_new = n_lead + nt[-1]
            abort = jnp.where(
                nseg_new > SMAX, jnp.int32(ABORT_SEG_OVERFLOW), abort
            )
            lead_id = jnp.minimum(lead_id, SMAX)
            trail_id = jnp.minimum(trail_id, SMAX)

            new_tab_w = jnp.zeros((SMAX + 1, 8), i32)
            lrow = jnp.stack(
                [
                    seg_tab[:, 0], s_ma, seg_tab[:, 2], s_mb,
                    lslot, jnp.ones(SMAX, i32), s_ma, s_mb,
                ],
                axis=1,
            )
            trow = jnp.stack(
                [
                    s_ma + s_l, seg_tab[:, 1], s_mb + s_l, seg_tab[:, 3],
                    lslot, jnp.full(SMAX, 2, i32), s_ma, s_mb,
                ],
                axis=1,
            )
            new_tab_w = new_tab_w.at[lead_id].set(lrow, mode="drop")
            new_tab_w = new_tab_w.at[trail_id].set(trow, mode="drop")
            new_tab = new_tab_w[:SMAX]

            # ---- classify + split + lowercase -------------------------
            # per-slot views of per-segment values.  A direct table
            # gather (x[sc] with 2M slot indices) runs at ~0.7-1.4 GB/s
            # on TPU (profiled: the seg_tab/picked gathers were ~4.3 s
            # of the 8.8 s dispatch); every such value is constant over
            # a segment's contiguous slot run, so broadcast it with an
            # SMAX-sized scatter to the run starts + one forward-fill
            # scan instead (~0.3 ms).  Segment ids ascend in slot
            # order (partition invariant), so row i of a table belongs
            # to the i-th run.
            segstart = SEG != shift1(SEG, -9)
            # per-slot views of per-segment values as ONE packed
            # (SMAX, C) table-row gather by SEG — multi-column gathers
            # amortize to ~1 scatter's cost (measured r5), replacing
            # the old rank-scatter + forward-fill-scan per column
            seg_safe = jnp.clip(SEG, 0, SMAX - 1)
            btab = jnp.stack(
                [
                    picked.astype(i32), s_ma, s_mb, s_l,
                    seg_tab[:, 0], seg_tab[:, 1],
                    seg_tab[:, 2], seg_tab[:, 3],
                    lead_live.astype(i32), trail_live.astype(i32),
                    lead_id, trail_id,
                ],
                axis=1,
            )
            brows = btab[seg_safe]
            pos = SA
            pickedb = brows[:, 0] > 0
            b_sma = brows[:, 1]
            b_smb = brows[:, 2]
            pl = brows[:, 3]
            b_t0 = brows[:, 4]
            b_t1 = brows[:, 5]
            b_t2 = brows[:, 6]
            b_t3 = brows[:, 7]
            b_ll = brows[:, 8] > 0
            b_tl = brows[:, 9] > 0
            b_lid = brows[:, 10]
            b_tid = brows[:, 11]
            pma = jnp.where(pickedb, b_sma, -1)
            pmb = jnp.where(pickedb, b_smb, -1)
            in_lead = ((pos >= b_t0) & (pos < pma)) | (
                (pos >= b_t2) & (pos < pmb)
            )
            in_trail = ((pos >= pma + pl) & (pos < b_t1)) | (
                (pos >= pmb + pl) & (pos < b_t3)
            )
            live_parent = (SEG >= 0) & pickedb
            nsg = jnp.where(
                live_parent & in_lead & b_ll,
                jnp.minimum(b_lid, SMAX - 1),
                jnp.int32(-1),
            )
            nsg = jnp.where(
                live_parent & in_trail & b_tl,
                jnp.minimum(b_tid, SMAX - 1),
                nsg,
            )
            # guard: lead_id/trail_id == SMAX only for dead children
            nsg = jnp.where(
                live_parent & in_lead & ~b_ll, -1, nsg
            )
            nsg = jnp.where(
                live_parent & in_trail & ~b_tl, -1, nsg
            )
            cls = jnp.where(live_parent & in_lead, 1, 0)
            cls = jnp.where(live_parent & in_trail, 2, cls)

            # child LCP: per-class segmented running-min over the parent
            # layout (split(), reveal.c:582-664; devfrontier apply)
            cls_prev = shift1(cls, 0)
            # both classes in ONE packed scan (the two resets differ,
            # the combine is elementwise-independent per class)
            reset1 = segstart | ((cls_prev == 1) & ~segstart)
            reset2 = segstart | ((cls_prev == 2) & ~segstart)

            def comb_min2(x, y):
                m1, f1, m2, f2 = x
                n1, g1, n2, g2 = y
                return (
                    jnp.where(g1, n1, jnp.minimum(m1, n1)), f1 | g1,
                    jnp.where(g2, n2, jnp.minimum(m2, n2)), f2 | g2,
                )

            mm1, _, mm2, _ = jax.lax.associative_scan(
                comb_min2, (LCP, reset1, LCP, reset2)
            )
            newlcp = jnp.where(
                cls == 1, mm1, jnp.where(cls == 2, mm2, 0)
            )

            # ---- stable partition by new segment id -------------------
            # The old formulation sorted (nsg, slot) over all npad slots
            # every level — the kernel's dominant cost (2.7 s/level on
            # CPU at npad=2^22) and a TPU compile hog.  The permutation
            # is computable analytically instead: segment ids appear in
            # slot order (leads in parent order, then trails — an
            # invariant the partition itself maintains), so each lead
            # slot's target is the global count of lead slots before it
            # (the per-run base and in-run rank telescope), trails land
            # after all leads.  Dead slots are never read again (every
            # consumer is SEG-gated), so instead of ranking them to the
            # tail they are dropped: live slots scatter onto a blank
            # background.  Two global cumsums + one permutation scatter
            # — live-slot layout is byte-identical to the stable sort's
            # output.
            ld = (nsg >= 0) & (cls == 1)
            tr = (nsg >= 0) & (cls == 2)
            ldi = ld.astype(i32)
            tri = tr.astype(i32)
            egl = jnp.cumsum(ldi) - ldi
            egt = jnp.cumsum(tri) - tri
            nlead_tot = egl[-1] + ldi[-1]
            newpos = jnp.where(
                ld, egl,
                jnp.where(tr, nlead_tot + egt, jnp.int32(npad)),
            )
            # unique_indices: newpos is a (partial) permutation —
            # without the hint the TPU scatter lowering is ~500x slower
            # (55 ms vs 0.11 ms at 2M elements, measured)
            # lowercase the BWT entries whose text position (pos-1)
            # falls in this level's matched regions of the slot's own
            # parent (positions left of a live interval belong either
            # to this parent's match — handled here — or to an
            # ancestor match lowercased at an earlier level, when this
            # same slot's entry was updated; other same-level parents
            # are never text-adjacent)
            pm1 = pos - 1
            bwt_m = ((pm1 >= pma) & (pm1 < pma + pl)) | (
                (pm1 >= pmb) & (pm1 < pmb + pl)
            )
            bwt_up = (BWT >= ord("A")) & (BWT <= ord("Z"))
            BWT = jnp.where(bwt_m & bwt_up, BWT + 32, BWT)
            # apply the partition as ONE inverse-permutation scatter +
            # ONE packed row gather: npad-wide scatters cost ~10 ms
            # each at 2M on this chip (scalar-core bound; payload
            # packing does NOT amortize scatters but DOES amortize
            # gathers — 8-col gather ~= 1-col scatter, measured r5)
            invp = jnp.full(npad, npad, i32).at[newpos].set(
                iar_n, mode="drop", unique_indices=True
            )
            pvalid = invp < npad
            invc = jnp.minimum(invp, npad - 1)
            packed = jnp.stack(
                [BWT, SA, newlcp, jnp.clip(nsg, 0, SMAX)], axis=1
            )
            rows2 = packed[invc]
            BWT = jnp.where(pvalid, rows2[:, 0], 0)
            SA = jnp.where(pvalid, rows2[:, 1], 0)
            lcp_p = jnp.where(pvalid, rows2[:, 2], 0)
            segk = jnp.where(pvalid, rows2[:, 3], SMAX)
            SEG = jnp.where(segk >= SMAX, jnp.int32(-1), segk)
            sprev = shift1(SEG, -9)
            firstslot = SEG != sprev
            LCP = jnp.where(firstslot | (SEG < 0), 0, lcp_p)

            # lowercase matched text (pre-sort slot views; every live
            # text position is exactly one slot's SA)
            in_match = live_parent & ~in_lead & ~in_trail & (
                ((pos >= pma) & (pos < pma + pl))
                | ((pos >= pmb) & (pos < pmb + pl))
            )
            upmask = jnp.zeros(ntext, dtype=bool)
            upmask = upmask.at[jnp.where(in_match, pos, ntext)].set(
                True, mode="drop", unique_indices=True
            )
            isup = (T >= ord("A")) & (T <= ord("Z"))
            T = jnp.where(upmask & isup, T + 32, T)

            # ---- boundary repair (bubble_sort, reveal.c:666-727) ------
            # two passes: each leading child's A-side begin (parent ma)
            # then B-side begin (parent mb).  Batched: per iteration the
            # head batch of pending crossing suffixes is resolved on the
            # live SA/LCP, mutually-independent ones (disjoint edit
            # windows [x-1, q+1]) apply at once via fixed-width window
            # updates; window escapes abort.
            # per-slot new_tab views over the POST-partition layout —
            # same scatter+forward-fill trick as segbcast above (new
            # child ids ascend in slot order too)
            seg2_safe = jnp.clip(SEG, 0, SMAX - 1)
            btab2 = jnp.stack(
                [new_tab[:, 5], new_tab[:, 6], new_tab[:, 7]], axis=1
            )
            brows2 = btab2[seg2_safe]
            is_lead_b = (SEG >= 0) & (brows2[:, 0] == 1)
            beg_both = (
                jnp.where(is_lead_b, brows2[:, 1], -1),
                jnp.where(is_lead_b, brows2[:, 2], -1),
            )

            def repair_pass(T, SA, LCP, BWT, which, abort, steps):
                is_lead = is_lead_b
                beg = beg_both[which]
                lcpn = jnp.concatenate(
                    [LCP[1:], jnp.zeros(1, LCP.dtype)]
                )
                cross0 = is_lead & (SA < beg) & (
                    ((SA + LCP) > beg) | ((SA + lcpn) > beg)
                )
                rc = jnp.sum(cross0.astype(i32))
                abort = jnp.where(
                    rc > CCAP, jnp.int32(ABORT_REPAIR_OVERFLOW), abort
                )
                rankc = jnp.cumsum(cross0.astype(i32)) - 1
                cq = (
                    jnp.full(CCAP + npad, npad - 1, i32)
                    .at[jnp.where(cross0, rankc, CCAP + iar_n)]
                    .set(iar_n, mode="drop", unique_indices=True)
                    [:CCAP]
                )
                centry_next = lcpn[cq]
                iar_c = jnp.arange(CCAP, dtype=i32)
                pend0 = iar_c < jnp.minimum(rc, CCAP)
                warr = jnp.arange(WREP + 2, dtype=i32)
                RBV = min(CCAP, 1024)
                offs1 = jnp.arange(1, _WRV + 1, dtype=i32)
                _winresolve = (
                    _make_window_resolve(_WRV, RBV, npad)
                    if _use_pallas and RBV % 8 == 0 and npad % 128 == 0
                    else None
                )

                def resolve(SA_, LCP_, j):  # (BWT not read)
                    """One pending candidate on the live state: returns
                    (q, x, move, thr, saq, lcq).  The insertion-point
                    search (x = max y < q with LCP[y] < thr) is a cheap
                    contiguous window (p90 lookback is a few hundred on
                    real genomes) with an exact whole-array fallback
                    behind a cond for the deep tail."""
                    q = cq[j]
                    b = beg[q]
                    saq = SA_[q]
                    lcq = LCP_[q]
                    thr = b - saq
                    move = (saq < b) & (saq + lcq > b)
                    s0 = jnp.maximum(q - WREP, 0)
                    win = jax.lax.dynamic_slice(
                        LCP_, (s0,), (WREP + 2,)
                    )
                    widx = s0 + warr
                    cand = (widx < q) & (win < thr)
                    y = jnp.max(jnp.where(cand, widx, -1))
                    found = (y >= 0) | (s0 == 0)

                    def deep(_):
                        allc = (iar_n < q) & (LCP_ < thr)
                        return jnp.max(jnp.where(allc, iar_n, -1))

                    y = jax.lax.cond(
                        move & ~found, deep, lambda _: y, None
                    )
                    x = jnp.maximum(y, 0)
                    return q, x, move, thr, saq, lcq

                def apply_one(SA_, LCP_, BWT_, q, x, move, thr, saq,
                              lcq, bwq, cj, acc):
                    """Masked application of one accepted candidate:
                    window updates anchored at q, with a whole-array
                    cond path when the insertion point is deep.  The
                    BWT column moves with SA (same permutation)."""
                    do_mv = acc & move
                    shallow = (q - x) <= WREP

                    def apply_win(args):
                        SA_, LCP_, BWT_ = args
                        s0 = jnp.maximum(q - (WREP + 1), 0)
                        sa_w = jax.lax.dynamic_slice(
                            SA_, (s0,), (WREP + 2,)
                        )
                        lcp_w = jax.lax.dynamic_slice(
                            LCP_, (s0,), (WREP + 2,)
                        )
                        bw_w = jax.lax.dynamic_slice(
                            BWT_, (s0,), (WREP + 2,)
                        )
                        widx = s0 + warr
                        inwin = (widx > x) & (widx <= q)
                        sa_sh = jnp.concatenate([sa_w[:1], sa_w[:-1]])
                        lcp_sh = jnp.concatenate(
                            [lcp_w[:1], lcp_w[:-1]]
                        )
                        bw_sh = jnp.concatenate([bw_w[:1], bw_w[:-1]])
                        sa_n = jnp.where(inwin, sa_sh, sa_w)
                        lcp_n = jnp.where(inwin, lcp_sh, lcp_w)
                        bw_n = jnp.where(inwin, bw_sh, bw_w)
                        sa_n = jnp.where(widx == x, saq, sa_n)
                        lcp_n = jnp.where(widx == x + 1, thr, lcp_n)
                        bw_n = jnp.where(widx == x, bwq, bw_n)
                        SA_ = jax.lax.dynamic_update_slice(
                            SA_, sa_n, (s0,)
                        )
                        LCP_ = jax.lax.dynamic_update_slice(
                            LCP_, lcp_n, (s0,)
                        )
                        BWT_ = jax.lax.dynamic_update_slice(
                            BWT_, bw_n, (s0,)
                        )
                        return SA_, LCP_, BWT_

                    def apply_glob(args):
                        SA_, LCP_, BWT_ = args
                        inwin = (iar_n > x) & (iar_n <= q)
                        SA_n = jnp.where(inwin, jnp.roll(SA_, 1), SA_)
                        LCP_n = jnp.where(inwin, jnp.roll(LCP_, 1), LCP_)
                        BWT_n = jnp.where(inwin, jnp.roll(BWT_, 1), BWT_)
                        SA_n = SA_n.at[x].set(saq)
                        LCP_n = LCP_n.at[x + 1].set(thr)
                        BWT_n = BWT_n.at[x].set(bwq)
                        return SA_n, LCP_n, BWT_n

                    SA_, LCP_, BWT_ = jax.lax.cond(
                        do_mv,
                        lambda args: jax.lax.cond(
                            shallow, apply_win, apply_glob, args
                        ),
                        lambda args: args,
                        (SA_, LCP_, BWT_),
                    )
                    # LCP[q+1] updates (may sit beyond the window)
                    qn = jnp.minimum(q + 1, npad - 1)
                    mv_upd = do_mv & (q < npad - 1) & (lcq < LCP_[qn])
                    lcponly = acc & ~move & (q < npad - 1) & (
                        (saq < beg[q])
                        & ((saq + centry_next[cj]) > beg[q])
                        & (LCP_[qn] > LCP_[q])
                    )
                    newv = jnp.where(
                        mv_upd, lcq,
                        jnp.where(lcponly, beg[q] - saq, LCP_[qn]),
                    )
                    LCP_ = LCP_.at[qn].set(newv)
                    return SA_, LCP_, BWT_

                def rbody(c):
                    """One WHOLE-BATCH repair round.

                    All pending crossing suffixes are resolved at once
                    (a (RBV, WR) window gather off the live LCP); the
                    accepted set is every pending candidate whose edit
                    region is disjoint from its same-segment
                    predecessor's (see the acc comment below) — the
                    insertion window [x, q] never escapes the
                    candidate's own segment (the segment's first-slot
                    LCP is 0 < thr), so candidates in different
                    segments always commute, and disjoint-region
                    candidates within a segment commute with the
                    serial ascending-q order.  All accepted rotations
                    apply in ONE masked-shift + scatter pass (disjoint
                    windows -> order-free).  A round that accepts
                    nothing (the head candidate is a window-miss
                    mover, q-WR > 0) falls back to the exact
                    sequential resolve/apply for the head candidate,
                    so progress is guaranteed."""
                    SA_, LCP_, BWT_, pend, it = c
                    npend = jnp.sum(pend.astype(i32))
                    (heads,) = jnp.nonzero(
                        pend, size=RBV, fill_value=CCAP - 1
                    )
                    iar_r = jnp.arange(RBV, dtype=i32)
                    hvalid = iar_r < npend
                    q = cq[heads]
                    b = beg[q]
                    saq = SA_[q]
                    lcq = LCP_[q]
                    thr = b - saq
                    move = (saq < b) & (saq + lcq > b)
                    if _winresolve is not None:
                        y = _winresolve(LCP_, q, thr)
                    else:
                        widx = q[:, None] - offs1[None, :]
                        lcpw = LCP_[jnp.maximum(widx, 0)]
                        candw = (widx >= 0) & (lcpw < thr[:, None])
                        y = jnp.max(jnp.where(candw, widx, -1), axis=1)
                    # a window hit IS the global max y (anything later
                    # would be in the window too); a clipped window
                    # (q <= WR) that misses means x = 0 exactly
                    resolved = (y >= 0) | (q - _WRV <= 0)
                    x = jnp.maximum(y, 0)
                    ok = ~move | resolved
                    # multi-accept (profiled r5: one-accept-per-segment
                    # needed 4669 rounds on 2a2b and the per-round
                    # window gather was 30s of the 35.5s dispatch):
                    # accept EVERY pending candidate whose edit region
                    # is disjoint from its predecessor's.  Candidate i
                    # reads round-start SA/LCP at q_i and j < q_i, and
                    # writes (x_i, q_i] + {q_i+1} (movers) or {q_i+1}
                    # (lcp-only); with region_lo_i > q_{i-1}+1 — q_{i-1}
                    # the previous PENDING candidate of the same
                    # segment this round (accepted or not) — every
                    # read/write pair across candidates is disjoint, so
                    # simultaneous application equals the serial
                    # ascending-q order (byte-identical output; pinned
                    # by tests/test_devloop.py).  Heads arrive q-ascend
                    # per segment (cq is slot-ascending), so q_prev is
                    # one roll.
                    sid = jnp.clip(SEG[q], 0, SMAX - 1)
                    prev_same = (
                        (iar_r > 0)
                        & (sid == jnp.roll(sid, 1))
                        & hvalid
                        & jnp.roll(hvalid, 1)
                    )
                    q_prev = jnp.where(
                        prev_same, jnp.roll(q, 1), jnp.int32(-2)
                    )
                    region_lo = jnp.where(move, x, q)
                    acc = hvalid & ok & (region_lo > q_prev + 1)
                    nacc = jnp.sum(acc.astype(i32))
                    fillu = jnp.int32(npad) + iar_r

                    def vec_branch(args):
                        SA_, LCP_, BWT_, pend = args
                        accm = acc & move
                        xs = jnp.where(accm, x, fillu)
                        d = jnp.zeros(npad, i32)
                        d = d.at[jnp.where(accm, x + 1, fillu)].add(
                            1, mode="drop", unique_indices=True
                        )
                        d = d.at[jnp.where(accm, q + 1, fillu)].add(
                            -1, mode="drop", unique_indices=True
                        )
                        inrot = jnp.cumsum(d) > 0
                        SA2 = jnp.where(inrot, shift1(SA_, 0), SA_)
                        BWT2 = jnp.where(inrot, shift1(BWT_, 0), BWT_)
                        LCP2 = jnp.where(inrot, shift1(LCP_, 0), LCP_)
                        SA2 = SA2.at[xs].set(
                            saq, mode="drop", unique_indices=True
                        )
                        BWT2 = BWT2.at[xs].set(
                            BWT_[q], mode="drop", unique_indices=True
                        )
                        LCP2 = LCP2.at[
                            jnp.where(accm, x + 1, fillu)
                        ].set(thr, mode="drop", unique_indices=True)
                        # LCP[q+1] updates (outside every rotation
                        # window, so round-start values are live)
                        qn = jnp.minimum(q + 1, npad - 1)
                        lcp_qn = LCP_[qn]
                        mv_upd = accm & (q < npad - 1) & (lcq < lcp_qn)
                        lcponly = (
                            acc
                            & ~move
                            & (q < npad - 1)
                            & (saq < b)
                            & ((saq + centry_next[heads]) > b)
                            & (lcp_qn > lcq)
                        )
                        newv = jnp.where(
                            mv_upd,
                            lcq,
                            jnp.where(lcponly, b - saq, lcp_qn),
                        )
                        wr = mv_upd | lcponly
                        LCP2 = LCP2.at[jnp.where(wr, qn, fillu)].set(
                            newv, mode="drop", unique_indices=True
                        )
                        pend2 = pend.at[
                            jnp.where(acc, heads, CCAP + iar_r)
                        ].set(False, mode="drop", unique_indices=True)
                        return SA2, LCP2, BWT2, pend2

                    def seq_branch(args):
                        SA_, LCP_, BWT_, pend = args
                        j = heads[0]
                        q1, x1, mv1, thr1, saq1, lcq1 = resolve(
                            SA_, LCP_, j
                        )
                        bwq1 = BWT_[q1]
                        SA2, LCP2, BWT2 = apply_one(
                            SA_, LCP_, BWT_, q1, x1, mv1, thr1, saq1,
                            lcq1, bwq1, j, hvalid[0],
                        )
                        pend2 = pend.at[j].set(False)
                        return SA2, LCP2, BWT2, pend2

                    SA_, LCP_, BWT_, pend = jax.lax.cond(
                        nacc > 0,
                        vec_branch,
                        seq_branch,
                        (SA_, LCP_, BWT_, pend),
                    )
                    return SA_, LCP_, BWT_, pend, it + 1

                def rcond(c):
                    _, _, _, pend, it = c
                    # dbg bit 0: skip repair at runtime (timing
                    # attribution only — output is wrong)
                    return (
                        jnp.any(pend) & (it < CCAP) & (dbg != 1)
                    )

                SA, LCP, BWT, _, iters = jax.lax.while_loop(
                    rcond,
                    rbody,
                    (SA, LCP, BWT, pend0, jnp.int32(0)),
                )
                steps = steps.at[2].add(iters)
                return SA, LCP, BWT, abort, steps

            SA, LCP, BWT, abort, steps = repair_pass(
                T, SA, LCP, BWT, 0, abort, steps
            )
            SA, LCP, BWT, abort, steps = repair_pass(
                T, SA, LCP, BWT, 1, abort, steps
            )

            acount = jnp.minimum(acount + npicked, ACAP)
            return (
                T, SA, LCP, BWT, SEG, new_tab, nseg_new, anchors,
                acount, abort, level + 1, steps,
            )

        st = jax.lax.while_loop(
            cond,
            body,
            (
                T, SA, LCP, BWT, SEG, seg_tab, jnp.int32(nseg0),
                anchors0, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.zeros(3, i32),
            ),
        )
        (T, SA, LCP, BWT, SEG, seg_tab, nseg, anchors, acount, abort,
         level, steps) = st
        abort = jnp.where(
            (abort == 0) & (level >= _LMAX),
            jnp.int32(ABORT_LEVEL_OVERFLOW),
            abort,
        )
        return T.astype(jnp.uint8), anchors, acount, abort, level, steps

    _kern_cache[key] = run
    return run


def pop_order(parents: np.ndarray, cls: np.ndarray) -> np.ndarray:
    """Serial LIFO pop order from (parent anchor idx, child class) per
    anchor: push order parallel/leading/trailing with pop from the end
    (reveal.c:21-27,1295-1324) == pre-order walk, trailing subtree
    first."""
    A = len(parents)
    lead = np.full(A, -1, np.int64)
    trail = np.full(A, -1, np.int64)
    root = -1
    for i in range(A):
        p, c = int(parents[i]), int(cls[i])
        if p < 0:
            root = i
        elif c == 1:
            lead[p] = i
        else:
            trail[p] = i
    order = np.empty(A, np.int64)
    k = 0
    stack = [root] if root >= 0 else []
    while stack:
        t = stack.pop()
        order[k] = t
        k += 1
        # pop order: trailing first, so push leading first
        if lead[t] >= 0:
            stack.append(int(lead[t]))
        if trail[t] >= 0:
            stack.append(int(trail[t]))
    assert k == A, "anchor tree disconnected"
    return order


def rem_device_loop(
    T: np.ndarray,
    SA: np.ndarray,
    LCP: np.ndarray,
    nsep0: int,
    minlength: int,
    maxmums: int,
    wscore: int = 1,
    wpen: int = 1,
):
    """Run the whole pairwise recursion on the device.

    Returns (anchors, T_final, levels) where anchors is an int64 array
    [(ma, mb, l, a_beg, a_end, b_beg, b_end)] in serial LIFO pop order
    (ready for align/rem._rem2_replay) and T_final the lowercased text;
    or None when the kernel aborted (caller falls back to the host
    engine).  Capacity aborts (candidates/segments/anchors/repair
    queue) retry with the overflowed capacity doubled — capacities
    start optimistic so the common case runs on small arrays.
    """
    import jax

    n = len(SA)
    if n >= 2**30 or minlength < 1:
        return None
    npad = _next_pow2(n)
    caps = {
        "K": max(2048, npad // 512),
        "SMAX": max(4096, npad // 512),
        "ACAP": max(4096, npad // 64),
        # repair candidates per pass grow with text size (2a2b measured
        # >1024 at level 8)
        "CCAP": max(1024, npad // 1024),
    }

    # text crosses as uint8 (widened to int32 on device — u8 GATHERS
    # are the TPU slow path, a u8 widen is free); BWT derived on device
    T_p = np.zeros(npad, dtype=np.uint8)
    T_p[: len(T)] = np.asarray(T, dtype=np.uint8)
    SA_p = np.full(npad, n - 1, dtype=np.int32)
    SA_p[:n] = np.asarray(SA, dtype=np.int32)
    LCP_p = np.zeros(npad, dtype=np.int32)
    LCP_p[:n] = np.asarray(LCP, dtype=np.int32)
    SEG_p = np.full(npad, -1, dtype=np.int32)
    SEG_p[:n] = 0

    dispatches = 0
    for _attempt in range(5):
        seg_tab = np.zeros((caps["SMAX"], 8), dtype=np.int32)
        # root: A = [0, nsep0), B = [nsep0+1, n-1)
        seg_tab[0] = (0, nsep0, nsep0 + 1, n - 1, -1, 0, -1, -1)
        fn = _build_kernel(
            npad, caps["K"], caps["SMAX"], caps["ACAP"], caps["CCAP"]
        )
        T_out, anchors, acount, abort, level, steps = fn(
            T_p, SA_p, LCP_p, SEG_p, seg_tab, np.int32(1),
            np.int32(nsep0), np.int32(minlength), np.int32(maxmums),
            np.int32(wscore), np.int32(wpen),
            np.int32(int(os.environ.get("REVEAL_TPU_DEVLOOP_DBG", "0"))),
        )
        dispatches += 1
        abort = int(abort)
        if abort in _RETRYABLE:
            cap = _RETRYABLE[abort]
            caps[cap] *= 2
            log.info(
                "device loop: %s overflow, retrying with %s=%d",
                cap, cap, caps[cap],
            )
            continue
        break

    acount = int(acount)
    steps = np.asarray(steps)
    LAST_STATS.clear()
    LAST_STATS.update(
        levels=int(level), dispatches=dispatches, anchors=acount,
        abort=abort,
        trim_steps=int(steps[0]), chain_steps=int(steps[1]),
        repair_steps=int(steps[2]),
    )
    if abort:
        log.info("device loop aborted (code %d) — host fallback", abort)
        return None
    anchors = np.asarray(jax.device_get(anchors))[:acount].astype(
        np.int64
    )
    T_out = np.asarray(jax.device_get(T_out))[:n].astype(np.uint8)
    if acount == 0:
        return np.zeros((0, 7), np.int64), T_out, 0
    order = pop_order(anchors[:, 7], anchors[:, 8])
    ordered = anchors[order]
    out = ordered[:, [0, 1, 2, 3, 4, 5, 6]]
    log.debug(
        "device loop: %d anchors in %d levels", acount, int(level)
    )
    return out, T_out, int(level)

def forest_pop_order(parents: np.ndarray, cls: np.ndarray):
    """Per-root serial pop order for the deferred-forest kernel.

    Root anchors carry parent = -2 - defer_id (see rem_device_forest);
    returns {defer_id: index array} where each array is that subtree's
    anchors in serial LIFO pop order (pre-order walk, trailing subtree
    first — reveal.c:21-27,1295-1324)."""
    A = len(parents)
    lead = np.full(A, -1, np.int64)
    trail = np.full(A, -1, np.int64)
    roots = {}
    for i in range(A):
        p, c = int(parents[i]), int(cls[i])
        if p < -1:
            roots[-2 - p] = i
        elif c == 1:
            lead[p] = i
        else:
            trail[p] = i
    out = {}
    for did, root in roots.items():
        order = []
        stack = [root]
        while stack:
            t = stack.pop()
            order.append(t)
            if lead[t] >= 0:
                stack.append(int(lead[t]))
            if trail[t] >= 0:
                stack.append(int(trail[t]))
        out[did] = np.asarray(order, np.int64)
    return out


def rem_device_forest(
    T: np.ndarray,
    defers,
    nsep0: int,
    minlength: int,
    maxmums: int,
    wscore: int = 1,
    wpen: int = 1,
):
    """Run the deferred small-segment forest on the device.

    ``defers`` comes from native.rem2_defer_native: per deferred
    segment ``(k, a_beg, a_end, b_beg, b_end, sa, lcp)`` with the
    segment's frozen SA/LCP slices (text coordinates; the host already
    ran every bigger segment and lowercased its matches, so T is the
    correct enumerate state for every deferred root — live frontier
    intervals are disjoint).  All segments are packed into one slot
    array, seg ids 0..F-1, and the whole residual recursion runs as
    ONE dispatch of the same fused kernel as rem_device_loop.

    Returns ``(subtrees, T_out, levels)`` where subtrees maps defer id
    -> (na_i, 7) int64 anchor records in that subtree's serial pop
    order (ready to splice at the host's placeholder rows), or None on
    abort (caller falls back to the host engine)."""
    import jax

    n = len(T)
    total = int(sum(len(d[5]) for d in defers))
    F = len(defers)
    if F == 0:
        return {}, np.asarray(T, np.uint8), 0
    if n >= 2**30 or minlength < 1:
        return None
    npad = _next_pow2(max(total, 2))
    ntext = _next_pow2(n)
    sum_k = int(sum(d[0] for d in defers))
    max_k = int(max(d[0] for d in defers))
    caps = {
        "K": _next_pow2(max(1024, sum_k)),
        # the frontier widens well past the forest size as subtrees
        # branch (2a2b: F=159 but >1024 live segments mid-recursion)
        "SMAX": _next_pow2(max(2048, 8 * F)),
        "ACAP": max(8192, npad // 64),
        "CCAP": max(1024, npad // 256),
        # dense chain width: deferred roots hold <= defer_max
        # candidates; children occasionally widen past the parent
        "CW": _next_pow2(max(32, 2 * max_k)),
    }

    # text crosses as uint8 (widened on device, see run()); BWT
    # derived on device
    T_p = np.zeros(ntext, dtype=np.uint8)
    T_p[:n] = np.asarray(T, dtype=np.uint8)
    SA_p = np.full(npad, n - 1, dtype=np.int32)
    LCP_p = np.zeros(npad, dtype=np.int32)
    SEG_p = np.full(npad, -1, dtype=np.int32)
    off = 0
    for sid, (_k, _ab, _ae, _bb, _be, sa, lcp) in enumerate(defers):
        sn = len(sa)
        SA_p[off:off + sn] = sa
        LCP_p[off:off + sn] = lcp
        LCP_p[off] = 0  # first-slot LCP is per-segment 0 (split3)
        SEG_p[off:off + sn] = sid
        off += sn

    dispatches = 0
    for _attempt in range(5):
        if F > caps["SMAX"]:
            caps["SMAX"] = _next_pow2(F)
        seg_tab = np.zeros((caps["SMAX"], 8), dtype=np.int32)
        for sid, (_k, ab, ae, bb, be, _sa, _lcp) in enumerate(defers):
            seg_tab[sid] = (ab, ae, bb, be, -2 - sid, 0, -1, -1)
        fn = _build_kernel(
            npad, caps["K"], caps["SMAX"], caps["ACAP"], caps["CCAP"],
            ntext=ntext, chain_width=caps["CW"],
        )
        T_out, anchors, acount, abort, level, steps = fn(
            T_p, SA_p, LCP_p, SEG_p, seg_tab, np.int32(F),
            np.int32(nsep0), np.int32(minlength), np.int32(maxmums),
            np.int32(wscore), np.int32(wpen),
            np.int32(int(os.environ.get("REVEAL_TPU_DEVLOOP_DBG", "0"))),
        )
        dispatches += 1
        abort = int(abort)
        if abort in _RETRYABLE:
            cap = _RETRYABLE[abort]
            caps[cap] *= 2
            log.info(
                "device forest: %s overflow, retrying with %s=%d",
                cap, cap, caps[cap],
            )
            continue
        break

    acount = int(acount)
    steps = np.asarray(steps)
    LAST_STATS.clear()
    LAST_STATS.update(
        levels=int(level), dispatches=dispatches, anchors=acount,
        abort=abort, forest=F, slots=total,
        trim_steps=int(steps[0]), chain_steps=int(steps[1]),
        repair_steps=int(steps[2]),
    )
    if abort:
        log.info(
            "device forest aborted (code %d) — host fallback", abort
        )
        return None
    anchors = np.asarray(jax.device_get(anchors))[:acount].astype(
        np.int64
    )
    T_out = np.asarray(jax.device_get(T_out))[:n].astype(np.uint8)
    if acount == 0:
        return {}, T_out, 0
    orders = forest_pop_order(anchors[:, 7], anchors[:, 8])
    subtrees = {
        did: anchors[idx][:, [0, 1, 2, 3, 4, 5, 6]]
        for did, idx in orders.items()
    }
    log.debug(
        "device forest: %d anchors over %d roots in %d levels",
        acount, F, int(level),
    )
    return subtrees, T_out, int(level)


# ---------------------------------------------------------------------------
# Multi-genome forest kernel (VERDICT r5 item 2): the D-dimensional
# generalization of _build_kernel for the deferred-hybrid path.  Host
# runs the multi LIFO prefix (python worklist + native pick_multi,
# align/rem._rem_multi_hybrid) deferring every segment whose candidate
# count is <= defer_max; the whole residual forest then runs as ONE
# device dispatch here.  Reference semantics per level:
#   enumerate  getmultimums via windowed PSV/NSV (reveal.c:436-580;
#              width <= D so radius-D shifts are exact)
#   pick       graphmumpicker: all-live-sample filter, else segment()
#              subset (schemes.py:107-124,227-231), trim_overlap over
#              the subset dims (:161-191), sum-of-pairs chain DP
#              (:20-104), largest pick (:298-317)
#   split      leading/trailing for subset samples, parallel for the
#              rest (reveal.c:1005-1117,582-664), bubble repair per
#              matched begin ascending (reveal.c:666-727,1230-1251)
# Anchor records carry (l, w, parent, cls, pos_d, beg_d, end_d) for the
# host pop-order replay (push parallel/leading/trailing; LIFO).
# ---------------------------------------------------------------------------


def _build_kernel_multi(
    npad: int, K: int, SMAX: int, ACAP: int, CCAP: int, D: int,
    chain_width: int, ntext=None, minn: int = 2,
    sample_of_path=None,
):
    if ntext is None:
        ntext = npad
    CW = chain_width
    # D = number of PATH dims (one per contig-path); samples can own
    # several paths (multi-contig fasta).  Distinctness / subset keys
    # are SAMPLE-based (SO semantics); positions, intervals, trim,
    # chain, split and repair are PATH-based.  sample_of_path maps dim
    # -> sample id (identity when every sample is single-contig).
    sop = tuple(
        range(D) if sample_of_path is None else
        [int(x) for x in sample_of_path]
    )
    DS = max(sop) + 1
    key = ("multi", npad, K, SMAX, ACAP, CCAP, D, CW, ntext, minn, sop)
    fn = _kern_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp

    from ..core.encoding import N_BYTE, SENTINEL
    from ..core.jaxconfig import configure_jax

    configure_jax()

    i32 = jnp.int32
    NEG = jnp.int32(-(2**31) + 1)
    BIG = jnp.int32(2**31 - 1)
    NPAIR = D * (D - 1) // 2
    AREC = 5 + 3 * D  # [l, w, parent, cls, ordpack, pos.., beg.., end..]
    TW = 2 + 3 * D    # seg_tab: [parent, cls, beg.., end.., anc..]

    _use_pallas = False
    try:
        _use_pallas = (
            jax.default_backend() == "tpu"
            and not os.environ.get("REVEAL_TPU_NO_PALLAS_REPAIR")
        )
    except Exception:  # pragma: no cover
        pass

    def seg_min_scan(values, reset):
        def combine(x, y):
            m1, f1 = x
            m2, f2 = y
            return jnp.where(f2, m2, jnp.minimum(m1, m2)), f1 | f2

        m, _ = jax.lax.associative_scan(combine, (values, reset))
        return m

    def last_value_scan(values, flags):
        def combine(x, y):
            v1, f1 = x
            v2, f2 = y
            return jnp.where(f2, v2, v1), f1 | f2

        v, _ = jax.lax.associative_scan(combine, (values, flags))
        return v

    def last_value_scan_multi(cols, flags):
        """One packed last-value scan over a list of arrays."""
        def combine(x, y):
            f1 = x[-1]
            f2 = y[-1]
            out = tuple(
                jnp.where(f2, yv, xv) for xv, yv in zip(x[:-1], y[:-1])
            )
            return out + (f1 | f2,)

        res = jax.lax.associative_scan(combine, tuple(cols) + (flags,))
        return res[:-1]

    def sort_by(keys, vals):
        out = jax.lax.sort(tuple(keys) + tuple(vals), num_keys=len(keys))
        return out[len(keys):]

    def shift1(x, fill):
        return jnp.concatenate([jnp.full(1, fill, x.dtype), x[:-1]])

    def shiftk(x, k, fill):
        if k == 0:
            return x
        if k > 0:
            return jnp.concatenate(
                [jnp.full(k, fill, x.dtype), x[:-k]]
            )
        k = -k
        return jnp.concatenate([x[k:], jnp.full(k, fill, x.dtype)])

    # ---- trim_overlap, one dimension over the (K, D) position matrix
    # (schemes.py:161-191; all D coords shift by the trimmed overlap,
    # absent dims stay -1).  Segments whose subset lacks dim d are made
    # inert with spaced fake positions (no containment, no overlap).
    def trim_dim_multi(cseg, cl, cord, cw, cpm, P, j):
        iar = jnp.arange(K, dtype=i32)
        # the j-th WINDOW coordinate of each candidate (sample id from
        # ordpack nibble j); candidates with fewer than j+1 coords are
        # inert: pos = current rank with EFFECTIVE length 0 — strictly
        # ascending ends, so the containment filter keeps them and the
        # overlap trim never fires; order and real l pass through.
        sid_j = (cord >> (4 * j)) & 15
        posd = jnp.zeros(K, i32)
        for d in range(D):
            posd = jnp.where(sid_j == d, P[:, d], posd)
        has = (j < cw) & (posd >= 0)
        pos = jnp.where(has, posd, iar)
        leff = jnp.where(has, cl, 0)
        alive0 = cseg < BIG
        seg_s, l_s, le_s, pos_s, ord_s, w_s, pm_s, iar_s = sort_by(
            (cseg, jnp.where(alive0, pos, BIG), -cl, iar),
            (cseg, cl, leff, pos, cord, cw, cpm, iar),
        )
        alive = seg_s < BIG
        end = jnp.where(alive, pos_s + le_s, BIG)
        seg_prev = shift1(seg_s, -9)
        seg_next = jnp.concatenate(
            [seg_s[1:], jnp.full(1, -9, seg_s.dtype)]
        )
        first = seg_s != seg_prev
        last = seg_s != seg_next
        end_prev = shift1(end, 0)
        end_next = jnp.concatenate([end[1:], jnp.zeros(1, end.dtype)])
        last_end_rev = last_value_scan(
            jnp.flip(jnp.where(last, end, 0)), jnp.flip(last)
        )
        seg_last_end = jnp.flip(last_end_rev)
        keep_first = (~last & (end_next > end)) | (seg_last_end < end)
        keep = alive & jnp.where(
            first, keep_first | last, end_prev < end
        )
        seg_k = jnp.where(keep, seg_s, BIG)
        seg_c, l_c, le_c, pos_c, ord_c, w_c, pm_c, iar_c = sort_by(
            (seg_k, iar),
            (seg_k, l_s, le_s, pos_s, ord_s, w_s, pm_s, iar_s),
        )
        Pc = P[iar_c]
        alive = seg_c < BIG
        n_alive = jnp.sum(alive.astype(i32))
        first = (seg_c != shift1(seg_c, -9)) & alive

        pl = pos_c + le_c
        A30 = jnp.int32(2**30)
        T0 = jnp.where(first | ~alive, jnp.int32(-1), pl)
        Av = jnp.where(alive, pl, 0)
        Bv = jnp.where(first, pl, jnp.where(alive, pos_c, 0))
        Tx, Ax, Bx = shift1(T0, -1), shift1(Av, 0), shift1(Bv, 0)

        def comb_step(x, y):
            t1, a1, b1 = x
            t2, a2, b2 = y
            return (
                t1,
                jnp.where(a1 >= t2, b2, a2),
                jnp.where(b1 >= t2, b2, a2),
            )

        Tc, Ac, Bc = jax.lax.associative_scan(comb_step, (Tx, Ax, Bx))
        ce_in = jnp.where(0 >= Tc, Bc, Ac)
        ov = jnp.where(first, 0, ce_in - pos_c)
        hit = alive & ~first & (ov > 0)
        ovh = jnp.where(hit, ov, 0)
        li = l_c - ovh
        front = jnp.where(hit, ovh, 0)
        deep = hit & (li <= 0)
        a_r = jnp.where(deep, ovh, A30)
        b_r = jnp.where(
            alive, jnp.where(deep, 0, jnp.where(hit, li, l_c)), 0
        )
        ax, bx = shift1(a_r, A30), shift1(b_r, 0)

        def comb_cl(x, y):
            a1, b1 = x
            a2, b2 = y
            return jnp.minimum(a1 + a2, A30), jnp.maximum(b1 - a2, b2)

        ac, bc = jax.lax.associative_scan(comb_cl, (ax, bx))
        cl_in = jnp.maximum(-ac, bc)
        prev_alive = (cl_in - ovh) > 0
        reset = (~deep) | (deep & ~prev_alive)
        rval = jnp.where(~deep, jnp.arange(K, dtype=i32), jnp.int32(K))
        ci_in = last_value_scan(shift1(rval, K), shift1(reset, True))
        back = jnp.zeros(K + 1, i32)
        back = back.at[jnp.where(hit, ci_in, K)].add(ovh, mode="drop")
        back = back[:K]
        newl = l_c - front - back
        ok = (seg_c < BIG) & (newl > 0)
        seg_o = jnp.where(ok, seg_c, BIG)
        Pn = jnp.where(Pc >= 0, Pc + front[:, None], Pc)
        return seg_o, newl, ord_c, w_c, pm_c, Pn, n_alive

    @jax.jit
    def run(
        Tu8, SA, LCP, SOA0, SEG, seg_tab, live_key0, nseg0, minl,
        maxmums, ws, wp, dbg,
    ):
        """seg_tab: (SMAX, TW) int32; live_key0: (SMAX,) live-sample
        bitmask per root segment.  Roots carry parent = -2 - defer_id."""
        T = Tu8.astype(i32)
        BWT = T[jnp.maximum(SA - 1, 0)]
        SOA = SOA0.astype(i32)  # PATH id per slot (COA)
        sop_arr = np.asarray(sop, dtype=np.int32)

        def sample_of(pathids):
            out = jnp.zeros_like(pathids)
            for d in range(D):
                out = jnp.where(pathids == d, int(sop_arr[d]), out)
            return out

        anchors0 = jnp.zeros((ACAP + 1, AREC), i32)
        iar_n = jnp.arange(npad, dtype=i32)
        iar_k = jnp.arange(K, dtype=i32)
        sarange = jnp.arange(SMAX, dtype=i32)
        darange = jnp.arange(D, dtype=i32)

        def cond(st):
            nseg, abort, level = st[7], st[10], st[11]
            lcap = jnp.where(dbg >= 2, dbg - 2, jnp.int32(_LMAX))
            return (nseg > 0) & (abort == 0) & (level < lcap)

        def body(st):
            (T, SA, LCP, BWT, SOA, SEG, seg_tab, nseg, anchors,
             acount, abort, level, steps, live_key) = st

            # ---- enumerate multiMUMs (windowed PSV/NSV) ---------------
            l0 = LCP
            livep = SEG >= 0
            # nearest back/forward strictly-smaller LCP within D steps
            jb = jnp.full(npad, D + 1, i32)
            jf = jnp.full(npad, D + 1, i32)
            for k in range(1, D + 1):
                lb_k = shiftk(LCP, k, BIG)
                cond_b = (jb > D) & (lb_k < l0)
                jb = jnp.where(cond_b, k, jb)
                lf_k = shiftk(LCP, -k, jnp.int32(0))
                cond_f = (jf > D) & (lf_k < l0)
                jf = jnp.where(cond_f, k, jf)
            width = jb + jf
            have = (jb <= D) & (jf <= D)
            # dedup: no slot in (i-jb, i) with the same LCP value
            dup = jnp.zeros(npad, bool)
            for k in range(1, D):
                dup = dup | (
                    (k < jb) & (shiftk(LCP, k, BIG) == l0)
                )
            cand = (
                livep
                & (l0 >= jnp.maximum(minl, 1))
                & have
                & (width >= minn)
                & (width <= D)
                & ~dup
            )
            # distinct samples + left-maximality + per-sample positions
            # over the window [i-jb, i+jf-1]
            lmp = (
                (SA == 0)
                | (jnp.concatenate([SA[1:], jnp.zeros(1, i32)]) == 0)
                | (BWT != jnp.concatenate(
                    [BWT[1:], jnp.zeros(1, i32)]))
                | (BWT == N_BYTE)
                | (BWT == SENTINEL)
                | ((BWT >= ord("a")) & (BWT <= ord("z")))
            )
            keymask = jnp.zeros(npad, i32)   # SAMPLE bits
            pathmask = jnp.zeros(npad, i32)  # PATH bits
            ordp = jnp.zeros(npad, i32)      # PATH nibbles, window order
            anylm = jnp.zeros(npad, bool)
            SMPA = sample_of(SOA)
            for rel in range(-D, D):
                inwin = (rel >= -jb) & (rel <= jf - 1)
                co_r = shiftk(SOA, -rel, jnp.int32(0))
                sm_r = shiftk(SMPA, -rel, jnp.int32(0))
                keymask = jnp.where(
                    inwin, keymask | (1 << jnp.clip(sm_r, 0, 30)),
                    keymask,
                )
                pathmask = jnp.where(
                    inwin, pathmask | (1 << jnp.clip(co_r, 0, 30)),
                    pathmask,
                )
                jwin = jnp.clip(rel + jb, 0, 7)
                ordp = jnp.where(
                    inwin,
                    ordp
                    | jnp.left_shift(
                        jnp.clip(co_r, 0, 15), 4 * jwin
                    ),
                    ordp,
                )
                if rel < D - 1:
                    inpair = (rel >= -jb) & (rel <= jf - 2)
                    anylm = anylm | (
                        inpair & shiftk(lmp, -rel, False)
                    )
            pcnt = jnp.zeros(npad, i32)
            for d in range(DS):
                pcnt = pcnt + ((keymask >> d) & 1)
            cand = cand & (pcnt == width) & anylm
            ccount = jnp.sum(cand.astype(i32))
            abort = jnp.where(
                ccount > K, jnp.int32(ABORT_CAND_OVERFLOW), abort
            )
            rankm = jnp.cumsum(cand.astype(i32)) - 1
            sidx = jnp.where(cand, rankm, K + iar_n)
            slots = (
                jnp.full(K + npad, npad - 1, i32)
                .at[sidx].set(iar_n, mode="drop", unique_indices=True)
                [:K]
            )
            valid = iar_k < jnp.minimum(ccount, K)
            cseg = jnp.where(valid, SEG[slots], BIG)
            cl = jnp.where(valid, l0[slots], 0)
            cjb = jb[slots]
            cjf = jf[slots]
            cub = slots + cjf - 1
            ckey = jnp.where(valid, keymask[slots], 0)
            cpm = jnp.where(valid, pathmask[slots], 0)
            cord = jnp.where(valid, ordp[slots], 0)
            cw = jnp.where(valid, width[slots], 0)
            # per-sample positions
            P = jnp.full((K, D), -1, i32)
            for rel in range(-D, D):
                sl_r = jnp.clip(slots + rel, 0, npad - 1)
                inwin = valid & (rel >= -cjb) & (rel <= cjf - 1)
                so_r = SOA[sl_r]
                sa_r = SA[sl_r]
                oh = so_r[:, None] == darange[None, :]
                P = jnp.where(
                    (inwin[:, None] & oh), sa_r[:, None], P
                )
            # canonical candidate order: lexsort by (l, lb, ub) —
            # the repo's pinned multiMUM emission order
            # (esa_index.getmultimums_arrays / index.mums.multimums)
            clb = jnp.where(valid, slots - cjb, BIG)
            cseg, cl, clb2, cub2, ckey, cpm, cord, cw, ord0 = sort_by(
                (cseg, cl, clb, cub, iar_k),
                (cseg, cl, clb, cub, ckey, cpm, cord, cw, iar_k),
            )
            P = P[ord0]

            # maxmums: abort to host (rare)
            segc = jnp.clip(cseg, 0, SMAX - 1)
            percnt = jax.ops.segment_sum(
                (cseg < BIG).astype(i32), segc, num_segments=SMAX
            )
            abort = jnp.where(
                jnp.max(percnt) > maxmums, jnp.int32(ABORT_MAXMUMS),
                abort,
            )

            # ---- subset selection (graphmumpicker all-sample filter +
            # segment(), schemes.py:107-124,227-231) -------------------
            alive = cseg < BIG
            lcnt = jnp.zeros(SMAX, i32)
            for d in range(DS):
                lcnt = lcnt + ((live_key >> d) & 1)
            isfull = alive & (cw == lcnt[segc])
            anyfull = (
                jnp.zeros(SMAX, bool)
                .at[jnp.where(isfull, segc, SMAX - 1)]
                .max(isfull, mode="drop")
            )
            # segment(): per (seg, SAMPLE-key) sum of l + first index
            NK = 1 << DS
            gsum = jnp.zeros((SMAX, NK), i32).at[
                (segc, jnp.clip(ckey, 0, NK - 1))
            ].add(jnp.where(alive, cl, 0), mode="drop")
            gfirst = jnp.full((SMAX, NK), K, i32).at[
                (segc, jnp.clip(ckey, 0, NK - 1))
            ].min(jnp.where(alive, iar_k, K), mode="drop")
            kpop = jnp.zeros(NK, i32)
            for d in range(DS):
                kpop = kpop + ((jnp.arange(NK) >> d) & 1).astype(i32)
            z = gsum * kpop[None, :]
            zmax = jnp.max(z, axis=1)
            ztie = z == zmax[:, None]
            tfirst = jnp.where(ztie, gfirst, K)
            bestfirst = jnp.min(tfirst, axis=1)
            bestkey = jnp.argmax(
                ztie & (gfirst == bestfirst[:, None]), axis=1
            ).astype(i32)
            # keep: full candidates where anyfull, else best segment()
            keep = alive & jnp.where(
                anyfull[segc], isfull, ckey == bestkey[segc]
            )
            cseg = jnp.where(keep, cseg, BIG)

            # compact kept candidates (stable)
            cseg, cl, ckey, cpm, cord, cw, ord1 = sort_by(
                (cseg, iar_k), (cseg, cl, ckey, cpm, cord, cw, iar_k)
            )
            P = P[ord1]
            steps = steps.at[0].add(jnp.sum((cseg < BIG).astype(i32)))

            # ---- trim over the D dims (ascending sample id) -----------
            # trim coord axes are POSITIONAL (each mum's own
            # SA-window order, schemes.py:161-191 over the index-coord
            # tuples) — pass j trims the j-th window coordinate,
            # decoded per candidate from ordpack
            for j in range(D):
                cseg, cl, cord, cw, cpm, P, na = trim_dim_multi(
                    cseg, cl, cord, cw, cpm, P, j
                )
                steps = steps.at[0].add(na)

            # relmums same-keys subset (schemes.py:249 keys()==last's):
            # keep only candidates sharing the PATH set of the LAST
            # relmum in (n, l) ascending order (same n per segment ->
            # max l, ties resolved to the latest in trim order)
            alive_t = cseg < BIG
            iar_t = jnp.arange(K, dtype=i32)
            segc_t = jnp.clip(cseg, 0, SMAX - 1)
            maxl_t = (
                jnp.full(SMAX, -1, i32)
                .at[jnp.where(alive_t, segc_t, SMAX - 1)]
                .max(jnp.where(alive_t, cl, -1), mode="drop")
            )
            ismax_t = alive_t & (cl == maxl_t[segc_t])
            best_row = (
                jnp.full(SMAX, -1, i32)
                .at[jnp.where(ismax_t, segc_t, SMAX - 1)]
                .max(jnp.where(ismax_t, iar_t, -1), mode="drop")
            )
            segpkey = jnp.where(
                best_row >= 0, cpm[jnp.clip(best_row, 0, K - 1)], 0
            )
            keep2 = alive_t & (cpm == segpkey[segc_t])
            cseg = jnp.where(keep2, cseg, BIG)
            cseg, cl, cord, cw, ord3 = sort_by(
                (cseg, iar_t), (cseg, cl, cord, cw, iar_t)
            )
            P = P[ord3]
            # picked SAMPLE key per segment (split classification uses
            # path dims via s_P; segkey retained for bookkeeping)
            segkey = segpkey

            # ---- dense chain + pick ----------------------------------
            seg_live = sarange < nseg
            (picked, s_l, s_ord, s_P, abort,
             steps) = chain_dense_multi(
                cseg, cl, cord, P, seg_tab, seg_live, segkey, abort,
                steps, ws, wp,
            )

            # ---- anchors ---------------------------------------------
            s_w = jnp.zeros(SMAX, i32)
            for d in range(D):
                s_w = s_w + (s_P[:, d] >= 0).astype(i32)
            npicked = jnp.sum(picked.astype(i32))
            abort = jnp.where(
                acount + npicked > ACAP,
                jnp.int32(ABORT_ANCHOR_OVERFLOW), abort,
            )
            prank = jnp.cumsum(picked.astype(i32)) - 1
            lslot = jnp.where(
                picked, jnp.minimum(acount + prank, ACAP), ACAP
            )
            rows = jnp.concatenate(
                [
                    s_l[:, None], s_w[:, None],
                    seg_tab[:, 0:1], seg_tab[:, 1:2],
                    s_ord[:, None],
                    s_P,
                    seg_tab[:, 2:2 + D],
                    seg_tab[:, 2 + D:2 + 2 * D],
                ],
                axis=1,
            )
            anchors = anchors.at[lslot].set(
                jnp.where(picked[:, None], rows, anchors[lslot])
            )

            # ---- children --------------------------------------------
            pbeg = seg_tab[:, 2:2 + D]
            pend = seg_tab[:, 2 + D:2 + 2 * D]
            insub = s_P >= 0
            l_b = s_l[:, None]
            lead_iv_b = jnp.where(insub & (s_P > pbeg), pbeg, -1)
            lead_iv_e = jnp.where(insub & (s_P > pbeg), s_P, -1)
            trail_iv_b = jnp.where(
                insub & (s_P + l_b < pend), s_P + l_b, -1
            )
            trail_iv_e = jnp.where(
                insub & (s_P + l_b < pend), pend, -1
            )
            par_iv_b = jnp.where(~insub & (pbeg >= 0), pbeg, -1)
            par_iv_e = jnp.where(~insub & (pbeg >= 0), pend, -1)
            def _scount(ivb):
                k = jnp.zeros(SMAX, i32)
                for d in range(D):
                    k = k | jnp.where(
                        ivb[:, d] >= 0, 1 << int(sop_arr[d]), 0
                    )
                c = jnp.zeros(SMAX, i32)
                for s in range(DS):
                    c = c + ((k >> s) & 1)
                return c

            lead_live = picked & (_scount(lead_iv_b) >= 2)
            trail_live = picked & (_scount(trail_iv_b) >= 2)
            par_live = picked & (_scount(par_iv_b) >= 2)
            nl = jnp.cumsum(lead_live.astype(i32))
            nt = jnp.cumsum(trail_live.astype(i32))
            npr = jnp.cumsum(par_live.astype(i32))
            n_lead = nl[-1]
            n_trail = nt[-1]
            lead_id = jnp.where(lead_live, nl - 1, SMAX)
            trail_id = jnp.where(trail_live, n_lead + nt - 1, SMAX)
            par_id = jnp.where(
                par_live, n_lead + n_trail + npr - 1, SMAX
            )
            nseg_new = n_lead + n_trail + npr[-1]
            abort = jnp.where(
                nseg_new > SMAX, jnp.int32(ABORT_SEG_OVERFLOW), abort
            )
            lead_id = jnp.minimum(lead_id, SMAX)
            trail_id = jnp.minimum(trail_id, SMAX)
            par_id = jnp.minimum(par_id, SMAX)

            new_tab_w = jnp.zeros((SMAX + 1, TW), i32)
            anc_cols = jnp.where(insub, s_P, -1)
            lrow = jnp.concatenate(
                [
                    lslot[:, None], jnp.ones((SMAX, 1), i32),
                    lead_iv_b, lead_iv_e, anc_cols,
                ],
                axis=1,
            )
            trow = jnp.concatenate(
                [
                    lslot[:, None], jnp.full((SMAX, 1), 2, i32),
                    trail_iv_b, trail_iv_e,
                    jnp.full((SMAX, D), -1, i32),
                ],
                axis=1,
            )
            prow = jnp.concatenate(
                [
                    lslot[:, None], jnp.full((SMAX, 1), 4, i32),
                    par_iv_b, par_iv_e,
                    jnp.full((SMAX, D), -1, i32),
                ],
                axis=1,
            )
            new_tab_w = new_tab_w.at[lead_id].set(lrow, mode="drop")
            new_tab_w = new_tab_w.at[trail_id].set(trow, mode="drop")
            new_tab_w = new_tab_w.at[par_id].set(prow, mode="drop")
            new_tab = new_tab_w[:SMAX]
            new_live_key_w = jnp.zeros(SMAX + 1, i32)
            lead_key = jnp.zeros(SMAX, i32)
            trail_key = jnp.zeros(SMAX, i32)
            par_key = jnp.zeros(SMAX, i32)
            for d in range(D):
                sb = 1 << int(sop_arr[d])
                lead_key = lead_key | jnp.where(
                    lead_iv_b[:, d] >= 0, sb, 0
                )
                trail_key = trail_key | jnp.where(
                    trail_iv_b[:, d] >= 0, sb, 0
                )
                par_key = par_key | jnp.where(
                    par_iv_b[:, d] >= 0, sb, 0
                )
            new_live_key_w = new_live_key_w.at[lead_id].set(
                lead_key, mode="drop"
            )
            new_live_key_w = new_live_key_w.at[trail_id].set(
                trail_key, mode="drop"
            )
            new_live_key_w = new_live_key_w.at[par_id].set(
                par_key, mode="drop"
            )
            new_live_key = new_live_key_w[:SMAX]

            # ---- classify + split + lowercase -------------------------
            # per-slot views of per-segment values as ONE packed
            # (SMAX, C) table-row gather by SEG (see the pairwise
            # kernel note)
            seg_safe = jnp.clip(SEG, 0, SMAX - 1)
            pos = SA
            sca = [picked.astype(i32), s_l, lead_id, trail_id, par_id]
            anc_list = [s_P[:, d] for d in range(D)]
            beg_list = [seg_tab[:, 2 + d] for d in range(D)]
            end_list = [seg_tab[:, 2 + D + d] for d in range(D)]
            btab = jnp.stack(
                sca + anc_list + beg_list + end_list, axis=1
            )
            browsx = btab[seg_safe]
            bl = [browsx[:, c] for c in range(btab.shape[1])]
            pickedb = bl[0] > 0
            pl = bl[1]
            b_lid = bl[2]
            b_tid = bl[3]
            b_pid = bl[4]
            ancs = bl[5:5 + D]
            begs_b = bl[5 + D:5 + 2 * D]
            ends_b = bl[5 + 2 * D:5 + 3 * D]
            # per-slot own-dim anchor + interval bounds (slots outside
            # their sample's live interval — sentinels — get no class
            # and die, like the reference's D==0 drop, reveal.c:1117)
            anc_own = jnp.full(npad, -1, i32)
            beg_own = jnp.full(npad, -1, i32)
            end_own = jnp.full(npad, -1, i32)
            for d in range(D):
                sel = SOA == d
                anc_own = jnp.where(sel, ancs[d], anc_own)
                beg_own = jnp.where(sel, begs_b[d], beg_own)
                end_own = jnp.where(sel, ends_b[d], end_own)
            live_parent = (SEG >= 0) & pickedb
            inown = (
                (beg_own >= 0) & (pos >= beg_own) & (pos < end_own)
            )
            has_anchor = (anc_own >= 0) & inown
            in_lead = has_anchor & (pos < anc_own)
            in_trail = has_anchor & (pos >= anc_own + pl)
            in_match = has_anchor & ~in_lead & ~in_trail
            in_par = ~(anc_own >= 0) & inown
            nsg = jnp.full(npad, -1, i32)
            nsg = jnp.where(
                live_parent & in_lead & (b_lid < SMAX),
                jnp.minimum(b_lid, SMAX - 1), nsg,
            )
            nsg = jnp.where(
                live_parent & in_trail & (b_tid < SMAX),
                jnp.minimum(b_tid, SMAX - 1), nsg,
            )
            nsg = jnp.where(
                live_parent & in_par & (b_pid < SMAX),
                jnp.minimum(b_pid, SMAX - 1), nsg,
            )
            cls = jnp.where(live_parent & in_lead, 1, 0)
            cls = jnp.where(live_parent & in_trail, 2, cls)
            cls = jnp.where(live_parent & in_par, 4, cls)
            cls = jnp.where(nsg < 0, 0, cls)

            cls_prev = shift1(cls, 0)
            reset1 = segstart | ((cls_prev == 1) & ~segstart)
            reset2 = segstart | ((cls_prev == 2) & ~segstart)
            reset4 = segstart | ((cls_prev == 4) & ~segstart)

            def comb_min3(x, y):
                m1, f1, m2, f2, m3, f3 = x
                n1, g1, n2, g2, n3, g3 = y
                return (
                    jnp.where(g1, n1, jnp.minimum(m1, n1)), f1 | g1,
                    jnp.where(g2, n2, jnp.minimum(m2, n2)), f2 | g2,
                    jnp.where(g3, n3, jnp.minimum(m3, n3)), f3 | g3,
                )

            mm1, _, mm2, _, mm4, _ = jax.lax.associative_scan(
                comb_min3,
                (LCP, reset1, LCP, reset2, LCP, reset4),
            )
            newlcp = jnp.where(
                cls == 1, mm1,
                jnp.where(cls == 2, mm2, jnp.where(cls == 4, mm4, 0)),
            )

            # ---- 3-way stable partition ------------------------------
            ld = (nsg >= 0) & (cls == 1)
            tr = (nsg >= 0) & (cls == 2)
            pr = (nsg >= 0) & (cls == 4)
            ldi = ld.astype(i32)
            tri = tr.astype(i32)
            pri = pr.astype(i32)
            egl = jnp.cumsum(ldi) - ldi
            egt = jnp.cumsum(tri) - tri
            egp = jnp.cumsum(pri) - pri
            nlead_tot = egl[-1] + ldi[-1]
            ntrail_tot = egt[-1] + tri[-1]
            newpos = jnp.where(
                ld, egl,
                jnp.where(
                    tr, nlead_tot + egt,
                    jnp.where(
                        pr, nlead_tot + ntrail_tot + egp,
                        jnp.int32(npad),
                    ),
                ),
            )
            # lowercase BWT entries whose text pos-1 is in this level's
            # matched regions of the slot's own parent
            pm1 = pos - 1
            bwt_m = jnp.zeros(npad, bool)
            for d in range(D):
                bwt_m = bwt_m | (
                    (ancs[d] >= 0) & (pm1 >= ancs[d])
                    & (pm1 < ancs[d] + pl)
                )
            bwt_up = (BWT >= ord("A")) & (BWT <= ord("Z"))
            BWT = jnp.where(
                live_parent & bwt_m & bwt_up, BWT + 32, BWT
            )
            # one inverse-permutation scatter + one packed gather (see
            # the pairwise kernel partition note)
            invp = jnp.full(npad, npad, i32).at[newpos].set(
                iar_n, mode="drop", unique_indices=True
            )
            pvalid = invp < npad
            invc = jnp.minimum(invp, npad - 1)
            packed = jnp.stack(
                [BWT, SA, SOA, newlcp, jnp.clip(nsg, 0, SMAX)],
                axis=1,
            )
            rows2 = packed[invc]
            BWT2 = jnp.where(pvalid, rows2[:, 0], 0)
            SA2 = jnp.where(pvalid, rows2[:, 1], 0)
            SOA2 = jnp.where(pvalid, rows2[:, 2], 0)
            lcp_p = jnp.where(pvalid, rows2[:, 3], 0)
            segk = jnp.where(pvalid, rows2[:, 4], SMAX)
            SEG2 = jnp.where(segk >= SMAX, jnp.int32(-1), segk)
            sprev = shift1(SEG2, -9)
            firstslot = SEG2 != sprev
            LCP2 = jnp.where(firstslot | (SEG2 < 0), 0, lcp_p)

            # lowercase matched text
            in_match_l = live_parent & in_match
            upmask = jnp.zeros(ntext, dtype=bool)
            upmask = upmask.at[
                jnp.where(in_match_l, pos, ntext)
            ].set(True, mode="drop", unique_indices=True)
            isup = (T >= ord("A")) & (T <= ord("Z"))
            T2 = jnp.where(upmask & isup, T + 32, T)

            # ---- boundary repair: one pass per sample dim (matched
            # begins ascend with sample id — sample texts are ordered)
            SA3, LCP3, BWT3, SOA3 = SA2, LCP2, BWT2, SOA2
            seg2_safe = jnp.clip(SEG2, 0, SMAX - 1)
            btab2 = jnp.stack(
                [new_tab[:, 1]]
                + [new_tab[:, 2 + 2 * D + d] for d in range(D)],
                axis=1,
            )
            brows2 = btab2[seg2_safe]
            bl2 = [brows2[:, c] for c in range(btab2.shape[1])]
            is_lead_b = (SEG2 >= 0) & (bl2[0] == 1)
            beg_ds = bl2[1:]

            for d in range(D):
                beg = jnp.where(is_lead_b, beg_ds[d], -1)
                (SA3, LCP3, BWT3, SOA3, abort,
                 steps) = repair_pass_multi(
                    SEG2, SA3, LCP3, BWT3, SOA3, beg, abort, steps,
                    dbg,
                )

            acount = jnp.minimum(acount + npicked, ACAP)
            return (
                T2, SA3, LCP3, BWT3, SOA3, SEG2, new_tab, nseg_new,
                anchors, acount, abort, level + 1, steps,
                new_live_key,
            )

        st = jax.lax.while_loop(
            cond,
            body,
            (
                T, SA, LCP, BWT, SOA, SEG, seg_tab, jnp.int32(nseg0),
                anchors0, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.zeros(3, i32), live_key0,
            ),
        )
        (T, SA, LCP, BWT, SOA, SEG, seg_tab, nseg, anchors, acount,
         abort, level, steps, live_key) = st
        abort = jnp.where(
            (abort == 0) & (level >= _LMAX),
            jnp.int32(ABORT_LEVEL_OVERFLOW), abort,
        )
        # trailing state outputs are debug-only; callers that never
        # device_get them pay no transfer
        return (
            T.astype(jnp.uint8), anchors, acount, abort, level, steps,
            SA, LCP, SEG, SOA, BWT,
        )

    # ------------------------------------------------------------------
    # dense (SMAX, CW+1) chain for D dims (schemes.py:20-104 semantics,
    # sum-of-pairs gapcost over the segment's subset dims)
    # ------------------------------------------------------------------
    def chain_dense_multi(cseg, cl, cord, P, seg_tab, seg_live,
                          segkey, abort, steps, ws, wp):
        CW1 = CW + 1
        iar = jnp.arange(K, dtype=i32)
        cols = jnp.arange(CW1, dtype=i32)
        darange = jnp.arange(D, dtype=i32)

        # ref axis = lowest set bit of the subset key (first key of
        # mum[2], schemes.py:27 — coords sorted by sample id)
        refdim = jnp.full(SMAX, 0, i32)
        found = jnp.zeros(SMAX, bool)
        for d in range(D):
            bit = ((segkey >> d) & 1) > 0
            refdim = jnp.where(~found & bit, d, refdim)
            found = found | bit
        segc = jnp.clip(cseg, 0, SMAX - 1)
        refpos = jnp.zeros(K, i32)
        for d in range(D):
            refpos = jnp.where(
                refdim[segc] == d, P[:, d], refpos
            )
        alive0 = cseg < BIG
        cseg, cl, cord, ord2 = sort_by(
            (cseg, jnp.where(alive0, refpos, BIG), iar),
            (cseg, cl, cord, iar),
        )
        P = P[ord2]
        segc = jnp.clip(cseg, 0, SMAX - 1)
        refpos = jnp.zeros(K, i32)
        for d in range(D):
            refpos = jnp.where(refdim[segc] == d, P[:, d], refpos)
        alive = cseg < BIG
        dup = (
            (cseg[1:] == cseg[:-1]) & (refpos[1:] == refpos[:-1])
            & (cseg[1:] < BIG)
        )
        abort = jnp.where(
            jnp.any(dup), jnp.int32(ABORT_DUP_REF), abort
        )
        first = (cseg != shift1(cseg, -9)) & alive
        firstpos = last_value_scan(jnp.where(first, iar, 0), first)
        rank = jnp.where(alive, iar - firstpos, 0)
        abort = jnp.where(
            jnp.any(alive & (rank >= CW)),
            jnp.int32(ABORT_SEG_WIDTH), abort,
        )
        didx = jnp.where(
            alive, segc * CW1 + jnp.minimum(rank, CW - 1),
            SMAX * CW1 + iar,
        )

        def scat(v):
            return (
                jnp.zeros(SMAX * CW1 + K, i32)
                .at[didx].set(v, unique_indices=True)[: SMAX * CW1]
                .reshape(SMAX, CW1)
            )

        dL = scat(cl)
        dOrd = scat(cord)
        dal = scat(alive.astype(i32))
        dPs = [scat(P[:, d]) for d in range(D)]
        # pseudo column CW: right boundary (end per dim); left pseudo
        # values come from seg_tab begins
        pbeg = seg_tab[:, 2:2 + D]
        pend = seg_tab[:, 2 + D:2 + 2 * D]
        haveD = jnp.zeros((SMAX, D), bool)
        for d in range(D):
            haveD = haveD.at[:, d].set(((segkey >> d) & 1) > 0)
        haveD = haveD & (pbeg >= 0)
        dPs = [
            dPs[d].at[:, CW].set(jnp.where(haveD[:, d], pend[:, d], 0))
            for d in range(D)
        ]
        dal = dal.at[:, CW].set(seg_live.astype(i32))
        dalb = dal > 0
        # per-dim start/end with absent dims as 0 (compat-neutral)
        dS = [
            jnp.where(
                dalb & haveD[:, None, d], dPs[d], 0
            )
            for d in range(D)
        ]
        dE = [
            jnp.where(
                dalb & haveD[:, None, d],
                dPs[d] + jnp.where(cols[None, :] < CW, dL, 0), 0,
            )
            for d in range(D)
        ]
        candb = dalb & (cols[None, :] < CW)
        candcnt = jnp.sum(candb.astype(i32), axis=1)
        # pairs count per segment: C(w, 2)
        wseg = jnp.sum(haveD.astype(i32), axis=1)
        cpair = (wseg * (wseg - 1)) // 2
        dmul = ws * dL * cpair[:, None]

        # left-pseudo link weight
        penl = None
        for a in range(D):
            for b in range(a + 1, D):
                hb = haveD[:, a] & haveD[:, b]
                da = dS[a] - (pbeg[:, a][:, None] - 1)
                db_ = dS[b] - (pbeg[:, b][:, None] - 1)
                t = jnp.where(
                    hb[:, None], jnp.abs(da - db_), 0
                )
                penl = t if penl is None else penl + t
        if penl is None:
            penl = jnp.zeros((SMAX, CW1), i32)
        dwl = jnp.where(dalb, dmul - wp * penl, NEG)

        # act: min dominating column
        CB = 16
        act_parts = []
        for c0 in range(0, CW1, CB):
            ce = min(c0 + CB, CW1)
            dom = dalb[:, None, :]
            for d in range(D):
                dom = dom & (
                    dS[d][:, c0:ce, None] >= dE[d][:, None, :]
                )
            act_parts.append(
                jnp.min(
                    jnp.where(dom, cols[None, None, :], BIG), axis=2
                )
            )
        dact = jnp.concatenate(act_parts, axis=1)

        maxcnt = jnp.max(jnp.where(seg_live, candcnt, 0))

        def col_body(st):
            score, j = st
            s_j = [
                jax.lax.dynamic_index_in_dim(
                    dS[d], j, axis=1, keepdims=False
                )
                for d in range(D)
            ]
            l_j = jax.lax.dynamic_index_in_dim(
                dL, j, axis=1, keepdims=False
            )
            wl_j = jax.lax.dynamic_index_in_dim(
                dwl, j, axis=1, keepdims=False
            )
            al_j = jax.lax.dynamic_index_in_dim(
                dalb, j, axis=1, keepdims=False
            )
            compat = dalb & (cols[None, :] < j)
            for d in range(D):
                compat = compat & (dE[d] <= s_j[d][:, None])
            pen = None
            for a in range(D):
                for b in range(a + 1, D):
                    hb = haveD[:, a] & haveD[:, b]
                    da = s_j[a][:, None] - dE[a]
                    db_ = s_j[b][:, None] - dE[b]
                    t = jnp.where(hb[:, None], jnp.abs(da - db_), 0)
                    pen = t if pen is None else pen + t
            if pen is None:
                pen = 0
            mul_j = ws * l_j * cpair
            tw = jnp.where(compat, score - wp * pen, NEG)
            mx = jnp.max(tw, axis=1)
            sc_new = jnp.maximum(
                wl_j,
                jnp.where(mx > NEG // 2, mx + mul_j, NEG),
            )
            sc_new = jnp.where(al_j, sc_new, NEG)
            score = jax.lax.dynamic_update_index_in_dim(
                score, sc_new, j, axis=1
            )
            return score, j + 1

        score, rounds = jax.lax.while_loop(
            lambda st: st[1] < maxcnt,
            col_body,
            (jnp.full((SMAX, CW1), NEG, i32), jnp.int32(0)),
        )
        steps = steps.at[1].add(rounds)

        # links
        link_parts = []
        for c0 in range(0, CW1, CB):
            ce = min(c0 + CB, CW1)
            compat = dalb[:, None, :] & (
                cols[None, None, :] < cols[None, c0:ce, None]
            )
            for d in range(D):
                compat = compat & (
                    dE[d][:, None, :] <= dS[d][:, c0:ce, None]
                )
            pen = None
            for a in range(D):
                for b in range(a + 1, D):
                    hb = haveD[:, a] & haveD[:, b]
                    da = dS[a][:, c0:ce, None] - dE[a][:, None, :]
                    db_ = dS[b][:, c0:ce, None] - dE[b][:, None, :]
                    t = jnp.where(
                        hb[:, None, None], jnp.abs(da - db_), 0
                    )
                    pen = t if pen is None else pen + t
            if pen is None:
                pen = 0
            tw = jnp.where(
                compat, score[:, None, :] - wp * pen, NEG
            )
            mx = jnp.max(tw, axis=2)
            t1 = tw == mx[:, :, None]
            sc2 = jnp.where(t1, score[:, None, :], NEG)
            mx2 = jnp.max(sc2, axis=2)
            t2 = t1 & (sc2 == mx2[:, :, None])
            a3 = jnp.where(t2, dact[:, None, :], BIG)
            amn = jnp.min(a3, axis=2)
            t3 = t2 & (a3 == amn[:, :, None])
            brow = jnp.argmax(t3, axis=2).astype(i32)
            has = mx > NEG
            wl_b = dwl[:, c0:ce]
            mxg = mx + dmul[:, c0:ce]
            use_left = (
                (~has) | (wl_b > mxg) | ((wl_b == mxg) & (mx2 <= 0))
            )
            link_parts.append(
                jnp.where(use_left, jnp.int32(-1), brow)
            )
        dlink = jnp.concatenate(link_parts, axis=1)
        dlink = jnp.where(dalb, dlink, jnp.int32(-2))

        def pad(x, fill):
            return jnp.concatenate(
                [x, jnp.full((SMAX, 1), fill, i32)], axis=1
            )

        nxt = pad(jnp.where(dlink >= 0, dlink, jnp.int32(CW1)), CW1)
        bl = pad(jnp.where(candb, dL, -1), -1)
        bs = pad(
            jnp.broadcast_to(cols[None, :], (SMAX, CW1)).astype(i32),
            -1,
        )
        cols2 = jnp.arange(CW1 + 1, dtype=i32)

        def gsel(x, idx):
            oh = idx[:, :, None] == cols2[None, None, :]
            return jnp.sum(jnp.where(oh, x[:, None, :], 0), axis=2)

        def dbl_body(c):
            bl, bs, nxt = c
            bl2 = gsel(bl, nxt)
            bs2 = gsel(bs, nxt)
            take_far = bl2 > bl
            bl = jnp.where(take_far, bl2, bl)
            bs = jnp.where(take_far, bs2, bs)
            return bl, bs, gsel(nxt, nxt)

        bl, bs, nxt = jax.lax.while_loop(
            lambda c: jnp.any(c[2][:, :CW1] != CW1),
            dbl_body,
            (bl, bs, nxt),
        )
        ptr0 = jnp.where(seg_live, dlink[:, CW], jnp.int32(-1))
        ptr0c = jnp.clip(ptr0, 0, CW1)[:, None]
        blp = jnp.where(ptr0 >= 0, gsel(bl, ptr0c)[:, 0], -1)
        bsp = jnp.where(
            (ptr0 >= 0) & (blp > -1), gsel(bs, ptr0c)[:, 0], -1
        )
        bs_seg = bsp
        single = seg_live & (candcnt == 1)
        bs_seg = jnp.where(single, 0, bs_seg)
        picked = seg_live & (bs_seg >= 0)
        bsc = jnp.clip(bs_seg, 0, CW1 - 1)[:, None]
        ohp = bsc[:, :, None] == cols[None, None, :]

        def psel(x):
            return jnp.sum(
                jnp.where(ohp, x[:, None, :], 0), axis=2
            )[:, 0]

        s_l = jnp.where(picked, psel(dL), 0)
        s_ord = jnp.where(picked, psel(dOrd), 0)
        s_P = jnp.stack(
            [
                jnp.where(
                    picked & haveD[:, d], psel(dPs[d]), -1
                )
                for d in range(D)
            ],
            axis=1,
        )
        return picked, s_l, s_ord, s_P, abort, steps

    # ------------------------------------------------------------------
    # repair pass (multi-accept + pallas resolve, same as the pairwise
    # kernel's repair_pass but taking a precomputed per-slot beg array)
    # ------------------------------------------------------------------
    WREP = min(_WREP, npad - 2)

    def repair_pass_multi(SEG_, SA, LCP, BWT, SOA, beg, abort, steps,
                          dbg):
        import jax.numpy as jnp

        iar_n = jnp.arange(npad, dtype=i32)
        lcpn = jnp.concatenate([LCP[1:], jnp.zeros(1, LCP.dtype)])
        cross0 = (beg >= 0) & (SA < beg) & (
            ((SA + LCP) > beg) | ((SA + lcpn) > beg)
        )
        rc = jnp.sum(cross0.astype(i32))
        abort = jnp.where(
            rc > CCAP, jnp.int32(ABORT_REPAIR_OVERFLOW), abort
        )
        rankc = jnp.cumsum(cross0.astype(i32)) - 1
        cq = (
            jnp.full(CCAP + npad, npad - 1, i32)
            .at[jnp.where(cross0, rankc, CCAP + iar_n)]
            .set(iar_n, mode="drop", unique_indices=True)[:CCAP]
        )
        centry_next = lcpn[cq]
        iar_c = jnp.arange(CCAP, dtype=i32)
        pend0 = iar_c < jnp.minimum(rc, CCAP)
        warr = jnp.arange(WREP + 2, dtype=i32)
        RBV = min(CCAP, 1024)
        offs1 = jnp.arange(1, _WRV + 1, dtype=i32)
        _winresolve = (
            _make_window_resolve(_WRV, RBV, npad)
            if _use_pallas and RBV % 8 == 0 and npad % 128 == 0
            else None
        )

        def resolve(SA_, LCP_, j):
            q = cq[j]
            b = beg[q]
            saq = SA_[q]
            lcq = LCP_[q]
            thr = b - saq
            move = (saq < b) & (saq + lcq > b)
            s0 = jnp.maximum(q - WREP, 0)
            win = jax.lax.dynamic_slice(LCP_, (s0,), (WREP + 2,))
            widx = s0 + warr
            cand = (widx < q) & (win < thr)
            y = jnp.max(jnp.where(cand, widx, -1))
            found = (y >= 0) | (s0 == 0)

            def deep(_):
                allc = (iar_n < q) & (LCP_ < thr)
                return jnp.max(jnp.where(allc, iar_n, -1))

            y = jax.lax.cond(move & ~found, deep, lambda _: y, None)
            x = jnp.maximum(y, 0)
            return q, x, move, thr, saq, lcq

        def apply_one(SA_, LCP_, BWT_, SOA_, q, x, move, thr, saq,
                      lcq, bwq, soq, cj, acc):
            do_mv = acc & move
            shallow = (q - x) <= WREP

            def apply_win(args):
                SA_, LCP_, BWT_, SOA_ = args
                s0 = jnp.maximum(q - (WREP + 1), 0)
                sa_w = jax.lax.dynamic_slice(SA_, (s0,), (WREP + 2,))
                lcp_w = jax.lax.dynamic_slice(
                    LCP_, (s0,), (WREP + 2,)
                )
                bw_w = jax.lax.dynamic_slice(
                    BWT_, (s0,), (WREP + 2,)
                )
                so_w = jax.lax.dynamic_slice(
                    SOA_, (s0,), (WREP + 2,)
                )
                widx = s0 + warr
                inwin = (widx > x) & (widx <= q)
                sa_sh = jnp.concatenate([sa_w[:1], sa_w[:-1]])
                lcp_sh = jnp.concatenate([lcp_w[:1], lcp_w[:-1]])
                bw_sh = jnp.concatenate([bw_w[:1], bw_w[:-1]])
                so_sh = jnp.concatenate([so_w[:1], so_w[:-1]])
                sa_n = jnp.where(inwin, sa_sh, sa_w)
                lcp_n = jnp.where(inwin, lcp_sh, lcp_w)
                bw_n = jnp.where(inwin, bw_sh, bw_w)
                so_n = jnp.where(inwin, so_sh, so_w)
                sa_n = jnp.where(widx == x, saq, sa_n)
                lcp_n = jnp.where(widx == x + 1, thr, lcp_n)
                bw_n = jnp.where(widx == x, bwq, bw_n)
                so_n = jnp.where(widx == x, soq, so_n)
                SA_ = jax.lax.dynamic_update_slice(SA_, sa_n, (s0,))
                LCP_ = jax.lax.dynamic_update_slice(
                    LCP_, lcp_n, (s0,)
                )
                BWT_ = jax.lax.dynamic_update_slice(
                    BWT_, bw_n, (s0,)
                )
                SOA_ = jax.lax.dynamic_update_slice(
                    SOA_, so_n, (s0,)
                )
                return SA_, LCP_, BWT_, SOA_

            def apply_glob(args):
                SA_, LCP_, BWT_, SOA_ = args
                inwin = (iar_n > x) & (iar_n <= q)
                SA_n = jnp.where(inwin, jnp.roll(SA_, 1), SA_)
                LCP_n = jnp.where(inwin, jnp.roll(LCP_, 1), LCP_)
                BWT_n = jnp.where(inwin, jnp.roll(BWT_, 1), BWT_)
                SO_n = jnp.where(inwin, jnp.roll(SOA_, 1), SOA_)
                SA_n = SA_n.at[x].set(saq)
                LCP_n = LCP_n.at[x + 1].set(thr)
                BWT_n = BWT_n.at[x].set(bwq)
                SO_n = SO_n.at[x].set(soq)
                return SA_n, LCP_n, BWT_n, SO_n

            SA_, LCP_, BWT_, SOA_ = jax.lax.cond(
                do_mv,
                lambda args: jax.lax.cond(
                    shallow, apply_win, apply_glob, args
                ),
                lambda args: args,
                (SA_, LCP_, BWT_, SOA_),
            )
            qn = jnp.minimum(q + 1, npad - 1)
            mv_upd = do_mv & (q < npad - 1) & (lcq < LCP_[qn])
            lcponly = acc & ~move & (q < npad - 1) & (
                (saq < beg[q])
                & ((saq + centry_next[cj]) > beg[q])
                & (LCP_[qn] > LCP_[q])
            )
            newv = jnp.where(
                mv_upd, lcq,
                jnp.where(lcponly, beg[q] - saq, LCP_[qn]),
            )
            LCP_ = LCP_.at[qn].set(newv)
            return SA_, LCP_, BWT_, SOA_

        def rbody(c):
            SA_, LCP_, BWT_, SOA_, pend, it = c
            npend = jnp.sum(pend.astype(i32))
            (heads,) = jnp.nonzero(pend, size=RBV, fill_value=CCAP - 1)
            iar_r = jnp.arange(RBV, dtype=i32)
            hvalid = iar_r < npend
            q = cq[heads]
            b = beg[q]
            saq = SA_[q]
            lcq = LCP_[q]
            thr = b - saq
            move = (saq < b) & (saq + lcq > b)
            if _winresolve is not None:
                y = _winresolve(LCP_, q, thr)
            else:
                widx = q[:, None] - offs1[None, :]
                lcpw = LCP_[jnp.maximum(widx, 0)]
                candw = (widx >= 0) & (lcpw < thr[:, None])
                y = jnp.max(jnp.where(candw, widx, -1), axis=1)
            resolved = (y >= 0) | (q - _WRV <= 0)
            x = jnp.maximum(y, 0)
            ok = ~move | resolved
            sid = jnp.clip(SEG_[q], 0, SMAX - 1)
            prev_same = (
                (iar_r > 0)
                & (sid == jnp.roll(sid, 1))
                & hvalid
                & jnp.roll(hvalid, 1)
            )
            q_prev = jnp.where(
                prev_same, jnp.roll(q, 1), jnp.int32(-2)
            )
            region_lo = jnp.where(move, x, q)
            acc = hvalid & ok & (region_lo > q_prev + 1)
            nacc = jnp.sum(acc.astype(i32))
            fillu = jnp.int32(npad) + iar_r

            def vec_branch(args):
                SA_, LCP_, BWT_, SOA_, pend = args
                accm = acc & move
                xs = jnp.where(accm, x, fillu)
                d = jnp.zeros(npad, i32)
                d = d.at[jnp.where(accm, x + 1, fillu)].add(
                    1, mode="drop", unique_indices=True
                )
                d = d.at[jnp.where(accm, q + 1, fillu)].add(
                    -1, mode="drop", unique_indices=True
                )
                inrot = jnp.cumsum(d) > 0
                SA2 = jnp.where(inrot, shift1(SA_, 0), SA_)
                BWT2 = jnp.where(inrot, shift1(BWT_, 0), BWT_)
                SO2 = jnp.where(inrot, shift1(SOA_, 0), SOA_)
                LCP2 = jnp.where(inrot, shift1(LCP_, 0), LCP_)
                SA2 = SA2.at[xs].set(
                    saq, mode="drop", unique_indices=True
                )
                BWT2 = BWT2.at[xs].set(
                    BWT_[q], mode="drop", unique_indices=True
                )
                SO2 = SO2.at[xs].set(
                    SOA_[q], mode="drop", unique_indices=True
                )
                LCP2 = LCP2.at[
                    jnp.where(accm, x + 1, fillu)
                ].set(thr, mode="drop", unique_indices=True)
                qn = jnp.minimum(q + 1, npad - 1)
                lcp_qn = LCP_[qn]
                mv_upd = accm & (q < npad - 1) & (lcq < lcp_qn)
                lcponly = (
                    acc & ~move & (q < npad - 1)
                    & (saq < b)
                    & ((saq + centry_next[heads]) > b)
                    & (lcp_qn > lcq)
                )
                newv = jnp.where(
                    mv_upd, lcq,
                    jnp.where(lcponly, b - saq, lcp_qn),
                )
                wr = mv_upd | lcponly
                LCP2 = LCP2.at[jnp.where(wr, qn, fillu)].set(
                    newv, mode="drop", unique_indices=True
                )
                pend2 = pend.at[
                    jnp.where(acc, heads, CCAP + iar_r)
                ].set(False, mode="drop", unique_indices=True)
                return SA2, LCP2, BWT2, SO2, pend2

            def seq_branch(args):
                SA_, LCP_, BWT_, SOA_, pend = args
                j = heads[0]
                q1, x1, mv1, thr1, saq1, lcq1 = resolve(SA_, LCP_, j)
                bwq1 = BWT_[q1]
                soq1 = SOA_[q1]
                SA2, LCP2, BWT2, SO2 = apply_one(
                    SA_, LCP_, BWT_, SOA_, q1, x1, mv1, thr1, saq1,
                    lcq1, bwq1, soq1, j, hvalid[0],
                )
                pend2 = pend.at[j].set(False)
                return SA2, LCP2, BWT2, SO2, pend2

            SA_, LCP_, BWT_, SOA_, pend = jax.lax.cond(
                nacc > 0, vec_branch, seq_branch,
                (SA_, LCP_, BWT_, SOA_, pend),
            )
            return SA_, LCP_, BWT_, SOA_, pend, it + 1

        def rcond(c):
            pend, it = c[4], c[5]
            return jnp.any(pend) & (it < CCAP) & (dbg != 1)

        SA, LCP, BWT, SOA, _, iters = jax.lax.while_loop(
            rcond, rbody, (SA, LCP, BWT, SOA, pend0, jnp.int32(0))
        )
        steps = steps.at[2].add(iters)
        return SA, LCP, BWT, SOA, abort, steps

    _kern_cache[key] = run
    return run


def forest_pop_order_multi(parents: np.ndarray, cls: np.ndarray):
    """Serial LIFO pop order for multi anchors: push order parallel/
    leading/trailing per step (reveal.c:1295-1324) with pop from the
    end => preorder walk with child order trailing, leading, parallel.
    Roots carry parent < 0 (-1 full-root, -2-did deferred forest);
    returns {root_key: order array} with root_key = -1 or defer id."""
    A = len(parents)
    lead = np.full(A, -1, np.int64)
    trail = np.full(A, -1, np.int64)
    par = np.full(A, -1, np.int64)
    roots = {}
    for i in range(A):
        p, c = int(parents[i]), int(cls[i])
        if p < 0:
            roots[-1 if p == -1 else -2 - p] = i
        elif c == 1:
            lead[p] = i
        elif c == 2:
            trail[p] = i
        else:
            par[p] = i
    out = {}
    for key, root in roots.items():
        order = []
        stack = [root]
        while stack:
            t = stack.pop()
            order.append(t)
            # push par, lead, trail -> pop trail first
            if par[t] >= 0:
                stack.append(int(par[t]))
            if lead[t] >= 0:
                stack.append(int(lead[t]))
            if trail[t] >= 0:
                stack.append(int(trail[t]))
        out[key] = np.asarray(order, np.int64)
    return out


def rem_device_multi(
    T: np.ndarray,
    SA: np.ndarray,
    LCP: np.ndarray,
    path_ivs,
    path_samples,
    minlength: int,
    minn: int,
    maxmums: int,
    wscore: int = 1,
    wpen: int = 1,
    root_mums: int = 256,
):
    """Whole multi-genome recursion as ONE device dispatch
    (_build_kernel_multi).  path_ivs: [(beg, end), ...] one interval
    per contig-path (dim); path_samples: sample id per path.  Returns
    (anchors, T_out, levels) with anchors int64 (A, 5+3D) in serial
    pop order, or None on abort."""
    import jax

    n = len(SA)
    D = len(path_ivs)
    DS = max(path_samples) + 1
    if n >= 2**30 or minlength < 1 or DS < 2 or D > 8:
        return None
    npad = _next_pow2(n)
    ntext = _next_pow2(len(T))
    caps = {
        "K": _next_pow2(max(2048, 4 * root_mums)),
        "SMAX": 512,
        "ACAP": max(4096, npad // 64),
        # multi-genome repair passes see far more crossing suffixes
        # than pairwise (one pass per matched sample begin; measured
        # 65536 pending on the 6-way 1a-1f) — start at npad/16
        "CCAP": max(4096, npad // 16),
        "CW": _next_pow2(max(64, root_mums)),
    }
    T_p = np.zeros(ntext, dtype=np.uint8)
    T_p[: len(T)] = np.asarray(T, dtype=np.uint8)
    SA_p = np.full(npad, n - 1, dtype=np.int32)
    SA_p[:n] = np.asarray(SA, dtype=np.int32)
    LCP_p = np.zeros(npad, dtype=np.int32)
    LCP_p[:n] = np.asarray(LCP, dtype=np.int32)
    SEG_p = np.full(npad, -1, dtype=np.int32)
    SEG_p[:n] = 0
    # path id per text position -> per slot (COA)
    pof = np.zeros(len(T) + 1, dtype=np.int32)
    for pid, (b, e) in enumerate(path_ivs):
        pof[b:e] = pid
    SOA_p = np.zeros(npad, dtype=np.int32)
    SOA_p[:n] = pof[np.minimum(SA_p[:n], len(T))]

    dispatches = 0
    for _attempt in range(6):
        TW = 2 + 3 * D
        seg_tab = np.zeros((caps["SMAX"], TW), dtype=np.int32)
        seg_tab[:, 0] = 0
        begs = np.full(D, -1, np.int32)
        ends = np.full(D, -1, np.int32)
        key0 = 0
        for pid, (b, e) in enumerate(path_ivs):
            if e > b:
                begs[pid] = b
                ends[pid] = e
                key0 |= 1 << int(path_samples[pid])
        seg_tab[0, 0] = -1            # root parent
        seg_tab[0, 1] = 0
        seg_tab[0, 2:2 + D] = begs
        seg_tab[0, 2 + D:2 + 2 * D] = ends
        seg_tab[0, 2 + 2 * D:] = -1
        live_key = np.zeros(caps["SMAX"], dtype=np.int32)
        live_key[0] = key0
        fn = _build_kernel_multi(
            npad, caps["K"], caps["SMAX"], caps["ACAP"],
            caps["CCAP"], D, caps["CW"], ntext=ntext, minn=minn,
            sample_of_path=path_samples,
        )
        T_out, anchors, acount, abort, level, steps = fn(
            T_p, SA_p, LCP_p, SOA_p, SEG_p, seg_tab, live_key,
            np.int32(1), np.int32(minlength), np.int32(maxmums),
            np.int32(wscore), np.int32(wpen),
            np.int32(int(os.environ.get("REVEAL_TPU_DEVLOOP_DBG", "0"))),
        )[:6]
        dispatches += 1
        abort = int(abort)
        if abort in _RETRYABLE:
            cap = _RETRYABLE[abort]
            caps[cap] *= 2
            log.info(
                "device multi loop: %s overflow, retry %s=%d",
                cap, cap, caps[cap],
            )
            continue
        break

    acount = int(acount)
    steps = np.asarray(steps)
    LAST_STATS.clear()
    LAST_STATS.update(
        levels=int(level), dispatches=dispatches, anchors=acount,
        abort=abort, trim_steps=int(steps[0]),
        chain_steps=int(steps[1]), repair_steps=int(steps[2]),
    )
    if abort:
        log.info(
            "device multi loop aborted (code %d) — host fallback",
            abort,
        )
        return None
    anchors = np.asarray(jax.device_get(anchors))[:acount].astype(
        np.int64
    )
    T_out = np.asarray(jax.device_get(T_out))[: len(T)].astype(
        np.uint8
    )
    if acount == 0:
        return np.zeros((0, 5 + 3 * D), np.int64), T_out, 0
    orders = forest_pop_order_multi(anchors[:, 2], anchors[:, 3])
    order = orders.get(-1)
    if order is None or len(order) != acount:
        log.info("device multi loop: pop-order mismatch — fallback")
        return None
    return anchors[order], T_out, int(level)
