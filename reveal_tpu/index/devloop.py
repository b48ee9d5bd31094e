"""Whole-recursion device kernel for the pairwise fasta case.

ONE jitted dispatch runs the complete REM recursion on device: a
``lax.while_loop`` over frontier levels whose body fuses

* enumerate  — the getmums_rem conditions (reveal.c:119-180) elementwise
  over adjacent SA slots, all live segments at once;
* pick       — trim_overlap (schemes.py:161-191) as containment +
  sequential trim scans per dimension, the sparse chaining DP
  (schemes.py:20-104) with the reference's exact traversal and
  tie-breaking order, and the ``largest`` split selection
  (schemes.py:298-317) during backtrack;
* split      — per-slot classification into leading/trailing children,
  child LCP as per-class segmented running-min (split(),
  reveal.c:582-664), one stable partition sort, matched-text lowercase
  (reveal.c:1230-1234);
* repair     — bubble_sort (reveal.c:666-727) boundary repair as an
  exact sequential inner while_loop over the (few) crossing suffixes,
  two passes per level (the parent anchor's A-side and B-side begins).

The kernel logs every anchor with its parent anchor and child class;
the host reconstructs the serial LIFO pop order (push parallel/leading/
trailing, pop reversed — reveal.c:21-27,1295-1324) by a trailing-first
pre-order walk of that tree and replays the anchors through the exact
graph surgery (align/rem._rem2_replay), reproducing the per-step
engine's GFA byte-for-byte.

Numerics: all chain arithmetic is int32-exact (requires integer wscore/
wpen, the defaults); any capacity overflow or a duplicate-ref-start
chain (which the host resolves through its dict-aliasing code path)
sets an abort code and the caller falls back to the host engine.

Validated against a 762-case pick corpus and a 385-case repair corpus
traced from the host engine, plus byte-identical-GFA differential tests
(tests/test_devloop.py).
"""

from __future__ import annotations

import logging
import math

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

_LMAX = 512

# stats of the most recent rem_device_loop call (bench/diagnostics):
# levels of the recursion, device dispatches made (always 1 — the
# whole recursion is one jitted call), anchors logged, abort code.
LAST_STATS = {}


def _next_pow2(x: int) -> int:
    return 1 << max(1, int(math.ceil(math.log2(max(x, 2)))))


def _build_kernel(npad: int, K: int, SMAX: int, ACAP: int, CCAP: int):
    """One compiled variant per (npad, K, SMAX, ACAP, CCAP)."""
    key = (npad, K, SMAX, ACAP, CCAP)
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

    def seg_min_scan(values, reset):
        def combine(x, y):
            m1, f1 = x
            m2, f2 = y
            return jnp.where(f2, m2, jnp.minimum(m1, m2)), f1 | f2

        m, _ = jax.lax.associative_scan(combine, (values, reset))
        return m

    def sort_by(keys, vals):
        """Total-order sort (callers append an arrival-index key)."""
        out = jax.lax.sort(tuple(keys) + tuple(vals), num_keys=len(keys))
        return out[len(keys):]

    # ------------------------------------------------------------------
    # trim_overlap, one dimension (schemes.py:161-191): containment drop
    # + sequential trim scan.  Arrays are K-wide; dead rows have
    # seg == BIG and sort to the end.
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
        seg_prev = jnp.concatenate([jnp.full(1, -9, seg.dtype), seg[:-1]])
        seg_next = jnp.concatenate([seg[1:], jnp.full(1, -9, seg.dtype)])
        first = seg != seg_prev
        last = seg != seg_next
        end_prev = jnp.concatenate([jnp.zeros(1, end.dtype), end[:-1]])
        end_next = jnp.concatenate([end[1:], jnp.zeros(1, end.dtype)])
        # per-seg last end (the python mums[-1] wraparound): propagate the
        # end at each segment-last slot backward over the segment
        def comb_last(x, y):
            v1, f1 = x
            v2, f2 = y
            return jnp.where(f2, v2, v1), f1 | f2

        last_end_rev, _ = jax.lax.associative_scan(
            comb_last,
            (jnp.flip(jnp.where(last, end, 0)), jnp.flip(last)),
        )
        seg_last_end = jnp.flip(last_end_rev)
        # keep rule (schemes.py:169-172, incl. the i==0 wraparound quirk);
        # single-entry segments always survive (len(mums)<=1 break)
        keep_first = (~last & (end_next > end)) | (seg_last_end < end)
        keep = alive & jnp.where(first, keep_first | last, end_prev < end)
        seg = jnp.where(keep, seg, BIG)
        # compact kept rows to the front, preserving order
        seg, l, a, b = sort_by((seg, iar), (seg, l, a, b))
        pos = a if coord == 0 else b
        n_alive = jnp.sum((seg < BIG).astype(i32))

        # sequential trim scan (prototype-validated): carry
        # (cur_seg, ce, ci, cl); emits a front cut per row and at most
        # one back cut per row.  Back-cut buffer has a scratch row K.
        def scan_body(c):
            front, back, cseg, ce, ci, cl, i = c
            s_i = seg[i]
            p_i = pos[i]
            l_i = l[i]
            newseg = s_i != cseg
            ov = jnp.where(newseg, 0, ce - p_i)
            hit = ov > 0
            back = back.at[jnp.where(hit, ci, K)].add(
                jnp.where(hit, ov, 0), mode="drop"
            )
            front = front.at[i].set(jnp.where(hit, ov, 0))
            li = l_i - ov
            prev_alive = cl - ov > 0
            ce_n = jnp.where(
                hit, jnp.where(li > 0, p_i + l_i, p_i), p_i + l_i
            )
            ci_n = jnp.where(hit & (li <= 0), ci, i)
            ci_n = jnp.where(
                hit & (li <= 0) & ~prev_alive, jnp.int32(K), ci_n
            )
            cl_n = jnp.where(
                hit,
                jnp.where(li > 0, li,
                          jnp.where(prev_alive, cl - ov, 0)),
                l_i,
            )
            return front, back, s_i, ce_n, ci_n, cl_n, i + 1

        front0 = jnp.zeros(K, i32)
        back0 = jnp.zeros(K + 1, i32)
        front, back, _, _, _, _, _ = jax.lax.while_loop(
            lambda c: c[6] < n_alive,
            scan_body,
            (front0, back0, jnp.int32(-9), jnp.int32(0),
             jnp.int32(K), jnp.int32(0), jnp.int32(0)),
        )
        back = back[:K]
        newl = l - front - back
        ok = (seg < BIG) & (newl > 0)
        seg = jnp.where(ok, seg, BIG)
        # n_alive = the number of sequential scan iterations actually
        # run (post containment-drop) — the honest step count for the
        # ~137us/step cost model the bench counters feed
        return seg, newl, a + front, b + front, n_alive

    # ------------------------------------------------------------------
    # the fused level loop
    # ------------------------------------------------------------------
    @jax.jit
    def run(T, SA, LCP, SEG, seg_tab, nsep0, minl, maxmums, ws, wp):
        """seg_tab: int32[SMAX, 8]: a_beg a_end b_beg b_end parent cls
        ma mb (ma/mb = the parent's anchor begins, for repair)."""

        anchors0 = jnp.zeros((ACAP + 1, 9), i32)
        iar_n = jnp.arange(npad, dtype=i32)
        iar_k = jnp.arange(K, dtype=i32)
        M = K + SMAX
        iar_m = jnp.arange(M, dtype=i32)
        sarange = jnp.arange(SMAX, dtype=i32)

        def cond(st):
            nseg, abort, level = st[5], st[8], st[9]
            return (nseg > 0) & (abort == 0) & (level < _LMAX)

        def body(st):
            (T, SA, LCP, SEG, seg_tab, nseg, anchors, acount, abort,
             level, steps) = st

            # ---- enumerate (reveal.c:119-180 conditions) --------------
            prev = jnp.roll(SA, 1)
            seg_prev = jnp.roll(SEG, 1)
            lv = LCP
            straddle = (SA > nsep0) != (prev > nsep0)
            a_ = jnp.minimum(SA, prev)
            b_ = jnp.maximum(SA, prev)
            ta = T[jnp.maximum(a_ - 1, 0)]
            tb = T[jnp.maximum(b_ - 1, 0)]
            lower = (ta >= ord("a")) & (ta <= ord("z"))
            leftmax = (
                (a_ == 0) | (b_ == 0) | (ta != tb)
                | (ta == N_BYTE) | (ta == SENTINEL) | lower
            )
            lcp_nx = jnp.concatenate([LCP[1:], jnp.zeros(1, LCP.dtype)])
            lcp_pv = jnp.roll(LCP, 1)
            unique = (lcp_pv < lv) & (lcp_nx < lv)
            mask = (
                (iar_n >= 1) & (SEG >= 0) & (SEG == seg_prev)
                & (lv >= minl) & (lv > 0) & straddle & leftmax & unique
            )
            ccount = jnp.sum(mask.astype(i32))
            abort = jnp.where(
                ccount > K, jnp.int32(ABORT_CAND_OVERFLOW), abort
            )
            (slots,) = jnp.nonzero(mask, size=K, fill_value=npad - 1)
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

            # ---- chain DP (schemes.py:20-104) -------------------------
            # one right-pseudo row per live segment: l=0 at (a_end,
            # b_end); candidates have a < a_end so the pseudo sorts last
            # within its segment
            seg_live = sarange < nseg
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
            m_tot = jnp.sum(galive.astype(i32))
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
            gsc = jnp.clip(gseg, 0, SMAX - 1)
            gla = seg_tab[gsc, 0] - 1   # left pseudo (text coords;
            glb = seg_tab[gsc, 2] - 1   # gap costs shift-invariant)
            gmul = ws * gl

            def chain_body(c):
                score, link, act, i = c
                compat = (
                    (iar_m < i) & (gseg == gseg[i]) & galive
                    & (gea <= ga[i]) & (geb <= gb[i])
                )
                newly = compat & (act == BIG)
                act = jnp.where(newly, i, act)
                d = (ga[i] - gea) - (gb[i] - geb)
                tmpw = score + gmul[i] - wp * jnp.abs(d)
                tmpw = jnp.where(compat, tmpw, NEG)
                dl = (ga[i] - gla[i]) - (gb[i] - glb[i])
                wl = gmul[i] - wp * jnp.abs(dl)
                # winner among {left} + compat in the reference's active
                # traversal order (score desc, activation counter asc):
                # max tmpw, then max score, then min (act step, row);
                # left sits at (score 0, counter 0)
                mx = jnp.max(tmpw)
                c1 = tmpw == mx
                sc2 = jnp.where(c1, score, NEG)
                mx2 = jnp.max(sc2)
                a3 = jnp.where(c1 & (sc2 == mx2), act, BIG)
                bi = jnp.argmin(a3)   # first row among min act steps
                use_left = (wl > mx) | ((wl == mx) & (mx2 <= 0))
                w = jnp.where(use_left, wl, mx)
                bj = jnp.where(use_left, jnp.int32(-1), bi.astype(i32))
                score = score.at[i].set(w)
                link = link.at[i].set(bj)
                return score, link, act, i + 1

            steps = steps.at[1].add(m_tot)
            score, link, act, _ = jax.lax.while_loop(
                lambda c: c[3] < m_tot,
                chain_body,
                (jnp.zeros(M, i32), jnp.full(M, -2, i32),
                 jnp.full(M, BIG, i32), jnp.int32(0)),
            )

            # ---- backtrack + largest (schemes.py:298-301) -------------
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

            def bt_body(c):
                ptr, bl, bs = c
                activ = ptr >= 0
                pc = jnp.clip(ptr, 0, M - 1)
                lcur = jnp.where(activ, gl[pc], -1)
                upd = activ & (lcur > bl)
                bl = jnp.where(upd, lcur, bl)
                bs = jnp.where(upd, pc, bs)
                ptr = jnp.where(activ, link[pc], ptr)
                return ptr, bl, bs

            ptr, bl, bs = jax.lax.while_loop(
                lambda c: jnp.any(c[0] >= 0),
                bt_body,
                (ptr0, jnp.full(SMAX, -1, i32), jnp.full(SMAX, -1, i32)),
            )
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
            bs = jnp.where(single, candrow, bs)
            picked = seg_live & (bs >= 0)
            bsc = jnp.clip(bs, 0, M - 1)
            s_l = jnp.where(picked, gl[bsc], 0)
            s_ma = jnp.where(picked, ga[bsc], 0)
            s_mb = jnp.where(picked, gb[bsc], 0)

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
            sc = jnp.clip(SEG, 0, SMAX - 1)
            pos = SA
            pma = jnp.where(picked[sc], s_ma[sc], -1)
            pmb = jnp.where(picked[sc], s_mb[sc], -1)
            pl = s_l[sc]
            in_lead = ((pos >= seg_tab[sc, 0]) & (pos < pma)) | (
                (pos >= seg_tab[sc, 2]) & (pos < pmb)
            )
            in_trail = (
                (pos >= pma + pl) & (pos < seg_tab[sc, 1])
            ) | ((pos >= pmb + pl) & (pos < seg_tab[sc, 3]))
            live_parent = (SEG >= 0) & picked[sc]
            nsg = jnp.where(
                live_parent & in_lead & lead_live[sc],
                jnp.minimum(lead_id[sc], SMAX - 1),
                jnp.int32(-1),
            )
            nsg = jnp.where(
                live_parent & in_trail & trail_live[sc],
                jnp.minimum(trail_id[sc], SMAX - 1),
                nsg,
            )
            # guard: lead_id/trail_id == SMAX only for dead children
            nsg = jnp.where(
                live_parent & in_lead & ~lead_live[sc], -1, nsg
            )
            nsg = jnp.where(
                live_parent & in_trail & ~trail_live[sc], -1, nsg
            )
            cls = jnp.where(live_parent & in_lead, 1, 0)
            cls = jnp.where(live_parent & in_trail, 2, cls)

            # child LCP: per-class segmented running-min over the parent
            # layout (split(), reveal.c:582-664; devfrontier apply)
            segstart = SEG != jnp.concatenate(
                [jnp.full(1, -9, SEG.dtype), SEG[:-1]]
            )
            cls_prev = jnp.concatenate([jnp.zeros(1, i32), cls[:-1]])
            newlcp = jnp.zeros_like(LCP)
            for c in (1, 2):
                reset = segstart | ((cls_prev == c) & ~segstart)
                mm = seg_min_scan(LCP, reset)
                newlcp = jnp.where(cls == c, mm, newlcp)

            sortkey = jnp.where(nsg < 0, jnp.int32(SMAX), nsg)
            skey, _slot, SA, newlcp2 = jax.lax.sort(
                (sortkey, iar_n, SA, newlcp), num_keys=2
            )
            SEG = jnp.where(skey >= SMAX, jnp.int32(-1), skey)
            sprev = jnp.concatenate(
                [jnp.full(1, -9, SEG.dtype), SEG[:-1]]
            )
            firstslot = SEG != sprev
            LCP = jnp.where(firstslot | (SEG < 0), 0, newlcp2)

            # lowercase matched text (pre-sort slot views; every live
            # text position is exactly one slot's SA)
            in_match = live_parent & ~in_lead & ~in_trail & (
                ((pos >= pma) & (pos < pma + pl))
                | ((pos >= pmb) & (pos < pmb + pl))
            )
            upmask = jnp.zeros(npad, dtype=bool)
            upmask = upmask.at[jnp.where(in_match, pos, npad)].set(
                True, mode="drop"
            )
            isup = (T >= ord("A")) & (T <= ord("Z"))
            T = jnp.where(upmask & isup, T + 32, T)

            # ---- boundary repair (bubble_sort, reveal.c:666-727) ------
            # two passes: each leading child's A-side begin (parent ma)
            # then B-side begin (parent mb); exact sequential processing
            # of the crossing suffixes inside the dispatch
            def repair_pass(T, SA, LCP, which, abort):
                scn = jnp.clip(SEG, 0, SMAX - 1)
                is_lead = (SEG >= 0) & (new_tab[scn, 5] == 1)
                beg = jnp.where(is_lead, new_tab[scn, 6 + which], -1)
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
                (cq,) = jnp.nonzero(
                    cross0, size=CCAP, fill_value=npad - 1
                )
                centry_next = lcpn[cq]

                def rbody(c):
                    SA_, LCP_, j = c
                    q = cq[j]
                    b = beg[q]
                    saq = SA_[q]
                    lcq = LCP_[q]
                    thr = b - saq
                    move = (saq < b) & (saq + lcq > b)
                    wm = (iar_n < q) & (LCP_ < thr)
                    y = jnp.max(jnp.where(wm, iar_n, -1))
                    x = jnp.maximum(y, 0)

                    def do_move(args):
                        SA_, LCP_ = args
                        inwin = (iar_n > x) & (iar_n <= q)
                        SA_n = jnp.where(inwin, jnp.roll(SA_, 1), SA_)
                        LCP_n = jnp.where(
                            inwin, jnp.roll(LCP_, 1), LCP_
                        )
                        SA_n = SA_n.at[x].set(saq)
                        LCP_n = LCP_n.at[x + 1].set(thr)
                        qn = jnp.minimum(q + 1, npad - 1)
                        LCP_n = LCP_n.at[qn].set(
                            jnp.where(
                                (q < npad - 1) & (lcq < LCP_n[qn]),
                                lcq,
                                LCP_n[qn],
                            )
                        )
                        return SA_n, LCP_n

                    def do_lcponly(args):
                        SA_, LCP_ = args
                        qn = jnp.minimum(q + 1, npad - 1)
                        hit = (
                            (q < npad - 1) & (saq < b)
                            & ((saq + centry_next[j]) > b)
                            & (LCP_[qn] > LCP_[q])
                        )
                        LCP_n = LCP_.at[qn].set(
                            jnp.where(hit, b - saq, LCP_[qn])
                        )
                        return SA_, LCP_n

                    SA_, LCP_ = jax.lax.cond(
                        move, do_move, do_lcponly, (SA_, LCP_)
                    )
                    return SA_, LCP_, j + 1

                SA, LCP, _ = jax.lax.while_loop(
                    lambda c: c[2] < jnp.minimum(rc, CCAP),
                    rbody,
                    (SA, LCP, jnp.int32(0)),
                )
                return SA, LCP, abort, jnp.minimum(rc, CCAP)

            SA, LCP, abort, rc0 = repair_pass(T, SA, LCP, 0, abort)
            SA, LCP, abort, rc1 = repair_pass(T, SA, LCP, 1, abort)
            steps = steps.at[2].add(rc0 + rc1)

            acount = jnp.minimum(acount + npicked, ACAP)
            return (
                T, SA, LCP, SEG, new_tab, nseg_new, anchors, acount,
                abort, level + 1, steps,
            )

        st = jax.lax.while_loop(
            cond,
            body,
            (
                T, SA, LCP, SEG, seg_tab, jnp.int32(1), anchors0,
                jnp.int32(0), jnp.int32(0), jnp.int32(0),
                jnp.zeros(3, i32),
            ),
        )
        (T, SA, LCP, SEG, seg_tab, nseg, anchors, acount, abort,
         level, steps) = st
        abort = jnp.where(
            (abort == 0) & (level >= _LMAX),
            jnp.int32(ABORT_LEVEL_OVERFLOW),
            abort,
        )
        return T, anchors, acount, abort, level, steps

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
    engine).
    """
    import jax

    n = len(SA)
    if n >= 2**30 or minlength < 1:
        return None
    npad = _next_pow2(n)
    K = max(2048, npad // 32)
    SMAX = max(4096, npad // 512)
    ACAP = max(4096, npad // 64)
    # repair candidates per pass grow with text size (2a2b measured
    # >1024 at level 8); each candidate is one vectorized O(npad) move
    CCAP = max(1024, npad // 1024)

    T_p = np.zeros(npad, dtype=np.uint8)
    T_p[: len(T)] = np.asarray(T, dtype=np.uint8)
    SA_p = np.full(npad, n - 1, dtype=np.int32)
    SA_p[:n] = np.asarray(SA, dtype=np.int32)
    LCP_p = np.zeros(npad, dtype=np.int32)
    LCP_p[:n] = np.asarray(LCP, dtype=np.int32)
    SEG_p = np.full(npad, -1, dtype=np.int32)
    SEG_p[:n] = 0

    seg_tab = np.zeros((SMAX, 8), dtype=np.int32)
    # root: A = [0, nsep0), B = [nsep0+1, n-1)
    seg_tab[0] = (0, nsep0, nsep0 + 1, n - 1, -1, 0, -1, -1)

    fn = _build_kernel(npad, K, SMAX, ACAP, CCAP)
    T_out, anchors, acount, abort, level, steps = fn(
        T_p, SA_p, LCP_p, SEG_p, seg_tab,
        np.int32(nsep0), np.int32(minlength), np.int32(maxmums),
        np.int32(wscore), np.int32(wpen),
    )
    acount = int(acount)
    abort = int(abort)
    steps = np.asarray(steps)
    LAST_STATS.clear()
    LAST_STATS.update(
        levels=int(level), dispatches=1, anchors=acount, abort=abort,
        trim_steps=int(steps[0]), chain_steps=int(steps[1]),
        repair_steps=int(steps[2]),
    )
    if abort:
        log.info("device loop aborted (code %d) — host fallback", abort)
        return None
    anchors = np.asarray(jax.device_get(anchors))[:acount].astype(
        np.int64
    )
    T_out = np.asarray(jax.device_get(T_out))[:n]
    if acount == 0:
        return np.zeros((0, 7), np.int64), T_out, 0
    order = pop_order(anchors[:, 7], anchors[:, 8])
    ordered = anchors[order]
    out = ordered[:, [0, 1, 2, 3, 4, 5, 6]]
    log.debug(
        "device loop: %d anchors in %d levels", acount, int(level)
    )
    return out, T_out, int(level)
