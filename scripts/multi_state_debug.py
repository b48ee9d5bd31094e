"""Compare the multi kernel's per-level state with a host mirror: run
the host recursion level-synchronously, capture each live segment's
(SA slice, LCP slice) keyed by its interval set, then run the kernel
with a level cap and match segments by intervals."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.argv = ["x"]
exec(
    open(os.path.join(os.path.dirname(__file__), "multi_debug.py"))
    .read()
    .split("def dev_anchors")[0]
)


def host_levels(gen, maxlev):
    """BFS by depth: returns per-level {ivkey: (SA, LCP)} (pre-pick)."""
    from reveal_tpu.align.picker import PickerConfig
    from reveal_tpu.align.rem import MumPicker, _enum_pick, graphalign

    G, t, idx = build(gen)
    cfg = PickerConfig()
    picker = MumPicker(G, t, cfg)
    picker.set_fastmap(idx.nodes)
    levels = []
    cur = [idx]
    for lev in range(maxlev):
        snap = {}
        nxt = []
        for seg in cur:
            ivs = {}
            for nd in seg.nodes:
                for sid in G.nodes[nd]["offsets"]:
                    ivs[sid] = (nd[0], nd[1])
            key = tuple(sorted(ivs.items()))
            snap[key] = (
                np.array(seg.SA, np.int64),
                np.array(seg.LCP, np.int64),
            )
            pick = _enum_pick(picker, seg, cfg)
            if not pick:
                continue
            splitmum, skl, skr = pick
            l, w, spd = splitmum
            res = graphalign(G, t, seg, splitmum)
            leading, trailing, matching, rest, merged, nl_, nr_ = res
            sp_positions = [p for gid, p in spd]
            li, ti, pi = seg.split_segments(
                leading, trailing, matching, rest, sp_positions, l,
                nl_, nr_, skipleft=skl, skipright=skr,
            )
            for ch in (li, ti, pi):
                if ch is not None:
                    nxt.append(ch)
        levels.append(snap)
        cur = nxt
        if not cur:
            break
    return levels, G, t


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    gen = genomes(seed=seed)
    MAXLEV = 10
    hlv, G, t = host_levels(gen, MAXLEV)

    # device: run with increasing level caps, compare states
    G2, t2, idx = build(gen)
    from reveal_tpu.align.picker import PickerConfig
    from reveal_tpu.index.devloop import _build_kernel_multi, _next_pow2

    cfg = PickerConfig()
    m = idx.main
    D = m.nsamples
    T = m.T
    n = len(idx.SA)
    npad = _next_pow2(n)
    ntext = _next_pow2(len(T))
    K, SMAX, ACAP, CCAP, CW = 2048, 256, 2048, 1024, 256
    TW = 2 + 3 * D
    T_p = np.zeros(ntext, np.uint8)
    T_p[: len(T)] = T
    SA_p = np.full(npad, n - 1, np.int32)
    SA_p[:n] = idx.SA
    LCP_p = np.zeros(npad, np.int32)
    LCP_p[:n] = idx.LCP
    SEG_p = np.full(npad, -1, np.int32)
    SEG_p[:n] = 0
    SOA_p = np.zeros(npad, np.int32)
    SOA_p[:n] = np.array(m.SO)[SA_p[:n]]
    seg_tab = np.zeros((SMAX, TW), np.int32)
    seg_tab[0, 0] = -1
    seg_tab[0, 2:] = -1
    key0 = 0
    nsep = m.nsep
    prev = 0
    for s in range(D):
        b = prev
        e = int(nsep[s])
        seg_tab[0, 2 + s] = b
        seg_tab[0, 2 + D + s] = e
        prev = e + 1
        key0 |= 1 << s
    live_key = np.zeros(SMAX, np.int32)
    live_key[0] = key0
    fn = _build_kernel_multi(
        npad, K, SMAX, ACAP, CCAP, D, CW, ntext=ntext, minn=cfg.minn
    )

    for cap in range(1, MAXLEV):
        out = fn(
            T_p, SA_p, LCP_p, SOA_p, SEG_p, seg_tab, live_key,
            np.int32(1), np.int32(cfg.minlength),
            np.int32(cfg.maxmums), np.int32(1), np.int32(1),
            np.int32(2 + cap),
        )
        (T_o, anchors, acount, abort, level, steps, SA_o, LCP_o,
         SEG_o, SOA_o, BWT_o) = [np.asarray(x) for x in out]
        if cap >= len(hlv):
            break
        # device segments at this level
        segs = {}
        for sidx in range(int(SEG_o.max()) + 1 if SEG_o.max() >= 0 else 0):
            slots = np.where(SEG_o == sidx)[0]
            if not len(slots):
                continue
            sa = SA_o[slots]
            lcp = LCP_o[slots]
            # interval per sample from slot contents
            so = SOA_o[slots]
            ivs = {}
            ok = True
            for s in set(so.tolist()):
                ps = sa[so == s]
                ivs[s] = (int(ps.min()), None)
            segs[sidx] = (sa, lcp, so)
        hsnap = hlv[cap]
        print(f"--- level {cap}: host segs {len(hsnap)}, dev segs {len(segs)}")
        # match by sorted SA multiset
        hmap = {}
        for key, (sa, lcp) in hsnap.items():
            hmap[tuple(sorted(sa.tolist()))] = (key, sa, lcp)
        bad = 0
        for sidx, (sa, lcp, so) in segs.items():
            hk = tuple(sorted(sa.tolist()))
            if hk not in hmap:
                print(f"  dev seg {sidx}: NO host segment with same "
                      f"suffix set (n={len(sa)})")
                bad += 1
                continue
            key, hsa, hlcp = hmap[hk]
            if not np.array_equal(sa, hsa):
                d0 = np.where(sa != hsa)[0][0]
                print(f"  dev seg {sidx}: SA ORDER differs at {d0} "
                      f"(dev {sa[d0]} host {hsa[d0]}), n={len(sa)}")
                bad += 1
            elif not np.array_equal(lcp, hlcp):
                d0 = np.where(lcp != hlcp)[0][0]
                print(f"  dev seg {sidx}: LCP differs at {d0} "
                      f"(dev {lcp[d0]} host {hlcp[d0]}) sa={sa[d0]}")
                bad += 1
        if bad:
            print("  -> first corrupt level:", cap)
            break
        print("  all matched")


if __name__ == "__main__":
    main()
