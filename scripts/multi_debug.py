"""Debug harness: host multi recursion anchor stream vs the device
multi kernel's, first divergence printed."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from reveal_tpu.align.rem import (  # noqa: E402
    IntervalIndex,
    MumPicker,
    PanGraph,
    PickerConfig,
    _enum_pick,
    graphalign,
)
from reveal_tpu.core.textstore import TextStore  # noqa: E402
from reveal_tpu.index.esa_index import ESAIndex  # noqa: E402


def genomes(seed=3, L=2000, N=3, nmut=4):
    rng = np.random.default_rng(seed)
    anc = rng.integers(0, 4, L)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    out = []
    for k in range(N):
        g = anc.copy()
        m = rng.random(L) < 0.02
        g[m] = (g[m] + rng.integers(1, 4, int(m.sum()))) % 4
        s = bytearray(bases[g].tobytes())
        for _ in range(nmut):
            p = int(rng.integers(0, len(s)))
            ln = int(rng.integers(1, 30))
            if rng.random() < 0.5:
                del s[p:p + ln]
            else:
                s[p:p] = bases[rng.integers(0, 4, ln)].tobytes()
        out.append(("g%d" % k, bytes(s).decode()))
    return out


def build(gen):
    ts = TextStore()
    t = IntervalIndex()
    G = PanGraph()
    rn = set()
    for name, seq in gen:
        sid = len(G.graph["paths"])
        G.graph["path2id"][name] = sid
        G.graph["id2path"][sid] = name
        G.graph["paths"].append(name)
        ts.add_sample(name)
        iv = ts.add_sequence(seq)
        G.graph["id2end"][sid] = len(seq)
        G.add_node(iv, offsets={sid: 0}, aligned=0)
        t.add(iv)
        rn.add(iv)
    idx = ESAIndex.construct(ts)
    idx.nodes = rn
    return G, t, idx


def host_anchors(gen):
    G, t, idx = build(gen)
    cfg = PickerConfig()
    picker = MumPicker(G, t, cfg)
    picker.set_fastmap(idx.nodes)
    D = idx.main.nsamples
    queue = [idx]
    out = []
    while queue:
        seg = queue.pop()
        pick = _enum_pick(picker, seg, cfg)
        if not pick:
            continue
        splitmum, skl, skr = pick
        l, w, spd = splitmum
        pos = [-1] * D
        for gid, p in spd:
            pos[gid] = p
        out.append((l, w, tuple(pos)))
        res = graphalign(G, t, seg, splitmum)
        leading, trailing, matching, rest, merged, nl_, nr_ = res
        sp_positions = [p for gid, p in spd]
        li, ti, pi = seg.split_segments(
            leading, trailing, matching, rest, sp_positions, l, nl_,
            nr_, skipleft=skl, skipright=skr,
        )
        if pi is not None:
            queue.append(pi)
        if li is not None:
            queue.append(li)
        if ti is not None:
            queue.append(ti)
    return out


def dev_anchors(gen):
    from reveal_tpu.index import devloop
    from reveal_tpu.index.devloop import rem_device_multi

    G, t, idx = build(gen)
    cfg = PickerConfig()
    m = idx.main
    arrs = idx.getmultimums_arrays(minlength=cfg.minlength, minn=cfg.minn)
    res = rem_device_multi(
        m.T, idx.SA, idx.LCP, m.SO, m.nsep, cfg.minlength, cfg.minn,
        cfg.maxmums, int(cfg.wscore), int(cfg.wpen),
        root_mums=max(64, len(arrs[0])),
    )
    print("LAST_STATS:", dict(devloop.LAST_STATS))
    if res is None:
        return None
    anchors, T_out, levels = res
    D = m.nsamples
    out = []
    for rec in anchors.tolist():
        out.append((rec[0], rec[1], tuple(rec[5:5 + D])))
    return out


def main():
    import sys as _s

    seed = int(_s.argv[1]) if len(_s.argv) > 1 else 3
    gen = genomes(seed=seed)
    h = host_anchors(gen)
    d = dev_anchors(gen)
    print("host anchors:", len(h), " device:", None if d is None else len(d))
    if d is None:
        return
    for i, (x, y) in enumerate(zip(h, d)):
        if x != y:
            print(f"DIVERGE at {i}:")
            print("  host:", x)
            print("  dev: ", y)
            for j in range(max(0, i - 2), min(len(h), i + 3)):
                print("   ", j, "H", h[j], "D", d[j] if j < len(d) else None)
            break
    else:
        if len(h) == len(d):
            print("STREAMS IDENTICAL")
        else:
            print("prefix identical; lengths differ", len(h), len(d))
            k = min(len(h), len(d))
            print("next host:", h[k:k+2] if len(h) > k else None)
            print("next dev:", d[k:k+2] if len(d) > k else None)


if __name__ == "__main__":
    main()
