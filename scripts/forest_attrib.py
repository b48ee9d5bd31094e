"""Attribution sweep for the device forest kernel (TODO round-4 item 1).

Builds the 2a2b index, runs the native defer prefix once, then times
rem_device_forest under REVEAL_TPU_DEVLOOP_DBG variants:
  dbg=0   full run
  dbg=1   repair skipped        -> repair cost = full - norepair
  dbg=2+L level count capped at L -> marginal per-level cost

Usage: python scripts/forest_attrib.py [defer_max ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from reveal_tpu.align.rem import (  # noqa: E402
    IntervalIndex,
    PanGraph,
    PickerConfig,
    read_fasta_into,
)
from reveal_tpu.core.textstore import TextStore  # noqa: E402
from reveal_tpu.index.esa_index import ESAIndex  # noqa: E402

TESTS = "/root/reference/tests"


def build(files):
    ts = TextStore()
    t = IntervalIndex()
    G = PanGraph()
    rn = set()
    for f in files:
        read_fasta_into(f, ts, t, G, rn)
    idx = ESAIndex.construct(ts)
    idx.nodes = rn
    return G, t, idx


def main():
    dms = [int(x) for x in sys.argv[1:]] or [16]
    G, t, idx = build([TESTS + "/2a.fa", TESTS + "/2b.fa"])
    cfg = PickerConfig()
    main_ = idx.main
    nsep0 = int(main_.nsep[0])
    from reveal_tpu.index.devloop import LAST_STATS, rem_device_forest
    from reveal_tpu.native import rem2_defer_native

    T0 = main_.T.copy()
    SAi0 = main_.SAi.copy()
    for dm in dms:
        main_.T[:] = T0
        main_.SAi[:] = SAi0
        t0 = time.time()
        res = rem2_defer_native(
            main_.T, idx.SA, idx.LCP, main_.SAi, nsep0, cfg.minlength,
            cfg.trim, cfg.maxmums, int(cfg.wscore), float(cfg.wpen),
            cfg.pcutoff, dm,
        )
        t_host = time.time() - t0
        anchors, defers = res
        total = int(sum(len(d[5]) for d in defers))
        print(
            f"dm={dm}: host prefix {t_host:.2f}s, "
            f"{len(anchors)} host rows, {len(defers)} deferred segs, "
            f"{total} slots", flush=True,
        )
        Tpost = main_.T.copy()

        def run(dbg, label):
            main_.T[:] = Tpost
            os.environ["REVEAL_TPU_DEVLOOP_DBG"] = str(dbg)
            t0 = time.time()
            out = rem_device_forest(
                main_.T, defers, nsep0, cfg.minlength, cfg.maxmums,
                int(cfg.wscore), int(cfg.wpen),
            )
            dt = time.time() - t0
            st = dict(LAST_STATS)
            print(
                f"  dm={dm} {label}: {dt:.2f}s  levels={st.get('levels')}"
                f" disp={st.get('dispatches')} abort={st.get('abort')}"
                f" trim={st.get('trim_steps')} chain={st.get('chain_steps')}"
                f" rep={st.get('repair_steps')}"
                f" ok={out is not None}", flush=True,
            )
            return dt

        run(0, "cold-full")
        full = run(0, "warm-full")
        norep = run(1, "no-repair")
        lv = {}
        for L in (0, 4, 8):
            lv[L] = run(2 + L, f"cap{L}")
        print(
            f"  dm={dm} SUMMARY: full={full:.2f} repair={full-norep:.2f} "
            f"lv0={lv[0]:.2f} lv4-0={(lv[4]-lv[0]):.2f} "
            f"lv8-4={(lv[8]-lv[4]):.2f}", flush=True,
        )
    os.environ.pop("REVEAL_TPU_DEVLOOP_DBG", None)


if __name__ == "__main__":
    main()
