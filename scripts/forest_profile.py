"""Per-op attribution of the device forest kernel via the JAX profiler
(works over axon — verified; device ops appear under /device:TPU pid).

Builds 2a2b, runs the native defer prefix, warms the forest kernel,
then profiles one warm dispatch and aggregates device-op durations.
"""
import collections
import glob
import gzip
import json
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


def main():
    dm = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    files = [TESTS + "/2a.fa", TESTS + "/2b.fa"]
    ts = TextStore()
    t = IntervalIndex()
    G = PanGraph()
    rn = set()
    for f in files:
        read_fasta_into(f, ts, t, G, rn)
    idx = ESAIndex.construct(ts)
    idx.nodes = rn
    cfg = PickerConfig()
    main_ = idx.main
    nsep0 = int(main_.nsep[0])
    from reveal_tpu.index.devloop import LAST_STATS, rem_device_forest
    from reveal_tpu.native import rem2_defer_native

    res = rem2_defer_native(
        main_.T, idx.SA, idx.LCP, main_.SAi, nsep0, cfg.minlength,
        cfg.trim, cfg.maxmums, int(cfg.wscore), float(cfg.wpen),
        cfg.pcutoff, dm,
    )
    anchors, defers = res
    print(f"defers: {len(defers)}", flush=True)
    Tpost = main_.T.copy()

    def run():
        main_.T[:] = Tpost
        t0 = time.time()
        out = rem_device_forest(
            main_.T, defers, nsep0, cfg.minlength, cfg.maxmums,
            int(cfg.wscore), int(cfg.wpen),
        )
        dt = time.time() - t0
        print(f"forest: {dt:.2f}s stats={dict(LAST_STATS)}", flush=True)
        return out

    run()  # cold: compile + load
    run()  # warm
    import jax

    with jax.profiler.trace("/tmp/foresttrace"):
        run()

    # aggregate device ops
    traces = sorted(glob.glob(
        "/tmp/foresttrace/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(traces[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    devpids = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in str(e["args"].get("name")):
                devpids.add(e["pid"])
    dur = collections.Counter()
    cnt = collections.Counter()
    tot = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in devpids:
            # strip trailing .N instance suffixes for grouping
            name = e["name"]
            base = name.rstrip("0123456789").rstrip(".")
            dur[base] += e.get("dur", 0)
            cnt[base] += 1
            tot += e.get("dur", 0)
    print(f"\ntotal device op time: {tot/1e6:.2f}s over {sum(cnt.values())} ops")
    for k, v in dur.most_common(40):
        print(f"{v/1e6:9.3f}s  x{cnt[k]:6d}  {k[:90]}", flush=True)


if __name__ == "__main__":
    main()
