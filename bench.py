#!/usr/bin/env python
"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Primary metric — rem anchoring throughput (Mbp/s) on the reference's
tests/2a.fa vs 2b.fa fixtures (3.2 Mbp total), the metric BASELINE.json
names first, measured on the production default path (align_genomes,
backend="auto").

vs_baseline is MEASURED, not estimated: the same alignment is timed with
REVEAL_TPU_DISABLE_NATIVE=1 and backend="np" in a subprocess — the repo's
own pure-numpy engine, no C++, no device — as the reference-CPU proxy
(the reference's py2+C binary cannot be built in this image; the numpy
engine implements the identical algorithm and produces the identical
graph, see tests/test_determinism.py).  The proxy time is reported in
extra so the comparison is auditable.

Correctness gate: before any timing, the production pair-HMM posterior
path (Pallas kernels on TPU) is checked against the float64 scalar
oracle (hmm/selfcheck.py).  On mismatch the benchmark prints an error
JSON line and exits non-zero — no silent numbers from broken kernels.

Extra: rem on 1a/1b, 3a/3b, the 6-way multi-genome run, and the
device-resident frontier path; pair-HMM device-kernel cells/s AND the
end-to-end production path (batched dispatch + sparse posterior
transfer) cells/s, reported side by side.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np

TESTS = "/root/reference/tests"


def check_kernels():
    from reveal_tpu.hmm.selfcheck import check_posterior_oracle

    max_err, max_tot_err, backend = check_posterior_oracle()
    return {
        "pairhmm_oracle_max_abs_err": round(max_err, 6),
        "pairhmm_oracle_logprob_err": round(max_tot_err, 6),
        "backend": backend,
    }


def bench_rem(files, iters=1, **kw):
    from reveal_tpu.align.rem import align_genomes

    best = None
    for _ in range(iters):
        t0 = time.time()
        G, idx = align_genomes(list(files), minlength=20, **kw)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    mbp = idx.main.nT / 1e6
    return mbp / best, best


def rem_compute_only(files, iters=2):
    """SA + LCP + the whole native recursion loop on the same bytes —
    the exact scope refbench times for the reference engine (its driver
    reads the fasta untimed and emits no graph).  Best of `iters`."""
    from reveal_tpu.core.io_fasta import fasta_reader
    from reveal_tpu.core.textstore import TextStore
    from reveal_tpu.native import build_esa_native, rem2_loop_native

    ts = TextStore()
    for fn in files:
        ts.add_sample(fn)
        for _name, seq in fasta_reader(fn):
            ts.add_sequence(seq)
    T, _SO, nsep = ts.build()
    best = None
    for _ in range(iters):
        Tc = T.copy()
        t0 = time.time()
        sa, lcp, sai = build_esa_native(Tc)
        out = rem2_loop_native(
            Tc, sa, lcp, sai, int(nsep[0]), 20, True, 10000, 1, 1.0,
            1e-8,
        )
        dt = time.time() - t0
        assert out is not None and len(out) > 0
        best = dt if best is None else min(best, dt)
    return best


def ref_c_baseline(fa, fb, timeout=600):
    """The HONEST baseline: the reference engine's own C hot path,
    compiled in place from /root/reference (refbench/refbench.c links
    the reference's libdivsufsort and re-runs its Kasai/getmums/split/
    bubble_sort loops with a longest-MUM picker).  Returns the refbench
    JSON dict.  The number EXCLUDES the reference's Python-side picker
    + networkx graph surgery (py2, unbuildable here), i.e. it is an
    upper bound on reference speed — generous to the reference."""
    exe = os.path.join(REPO, "refbench", "refbench")
    if not os.path.exists(exe):
        subprocess.run(
            [os.path.join(REPO, "refbench", "build.sh")],
            check=True,
            capture_output=True,
            timeout=timeout,
        )
    best = None
    for _ in range(2):
        out = subprocess.run(
            [exe, fa, fb, "20"],
            capture_output=True,
            text=True,
            timeout=timeout,
            check=True,
        )
        d = json.loads(out.stdout.strip())
        tot = (
            d["ref_c_sa_seconds"]
            + d["ref_c_lcp_seconds"]
            + d["ref_c_rem_seconds"]
        )
        if best is None or tot < best[0]:
            best = (tot, d)
    best[1]["ref_c_total_seconds"] = round(best[0], 4)
    return best[1]


def ref_c_multi_baseline(files, timeout=600):
    """Reference multi-genome baseline (VERDICT r4 item 7): the
    reference's own multiMUM machinery (getmultimums LCP-interval walk,
    reveal.c:436-580) driven through the LIFO recursion with a
    longest-multiMUM pick (refbench --remmulti).  Omits the Python
    chain picker + graph surgery — generous to the reference."""
    exe = os.path.join(REPO, "refbench", "refbench")
    if not os.path.exists(exe):
        subprocess.run(
            [os.path.join(REPO, "refbench", "build.sh")],
            check=True,
            capture_output=True,
            timeout=timeout,
        )
    best = None
    for _ in range(2):
        out = subprocess.run(
            [exe, "--remmulti"] + list(files) + ["--minl", "20"],
            capture_output=True,
            text=True,
            timeout=timeout,
            check=True,
        )
        d = json.loads(out.stdout.strip())
        tot = (
            d["ref_c_sa_seconds"]
            + d["ref_c_lcp_seconds"]
            + d["ref_c_remmulti_seconds"]
        )
        if best is None or tot < best[0]:
            best = (tot, d)
    best[1]["ref_c_total_seconds"] = round(best[0], 4)
    return best[1]


def cpu_proxy_rem(files, timeout=1800):
    """Measured reference-CPU proxy: pure-numpy engine in a subprocess
    (native kernels disabled, CPU jax platform, device never touched)."""
    prog = (
        "import sys,time;sys.path.insert(0,%r);"
        "from reveal_tpu.align.rem import align_genomes;"
        "t0=time.time();"
        "G,idx=align_genomes(%r,minlength=20,backend='np');"
        "print('PROXY',time.time()-t0,idx.main.nT)" % (REPO, list(files))
    )
    env = dict(os.environ)
    env["REVEAL_TPU_DISABLE_NATIVE"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("PROXY"):
            _, dt, nt = line.split()
            return (float(nt) / 1e6) / float(dt), float(dt)
    raise RuntimeError(
        "cpu proxy failed: %s %s" % (out.stdout[-200:], out.stderr[-500:])
    )


def _refprobcons_exe(timeout=600):
    exe = os.path.join(REPO, "refbench", "refprobcons")
    if not os.path.exists(exe):
        subprocess.run(
            [os.path.join(REPO, "refbench", "build.sh")],
            check=True,
            capture_output=True,
            timeout=timeout,
        )
    return exe


def ref_probcons_msa(jobs, consistency=2, refinement=100, consgap=1,
                     timeout=1800):
    """Run the reference ProbCons engine (its own Probcons.cc DoAlign,
    compiled in place — refbench/refprobcons) over the given per-bubble
    allele lists, bpalign-style.  Returns the driver's JSON dict."""
    import tempfile

    exe = _refprobcons_exe()
    with tempfile.NamedTemporaryFile(
        "w", suffix=".bubbles", delete=False
    ) as f:
        for aobjs in jobs:
            f.write("#bubble\n")
            for name, seq in aobjs:
                f.write(">%s\n%s\n" % (name, seq))
        path = f.name
    try:
        out = subprocess.run(
            [
                exe, "--msa", path,
                "--consistency", str(consistency),
                "--refinement", str(refinement),
                "--consgap", str(consgap),
            ],
            capture_output=True,
            text=True,
            timeout=timeout,
            check=True,
        )
        return json.loads(out.stdout.strip())
    finally:
        os.unlink(path)


def ref_probcons_posteriors(pairs, iters=1, timeout=900):
    """Time ONLY the reference's fwd+bwd+posterior DP
    (ProbabilisticModel.h:102,194,302) on the given pairs — the
    apples-to-apples single-core baseline for the Pallas pair-HMM
    kernel's cells/s."""
    import tempfile

    exe = _refprobcons_exe()
    with tempfile.NamedTemporaryFile(
        "w", suffix=".pairs", delete=False
    ) as f:
        for a, b in pairs:
            f.write("%s\n%s\n" % (a, b))
        path = f.name
    try:
        out = subprocess.run(
            [exe, "--posteriors", path, "--iters", str(iters)],
            capture_output=True,
            text=True,
            timeout=timeout,
            check=True,
        )
        return json.loads(out.stdout.strip())
    finally:
        os.unlink(path)


def bench_pairhmm(B=128, L=512, iters=5):
    """Returns (device_kernel_cps, e2e_production_cps).

    device kernel = the Pallas posterior batches streamed back to back
    (distinct inputs per dispatch, one drain of the per-pair totals at
    the end — the refine stage keeps many batches in flight, and a
    per-batch scalar fetch would charge the tunnel round-trip ~30-50ms
    to every batch; fetch-free block_until_ready timing is NOT used
    because the axon tunnel returns before the dispatch completes and
    reads ~100x high); e2e = the production entry
    hmm.msa.batch_posteriors including the sparse device->host
    posterior transfer the refine pipeline actually pays for."""
    from reveal_tpu.hmm.msa import batch_posteriors

    rng = np.random.default_rng(0)

    def mkpairs(r):
        return [
            (
                "".join(r.choice(list("ACGT"), size=L - 10)),
                "".join(r.choice(list("ACGT"), size=L - 5)),
            )
            for _ in range(B)
        ]

    pairs = mkpairs(rng)
    cells = float(sum(len(a) * len(b) for a, b in pairs))

    dev_cps = None
    try:
        from reveal_tpu.hmm.pairhmm import _pad_with_dummy
        from reveal_tpu.hmm.pallas_pairhmm import (
            _get_pallas_kernels,
            _round_up,
        )

        posterior_batch = _get_pallas_kernels()
        L1p = L + 1
        L2p = _round_up(L + 1, 128)

        def pack(p):
            xb = np.stack(
                [_pad_with_dummy(a.encode(), L1p - 1) for a, b in p]
            )
            yb = np.stack(
                [_pad_with_dummy(b.encode(), L2p - 1) for a, b in p]
            )
            lx = np.array([len(a) for a, b in p], dtype=np.int32)
            ly = np.array([len(b) for a, b in p], dtype=np.int32)
            return xb, yb, lx, ly

        ins = [pack(mkpairs(np.random.default_rng(s))) for s in range(iters)]
        _p, tot = posterior_batch(*ins[0])
        np.asarray(tot)  # warm + sync
        t0 = time.time()
        tots = []
        for xb, yb, lx, ly in ins:
            _p, tot = posterior_batch(xb, yb, lx, ly)
            tots.append(tot)
        for tt in tots:
            np.asarray(tt)  # drain: forces every dispatch to completion
        dev_cps = cells * iters / (time.time() - t0)
    except Exception:
        pass

    from reveal_tpu.hmm.msa import batch_posteriors_cut

    batch_posteriors_cut(pairs)  # warm
    t0 = time.time()
    for _ in range(iters):
        batch_posteriors_cut(pairs)
    e2e_cps = cells / ((time.time() - t0) / iters)

    batch_posteriors(pairs)  # warm
    t0 = time.time()
    for _ in range(iters):
        batch_posteriors(pairs)
    e2e_dense_cps = cells / ((time.time() - t0) / iters)
    return dev_cps, e2e_cps, e2e_dense_cps


def main():
    extra = {}

    # ---- correctness gate (fail loudly; no numbers from broken kernels)
    try:
        extra.update(check_kernels())
    except Exception as e:
        print(
            json.dumps(
                {
                    "metric": "rem_2a2b_mbp_per_s",
                    "value": None,
                    "unit": "Mbp/s",
                    "vs_baseline": None,
                    "extra": {"error": "kernel selfcheck FAILED: %s" % e},
                }
            )
        )
        sys.exit(1)

    # ---- primary: rem 2a2b production path (best of 2: host-side CPU
    # noise was measured at +-30% between back-to-back runs) ------------
    r22, dt22 = bench_rem([TESTS + "/2a.fa", TESTS + "/2b.fa"], iters=2)
    extra["rem_2a2b_seconds"] = round(dt22, 2)

    # primary baseline: the reference's own C engine, compiled in place
    # and timed on the same bytes (SA + LCP + full recursive MUM/split
    # loop; excludes the reference's Python graph surgery -> generous
    # to the reference).  vs_baseline = ref_c_seconds / our_seconds.
    vs = None
    try:
        rc = ref_c_baseline(TESTS + "/2a.fa", TESTS + "/2b.fa")
        extra["ref_c_sa_seconds"] = rc["ref_c_sa_seconds"]
        extra["ref_c_lcp_seconds"] = rc["ref_c_lcp_seconds"]
        extra["ref_c_rem_seconds"] = rc["ref_c_rem_seconds"]
        extra["ref_c_total_seconds"] = rc["ref_c_total_seconds"]
        extra["ref_c_rem_steps"] = rc["rem_steps"]
        extra["baseline_kind"] = (
            "reference C engine compiled from /root/reference "
            "(divsufsort + Kasai + recursive longest-MUM split loop, "
            "single thread, no Python overhead), same input bytes"
        )
        # matched scope: ref_c times SA + LCP + the recursion loop ONLY
        # (its driver reads the bytes untimed and emits no graph), so
        # the like-for-like ratio uses OUR SA + LCP + recursion loop on
        # the same bytes; the e2e ratio (our fasta IO + graph surgery
        # included vs their none) is reported alongside.
        try:
            cdt = rem_compute_only(
                [TESTS + "/2a.fa", TESTS + "/2b.fa"], iters=3
            )
            extra["rem_2a2b_compute_seconds"] = round(cdt, 3)
            vs = rc["ref_c_total_seconds"] / cdt
            extra["rem_2a2b_e2e_vs_ref_c"] = round(
                rc["ref_c_total_seconds"] / dt22, 3
            )
        except Exception:
            vs = rc["ref_c_total_seconds"] / dt22
    except Exception as e:  # pragma: no cover
        extra["ref_c_error"] = str(e)[:200]

    # reference scaling curve (VERDICT r3 item 4): ref_c on 3a3b too,
    # so vs-reference is a curve, not a point
    try:
        rc3 = ref_c_baseline(TESTS + "/3a.fa", TESTS + "/3b.fa")
        extra["ref_c_3a3b_total_seconds"] = rc3["ref_c_total_seconds"]
        extra["ref_c_3a3b_rem_steps"] = rc3["rem_steps"]
    except Exception as e:  # pragma: no cover
        extra["ref_c_3a3b_error"] = str(e)[:200]

    # multi-genome reference baseline (VERDICT r4 item 7): the 6-way
    # rem rows get a reference ratio (ref_c time / our time, >1 = win)
    try:
        rc6 = ref_c_multi_baseline(
            [
                TESTS + "/" + f
                for f in (
                    "1a.fa", "1b.fa", "1c.fa", "1d.fa", "1e.fa", "1f.fa"
                )
            ]
        )
        extra["ref_c_6way_total_seconds"] = rc6["ref_c_total_seconds"]
        extra["ref_c_6way_rem_steps"] = rc6["rem_steps"]
    except Exception as e:  # pragma: no cover
        extra["ref_c_6way_error"] = str(e)[:200]

    # secondary: the repo's own pure-numpy engine (same algorithm,
    # identical output graph) as a measured worst-case yardstick
    try:
        pr, pdt = cpu_proxy_rem([TESTS + "/2a.fa", TESTS + "/2b.fa"])
        extra["rem_2a2b_numpy_proxy_seconds"] = round(pdt, 2)
        extra["rem_2a2b_numpy_proxy_mbp_per_s"] = round(pr, 4)
        if vs is None:
            extra["baseline_kind"] = (
                "measured pure-numpy engine (no native, no device), "
                "same input"
            )
            vs = r22 / pr
    except Exception as e:  # pragma: no cover
        extra["proxy_error"] = str(e)[:200]

    # ---- secondary rem configs ----------------------------------------
    # Pairwise --frontier rows run the whole-recursion device loop
    # (index/devloop.py): ONE dispatch for the complete recursion, then
    # host graph replay — *_frontier_dispatches / *_frontier_levels
    # record that.  The multi-genome frontier is still per-level
    # dispatched and tunnel-bound, so the 6-way row runs in a
    # timeout-guarded subprocess (see below).
    for tag, files, kw in (
        ("rem_1a1b", ["1a.fa", "1b.fa"], {}),
        ("rem_3a3b", ["3a.fa", "3b.fa"], {}),
        (
            "rem_6way_1af",
            ["1a.fa", "1b.fa", "1c.fa", "1d.fa", "1e.fa", "1f.fa"],
            {},
        ),
        # iters=2 on the 1a1b frontier: the first call pays the one-time
        # kernel compile/load over the tunnel; best-of-2 is the warm
        # per-dispatch cost the row is meant to measure
        ("rem_1a1b_frontier", ["1a.fa", "1b.fa"],
         {"frontier": True, "iters": 2}),
        ("rem_2a2b_frontier", ["2a.fa", "2b.fa"],
         {"frontier": True, "iters": 2}),
    ):
        try:
            r, dt = bench_rem([TESTS + "/" + f for f in files], **kw)
            extra[tag + "_mbp_per_s"] = round(r, 3)
            extra[tag + "_seconds"] = round(dt, 2)
            if kw.get("frontier"):
                from reveal_tpu.index import devloop

                if devloop.LAST_STATS:
                    extra[tag + "_dispatches"] = devloop.LAST_STATS[
                        "dispatches"
                    ]
                    extra[tag + "_levels"] = devloop.LAST_STATS["levels"]
                    # sequential decision steps inside the one dispatch
                    # (trim + chain + repair) — the kernel's cost model
                    # is ~137us per sequential step (TODO.md r3 notes)
                    for k in (
                        "trim_steps", "chain_steps", "repair_steps",
                        "forest", "slots", "host_prefix_seconds",
                        "forest_seconds", "defer_max",
                    ):
                        if k in devloop.LAST_STATS:
                            extra[tag + "_" + k] = devloop.LAST_STATS[k]
        except Exception as e:  # pragma: no cover
            extra[tag + "_error"] = str(e)[:200]

    # 6-way frontier (per-level device dispatches over the tunnel —
    # slow; subprocess so a stall cannot wedge the rest of the bench)
    try:
        code = (
            "import sys, time, json; sys.path.insert(0, %r);"
            "from reveal_tpu.align.rem import align_genomes;"
            "from reveal_tpu.index import devloop;"
            "t0=time.time();"
            "G, idx = align_genomes([%r + '/' + f for f in "
            "('1a.fa','1b.fa','1c.fa','1d.fa','1e.fa','1f.fa')], "
            "minlength=20, frontier=True);"
            "dt=time.time()-t0;"
            "t1=time.time();"
            "G2, idx2 = align_genomes([%r + '/' + f for f in "
            "('1a.fa','1b.fa','1c.fa','1d.fa','1e.fa','1f.fa')], "
            "minlength=20, frontier=True);"
            "dt2=time.time()-t1;"
            "st=dict(devloop.LAST_STATS);"
            "print(json.dumps({'mbp': idx.main.nT/1e6/min(dt,dt2), "
            "'s': min(dt, dt2), 'cold_s': dt, "
            "'dispatches': st.get('dispatches'), "
            "'levels': st.get('levels'), "
            "'anchors': st.get('anchors')}))"
        ) % (REPO, TESTS, TESTS)
        p = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=1500,
        )
        row = json.loads(p.stdout.strip().splitlines()[-1])
        extra["rem_6way_1af_frontier_mbp_per_s"] = round(row["mbp"], 3)
        extra["rem_6way_1af_frontier_seconds"] = round(row["s"], 2)
        extra["rem_6way_1af_frontier_cold_seconds"] = round(
            row.get("cold_s", row["s"]), 2
        )
        for k in ("dispatches", "levels", "anchors"):
            if row.get(k) is not None:
                extra["rem_6way_1af_frontier_" + k] = row[k]
    except Exception as e:  # pragma: no cover
        extra["rem_6way_1af_frontier_error"] = str(e)[:200]

    # local-CPU frontier evidence (VERDICT r2 item 6): the same device
    # loop dispatched to LOCAL CPU devices in a subprocess — separates
    # tunnel latency from kernel cost.  Reports cold (first process
    # call: compile+run) and warm (second call in-process: run only).
    try:
        code = (
            "import os, sys, time, json;"
            "os.environ['JAX_PLATFORMS']='cpu';"
            "sys.path.insert(0, %r);"
            "import jax; jax.config.update('jax_platforms','cpu');"
            "from reveal_tpu.align.rem import align_genomes;"
            "import reveal_tpu.index.devloop as dl;"
            "t0=time.time();"
            "align_genomes([%r+'/1a.fa', %r+'/1b.fa'], minlength=20,"
            " frontier=True);"
            "t1=time.time();"
            "align_genomes([%r+'/1a.fa', %r+'/1b.fa'], minlength=20,"
            " frontier=True);"
            "t2=time.time();"
            "print(json.dumps({'cold': t1-t0, 'warm': t2-t1,"
            " 'stats': dl.LAST_STATS}))"
        ) % (REPO, TESTS, TESTS, TESTS, TESTS)
        p = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=900,
        )
        row = json.loads(p.stdout.strip().splitlines()[-1])
        extra["frontier_local_cpu_1a1b_cold_seconds"] = round(
            row["cold"], 2
        )
        extra["frontier_local_cpu_1a1b_warm_seconds"] = round(
            row["warm"], 2
        )
        if row.get("stats"):
            extra["frontier_local_cpu_1a1b_dispatches"] = row["stats"][
                "dispatches"
            ]
    except Exception as e:  # pragma: no cover
        extra["frontier_local_cpu_error"] = str(e)[:200]

    # ---- production refine stage: unzip + device pair-HMM MSA over the
    # 6-way graph (the end-to-end refine path BASELINE.json names second)
    try:
        import tempfile

        from reveal_tpu.align.rem import align_genomes
        from reveal_tpu.core.io_gfa import read_gfa, write_gfa
        from reveal_tpu.graph.unzip import unzip_graph
        from reveal_tpu.hmm.refine import refine_all

        from reveal_tpu.align.graphops import prune_nodes
        from reveal_tpu.core.io_gfa import seq2node

        G6, idx6 = align_genomes(
            [
                TESTS + "/" + f
                for f in (
                    "1a.fa", "1b.fa", "1c.fa", "1d.fa", "1e.fa", "1f.fa"
                )
            ],
            minlength=20,
        )
        # rem_cmd post-processing (cli.py rem_cmd): multi-sample prune +
        # interval-node -> sequence conversion before the stage boundary
        prune_nodes(G6, T=idx6.main.T)
        seq2node(G6, idx6.main.T)
        # GFA round trips = the production stage boundaries (node seqs
        # and per-path offsets are normalized on write+read, exactly as
        # between the CLI stages)
        with tempfile.TemporaryDirectory() as td:
            fn = write_gfa(G6, None, outputfile=td + "/b6.gfa")
            G6 = read_gfa(fn)
            unzip_graph(G6, minunzip=10)
            fn = write_gfa(G6, None, outputfile=td + "/b6u.gfa")
            G6 = read_gfa(fn)
        # extract the per-bubble MSA workload BEFORE refine_all mutates
        # the graph — the identical problem set is handed to the
        # reference ProbCons engine below (VERDICT r3 item 2)
        ref_jobs = []
        try:
            from reveal_tpu.hmm.refine import collect_bubble_aobjs

            ref_jobs = collect_bubble_aobjs(
                G6, minsize=2, mindiff=0, maxsize=10000
            )
        except Exception:
            pass
        t0 = time.time()
        refine_all(G6, maxsize=10000, minsize=2, mindiff=0, minconf=0)
        ours = time.time() - t0
        extra["refine_6way_seconds"] = round(ours, 2)

        # reference ProbCons baseline on the same bubbles: the
        # reference's own DoAlign (Probcons.cc:312) with bpalign's
        # parameters (consistency=2, refinement=100, consgap=1 —
        # reveal.py:144-146 defaults), compiled in place
        try:
            rp = ref_probcons_msa(ref_jobs)
            extra["ref_probcons_6way_seconds"] = round(
                rp["ref_probcons_seconds"], 2
            )
            extra["ref_probcons_6way_bubbles"] = rp["n_bubbles"]
            extra["ref_probcons_6way_cells_per_sec"] = round(
                rp["ref_probcons_cells_per_sec"], 1
            )
            extra["refine_6way_vs_ref"] = round(
                rp["ref_probcons_seconds"] / ours, 3
            )
        except Exception as e:  # pragma: no cover
            extra["ref_probcons_error"] = str(e)[:200]
    except Exception as e:  # pragma: no cover
        extra["refine_6way_error"] = str(e)[:200]

    # ---- large-bubble refine: the device pair-HMM as the PRODUCTION
    # path (VERDICT r5 item 3b).  6 synthetic genomes with a divergent
    # middle region leave long low-identity bubbles; the posterior
    # volume exceeds the native-host crossover (32M cells), so
    # refine_all runs the device posterior path end-to-end.  Ratio vs
    # the reference's own ProbCons engine on the identical bubbles.
    try:
        from scripts.bigbubble_bench import make_genomes

        from reveal_tpu.align.graphops import prune_nodes
        from reveal_tpu.align.rem import align_seqs
        from reveal_tpu.core.io_gfa import seq2node
        from reveal_tpu.graph.unzip import unzip_graph
        from reveal_tpu.hmm.refine import (
            collect_bubble_aobjs,
            refine_all,
        )

        genomes = make_genomes()
        Gb, idxb = align_seqs(genomes, minlength=20)
        prune_nodes(Gb, T=idxb.main.T)
        seq2node(Gb, idxb.main.T)
        unzip_graph(Gb, minunzip=10)
        bjobs = collect_bubble_aobjs(
            Gb, minsize=2, mindiff=0, maxsize=10000
        )
        bcells = sum(
            (len(a[i][1]) + 1) * (len(a[j][1]) + 1)
            for a in bjobs
            for i in range(len(a))
            for j in range(i + 1, len(a))
        )
        t0 = time.time()
        refine_all(Gb, maxsize=10000, minsize=2, mindiff=0, minconf=0)
        bt = time.time() - t0
        extra["refine_bigbubble_seconds"] = round(bt, 2)
        extra["refine_bigbubble_mcells"] = round(bcells / 1e6, 1)
        extra["refine_bigbubble_cells_per_sec"] = round(bcells / bt, 1)
        try:
            rpb = ref_probcons_msa(bjobs, timeout=3600)
            extra["ref_probcons_bigbubble_seconds"] = round(
                rpb["ref_probcons_seconds"], 2
            )
            extra["refine_bigbubble_vs_ref"] = round(
                rpb["ref_probcons_seconds"] / bt, 3
            )
        except Exception as e:  # pragma: no cover
            extra["ref_probcons_bigbubble_error"] = str(e)[:200]
    except Exception as e:  # pragma: no cover
        extra["refine_bigbubble_error"] = str(e)[:200]

    # ---- pair-HMM: device kernel AND e2e production path ---------------
    try:
        dev_cps, e2e_cps, e2e_dense = bench_pairhmm(B=128, L=512)
        dev_wide, e2e_wide, e2e_dense_w = bench_pairhmm(
            B=32, L=2048, iters=3
        )
        if dev_cps:
            extra["pairhmm_dev_b128_l512_cells_per_sec"] = round(dev_cps, 1)
        if dev_wide:
            extra["pairhmm_dev_b32_l2048_cells_per_sec"] = round(dev_wide, 1)
        # e2e = the production stage-1 transfer path (on-device 0.01
        # cutoff + compaction + device MEA scores; batch_posteriors_cut)
        extra["pairhmm_e2e_b128_l512_cells_per_sec"] = round(e2e_cps, 1)
        extra["pairhmm_e2e_b32_l2048_cells_per_sec"] = round(e2e_wide, 1)
        # dense-fetch legacy path, kept for transparency
        extra["pairhmm_e2e_dense_b128_l512_cells_per_sec"] = round(
            e2e_dense, 1
        )
        extra["pairhmm_e2e_dense_b32_l2048_cells_per_sec"] = round(
            e2e_dense_w, 1
        )
        # reference single-core baseline for the same DP (VERDICT r3
        # item 2): a subset of pairs at each bench shape is enough —
        # the C++ DP's per-cell rate is shape-insensitive; n_pairs is
        # reported so the subset is auditable
        try:
            rng = np.random.default_rng(7)

            def mk(B_, L_):
                return [
                    (
                        "".join(rng.choice(list("ACGT"), size=L_ - 10)),
                        "".join(rng.choice(list("ACGT"), size=L_ - 5)),
                    )
                    for _ in range(B_)
                ]

            rp1 = ref_probcons_posteriors(mk(8, 512), iters=2)
            rp2 = ref_probcons_posteriors(mk(2, 2048), iters=2)
            extra["ref_probcons_post_l512_cells_per_sec"] = round(
                rp1["ref_probcons_cells_per_sec"], 1
            )
            extra["ref_probcons_post_l2048_cells_per_sec"] = round(
                rp2["ref_probcons_cells_per_sec"], 1
            )
            if dev_wide:
                extra["pairhmm_dev_vs_ref_l2048"] = round(
                    dev_wide / rp2["ref_probcons_cells_per_sec"], 1
                )
            extra["pairhmm_e2e_vs_ref_l2048"] = round(
                e2e_wide / rp2["ref_probcons_cells_per_sec"], 1
            )
            extra["pairhmm_e2e_vs_ref_l512"] = round(
                e2e_cps / rp1["ref_probcons_cells_per_sec"], 1
            )
        except Exception as e:  # pragma: no cover
            extra["ref_probcons_post_error"] = str(e)[:200]
    except Exception as e:  # pragma: no cover
        extra["pairhmm_error"] = str(e)[:200]

    # ---- headline assignment-metric rows (VERDICT r3 item 7):
    # Mbp/s per chip (device rem path) next to the reference's Mbp/s
    # per core, plus the 3a3b scaling ratio
    try:
        if "ref_c_total_seconds" in extra:
            extra["ref_c_mbp_per_s_per_core"] = round(
                (r22 * dt22) / extra["ref_c_total_seconds"], 3
            )
        if "rem_2a2b_frontier_mbp_per_s" in extra:
            extra["mbp_per_s_per_chip"] = extra[
                "rem_2a2b_frontier_mbp_per_s"
            ]
        if (
            "ref_c_3a3b_total_seconds" in extra
            and "rem_3a3b_seconds" in extra
        ):
            extra["rem_3a3b_vs_ref_c"] = round(
                extra["ref_c_3a3b_total_seconds"]
                / extra["rem_3a3b_seconds"],
                3,
            )
        if "ref_c_6way_total_seconds" in extra:
            if "rem_6way_1af_seconds" in extra:
                extra["rem_6way_vs_ref_c"] = round(
                    extra["ref_c_6way_total_seconds"]
                    / extra["rem_6way_1af_seconds"],
                    3,
                )
            if "rem_6way_1af_frontier_seconds" in extra:
                extra["rem_6way_frontier_vs_ref_c"] = round(
                    extra["ref_c_6way_total_seconds"]
                    / extra["rem_6way_1af_frontier_seconds"],
                    3,
                )
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "rem_2a2b_mbp_per_s",
                "value": round(r22, 3),
                "unit": "Mbp/s",
                "vs_baseline": round(vs, 3) if vs is not None else None,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
