"""Profile the 6-way production refine stage (VERDICT r5 item 3a):
where do the ~2.9 s beyond the native posterior batch go?

Run with JAX_PLATFORMS=cpu (the 6-way workload short-circuits to the
native host pair-HMM below 32M cells, so the device is never needed).
"""
import cProfile
import io
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

TESTS = "/root/reference/tests"


def build():
    from reveal_tpu.align.graphops import prune_nodes
    from reveal_tpu.align.rem import align_genomes
    from reveal_tpu.core.io_gfa import read_gfa, seq2node, write_gfa
    from reveal_tpu.graph.unzip import unzip_graph

    G6, idx6 = align_genomes(
        [TESTS + "/" + f for f in
         ("1a.fa", "1b.fa", "1c.fa", "1d.fa", "1e.fa", "1f.fa")],
        minlength=20,
    )
    prune_nodes(G6, T=idx6.main.T)
    seq2node(G6, idx6.main.T)
    with tempfile.TemporaryDirectory() as td:
        fn = write_gfa(G6, None, outputfile=td + "/b6.gfa")
        G6 = read_gfa(fn)
        unzip_graph(G6, minunzip=10)
        fn = write_gfa(G6, None, outputfile=td + "/b6u.gfa")
        G6 = read_gfa(fn)
    return G6


def main():
    from reveal_tpu.hmm.refine import refine_all

    G6 = build()
    t0 = time.time()
    pr = cProfile.Profile()
    pr.enable()
    refine_all(G6, maxsize=10000, minsize=2, mindiff=0, minconf=0)
    pr.disable()
    dt = time.time() - t0
    print(f"refine_all: {dt:.2f}s", flush=True)
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(35)
    print(s.getvalue())
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("tottime")
    ps.print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
