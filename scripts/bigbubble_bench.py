"""Large-bubble refine scenario (VERDICT r5 item 3b): an end-to-end
refine workload whose posterior volume exceeds the native-host
crossover (32M cells), so production refine runs the DEVICE pair-HMM
path — compared against the reference's own ProbCons engine
(refbench/refprobcons) on the identical bubbles.

Workload: 6 synthetic genomes from one ancestor (~1% SNPs) with a
highly divergent middle region (~15% + indels) -> rem leaves a long
low-identity bubble whose alleles the refine stage must realign.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def make_genomes(seed=5, n=6, L=30000, div_start=12000, div_len=4000):
    rng = np.random.default_rng(seed)
    anc = rng.integers(0, 4, L)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    out = []
    for k in range(n):
        g = anc.copy()
        # background SNPs ~0.8%
        m = rng.random(L) < 0.008
        g[m] = (g[m] + rng.integers(1, 4, int(m.sum()))) % 4
        seq = bases[g]
        # divergent middle: 15% SNPs + scattered indels
        mid = seq[div_start:div_start + div_len].copy()
        mm = rng.random(div_len) < 0.15
        midv = np.frombuffer(mid.tobytes(), dtype=np.uint8).copy()
        repl = bases[rng.integers(0, 4, int(mm.sum()))]
        midv[mm] = repl
        mid_s = bytearray(midv.tobytes())
        for _ in range(30):  # indels up to 12bp
            p = int(rng.integers(0, len(mid_s)))
            ln = int(rng.integers(1, 13))
            if rng.random() < 0.5:
                del mid_s[p:p + ln]
            else:
                ins = bases[rng.integers(0, 4, ln)].tobytes()
                mid_s[p:p] = ins
        full = seq[:div_start].tobytes() + bytes(mid_s) + seq[div_start + div_len:].tobytes()
        out.append(("g%d" % k, full.decode()))
    return out


def main():
    from reveal_tpu.align.graphops import prune_nodes
    from reveal_tpu.align.rem import align_seqs
    from reveal_tpu.core.io_gfa import seq2node
    from reveal_tpu.graph.unzip import unzip_graph
    from reveal_tpu.hmm.refine import collect_bubble_aobjs, refine_all

    genomes = make_genomes()
    t0 = time.time()
    G, idx = align_seqs(genomes, minlength=20)
    prune_nodes(G, T=idx.main.T)
    seq2node(G, idx.main.T)
    unzip_graph(G, minunzip=10)
    print(f"rem+unzip: {time.time()-t0:.2f}s", flush=True)

    jobs = collect_bubble_aobjs(G, minsize=2, mindiff=0, maxsize=10000)
    cells = sum(
        (len(a[i][1]) + 1) * (len(a[j][1]) + 1)
        for a in jobs
        for i in range(len(a))
        for j in range(i + 1, len(a))
    )
    big = max(
        (max(len(s) for _n, s in a) for a in jobs), default=0
    )
    print(f"bubbles: {len(jobs)}, posterior cells: {cells/1e6:.1f}M, "
          f"longest allele: {big}", flush=True)

    t0 = time.time()
    refine_all(G, maxsize=10000, minsize=2, mindiff=0, minconf=0)
    ours = time.time() - t0
    print(f"refine (device path): {ours:.2f}s  "
          f"({cells/ours/1e6:.1f} Mcells/s)", flush=True)

    # reference ProbCons on the same bubbles
    sys.path.insert(0, "/root/repo")
    import bench

    t0 = time.time()
    rp = bench.ref_probcons_msa(jobs)
    print(f"refprobcons: {rp['ref_probcons_seconds']:.2f}s  "
          f"({rp['ref_probcons_cells_per_sec']/1e6:.2f} Mcells/s)  "
          f"ratio={rp['ref_probcons_seconds']/ours:.2f}", flush=True)


if __name__ == "__main__":
    main()
