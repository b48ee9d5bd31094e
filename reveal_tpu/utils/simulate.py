"""Simulation / accuracy harness.

Equivalent of /root/reference/utils/simulate.py: mutate an ancestral genome
along a random tree (SNPs + zipf-length indels) while tracking per-base
ancestral ids, align the population, then score the reconstructed alignment
columns against the ground truth for per-pair TP/FP/TN/FN, F1, sensitivity,
precision — plus wall-clock runtime.

The scoring oracle: two bases are truly homologous iff they carry the same
ancestral base id; an aligner's columns assert homology for the bases it
stacks.  We compare asserted pairs against true pairs per sequence pair.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Dict

import numpy as np

log = logging.getLogger(__name__)


def mutate(
    seq_ids: np.ndarray,
    seq: np.ndarray,
    rng: np.random.Generator,
    subrate: float = 0.01,
    indelrate: float = 0.001,
    zipf_a: float = 1.7,
    maxindel: int = 1000,
):
    """One branch of evolution: returns (new_ids, new_seq).

    ids: int64 ancestral base ids (-1 for inserted material).
    """
    n = len(seq)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    # substitutions: change base, KEEP id (homology preserved like the
    # reference's `mut` which tracks ids through substitutions);
    # vectorized uniform pick among the 3 other bases
    nsub = rng.poisson(subrate * n)
    pos = rng.integers(0, n, size=nsub)
    seq = seq.copy()
    cur_idx = np.searchsorted(bases, seq[pos])
    new_idx = (cur_idx + 1 + rng.integers(0, 3, size=nsub)) % 4
    seq[pos] = bases[new_idx]

    # indels: one left-to-right pass over sorted event positions (a
    # per-event np.concatenate is O(n) each — terabytes of memcpy at
    # tens of Mbp), single concatenate at the end
    nind = rng.poisson(indelrate * n)
    epos = np.sort(rng.integers(0, n, size=nind))
    elen = np.minimum(rng.zipf(zipf_a, size=nind), maxindel).astype(int)
    edel = rng.random(size=nind) < 0.5
    pieces_seq = []
    pieces_ids = []
    ids = seq_ids
    cur = 0
    for p, l, isdel in zip(epos, elen, edel):
        p = int(max(p, cur))
        if p > n:
            break
        pieces_seq.append(seq[cur:p])
        pieces_ids.append(ids[cur:p])
        if isdel:
            cur = min(p + int(l), n)
        else:
            ins = bases[rng.integers(0, 4, size=int(l))]
            pieces_seq.append(ins)
            pieces_ids.append(np.full(int(l), -1, dtype=np.int64))
            cur = p
    pieces_seq.append(seq[cur:])
    pieces_ids.append(ids[cur:])
    return (
        np.concatenate(pieces_ids),
        np.concatenate(pieces_seq),
    )


def simulate_population(
    n: int,
    length: int,
    seed: int = 0,
    subrate: float = 0.01,
    indelrate: float = 0.001,
):
    """Random binary-ish tree: each leaf accumulates mutations from the
    ancestor.  Returns [(name, seq_str, ids)], ids per base."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    anc = bases[rng.integers(0, 4, size=length)]
    anc_ids = np.arange(length, dtype=np.int64)

    pop = [("anc", anc_ids, anc)]
    while len(pop) < n:
        name, ids, seq = pop[rng.integers(0, len(pop))]
        ids2, seq2 = mutate(ids, seq, rng, subrate, indelrate)
        pop.append(("g%d" % len(pop), ids2, seq2))
    out = []
    for name, ids, seq in pop[:n]:
        out.append((name, seq.tobytes().decode(), ids))
    return out


def score_alignment(G, T, samples: Dict[str, np.ndarray]):
    """Score a variation graph against ground-truth base ids.

    For every aligned node, bases stacked at the same column are asserted
    homologous.  Per ordered pair of samples: TP if both bases share a
    non-negative ancestral id, FP otherwise; FN = true pairs missed.
    """
    names = list(samples)
    pair_tp = {frozenset((a, b)): 0 for a in names for b in names if a < b}
    pair_fp = dict(pair_tp)

    path2id = G.graph["path2id"]
    for node, data in G.nodes.items():
        if isinstance(node, str):
            continue
        offs = data.get("offsets", {})
        if len(offs) < 2:
            continue
        if "seq" in data:
            l = len(data["seq"])
        else:
            l = node[1] - node[0]
        present = [
            (name, offs[path2id[name]])
            for name in names
            if path2id.get(name) in offs
        ]
        for i in range(len(present)):
            for j in range(i + 1, len(present)):
                na, oa = present[i]
                nb, ob = present[j]
                ida = samples[na][oa : oa + l]
                idb = samples[nb][ob : ob + l]
                m = min(len(ida), len(idb))
                eq = (ida[:m] == idb[:m]) & (ida[:m] >= 0)
                key = frozenset((na, nb))
                pair_tp[key] += int(eq.sum())
                pair_fp[key] += int(m - eq.sum())

    # true pair counts
    results = {}
    for key in pair_tp:
        a, b = sorted(key)
        ia, ib = samples[a], samples[b]
        sa = set(ia[ia >= 0].tolist())
        sb = set(ib[ib >= 0].tolist())
        true_pairs = len(sa & sb)
        tp = pair_tp[key]
        fp = pair_fp[key]
        fn = max(true_pairs - tp, 0)
        sens = tp / true_pairs if true_pairs else 0.0
        prec = tp / (tp + fp) if (tp + fp) else 0.0
        f1 = (
            2 * sens * prec / (sens + prec) if (sens + prec) > 0 else 0.0
        )
        results[(a, b)] = dict(
            tp=tp, fp=fp, fn=fn, sensitivity=sens, precision=prec, f1=f1
        )
    return results


@dataclass
class EvalResult:
    runtime: float
    per_pair: dict
    mean_f1: float


def evaluate_rem(
    n: int = 4,
    length: int = 20000,
    seed: int = 0,
    minlength: int = 20,
    backend: str = "np",
    refine: bool = False,
) -> EvalResult:
    """Simulate, align with rem (optionally + refine), score."""
    from ..align.rem import align_seqs
    from ..core.io_gfa import seq2node

    pop = simulate_population(n, length, seed=seed)
    aobjs = [(name, seq) for name, seq, ids in pop]
    samples = {name: ids for name, seq, ids in pop}

    t0 = time.time()
    G, idx = align_seqs(aobjs, minlength=minlength, backend=backend)
    if refine:
        from ..hmm.refine import refine_all

        seq2node(G, idx.main.T)
        G = refine_all(G, minlength=1, minsize=1, nrefinements=10)
    runtime = time.time() - t0

    per_pair = score_alignment(G, idx.main.T, samples)
    mean_f1 = float(
        np.mean([r["f1"] for r in per_pair.values()])
    ) if per_pair else 0.0
    return EvalResult(runtime=runtime, per_pair=per_pair, mean_f1=mean_f1)


# ---------------------------------------------------------------------------
# comparative harness: REVEAL vs external aligners (MUGSY / Pecan), with
# timed subprocess runs and pickled aggregation — the rebuilt equivalent of
# /root/reference/utils/simulate.py:79-154 (tool runners), :155-266
# (compare), :318-344 (matrices2summary), :445-563 (main/pickling)
# ---------------------------------------------------------------------------

def write_population(workdir: str, pop):
    """Write per-genome fasta + .seqids ground-truth files
    (simulate.py:384-395 layout).  Returns the fasta paths."""
    import os

    from ..core.io_fasta import fasta_writer

    fastas = []
    for name, seq, ids in pop:
        fn = os.path.join(workdir, name + ".fasta")
        fasta_writer(fn, [(name, seq)])
        with open(os.path.join(workdir, name + ".seqids"), "w") as f:
            f.write(",".join(str(int(i)) for i in ids))
        fastas.append(fn)
    return fastas


def load_seqids(workdir: str):
    import glob
    import os

    samples = {}
    for fn in glob.glob(os.path.join(workdir, "*.seqids")):
        name = os.path.splitext(os.path.basename(fn))[0]
        with open(fn) as f:
            samples[name] = np.array(
                [int(x) for x in f.read().split(",")], dtype=np.int64
            )
    return samples


def score_gfa(gfafile: str, samples: Dict[str, np.ndarray]):
    """Score a GFA produced by any tool against ground-truth base ids."""
    from ..core.io_gfa import read_gfa

    G = read_gfa(gfafile)
    return score_alignment(G, None, samples)


def _run_logged(cmd, log_path, cwd):
    import os
    import subprocess

    import reveal_tpu

    # make `python -m reveal_tpu.cli` resolvable from any cwd; keep the
    # existing PYTHONPATH (the TPU plugin site must stay on it)
    root = os.path.dirname(
        os.path.dirname(os.path.abspath(reveal_tpu.__file__))
    )
    env = dict(os.environ)
    pp = env.get("PYTHONPATH", "")
    if root not in pp.split(os.pathsep):
        env["PYTHONPATH"] = root + (os.pathsep + pp if pp else "")
    # propagate the parent's platform choice through a variable that
    # plugin sitecustomize files cannot clobber (the axon TPU plugin
    # rewrites JAX_PLATFORMS at child startup)
    if env.get("JAX_PLATFORMS") and "REVEAL_TPU_PLATFORM" not in env:
        env["REVEAL_TPU_PLATFORM"] = env["JAX_PLATFORMS"]
    with open(log_path, "w") as lf:
        t0 = time.time()
        subprocess.run(
            cmd, shell=True, check=True, cwd=cwd, stdout=lf,
            stderr=subprocess.STDOUT, env=env,
        )
        return time.time() - t0


def run_reveal(run: str, fastas, workdir: str, minlength=20, refine=True):
    """Timed pipeline run through our own CLI, mirroring
    simulate.py:79-99 (rem -> unzip -u10 -> refine --all), scored on the
    final graph."""
    import os
    import sys

    py = sys.executable
    rel = [os.path.basename(f) for f in fastas]
    steps = [
        "%s -m reveal_tpu.cli rem %s -m %d -o %s.gfa"
        % (py, " ".join(rel), minlength, run),
        "%s -m reveal_tpu.cli unzip -u10 %s.gfa" % (py, run),
        "%s -m reveal_tpu.cli refine --all %s.unzipped.gfa" % (py, run),
    ]
    rt = 0.0
    for i, cmd in enumerate(steps):
        rt += _run_logged(
            cmd, os.path.join(workdir, "%s.step%d.log" % (run, i)), workdir
        )
    gfa = os.path.join(workdir, "%s.unzipped.realigned.gfa" % run)
    samples = load_seqids(workdir)
    per_pair = score_gfa(gfa, samples)
    mean_f1 = float(np.mean([r["f1"] for r in per_pair.values()])) if per_pair else 0.0
    return EvalResult(runtime=rt, per_pair=per_pair, mean_f1=mean_f1)


def run_pecan(run: str, fastas, workdir: str):
    """Timed Pecan run (simulate.py:102-122): pecan -G out.fasta -F
    <fastas>, converted to GFA with `convert --aligned`, scored.
    Raises RuntimeError when pecan is not on PATH."""
    import os
    import shutil
    import sys

    exe = shutil.which("pecan") or shutil.which("java")
    if shutil.which("pecan") is None:
        raise RuntimeError(
            "pecan is not on PATH; install it to run the comparative "
            "harness (same requirement as the reference)"
        )
    rel = [os.path.basename(f) for f in fastas]
    rt = _run_logged(
        "pecan -G %s.fasta -F %s" % (run, " ".join(rel)),
        os.path.join(workdir, "%s.pecan.log" % run),
        workdir,
    )
    _run_logged(
        "%s -m reveal_tpu.cli convert %s.fasta --aligned"
        % (sys.executable, run),
        os.path.join(workdir, "%s.pecanconv.log" % run),
        workdir,
    )
    samples = load_seqids(workdir)
    per_pair = score_gfa(os.path.join(workdir, "%s.gfa" % run), samples)
    mean_f1 = float(np.mean([r["f1"] for r in per_pair.values()])) if per_pair else 0.0
    return EvalResult(runtime=rt, per_pair=per_pair, mean_f1=mean_f1)


def run_mugsy(run: str, fastas, workdir: str, retries: int = 10):
    """Timed MUGSY run (simulate.py:124-153) with the reference's retry
    loop; MAF output converted to GFA and scored.  Raises RuntimeError
    when mugsy is not on PATH."""
    import os
    import shutil
    import subprocess
    import sys

    if shutil.which("mugsy") is None:
        raise RuntimeError(
            "mugsy is not on PATH; install it to run the comparative "
            "harness (same requirement as the reference)"
        )
    rel = [os.path.basename(f) for f in fastas]
    cmd = "mugsy --directory %s --prefix %s %s" % (workdir, run, " ".join(rel))
    rt = None
    for i in range(retries):
        try:
            rt = _run_logged(
                cmd, os.path.join(workdir, "%s.mugsy.log" % run), workdir
            )
            break
        except subprocess.CalledProcessError:
            log.warning("mugsy run failed (%d), retrying", i)
    if rt is None:
        raise RuntimeError("mugsy failed after %d retries" % retries)
    _run_logged(
        "%s -m reveal_tpu.cli convert %s.maf" % (sys.executable, run),
        os.path.join(workdir, "%s.mafconv.log" % run),
        workdir,
    )
    samples = load_seqids(workdir)
    per_pair = score_gfa(os.path.join(workdir, "%s.gfa" % run), samples)
    mean_f1 = float(np.mean([r["f1"] for r in per_pair.values()])) if per_pair else 0.0
    return EvalResult(runtime=rt, per_pair=per_pair, mean_f1=mean_f1)


_TOOL_RUNNERS = {
    "reveal": run_reveal,
    "pecan": run_pecan,
    "mugsy": run_mugsy,
}


def compare_tools(
    tools=("reveal",),
    n: int = 4,
    length: int = 20000,
    seed: int = 0,
    workdir: str = ".",
    pickle_to=None,
    **kw,
):
    """Run every tool on one simulated population and score it; returns
    {tool: EvalResult}.  Tools whose binaries are absent are recorded as
    errors rather than aborting the sweep.  pickle_to writes the
    aggregate dict like the reference's pickled performance results
    (simulate.py:453,489)."""
    import os
    import pickle

    os.makedirs(workdir, exist_ok=True)
    pop = simulate_population(n, length, seed=seed)
    fastas = write_population(workdir, pop)

    results = {}
    for tool in tools:
        runner = _TOOL_RUNNERS[tool]
        run = "%s_n%d_s%d" % (tool, n, seed)
        try:
            results[tool] = runner(run, fastas, workdir, **(
                kw if tool == "reveal" else {}
            ))
            log.info(
                "%s: mean F1 %.4f in %.1fs",
                tool, results[tool].mean_f1, results[tool].runtime,
            )
        except Exception as e:
            log.warning("%s failed: %s", tool, e)
            results[tool] = e

    if pickle_to:
        with open(pickle_to, "wb") as f:
            pickle.dump(
                {
                    t: (
                        dict(
                            runtime=r.runtime,
                            per_pair=r.per_pair,
                            mean_f1=r.mean_f1,
                        )
                        if isinstance(r, EvalResult)
                        else repr(r)
                    )
                    for t, r in results.items()
                },
                f,
            )
    return results


def summarize(per_pair: dict) -> dict:
    """Population-level summary like matrices2summary
    (simulate.py:318-344): pooled sensitivity/precision/F1 over all
    pairs."""
    tp = sum(r["tp"] for r in per_pair.values())
    fp = sum(r["fp"] for r in per_pair.values())
    fn = sum(r["fn"] for r in per_pair.values())
    sens = tp / (tp + fn) if (tp + fn) else 1.0
    prec = tp / (tp + fp) if (tp + fp) else 1.0
    f1 = 2 * sens * prec / (sens + prec) if (sens + prec) else 0.0
    return dict(sensitivity=sens, precision=prec, f1=f1, tp=tp, fp=fp, fn=fn)


def print_results(results: dict):
    """Console table like the reference's print_results
    (simulate.py:395-443)."""
    for tool, r in sorted(results.items()):
        if isinstance(r, EvalResult):
            s = summarize(r.per_pair)
            print(
                "%-8s runtime=%8.2fs sens=%.4f prec=%.4f f1=%.4f"
                % (tool, r.runtime, s["sensitivity"], s["precision"],
                   s["f1"])
            )
        else:
            print("%-8s FAILED: %s" % (tool, r))
