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
    # substitutions: change base, KEEP id (homology preserved like the
    # reference's `mut` which tracks ids through substitutions)
    nsub = rng.poisson(subrate * n)
    pos = rng.integers(0, n, size=nsub)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    seq = seq.copy()
    for p in pos:
        cur = seq[p]
        choices = bases[bases != cur]
        seq[p] = choices[rng.integers(0, len(choices))]

    # indels
    nind = rng.poisson(indelrate * n)
    ids = seq_ids
    for _ in range(nind):
        l = int(min(rng.zipf(zipf_a), maxindel))
        p = int(rng.integers(0, len(seq)))
        if rng.random() < 0.5 and len(seq) > l + 1:  # deletion
            seq = np.concatenate([seq[:p], seq[p + l :]])
            ids = np.concatenate([ids[:p], ids[p + l :]])
        else:  # insertion of random sequence, ids = -1
            ins = bases[rng.integers(0, 4, size=l)]
            seq = np.concatenate([seq[:p], ins, seq[p:]])
            ids = np.concatenate(
                [ids[:p], np.full(l, -1, dtype=np.int64), ids[p:]]
            )
    return ids, seq


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
