"""Finish: order and orient draft contigs into pseudomolecules.

Functional equivalent of the reference's `reveal finish`
(/root/reference/reveal/transformold.py:100-733): extract MUMs between the
reference chromosomes and the draft contigs in both orientations, cluster
them on (anti)diagonals per (contig, chromosome) pair, chain clusters per
contig to decide placement and orientation, pick the best non-overlapping
contig path per chromosome (weighted-interval DP, the reference's
bestctgpath :1314-1378), and emit pseudomolecule fasta with
reference-estimated (or fixed) N-gaps plus an .unplaced.fasta for leftover
contigs.  Rebuilt on the synteny-block machinery of transform/blocks.py
rather than ported line-by-line from the legacy module.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from ..core.encoding import rc_str
from ..core.io_fasta import fasta_reader, fasta_writer
from ..core.textstore import TextStore
from ..index.esa_index import ESAIndex
from .blocks import addctginfo, clustermumsbydiagonal

log = logging.getLogger(__name__)


@dataclass
class FinishConfig:
    minlength: int = 20
    cutn: int = 0
    maxdist: int = 90
    mincluster: int = 65
    minchainsum: int = 65
    fixedgapsize: Optional[int] = None
    defaultgapsize: int = 100
    outputunmapped: bool = True
    backend: str = "auto"


def finish(
    reference: str,
    contigs: str,
    cfg: FinishConfig,
    output: Optional[str] = None,
    split: bool = False,
) -> Tuple[str, Optional[str]]:
    """Returns (pseudomolecule fasta path, unplaced fasta path or None).
    split=True writes one fasta per pseudomolecule instead of a combined
    file (transformold --split)."""
    if output is None:
        parts = []
        for f in (os.path.basename(reference), os.path.basename(contigs)):
            parts.append(f[: f.find(".")] if "." in f else f)
        output = "_".join(parts)

    ts = TextStore()
    refnames: List[str] = []
    ctgnames: List[str] = []
    ref2seq: Dict[str, str] = {}
    ctg2seq: Dict[str, str] = {}
    ctg2range = []
    for sample in (reference, contigs):
        ts.add_sample(os.path.basename(sample))
        reader = (
            fasta_reader(sample)
            if sample == reference
            else fasta_reader(sample, cutN=cfg.cutn)
        )
        for name, seq in reader:
            iv = ts.add_sequence(seq)
            ctg2range.append(iv)
            if sample == reference:
                refnames.append(name)
                ref2seq[name] = seq
            else:
                ctgnames.append(name)
                ctg2seq[name] = seq

    idx = ESAIndex.construct(ts, backend=cfg.backend)
    mums = addctginfo(idx.getmums(cfg.minlength), ctg2range)
    idx_rc = ESAIndex.construct(ts, backend=cfg.backend, rc=True)
    rcmums = addctginfo(idx_rc.getmums(cfg.minlength), ctg2range)

    blocks = (
        clustermumsbydiagonal(
            mums, maxdist=cfg.maxdist, minclustsize=cfg.mincluster, rcmums=False
        )
        if mums
        else []
    )
    blocks += (
        clustermumsbydiagonal(
            rcmums, maxdist=cfg.maxdist, minclustsize=cfg.mincluster, rcmums=True
        )
        if rcmums
        else []
    )

    nref = len(refnames)

    # ---- per-contig placement: best chain of co-oriented clusters -------
    # group blocks per (ctgid, refid, orientation)
    groups: Dict[Tuple[int, int, int], List] = {}
    for b in blocks:
        s1, e1, s2, e2, o, score, refid, ctgid = b
        groups.setdefault((ctgid, refid, o), []).append(b)

    placements: Dict[int, Tuple[int, int, int, int, int]] = {}
    # ctgid -> (refid, refstart, refend, orientation, chainscore)
    for (ctgid, refid, o), bs in groups.items():
        # colinear chain: for o==0 increasing in both axes; for o==1
        # increasing in ref while decreasing in qry — chained with a
        # weighted longest-increasing-subsequence style DP over ref order
        bs.sort(key=lambda b: b[0])
        best_end = []  # per block: best chain score ending here
        for i, b in enumerate(bs):
            best = b[5]
            for j in range(i):
                pb = bs[j]
                if pb[1] <= b[0]:
                    if (o == 0 and pb[3] <= b[2]) or (o == 1 and pb[2] >= b[3]):
                        cand = best_end[j] + b[5]
                        if cand > best:
                            best = cand
                best = best
            best_end.append(best)
        chainsum = max(best_end) if best_end else 0
        if chainsum < cfg.minchainsum:
            continue
        refstart = min(b[0] for b in bs)
        refend = max(b[1] for b in bs)
        prev = placements.get(ctgid)
        if prev is None or chainsum > prev[4]:
            placements[ctgid] = (refid, refstart, refend, o, chainsum)

    # ---- best non-overlapping contig path per chromosome ----------------
    ref2ctgs: Dict[int, List[Tuple[int, int, int, int, int]]] = {}
    for ctgid, (refid, s, e, o, sc) in placements.items():
        ref2ctgs.setdefault(refid, []).append((s, e, ctgid, o, sc))

    placed: Dict[int, List[Tuple[int, int, int, int, int]]] = {}
    for refid, items in ref2ctgs.items():
        placed[refid] = _best_nonoverlapping(items)

    # ---- emit pseudomolecules ------------------------------------------
    outfa = output + ".fasta"
    placed_ctgs = set()
    records = []
    for refid, refname in enumerate(refnames):
        items = placed.get(refid)
        if not items:
            continue
        items.sort(key=lambda x: x[0])
        refoff = ctg2range[refid][0]
        parts = []
        pend = None
        for s, e, ctgid, o, sc in items:
            name = ctgnames[ctgid - nref]
            seq = ctg2seq[name]
            if o == 1:
                seq = rc_str(seq)
            if pend is not None:
                if cfg.fixedgapsize is not None:
                    gap = cfg.fixedgapsize
                else:
                    gap = max(s - pend, cfg.defaultgapsize)
                parts.append("N" * gap)
            parts.append(seq)
            pend = e
            placed_ctgs.add(ctgid)
        records.append(("%s_%s" % (output, refname), "".join(parts)))
    if split:
        for name, seq in records:
            fasta_writer("%s.fasta" % name, [(name, seq)])
        log.info(
            "Wrote %d per-chromosome pseudomolecule files (%d contigs "
            "placed)",
            len(records),
            len(placed_ctgs),
        )
    else:
        fasta_writer(outfa, records)
        log.info(
            "Wrote %d pseudomolecules (%d contigs placed) to %s",
            len(records),
            len(placed_ctgs),
            outfa,
        )

    unplacedfa = None
    if cfg.outputunmapped:
        unplacedfa = output + ".unplaced.fasta"
        un = [
            (name, ctg2seq[name])
            for i, name in enumerate(ctgnames)
            if (i + nref) not in placed_ctgs
        ]
        fasta_writer(unplacedfa, un)
        log.info("Wrote %d unplaced contigs to %s", len(un), unplacedfa)
    return outfa, unplacedfa


def _best_nonoverlapping(items):
    """Weighted interval scheduling over (start, end, ctgid, o, score):
    maximize total chain score of non-overlapping placements
    (bestctgpath, transformold.py:1314-1378)."""
    items = sorted(items, key=lambda x: x[1])
    n = len(items)
    best = [0.0] * (n + 1)
    take = [None] * (n + 1)
    import bisect

    ends = [it[1] for it in items]
    for i in range(1, n + 1):
        s, e, ctgid, o, sc = items[i - 1]
        j = bisect.bisect_right(ends, s, 0, i - 1)
        with_i = best[j] + sc
        if with_i > best[i - 1]:
            best[i] = with_i
            take[i] = j
        else:
            best[i] = best[i - 1]
    out = []
    i = n
    while i > 0:
        if take[i] is not None and best[i] != best[i - 1]:
            out.append(items[i - 1])
            i = take[i]
        else:
            i -= 1
    out.reverse()
    return out
