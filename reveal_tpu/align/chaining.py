"""Anchor chaining.

Gap cost models (utils.gapcost, /root/reference/reveal/utils.py:162-183) and
the sparse chaining DP over multi-genome anchor coordinates
(schemes.chain, /root/reference/reveal/schemes.py:20-104).  The DP keeps the
reference's traversal and tie-breaking order so chains (and hence graphs)
are reproducible against it.
"""

from __future__ import annotations

from math import log
from typing import Dict, List, Tuple


def gapcost(
    pointa,
    pointb,
    model: str = "sumofpairs",
    convex: bool = False,
    lambda_: float = 1,
    epsilon_: float = 0,
):
    assert len(pointa) == len(pointb)
    if model == "star-avg":
        return abs(sum(pointa[i] - pointb[i] for i in range(len(pointa)))) / len(
            pointa
        )
    if model == "star-med":
        return sorted(abs(pointa[i] - pointb[i]) for i in range(len(pointa)))[
            len(pointa) // 2
        ]
    if model == "sumofpairs":
        p = 0
        D = [abs(pointa[i] - pointb[i]) for i in range(len(pointa))]
        if epsilon_ > 0:
            p += min(D) * epsilon_
        for i in range(len(D)):
            for j in range(i + 1, len(D)):
                if convex:
                    p += log(abs(D[i] - D[j]) + 1) * lambda_
                else:
                    p += abs(D[i] - D[j]) * lambda_
        return p
    return 0


RelMum = Tuple[int, int, Dict[int, int]]  # (l, n, {path_id: offset})


def chain(
    mums: List[RelMum],
    left: RelMum,
    right: RelMum,
    wscore: float = 1,
    wpen: float = 1,
    gcmodel: str = "sumofpairs",
) -> List[Tuple[RelMum, float]]:
    """Sparse chaining DP (schemes.py:20-104).

    mums must be relative-offset mums; returns [(mum, score)] from the right
    end back to (excluding) left — i.e. reversed chain like the reference.
    """
    if len(mums) == 0:
        return []

    mums = list(mums)
    ref = next(iter(mums[0][2]))
    mums.append(right)
    mums.sort(key=lambda m: m[2][ref])

    sp2mum = {m[2][ref]: m for m in mums}

    start = left[2][ref]
    end = right[2][ref]

    link: Dict[int, int] = {}
    score: Dict[int, float] = {start: 0}

    active = [left]
    processed: List[RelMum] = []

    for mum in mums:
        moved = []
        for pmum in processed:
            if all(pmum[2][c] + pmum[0] <= mum[2][c] for c in pmum[2]):
                active.append(pmum)
                moved.append(pmum)
        for m in moved:
            processed.remove(m)

        active.sort(key=lambda x: score[x[2][ref]], reverse=True)

        w = None
        best = None
        for amum in active:
            if not all(amum[2][c] + amum[0] <= mum[2][c] for c in amum[2]):
                continue
            s = score[amum[2][ref]] + (
                wscore * (mum[0] * ((mum[1] * (mum[1] - 1)) // 2))
            )
            if w is not None and w > s:
                break
            penalty = gapcost(
                [amum[2][k] + amum[0] for k in mum[2]],
                [mum[2][k] for k in mum[2]],
                model=gcmodel,
            )
            tmpw = s - wpen * penalty
            if w is None or tmpw > w:
                w = tmpw
                best = amum

        link[mum[2][ref]] = best[2][ref]
        score[mum[2][ref]] = w
        processed.append(mum)

    path = []
    while end != start:
        path.append((sp2mum[end], score[end]))
        end = link[end]
    return path[1:]


def trim_overlap(mums: List) -> List:
    """Resolve per-dimension overlaps between mums (schemes.py:161-191).

    mums here carry tuple coords: (l, n, ((sid, pos), ...)).
    """
    if not mums:
        return mums
    ncoords = len(mums[0][2])
    for coord in range(ncoords):
        if len(mums) <= 1:
            break
        mums.sort(key=lambda m: (m[2][coord][1], -m[0]))
        # drop matches contained in their neighbour along this dimension
        # (note: for i==0 the reference's mums[i-1] wraps to the last
        # element — replicated for parity)
        mums = [
            mum
            for i, mum in enumerate(mums)
            if (
                i == 0
                and mums[i + 1][2][coord][1] + mums[i + 1][0]
                > mum[2][coord][1] + mum[0]
            )
            or mums[i - 1][2][coord][1] + mums[i - 1][0]
            < mum[2][coord][1] + mum[0]
        ]
        if len(mums) <= 1:
            break
        trimmed = [mums[0]]
        for mum in mums[1:]:
            pmum = trimmed[-1]
            overlap = (pmum[2][coord][1] + pmum[0]) - mum[2][coord][1]
            if overlap > 0:
                if pmum[0] - overlap > 0:
                    trimmed[-1] = (pmum[0] - overlap, pmum[1], pmum[2])
                else:
                    del trimmed[-1]
                if mum[0] - overlap > 0:
                    trimmed.append(
                        (
                            mum[0] - overlap,
                            mum[1],
                            tuple((k, v + overlap) for k, v in mum[2]),
                        )
                    )
            else:
                trimmed.append(mum)
        mums = trimmed
    return mums
