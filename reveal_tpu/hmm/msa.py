"""ProbCons-style consistency MSA over the TPU pair-HMM kernels.

Pipeline identical to the reference's probconslib (DoAlign,
/root/reference/probcons/Probcons.cc:312-544):

1. all-pairs posterior matrices (device batch, hmm.pairhmm) sparsified at
   POSTERIOR_CUTOFF=0.01 (SparseMatrix.h:14,67) + expected-accuracy
   distances from the pairwise MEA alignment;
2. ``consistency`` rounds of the relaxation transform
   P' = (2P_xy + sum_z P_xz P_zy)/N (DoRelaxation, Probcons.cc:1135-1248;
   gap-aware variant Relax_gap adds the p_gap outer product,
   Probcons.cc:1291-1353), masked to the previous sparsity pattern and
   re-cut — expressed here as dense matmuls;
3. expected-accuracy guide tree (EvolutionaryTree.h:104-160);
4. progressive alignment: BuildPosterior sum over mapped sparse cells +
   maximum-expected-accuracy DP with D>=L>=U tie-breaking
   (ProbabilisticModel.h:641-701,1018-1089; ChooseBestOfThree
   ScoreType.h:320);
5. ``refinement`` rounds of random-bipartition realignment
   (DoIterativeRefinement, Probcons.cc:1467-1490);
6. per-column confidence annotation = 200 * mean pairwise posterior
   (ComputeAnnotation/ComputeScore, Probcons.cc:1545-1602).

Host orchestration is numpy; the O(L^2) posterior computation runs on
device.  Alignment strings use '-' for gaps like the reference.
"""

from __future__ import annotations

import logging
import os
from typing import List, Sequence, Tuple

import numpy as np

from .pairhmm import batch_posteriors as _batch_posteriors_xla

_use_pallas = None
_logadd_compat = False


def set_logadd_compat(flag: bool) -> None:
    """Route all posterior computation through the float32 LOG_ADD
    lookup-table arithmetic (ScoreType.h:185-262 semantics, see
    hmm/compat.py).  Slow scalar mode for reference bit-equivalence
    attempts; enabled by ``refine --logadd-compat``."""
    global _logadd_compat
    _logadd_compat = bool(flag)


def batch_posteriors(pairs, slice_output: bool = True):
    """Dispatch to the Pallas TPU kernels when a TPU backend is active,
    else the XLA row-scan kernels.

    (A small-workload host-CPU fallback — pin tiny batches to
    jax.devices('cpu')[0] to dodge remote-dispatch latency — was tried
    and reverted: with the tunnel TPU plugin active, initializing and
    compiling on the coexisting CPU backend in the same process hangs.
    pairhmm.batch_posteriors keeps its ``device=`` parameter for
    environments where mixed backends work.)"""
    if _logadd_compat:
        return _batch_posteriors_xla(
            pairs, slice_output=slice_output, compat=True
        )
    global _use_pallas
    if _use_pallas is None:
        try:
            import jax

            _use_pallas = jax.default_backend() not in ("cpu",)
        except Exception:
            _use_pallas = False
    if _use_pallas:
        try:
            from .pallas_pairhmm import batch_posteriors_pallas

            return batch_posteriors_pallas(pairs, slice_output=slice_output)
        except Exception as e:
            log.warning("pallas pair-HMM failed (%s); falling back to XLA", e)
            _use_pallas = False
    return _batch_posteriors_xla(pairs, slice_output=slice_output)


class SparsePost:
    """Cutoff-compacted posterior of ONE pair: the device's top-K rows
    (values descending, first cnt[r] entries are the >=0.01 survivors
    of row r, row/col 0 excluded — exactly the _sparsify(dense)
    pattern, SparseMatrix.h:14-67).  Long-pair consumers use .tocsr()
    directly (the host consistency transform's sparse path); short-pair
    consumers materialize .dense().  Nothing dense ever crosses the
    device link."""

    __slots__ = ("v", "i", "cnt", "shape")

    def __init__(self, v, i, cnt, shape):
        self.v = v
        self.i = i
        self.cnt = cnt
        self.shape = shape

    @property
    def nnz(self) -> int:
        return int(self.cnt.sum())

    def dense(self) -> np.ndarray:
        out = np.zeros(self.shape, dtype=np.float32)
        L1, K = self.v.shape
        np.put_along_axis(
            out[:L1],
            np.minimum(self.i.astype(np.int64), self.shape[1] - 1),
            np.where(
                np.arange(K)[None, :] < self.cnt[:, None], self.v, 0.0
            ),
            axis=1,
        )
        out[:, 0] = 0.0
        return out

    def tocsr(self, dtype=np.float64):
        import scipy.sparse as sp

        L1, K = self.v.shape
        valid = np.arange(K)[None, :] < self.cnt[:, None]
        indptr = np.zeros(self.shape[0] + 1, dtype=np.int64)
        indptr[1 : L1 + 1] = np.cumsum(self.cnt, dtype=np.int64)
        indptr[L1 + 1 :] = indptr[L1]
        # rows come value-sorted from top_k; csr wants column order
        order = np.argsort(
            np.where(valid, self.i.astype(np.int64), 2**31), axis=1
        )
        iv = np.take_along_axis(self.i.astype(np.int64), order, axis=1)
        vv = np.take_along_axis(self.v, order, axis=1)
        vmask = np.take_along_axis(valid, order, axis=1)
        indices = iv[vmask]
        data = vv[vmask]
        return sp.csr_matrix(
            (data.astype(dtype), indices, indptr), shape=self.shape
        )

    def sum(self, axis=None):
        valid = np.arange(self.v.shape[1])[None, :] < self.cnt[:, None]
        vv = np.where(valid, self.v, 0.0)
        if axis == 1:
            out = np.zeros(self.shape[0], dtype=np.float64)
            out[: self.v.shape[0]] = vv.sum(axis=1)
            return out
        if axis == 0:
            out = np.zeros(self.shape[1], dtype=np.float64)
            np.add.at(
                out,
                np.where(valid, self.i.astype(np.int64), 0).ravel(),
                vv.ravel(),
            )
            out[0] = 0.0
            return out
        return float(vv.sum())


def batch_posteriors_cut(pairs):
    """Stage-1 with ON-DEVICE sparsification (the production transfer
    path for accelerator backends): posteriors are cutoff-compacted on
    device (pairhmm.fetch_posteriors_cut) so only surviving cells +
    per-row counts cross the link, and the expected-accuracy MEA score
    is computed on device from the full matrix in the same dispatch.

    Returns [(p_cut, total, score), ...] in input order, where p_cut is
    a ``SparsePost`` (compact top-K rows; ``.dense()`` reproduces
    ``_sparsify(p_dense)`` exactly) and score equals the host
    ``_mea_dp_fast(p_dense)[1]``.  On CPU backends (no transfer to
    save) this computes the same triple via the dense path, returning
    plain dense arrays.

    Small workloads short-circuit to the NATIVE host kernel
    (native.pairhmm_post_batch_native, threaded scalar DP bit-identical
    to the float64 oracle): below ~32M posterior cells the device
    dispatch+transfer latency dominates the O(L^2) work — the 6-genome
    refine set is 7.3M cells, ~0.6s native vs ~19s dispatched over a
    remote link.  REVEAL_TPU_NATIVE_POST_MAX (cells) tunes the
    crossover; 0 disables the native path."""
    if not _logadd_compat and native_post_ok(pairs):
        try:
            from ..native import pairhmm_post_batch_native

            res = pairhmm_post_batch_native(
                pairs, cutoff=POSTERIOR_CUTOFF
            )
            if res is not None:
                return res
        except Exception as e:  # pragma: no cover
            log.warning("native pair-HMM failed (%s); device path", e)

    import jax

    use_dev = False
    try:
        use_dev = jax.default_backend() not in ("cpu",)
    except Exception:
        pass
    if not use_dev or _logadd_compat:
        res = batch_posteriors(pairs)
        return [
            (_sparsify(p), tot, _mea_dp_fast(p)[1]) for p, tot in res
        ]

    from .pairhmm import (
        _bucket,
        _pad_with_dummy,
        fetch_posteriors_compact,
    )
    from .pallas_pairhmm import _get_pallas_kernels, _round_up

    posterior_batch = _get_pallas_kernels()
    buckets = {}
    for i, (s1, s2) in enumerate(pairs):
        key = (
            _bucket(len(s1)) + 1,
            _round_up(_bucket(len(s2)) + 1, 128),
        )
        buckets.setdefault(key, []).append(i)
    out = [None] * len(pairs)
    for (L1p, L2p), idxs_all in buckets.items():
        if L2p * 8 > 100_000:
            sub = batch_posteriors([pairs[i] for i in idxs_all])
            for bi, i in enumerate(idxs_all):
                p, tot = sub[bi]
                out[i] = (_sparsify(p), tot, _mea_dp_fast(p)[1])
            continue
        maxB = max(8, 100_000 // L2p)
        mB = 8
        while mB * 2 <= maxB:
            mB *= 2
        for chunk_start in range(0, len(idxs_all), mB):
            idxs = idxs_all[chunk_start : chunk_start + mB]
            B = 8
            while B < len(idxs):
                B *= 2
            npad = B - len(idxs)
            xb = np.stack(
                [
                    _pad_with_dummy(pairs[i][0].encode(), L1p - 1)
                    for i in idxs
                ]
                + [_pad_with_dummy(b"A", L1p - 1)] * npad
            )
            yb = np.stack(
                [
                    _pad_with_dummy(pairs[i][1].encode(), L2p - 1)
                    for i in idxs
                ]
                + [_pad_with_dummy(b"A", L2p - 1)] * npad
            )
            lx = np.array(
                [len(pairs[i][0]) for i in idxs] + [1] * npad,
                dtype=np.int32,
            )
            ly = np.array(
                [len(pairs[i][1]) for i in idxs] + [1] * npad,
                dtype=np.int32,
            )
            from .pairhmm import posterior_pack_fused

            vq, iq, cnt, tot, scores = posterior_pack_fused(
                posterior_batch, xb, yb, lx, ly
            )
            for bi, i in enumerate(idxs):
                L1 = int(lx[bi]) + 1
                out[i] = (
                    SparsePost(
                        vq[bi, :L1],
                        iq[bi, :L1],
                        cnt[bi, :L1],
                        (L1, int(ly[bi]) + 1),
                    ),
                    float(tot[bi]),
                    float(scores[bi]),
                )
    return out


log = logging.getLogger(__name__)

POSTERIOR_CUTOFF = 0.01

# Below this many posterior cells the whole stage-1 batch runs on the
# native host kernel instead of the device: host threads at ~10 Mcells/s
# beat the device's dispatch + executable-load + transfer latency on
# small problems (refine bubbles are typically tiny).  Overridable via
# REVEAL_TPU_NATIVE_POST_MAX; 0 disables the native path.
NATIVE_POST_MAX_CELLS = int(
    os.environ.get("REVEAL_TPU_NATIVE_POST_MAX", 32_000_000)
)


def native_post_ok(pairs) -> bool:
    """True when the native host pair-HMM should take this stage-1
    batch (small total area + native library available)."""
    if NATIVE_POST_MAX_CELLS <= 0 or not pairs:
        return False
    cells = sum((len(a) + 1) * (len(b) + 1) for a, b in pairs)
    if cells > NATIVE_POST_MAX_CELLS:
        return False
    try:
        from ..native import get_lib

        return get_lib() is not None
    except Exception:  # pragma: no cover
        return False

# Single-problem footprint cap for the device stage-1+2 chain: the
# relaxation einsum materializes a few (N, N, Lq, Lq) float32 tensors
# (~3-4 copies live), so cap one problem at 2 GB against v5e's 16 GB
# HBM; larger problems take the per-bubble host path instead.
CHAIN_BYTES_CAP = 1 << 31


def _sparsify(p: np.ndarray) -> np.ndarray:
    q = np.where(p >= POSTERIOR_CUTOFF, p, 0.0).astype(np.float32)
    q[0, :] = 0
    q[:, 0] = 0
    return q



# Opt-in bf16 inputs (f32 accumulation) for the consistency einsums:
# halves the MXU cost of the relaxation rounds.  Measured error vs the
# f32 chain: 1.7e-3 max abs on transformed posteriors with an identical
# sparsity mask (within the 2e-3 oracle gate), but alignment-DP ties
# can flip, so refined GFAs may differ from the host chain's — OFF by
# default to preserve byte-identity; set REVEAL_TPU_CONS_BF16=1 to
# trade that for speed.  Read once at import (jit caches key on it).
_CONS_BF16 = os.environ.get("REVEAL_TPU_CONS_BF16") == "1"

_cons_cache = {}


def _get_cons_fn(rounds: int, consgap: bool):
    """Jitted batched consistency transform: one round of
    P'(x_i, y_j) = 1/N * sum_z P(x,z) @ P(z,y) as a single einsum on the
    MXU, using the identity-diagonal trick (Q[a,a] = I makes the z=a and
    z=b terms contribute the reference's 2*P, DoRelaxation
    Probcons.cc:1135-1248); previous-sparsity masking + 0.01 re-cutoff
    match _sparsify/Relax exactly."""
    key = (rounds, consgap, _CONS_BF16)
    fn = _cons_cache.get(key)
    if fn is not None:
        return fn

    import jax
    import jax.numpy as jnp

    from ..core.jaxconfig import configure_jax

    configure_jax()

    @jax.jit
    def run(Q):
        B, N, _, L, _ = Q.shape
        eye = jnp.eye(L, dtype=Q.dtype)
        diag = jnp.eye(N, dtype=bool)[None, :, :, None, None]
        for _ in range(rounds):
            Qe = Q.astype(jnp.bfloat16) if _CONS_BF16 else Q
            acc = (
                jnp.einsum(
                    "bazik,bzwkj->bawij",
                    Qe,
                    Qe,
                    preferred_element_type=jnp.float32,
                )
                / N
            )
            if consgap:
                gx = 1.0 - jnp.sum(Q, axis=-1)  # row gap probs
                gy = 1.0 - jnp.sum(Q, axis=-2)  # col gap probs
                acc = acc + jnp.einsum("bazi,bzwj->bawij", gx, gy) / N
            mask = (Q > 0) & (acc >= POSTERIOR_CUTOFF)
            Q = jnp.where(mask, acc, 0.0)
            Q = jnp.where(diag, eye[None, None, None], Q)
        return Q

    _cons_cache[key] = run
    return run


def batch_consistency(problems, consistency=2, consgap=False):
    """Device-batched consistency transform across many MSA problems.

    problems: list of (seqs, res) with res = [(posterior, total), ...]
    over the a<b pair list of seqs.  Returns one mats dict per problem
    ((a, b) -> sparsified float32 matrix), equal to probcons_align's
    host stage 2 up to float32 matmul rounding.  Problems are bucketed
    by (N, padded L) and each bucket runs as one jit dispatch.
    """
    import jax
    import jax.numpy as jnp

    out = [None] * len(problems)
    buckets = {}
    for pi, (seqs, res) in enumerate(problems):
        N = len(seqs)
        Lp = _bucket_len(max(len(s) for s in seqs) + 1)
        if N * N * Lp * Lp * 4 > CHAIN_BYTES_CAP:
            continue  # out[pi] stays None -> host consistency fallback
        buckets.setdefault((N, Lp), []).append(pi)

    fn_cache_rounds = consistency
    for (N, Lp), idxs in sorted(buckets.items()):
        # cap batch size by tensor footprint (B * N^2 * Lp^2 floats)
        maxb = max(1, (1 << 28) // max(1, N * N * Lp * Lp * 4))
        for lo in range(0, len(idxs), maxb):
            part = idxs[lo : lo + maxb]
            # pow2 batch: one compile per power bucket, not per size
            B = 1 << max(0, len(part) - 1).bit_length()
            Q = np.zeros((B, N, N, Lp, Lp), dtype=np.float32)
            Q[:, np.arange(N), np.arange(N)] = np.eye(
                Lp, dtype=np.float32
            )
            for bi, pi in enumerate(part):
                seqs, res = problems[pi]
                k = 0
                for a in range(N):
                    for b in range(a + 1, N):
                        p, _tot = res[k]
                        k += 1
                        sp = _sparsify(np.asarray(p))
                        Q[bi, a, b, : sp.shape[0], : sp.shape[1]] = sp
                        Q[bi, b, a, : sp.shape[1], : sp.shape[0]] = sp.T
            fn = _get_cons_fn(fn_cache_rounds, consgap)
            try:
                Qt = np.asarray(jax.device_get(fn(jnp.asarray(Q))))
            except Exception as e:
                log.warning(
                    "device consistency bucket (B=%d, N=%d, Lp=%d) "
                    "failed (%s); host fallback for %d problems",
                    B, N, Lp, str(e)[:200], len(part),
                )
                continue  # those out[pi] stay None
            for bi, pi in enumerate(part):
                seqs, _res = problems[pi]
                mats = {}
                for a in range(N):
                    for b in range(a + 1, N):
                        mats[(a, b)] = Qt[
                            bi, a, b, : len(seqs[a]) + 1,
                            : len(seqs[b]) + 1,
                        ]
                out[pi] = mats
    return out


def _bucket_len(x: int) -> int:
    """Pow2 tiers up to 2048, then multiples of 512: above 2k the pow2
    jump (e.g. 4.7k -> 8192) inflates the (N, N, Lq, Lq) chain tensor
    ~3x and pushes real bubbles past CHAIN_BYTES_CAP onto the slow
    host path; big bubbles are rare, so the extra shape signatures
    don't multiply executable loads in practice."""
    b = 32
    while b < x and b < 2048:
        b *= 2
    if b >= x:
        return b
    return ((x + 511) // 512) * 512


# ---------------------------------------------------------------------------
# fully device-resident stage 1+2: posteriors -> MEA distances ->
# consistency transform, with only sparse transformed mats + scalar
# distances crossing the device link
# ---------------------------------------------------------------------------

_chain_cache = {}
_chain_lock = __import__("threading").Lock()


def _posteriors_device(pairs, L1p, L2p):
    """Posteriors for same-bucket pairs, kept on device.

    pairs: [(s1, s2), ...] with len(s1) < L1p, len(s2) < L2p.  Returns a
    device array (len(pairs), L1p, L2p) float32 (zero outside the valid
    region of each pair).  Dispatches to the Pallas kernels on
    accelerator backends (chunked to the VMEM-budget batch), the XLA
    row-scan otherwise."""
    import jax
    import jax.numpy as jnp

    from .pairhmm import _pad_with_dummy

    use_pallas = False
    try:
        use_pallas = jax.default_backend() not in ("cpu",)
    except Exception:
        pass

    chunks = []
    if use_pallas:
        from .pallas_pairhmm import _get_pallas_kernels, _round_up

        L2pal = _round_up(L2p, 128)
        if L2pal * 8 > 100_000:
            use_pallas = False  # too wide for the VMEM-resident layout
        else:
            posterior_batch = _get_pallas_kernels()
            maxB = max(8, 100_000 // L2pal)
            mB = 8
            while mB * 2 <= maxB:
                mB *= 2
            for lo in range(0, len(pairs), mB):
                part = pairs[lo : lo + mB]
                B = 8
                while B < len(part):
                    B *= 2
                npad = B - len(part)
                xb = np.stack(
                    [_pad_with_dummy(a.encode(), L1p - 1) for a, b in part]
                    + [_pad_with_dummy(b"A", L1p - 1)] * npad
                )
                yb = np.stack(
                    [_pad_with_dummy(b.encode(), L2pal - 1) for a, b in part]
                    + [_pad_with_dummy(b"A", L2pal - 1)] * npad
                )
                lx = np.array(
                    [len(a) for a, b in part] + [1] * npad, dtype=np.int32
                )
                ly = np.array(
                    [len(b) for a, b in part] + [1] * npad, dtype=np.int32
                )
                p, _tot = posterior_batch(xb, yb, lx, ly)
                chunks.append(p[: len(part), :L1p, :L2p])
    if not chunks:
        from .pairhmm import _get_kernels

        _, _, _, batched = _get_kernels()
        B = 1 << max(0, len(pairs) - 1).bit_length()
        npad = B - len(pairs)
        xb = np.stack(
            [_pad_with_dummy(a.encode(), L1p - 1) for a, b in pairs]
            + [_pad_with_dummy(b"A", L1p - 1)] * npad
        )
        yb = np.stack(
            [_pad_with_dummy(b.encode(), L2p - 1) for a, b in pairs]
            + [_pad_with_dummy(b"A", L2p - 1)] * npad
        )
        lx = np.array(
            [len(a) for a, b in pairs] + [1] * npad, dtype=np.int32
        )
        ly = np.array(
            [len(b) for a, b in pairs] + [1] * npad, dtype=np.int32
        )
        p, _tot = batched(xb, yb, lx, ly)
        chunks.append(p[: len(pairs)])
    if len(chunks) == 1:
        return chunks[0]
    return jnp.concatenate(chunks, axis=0)


def _get_chain_fn(B, N, Lq, rounds, consgap):
    """Jitted posterior->distance->consistency chain for one (B, N, Lq)
    bucket: MEA scores (expected-accuracy distances, DoAlign
    Probcons.cc:384-400) as a scan-of-cummax over the dense posteriors,
    then sparsify + ``rounds`` relaxation rounds as batched einsum (same
    math as _get_cons_fn), returning only the transformed a<b pair
    matrices and the scores."""
    key = (B, N, Lq, rounds, consgap, _CONS_BF16)
    fn = _chain_cache.get(key)
    if fn is not None:
        return fn
    # serialize construction per key: batch_stage12_device dispatches
    # chunks from a thread pool, and two same-signature chunks racing
    # here would compile the identical executable twice
    with _chain_lock:
        fn = _chain_cache.get(key)
        if fn is not None:
            return fn
        return _build_chain_fn(key)


def _build_chain_fn(key):
    (B, N, Lq, rounds, consgap, _bf16) = key  # _bf16: cache key only
    del _bf16  # the jitted body reads module-level _CONS_BF16

    import jax
    import jax.numpy as jnp

    from ..core.jaxconfig import configure_jax

    configure_jax()

    npairs = N * (N - 1) // 2
    ai = np.array(
        [a for a in range(N) for b in range(a + 1, N)], dtype=np.int32
    )
    bi = np.array(
        [b for a in range(N) for b in range(a + 1, N)], dtype=np.int32
    )

    @jax.jit
    def chain(pflat):
        # pflat: (B * npairs, Lq, Lq) dense masked posteriors
        Bp = B * npairs

        # ---- MEA score DP: new[j] = max(c[j], new[j-1]),
        # c[j] = max(p[i,j] + old[j-1], old[j]) -> running max of c
        def row(old, prow):
            d = prow[:, 1:] + old[:, :-1]
            u = old[:, 1:]
            c = jnp.maximum(d, u)
            m = jax.lax.cummax(c, axis=1)
            new = jnp.concatenate(
                [jnp.zeros((Bp, 1), jnp.float32), m], axis=1
            )
            return new, None

        rows = jnp.transpose(pflat, (1, 0, 2))[1:]  # (Lq-1, Bp, Lq)
        old0 = jnp.zeros((Bp, Lq), jnp.float32)
        oldf, _ = jax.lax.scan(row, old0, rows)
        scores = oldf[:, -1]  # zero-padded rows/cols are no-ops

        # ---- sparsify + assemble the (B, N, N, Lq, Lq) tensor
        P = jnp.where(pflat >= POSTERIOR_CUTOFF, pflat, 0.0)
        P = P.at[:, 0, :].set(0.0).at[:, :, 0].set(0.0)
        P = P.reshape(B, npairs, Lq, Lq)
        eye = jnp.eye(Lq, dtype=jnp.float32)
        diag = jnp.eye(N, dtype=bool)[None, :, :, None, None]
        Q = jnp.zeros((B, N, N, Lq, Lq), jnp.float32)
        Q = Q.at[:, ai, bi].set(P)
        Q = Q.at[:, bi, ai].set(jnp.transpose(P, (0, 1, 3, 2)))
        Q = jnp.where(diag, eye[None, None, None], Q)

        # ---- consistency rounds (identical to _get_cons_fn)
        for _ in range(rounds):
            Qe = Q.astype(jnp.bfloat16) if _CONS_BF16 else Q
            acc = (
                jnp.einsum(
                    "bazik,bzwkj->bawij",
                    Qe,
                    Qe,
                    preferred_element_type=jnp.float32,
                )
                / N
            )
            if consgap:
                gx = 1.0 - jnp.sum(Q, axis=-1)
                gy = 1.0 - jnp.sum(Q, axis=-2)
                acc = acc + jnp.einsum("bazi,bzwj->bawij", gx, gy) / N
            mask = (Q > 0) & (acc >= POSTERIOR_CUTOFF)
            Q = jnp.where(mask, acc, 0.0)
            Q = jnp.where(diag, eye[None, None, None], Q)

        Qp = Q[:, ai, bi].reshape(B * npairs, Lq, Lq)
        return Qp, scores.reshape(B, npairs)

    _chain_cache[key] = chain
    return chain


def batch_stage12_device(problems, consistency=2, consgap=False):
    """Device-resident ProbCons stages 1+2 across many MSA problems.

    problems: list of seq-lists.  For each problem returns
    (mats, dist): the consistency-transformed sparse matrices
    ((a, b) -> float32 array, sliced) and the expected-accuracy distance
    matrix for the guide tree.  Posteriors never cross the device link —
    only the top-K-sparsified transformed mats and the scalar MEA scores
    do (see pairhmm.fetch_posteriors for the exactness argument).

    Problems whose (N, N, Lq, Lq) chain tensor exceeds the device
    footprint cap — or whose bucket fails to compile/run — are left as
    ``None`` entries: the caller falls back per problem instead of
    losing the whole batch to one oversized bubble.

    On accelerator backends the independent (bucket, chunk) jobs run
    from a small thread pool: the tunnel's per-shape executable load
    (~1-12s, it blocks the dispatching thread) then overlaps across
    shapes instead of serializing — on the 6-genome refine stage this
    is most of the wall clock of a fresh process."""
    from concurrent.futures import ThreadPoolExecutor

    from .pairhmm import fetch_posteriors

    out = [None] * len(problems)
    buckets = {}
    for pi, seqs in enumerate(problems):
        N = len(seqs)
        if N < 2:
            out[pi] = ({}, np.zeros((N, N), dtype=np.float64))
            continue
        Lq = _bucket_len(max(len(s) for s in seqs) + 1)
        if N * N * Lq * Lq * 4 > CHAIN_BYTES_CAP:
            continue  # out[pi] stays None -> per-problem fallback
        buckets.setdefault((N, Lq), []).append(pi)

    def run_chunk(job):
        N, Lq, part = job
        npairs = N * (N - 1) // 2
        # pow2 batch: one chain compile per (B, N, Lq) power bucket
        # instead of one per exact remainder size
        B = 1 << max(0, len(part) - 1).bit_length()
        pairs = []
        for pi in part:
            seqs = problems[pi]
            for a in range(N):
                for b in range(a + 1, N):
                    pairs.append((seqs[a], seqs[b]))
        try:
            pflat = _posteriors_device(pairs, Lq, Lq)
            if B > len(part):
                import jax.numpy as jnp

                pflat = jnp.concatenate(
                    [
                        pflat,
                        jnp.zeros(
                            ((B - len(part)) * npairs, Lq, Lq),
                            jnp.float32,
                        ),
                    ],
                    axis=0,
                )
            chain = _get_chain_fn(B, N, Lq, consistency, consgap)
            Qp, scores = chain(pflat)
            Qh, scores = fetch_posteriors(Qp, scores)
        except Exception as e:
            log.warning(
                "stage12 bucket (B=%d, N=%d, Lq=%d) failed (%s); "
                "per-problem fallback for %d problems",
                B, N, Lq, str(e)[:200], len(part),
            )
            return  # those out[pi] stay None
        Qh = Qh.reshape(B, npairs, Lq, Lq)
        for bi_, pi in enumerate(part):
            seqs = problems[pi]
            Nl = len(seqs)
            mats = {}
            dist = np.zeros((Nl, Nl), dtype=np.float64)
            k = 0
            for a in range(Nl):
                for b in range(a + 1, Nl):
                    mats[(a, b)] = Qh[
                        bi_, k, : len(seqs[a]) + 1, : len(seqs[b]) + 1
                    ]
                    dist[a, b] = dist[b, a] = float(
                        scores[bi_, k]
                    ) / max(1, min(len(seqs[a]), len(seqs[b])))
                    k += 1
            out[pi] = (mats, dist)

    jobs = []
    for (N, Lq), idxs in sorted(buckets.items()):
        maxb = max(1, (1 << 28) // max(1, N * N * Lq * Lq * 4))
        for lo in range(0, len(idxs), maxb):
            jobs.append((N, Lq, idxs[lo : lo + maxb]))

    accel = False
    try:
        import jax

        accel = jax.default_backend() not in ("cpu",)
    except Exception:
        pass
    if accel and len(jobs) > 1:
        with ThreadPoolExecutor(max_workers=6) as ex:
            list(ex.map(run_chunk, jobs))
    else:
        for job in jobs:
            run_chunk(job)
    return out


# edit-op codes shared by the MEA DPs and _add_gaps: 0 = 'B' (both rows
# advance), 1 = 'Y' (second group advances), 2 = 'X' (first group advances)
OP_B, OP_Y, OP_X = 0, 1, 2


def _mea_dp(post: np.ndarray) -> Tuple[np.ndarray, float]:
    """MEA alignment DP over a (L1+1)x(L2+1) posterior; returns the edit
    ops (uint8 array of OP_B/OP_X/OP_Y per column) and the total score.

    Scalar reference implementation (differential oracle for the native
    kernel); tie-breaking matches ChooseBestOfThree: D >= L >= U.
    """
    L1 = post.shape[0] - 1
    L2 = post.shape[1] - 1
    old = np.zeros(L2 + 1, dtype=np.float32)
    # traceback: 0=D,1=L,2=U
    tb = np.zeros((L1 + 1, L2 + 1), dtype=np.uint8)
    tb[0, :] = 1  # 'L'
    for i in range(1, L1 + 1):
        tb[i, 0] = 2  # 'U'
        d = post[i, 1:] + old[:-1]
        u = old[1:]
        # c[j] = winner of D vs U at column j (D wins ties)
        c = np.where(d >= u, d, u)
        cb = np.where(d >= u, 0, 2).astype(np.uint8)
        # now fold in L (new[j-1]): new[j] = max(c[j], new[j-1]),
        # with D/U >= L on ties (ChooseBestOfThree checks x1>=x2 (D vs L)
        # first, then >= x3; L beats U on ties but D beats L)
        new = np.empty(L2 + 1, dtype=np.float32)
        new[0] = 0.0
        run = 0.0
        # running max with tie semantics: choose c[j] if c[j] >= run for
        # D-winner, or c[j] > run ... reference: x1=D, x2=L, x3=U.
        # D chosen if D>=L and D>=U; L chosen if L>D and L>=U; U otherwise.
        prev = 0.0
        for j in range(1, L2 + 1):
            dv = d[j - 1]
            lv = new[j - 1]
            uv = u[j - 1]
            if dv >= lv:
                if dv >= uv:
                    new[j] = dv
                    tb[i, j] = 0
                else:
                    new[j] = uv
                    tb[i, j] = 2
            elif lv >= uv:
                new[j] = lv
                tb[i, j] = 1
            else:
                new[j] = uv
                tb[i, j] = 2
        old = new
    total = float(old[L2])

    # traceback
    out = []
    r, c_ = L1, L2
    while r != 0 or c_ != 0:
        ch = tb[r, c_]
        if ch == 1:
            c_ -= 1
            out.append(OP_Y)
        elif ch == 2:
            r -= 1
            out.append(OP_X)
        else:
            r -= 1
            c_ -= 1
            out.append(OP_B)
    out.reverse()
    return np.array(out, dtype=np.uint8), total


def _mea_dp_fast(post: np.ndarray) -> Tuple[np.ndarray, float]:
    """MEA DP: native C++ kernel when available (identical float32
    arithmetic and tie order, native/esa.cpp mea_dp), else the
    row-vectorized numpy path.

    Exact same cell values and traceback choices as _mea_dp: within a row,
    new[j] = max(c[j], new[j-1]) where c[j] = max-with-D-preference(d, u);
    the L choice applies when new[j-1] > c[j] (strict, since D>=L wins for
    equality) — computed via running argmax over prefix maxima.
    """
    try:
        from ..native import mea_dp_native

        res = mea_dp_native(post)
        if res is not None:
            return res
    except Exception:
        pass
    L1 = post.shape[0] - 1
    L2 = post.shape[1] - 1
    old = np.zeros(L2 + 1, dtype=np.float32)
    tb = np.zeros((L1 + 1, L2 + 1), dtype=np.uint8)
    tb[0, :] = 1
    for i in range(1, L1 + 1):
        tb[i, 0] = 2
        d = post[i, 1:] + old[:-1]
        u = old[1:]
        c = np.where(d >= u, d, u)
        cb = np.where(d >= u, 0, 2).astype(np.uint8)
        # new[j] = max(new[j-1], c[j]) (all candidates >= 0; new[0]=0)
        m = np.maximum.accumulate(c)
        mprev = np.empty_like(m)
        mprev[0] = 0.0
        mprev[1:] = m[:-1]
        mprev = np.maximum(mprev, 0.0)
        # ChooseBestOfThree(d, l, u) tie order: pick L iff (l > d) and
        # (l >= u); given cb: when cb==D (d>=u) that is l > c; when cb==U
        # (u>d) that is l >= c
        use_l = np.where(cb == 0, mprev > c, mprev >= c)
        new = np.empty(L2 + 1, dtype=np.float32)
        new[0] = 0.0
        new[1:] = np.maximum(c, mprev)
        tb[i, 1:] = np.where(use_l, 1, cb)
        old = new
    total = float(old[L2])
    out = []
    r, c_ = L1, L2
    while r != 0 or c_ != 0:
        ch = tb[r, c_]
        if ch == 1:
            c_ -= 1
            out.append(OP_Y)
        elif ch == 2:
            r -= 1
            out.append(OP_X)
        else:
            r -= 1
            c_ -= 1
            out.append(OP_B)
    out.reverse()
    return np.array(out, dtype=np.uint8), total


class _Aln:
    """A (sub-)alignment: rows of gapped strings + original labels."""

    def __init__(self, labels: List[int], rows: List[str]):
        self.labels = labels
        self.rows = rows

    @property
    def length(self) -> int:
        return len(self.rows[0]) if self.rows else 0

    def mapping(self, r: int) -> np.ndarray:
        """mapping[k] = alignment column (1-based) of residue k (1-based),
        mapping[0]=0 (Sequence::GetMapping, Sequence.h:391-397)."""
        arr = np.frombuffer(self.rows[r].encode("latin1"), dtype=np.uint8)
        nz = np.nonzero(arr != ord("-"))[0]
        out = np.empty(len(nz) + 1, dtype=np.int64)
        out[0] = 0
        out[1:] = nz + 1
        return out


def _build_posterior(a1: _Aln, a2: _Aln, mats) -> np.ndarray:
    """BuildPosterior (ProbabilisticModel.h:1018-1089): sum sparse pairwise
    posteriors into alignment-column coordinates (one native batched
    scatter-add call when available, numpy fancy-index fallback)."""
    L1 = a1.length
    L2 = a2.length
    m1s = [a1.mapping(i) for i in range(len(a1.labels))]
    m2s = [a2.mapping(j) for j in range(len(a2.labels))]
    jobs = []
    for i, first in enumerate(a1.labels):
        for j, second in enumerate(a2.labels):
            if first < second:
                jobs.append((mats[(first, second)], i, j, False))
            else:
                jobs.append((mats[(second, first)], i, j, True))
    try:
        from ..native import build_posterior_native

        post = build_posterior_native(L1, L2 + 1, jobs, m1s, m2s)
        if post is not None:
            return post
    except Exception:  # pragma: no cover
        pass
    post = np.zeros((L1 + 1, L2 + 1), dtype=np.float32)
    for P, i, j, transpose in jobs:
        # scatter-add P[ii, jj] into post[m1[ii], m2[jj]]
        post[np.ix_(m1s[i], m2s[j])] += P.T if transpose else P
    return post


def _align_alignments(a1: _Aln, a2: _Aln, mats) -> Tuple["_Aln", float]:
    post = _build_posterior(a1, a2, mats)
    edit, total = _mea_dp_fast(post)
    rows1 = _add_gaps(a1.rows, edit, OP_X)
    rows2 = _add_gaps(a2.rows, edit, OP_Y)
    merged = _Aln(a1.labels + a2.labels, rows1 + rows2)
    # SortByLabel (Probcons.cc:1113-1114)
    order = np.argsort(np.array(merged.labels), kind="stable")
    merged = _Aln(
        [merged.labels[k] for k in order], [merged.rows[k] for k in order]
    )
    return merged, total


def _add_gaps(rows: List[str], edit: np.ndarray, keep: int) -> List[str]:
    """Sequence::AddGaps: expand rows by the edit ops; this group's
    characters advance on OP_B and `keep` columns, others insert '-'."""
    mask = (edit == OP_B) | (edit == keep)
    tmpl = np.full(len(edit), ord("-"), dtype=np.uint8)
    out = []
    for row in rows:
        buf = tmpl.copy()
        buf[mask] = np.frombuffer(row.encode("latin1"), dtype=np.uint8)
        out.append(buf.tobytes().decode("latin1"))
    return out


def _compute_tree(dist: np.ndarray) -> list:
    """Guide tree by repeated best-pair merging (EvolutionaryTree.h:104).
    Returns a nested tuple tree of leaf indices."""
    n = len(dist)
    d = dist.copy()
    valid = [True] * n
    nodes: List = list(range(n))
    for _ in range(n - 1):
        best = -1.0
        bp = None
        for i in range(n):
            if not valid[i]:
                continue
            for j in range(i + 1, n):
                if not valid[j]:
                    continue
                if d[i, j] > best:
                    best = d[i, j]
                    bp = (i, j)
        i, j = bp
        nodes[i] = (nodes[i], nodes[j])
        nodes[j] = None
        for k in range(n):
            if valid[k]:
                d[i, k] = d[k, i] = (d[k, i] + d[k, j]) * best / 2
        valid[j] = False
    return nodes[0]


# Use scipy-sparse host consistency above this many matrix elements
# (2048^2): beyond it one dense f64 L^2 x L^2 matmul costs ~Tflops while
# the cutoff keeps <=1/POSTERIOR_CUTOFF nonzeros per row.
_SPARSE_CONS_MIN_ELEMS = 2048 * 2048


def _consistency_round_sparse(mats, pair_keys, N, consgap):
    """One relaxation round with scipy.sparse csr products, equal to the
    dense round up to f64 summation order.  mats stay dense float32
    arrays for the downstream consumers (BuildPosterior / MEA)."""
    import scipy.sparse as sp

    csr = {
        k: (
            m.tocsr()
            if isinstance(m, SparsePost)
            else sp.csr_matrix(m.astype(np.float64))
        )
        for k, m in mats.items()
    }
    csc_t = {k: c.T.tocsr() for k, c in csr.items()}
    new_mats = {}
    for (a, b) in pair_keys:
        Ps = csr[(a, b)]
        shp = Ps.shape
        pi_, pj_ = Ps.nonzero()
        mask = sp.csr_matrix(
            (np.ones(len(pi_)), (pi_, pj_)), shape=shp
        )
        acc = 2.0 * Ps
        gap_vals = None
        for z in range(N):
            if z == a or z == b:
                continue
            Paz = csr[(a, z)] if a < z else csc_t[(z, a)]
            Pzb = csr[(z, b)] if z < b else csc_t[(b, z)]
            acc = acc + (Paz @ Pzb).multiply(mask)
            if consgap:
                pgx = 1.0 - np.asarray(Paz.sum(axis=1)).ravel()
                pgy = 1.0 - np.asarray(Pzb.sum(axis=0)).ravel()
                gv = pgx[pi_] * pgy[pj_]
                gap_vals = gv if gap_vals is None else gap_vals + gv
        if gap_vals is not None:
            acc = acc + sp.csr_matrix(
                (gap_vals, (pi_, pj_)), shape=shp
            )
        acc = acc.multiply(mask) / N
        dense = np.zeros(shp, dtype=np.float32)
        accc = acc.tocoo()
        dense[accc.row, accc.col] = accc.data.astype(np.float32)
        new_mats[(a, b)] = _sparsify(dense)
    return new_mats


def probcons_align(
    aobjs: Sequence[Tuple[str, str]],
    consistency: int = 2,
    refinement: int = 100,
    pretraining: int = 0,
    consgap: bool = False,
    seed: int = 0,
    precomputed=None,
    precomputed_scores=None,
    precomputed_mats=None,
    precomputed_dist=None,
):
    """Drop-in equivalent of probconslib.probcons().align(...)
    (Probcons.cc:1608-1713).  Returns ([(name, alnseq)...], conf list).

    precomputed: optional [(posterior, total), ...] for the (a<b) pair
    list, letting callers batch posterior computation across many MSA
    problems (e.g. all bubbles of a refinement pass) in one device call.
    precomputed_mats: optional consistency-transformed sparse matrices
    ((a, b) -> array) from batch_consistency — skips stage 2 here.
    precomputed_dist: optional (N, N) expected-accuracy distance matrix;
    together with precomputed_mats (batch_stage12_device) it skips
    stage 1 entirely — no posteriors ever reach the host.
    """
    del pretraining  # the binding accepts it; training is not reachable
    names = [n for n, s in aobjs]
    seqs = [s for n, s in aobjs]
    N = len(seqs)
    if N == 1:
        return [(names[0], seqs[0])], [0] * len(seqs[0])

    # ---- stage 1: all-pairs posteriors + expected-accuracy distances ----
    pair_keys = [(a, b) for a in range(N) for b in range(a + 1, N)]
    if precomputed_mats is not None and precomputed_dist is not None:
        mats = precomputed_mats
        dist = precomputed_dist
        consistency = 0
    else:
        if precomputed is not None:
            res = precomputed
            assert len(res) == len(pair_keys)
        else:
            res = batch_posteriors(
                [(seqs[a], seqs[b]) for a, b in pair_keys]
            )
        mats = {}
        dist = np.zeros((N, N), dtype=np.float64)
        for k, ((a, b), (p, tot)) in enumerate(zip(pair_keys, res)):
            # compact device transfers stay sparse until a consumer
            # actually needs dense (long pairs never densify)
            mats[(a, b)] = (
                p if isinstance(p, SparsePost) else _sparsify(p)
            )
            # expected-accuracy distance uses the dense posterior
            # (DoAlign, Probcons.cc:384-400); with the sparsified
            # transfer path the score comes precomputed from the device
            # (same cummax recurrence, pairhmm.fetch_posteriors_cut)
            if precomputed_scores is not None:
                score = precomputed_scores[k]
            else:
                edit, score = _mea_dp_fast(p)
            dist[a, b] = dist[b, a] = score / max(
                1, min(len(seqs[a]), len(seqs[b]))
            )

        if precomputed_mats is not None:
            mats = precomputed_mats
            consistency = 0

    # ---- stage 2: consistency transform ----
    # Dense f64 matmuls for typical bubble sizes; sparse (scipy csr)
    # triple products for long bubbles, where the cutoff leaves <=100
    # nonzeros per row — the reference's own representation
    # (SparseMatrix.h:14-67).  The relaxed value is only needed on P's
    # nonzero pattern (DoRelaxation masks to it, Probcons.cc:1203-1234).
    use_sparse = consistency > 0 and any(
        m.shape[0] * m.shape[1] > _SPARSE_CONS_MIN_ELEMS
        for m in mats.values()
    )
    if not use_sparse:
        # short pairs: the dense rounds (and stage 3) want ndarrays
        mats = {
            k: (m.dense() if isinstance(m, SparsePost) else m)
            for k, m in mats.items()
        }
    for _ in range(consistency):
        if use_sparse:
            mats = _consistency_round_sparse(mats, pair_keys, N, consgap)
            continue
        new_mats = {}
        for (a, b) in pair_keys:
            P = mats[(a, b)]
            acc = 2.0 * P.astype(np.float64)
            for z in range(N):
                if z == a or z == b:
                    continue
                Paz = mats[(a, z)] if a < z else mats[(z, a)].T
                Pzb = mats[(z, b)] if z < b else mats[(b, z)].T
                acc += Paz.astype(np.float64) @ Pzb.astype(np.float64)
                if consgap:
                    pgx = 1.0 - Paz.sum(axis=1)
                    pgy = 1.0 - Pzb.sum(axis=0)
                    acc += np.outer(pgx, pgy)
            acc /= N
            # mask to the previous sparsity pattern (DoRelaxation
            # Probcons.cc:1203-1234), then re-cutoff
            acc[P == 0] = 0
            new_mats[(a, b)] = _sparsify(acc.astype(np.float32))
        mats = new_mats

    # ---- stage 3+4: guide tree + progressive alignment ----
    tree = _compute_tree(dist)

    def process(node) -> _Aln:
        if isinstance(node, int):
            return _Aln([node], [seqs[node]])
        left = process(node[0])
        right = process(node[1])
        merged, _ = _align_alignments(left, right, mats)
        return merged

    aln = process(tree)

    # ---- stage 5: iterative refinement ----
    # the bipartition stream is drawn up front (identical rng call
    # sequence to the per-round draw) so the whole stage can run in one
    # native call: project + BuildPosterior + MEA + re-merge per round,
    # CSR posteriors, no per-round Python (DoIterativeRefinement,
    # Probcons.cc:1467-1490)
    rng = np.random.default_rng(seed)
    masks = np.stack(
        [rng.integers(0, 2, size=N) for _ in range(refinement)]
    ).astype(np.uint8) if refinement else np.zeros((0, N), np.uint8)
    aln = _refine_stage(aln, masks, mats, N)

    # ---- stage 6: column confidence ----
    conf = _annotation(aln, mats)

    rows_by_label = {l: r for l, r in zip(aln.labels, aln.rows)}
    return [(names[k], rows_by_label[k]) for k in range(N)], conf


def _project(aln: _Aln, group: List[int]) -> _Aln:
    """MultiSequence::Project (MultiSequence.h:653-700): drop all-gap
    columns of the sub-alignment."""
    idxs = [aln.labels.index(g) for g in sorted(group)]
    rows = [aln.rows[i] for i in idxs]
    mat = np.stack(
        [np.frombuffer(r.encode("latin1"), dtype=np.uint8) for r in rows]
    )
    keep = (mat != ord("-")).any(axis=0)
    sub = mat[:, keep]
    return _Aln(
        [aln.labels[i] for i in idxs],
        [sub[k].tobytes().decode("latin1") for k in range(sub.shape[0])],
    )


def _refine_once(aln: _Aln, g1, g2, mats) -> _Aln:
    a1 = _project(aln, g1)
    a2 = _project(aln, g2)
    merged, _ = _align_alignments(a1, a2, mats)
    return merged


def _refine_stage(aln: _Aln, masks: np.ndarray, mats, N: int) -> _Aln:
    """Run all refinement rounds: one native call when available
    (native.refine_rounds_native, bit-identical differential test in
    tests/test_msa.py), else the per-round Python loop."""
    if aln.labels == list(range(N)):
        try:
            from ..native import refine_rounds_native

            rows = np.stack(
                [
                    np.frombuffer(r.encode("latin1"), dtype=np.uint8)
                    for r in aln.rows
                ]
            ) if aln.length else np.zeros((N, 0), np.uint8)
            mats_list = [
                mats[(a, b)] for a in range(N) for b in range(a + 1, N)
            ]
            res = refine_rounds_native(rows, mats_list, masks)
            if res is not None:
                return _Aln(
                    list(range(N)),
                    [
                        res[k].tobytes().decode("latin1")
                        for k in range(N)
                    ],
                )
        except Exception:  # pragma: no cover
            pass
    for mask in masks:
        g1 = [k for k in range(N) if mask[k]]
        g2 = [k for k in range(N) if not mask[k]]
        if not g1 or not g2:
            continue
        aln = _refine_once(aln, g1, g2, mats)
    return aln


def _annotation(aln: _Aln, mats) -> List[int]:
    """ComputeAnnotation/ComputeScore (Probcons.cc:1545-1602), vectorized:
    conf[c] = int(200 * sum over active pairs of P[pos_a, pos_b]
                  / (n_active * (n_active - 1)))."""
    L = aln.length
    n = len(aln.rows)
    act = np.array(
        [[ch != "-" for ch in row] for row in aln.rows], dtype=bool
    )  # (n, L)
    pos = np.cumsum(act, axis=1)  # 1-based residue index where active
    val = np.zeros(L, dtype=np.float64)
    for i in range(n):
        for j in range(i + 1, n):
            a, b = aln.labels[i], aln.labels[j]
            m = act[i] & act[j]
            if not m.any():
                continue
            if a < b:
                P = mats[(a, b)]
                val[m] += P[pos[i][m], pos[j][m]]
            else:
                P = mats[(b, a)]
                val[m] += P[pos[j][m], pos[i][m]]
    nact = act.sum(axis=0)
    denom = nact * (nact - 1)
    conf = np.where(denom > 0, 200 * val / np.maximum(denom, 1), 0.0)
    return [int(c) for c in conf]
