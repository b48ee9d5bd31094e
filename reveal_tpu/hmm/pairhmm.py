"""5-state pair-HMM forward/backward/posterior, TPU-native.

Model identical to REVEAL's re-parameterized ProbCons
(/root/reference/probcons/ProbabilisticModel.h:36-331, parameters
/root/reference/probcons/Defaults.h): states M, Ix_short, Iy_short,
Ix_long, Iy_long (NumInsertStates=2), pecan-derived DNA emissions over
"ACGTN", init distribution 0.2 each.  gapSwitch transitions only
renormalize the insert->match mass; they never appear in the DP
(ProbabilisticModel.h:149-166,232-252), which is what makes the row-scan
formulation below exact.

TPU mapping: instead of the reference's scalar (i,j) sweep, each DP row is
computed with vector ops — M and Ix rows depend only on the previous row
(elementwise), and the within-row Iy recurrence
    Iy[j] = e[j] + logaddexp(M[j-1] + open, Iy[j-1] + ext)
is a log-space linear recurrence solved with an associative
log-cumsum-exp scan.  lax.scan over rows, vmap over the pair batch.
Differences vs the reference: exact float32 logaddexp instead of the
LOG_ADD lookup table (ScoreType.h:64-150); enable compat later if
bit-parity of refined graphs requires it.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

LOG_ZERO = -2e20  # ScoreType.h:16

# ---------------------------------------------------------------------------
# parameters (Defaults.h)
# ---------------------------------------------------------------------------

ALPHABET = "ACGTN"
INIT_DISTRIB = np.array([0.2, 0.2, 0.2, 0.2, 0.2], dtype=np.float32)
GAP_OPEN = np.array(
    [0.0129868352330243, 0.0129868352330243, 0.001821479941, 0.001821479941],
    dtype=np.float32,
)
GAP_EXTEND = np.array(
    [0.7126062401851738, 0.7126062401851738, 0.99656342579062, 0.99656342579062],
    dtype=np.float32,
)
GAP_SWITCH = np.array([0.0073673675173412815, 0.0], dtype=np.float32)

EMIT_SINGLE_DEFAULT = 1e-5
EMIT_PAIR_DEFAULT = 1e-10
_EMIT_SINGLE_ALPHA = np.array([0.2] * 5, dtype=np.float32)
_EMIT_PAIRS_ALPHA = np.array(
    [
        [0.12064298095701059, 0.0, 0.0, 0.0, 0.0],
        [0.010367271172731285, 0.12064298095701059, 0.0, 0.0, 0.0],
        [0.01862247669752685, 0.010367271172731285, 0.12064298095701059, 0.0, 0.0],
        [
            0.010367271172731285,
            0.01862247669752685,
            0.010367271172731285,
            0.12064298095701059,
            0.0,
        ],
        [0.04, 0.04, 0.04, 0.04, 0.04],
    ],
    dtype=np.float32,
)


def _emission_tables():
    """256-wide byte-indexed log emission tables (Probcons.cc:917-935)."""
    emit_single = np.full(256, EMIT_SINGLE_DEFAULT, dtype=np.float32)
    emit_pairs = np.full((256, 256), EMIT_PAIR_DEFAULT, dtype=np.float32)
    for i, a in enumerate(ALPHABET):
        for ca in (a.lower(), a.upper()):
            emit_single[ord(ca)] = _EMIT_SINGLE_ALPHA[i]
        for j in range(i + 1):
            b = ALPHABET[j]
            v = _EMIT_PAIRS_ALPHA[i][j]
            for ca in (a.lower(), a.upper()):
                for cb in (b.lower(), b.upper()):
                    emit_pairs[ord(ca), ord(cb)] = v
                    emit_pairs[ord(cb), ord(ca)] = v
    with np.errstate(divide="ignore"):
        return np.log(emit_single), np.log(emit_pairs)


LOG_EMIT_SINGLE, LOG_EMIT_PAIRS = _emission_tables()


def _log_params():
    """(log_init[5], log_trans[5][5]) per ProbabilisticModel.h:51-77."""
    trans = np.zeros((5, 5), dtype=np.float64)
    trans[0][0] = 1.0
    for i in range(2):
        trans[0][2 * i + 1] = GAP_OPEN[2 * i]
        trans[0][2 * i + 2] = GAP_OPEN[2 * i + 1]
        trans[0][0] -= GAP_OPEN[2 * i] + GAP_OPEN[2 * i + 1]
        trans[2 * i + 1][2 * i + 1] = GAP_EXTEND[2 * i]
        trans[2 * i + 2][2 * i + 2] = GAP_EXTEND[2 * i + 1]
        trans[2 * i + 1][2 * i + 2] = GAP_SWITCH[i]
        trans[2 * i + 2][2 * i + 1] = GAP_SWITCH[i]
        trans[2 * i + 1][0] = 1 - GAP_EXTEND[2 * i] - GAP_SWITCH[i]
        trans[2 * i + 2][0] = 1 - GAP_EXTEND[2 * i + 1] - GAP_SWITCH[i]
    with np.errstate(divide="ignore"):
        log_trans = np.where(
            trans > 0, np.log(trans.astype(np.float32)), LOG_ZERO
        ).astype(np.float32)
        log_init = np.log(INIT_DISTRIB).astype(np.float32)
    return log_init, log_trans


LOG_INIT, LOG_TRANS = _log_params()

_jit_cache = {}


def _get_kernels():
    if "posterior" in _jit_cache:
        return _jit_cache["posterior"]

    import jax
    import jax.numpy as jnp

    from ..core.jaxconfig import configure_jax

    configure_jax()

    # Parameter tables stay *numpy*: numpy closure constants lower through
    # the host-side constant path, whereas jnp arrays become device
    # ArrayImpl constants whose lowering blocks on a device fetch per
    # compile (minutes over a busy remote-device tunnel).  Tracer
    # fancy-indexing of numpy requires jnp.take.
    log_init = LOG_INIT
    log_trans = LOG_TRANS
    les_tab = LOG_EMIT_SINGLE
    lep_tab = LOG_EMIT_PAIRS

    def les(idx):
        return jnp.take(les_tab, idx.astype(jnp.int32))

    def lep_row(c1, ys):
        row = jnp.take(lep_tab, c1.astype(jnp.int32), axis=0)
        return jnp.take(row, ys.astype(jnp.int32))

    NEG = jnp.float32(LOG_ZERO)

    def lse(*xs):
        m = xs[0]
        for x in xs[1:]:
            m = jnp.maximum(m, x)
        s = sum(jnp.exp(x - m) for x in xs)
        out = m + jnp.log(s)
        return jnp.where(m <= NEG / 2, NEG, out)

    def logaddexp(a, b):
        return lse(a, b)

    def _row_scan_iy(m_row, e2_row, open_y, ext, seed):
        """Solve Iy[j] = e2[j] + logaddexp(M[j-1]+open_y (+seed_j), Iy[j-1]+ext)
        along a row with a log-cumsum-exp associative scan.

        m_row, e2_row, seed: (L2+1,); seed adds an extra source term at
        fixed positions (the (0,1) init cell).  Entry j=0 is LOG_ZERO.
        """
        L21 = m_row.shape[0]
        jar = jnp.arange(L21, dtype=jnp.float32)
        m_prev = jnp.concatenate([jnp.full((1,), NEG), m_row[:-1]])
        g = logaddexp(m_prev + open_y, seed)
        # E[j] = cumsum of e2 with e2[0] treated as 0
        e2 = e2_row.at[0].set(0.0)
        E = jnp.cumsum(e2)
        Eprev = jnp.concatenate([jnp.zeros((1,)), E[:-1]])
        a = g - Eprev - ext * jar
        # running logaddexp
        W = jax.lax.associative_scan(jnp.logaddexp, a)
        iy = W + E + ext * jar
        iy = jnp.where(W <= NEG / 4, NEG, iy)
        return iy.at[0].set(NEG)

    def forward(x, y):
        """x, y: (L1+1,), (L2+1,) uint8 with dummy byte at index 0.
        Returns f: (5, L1+1, L2+1) float32."""
        L1p = x.shape[0]
        L2p = y.shape[0]

        e2 = les(y)  # (L2+1,)
        match_row = lambda c1: lep_row(c1, y)  # (L2+1,)

        def step(carry, i):
            # carry: (5, L2+1) previous row
            prev = carry
            c1 = x[jnp.minimum(i, L1p - 1)]
            mrow_e = match_row(c1)
            e1 = les(c1)

            # M[i][j] = match + lse_k prev[k][j-1] + t[k][0]
            shifted = jnp.concatenate(
                [jnp.full((5, 1), NEG), prev[:, :-1]], axis=1
            )
            m = mrow_e + lse(
                shifted[0] + log_trans[0, 0],
                shifted[1] + log_trans[1, 0],
                shifted[2] + log_trans[2, 0],
                shifted[3] + log_trans[3, 0],
                shifted[4] + log_trans[4, 0],
            )
            # init cell (1,1)
            m = jnp.where(
                (i == 1),
                m.at[1].set(log_init[0] + lep_row(x[1 % L1p], y[1 % L2p])),
                m,
            )
            m = jnp.where(i == 0, jnp.full_like(m, NEG), m)
            m = m.at[0].set(NEG)

            # Ix_k[i][j] = e1 + logaddexp(M[i-1][j]+t0, Ix[i-1][j]+ext)
            ix1 = e1 + logaddexp(
                prev[0] + log_trans[0, 1], prev[1] + log_trans[1, 1]
            )
            ix2 = e1 + logaddexp(
                prev[0] + log_trans[0, 3], prev[3] + log_trans[3, 3]
            )
            # init cells (1,0)
            ix1 = jnp.where(i == 1, ix1.at[0].set(log_init[1] + e1), ix1)
            ix2 = jnp.where(i == 1, ix2.at[0].set(log_init[3] + e1), ix2)
            ix1 = jnp.where(i == 0, jnp.full_like(ix1, NEG), ix1)
            ix2 = jnp.where(i == 0, jnp.full_like(ix2, NEG), ix2)

            # Iy_k via row scan; seed at (0,1)
            seed = jnp.full((L2p,), NEG)
            seed1 = jnp.where(
                i == 0, seed.at[1 % L2p].set(log_init[2]), seed
            )
            seed2 = jnp.where(
                i == 0, seed.at[1 % L2p].set(log_init[4]), seed
            )
            iy1 = _row_scan_iy(m, e2, log_trans[0, 2], log_trans[2, 2], seed1)
            iy2 = _row_scan_iy(m, e2, log_trans[0, 4], log_trans[4, 4], seed2)

            row = jnp.stack([m, ix1, iy1, ix2, iy2])
            return row, row

        init = jnp.full((5, L2p), NEG)
        _, rows = jax.lax.scan(step, init, jnp.arange(L1p))
        return jnp.transpose(rows, (1, 0, 2))  # (5, L1+1, L2+1)

    def backward_dual(xr, yr):
        """Dual-grid DP over *already reversed* sequences.  Returns
        G: (5, L1+1, L2+1) with G[k][i'][j'] = B[k][L1-i'][L2-j']."""
        L1p = xr.shape[0]
        L2p = yr.shape[0]
        e2r = les(yr)

        def step(carry, ip):
            prev = carry  # (5, L2+1) = G rows at i'-1
            c1 = xr[jnp.minimum(ip, L1p - 1)]
            e1 = les(c1)
            mrow_e = lep_row(c1, yr)

            # dual match row: Gm[ip][jp] = lse over sources that *enter*
            # state 0 ... we compute helper H[jp] = match+G0[ip-1][jp-1]
            g0_shift = jnp.concatenate([jnp.full((1,), NEG), prev[0][:-1]])
            # note emission uses chars at reversed position jp (mrow_e[jp])
            H = mrow_e + g0_shift  # (L2+1,)

            # Gx_k[ip][jp] = logaddexp(t[xk][0] + H[jp], t[xk][xk] + e1 +
            #                Gx_k[ip-1][jp])
            gx1 = logaddexp(
                log_trans[1, 0] + H, log_trans[1, 1] + e1 + prev[1]
            )
            gx2 = logaddexp(
                log_trans[3, 0] + H, log_trans[3, 3] + e1 + prev[3]
            )

            # base seeds: G[k][0][0] = init[k]; for the y-extension states the
            # seed must enter the row scan so row 0 extends along j'
            gx1 = jnp.where(ip == 0, gx1.at[0].set(log_init[1]), gx1)
            gx2 = jnp.where(ip == 0, gx2.at[0].set(log_init[3]), gx2)

            # Gy_k row recurrence:
            # Gy[jp] = logaddexp(t[yk][0] + H[jp] (+seed at jp==0),
            #                    t[yk][yk] + e2r[jp] + Gy[jp-1])
            def row_scan_gy(t_enter, t_ext, seed0):
                g = t_enter + H
                g = g.at[0].set(jnp.where(ip == 0, seed0, NEG))
                jar = jnp.arange(L2p, dtype=jnp.float32)
                e2x = e2r.at[0].set(0.0)
                E = jnp.cumsum(e2x)
                # Gy[jp] = logaddexp(g[jp], Gy[jp-1] + t_ext + e2r[jp])
                # => W[jp] = logaddexp(W[jp-1], g[jp] - E[jp] - t_ext*jp)
                a = g - E - t_ext * jar
                W = jax.lax.associative_scan(jnp.logaddexp, a)
                gy = W + E + t_ext * jar
                return jnp.where(W <= NEG / 4, NEG, gy)

            gy1 = row_scan_gy(log_trans[2, 0], log_trans[2, 2], log_init[2])
            gy2 = row_scan_gy(log_trans[4, 0], log_trans[4, 4], log_init[4])

            # G0 row: all moves leaving state 0
            gy1_shift = jnp.concatenate([jnp.full((1,), NEG), gy1[:-1]])
            gy2_shift = jnp.concatenate([jnp.full((1,), NEG), gy2[:-1]])
            g0 = lse(
                log_trans[0, 0] + H,
                log_trans[0, 1] + e1 + prev[1],
                log_trans[0, 3] + e1 + prev[3],
                log_trans[0, 2] + e2r + gy1_shift,
                log_trans[0, 4] + e2r + gy2_shift,
            )
            g0 = jnp.where(ip == 0, g0.at[0].set(log_init[0]), g0)

            row = jnp.stack([g0, gx1, gy1, gx2, gy2])
            return row, row

        init = jnp.full((5, L2p), NEG)
        _, rows = jax.lax.scan(step, init, jnp.arange(L1p))
        return jnp.transpose(rows, (1, 0, 2))  # (5, L1'+1, L2'+1)

    def backward(x, y):
        """Backward matrix for full-length x, y (1-indexed with dummy).
        Returns (5, L1+1, L2+1): [k][i][j] = log prob of emitting the
        suffix starting from state k at (i, j)."""
        xr = jnp.concatenate([x[:1], x[1:][::-1]])
        yr = jnp.concatenate([y[:1], y[1:][::-1]])
        G = backward_dual(xr, yr)
        # B[k][i][j] = G[k][L1-i][L2-j]
        return G[:, ::-1, ::-1]

    def posterior_full(x, y):
        """Full posterior for one (padded-to-full-length) pair; lengths are
        the full array lengths here — batching with ragged lengths pads at
        the caller and slices after."""
        f = forward(x, y)
        b = backward(x, y)
        total_fwd = lse(*[f[k, -1, -1] + log_init[k] for k in range(5)])
        p = jnp.exp(
            jnp.minimum(0.0, f[0] + b[0] - total_fwd)
        )
        p = p.at[0, :].set(0.0).at[:, 0].set(0.0)
        return p, total_fwd

    def _reverse_within(x, lx):
        """xr[i'] = x[lx-i'+1] for 1<=i'<=lx; '~' beyond; dummy at 0."""
        L = x.shape[0]
        iar = jnp.arange(L)
        idx = jnp.clip(lx - iar + 1, 0, L - 1)
        xr = jnp.where((iar >= 1) & (iar <= lx), x[idx], jnp.uint8(ord("~")))
        return xr.at[0].set(x[0])

    def posterior_masked(x, y, lx, ly):
        """Length-aware posterior for one padded pair.

        x: (L1max+1,) uint8 (dummy at 0, '~' padding); lx true length.
        Returns p: (L1max+1, L2max+1) with valid region [0..lx, 0..ly],
        and the total log-probability.
        """
        L1p = x.shape[0]
        L2p = y.shape[0]
        f = forward(x, y)
        # total at the true corner
        total_fwd = lse(*[f[k, lx, ly] + log_init[k] for k in range(5)])

        xr = _reverse_within(x, lx)
        yr = _reverse_within(y, ly)
        G = backward_dual(xr, yr)  # (5, L1+1, L2+1) dual grid (unflipped)
        # B[0][i][j] = G[0][lx-i][ly-j]
        g0f = G[0][::-1, ::-1]  # g0f[a][b] = G0[L1max-a][L2max-b]
        b0 = jnp.roll(
            g0f, shift=(-(L1p - 1 - lx), -(L2p - 1 - ly)), axis=(0, 1)
        )
        p = jnp.exp(jnp.minimum(0.0, f[0] + b0 - total_fwd))
        iar = jnp.arange(L1p)[:, None]
        jar = jnp.arange(L2p)[None, :]
        mask = (iar >= 1) & (iar <= lx) & (jar >= 1) & (jar <= ly)
        return jnp.where(mask, p, 0.0), total_fwd

    batched = jax.jit(jax.vmap(posterior_masked))

    _jit_cache["posterior"] = (forward, backward, posterior_full, batched)
    _jit_cache["posterior_masked"] = posterior_masked
    return _jit_cache["posterior"]


def get_masked_kernel():
    """Unjitted length-aware posterior (x, y, lx, ly) -> (p, total)."""
    _get_kernels()
    return _jit_cache["posterior_masked"]


def _pad_with_dummy(seq: bytes, L: int) -> np.ndarray:
    """'@' dummy at index 0 (probcons Sequence convention), '~' padding."""
    arr = np.full(L + 1, ord("~"), dtype=np.uint8)
    arr[0] = ord("@")
    s = np.frombuffer(seq, dtype=np.uint8)
    arr[1 : len(s) + 1] = s
    return arr


def posterior_np(seq1: str, seq2: str) -> Tuple[np.ndarray, float]:
    """Single-pair posterior on device; returns ((L1+1)x(L2+1), total)."""
    import jax

    forward, backward, posterior_full, batched = _get_kernels()
    x = _pad_with_dummy(seq1.encode(), len(seq1))
    y = _pad_with_dummy(seq2.encode(), len(seq2))
    p, total = jax.jit(posterior_full)(x, y)
    return np.asarray(p), float(total)


def _bucket(n: int) -> int:
    b = 16
    while b < n:
        b *= 2
    return b


# --- device->host posterior transfer ---------------------------------------
# A posterior row sums to <= 1, so at most 100 entries can clear the MSA's
# POSTERIOR_CUTOFF=0.01 (SparseMatrix.h:14,67); per-row top-K with K=128 is
# therefore an EXACT transfer of every cell the sparse consumers can see,
# while sub-cutoff mass is zeroed (the reference's SparseMatrix drops it at
# construction too).  Wide matrices shrink ~L2/(2K)x on the wire, which
# dominates end-to-end refine time on bandwidth-constrained device links.
SPARSE_TRANSFER_MIN_WIDTH = 513  # activate when posterior width >= this
SPARSE_TRANSFER_K = 128

# Cutoff-first transfer (fetch_posteriors_cut): the 0.01 cutoff is
# applied ON DEVICE, so the expected per-row survivor count is ~2-4 for
# the similar sequences refine aligns and K=32 covers almost every row;
# the per-row survivor COUNTS come back with the values, and any row
# exceeding K triggers a refetch one ladder step wider (8 -> 32 -> 128;
# <=100 survivors fit by the row-sum bound, so 128 is always exact).
# The escalation is sticky for the process (measured: a diffuse
# workload that overflows once overflows every batch, and the double
# dispatch costs more than the wider fetch).  K=8 start: the payload is
# latency+bandwidth-bound over a remote link, and similar sequences
# rarely exceed 8 survivors per row.  The MEA distance score is
# computed on device from the FULL posterior in the same dispatch (the
# cummax row scan of msa._build_chain_fn, bit-equal to the host
# _mea_dp_fast recurrence), so nothing downstream needs the dense
# matrix at all.
SPARSE_CUT_K = 8

_topk_fn = None
_cut_fns = {}
_cut_k_current = SPARSE_CUT_K

# Ragged transport: the K-rectangular (B, L1p, K) survivor rows still
# waste ~2x on the wire (mean survivors/row is ~2-4, K=8 slots are
# fetched regardless).  The packed form compacts all survivors into one
# flat (CAP,) value/index pair on device (cumsum + scatter) and ships
# (flat_v, flat_i, cnt) — the host rebuilds the identical rectangles.
# CAP starts at 4 survivors/row and escalates stickily like the K
# ladder.  REVEAL_TPU_PACKED_POST=0 restores rectangular transport.
PACKED_POST = os.environ.get("REVEAL_TPU_PACKED_POST", "1") != "0"
_pack_fns = {}
_pack_capm_current = 4


def _get_cut_fn(K: int):
    fn = _cut_fns.get(K)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    @jax.jit
    def cut(p):
        B, L1p, L2p = p.shape
        m = p >= 0.01
        m = m.at[:, 0, :].set(False).at[:, :, 0].set(False)
        q = jnp.where(m, p, 0.0)
        cnt = m.sum(-1).astype(jnp.int32)
        v, i = jax.lax.top_k(q, k=K)
        if L2p < 2**15:
            i = i.astype(jnp.int16)
        # MEA score scan over the FULL posterior (msa._build_chain_fn),
        # 4 rows per scan step (the 1-row scan's per-step overhead was
        # 46 ms of the 176 ms e2e at B=128 L=512 — profiled r5); rows
        # are padded to a multiple of 4 with -inf rows, which preserve
        # the final per-batch max (the DP rows are nondecreasing in j,
        # so a -inf row maps old -> cummax(old[1:]) whose last entry is
        # exactly old[-1] — the only value read).
        R4 = 4

        def row4(old, prows):
            for r in range(R4):
                d = prows[r][:, 1:] + old[:, :-1]
                u = old[:, 1:]
                c = jnp.maximum(d, u)
                mx = jax.lax.cummax(c, axis=1)
                old = jnp.concatenate(
                    [jnp.zeros((B, 1), jnp.float32), mx], axis=1
                )
            return old, None

        rows = jnp.transpose(p, (1, 0, 2))[1:]
        nr = rows.shape[0]
        npadr = (-nr) % R4
        if npadr:
            rows = jnp.concatenate(
                [
                    rows,
                    jnp.full(
                        (npadr, B, L2p), -jnp.inf, jnp.float32
                    ),
                ]
            )
        rows = rows.reshape(-1, R4, B, L2p)
        old0 = jnp.zeros((B, L2p), jnp.float32)
        oldf, _ = jax.lax.scan(row4, old0, rows)
        return v, i, cnt, oldf[:, -1]

    _cut_fns[K] = cut
    return cut


def _get_pack_fn(K: int, CAPM: int):
    """Cut fn + ragged pack: returns (flat_v[CAP], flat_i[CAP], cnt,
    scores, total_survivors) with CAP = B*L1p*CAPM."""
    fnk = _pack_fns.get((K, CAPM))
    if fnk is not None:
        return fnk
    import jax
    import jax.numpy as jnp

    cut = _get_cut_fn(K)

    @jax.jit
    def pack(p):
        v, i, cnt, sc = cut(p)
        B, L1p, _ = v.shape
        CAP = B * L1p * CAPM
        valid = jnp.arange(K)[None, None, :] < cnt[..., None]
        fv = v.reshape(-1)
        fi = i.reshape(-1)
        fvalid = valid.reshape(-1)
        dst = jnp.cumsum(fvalid.astype(jnp.int32)) - 1
        dst = jnp.where(fvalid, dst, CAP)
        pv = jnp.zeros(CAP, jnp.float32).at[dst].set(fv, mode="drop")
        pi = jnp.zeros(CAP, i.dtype).at[dst].set(fi, mode="drop")
        S = jnp.sum(cnt)
        # counts cross the link as u8 (<=100 survivors by the row-sum
        # bound) — the (B, L1p) i32 plane was ~10 ms of tunnel time
        return pv, pi, cnt.astype(jnp.uint8), sc, S

    _pack_fns[(K, CAPM)] = pack
    return pack


def fetch_posteriors_compact(p, tot):
    """Cutoff-sparsified posterior transfer + device MEA scores,
    COMPACT form: only the top-K (value, index) rows, the per-row
    survivor counts, the totals and the full-dense MEA scores cross the
    link — ~K*(4+2) bytes per row instead of 4*L2, and the host never
    materializes a dense batch (msa.SparsePost wraps the rows).

    Returns (v, i, cnt, tot, scores); rows' first cnt[b, r] entries are
    exactly the >=0.01 survivors of msa._sparsify (row/col 0 zeroed on
    device)."""
    import jax

    global _cut_k_current, _pack_capm_current
    K = _cut_k_current
    if PACKED_POST:
        B, L1p, _ = p.shape
        CAPM = _pack_capm_current
        while True:
            # ONE device_get: ragged flat survivors + counts + scores
            pv, pi, cnt, sc, S = _get_pack_fn(K, CAPM)(p)
            pv, pi, cnt, scores, tot_h, S = jax.device_get(
                (pv, pi, cnt, sc, tot, S)
            )
            cnt = np.asarray(cnt).astype(np.int32)
            S = int(S)
            if int(cnt.max(initial=0)) > K:
                K = 32 if K < 32 else SPARSE_TRANSFER_K
                _cut_k_current = K  # sticky
                continue
            if S > B * L1p * CAPM:
                CAPM *= 2
                _pack_capm_current = CAPM  # sticky
                continue
            break
        # rebuild the K-rectangles (row-major flat order means each
        # batch-row's survivors are contiguous; boolean fill is in the
        # same order)
        v = np.zeros((B, L1p, K), np.float32)
        i = np.zeros((B, L1p, K), pi.dtype)
        valid = np.arange(K)[None, None, :] < cnt[..., None]
        v[valid] = pv[:S]
        i[valid] = pi[:S]
        return v, i, cnt, np.asarray(tot_h), np.asarray(scores)
    while True:
        # ONE device_get for everything: over a remote-device link the
        # per-fetch round trip (~0.2-0.3 s) dominates the compact
        # payload, so cnt/v/i/scores/tot must ride one transfer (three
        # sequential fetches measured 152 Mcells/s at B=32 L=2048; one
        # fetch is the difference between latency- and volume-bound)
        v, i, cnt, sc = _get_cut_fn(K)(p)
        v, i, cnt, scores, tot_h = jax.device_get((v, i, cnt, sc, tot))
        cnt = np.asarray(cnt)
        if int(cnt.max(initial=0)) <= K:
            break
        K = 32 if K < 32 else SPARSE_TRANSFER_K  # ladder 8->32->128
        _cut_k_current = K  # sticky: avoid repeated double dispatch
    return (
        np.asarray(v),
        np.asarray(i),
        cnt,
        np.asarray(tot_h),
        np.asarray(scores),
    )


_fused_fns = {}


def posterior_pack_fused(posterior_batch, xb, yb, lx, ly):
    """ONE dispatch for posterior + cut + ragged pack: the separate
    pack dispatch costs a tunnel round trip (~20-40 ms of the 150 ms
    e2e at B=128 L=512, profiled r5), so the pack fn is jit-composed
    around the Pallas posterior call.  Ladder escalation (K / CAPM)
    re-runs the fused fn; sticky, so steady state is one dispatch +
    one device_get per batch."""
    global _cut_k_current, _pack_capm_current
    import jax

    if not PACKED_POST:
        p, tot = posterior_batch(xb, yb, lx, ly)
        return fetch_posteriors_compact(p, tot)
    while True:
        K = _cut_k_current
        CAPM = _pack_capm_current
        key = (id(posterior_batch), K, CAPM)
        fn = _fused_fns.get(key)
        if fn is None:
            pk = _get_pack_fn(K, CAPM)

            def _make(pb, pk):
                @jax.jit
                def f(xb, yb, lx, ly):
                    p, tot = pb(xb, yb, lx, ly)
                    pv, pi, cnt, sc, S = pk(p)
                    return pv, pi, cnt, sc, S, tot

                return f

            fn = _make(posterior_batch, pk)
            _fused_fns[key] = fn
        pv, pi, cnt, scores, S, tot_h = jax.device_get(
            fn(xb, yb, lx, ly)
        )
        cnt = np.asarray(cnt).astype(np.int32)
        S = int(S)
        B, L1p = cnt.shape
        if int(cnt.max(initial=0)) > K:
            _cut_k_current = 32 if K < 32 else SPARSE_TRANSFER_K
            continue
        if S > B * L1p * CAPM:
            _pack_capm_current = CAPM * 2
            continue
        break
    v = np.zeros((B, L1p, K), np.float32)
    i = np.zeros((B, L1p, K), pi.dtype)
    valid = np.arange(K)[None, None, :] < cnt[..., None]
    v[valid] = pv[:S]
    i[valid] = pi[:S]
    return v, i, cnt, np.asarray(tot_h), np.asarray(scores)


def fetch_posteriors_cut(p, tot):
    """Dense-reconstructing wrapper over fetch_posteriors_compact (the
    hardware oracle test compares against the dense fetch; production
    uses the compact form directly)."""
    v, i, cnt, tot, scores = fetch_posteriors_compact(p, tot)
    dense = np.zeros(p.shape, dtype=np.float32)
    np.put_along_axis(dense, i.astype(np.int64), v, axis=-1)
    # top_k pads short rows with index 0 value 0.0 — col 0 is zero anyway
    dense[:, :, 0] = 0.0
    return dense, tot, scores


def fetch_posteriors(p, tot):
    """Transfer a batched posterior (B, L1p, L2p) + totals to host numpy.
    Dense below SPARSE_TRANSFER_MIN_WIDTH; per-row top-K re-scattered on
    the host above it (shape-based decision, so behavior is identical on
    every backend)."""
    import jax

    global _topk_fn
    W = p.shape[-1]
    tot = np.asarray(jax.device_get(tot))
    if W < SPARSE_TRANSFER_MIN_WIDTH:
        return np.asarray(jax.device_get(p)), tot
    if _topk_fn is None:
        import jax.numpy as jnp

        @jax.jit
        def _topk(x):
            v, i = jax.lax.top_k(x, k=SPARSE_TRANSFER_K)
            # narrow the index dtype when the lane width allows: halves
            # the index bytes on the bandwidth-limited device link
            # (shape is static per compile, so the branch is free)
            if x.shape[-1] < 2**15:
                i = i.astype(jnp.int16)
            return v, i

        _topk_fn = _topk
    vals, idx = _topk_fn(p)
    vals = np.asarray(jax.device_get(vals))
    idx = np.asarray(jax.device_get(idx))
    dense = np.zeros(p.shape, dtype=vals.dtype)
    np.put_along_axis(dense, idx, vals, axis=-1)
    return dense, tot


def batch_posteriors(
    pairs, slice_output: bool = True, device=None, compat: bool = False
):
    """Batched posteriors for a list of (seq1, seq2) string pairs.

    Pads each pair into a power-of-two (L1, L2) bucket, vmaps the masked
    posterior kernel per bucket, and returns [(posterior, total), ...] in
    input order with posteriors sliced to (l1+1, l2+1).  ``device`` pins
    execution (jit follows input placement) — used to keep small batches
    on the host CPU device when the default backend is a remote
    accelerator.

    compat=True routes through the float32 LOG_ADD lookup-table twin
    (hmm/compat.py, ScoreType.h semantics) — slow scalar correctness
    mode for attempting bit-equivalence with the reference binary.
    """
    if compat:
        from .compat import posterior_compat

        out = []
        for s1, s2 in pairs:
            p, tot = posterior_compat(s1, s2)
            out.append((p.astype(np.float32), tot))
        return out

    import jax

    _, _, _, batched = _get_kernels()
    buckets = {}
    for i, (s1, s2) in enumerate(pairs):
        key = (_bucket(len(s1)), _bucket(len(s2)))
        buckets.setdefault(key, []).append(i)

    out = [None] * len(pairs)
    for (b1, b2), idxs in buckets.items():
        # pad the batch axis to a power of two as well (one compile per
        # (B, L1, L2) bucket)
        B = 1
        while B < len(idxs):
            B *= 2
        npad = B - len(idxs)
        xb = np.stack(
            [_pad_with_dummy(pairs[i][0].encode(), b1) for i in idxs]
            + [_pad_with_dummy(b"A", b1)] * npad
        )
        yb = np.stack(
            [_pad_with_dummy(pairs[i][1].encode(), b2) for i in idxs]
            + [_pad_with_dummy(b"A", b2)] * npad
        )
        lx = np.array(
            [len(pairs[i][0]) for i in idxs] + [1] * npad, dtype=np.int32
        )
        ly = np.array(
            [len(pairs[i][1]) for i in idxs] + [1] * npad, dtype=np.int32
        )
        if device is not None:
            xb, yb = jax.device_put((xb, yb), device)
            lx_d, ly_d = jax.device_put((lx, ly), device)
            p, tot = batched(xb, yb, lx_d, ly_d)
        else:
            p, tot = batched(xb, yb, lx, ly)
        p, tot = fetch_posteriors(p, tot)
        for bi, i in enumerate(idxs):
            if slice_output:
                out[i] = (
                    p[bi, : lx[bi] + 1, : ly[bi] + 1],
                    float(tot[bi]),
                )
            else:
                out[i] = (p[bi], float(tot[bi]))
    return out


# ---------------------------------------------------------------------------
# numpy oracle — direct port of the reference scalar DP for testing
# ---------------------------------------------------------------------------

def forward_np(seq1: str, seq2: str) -> np.ndarray:
    """Scalar forward DP (ProbabilisticModel.h:102-176), exact logaddexp."""
    L1, L2 = len(seq1), len(seq2)
    x = _pad_with_dummy(seq1.encode(), L1)
    y = _pad_with_dummy(seq2.encode(), L2)
    f = np.full((5, L1 + 1, L2 + 1), LOG_ZERO, dtype=np.float64)
    li = LOG_INIT.astype(np.float64)
    lt = LOG_TRANS.astype(np.float64)
    les = LOG_EMIT_SINGLE.astype(np.float64)
    lep = LOG_EMIT_PAIRS.astype(np.float64)

    def lae(a, b):
        if a <= LOG_ZERO / 2 and b <= LOG_ZERO / 2:
            return LOG_ZERO
        return np.logaddexp(a, b)

    if L1 >= 1 and L2 >= 1:
        f[0, 1, 1] = li[0] + lep[x[1], y[1]]
    for k in range(2):
        if L1 >= 1:
            f[2 * k + 1, 1, 0] = li[2 * k + 1] + les[x[1]]
        if L2 >= 1:
            f[2 * k + 2, 0, 1] = li[2 * k + 2] + les[y[1]]

    for i in range(L1 + 1):
        for j in range(L2 + 1):
            if not (i > 1 or j > 1):
                continue
            if i > 0 and j > 0:
                v = f[0, i - 1, j - 1] + lt[0, 0]
                for k in range(1, 5):
                    v = lae(v, f[k, i - 1, j - 1] + lt[k, 0])
                f[0, i, j] = v + lep[x[i], y[j]]
            if i > 0:
                for k in range(2):
                    f[2 * k + 1, i, j] = les[x[i]] + lae(
                        f[0, i - 1, j] + lt[0, 2 * k + 1],
                        f[2 * k + 1, i - 1, j] + lt[2 * k + 1, 2 * k + 1],
                    )
            if j > 0:
                for k in range(2):
                    f[2 * k + 2, i, j] = les[y[j]] + lae(
                        f[0, i, j - 1] + lt[0, 2 * k + 2],
                        f[2 * k + 2, i, j - 1] + lt[2 * k + 2, 2 * k + 2],
                    )
    return f


def backward_np(seq1: str, seq2: str) -> np.ndarray:
    """Scalar backward DP (ProbabilisticModel.h:194-258)."""
    L1, L2 = len(seq1), len(seq2)
    x = _pad_with_dummy(seq1.encode(), L1)
    y = _pad_with_dummy(seq2.encode(), L2)
    b = np.full((5, L1 + 1, L2 + 1), LOG_ZERO, dtype=np.float64)
    li = LOG_INIT.astype(np.float64)
    lt = LOG_TRANS.astype(np.float64)
    les = LOG_EMIT_SINGLE.astype(np.float64)
    lep = LOG_EMIT_PAIRS.astype(np.float64)

    def lae(a, bb):
        if a <= LOG_ZERO / 2 and bb <= LOG_ZERO / 2:
            return LOG_ZERO
        return np.logaddexp(a, bb)

    for k in range(5):
        b[k, L1, L2] = li[k]

    for i in range(L1, -1, -1):
        for j in range(L2, -1, -1):
            if i < L1 and j < L2:
                pxy = b[0, i + 1, j + 1] + lep[x[i + 1], y[j + 1]]
                for k in range(5):
                    b[k, i, j] = lae(b[k, i, j], pxy + lt[k, 0])
            if i < L1:
                for k in range(2):
                    b[0, i, j] = lae(
                        b[0, i, j],
                        b[2 * k + 1, i + 1, j]
                        + les[x[i + 1]]
                        + lt[0, 2 * k + 1],
                    )
                    b[2 * k + 1, i, j] = lae(
                        b[2 * k + 1, i, j],
                        b[2 * k + 1, i + 1, j]
                        + les[x[i + 1]]
                        + lt[2 * k + 1, 2 * k + 1],
                    )
            if j < L2:
                for k in range(2):
                    b[0, i, j] = lae(
                        b[0, i, j],
                        b[2 * k + 2, i, j + 1]
                        + les[y[j + 1]]
                        + lt[0, 2 * k + 2],
                    )
                    b[2 * k + 2, i, j] = lae(
                        b[2 * k + 2, i, j],
                        b[2 * k + 2, i, j + 1]
                        + les[y[j + 1]]
                        + lt[2 * k + 2, 2 * k + 2],
                    )
    return b


def posterior_oracle(seq1: str, seq2: str) -> Tuple[np.ndarray, float]:
    f = forward_np(seq1, seq2)
    b = backward_np(seq1, seq2)
    L1, L2 = len(seq1), len(seq2)
    tot = LOG_ZERO
    for k in range(5):
        v = f[k, L1, L2] + b[k, L1, L2]
        tot = np.logaddexp(tot, v) if tot > LOG_ZERO / 2 else v
    p = np.exp(np.minimum(0.0, f[0] + b[0] - tot))
    p[0, :] = 0
    p[:, 0] = 0
    return p, tot
