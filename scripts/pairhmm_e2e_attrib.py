"""Phase attribution for the pair-HMM e2e path at the bubble-realistic
shape (B=128, L=512) — VERDICT r5 item 5.

Splits batch_posteriors_cut into: host pack, posterior dispatch, pack
dispatch, device_get, host rebuild.  Streams several distinct batches.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    B, L = int(sys.argv[1]) if len(sys.argv) > 1 else 128, int(
        sys.argv[2]) if len(sys.argv) > 2 else 512
    import jax

    from reveal_tpu.hmm import pairhmm
    from reveal_tpu.hmm.msa import batch_posteriors_cut
    from reveal_tpu.hmm.pairhmm import _pad_with_dummy
    from reveal_tpu.hmm.pallas_pairhmm import _get_pallas_kernels, _round_up

    rng = np.random.default_rng(0)

    def mkpairs(r):
        return [
            ("".join(r.choice(list("ACGT"), size=L - 10)),
             "".join(r.choice(list("ACGT"), size=L - 5)))
            for _ in range(B)
        ]

    pairs = mkpairs(rng)
    cells = float(sum(len(a) * len(b) for a, b in pairs))

    # e2e reference number
    batch_posteriors_cut(pairs)
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        batch_posteriors_cut(pairs)
    e2e = cells / ((time.time() - t0) / iters)
    print(f"e2e: {e2e/1e6:.1f} Mcells/s  (K={pairhmm._cut_k_current}, "
          f"CAPM={pairhmm._pack_capm_current})", flush=True)

    # phase split
    posterior_batch = _get_pallas_kernels()
    L1p = L + 1
    L2p = _round_up(L + 1, 128)
    t0 = time.time()
    xb = np.stack([_pad_with_dummy(a.encode(), L1p - 1) for a, b in pairs])
    yb = np.stack([_pad_with_dummy(b.encode(), L2p - 1) for a, b in pairs])
    lx = np.array([len(a) for a, b in pairs], dtype=np.int32)
    ly = np.array([len(b) for a, b in pairs], dtype=np.int32)
    t_pack_host = time.time() - t0

    # warm
    p, tot = posterior_batch(xb, yb, lx, ly)
    from reveal_tpu.hmm.pairhmm import _get_pack_fn, _cut_k_current, _pack_capm_current
    pk = _get_pack_fn(_cut_k_current, _pack_capm_current)
    out = pk(p)
    jax.device_get(out[4])

    N = 6
    t0 = time.time()
    ps = [posterior_batch(xb, yb, lx + 0 * i, ly) for i in range(N)]
    jax.device_get(tuple(t for _p, t in ps))
    t_post = (time.time() - t0) / N
    t0 = time.time()
    packs = [pk(p) for p, _t in ps]
    jax.device_get(tuple(pkk[4] for pkk in packs))
    t_pack_dev = (time.time() - t0) / N
    t0 = time.time()
    for pkk, (pp, tt) in zip(packs, ps):
        jax.device_get((pkk[0], pkk[1], pkk[2], pkk[3], tt))
    t_fetch = (time.time() - t0) / N
    pv = jax.device_get(packs[0][0])
    print(f"host pack:      {t_pack_host*1e3:7.1f} ms")
    print(f"posterior disp: {t_post*1e3:7.1f} ms ({cells/t_post/1e6:.0f} Mc/s)")
    print(f"pack dispatch:  {t_pack_dev*1e3:7.1f} ms")
    print(f"fetch payload:  {t_fetch*1e3:7.1f} ms "
          f"(~{(pv.nbytes*1.5 + B*L1p*4)/1e6:.2f} MB)")
    tot_t = t_pack_host + t_post + t_pack_dev + t_fetch
    print(f"sum:            {tot_t*1e3:7.1f} ms -> {cells/tot_t/1e6:.0f} Mc/s", flush=True)


if __name__ == "__main__":
    main()
