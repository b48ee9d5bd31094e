"""Microbench: associative_scan / cumsum vs manual shift-based
Hillis-Steele scans over npad-wide int32 arrays on the TPU.

Protocol: inputs are device-resident (one device_put up front); each
jitted fn applies the scan REPS times inside a fori_loop with a data
dependence; per-scan cost = (t(REPS) - t(1)) / (REPS - 1).  Streamed
dispatches with distinct on-device inputs, one device_get at the end
(CLAUDE.md measurement rules).
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N = 1 << 21
NDISP = 4


def hs_last_value_scan(values, flags):
    n = values.shape[0]
    v, f = values, flags
    d = 1
    while d < n:
        vp = jnp.concatenate([v[:d], v[:-d]])
        fp = jnp.concatenate([jnp.zeros(d, dtype=bool), f[:-d]])
        v = jnp.where(f, v, vp)
        f = f | fp
        d *= 2
    return v


def la_last_value_scan(values, flags):
    def combine(x, y):
        v1, f1 = x
        v2, f2 = y
        return jnp.where(f2, v2, v1), f1 | f2

    v, _ = jax.lax.associative_scan(combine, (values, flags))
    return v


def hs_cumsum(x):
    n = x.shape[0]
    d = 1
    while d < n:
        x = x + jnp.concatenate([jnp.zeros(d, x.dtype), x[:-d]])
        d *= 2
    return x


def make(fn, reps, unary=False):
    if unary:
        @jax.jit
        def k(v, f):
            def body(i, c):
                return fn(c + i) & 0x7FFFFF
            return jax.lax.fori_loop(0, reps, body, v)
    else:
        @jax.jit
        def k(v, f):
            def body(i, c):
                return fn(c + i, f) & 0x7FFFFF
            return jax.lax.fori_loop(0, reps, body, v)
    return k

REPS = 5

def measure(fn, unary, label, ins):
    k1 = make(fn, 1, unary)
    kR = make(fn, REPS, unary)
    # warm both
    np.asarray(jax.device_get(k1(*ins[0])))
    np.asarray(jax.device_get(kR(*ins[0])))
    t0 = time.time()
    outs = [k1(*a) for a in ins]
    jax.device_get(tuple(outs))
    t1 = time.time()
    outs = [kR(*a) for a in ins]
    jax.device_get(tuple(outs))
    t2 = time.time()
    per = ((t2 - t1) - (t1 - t0)) / (REPS - 1) / len(ins)
    print(f"{label}: {per * 1e3:.2f} ms/scan  (1rep {(t1-t0)/len(ins)*1e3:.1f} ms, {REPS}rep {(t2-t1)/len(ins)*1e3:.1f} ms)", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    ins = [
        (
            jax.device_put(jnp.asarray(rng.integers(0, 1000, N).astype(np.int32))),
            jax.device_put(jnp.asarray(rng.random(N) < 0.01)),
        )
        for _ in range(NDISP)
    ]
    for a in ins:
        np.asarray(jax.device_get(a[0]))

    if which in ("all", "la"):
        measure(la_last_value_scan, False, "associative_scan last_value (2M)", ins)
    if which in ("all", "hs"):
        measure(hs_last_value_scan, False, "hillis-steele last_value    (2M)", ins)
    if which in ("all", "cumsum"):
        measure(jnp.cumsum, True, "jnp.cumsum                  (2M)", ins)
    if which in ("all", "hscumsum"):
        measure(hs_cumsum, True, "hillis-steele cumsum        (2M)", ins)
    if which == "check":
        v, f = ins[0]
        assert np.array_equal(
            np.asarray(la_last_value_scan(v, f)), np.asarray(hs_last_value_scan(v, f))
        )
        assert np.array_equal(np.asarray(jnp.cumsum(v)), np.asarray(hs_cumsum(v)))
        print("results equal: ok", flush=True)


if __name__ == "__main__":
    main()
