"""Regression guard: no device-array constants in hot jitted kernels.

A jnp array captured by a jitted function becomes a device ``ArrayImpl``
constant in the jaxpr; every lowering of the function then embeds it as
an MLIR constant via a blocking device fetch (minutes over a busy
remote-device tunnel — the 6-genome refine spent 286 of 445 seconds
there before the fix).  numpy closure constants lower host-side.  This
test traces the hot kernels and asserts every jaxpr const is host-side
(numpy / literal), so a reintroduced ``jnp.asarray`` table fails CI
instead of silently reappearing as wall-clock on hardware.
"""

import numpy as np

import jax

from reveal_tpu.hmm.pairhmm import _get_kernels, _pad_with_dummy


def _assert_host_consts(jaxpr, label):
    bad = [
        type(c).__name__
        for c in jaxpr.consts
        if isinstance(c, jax.Array)
    ]
    assert not bad, f"{label}: device-array jaxpr consts {bad}"


def test_batched_posterior_has_no_device_consts():
    _, _, _, batched = _get_kernels()
    xb = np.stack([_pad_with_dummy(b"ACGT", 8)])
    yb = np.stack([_pad_with_dummy(b"ACGA", 8)])
    lx = np.array([4], np.int32)
    ly = np.array([4], np.int32)
    jaxpr = jax.make_jaxpr(lambda *a: batched(*a))(xb, yb, lx, ly)
    _assert_host_consts(jaxpr, "posterior batched")


def test_stage12_chain_has_no_device_consts():
    from reveal_tpu.hmm.msa import _get_chain_fn

    chain = _get_chain_fn(B=2, N=3, Lq=8, rounds=2, consgap=False)
    pflat = np.zeros((2 * 3, 8, 8), np.float32)
    jaxpr = jax.make_jaxpr(lambda p: chain(p))(pflat)
    _assert_host_consts(jaxpr, "stage12 chain")


def test_frontier_kernels_have_no_device_consts():
    from reveal_tpu.index.devfrontier import (
        _get_apply,
        _get_enum_multi,
        _get_enum_pairwise,
    )

    n = 64
    T = np.full(n, ord("A"), np.uint8)
    SA = np.arange(n, dtype=np.int32)
    LCP = np.zeros(n, np.int32)
    SEG = np.zeros(n, np.int32)
    SO = np.zeros(n, np.int32)

    enum_pw = _get_enum_pairwise(16)
    jaxpr = jax.make_jaxpr(
        lambda *a: enum_pw(*a)
    )(T, SA, LCP, SEG, np.int32(32), np.int32(5))
    _assert_host_consts(jaxpr, "enum_pw")

    enum_mm = _get_enum_multi(16, 3)
    jaxpr = jax.make_jaxpr(lambda *a: enum_mm(*a))(
        T, SA, LCP, SEG, SO, np.int32(5), np.int32(2), np.int32(3)
    )
    _assert_host_consts(jaxpr, "enum_mm")

    apply_fn = _get_apply(16, 16)
    begins = np.full(16, n + 1, np.int32)
    ends = np.full(16, n + 1, np.int32)
    cls_tab = np.zeros(16, np.int32)
    seg_map = np.full((16, 5), -1, np.int32)
    jaxpr = jax.make_jaxpr(lambda *a: apply_fn(*a))(
        T, SA, LCP, SEG, begins, ends, cls_tab, seg_map,
        begins, ends, begins, ends,
    )
    _assert_host_consts(jaxpr, "apply_level")
