"""Suffix array / LCP construction tests against brute-force oracles."""

import numpy as np
import pytest

from reveal_tpu.core.encoding import to_bytes
from reveal_tpu.core.textstore import TextStore
from reveal_tpu.index.suffix import (
    build_esa,
    lcp_from_sa_np,
    sufcheck,
    suffix_array_np,
)


def brute_sa(T: np.ndarray) -> np.ndarray:
    s = T.tobytes()
    return np.array(sorted(range(len(s)), key=lambda i: s[i:]), dtype=np.int64)


def brute_lcp(T: np.ndarray, SA: np.ndarray) -> np.ndarray:
    """Capped LCP like the reference compute_lcp (interface.c:97-114)."""
    s = T.tobytes()
    n = len(s)
    out = [0]
    for x in range(1, n):
        i, j = SA[x - 1], SA[x]
        h = 0
        while (
            i + h < n
            and j + h < n
            and s[i + h] == s[j + h]
            and s[i + h] not in (ord("$"), ord("N"))
        ):
            h += 1
        out.append(h)
    return np.array(out, dtype=np.int64)


CASES = [
    b"BANANA$",
    b"AAAAAAAA$",
    b"ACGTACGTACGT$ACGTACGTACGT$",
    b"ACGTNNNACGT$ACGNT$",
    b"A$",
    b"$",
    b"ACGT$ACGT$ACGT$",
    b"MISSISSIPPI$",
]


@pytest.mark.parametrize("s", CASES)
def test_np_sa_matches_brute(s):
    T = to_bytes(s)
    sa = suffix_array_np(T)
    assert np.array_equal(sa, brute_sa(T))
    assert sufcheck(T, sa)


@pytest.mark.parametrize("s", CASES)
def test_np_lcp_matches_brute(s):
    T = to_bytes(s)
    sa = suffix_array_np(T)
    assert np.array_equal(lcp_from_sa_np(T, sa), brute_lcp(T, sa))


def test_random_texts():
    rng = np.random.default_rng(0)
    for trial in range(10):
        m = int(rng.integers(2, 200))
        seq = rng.choice(list(b"ACGTN"), size=m).astype(np.uint8)
        T = np.concatenate([seq, to_bytes(b"$")])
        sa = suffix_array_np(T)
        assert np.array_equal(sa, brute_sa(T)), trial
        assert np.array_equal(lcp_from_sa_np(T, sa), brute_lcp(T, sa)), trial


@pytest.mark.parametrize("s", CASES)
def test_jax_esa_matches_np(s):
    T = to_bytes(s)
    sa, lcp, sai = build_esa(T, backend="jax")
    assert np.array_equal(sa, brute_sa(T))
    assert np.array_equal(lcp, brute_lcp(T, sa))
    assert np.array_equal(sai[sa], np.arange(len(T)))


def test_jax_esa_random_larger():
    rng = np.random.default_rng(1)
    seqs = ["".join(rng.choice(list("ACGT"), size=500)) for _ in range(3)]
    # introduce shared structure
    seqs[1] = seqs[0][:200] + seqs[1][200:]
    ts = TextStore()
    for i, s in enumerate(seqs):
        ts.add_sample("s%d" % i)
        ts.add_sequence(s)
    T, SO, nsep = ts.build()
    sa_j, lcp_j, _ = build_esa(T, backend="jax")
    sa_n, _, _ = build_esa(T, backend="np")
    assert np.array_equal(sa_j, sa_n)
    assert np.array_equal(lcp_j, lcp_from_sa_np(T, sa_n))


def test_textstore_layout():
    ts = TextStore()
    ts.add_sample("a")
    iv1 = ts.add_sequence("ACGT")
    ts.add_sample("b")
    iv2 = ts.add_sequence("TTT")
    T, SO, nsep = ts.build()
    assert iv1 == (0, 4) and iv2 == (5, 8)
    assert T.tobytes() == b"ACGT$TTT$"
    assert list(SO) == [0] * 5 + [1] * 4
    # nsep[0] = final '$' of sample 0 (interface.c:42 stores n-1 when the
    # next sample is added)
    assert list(nsep) == [4, 8]


def test_device_mum_mask_matches_host():
    """Device pairwise-MUM scan (the frontier building block) vs host."""
    import jax

    import jax.numpy as jnp
    from reveal_tpu.core.textstore import TextStore
    from reveal_tpu.index.mums import pairwise_mums, pairwise_mums_device

    rng = np.random.default_rng(4)
    base = "".join(rng.choice(list("ACGT"), size=800))
    mut = list(base)
    for _ in range(12):
        mut[int(rng.integers(0, len(mut)))] = "ACGT"[int(rng.integers(0, 4))]
    ts = TextStore()
    ts.add_sample("a")
    ts.add_sequence(base)
    ts.add_sample("b")
    ts.add_sequence("".join(mut))
    T, SO, nsep = ts.build()
    sa = suffix_array_np(T)
    lcp = lcp_from_sa_np(T, sa)

    host = pairwise_mums(T, sa, lcp, int(nsep[0]), minl=10)
    l, a, b = pairwise_mums_device(
        jnp.asarray(T),
        jnp.asarray(sa.astype(np.int32)),
        jnp.asarray(lcp.astype(np.int32)),
        int(nsep[0]),
        10,
    )
    dev = sorted(zip(l.tolist(), a.tolist(), b.tolist()))
    hst = sorted((m[0], m[2][0][1], m[2][1][1]) for m in host)
    assert dev == hst


def test_device_esa_64bit_builder():
    """The int64 device builder (reveallib64 twin, setup.py:21-31) must
    agree with the 32-bit builder and the numpy oracle at reduced scale;
    texts >= 2^31 select it automatically (suffix.py build_esa_jax)."""
    from reveal_tpu.core.textstore import TextStore
    from reveal_tpu.index.suffix import build_esa_jax

    rng = np.random.default_rng(13)
    ts = TextStore()
    ts.add_sample("a")
    ts.add_sequence("".join(rng.choice(list("ACGTN"), size=700)))
    ts.add_sample("b")
    ts.add_sequence("".join(rng.choice(list("ACGT"), size=500)))
    T, SO, nsep = ts.build()

    sa32, lcp32, sai32 = build_esa_jax(T)
    sa64, lcp64, sai64 = build_esa_jax(T, force64=True)
    assert np.array_equal(sa32, sa64)
    assert np.array_equal(lcp32, lcp64)
    assert np.array_equal(sai32, sai64)
    want_sa = suffix_array_np(T)
    want_lcp = lcp_from_sa_np(T, want_sa)
    assert np.array_equal(sa64, want_sa)
    assert np.array_equal(lcp64, want_lcp)


def test_build_esa_sharded_matches_np():
    """Mesh-sharded ESA build (GSPMD-partitioned doubling sorts) equals
    the numpy oracle on an 8-device mesh."""
    import jax
    import numpy as np

    from reveal_tpu.core.textstore import TextStore
    from reveal_tpu.index.suffix import (
        build_esa_sharded,
        lcp_from_sa_np,
        suffix_array_np,
    )
    from reveal_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(min(8, len(jax.devices())))
    rng = np.random.default_rng(5)
    ts = TextStore()
    ts.add_sample("a")
    ts.add_sequence("".join(rng.choice(list("ACGTN"), size=700)))
    ts.add_sample("b")
    ts.add_sequence("".join(rng.choice(list("ACGT"), size=555)))
    T, SO, nsep = ts.build()
    sa, lcp, sai = build_esa_sharded(T, mesh)
    sa_ref = suffix_array_np(T)
    lcp_ref = lcp_from_sa_np(T, sa_ref)
    assert np.array_equal(sa, sa_ref)
    assert np.array_equal(lcp, lcp_ref)
    assert np.array_equal(sai[sa], np.arange(len(T)))
