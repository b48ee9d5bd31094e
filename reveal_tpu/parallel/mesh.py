"""Multi-chip sharding for the alignment pipeline.

The reference is single-node pthreads (SURVEY.md §2.3); the TPU-native
scale-out path instead shards the generalized text/ESA across a device mesh
and turns each pipeline step into collectives (BASELINE.json north star):

* candidate-MUM scoring: the adjacent-SA-entry conditions
  (reveal.c:55-180) are elementwise over (SA, LCP, SO) shards; per-shard
  top-k candidate tables are all-gathered into the global table and
  validity counts all-reduced;
* bubble refinement: the pair-HMM batch is sharded over the mesh on the
  batch axis; global cell counts / log-probabilities are psum'd.

``make_mesh`` builds a 1D "shard" mesh; ``build_pipeline_step`` returns the
jittable full step used by the multichip dry-run and (in later rounds) the
distributed rem driver.
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices=None, axis: str = "shard"):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def build_pipeline_step(mesh, nsep0: int, topk: int = 64):
    """Jitted sharded pipeline step.

    fn(T, SA, LCP, SEG, xb, yb, lx, ly) ->
        (mum_count, cand_lengths, cand_positions, cells, logprob_sum)

    SA/LCP/SEG: (n_devices, Lp) int32 packed segment groups
    (index/frontier.pack_segments with n_groups = mesh size — whole
    segments per device, so adjacent-pair conditions stay shard-local),
    group axis sharded.  xb/yb: (B, L+1) uint8 pair batch, lx/ly: (B,)
    int32 — batch axis sharded.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..hmm.pairhmm import get_masked_kernel

    posterior_masked = get_masked_kernel()
    axis = mesh.axis_names[0]

    def shard_fn(T, sa, lcp, seg, x, y, lxs, lys):
        # --- candidate MUM scoring on this device's segment group ---------
        # sa/lcp/seg: (1, Lp) packed whole segments (index/frontier.py);
        # full reveal.c:119-180 conditions with segment-boundary masking;
        # T replicated so maximality gathers by suffix position work
        # across shards
        sa = sa[0]
        lcp = lcp[0]
        seg = seg[0]
        prev_sa = jnp.roll(sa, 1)
        seg_prev = jnp.roll(seg, 1)
        straddle = (sa > nsep0) != (prev_sa > nsep0)
        a = jnp.minimum(sa, prev_sa)
        b = jnp.maximum(sa, prev_sa)
        ta = T[jnp.maximum(a - 1, 0)]
        tb = T[jnp.maximum(b - 1, 0)]
        leftmax = (
            (a == 0)
            | (b == 0)
            | (ta != tb)
            | (ta == ord("N"))
            | (ta == ord("$"))
            | ((ta >= ord("a")) & (ta <= ord("z")))
        )
        lcp_next = jnp.concatenate([lcp[1:], jnp.zeros(1, lcp.dtype)])
        unique = (lcp > jnp.roll(lcp, 1)) & (lcp > lcp_next)
        iar = jnp.arange(sa.shape[0])
        valid = (
            (iar >= 1)
            & (seg >= 0)
            & (seg == seg_prev)
            & straddle
            & leftmax
            & unique
            & (lcp > 0)
        )
        lengths = jnp.where(valid, lcp, 0)
        local_count = jnp.sum(valid.astype(jnp.int32))
        total_count = jax.lax.psum(local_count, axis)
        top_l, top_i = jax.lax.top_k(lengths, topk)
        all_l = jax.lax.all_gather(top_l, axis, tiled=True)
        all_p = jax.lax.all_gather(sa[top_i], axis, tiled=True)

        # --- pair-HMM refine on this pair-batch shard ---------------------
        _, tots = jax.vmap(posterior_masked)(x, y, lxs, lys)
        cells = jnp.sum(lxs.astype(jnp.float32) * lys.astype(jnp.float32))
        cells = jax.lax.psum(cells, axis)
        logprob = jax.lax.psum(jnp.sum(tots), axis)
        return total_count, all_l, all_p, cells, logprob

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(),  # T replicated
            P(axis, None),  # packed SA groups: one group per device
            P(axis, None),
            P(axis, None),  # segment ids
            P(axis),  # pair batch, batch axis sharded
            P(axis),
            P(axis),
            P(axis),
        ),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
