"""reveal_tpu — a TPU-native whole-genome multiple aligner.

Builds population reference graphs (GFA variation graphs) from 2..N genomes
by recursive Maximal-Unique-Match (MUM) anchoring over a generalized enhanced
suffix array, with bubble extraction / variant calling and pair-HMM
refinement.  The method follows jasperlinthorst/reveal (bioRxiv 022715), but
the implementation is designed TPU-first: suffix-array construction, LCP,
MUM enumeration/scoring, chaining DP, and the pair-HMM posterior kernels run
in JAX/XLA (with Pallas inner loops), the recursive segment worklist is
batched, and multi-chip scaling goes through jax.sharding meshes.

Reference parity map lives in SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
