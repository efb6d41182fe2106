"""Distribution: mesh construction and sharded render/train steps (C10, C11).

The reference is a single-device OpenCL program with no communication layer;
scaling here is TPU-native SPMD — ``jax.sharding.Mesh`` + ``shard_map`` with
XLA collectives over ICI (``psum`` for replicated-grid gradient all-reduce,
``ppermute`` for the sharded-grid ring composite, ``all_gather`` for
intermediate-image assembly) — not a port of NCCL/MPI (SURVEY.md §5
"Distributed communication backend").
"""

from tpuvr.dist.replicated import data_mesh, render_view_dp  # noqa: F401
