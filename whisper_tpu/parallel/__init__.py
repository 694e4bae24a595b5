"""Multi-chip parallelism: device meshes and sharding rules.

The reference has **no** distribution — its only parallelism is SIMD lanes
and a fork-join thread pool (SURVEY.md §2.6). The TPU-native replacement for
that thread pool is the XLA partitioner: we lay out a (dp, tp) mesh, annotate
params/activations with NamedShardings, and let GSPMD insert the ICI
collectives (the scaling-book recipe: pick a mesh, annotate, let XLA do the
comms).
"""

from whisper_tpu.parallel.mesh import (
    activation_shardings,
    make_mesh,
    param_pspecs,
    shard_params,
)
