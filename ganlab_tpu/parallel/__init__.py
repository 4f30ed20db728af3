"""Distribution layer: mesh construction and data-parallel step wrapping.

The reference is single-process, single-device (SURVEY.md 2.3); this layer is
new, TPU-native design: a 1-D ``data`` mesh over all local/global devices,
``shard_map`` over the per-device train step (batch sharded, state
replicated), gradient ``pmean`` riding ICI, and ``jax.distributed`` init for
multi-host pod slices. No NCCL/MPI analog exists or is needed — the backend
is the XLA runtime (SURVEY.md 5).
"""

from ganlab_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_step,
    make_parallel_chunk,
    make_single_step,
    shard_stack,
    shard_batch,
    replicate,
    initialize_distributed,
)
