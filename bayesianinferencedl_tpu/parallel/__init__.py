"""Multi-chip parallelism over the ICI device mesh (SURVEY.md §2c).

The reference is serial CPU code; the rebuild's parallelism is batch-axis
sharding: chain batches and snapshot batches distribute over a 1-D
``jax.sharding.Mesh`` via ``shard_map``, with XLA collectives (psum) reducing
diagnostics/gradients over ICI. No NCCL/MPI analog is needed — XLA emits the
collectives (SURVEY.md §5 "Distributed communication backend").
"""

from bayesianinferencedl_tpu.parallel.mesh import device_mesh  # noqa: F401
from bayesianinferencedl_tpu.parallel.sharding import (  # noqa: F401
    sharded_da_pcn,
    sharded_pcn,
    sharded_pt_da,
    sharded_pt_mala,
    sharded_pt_pcn,
    sharded_smc,
    sharded_snapshots,
    dp_train_step,
)
from bayesianinferencedl_tpu.parallel.domain import solve_fom_domain_sharded  # noqa: F401
