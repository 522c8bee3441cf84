"""Multi-chip execution: mesh construction, parameter/batch sharding rules,
and collectives-based aggregation.

Replaces the reference's NCCL/DDP stack (Lightning `strategy: 'ddp'`,
torch.distributed barriers, detectron2-style pickle gathers —
src/utils/comm.py, src/lightning/BoxDreamer_lightning_model.py:164-289)
with jax.sharding over an ICI mesh: data-parallel batch sharding plus
GSPMD tensor parallelism over attention heads / MLP hidden dims, and
fixed-shape `all_gather`/`psum` for metric aggregation.
"""

from boxdreamer_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_shardings,
    replicate,
)

__all__ = ["make_mesh", "batch_sharding", "param_shardings", "replicate"]
