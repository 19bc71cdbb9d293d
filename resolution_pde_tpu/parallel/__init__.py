"""Parallelism: device meshes and sharding rules.

The reference's only parallelism is single-process nn.DataParallel
(main_2d.py:146-149). Here scaling is expressed TPU-natively: a
jax.sharding.Mesh with named axes, batch sharded over the data axis (ICI
collectives inserted by XLA), optional spatial-axis sharding for grids that
outgrow one chip, and DCN-ready axis ordering for multi-slice data
parallelism.
"""

from resolution_pde_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from resolution_pde_tpu.parallel.tp import (
    ffno_tp_specs,
    shard_train_state,
    specs_to_shardings,
)
from resolution_pde_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_stage_params,
)
from resolution_pde_tpu.parallel.ep import moe_ep_specs
from resolution_pde_tpu.parallel.fsdp import fsdp_specs, merge_specs

__all__ = [
    "make_mesh", "batch_sharding", "replicated_sharding", "shard_batch",
    "ffno_tp_specs", "shard_train_state", "specs_to_shardings",
    "pipeline_apply", "stack_stage_params", "moe_ep_specs",
    "fsdp_specs", "merge_specs",
]
