"""Fully-sharded data parallelism (ZeRO-3 style) over the "data" axis.

The reference's only multi-device story replicates the model per device
(nn.DataParallel, main_2d.py:146-149). This is the TPU-native
weight-sharded alternative from the scaling playbook: each parameter (and
its Adam moments, via parallel.shard_train_state) is SHARDED over the
data axis — per-device memory for model + optimizer state drops by the
data extent — and GSPMD inserts the all-gathers before use and the
reduce-scatters on the gradients, riding ICI. No user-level collectives;
the Trainer's param_specs pin keeps the updated params in the FSDP layout
every step.

Use (identical machinery to tensor parallelism, parallel/tp.py):
    mesh  = make_mesh({"data": 8})
    specs = fsdp_specs(trainer.init(x).params, mesh)
    trainer = Trainer(model, mesh=mesh, param_specs=specs)
    state = shard_train_state(trainer.init(x), mesh, specs,
                              trainer.optimizer)

Composes with a "model" axis: pass tp specs where they apply and fsdp
specs for the rest via `merge_specs`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def fsdp_specs(params, mesh: Mesh, axis: str = "data",
               min_size: int = 16384):
    """PartitionSpec tree sharding each parameter's largest axis that
    divides the data extent. Parameters smaller than `min_size` elements
    stay replicated (an all-gather of a tiny bias costs more latency than
    the memory it saves)."""
    n = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)
    if n <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)

    def spec_for(leaf) -> P:
        shape = getattr(leaf, "shape", ())
        if len(shape) == 0 or int(np.prod(shape)) < min_size:
            return P()
        for d in sorted(range(len(shape)), key=lambda i: -shape[i]):
            if shape[d] % n == 0:
                return P(*[axis if i == d else None
                           for i in range(len(shape))])
        return P()

    return jax.tree_util.tree_map(spec_for, params)


def merge_specs(primary, fallback):
    """Leafwise: primary spec unless it is fully replicated, else
    fallback — e.g. merge_specs(ffno_tp_specs(...), fsdp_specs(...))
    gives Megatron sharding for the FF GEMMs and FSDP for the rest."""
    return jax.tree_util.tree_map(
        lambda a, b: a if a != P() else b, primary, fallback,
        is_leaf=lambda x: isinstance(x, P))
