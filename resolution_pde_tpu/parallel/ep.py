"""Expert parallelism: shard MoE expert weights over an "expert" mesh axis.

Pairs with models/mgpt.py `expert_impl="stacked"`: every expert tensor
carries a leading expert dim, so P("expert", None, ...) on those leaves
puts 1/E of the experts on each device. The gate is position-dependent and
dense (all experts contribute, reference models/mgpt.py:140-205), so each
device computes its experts' outputs and the gated combine — an einsum
contracting the expert dim — becomes one psum over the axis, inserted by
GSPMD.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P


def moe_ep_specs(params, mesh: Mesh, axis: str = "expert"):
    """PartitionSpec tree: stacked expert leaves (path contains a
    '*_stacked' module) sharded over `axis` on dim 0, everything else
    replicated. Expert counts that don't divide the axis stay replicated."""
    n_exp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)

    def spec_for(path, leaf) -> P:
        names = [getattr(p, "key", str(p)) for p in path]
        if any(n.endswith("_stacked") for n in names) \
                and leaf.ndim >= 1 and leaf.shape[0] % n_exp == 0:
            return P(axis, *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)
