"""Tensor parallelism: Megatron-style sharding of the FFNO feed-forward
GEMMs over a "model" mesh axis.

The reference has no tensor parallelism (its only multi-device story is
nn.DataParallel, main_2d.py:88-94); this is a TPU-native extension: the
parameter tree is annotated with `PartitionSpec`s and GSPMD/XLA inserts
the collectives.

Layout (per FeedForward stack, hidden = dim * factor):
  - layer 0 kernel (dim, hidden):    P(None, "model")  — column-parallel;
    the GELU that follows is elementwise on the sharded hidden dim.
  - layer 1 kernel (hidden, dim|hidden): P("model", None) — row-parallel;
    XLA inserts one psum over "model" to combine the partial products.
  - later layers, biases of row-parallel layers, norms, spectral weights:
    replicated (the fourier weights are ~2 MB/layer at width 64 — sharding
    them buys nothing and forces a gather before the mode contraction).

So the hidden activations — the largest tensors in the model — are
sharded over "model", and each FF stack costs exactly one reduce over the
model axis, riding ICI.

Use:
    mesh  = make_mesh({"data": 2, "model": 4})
    specs = ffno_tp_specs(trainer.init(x).params, mesh)
    trainer = Trainer(model, mesh=mesh, param_specs=specs)
    state = shard_train_state(trainer.init(x), mesh, specs,
                              trainer.optimizer)
"""

from __future__ import annotations

import re

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_is_spec = lambda x: isinstance(x, P)


def _path_names(path) -> list[str]:
    return [getattr(p, "key", str(p)) for p in path]


def ffno_tp_specs(params, mesh: Mesh, axis: str = "model"):
    """PartitionSpec tree for a model built on `FeedForward` stacks
    (FFNO1D/FFNO2D and anything else using models/layers.py FeedForward).

    Column-parallel first FF linear, row-parallel second, everything else
    replicated. Dims that don't divide the axis extent stay replicated, so
    the specs are always valid for the given mesh.
    """
    n_model = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)

    def spec_for(path, leaf) -> P:
        names = _path_names(path)
        ff_i = [i for i, n in enumerate(names)
                if re.fullmatch(r"FeedForward(_\d+)?", n)]
        if not ff_i:
            return P()
        rest = names[ff_i[0] + 1:]
        m = next((re.fullmatch(r"WNDense_(\d+)", n) for n in rest
                  if re.fullmatch(r"WNDense_(\d+)", n)), None)
        if m is None:
            return P()
        layer = int(m.group(1))
        leafname = rest[-1]
        if layer == 0:
            # column-parallel: out dim sharded
            if leafname == "kernel" and leaf.ndim == 2 \
                    and leaf.shape[1] % n_model == 0:
                return P(None, axis)
            if leafname == "bias" and leaf.shape[0] % n_model == 0:
                return P(axis)
        elif layer == 1:
            # row-parallel: contracting dim sharded; bias replicated
            if leafname == "kernel" and leaf.ndim == 2 \
                    and leaf.shape[0] % n_model == 0:
                return P(axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def specs_to_shardings(specs, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=_is_spec)


def shard_train_state(state, mesh: Mesh, specs, optimizer):
    """device_put a TrainState so params AND the param-shaped optimizer
    moments (Adam mu/nu) carry the TP shardings; every other leaf is
    replicated over the mesh (mixed placements would fail jit)."""
    repl = NamedSharding(mesh, P())

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    params = jax.tree_util.tree_map(put, state.params, specs)
    opt_state = optax.tree_map_params(
        optimizer, put, state.opt_state, specs,
        transform_non_params=lambda x: jax.device_put(x, repl))
    rest = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl),
        {"step": state.step, "dropout_key": state.dropout_key,
         "model_state": state.model_state})
    return state.replace(params=params, opt_state=opt_state, **rest)
