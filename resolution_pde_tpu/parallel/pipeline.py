"""Pipeline parallelism: a GPipe-style schedule over a "stage" mesh axis.

The reference has no pipeline story (single-GPU + nn.DataParallel); this
is the TPU-native extension for operator stacks that outgrow one chip:
each device holds ONE stage's parameters (1/S of the model), microbatches
stream through the ring via `lax.ppermute` (ICI neighbor hops), and every
device runs its stage each tick — the classic GPipe schedule with
S - 1 bubble ticks on either end.

Built on `jax.shard_map` so it composes with the data/model axes of the
same mesh: shard the batch over "data", the FF hidden dim over "model"
(parallel/tp.py), and layers over "stage".
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(per_stage_params):
    """Stack a list of identically-structured per-stage param trees into one
    tree with a leading stage dim (leaf i of stage s -> leaf[s] = stage s)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *per_stage_params)


def pipeline_apply(
    stage_fn: Callable,
    stacked_params,
    x,
    mesh: Mesh,
    axis: str = "stage",
    n_microbatches: int | None = None,
):
    """Run `x` through S = mesh.shape[axis] stages with a GPipe schedule.

    stage_fn: (stage_params, microbatch) -> microbatch (shape-preserving —
        an operator block, e.g. one FFNO layer with its residual).
        MUST be a stable callable: the compiled GPipe program is cached on
        the identity of `stage_fn` (plus mesh/axis/sizes), so passing a
        freshly created lambda/closure every step silently recompiles the
        shard_map program each call. Define the function once at module or
        object scope and reuse it.
    stacked_params: pytree with leading dim S on every leaf (one slice per
        stage; see stack_stage_params). Placed sharded over `axis`.
    x: (B, ...) batch, replicated. B must divide into n_microbatches
        (default: S, the minimum that fills the pipeline).
    Returns (B, ...) output, replicated — bit-equal to applying the stages
    sequentially (up to reduction order; no arithmetic is changed).
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_stages = sizes[axis]
    leading = {leaf.shape[0] for leaf in
               jax.tree_util.tree_leaves(stacked_params)}
    if leading != {n_stages}:
        raise ValueError(
            f"stacked_params leading dims {leading} != mesh axis "
            f"{axis}={n_stages}")
    m = n_microbatches or n_stages
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    x_mb = x.reshape((m, b // m) + x.shape[1:])
    out = _pipeline_program(stage_fn, mesh, axis, n_stages, m)(
        stacked_params, x_mb)
    return out.reshape((b,) + x.shape[1:])


@lru_cache(maxsize=64)
def _pipeline_program(stage_fn, mesh: Mesh, axis: str, n_stages: int,
                      m: int):
    """One jitted GPipe program per (stage_fn, mesh, axis, stages,
    microbatches) — a fresh closure per call would defeat the jit cache
    and recompile every step."""

    def run(params, xs):
        # params: leading dim 1 (this device's stage); xs: (M, mb, ...)
        p = jax.tree_util.tree_map(lambda l: l[0], params)
        stage = lax.axis_index(axis)
        perm = [(i, i + 1) for i in range(n_stages - 1)]
        buf = jnp.zeros_like(xs[0])       # activation arriving from prev stage
        outs = jnp.zeros_like(xs)         # last stage's completed microbatches

        def tick(t, carry):
            buf, outs = carry
            # stage 0 consumes microbatch t (clamped; garbage past M is
            # discarded by the output mask), others consume the ring buffer
            inp = jnp.where(stage == 0, xs[jnp.minimum(t, m - 1)], buf)
            y = stage_fn(p, inp)
            out_idx = t - (n_stages - 1)
            store = (stage == n_stages - 1) & (out_idx >= 0)
            idx = jnp.clip(out_idx, 0, m - 1)
            outs = outs.at[idx].set(jnp.where(store, y, outs[idx]))
            buf = lax.ppermute(y, axis, perm)
            return buf, outs

        _, outs = lax.fori_loop(0, m + n_stages - 1, tick, (buf, outs))
        # replicate the last stage's outputs to every device
        outs = lax.psum(
            jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)),
            axis)
        return outs

    return jax.jit(
        jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(P(axis), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
