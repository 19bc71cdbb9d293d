"""Jitted training/evaluation harness.

Reference semantics being reproduced (train/training.py:19-147):
  - per-batch: forward, optional y_normalizer.decode of pred AND target
    before the loss, relative-L2 (batch mean), AdamW step;
  - per-epoch: average of per-batch losses; validation loop with the same
    decode; scheduler stepped once per epoch (ReduceLROnPlateau gets the
    val loss);
  - evaluate(): per-batch mean rel-L2 averaged over batches, with 'simple'
    (gaussian) or 'minmax' denormalization.

TPU design:
  - One compiled program per (shape, normalizer-presence) bucket — jax.jit's
    shape-keyed cache implements the reference's ResolutionGroupedDataLoader
    "uniform-resolution batch" contract without recompilation churn.
  - The learning rate is an optax.inject_hyperparams hyperparameter, so
    per-epoch host-side schedules reuse the same compiled step.
  - Batches are sharded over the mesh's "data" axis; parameters are
    replicated; XLA inserts the gradient psum over ICI.
  - Donated state: params/opt_state buffers are reused in place.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from resolution_pde_tpu.models.registry import unwrap_output
from resolution_pde_tpu.ops.losses import relative_l2
from resolution_pde_tpu.parallel.mesh import make_mesh, shard_batch
from resolution_pde_tpu.train.schedules import ReduceLROnPlateau


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    dropout_key: jnp.ndarray
    # non-parameter model collections (e.g. BatchNorm running stats);
    # empty dict for purely functional models
    model_state: Any = struct.field(default_factory=dict)


@dataclass
class History:
    train_loss: list = field(default_factory=list)
    val_loss: list = field(default_factory=list)
    lr: list = field(default_factory=list)
    epoch_time_s: list = field(default_factory=list)


def _set_lr(opt_state, lr: float):
    """Functionally set the inject_hyperparams learning rate."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hp)


class _AutoLayoutStep:
    """AOT-compiled train step with XLA-chosen (AUTO) boundary layouts
    for the donated TrainState.

    probe14 (RESULTS.md round 5) measured ~8 ms of pure layout copies in
    the 33 ms bench step: the optimizer writes params in the default
    layout while the fused-FF Pallas custom calls want another, so XLA
    re-copies the weight kernels EVERY step. Compiling with
    jax.experimental.layout.Format(Layout.AUTO) over the state lets XLA
    pick the compute-preferred layout at the jit boundary; donation
    aliases the output state to the input buffers, so the layout
    circulates across steps with no per-step copies. Batch/target/weight
    arrays keep default layouts — they arrive fresh from the host each
    step, and a non-default layout would just move the copy to the
    transfer path.

    Shape-bucketed like jax.jit's cache (one executable per
    (x, y, weights, normalizer-structure) bucket); the live state is
    device_put into the executable's chosen input format on every call
    (a no-op once it circulates). Any failure to compile with AUTO
    layouts (backend support, extended dtypes) degrades permanently to
    the plain donated jit — behavior identical, copies unfixed.
    """

    def __init__(self, fn, mesh=None):
        self._fn = fn
        self._mesh = mesh
        self.__wrapped__ = fn
        self._cache: dict = {}
        self._fallback = None

    def _state_sharding(self):
        # On a multi-device mesh the state must be explicitly replicated:
        # plain jit reconciles a single-device state against sharded
        # batches, but explicit in_shardings are checked strictly.
        if self._mesh is not None and self._mesh.devices.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            return NamedSharding(self._mesh, PartitionSpec())
        return None

    def _auto_tree(self, state):
        from jax.experimental.layout import Format, Layout

        repl = self._state_sharding()

        def leaf_fmt(leaf):
            # PRNG keys and other extended dtypes keep their current
            # sharding with the default layout: AUTO over them is
            # undefined (PRNGKeyArray carries no .format), and they are
            # scalars/small anyway.
            if jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.extended):
                return repl if repl is not None else leaf.sharding
            if repl is not None:
                return Format(Layout.AUTO, repl)
            return Format(Layout.AUTO)

        return jax.tree_util.tree_map(leaf_fmt, state)

    @staticmethod
    def _arg_sharding(tree):
        # Non-state args keep whatever sharding the caller put them in
        # (train_epoch shard_batches x/y over the mesh's data axis);
        # plain jit infers this from the args, the AOT path must pin it.
        return jax.tree_util.tree_map(
            lambda l: l.sharding if isinstance(l, jax.Array) else None,
            tree)

    def _jit(self, state, x, y, y_normalizer, weights):
        auto = self._auto_tree(state)
        xs, ys, ns, ws = (self._arg_sharding(a)
                          for a in (x, y, y_normalizer, weights))
        return jax.jit(self._fn, donate_argnums=(0,),
                       in_shardings=(auto, xs, ys, ns, ws),
                       out_shardings=(auto, None))

    @staticmethod
    def _key(state, x, y, y_normalizer, weights):
        aux_leaves, aux_def = jax.tree_util.tree_flatten(
            (y_normalizer, weights))
        shardings = tuple(
            a.sharding if isinstance(a, jax.Array) else None
            for a in (x, y, *aux_leaves))
        return (
            x.shape, str(x.dtype), y.shape, str(y.dtype), aux_def,
            tuple((np.shape(a), str(getattr(a, "dtype", type(a))))
                  for a in aux_leaves),
            shardings,
            jax.tree_util.tree_structure(state),
        )

    @staticmethod
    def _abstract(tree):
        # AUTO-layout lowering requires abstract avals: a concrete
        # jax.Array pins its current layout and the lower() call rejects
        # the AUTO annotation against it.
        return jax.tree_util.tree_map(
            lambda l: jax.ShapeDtypeStruct(l.shape, l.dtype), tree)

    def lower(self, state, x, y, y_normalizer=None, weights=None):
        """Mirror of jit's .lower() (used by utils/trace_decomp.py) —
        lowers the SAME auto-layout program __call__ executes."""
        return self._jit(state, x, y, y_normalizer, weights).lower(
            *self._abstract((state, x, y, y_normalizer, weights)))

    def __call__(self, state, x, y, y_normalizer=None, weights=None):
        if self._fallback is not None:
            return self._fallback(state, x, y, y_normalizer, weights)
        key = self._key(state, x, y, y_normalizer, weights)
        hit = self._cache.get(key)
        if hit is None:
            try:
                compiled = self.lower(
                    state, x, y, y_normalizer, weights).compile()
                state_fmt = compiled.input_formats[0][0]
                hit = self._cache[key] = (compiled, state_fmt)
            except Exception as e:  # noqa: BLE001 — degrade, don't break
                import warnings

                warnings.warn(
                    "auto_layout compile failed "
                    f"({type(e).__name__}: {e}); falling back to the "
                    "default-layout jit", stacklevel=2)
                self._fallback = jax.jit(self._fn, donate_argnums=(0,))
                return self._fallback(state, x, y, y_normalizer, weights)
        compiled, state_fmt = hit

        def put_fmt(leaf, fmt):
            # input_formats reports extended-dtype leaves (PRNG keys) and
            # scalars at their PHYSICAL rank/tiling, which device_put
            # rejects for the logical value — re-put those by sharding
            # only (a scalar/key has exactly one logical layout anyway).
            if jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.extended):
                return getattr(fmt, "sharding", None) or leaf.sharding
            lay = getattr(fmt, "layout", None)
            m2m = getattr(lay, "major_to_minor", None)
            if m2m is not None and len(m2m) != np.ndim(leaf):
                return fmt.sharding
            return fmt

        state = jax.device_put(
            state, jax.tree_util.tree_map(put_fmt, state, state_fmt))
        return compiled(state, x, y, y_normalizer, weights)


class Trainer:
    """Builds and runs jitted train/eval steps for a flax model.

    model.apply signature contract: apply(params, x, deterministic=...,
    rngs={'dropout': key}) -> prediction with the same layout as y.
    """

    def __init__(
        self,
        model,
        learning_rate: float = 1e-3,
        weight_decay: float = 1e-4,
        mesh=None,
        use_normalizer: bool = False,
        y_normalizer=None,
        grad_clip: Optional[float] = None,
        ssm_lr: Optional[float] = None,
        seed: int = 0,
        param_specs=None,
        accum_steps: int = 1,
        auto_layout: bool = False,
    ):
        """ssm_lr: per-parameter optimizer override for SSM kernel params
        (S4 family): those params train at min(ssm_lr, learning_rate) with
        weight_decay=0 and anneal proportionally with the main LR —
        reproducing the reference's `_optim` attributes
        (models/s4.py:764-776, models/s4d.py:71-81)."""
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh()
        self.use_normalizer = use_normalizer
        self.y_normalizer = y_normalizer
        # tensor parallelism: a PartitionSpec tree over params (parallel/tp.py)
        # pins the updated params to the TP layout every step so GSPMD
        # propagation can't drift back to replicated.
        self.param_specs = param_specs
        # gradient accumulation: split each batch into accum_steps
        # microbatches inside the jitted step (lax.scan), average grads,
        # ONE optimizer update — effective batches beyond HBM capacity
        # (no reference counterpart; it trains at whatever fits one GPU)
        self.accum_steps = int(accum_steps)

        def _is_ssm(path) -> bool:
            from resolution_pde_tpu.models.s4 import SSM_PARAM_NAMES

            keys = [getattr(p, "key", str(p)) for p in path]
            return any(k in SSM_PARAM_NAMES for k in keys)

        def _mask(fn):
            return lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: fn(path), params)

        ssm_ratio = (min(ssm_lr, learning_rate) / learning_rate
                     if ssm_lr is not None else None)

        def make_tx(learning_rate):
            parts = []
            if grad_clip:
                parts.append(optax.clip_by_global_norm(grad_clip))
            parts.append(optax.scale_by_adam())
            # weight decay: skipped entirely for SSM params
            parts.append(optax.masked(
                optax.add_decayed_weights(weight_decay),
                _mask(lambda p: not _is_ssm(p))))
            if ssm_ratio is not None:
                parts.append(optax.masked(
                    optax.scale(ssm_ratio), _mask(_is_ssm)))
            parts.append(optax.scale_by_learning_rate(learning_rate))
            return optax.chain(*parts)

        self.optimizer = optax.inject_hyperparams(make_tx)(
            learning_rate=learning_rate)
        self.seed = seed
        # auto_layout: compile the train step with XLA-chosen boundary
        # layouts for the donated state (kills the per-step param
        # relayout copies probe14 found — see _AutoLayoutStep).
        self.auto_layout = auto_layout
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # -- state ------------------------------------------------------------
    def init(self, sample_x) -> TrainState:
        # jit the whole init: some backends (and all TPU runs) want traced
        # programs, and it avoids materializing fp32 intermediates eagerly.
        variables = jax.jit(self.model.init)(
            jax.random.key(self.seed), jnp.asarray(sample_x)
        )
        variables = dict(variables)
        params = variables.pop("params")
        opt_state = jax.jit(self.optimizer.init)(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            dropout_key=jax.random.key(self.seed + 1),
            model_state=variables,  # e.g. {'batch_stats': ...}
        )

    def set_lr(self, state: TrainState, lr: float) -> TrainState:
        return state.replace(opt_state=_set_lr(state.opt_state, lr))

    def current_lr(self, state: TrainState) -> float:
        return float(state.opt_state.hyperparams["learning_rate"])

    # -- compiled steps ----------------------------------------------------
    def _decode_for_loss(self, pred, y, y_normalizer):
        if self.use_normalizer and y_normalizer is not None:
            pred = y_normalizer.decode(pred)
            y = y_normalizer.decode(y)
        return pred, y

    def _build_train_step(self):
        model = self.model
        optimizer = self.optimizer
        param_shardings = None
        if self.param_specs is not None:
            from resolution_pde_tpu.parallel.tp import specs_to_shardings

            param_shardings = specs_to_shardings(self.param_specs, self.mesh)

        accum = self.accum_steps

        def train_step(state: TrainState, x, y, y_normalizer, weights=None):
            mutable = list(state.model_state)

            def grads_of(params, model_state, xb, yb, wb, key):
                def loss_fn(p):
                    variables = {"params": p, **model_state}
                    if mutable:
                        pred, new_ms = model.apply(
                            variables, xb, deterministic=False,
                            rngs={"dropout": key}, mutable=mutable,
                        )
                    else:
                        pred = model.apply(
                            variables, xb, deterministic=False,
                            rngs={"dropout": key},
                        )
                        new_ms = model_state
                    pred = unwrap_output(pred)
                    pred, target = self._decode_for_loss(pred, yb,
                                                         y_normalizer)
                    return (relative_l2(pred, target, weights=wb), new_ms)

                (loss, new_ms), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                return loss, new_ms, grads

            if accum > 1:
                # gradient accumulation: scan over microbatches, average
                # grads/losses, thread BN stats sequentially.
                # Batch sizes not divisible by accum (straggler batches from
                # drop_last=False loaders, odd batch_size configs) are padded
                # with zero-weight rows HERE — x.shape[0] is static at trace
                # time, so this costs nothing for divisible batches and only
                # a recompile a straggler batch pays anyway. (For BatchNorm
                # models the padded rows enter the straggler batch's batch
                # statistics — the same bounded perturbation as
                # shard_batch(straggler="pad").)
                b = x.shape[0]
                pad = (-b) % accum
                if pad:
                    if weights is None:
                        weights = jnp.ones((b,), jnp.float32)
                    x = jnp.concatenate(
                        [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])])
                    y = jnp.concatenate(
                        [y, jnp.broadcast_to(y[:1], (pad,) + y.shape[1:])])
                    weights = jnp.concatenate(
                        [weights, jnp.zeros((pad,), jnp.float32)])
                    b += pad
                xm = x.reshape((accum, b // accum) + x.shape[1:])
                ym = y.reshape((accum, b // accum) + y.shape[1:])
                wm = (weights.reshape(accum, b // accum)
                      if weights is not None
                      else jnp.ones((accum, b // accum), jnp.float32))

                def micro(carry, inp):
                    model_state, gsum, lsum, wtot, i = carry
                    xb, yb, wb = inp
                    key = jax.random.fold_in(
                        state.dropout_key, state.step * accum + i)
                    loss, new_ms, grads = grads_of(
                        state.params, model_state, xb, yb, wb, key)
                    # weight each microbatch by its REAL-sample count so
                    # padded straggler batches reproduce the accum=1
                    # weighted mean exactly (each micro loss/grad is a
                    # sum(w*.)/sum(w) mean; re-weighting by sum(w) and
                    # dividing by the total recovers the global mean)
                    wsum = jnp.sum(wb)
                    gsum = jax.tree_util.tree_map(
                        lambda a, g: a + wsum * g, gsum, grads)
                    return (new_ms, gsum, lsum + wsum * loss,
                            wtot + wsum, i + 1), None

                zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
                (new_model_state, gsum, lsum, wtot, _), _ = jax.lax.scan(
                    micro, (state.model_state, zeros, 0.0, 0.0, 0),
                    (xm, ym, wm))
                denom = jnp.maximum(wtot, 1.0)
                grads = jax.tree_util.tree_map(lambda g: g / denom, gsum)
                loss = lsum / denom
            else:
                key = jax.random.fold_in(state.dropout_key, state.step)
                loss, new_model_state, grads = grads_of(
                    state.params, state.model_state, x, y, weights, key)
            updates, opt_state = optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            if param_shardings is not None:
                params = jax.lax.with_sharding_constraint(
                    params, param_shardings)
            new_state = state.replace(
                params=params, opt_state=opt_state, step=state.step + 1,
                model_state=new_model_state,
            )
            return new_state, loss

        if self.auto_layout:
            return _AutoLayoutStep(train_step, mesh=self.mesh)
        return jax.jit(train_step, donate_argnums=(0,))

    def _build_eval_step(self):
        model = self.model

        @jax.jit
        def eval_step(params, model_state, x, y, y_normalizer, weights=None):
            variables = {"params": params, **model_state}
            pred = unwrap_output(model.apply(variables, x,
                                             deterministic=True))
            pred, target = self._decode_for_loss(pred, y, y_normalizer)
            return relative_l2(pred, target, weights=weights)

        return eval_step

    # -- loops ---------------------------------------------------------
    def _prefetch(self, loader: Iterable, straggler: str = "pad"):
        """Device-put one batch ahead of the compute step: jax dispatch is
        async, so the (i+1)-th host->device transfer overlaps the i-th
        train step instead of serializing after it."""
        pending = None
        for batch in loader:
            nxt = shard_batch(tuple(jnp.asarray(a) for a in batch),
                              self.mesh, straggler=straggler)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

    def train_epoch(self, state: TrainState, loader: Iterable) -> tuple:
        total, n = 0.0, 0
        losses = []
        # BatchNorm models: training batch statistics couple samples, so
        # padded straggler rows would perturb real rows — replicate those
        # batches instead (exact, just redundant compute on the last batch)
        straggler = "replicate" if state.model_state else "pad"
        for (x, y), w in self._prefetch(loader, straggler=straggler):
            state, loss = self._train_step(state, x, y, self.y_normalizer, w)
            losses.append(loss)
            n += 1
        # one host sync per epoch, not per batch
        total = float(jnp.sum(jnp.stack(losses))) if losses else 0.0
        return state, total / max(n, 1)

    def evaluate(self, state: TrainState, loader: Iterable,
                 y_normalizer="trainer") -> float:
        """Average per-batch mean rel-L2 (reference evaluate(),
        train/training.py:105-146)."""
        if y_normalizer == "trainer":
            y_normalizer = self.y_normalizer
        # batch losses stay on device; one host sync per evaluate() call
        # (a float() per batch pays the ~100 ms tunnel round-trip each time)
        losses = []
        for x, y in loader:
            (x, y), w = shard_batch((jnp.asarray(x), jnp.asarray(y)),
                                    self.mesh)
            losses.append(self._eval_step(state.params, state.model_state,
                                          x, y, y_normalizer, w))
        if not losses:
            return 0.0
        total = float(sum(jnp.asarray(ls) for ls in losses))
        return total / len(losses)

    def profile_step(self, state: TrainState, x, y, trace_dir: str,
                     n_steps: int = 5):
        """Capture a jax.profiler trace of the train step (the tracing
        subsystem the reference lacks, SURVEY.md §5.1). View with
        TensorBoard or xprof."""
        (x, y), w = shard_batch((jnp.asarray(x), jnp.asarray(y)), self.mesh)
        state, loss = self._train_step(state, x, y, self.y_normalizer, w)
        jax.block_until_ready(loss)
        with jax.profiler.trace(trace_dir):
            for _ in range(n_steps):
                state, loss = self._train_step(state, x, y,
                                               self.y_normalizer, w)
            jax.block_until_ready(loss)
        return state, trace_dir

    def fit(
        self,
        state: TrainState,
        train_loader_fn: Callable[[], Iterable] | Iterable,
        val_loader_fn: Callable[[], Iterable] | Iterable | None = None,
        epochs: int = 1,
        schedule: Callable[[int], float] | ReduceLROnPlateau | None = None,
        log_fn: Callable[[dict], None] | None = None,
        epoch_callback: Callable[[int, "TrainState", "History"], None]
        | None = None,
    ) -> tuple:
        """Epoch loop with per-epoch scheduler step (train/training.py:26-88).

        Loaders may be passed as factories (called each epoch, so shuffling
        pipelines re-draw) or as re-iterable objects.

        epoch_callback(epoch, state, history_so_far) runs after each
        epoch's scheduler step and logging — the periodic-checkpoint hook
        (cli/common.py periodic_checkpointer).
        """
        history = History()
        for epoch in range(epochs):
            t0 = time.perf_counter()
            loader = (
                train_loader_fn() if callable(train_loader_fn) else train_loader_fn
            )
            state, train_loss = self.train_epoch(state, loader)
            history.train_loss.append(train_loss)

            val_loss = float("nan")
            if val_loader_fn is not None:
                vloader = (
                    val_loader_fn() if callable(val_loader_fn) else val_loader_fn
                )
                val_loss = self.evaluate(state, vloader)
            history.val_loss.append(val_loss)

            # scheduler: stepped AFTER the epoch, plateau sees val loss
            if isinstance(schedule, ReduceLROnPlateau):
                state = self.set_lr(state, schedule.step(val_loss))
            elif schedule is not None:
                state = self.set_lr(state, schedule(epoch + 1))
            history.lr.append(self.current_lr(state))
            history.epoch_time_s.append(time.perf_counter() - t0)

            if log_fn is not None:
                log_fn(
                    {
                        "epoch": epoch,
                        "train_loss": train_loss,
                        "val_loss": val_loss,
                        "lr": history.lr[-1],
                        "epoch_time_s": history.epoch_time_s[-1],
                    }
                )
            if epoch_callback is not None:
                epoch_callback(epoch, state, history)
        return state, history
