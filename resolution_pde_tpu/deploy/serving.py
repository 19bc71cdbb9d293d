"""Production serving: ahead-of-time-compiled inference on resolution buckets.

The reference has no deployment story (training scripts only); this is the
TPU-native serving layer the framework adds on top of the reference's eval
semantics (utils/autoregressive_step.py:284-310 normalizer round-trip,
train/training.py:105-146 eval forward):

- **One AOT-compiled program per (spatial shape, batch bucket)** via
  `jax.jit(...).lower(...).compile()` at load time — first-request latency
  is a dispatch, never an XLA compile. Mirrors the training-side
  "one compiled program per resolution bucket" convention (CLAUDE.md).
- **Batch bucketing with pad-and-slice**: a request of B rows runs on the
  smallest compiled bucket >= B (padded with the first row; every model
  here is per-sample independent in eval mode, so padding rows cannot
  perturb real rows) and the output is sliced back to B.
- **Normalizer round-trip baked into the program**: encode(x) -> model ->
  decode(pred) runs fused on device; `forecast` re-encodes each step
  inside a `lax.scan` exactly like evaluation/rollout.py.
- **Mesh-aware**: given a Mesh, inputs shard over the data axes
  (dcn x data) and XLA partitions the program; parameters are placed once
  at engine construction.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from resolution_pde_tpu.models.registry import unwrap_output


def _as_shape_tuple(spatial) -> tuple:
    if isinstance(spatial, int):
        return (spatial,)
    return tuple(int(s) for s in spatial)


class ServingEngine:
    """AOT-compiled inference engine for a trained operator.

    model: a flax module following the repo convention (apply(variables, x,
        deterministic=True) with x of shape (B, C, *spatial)).
    variables: {"params": ..., **model_state} — the eval-mode variable
        dict (model_state carries batch_stats for BN models).
    x_normalizer / y_normalizer: optional SimpleNormalizer-like pytrees;
        encode/decode are baked into the compiled programs.
    mesh: optional jax.sharding.Mesh; inputs shard over its data axes.
    compute_dtype: cast x to this dtype inside the program (e.g.
        jnp.bfloat16 for the fast path); outputs are always f32.
    """

    def __init__(self, model, variables, *, x_normalizer=None,
                 y_normalizer=None, mesh=None, compute_dtype=None,
                 strict_buckets: bool = False):
        self.model = model
        self.mesh = mesh
        self.x_normalizer = x_normalizer
        self.y_normalizer = y_normalizer
        self.compute_dtype = compute_dtype
        # strict: raise on a bucket miss instead of compiling on demand —
        # an unwarmed shape otherwise pays a full XLA compile (minutes cold
        # on remote-compile backends) inside the serving path
        self.strict_buckets = strict_buckets
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            replicated = NamedSharding(mesh, PartitionSpec())
            variables = jax.device_put(variables, replicated)
        else:
            variables = jax.device_put(variables)
        self.variables = variables
        # (kind, spatial, in_channels, batch[, steps]) -> executable
        self._programs: dict = {}

    # -- program construction -----------------------------------------

    def _predict_fn(self):
        model, xn, yn = self.model, self.x_normalizer, self.y_normalizer
        dtype = self.compute_dtype

        def fn(variables, x):
            if xn is not None:
                x = xn.encode(x)
            if dtype is not None:
                x = x.astype(dtype)
            pred = unwrap_output(
                model.apply(variables, x, deterministic=True))
            pred = pred.astype(jnp.float32)
            if yn is not None:
                pred = yn.decode(pred)
            return pred

        return fn

    def _forecast_fn(self, steps: int):
        model, xn, yn = self.model, self.x_normalizer, self.y_normalizer
        dtype = self.compute_dtype

        def fn(variables, x0):
            state = xn.encode(x0) if xn is not None else x0

            def step(state, _):
                s = state.astype(dtype) if dtype is not None else state
                pred = unwrap_output(
                    model.apply(variables, s, deterministic=True))
                pred = pred.astype(jnp.float32)
                decoded = yn.decode(pred) if yn is not None else pred
                nxt = xn.encode(decoded) if xn is not None else decoded
                return nxt, decoded

            _, preds = jax.lax.scan(step, state, None, length=steps)
            return jnp.moveaxis(preds, 0, 1)  # (B, steps, C, *spatial)

        return fn

    def _x_struct(self, batch: int, in_channels: int, spatial: tuple):
        shape = (batch, in_channels) + spatial
        if self.mesh is not None:
            from resolution_pde_tpu.parallel.mesh import batch_sharding

            return jax.ShapeDtypeStruct(
                shape, jnp.float32,
                sharding=batch_sharding(self.mesh, len(shape)))
        return jax.ShapeDtypeStruct(shape, jnp.float32)

    def compile_bucket(self, spatial, batch_size: int, in_channels: int = 1,
                       rollout_steps: Iterable[int] = ()) -> None:
        """AOT-compile the predict (and optional forecast) programs for one
        (spatial shape, batch) bucket."""
        spatial = _as_shape_tuple(spatial)
        x_struct = self._x_struct(batch_size, in_channels, spatial)
        key = ("predict", spatial, in_channels, batch_size)
        if key not in self._programs:
            self._programs[key] = (
                jax.jit(self._predict_fn())
                .lower(self.variables, x_struct).compile())
        for steps in rollout_steps:
            k = ("forecast", spatial, in_channels, batch_size, int(steps))
            if k not in self._programs:
                self._programs[k] = (
                    jax.jit(self._forecast_fn(int(steps)))
                    .lower(self.variables, x_struct).compile())

    def warmup(self, spatial_shapes: Sequence, batch_sizes: Sequence[int],
               in_channels: int = 1,
               rollout_steps: Iterable[int] = ()) -> None:
        """Compile every (spatial, batch) bucket ahead of serving."""
        for sp in spatial_shapes:
            for b in batch_sizes:
                self.compile_bucket(sp, b, in_channels=in_channels,
                                    rollout_steps=rollout_steps)

    # -- serving -------------------------------------------------------

    def _bucket_for(self, kind: str, spatial: tuple, channels: int, b: int,
                    extra=()):
        """Smallest compiled batch bucket >= b for this (spatial shape,
        channel count); None when no compatible program exists."""
        candidates = sorted(
            k[3] for k in self._programs
            if k[0] == kind and k[1] == spatial and k[2] == channels
            and tuple(k[4:]) == tuple(extra) and k[3] >= b)
        return candidates[0] if candidates else None

    def _on_bucket_miss(self, kind: str, spatial: tuple, channels: int,
                        b: int) -> None:
        msg = (f"ServingEngine bucket miss: no warmed {kind} program covers "
               f"(spatial={spatial}, channels={channels}, batch={b}); "
               f"warmed: {self.buckets()}")
        if self.strict_buckets:
            raise LookupError(msg + " (strict_buckets=True)")
        import warnings

        warnings.warn(msg + " — compiling on demand inside the serving "
                      "path (latency cliff)", RuntimeWarning, stacklevel=3)

    def _pad(self, x: np.ndarray, bucket: int):
        b = x.shape[0]
        if b == bucket:
            return x
        pad = np.broadcast_to(x[:1], (bucket - b,) + x.shape[1:])
        return np.concatenate([x, pad], axis=0)

    def _put(self, x):
        if self.mesh is not None:
            from resolution_pde_tpu.parallel.mesh import batch_sharding

            return jax.device_put(
                jnp.asarray(x), batch_sharding(self.mesh, x.ndim))
        return jnp.asarray(x)

    def predict_device(self, x):
        """Like predict() but returns the (bucket-padded) DEVICE array
        without waiting: dispatch is async, so callers can pipeline many
        requests and fetch later — in steady-state serving the host->device
        round-trip of request i overlaps the compute of request i-1.
        Slice to the request's batch size after fetching."""
        x = np.asarray(x, np.float32)
        b, c, spatial = x.shape[0], x.shape[1], tuple(x.shape[2:])
        bucket = self._bucket_for("predict", spatial, c, b)
        if bucket is None:
            self._on_bucket_miss("predict", spatial, c, b)
            self.compile_bucket(spatial, b, in_channels=c)
            bucket = b
        return self._programs[("predict", spatial, c, bucket)](
            self.variables, self._put(self._pad(x, bucket)))

    def predict(self, x) -> np.ndarray:
        """x: raw (B, C, *spatial) float32. Returns decoded predictions
        (B, C_out, *spatial) as float32 numpy (synchronous)."""
        b = np.asarray(x).shape[0]
        return np.asarray(self.predict_device(x))[:b]

    def forecast(self, x0, steps: int) -> np.ndarray:
        """Autoregressive rollout: x0 raw (B, C, *spatial). Returns decoded
        (B, steps, C, *spatial) float32 numpy, with the normalizer
        round-trip between steps (autoregressive_step.py:302-307)."""
        x0 = np.asarray(x0, np.float32)
        b, c, spatial = x0.shape[0], x0.shape[1], tuple(x0.shape[2:])
        bucket = self._bucket_for("forecast", spatial, c, b, (int(steps),))
        if bucket is None:
            self._on_bucket_miss("forecast", spatial, c, b)
            self.compile_bucket(spatial, b, in_channels=c,
                                rollout_steps=(int(steps),))
            bucket = b
        out = self._programs[("forecast", spatial, c, bucket, int(steps))](
            self.variables, self._put(self._pad(x0, bucket)))
        return np.asarray(out)[:b]

    # -- introspection -------------------------------------------------

    def buckets(self) -> list:
        """Compiled program inventory:
        [(kind, spatial, in_channels, batch, *extra)]."""
        return sorted(self._programs.keys(), key=str)

    def cost_summary(self) -> dict:
        """Per-bucket XLA cost analysis (flops/bytes where the backend
        reports them; absent entries are backend limitations, not errors)."""
        out = {}
        for key, exe in self._programs.items():
            try:
                cost = exe.cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0] if cost else {}
                out[str(key)] = {k: float(v) for k, v in cost.items()
                                 if k in ("flops", "bytes accessed")}
            except Exception:
                out[str(key)] = {}
        return out

    # -- construction helpers -----------------------------------------

    @classmethod
    def from_checkpoint(cls, model, checkpoint_path: str, sample_x,
                        **engine_kwargs) -> "ServingEngine":
        """Restore a trained checkpoint (train/checkpoint.py payload) into
        a serving engine. sample_x: (1, C, *spatial) used only to build the
        restore template."""
        from resolution_pde_tpu.train import Trainer
        from resolution_pde_tpu.train.checkpoint import restore_checkpoint

        trainer = Trainer(model)
        state = trainer.init(jnp.asarray(sample_x))
        state, _ = restore_checkpoint(checkpoint_path, state)
        variables = {"params": state.params, **state.model_state}
        return cls(model, variables, **engine_kwargs)
