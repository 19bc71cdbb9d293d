"""Configurable S4 base/sequence models.

Parity targets:
  - S4BaseModel: models/s4_model.py:105-242 — GridIO processors, encoder,
    per-layer (norm, dropout, residual, ffn) registries around S4Blocks,
    pre/post-norm, interlayer activation, decoder; `predict` chunked
    long-horizon rollout (s4_model.py:261-279).
  - S4SeqModel family: models/s4seq_model.py:22-495 — sequence-in /
    sequence-out wrappers (here: S4SeqModel for seq2seq over time,
    OneToSeqModel for single-state -> trajectory).

Registry semantics (models/custom_layer.py:118-142): residual in
{weighted, identity, zero}; norm in {LayerNorm, identity}; ffn in
{ffn, zero}.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from resolution_pde_tpu.models import io_processors as iop
from resolution_pde_tpu.models.layers import ACTIVATIONS, FeedForward
from resolution_pde_tpu.models.s4 import S4Block


def _extend(value, n):
    if isinstance(value, (list, tuple)):
        assert len(value) == n
        return list(value)
    return [value] * n


class _Residual(nn.Module):
    kind: str
    d_model: int

    @nn.compact
    def __call__(self, x):
        if self.kind == "identity":
            return x
        if self.kind == "zero":
            return x * 0.0
        if self.kind == "weighted":
            return nn.Dense(self.d_model)(x)
        raise ValueError(f"unknown residual {self.kind!r}")


class S4BaseModel(nn.Module):
    """Input (B, S..., [T,] V) + grid (B, S..., 1) -> processed output."""

    d_input: int
    d_output: int = 10
    d_model: int = 256
    n_layers: int = 4
    exo_dropout: float = 0.0
    prenorm: bool = False
    interlayer_act: Optional[str] = None
    input_processor: str = "Concat"
    output_processor: str = "identity"
    residual_type: Any = "identity"
    norm_type: Any = "LayerNorm"
    ffn_type: Any = "zero"
    mode: str = "diag"  # SSM kernel for the S4Blocks
    bidirectional: bool = False
    s4_dropout: float = 0.0
    final_mlp_hidden_expansion: Optional[int] = None
    kernel_args: Optional[dict] = None  # S4Block long-tail kernel options

    @nn.compact
    def __call__(self, x, grid, deterministic: bool = True):
        input_shape = x.shape
        x = iop.GRID_INPUT_REGISTRY[self.input_processor](x, grid)
        x = nn.Dense(self.d_model)(x)

        norms = _extend(self.norm_type, self.n_layers)
        residuals = _extend(self.residual_type, self.n_layers)
        ffns = _extend(self.ffn_type, self.n_layers)

        for i in range(self.n_layers):
            z = x
            if self.prenorm and norms[i] == "LayerNorm":
                z = nn.LayerNorm()(z)
            z = S4Block(self.d_model, mode=self.mode,
                        bidirectional=self.bidirectional,
                        dropout=self.s4_dropout,
                        kernel_args=self.kernel_args)(z, deterministic)
            if self.exo_dropout > 0.0:
                z = nn.Dropout(self.exo_dropout,
                               deterministic=deterministic)(z)
            x = z + _Residual(residuals[i], self.d_model)(x)
            if not self.prenorm and norms[i] == "LayerNorm":
                x = nn.LayerNorm()(x)
            if ffns[i] == "ffn":
                if self.prenorm:
                    x = nn.LayerNorm()(x)
                x = FeedForward(self.d_model, factor=4, n_layers=2)(
                    x, deterministic) + x
                if not self.prenorm:
                    x = nn.LayerNorm()(x)
            if self.interlayer_act:
                x = ACTIVATIONS[self.interlayer_act](x)

        if self.final_mlp_hidden_expansion is not None:
            x = nn.Dense(self.final_mlp_hidden_expansion * self.d_model)(x)
            x = ACTIVATIONS["gelu"](x)
            x = nn.Dense(self.d_output)(x)
        else:
            x = nn.Dense(self.d_output)(x)
        return iop.OUTPUT_REGISTRY[self.output_processor](x, input_shape)


class S4SeqModel(nn.Module):
    """Sequence-to-sequence over time: input (B, T, S, V) + grid (B, S, 1)
    -> (B, T, S, d_output), with time batched into the spatial-sequence
    backbone (s4seq_model.py:115 semantics via BatchSpace/UnbatchSpace)."""

    d_input: int
    d_output: int = 1
    d_model: int = 128
    n_layers: int = 4
    dropout: float = 0.0
    mode: str = "diag"
    kernel_args: Optional[dict] = None

    @nn.compact
    def __call__(self, x, grid, deterministic: bool = True):
        b, t, s, v = x.shape
        input_shape = x.shape
        # attach grid along features for every timestep
        g = jnp.broadcast_to(grid[:, None], (b, t, s, 1))
        x = jnp.concatenate([x, g], axis=-1)
        # run the sequence model over TIME at each spatial point
        x = iop.batch_space(x)  # ((B S), T, V+1)
        x = nn.Dense(self.d_model)(x)
        for _ in range(self.n_layers):
            z = S4Block(self.d_model, mode=self.mode,
                        dropout=self.dropout,
                        kernel_args=self.kernel_args)(x, deterministic)
            x = z + x
        x = nn.Dense(self.d_output)(x)
        return iop.unbatch_space(x, input_shape)


class OneToSeqModel(nn.Module):
    """Single state -> trajectory (s4seq_model.py:384): encode the initial
    state, decode n_timesteps outputs autoregressively with the
    convolutional model re-applied per step."""

    d_input: int
    d_output: int = 1
    d_model: int = 64
    n_layers: int = 2
    n_timesteps: int = 10
    mode: str = "diag"

    @nn.compact
    def __call__(self, x0, grid, deterministic: bool = True):
        """x0: (B, S, V) -> (B, n_timesteps, S, d_output)."""
        inner = S4BaseModel(
            d_input=self.d_input, d_output=self.d_output,
            d_model=self.d_model, n_layers=self.n_layers, mode=self.mode,
            input_processor="Concat", output_processor="identity")
        outs = []
        state = x0
        for _ in range(self.n_timesteps):
            state = inner(state, grid, deterministic)
            outs.append(state)
        return jnp.stack(outs, axis=1)


def predict_chunked(apply_fn, x0, grid, n_timesteps: int,
                    train_timesteps: int, lg_length: Optional[int] = None):
    """Long-horizon chunked rollout (s4_model.py:261-279): predict in
    train_timesteps-sized windows, re-seeding each window from the last
    prediction. apply_fn(x0, grid, steps) -> (B, steps, ...)."""
    if lg_length is None:
        lg_length = train_timesteps
    y = apply_fn(x0, grid, min(train_timesteps, n_timesteps))
    while y.shape[1] < n_timesteps:
        t_i = -train_timesteps + lg_length - 1 + y.shape[1]
        x_ = y[:, t_i]
        pred_steps = min(train_timesteps, n_timesteps - t_i - 1)
        y_new = apply_fn(x_, grid, pred_steps)[:, -lg_length:]
        y = jnp.concatenate([y, y_new], axis=1)
    return y[:, :n_timesteps]


# ---------------------------------------------------------------------------
# Sequence-model family tail (models/s4seq_model.py:22, 156, 333, 495)
# ---------------------------------------------------------------------------

class S4BaseSeqModel(nn.Module):
    """Sequence-in/sequence-out S4 backbone (s4seq_model.py:22-113):
    x (B, T, S, V) + grid (B, S, 1) -> (B, T, S, d_output); space is
    flattened into batch and causal S4 runs over TIME.

    The reference's setup_step/step/default_state recurrent API is the
    functional pair from `s4seq_recurrent_fns` (lax.scan-ready)."""

    d_input: int
    d_output: int = 1
    d_model: int = 128
    n_layers: int = 4
    exo_dropout: float = 0.0
    interlayer_act: Optional[str] = None
    mode: str = "diag"
    kernel_args: Optional[dict] = None

    @nn.compact
    def __call__(self, x, grid, deterministic: bool = True):
        b, t, s, v = x.shape
        input_shape = x.shape
        g = jnp.broadcast_to(grid[:, None], (b, t, s, grid.shape[-1]))
        x = jnp.concatenate([x, g], axis=-1)
        x = iop.batch_space(x)  # ((B S), T, V+1)
        x = nn.Dense(self.d_model)(x)
        for _ in range(self.n_layers):
            z = S4Block(self.d_model, mode=self.mode,
                        kernel_args=self.kernel_args)(x, deterministic)
            if self.exo_dropout > 0.0:
                z = nn.Dropout(self.exo_dropout,
                               deterministic=deterministic)(z)
            x = z + x
            if self.interlayer_act:
                x = ACTIVATIONS[self.interlayer_act](x)
        x = nn.Dense(self.d_output)(x)
        return iop.unbatch_space(x, input_shape)


class S4DualSeqModel(nn.Module):
    """Alternating space/time S4 stack (s4seq_model.py:156-331): per layer
    the processor decides the scan axis — 'BatchTime' flattens time into
    batch and runs (optionally bidirectional) S4 over SPACE; 'BatchSpace'
    flattens space into batch and runs causal S4 over TIME (the reference
    asserts bidirectional=False there for causality, s4seq_model.py:188).

    x (B, T, S, V) + grid (B, S, 1) -> (B, T, S, d_output)."""

    d_input: int
    d_output: int = 1
    d_model: int = 128
    n_layers: int = 4
    layer_processors: Sequence[str] = ("BatchTime", "BatchSpace")
    bidirectional_space: bool = True
    mode: str = "diag"
    exo_dropout: float = 0.0
    kernel_args: Optional[dict] = None

    @nn.compact
    def __call__(self, x, grid, deterministic: bool = True):
        b, t, s, v = x.shape
        g = jnp.broadcast_to(grid[:, None], (b, t, s, grid.shape[-1]))
        x = jnp.concatenate([x, g], axis=-1)
        x = nn.Dense(self.d_model)(x)
        d = self.d_model
        for i in range(self.n_layers):
            proc = self.layer_processors[i % len(self.layer_processors)]
            if proc == "BatchTime":
                # time -> batch; bidirectional S4 over SPACE
                z = x.reshape(b * t, s, d)
                z = S4Block(d, mode=self.mode,
                            bidirectional=self.bidirectional_space,
                            kernel_args=self.kernel_args)(
                    z, deterministic)
                z = z.reshape(b, t, s, d)
            elif proc == "BatchSpace":
                # space -> batch; causal S4 over TIME
                z = jnp.moveaxis(x, 1, 2).reshape(b * s, t, d)
                z = S4Block(d, mode=self.mode, bidirectional=False,
                            kernel_args=self.kernel_args)(
                    z, deterministic)
                z = jnp.moveaxis(z.reshape(b, s, t, d), 2, 1)
            else:
                raise ValueError(f"unknown layer processor {proc!r}")
            if self.exo_dropout > 0.0:
                z = nn.Dropout(self.exo_dropout,
                               deterministic=deterministic)(z)
            x = z + x
        return nn.Dense(self.d_output)(x)


class SeqAdd(nn.Module):
    """Sum of two sequence models (s4seq_model.py:333-352)."""

    model1: nn.Module
    model2: nn.Module

    @nn.compact
    def __call__(self, x, grid, deterministic: bool = True):
        return (self.model1(x, grid, deterministic)
                + self.model2(x, grid, deterministic))


class ChainModel(nn.Module):
    """Temporal super-resolution wrapper (s4seq_model.py:495-527): insert
    chain_length-1 zero frames between the input timesteps, run the inner
    sequence model at the fine time grid, read every chain_length-th
    output. x layout (B, T, S, V) (the reference uses trailing time; our
    drivers are time-first)."""

    model: nn.Module
    chain_length: int = 2

    @nn.compact
    def __call__(self, x, grid, deterministic: bool = True):
        b, t = x.shape[:2]
        inp = jnp.zeros((b, t * self.chain_length) + x.shape[2:], x.dtype)
        inp = inp.at[:, :: self.chain_length].set(x)
        y = self.model(inp, grid, deterministic)
        return y[:, self.chain_length - 1 :: self.chain_length]


def _recurrent_step_options(kernel_args, mode: str):
    """Split a layer's kernel_args into (disc, step-fn kwargs) for the
    recurrent builders — only the options that change parameter RESOLUTION
    matter at step time (shape-only options like dt_tie/n_ssm are
    recognized from the stored parameter shapes)."""
    ka = dict(kernel_args or {})
    disc = ka.get("disc", "zoh")
    keys = (("dt_transform", "dt_fast", "real_transform", "imag_transform",
             "is_real", "bandlimit") if mode == "diag"
            else ("dt_transform", "dt_fast", "real_transform", "bandlimit"))
    return disc, {k: ka[k] for k in keys if k in ka}


def s4seq_recurrent_fns(params, d_model: int, n_layers: int, mode: str,
                        L_train: int,
                        interlayer_act: Optional[str] = None,
                        kernel_args: Optional[dict] = None):
    """Build the recurrent (init_state, step) pair for an
    S4BaseSeqModel/S4SeqModel param tree — the TPU-functional equivalent of
    the reference's setup_step/default_state/step
    (s4seq_model.py:58-113).

    step(state, x_t, grid) consumes one timestep x_t (B_, V) with grid
    (B_, G) (B_ = batch*space after flattening) and returns
    (y_t (B_, d_output), new_state). Outputs match the causal
    convolutional forward exactly (tests/test_s4_base_mgpt.py).
    `interlayer_act` must match the model's field — it is applied after
    each residual, as in S4BaseSeqModel.__call__. `kernel_args` likewise
    (the S4Block kernel_args the model was constructed with); dt/transform
    options are resolved identically to the conv path.
    """
    from resolution_pde_tpu.models.s4 import (
        dplr_recurrent_step_fn, s4d_recurrent_step_fn)

    disc, step_kw = _recurrent_step_options(kernel_args, mode)
    p = params["params"] if "params" in params else params
    enc_k, enc_b = p["Dense_0"]["kernel"], p["Dense_0"]["bias"]
    dec_k, dec_b = p["Dense_1"]["kernel"], p["Dense_1"]["bias"]
    layers = []
    for i in range(n_layers):
        blk = p[f"S4Block_{i}"]
        conv = blk["FFTConvLayer_0"]
        if mode == "diag":
            init_s, kstep = s4d_recurrent_step_fn(
                conv["S4DKernelLayer_0"], disc=disc, **step_kw)
        else:
            init_s, kstep = dplr_recurrent_step_fn(
                conv["DPLRKernelLayer_0"], L_train, **step_kw)
        layers.append((init_s, kstep, conv["D"][0],
                       blk["Dense_0"]["kernel"], blk["Dense_0"]["bias"]))

    def init_state(batch: int):
        return [layer[0](batch) for layer in layers]

    def step(state, x_t, grid):
        import jax

        h = jnp.concatenate([x_t, grid], axis=-1) @ enc_k + enc_b
        new_states = []
        for (init_s, kstep, D, glu_k, glu_b), s in zip(layers, state):
            s2, y = kstep(s, h)
            y = y + D[None] * h            # FFTConv D bypass (s4.py:1762)
            y = jax.nn.gelu(y, approximate=False)
            y2 = y @ glu_k + glu_b         # S4Block GLU output
            y = (y2[..., :d_model]
                 * jax.nn.sigmoid(y2[..., d_model:]))
            h = y + h                      # residual
            if interlayer_act:
                h = ACTIVATIONS[interlayer_act](h)
            new_states.append(s2)
        return h @ dec_k + dec_b, new_states

    return init_state, step


def s4dualseq_recurrent_fns(params, model: "S4DualSeqModel",
                            L_train: int,
                            kernel_args: Optional[dict] = None):
    """Recurrent (init_state, step) for S4DualSeqModel — the reference's
    setup_step/step (s4seq_model.py:245-331): 'BatchSpace' (time) layers
    step their SSM state per spatial point; 'BatchTime' (spatial) layers
    apply their full bidirectional convolution on the current frame (they
    act per-timestep in conv mode too, so conv == recurrent exactly —
    tested in tests/test_s4_base_mgpt.py).

    step(state, x_t (B, S, V), grid (B, S, G)) ->
        (y_t (B, S, d_output), new_state)."""
    import jax

    from resolution_pde_tpu.models.s4 import (
        S4Block, dplr_recurrent_step_fn, s4d_recurrent_step_fn)

    if kernel_args is None:
        kernel_args = getattr(model, "kernel_args", None)
    disc, step_kw = _recurrent_step_options(kernel_args, model.mode)
    p = params["params"] if "params" in params else params
    enc_k, enc_b = p["Dense_0"]["kernel"], p["Dense_0"]["bias"]
    dec_k, dec_b = p["Dense_1"]["kernel"], p["Dense_1"]["bias"]
    d = model.d_model
    layers = []
    for i in range(model.n_layers):
        proc = model.layer_processors[i % len(model.layer_processors)]
        blk = p[f"S4Block_{i}"]
        if proc == "BatchTime":
            mod = S4Block(d, mode=model.mode,
                          bidirectional=model.bidirectional_space,
                          kernel_args=kernel_args)
            layers.append(("spatial", mod, blk))
        else:
            conv = blk["FFTConvLayer_0"]
            if model.mode == "diag":
                init_s, kstep = s4d_recurrent_step_fn(
                    conv["S4DKernelLayer_0"], disc=disc, **step_kw)
            else:
                init_s, kstep = dplr_recurrent_step_fn(
                    conv["DPLRKernelLayer_0"], L_train, **step_kw)
            layers.append(("time", (init_s, kstep, conv["D"][0],
                                    blk["Dense_0"]["kernel"],
                                    blk["Dense_0"]["bias"]), blk))

    def init_state(batch_times_space: int):
        return [layer[1][0](batch_times_space)
                if layer[0] == "time" else None for layer in layers]

    def step(state, x_t, grid):
        b, s_pts, _ = x_t.shape
        h = jnp.concatenate([x_t, grid], axis=-1) @ enc_k + enc_b
        new_states = []
        for (kind, obj, blk), st in zip(layers, state):
            if kind == "spatial":
                z = obj.apply({"params": blk}, h)
                new_states.append(None)
            else:
                init_s, kstep, D, glu_k, glu_b = obj
                hf = h.reshape(b * s_pts, d)
                st2, y = kstep(st, hf)
                y = y + D[None] * hf
                y = jax.nn.gelu(y, approximate=False)
                y2 = y @ glu_k + glu_b
                y = y2[..., :d] * jax.nn.sigmoid(y2[..., d:])
                z = y.reshape(b, s_pts, d)
                new_states.append(st2)
            h = z + h
        return h @ dec_k + dec_b, new_states

    return init_state, step


def chain_predict(params, inner_model, x0, grid, n_timesteps: int,
                  train_timesteps: int, chain_length: int = 2,
                  lg_length: Optional[int] = None):
    """ChainModel's recurrent long-horizon rollout
    (s4seq_model.py:514-546 _predict_inL/predict): step the INNER sequence
    model on the fine time grid, feeding the prediction back every
    `chain_length` steps and zeros in between; chunk the horizon into
    train_timesteps windows re-seeded from the last prediction.

    params: ChainModel variables ({'params': {'model': ...}}) or the inner
    model's variables. inner_model: the S4BaseSeqModel instance.
    x0 (B, S, V); grid (B, S, G). Returns (B, n_timesteps, S, d_output).
    """
    import jax

    p = params["params"] if "params" in params else params
    if "model" in p:  # ChainModel wrapping
        p = p["model"]
    init_state, step = s4seq_recurrent_fns(
        {"params": p}, inner_model.d_model, inner_model.n_layers,
        inner_model.mode, L_train=train_timesteps * chain_length,
        interlayer_act=getattr(inner_model, "interlayer_act", None),
        kernel_args=getattr(inner_model, "kernel_args", None))
    b, s_pts, v = x0.shape

    def window(x_seed):
        """train_timesteps outputs from one recurrent window."""
        state = init_state(b * s_pts)
        gf = grid.reshape(b * s_pts, -1)

        def body(carry, k):
            state, inp = carry
            y, state = step(state, inp.reshape(b * s_pts, v), gf)
            y = y.reshape(b, s_pts, -1)
            is_emit = (k + 1) % chain_length == 0
            nxt = jnp.where(is_emit, y, jnp.zeros_like(y))
            return (state, nxt), (y, is_emit)

        (_, _), (ys, emits) = jax.lax.scan(
            body, (state, x_seed),
            jnp.arange(train_timesteps * chain_length))
        # keep every chain_length-th output
        return ys[chain_length - 1::chain_length]  # (T, B, S, d)

    if lg_length is None:
        lg_length = train_timesteps
    y = window(x0)  # (train_timesteps, B, S, d)
    while y.shape[0] < n_timesteps:
        x_ = y[-train_timesteps + lg_length - 1]
        y_new = window(x_)[-lg_length:]
        y = jnp.concatenate([y, y_new], axis=0)
    return jnp.moveaxis(y[:n_timesteps], 0, 1)  # (B, T, S, d)
