"""Shared layers: torch-default-matching initializers, weight-normalized
dense, FFNO FeedForward, pointwise-conv MLPs.

Parity targets:
  - WNLinear: models/custom_layer.py:70-108 (weight_norm over output rows).
  - FeedForward: models/custom_layer.py:49-68 (factor expansion, GELU
    between layers, optional LayerNorm on the last layer, dropout).
  - MLP1d/MLP2d: models/fno_blocks.py:35-45, 73-82 (1x1 conv MLPs — here
    plain Dense on channels-last, which XLA maps to MXU matmuls).

Initializers reproduce torch.nn.Linear / ConvNd defaults (kaiming-uniform
weights with a=sqrt(5) => bound sqrt(1/fan_in); uniform bias with the same
bound) so training dynamics are comparable to the reference.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_kernel_init(rng, shape, dtype=jnp.float32):
    """U(-sqrt(1/fan_in), sqrt(1/fan_in)) for a (fan_in, ..., fan_out) kernel.

    flax Dense kernels are (in, out); torch Linear stores (out, in) and uses
    kaiming_uniform_(a=sqrt(5)) => bound = sqrt(1/fan_in). Distributionally
    identical under transpose.
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = float(np.sqrt(1.0 / fan_in))
    return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = float(np.sqrt(1.0 / fan_in))

    def init(rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, dtype, minval=-bound, maxval=bound)

    return init


def xavier_normal_init(rng, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_normal_ on a (d_out, d_in, ...) complex-pair
    weight: std = sqrt(2 / (fan_in + fan_out)) with fan over the first two
    axes and receptive field = prod of the rest (matches torch semantics for
    the FFNO fourier weight (d, d, modes, 2), spectral_convolution.py:129)."""
    receptive = int(np.prod(shape[2:])) if len(shape) > 2 else 1
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return std * jax.random.normal(rng, shape, dtype)


def gelu(x):
    """Exact (erf-based) GELU, matching torch's default."""
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "gelu": gelu,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}


class TorchLinear(nn.Module):
    """Dense layer with torch.nn.Linear default init.

    dtype: computation dtype (e.g. bfloat16 for MXU-native matmuls);
    parameters stay float32, accumulation is float32."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init, (fan_in, self.features))
        cd = self.dtype or x.dtype
        y = jnp.dot(x.astype(cd), kernel.astype(cd),
                    preferred_element_type=jnp.float32)
        y = y.astype(cd)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + bias.astype(cd)
        return y


class WNDense(nn.Module):
    """Dense with optional weight normalization over output rows.

    With wnorm: kernel = g * v / ||v||_rows where g is initialized to
    ||v||_rows so the layer starts identical to the unnormalized one
    (torch weight_norm semantics, models/custom_layer.py:70-79).
    The norm itself is computed in float32; the matmul runs in `dtype`.
    """

    features: int
    use_bias: bool = True
    wnorm: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        if not self.wnorm:
            return TorchLinear(self.features, self.use_bias, self.dtype)(x)
        v = self.param("v", torch_kernel_init, (fan_in, self.features))
        g = self.param(
            "g", lambda rng, shape: jnp.linalg.norm(v, axis=0), (self.features,)
        )
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        kernel = v * (g[None, :] / (norm + 1e-12))
        cd = self.dtype or x.dtype
        y = jnp.dot(x.astype(cd), kernel.astype(cd),
                    preferred_element_type=jnp.float32).astype(cd)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + bias.astype(cd)
        return y


class _ParamLinear(nn.Module):
    """Creates TorchLinear-compatible params and returns them (no compute).

    Used by FeedForward's fused path so the param tree is IDENTICAL to the
    unfused one (WNDense_i/TorchLinear_0/{kernel,bias}) — checkpoints and
    reference weight transplants work unchanged across ff_impl."""

    features: int

    @nn.compact
    def __call__(self, fan_in: int):
        k = self.param("kernel", torch_kernel_init, (fan_in, self.features))
        b = self.param("bias", torch_bias_init(fan_in), (self.features,))
        return k, b


class _ParamWNDense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, fan_in: int):
        return _ParamLinear(self.features, name="TorchLinear_0")(fan_in)


class _ParamLayerNorm(nn.Module):
    @nn.compact
    def __call__(self, dim: int):
        s = self.param("scale", nn.initializers.ones, (dim,))
        b = self.param("bias", nn.initializers.zeros, (dim,))
        return s, b


class FeedForward(nn.Module):
    """FFNO feed-forward: n_layers linear layers with `factor` expansion.

    Layer i: Linear -> Dropout -> GELU (if not last) -> LayerNorm (if last
    and layer_norm). Matches models/custom_layer.py:49-68 — note the
    reference's FeedForward accepts ff_weight_norm but IGNORES it (it
    builds plain nn.Linear, custom_layer.py:57); we reproduce that, so the
    field is kept for signature parity only.

    ff_impl='fused' runs the whole chain as one Pallas TPU kernel (hidden
    activations never leave VMEM — see ops/pallas/fused_ff.py); requires
    dropout == 0 (falls back to the dense path otherwise). The param tree
    is identical across impls.
    """

    dim: int
    factor: int = 4
    n_layers: int = 2
    ff_weight_norm: bool = False
    layer_norm: bool = False
    dropout: float = 0.0
    dtype: Any = None
    approx_gelu: bool = False  # tanh-approx GELU (cheaper on the VPU)
    # 'dense' | 'fused' (Pallas, recompute backward) | 'fused_saved'
    # (Pallas, saved pre-activations: no backward recompute GEMMs)
    ff_impl: str = "dense"

    @nn.compact
    def __call__(self, x, deterministic: bool = True, residual=None):
        """residual: optional tensor added to the output (the FFNO skip);
        the fused path folds the add into the kernel."""
        if self.ff_impl not in ("dense", "fused", "fused_saved"):
            raise ValueError(f"unknown ff_impl {self.ff_impl!r}; expected "
                             "'dense', 'fused', or 'fused_saved'")
        if self.ff_impl != "dense" and self.dropout == 0.0:
            return self._fused(x, residual)
        for i in range(self.n_layers):
            out_dim = self.dim if i == self.n_layers - 1 else self.dim * self.factor
            # plain linear regardless of ff_weight_norm (reference parity)
            x = WNDense(out_dim, wnorm=False, dtype=self.dtype)(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
            if i < self.n_layers - 1:
                x = (jax.nn.gelu(x, approximate=True) if self.approx_gelu
                     else gelu(x))
            elif self.layer_norm:
                # f32 statistics; epsilon matches torch.nn.LayerNorm (1e-5)
                x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)(
                    x.astype(jnp.float32)).astype(x.dtype)
        if residual is not None:
            x = residual + x
        return x

    def _fused(self, x, residual=None):
        from resolution_pde_tpu.ops.pallas.fused_ff import fused_feedforward

        kernels, biases = [], []
        fan_in = x.shape[-1]
        for i in range(self.n_layers):
            out_dim = (self.dim if i == self.n_layers - 1
                       else self.dim * self.factor)
            k, b = _ParamWNDense(out_dim, name=f"WNDense_{i}")(fan_in)
            kernels.append(k)
            biases.append(b)
            fan_in = out_dim
        ln = (_ParamLayerNorm(name="LayerNorm_0")(self.dim)
              if self.layer_norm else None)
        cd = self.dtype if self.dtype is not None else x.dtype
        # compiled Mosaic on TPU backends; interpreter elsewhere (CPU tests)
        interpret = jax.default_backend() not in ("tpu", "axon")
        return fused_feedforward(x, kernels, biases, ln, residual,
                                 approx_gelu=self.approx_gelu,
                                 compute_dtype=cd, interpret=interpret,
                                 save_acts=self.ff_impl == "fused_saved")


class PointwiseMLP(nn.Module):
    """Two 1x1 convs with GELU between (MLP1d/MLP2d), channels-last Dense."""

    out_features: int
    mid_features: int

    @nn.compact
    def __call__(self, x):
        x = TorchLinear(self.mid_features)(x)
        x = gelu(x)
        return TorchLinear(self.out_features)(x)
