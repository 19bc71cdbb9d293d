"""Fused FFNO FeedForward as a Pallas TPU kernel (forward + custom VJP).

The FFNO feed-forward (models/custom_layer.py:49-68 in the reference:
Dense -> GELU -> ... -> Dense -> LayerNorm) dominates the train step on
TPU, and it is bandwidth-bound: at the bench shape the (B*H*W, width*factor)
hidden activations are ~268 MB in bf16 and round-trip HBM between every
GEMM, plus again for GELU/LayerNorm and once more in the backward pass.

This kernel tiles over rows (points) and keeps every hidden activation in
VMEM: per tile it runs the whole chain
    x @ W1 + b1 -> GELU -> @ W2 + b2 -> GELU -> @ W3 + b3 -> LayerNorm
with bf16 MXU matmuls and f32 accumulation, reading only the (tile, C_in)
input and writing only the (tile, C_out) output. HBM traffic drops from
~10 tensors of size N*F to 2 tensors of size N*C.

The backward pass is a second Pallas kernel (flash-attention-style): it
recomputes the hidden activations per tile from the saved input, then runs
the full gradient chain in VMEM. Weight/bias/LayerNorm grads are
accumulated in f32 across the sequential TPU grid via constant-index
output blocks.

Numerics: matmuls in `compute_dtype` (bf16 for training) with f32
accumulation; GELU/LayerNorm and all gradient reductions in f32. With
compute_dtype=float32 the op matches the unfused FeedForward to roundoff
(tested in tests/test_fused_ff.py, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_2_OVER_PI = 0.7978845608028654
_INV_SQRT_2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327
_LN_EPS = 1e-5  # torch.nn.LayerNorm default (reference parity)


def _gelu(z, approx: bool):
    if approx:
        u = _SQRT_2_OVER_PI * (z + 0.044715 * z * z * z)
        return 0.5 * z * (1.0 + jnp.tanh(u))
    return 0.5 * z * (1.0 + jax.lax.erf(z * _INV_SQRT_2))


def _gelu_grad(z, approx: bool):
    if approx:
        z2 = z * z
        u = _SQRT_2_OVER_PI * (z + 0.044715 * z * z2)
        t = jnp.tanh(u)
        du = _SQRT_2_OVER_PI * (1.0 + 3.0 * 0.044715 * z2)
        return 0.5 * (1.0 + t) + 0.5 * z * (1.0 - t * t) * du
    cdf = 0.5 * (1.0 + jax.lax.erf(z * _INV_SQRT_2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)
    return cdf + z * pdf


def _pick_tile(n: int, prefer=(512, 1024, 256, 128, 64, 32, 16, 8)) -> int:
    for t in prefer:
        if n % t == 0:
            return t
    return 0  # caller pads


# forward keeps few intermediates -> bigger tiles amortize better; backward
# holds ~6 (tile, F) f32 buffers. The default scoped-VMEM budget (16 MB)
# rejects these tiles, so the pallas_calls raise it (v5e has 128 MB VMEM);
# measured on-chip: fwd 8192 beats 4096/1024 and bwd 4096 beats 1024 by ~5%
_FWD_TILES = (8192, 4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8)
_BWD_TILES = (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8)
_VMEM_LIMIT = 100 * 1024 * 1024


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                        memory_space=pltpu.VMEM)


def _fwd_pallas(x, kernels, biases, ln, residual, *, n_layers, has_ln,
                approx_gelu, has_residual, cd, interpret,
                save_zs: bool = False):
    """save_zs=True additionally returns the per-layer pre-activations
    (stored in `cd`), letting the backward skip its recompute GEMMs at the
    cost of the extra HBM round-trip — the FLOPs-vs-bandwidth trade in the
    opposite direction from the default flash-style recompute."""
    n, _ = x.shape
    tile = _pick_tile(n, _FWD_TILES)
    c_out = kernels[-1].shape[1]
    # without LayerNorm the backward never reads the LAST layer's
    # pre-activations (dz starts from the cotangent; hs reconstruction
    # needs only z_0..z_{L-2}) — don't round-trip them through HBM
    n_save = n_layers if has_ln else n_layers - 1

    args = [x.astype(cd)]
    in_specs = [pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    if has_residual:
        args.append(residual)
        in_specs.append(pl.BlockSpec((tile, c_out), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
    for k, b in zip(kernels, biases):
        args += [k.astype(cd), b.reshape(1, -1).astype(jnp.float32)]
        in_specs += [_const_spec(k.shape), _const_spec((1, b.shape[0]))]
    if has_ln:
        scale, bias = ln
        args += [scale.reshape(1, -1).astype(jnp.float32),
                 bias.reshape(1, -1).astype(jnp.float32)]
        in_specs += [_const_spec((1, c_out)), _const_spec((1, c_out))]

    base = 2 if has_residual else 1
    # sub-chain splitting (Mosaic VPU/MXU overlap) helps an isolated FF
    # microbench by ~6% (scripts/perf_probe8.py) but measured ~2% SLOWER
    # in the full train step; keep the single chain
    nsplit = 1
    sub = tile // nsplit

    def kernel(*refs):
        n_out = 1 + (n_save if save_zs else 0)
        out_ref = refs[-n_out]
        z_refs = refs[len(refs) - n_out + 1:]
        ks = [refs[base + 2 * i][:] for i in range(n_layers)]
        bs = [refs[base + 1 + 2 * i][:] for i in range(n_layers)]
        if has_ln:
            ln_s = refs[base + 2 * n_layers][:]
            ln_t = refs[base + 1 + 2 * n_layers][:]
        chunks = [refs[0][j * sub:(j + 1) * sub] for j in range(nsplit)]
        for i in range(n_layers):
            zs = [jnp.dot(h, ks[i], preferred_element_type=jnp.float32)
                  + bs[i] for h in chunks]
            if save_zs and i < n_save:
                for j, z in enumerate(zs):
                    z_refs[i][j * sub:(j + 1) * sub] = z.astype(cd)
            if i < n_layers - 1:
                chunks = [_gelu(z, approx_gelu).astype(cd) for z in zs]
            else:
                chunks = zs
        for j in range(nsplit):
            z = chunks[j]
            if has_ln:
                mu = jnp.mean(z, axis=-1, keepdims=True)
                zc = z - mu
                var = jnp.mean(zc * zc, axis=-1, keepdims=True)
                z = zc * jax.lax.rsqrt(var + _LN_EPS) * ln_s + ln_t
            if has_residual:
                z = z + refs[1][j * sub:(j + 1) * sub].astype(jnp.float32)
            out_ref[j * sub:(j + 1) * sub] = z.astype(out_ref.dtype)

    out_shapes = [jax.ShapeDtypeStruct((n, c_out), x.dtype)]
    out_specs = [pl.BlockSpec((tile, c_out), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    if save_zs:
        for k in kernels[:n_save]:
            d = k.shape[1]
            out_shapes.append(jax.ShapeDtypeStruct((n, d), cd))
            out_specs.append(pl.BlockSpec((tile, d), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=out_specs if save_zs else out_specs[0],
        out_shape=out_shapes if save_zs else out_shapes[0],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)
    if save_zs:
        return outs[0], tuple(outs[1:])
    return outs


def _bwd_pallas(x, g, kernels, biases, ln, *, n_layers, has_ln, approx_gelu,
                cd, interpret, zs_saved=None):
    """zs_saved: optional tuple of per-layer pre-activations from the
    forward (save_zs=True). When given, the recompute GEMMs are skipped —
    layer inputs are reconstructed with a VPU-only GELU."""
    n, c_in = x.shape
    tile = _pick_tile(n, _BWD_TILES)
    c_out = kernels[-1].shape[1]

    args = [x.astype(cd), g]
    in_specs = [
        pl.BlockSpec((tile, c_in), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, c_out), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for k, b in zip(kernels, biases):
        args += [k.astype(cd), b.reshape(1, -1).astype(jnp.float32)]
        in_specs += [_const_spec(k.shape), _const_spec((1, b.shape[0]))]
    if has_ln:
        args += [ln[0].reshape(1, -1).astype(jnp.float32)]
        in_specs += [_const_spec((1, c_out))]
    n_fixed_refs = len(args)
    if zs_saved is not None:
        for z in zs_saved:
            args.append(z)
            in_specs.append(pl.BlockSpec((tile, z.shape[1]),
                                         lambda i: (i, 0),
                                         memory_space=pltpu.VMEM))

    # outputs: dx (tiled) + per-weight f32 accumulators (constant blocks)
    out_shapes = [jax.ShapeDtypeStruct((n, c_in), x.dtype)]
    out_specs = [pl.BlockSpec((tile, c_in), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    for k, b in zip(kernels, biases):
        out_shapes += [jax.ShapeDtypeStruct(k.shape, jnp.float32),
                       jax.ShapeDtypeStruct((1, b.shape[0]), jnp.float32)]
        out_specs += [_const_spec(k.shape), _const_spec((1, b.shape[0]))]
    if has_ln:
        out_shapes += [jax.ShapeDtypeStruct((1, c_out), jnp.float32)] * 2
        out_specs += [_const_spec((1, c_out))] * 2

    n_in_refs = len(args)

    def kernel(*refs):
        ins, outs = refs[:n_in_refs], refs[n_in_refs:]
        dx_ref = outs[0]
        acc_refs = outs[1:]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in acc_refs:
                r[:] = jnp.zeros_like(r)

        ks = [ins[2 + 2 * i][:] for i in range(n_layers)]
        bs = [ins[3 + 2 * i][:] for i in range(n_layers)]

        if zs_saved is not None:
            # saved pre-activations: reconstruct layer inputs VPU-only.
            # Without LN the forward saved only z_0..z_{L-2} (the last z
            # is never read here — dz starts from the cotangent).
            zs = [ins[n_fixed_refs + i][:].astype(jnp.float32)
                  for i in range(len(zs_saved))]
            hs = [ins[0][:]]
            for i in range(n_layers - 1):
                hs.append(_gelu(zs[i], approx_gelu).astype(cd))
        else:
            # recompute forward, keeping layer inputs h + pre-activations z
            hs, zs = [], []
            h = ins[0][:]
            for i in range(n_layers):
                hs.append(h)
                z = (jnp.dot(h, ks[i], preferred_element_type=jnp.float32)
                     + bs[i])
                zs.append(z)
                if i < n_layers - 1:
                    h = _gelu(z, approx_gelu).astype(cd)

        gg = ins[1][:].astype(jnp.float32)
        if has_ln:
            s = ins[2 + 2 * n_layers][:]
            z = zs[-1]
            mu = jnp.mean(z, axis=-1, keepdims=True)
            zc = z - mu
            var = jnp.mean(zc * zc, axis=-1, keepdims=True)
            rstd = jax.lax.rsqrt(var + _LN_EPS)
            xhat = zc * rstd
            dxhat = gg * s
            dz = rstd * (
                dxhat
                - jnp.mean(dxhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
            )
            acc_refs[2 * n_layers][:] += jnp.sum(gg * xhat, axis=0,
                                                 keepdims=True)
            acc_refs[2 * n_layers + 1][:] += jnp.sum(gg, axis=0,
                                                     keepdims=True)
        else:
            dz = gg

        for i in reversed(range(n_layers)):
            dz_c = dz.astype(cd)
            # dW_i = h_i^T @ dz  (contract rows)
            acc_refs[2 * i][:] += jax.lax.dot_general(
                hs[i], dz_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_refs[2 * i + 1][:] += jnp.sum(dz, axis=0, keepdims=True)
            # dh = dz @ W_i^T  (contract W's out axis)
            dh = jax.lax.dot_general(
                dz_c, ks[i], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if i > 0:
                dz = dh * _gelu_grad(zs[i - 1], approx_gelu)
        dx_ref[:] = dh.astype(dx_ref.dtype)

    outs = pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)

    dx = outs[0]
    dks = tuple(outs[1 + 2 * i].astype(kernels[i].dtype)
                for i in range(n_layers))
    dbs = tuple(outs[2 + 2 * i].reshape(-1).astype(biases[i].dtype)
                for i in range(n_layers))
    if has_ln:
        dln = (outs[1 + 2 * n_layers].reshape(-1).astype(ln[0].dtype),
               outs[2 + 2 * n_layers].reshape(-1).astype(ln[1].dtype))
    else:
        dln = None
    return dx, dks, dbs, dln


@functools.lru_cache(maxsize=None)
def _make_fused_ff(n_layers: int, has_ln: bool, approx_gelu: bool,
                   has_residual: bool, cd_name: str, interpret: bool,
                   save_acts: bool = False):
    cd = jnp.dtype(cd_name)
    bkw = dict(n_layers=n_layers, has_ln=has_ln, approx_gelu=approx_gelu,
               cd=cd, interpret=interpret)
    fkw = dict(has_residual=has_residual, **bkw)

    @jax.custom_vjp
    def f(x, kernels, biases, ln, residual):
        return _fwd_pallas(x, kernels, biases, ln, residual, **fkw)

    def f_fwd(x, kernels, biases, ln, residual):
        if save_acts:
            out, zs = _fwd_pallas(x, kernels, biases, ln, residual,
                                  save_zs=True, **fkw)
            return out, (x, kernels, biases, ln, zs)
        return f(x, kernels, biases, ln, residual), (x, kernels, biases,
                                                     ln, None)

    def f_bwd(res, g):
        x, kernels, biases, ln, zs = res
        dx, dks, dbs, dln = _bwd_pallas(x, g, kernels, biases, ln,
                                        zs_saved=zs, **bkw)
        # residual enters the output additively -> its cotangent is g
        dres = g if has_residual else None
        return dx, dks, dbs, dln, dres

    f.defvjp(f_fwd, f_bwd)
    return f


def fused_feedforward(x, kernels, biases, ln=None, residual=None, *,
                      approx_gelu: bool = True,
                      compute_dtype=jnp.bfloat16,
                      interpret: bool = False,
                      save_acts: bool = False):
    """Fused Dense->GELU->...->Dense[->LayerNorm] chain.

    x: (..., C_in). kernels: tuple of (in_i, out_i) f32 arrays with
    matching chain dims. biases: tuple of (out_i,). ln: optional
    (scale, bias) each (C_out,) to apply LayerNorm after the last linear.
    residual: optional (..., C_out) tensor added to the output inside the
    kernel (fuses the FFNO skip connection, saving one HBM round-trip).
    Differentiable (custom VJP, recompute-based backward). Rows are tiled;
    if the flattened row count has no aligned divisor the input is
    zero-padded to a multiple of 256 (padded rows never contribute to
    gradients because their cotangent is zero).

    save_acts=True stores the per-layer pre-activations (in compute_dtype)
    during the forward and skips the backward's recompute GEMMs — trading
    ~1 forward of MXU work for the extra HBM round-trip. Worth it when
    the chain is MXU-bound (the bench FF stack); the stored-bf16
    pre-activations perturb gradients at bf16 rounding level (exact in
    f32), so the default stays the recompute path.
    """
    lead = x.shape[:-1]
    c_in = x.shape[-1]
    c_out = kernels[-1].shape[1]
    n = 1
    for d in lead:
        n *= d
    x2 = x.reshape(n, c_in)
    r2 = residual.reshape(n, c_out) if residual is not None else None
    pad = 0
    if _pick_tile(n) == 0:
        pad = (-n) % 256
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        if r2 is not None:
            r2 = jnp.pad(r2, ((0, pad), (0, 0)))
    f = _make_fused_ff(len(kernels), ln is not None, bool(approx_gelu),
                       residual is not None,
                       jnp.dtype(compute_dtype).name, bool(interpret),
                       bool(save_acts))
    out = f(x2, tuple(kernels), tuple(biases),
            tuple(ln) if ln is not None else None, r2)
    if pad:
        out = out[:n]
    return out.reshape(*lead, c_out)
