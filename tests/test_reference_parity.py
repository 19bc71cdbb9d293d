"""Golden-value parity against the ACTUAL reference implementation.

These tests import the reference's torch modules from /root/reference
(read-only), transplant their weights into our flax models, and require the
forward passes to agree within float32 tolerance — the strongest form of
behavioral parity (SURVEY.md §4). Skipped when the reference checkout is
not present.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF)
    try:
        import torch  # noqa: F401
        from models import spectral_convolution, ffno, fno  # noqa: F401

        yield {
            "spectral_convolution": spectral_convolution,
            "ffno": ffno,
            "fno": fno,
        }
    finally:
        sys.path.remove(REF)


def test_fspectralconv1d_golden(ref_modules, rng):
    """Reference FSpectralConv1d forward == ours with the same weights."""
    import torch
    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.models.ffno import FSpectralConv1d

    d_model, modes, n = 8, 6, 32
    ref = ref_modules["spectral_convolution"].FSpectralConv1d(
        d_model=d_model, modes=modes, factor=2, n_ff_layers=2,
        layer_norm=False, dropout=0.0, mode="full", activation="identity")
    ref.eval()

    x = rng.standard_normal((2, n, d_model)).astype(np.float32)
    with torch.no_grad():
        expected, _ = ref(torch.from_numpy(x))
    expected = expected.numpy()

    mine = FSpectralConv1d(d_model=d_model, n_modes=modes, factor=2,
                           n_ff_layers=2, layer_norm=False, dropout=0.0,
                           mode="full", activation="identity")
    params = mine.init(jax.random.key(0), jnp.asarray(x))

    # transplant weights
    fw = ref.fourier_weight[0].detach().numpy()  # (d, d, modes, 2)
    lin0 = ref.backcast_ff.layers[0][0]
    lin1 = ref.backcast_ff.layers[1][0]
    p = params["params"]
    p["fourier_weight"] = jnp.asarray(fw)
    ff = p["FeedForward_0"]
    ff["WNDense_0"]["TorchLinear_0"]["kernel"] = jnp.asarray(
        lin0.weight.detach().numpy().T)
    ff["WNDense_0"]["TorchLinear_0"]["bias"] = jnp.asarray(
        lin0.bias.detach().numpy())
    ff["WNDense_1"]["TorchLinear_0"]["kernel"] = jnp.asarray(
        lin1.weight.detach().numpy().T)
    ff["WNDense_1"]["TorchLinear_0"]["bias"] = jnp.asarray(
        lin1.bias.detach().numpy())

    got = np.asarray(mine.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_ffno1d_full_model_golden(ref_modules, rng):
    """Full reference FFNO1D forward == ours with transplanted weights."""
    import torch
    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.models import FFNO1D

    kw = dict(width=8, n_layers=2, n_modes=6, factor=2,
              ff_weight_norm=False, n_ff_layers=2, layer_norm=False,
              dropout=0.0, mode="full", activation="identity")
    ref = ref_modules["ffno"].FFNO1D(in_channels=1, out_channels=1, **kw)
    ref.eval()

    n = 32
    x = rng.standard_normal((2, 1, n)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()

    mine = FFNO1D(in_channels=1, out_channels=1, use_grid=False, **kw)
    variables = mine.init(jax.random.key(0), jnp.asarray(x))
    p = variables["params"]

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    p["WNDense_0"]["TorchLinear_0"]["kernel"] = t2j(ref.in_proj.weight).T
    p["WNDense_0"]["TorchLinear_0"]["bias"] = t2j(ref.in_proj.bias)
    p["WNDense_1"]["TorchLinear_0"]["kernel"] = t2j(ref.out_proj.weight).T
    p["WNDense_1"]["TorchLinear_0"]["bias"] = t2j(ref.out_proj.bias)
    for i, layer in enumerate(ref.fourier_layers):
        blk = p[f"FSpectralConv1d_{i}"]
        blk["fourier_weight"] = t2j(layer.fourier_weight[0])
        ff = blk["FeedForward_0"]
        for j in range(2):
            lin = layer.backcast_ff.layers[j][0]
            ff[f"WNDense_{j}"]["TorchLinear_0"]["kernel"] = t2j(lin.weight).T
            ff[f"WNDense_{j}"]["TorchLinear_0"]["bias"] = t2j(lin.bias)

    got = np.asarray(mine.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
    # and at a DIFFERENT resolution with the same weights (the
    # resolution-generalization contract)
    x2 = rng.standard_normal((2, 1, 16)).astype(np.float32)
    with torch.no_grad():
        e2 = ref(torch.from_numpy(x2)).numpy()
    g2 = np.asarray(mine.apply({"params": p}, jnp.asarray(x2)))
    np.testing.assert_allclose(g2, e2, rtol=1e-4, atol=1e-5)


def test_fno1d_full_model_golden(ref_modules, rng):
    import torch
    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.models import FNO1d

    ref = ref_modules["fno"].FNO1d(in_channels=1, out_channels=1, modes=8,
                                   width=8, n_blocks=2)
    ref.eval()
    n = 32
    x = rng.standard_normal((2, 1, n)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()

    mine = FNO1d(in_channels=1, out_channels=1, modes=8, width=8, n_blocks=2)
    variables = mine.init(jax.random.key(0), jnp.asarray(x))
    p = variables["params"]

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    # lifting: torch Conv1d weight (out, in, 1) -> flax Dense (in, out)
    p["TorchLinear_0"]["kernel"] = t2j(ref.lifting.weight)[:, :, 0].T
    p["TorchLinear_0"]["bias"] = t2j(ref.lifting.bias)
    for i, blk in enumerate(ref.fno_blocks):
        mb = p[f"FNOBlock1d_{i}"]
        w = blk.spectral_conv.weights1.detach().numpy()  # complex (in,out,m)
        mb["SpectralConv1dLayer_0"]["weights1"] = jnp.asarray(
            np.stack([w.real, w.imag], axis=-1))
        mb["TorchLinear_0"]["kernel"] = t2j(blk.bypass_conv.weight)[:, :, 0].T
        mb["TorchLinear_0"]["bias"] = t2j(blk.bypass_conv.bias)
    mlp = p["PointwiseMLP_0"]
    mlp["TorchLinear_0"]["kernel"] = t2j(ref.projection.mlp1.weight)[:, :, 0].T
    mlp["TorchLinear_0"]["bias"] = t2j(ref.projection.mlp1.bias)
    mlp["TorchLinear_1"]["kernel"] = t2j(ref.projection.mlp2.weight)[:, :, 0].T
    mlp["TorchLinear_1"]["bias"] = t2j(ref.projection.mlp2.bias)

    got = np.asarray(mine.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_ffno2d_full_model_golden(ref_modules, rng):
    """The flagship: full reference FFNO2D forward == ours (both spectral
    implementations) with transplanted weights, at two resolutions."""
    import torch
    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.models import FFNO2D

    kw = dict(width=8, n_layers=2, n_modes=6, factor=2,
              ff_weight_norm=False, n_ff_layers=2, layer_norm=False,
              dropout=0.0, mode="full")
    ref = ref_modules["ffno"].FFNO2D(in_channels=1, out_channels=1,
                                     use_grid=True, **kw)
    ref.eval()
    n = 16
    x = rng.standard_normal((2, 1, n, n)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    def transplant(mine):
        variables = mine.init(jax.random.key(0), jnp.asarray(x))
        p = variables["params"]
        p["WNDense_0"]["TorchLinear_0"]["kernel"] = t2j(ref.in_proj.weight).T
        p["WNDense_0"]["TorchLinear_0"]["bias"] = t2j(ref.in_proj.bias)
        p["WNDense_1"]["TorchLinear_0"]["kernel"] = t2j(ref.out_proj.weight).T
        p["WNDense_1"]["TorchLinear_0"]["bias"] = t2j(ref.out_proj.bias)
        for i, layer in enumerate(ref.fourier_layers):
            blk = p[f"FSpectralConv2d_{i}"]
            blk["fourier_weight_y"] = t2j(layer.fourier_weight[0])
            blk["fourier_weight_x"] = t2j(layer.fourier_weight[1])
            ff = blk["FeedForward_0"]
            for j in range(2):
                lin = layer.backcast_ff.layers[j][0]
                ff[f"WNDense_{j}"]["TorchLinear_0"]["kernel"] = \
                    t2j(lin.weight).T
                ff[f"WNDense_{j}"]["TorchLinear_0"]["bias"] = t2j(lin.bias)
        return p

    for impl in ("fft", "dft"):
        mine = FFNO2D(in_channels=1, out_channels=1, use_grid=True,
                      spectral_impl=impl, **kw)
        p = transplant(mine)
        got = np.asarray(mine.apply({"params": p}, jnp.asarray(x)))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5,
                                   err_msg=impl)

    # resolution generalization parity at n=24
    x2 = rng.standard_normal((2, 1, 24, 24)).astype(np.float32)
    with torch.no_grad():
        e2 = ref(torch.from_numpy(x2)).numpy()
    mine = FFNO2D(in_channels=1, out_channels=1, use_grid=True, **kw)
    p = transplant(mine)
    g2 = np.asarray(mine.apply({"params": p}, jnp.asarray(x2)))
    np.testing.assert_allclose(g2, e2, rtol=1e-4, atol=1e-5)


def test_relative_l2_golden(ref_modules, rng):
    """Our loss == the reference RelativeL2Loss for every reduction."""
    import torch
    sys.path.insert(0, REF)
    try:
        from utils.loss import RelativeL2Loss
    finally:
        sys.path.remove(REF)
    import jax.numpy as jnp
    from resolution_pde_tpu.ops import relative_l2

    x = rng.standard_normal((4, 1, 32)).astype(np.float32)
    y = rng.standard_normal((4, 1, 32)).astype(np.float32)
    for size_average, red in ((True, "mean"), (False, "sum")):
        ref_loss = RelativeL2Loss(size_average=size_average)(
            torch.from_numpy(x), torch.from_numpy(y)).item()
        ours = float(relative_l2(jnp.asarray(x), jnp.asarray(y),
                                 reduction=red))
        np.testing.assert_allclose(ours, ref_loss, rtol=1e-5)


def test_training_dynamics_parity(ref_modules, rng):
    """Five AdamW steps from identical weights on identical batches: the
    per-step loss trajectories of the reference (torch AdamW +
    RelativeL2Loss, main_1d.py:144 semantics) and our Trainer must track."""
    import torch
    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.models import FFNO1D
    from resolution_pde_tpu.train import Trainer

    sys.path.insert(0, REF)
    try:
        from utils.loss import RelativeL2Loss
    finally:
        sys.path.remove(REF)

    kw = dict(width=8, n_layers=1, n_modes=6, factor=2,
              ff_weight_norm=False, n_ff_layers=2, layer_norm=False,
              dropout=0.0, mode="full", activation="identity")
    ref = ref_modules["ffno"].FFNO1D(in_channels=1, out_channels=1, **kw)
    ref.train()

    n = 32
    x = rng.standard_normal((8, 1, n)).astype(np.float32)
    y = np.roll(x, 3, axis=-1)

    mine = FFNO1D(in_channels=1, out_channels=1, use_grid=False, **kw)
    trainer = Trainer(mine, learning_rate=1e-3, weight_decay=1e-4)
    state = trainer.init(x[:2])
    p = dict(state.params)

    def t2j(t):
        # COPY: tensor.numpy() is a view of torch storage and jnp.asarray
        # is zero-copy on CPU — without the copy, torch's in-place
        # optimizer updates would mutate the transplanted jax weights
        return jnp.asarray(np.array(t.detach().numpy(), copy=True))

    p["WNDense_0"] = {"TorchLinear_0": {
        "kernel": t2j(ref.in_proj.weight).T, "bias": t2j(ref.in_proj.bias)}}
    p["WNDense_1"] = {"TorchLinear_0": {
        "kernel": t2j(ref.out_proj.weight).T, "bias": t2j(ref.out_proj.bias)}}
    layer = ref.fourier_layers[0]
    ff = {}
    for j in range(2):
        lin = layer.backcast_ff.layers[j][0]
        ff[f"WNDense_{j}"] = {"TorchLinear_0": {
            "kernel": t2j(lin.weight).T, "bias": t2j(lin.bias)}}
    p["FSpectralConv1d_0"] = {
        "fourier_weight": t2j(layer.fourier_weight[0]),
        "FeedForward_0": ff,
    }
    state = state.replace(params=p,
                          opt_state=trainer.optimizer.init(p))

    opt = torch.optim.AdamW(ref.parameters(), lr=1e-3, weight_decay=1e-4)
    loss_fn = RelativeL2Loss(size_average=True)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)

    ref_losses, my_losses = [], []
    for _ in range(5):
        opt.zero_grad()
        loss = loss_fn(ref(xt), yt)
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

        state, l = trainer._train_step(state, jnp.asarray(x),
                                       jnp.asarray(y), None)
        my_losses.append(float(l))

    np.testing.assert_allclose(my_losses, ref_losses, rtol=2e-4,
                               err_msg=f"{my_losses} vs {ref_losses}")


def test_cno1d_full_model_golden(rng):
    """Full reference CNO1d (torch bicubic-antialias activations) == ours
    with transplanted conv weights (use_bn=False isolates the architecture
    from BN state)."""
    import torch
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    try:
        from models.CNO1d import CNO1d as RefCNO1d
    finally:
        sys.path.remove(REF)
    from resolution_pde_tpu.models.cno import CNO1d

    size, nl, nres, nneck, cm = 32, 2, 1, 1, 8
    ref = RefCNO1d(in_dim=1, out_dim=1, size=size, N_layers=nl, N_res=nres,
                   N_res_neck=nneck, channel_multiplier=cm, use_bn=False)
    ref.eval()

    mine = CNO1d(in_dim=1, out_dim=1, size=size, N_layers=nl, N_res=nres,
                 N_res_neck=nneck, channel_multiplier=cm, use_bn=False)
    x = rng.standard_normal((2, 1, size)).astype(np.float32)
    variables = mine.init(jax.random.key(0), jnp.asarray(x))
    p = variables["params"]["_CNO_0"]

    def conv(mod):
        w = mod.weight.detach().numpy()  # (out, in, k)
        return {"kernel": jnp.asarray(np.ascontiguousarray(
                    w.transpose(2, 1, 0))),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    # lift / project
    p["LiftProjectBlock_0"]["CNOBlock_0"]["Conv_0"] = conv(
        ref.lift.inter_CNOBlock.convolution)
    p["LiftProjectBlock_0"]["Conv_0"] = conv(ref.lift.convolution)
    p["LiftProjectBlock_1"]["CNOBlock_0"]["Conv_0"] = conv(
        ref.project.inter_CNOBlock.convolution)
    p["LiftProjectBlock_1"]["Conv_0"] = conv(ref.project.convolution)

    # residual blocks: per-level then neck (call order matches)
    res_idx = 0
    for level in range(nl):
        for k in range(nres):
            rb = ref.res_nets[level].res_nets[k]
            p[f"ResidualBlock_{res_idx}"]["Conv_0"] = conv(rb.convolution1)
            p[f"ResidualBlock_{res_idx}"]["Conv_1"] = conv(rb.convolution2)
            res_idx += 1
    for k in range(nneck):
        rb = ref.res_net_neck.res_nets[k]
        p[f"ResidualBlock_{res_idx}"]["Conv_0"] = conv(rb.convolution1)
        p[f"ResidualBlock_{res_idx}"]["Conv_1"] = conv(rb.convolution2)
        res_idx += 1

    # encoder blocks CNOBlock_0..nl-1; decoder interleaves ed_expansion
    # per the forward order: ed(nl), dec0, ed(nl-1), dec1, ..., ed(0)
    p["CNOBlock_0"]["Conv_0"] = conv(ref.encoder[0].convolution)
    p["CNOBlock_1"]["Conv_0"] = conv(ref.encoder[1].convolution)
    p["CNOBlock_2"]["Conv_0"] = conv(ref.ED_expansion[2].convolution)
    p["CNOBlock_3"]["Conv_0"] = conv(ref.decoder[0].convolution)
    p["CNOBlock_4"]["Conv_0"] = conv(ref.ED_expansion[1].convolution)
    p["CNOBlock_5"]["Conv_0"] = conv(ref.decoder[1].convolution)
    p["CNOBlock_6"]["Conv_0"] = conv(ref.ED_expansion[0].convolution)

    import torch as _t
    with _t.no_grad():
        expected = ref(_t.from_numpy(x)).numpy()
    got = np.asarray(mine.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_fno2d_full_model_golden(ref_modules, rng):
    """Full reference FNO2d == ours: exercises the 2D two-corner spectral
    weights (models/spectral_convolution.py:85-97) end to end."""
    import torch
    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.models import FNO2d

    ref = ref_modules["fno"].FNO2d(in_channels=1, out_channels=1, modes1=5,
                                   modes2=5, width=8, n_blocks=2)
    ref.eval()
    n = 16
    x = rng.standard_normal((2, 1, n, n)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()

    mine = FNO2d(in_channels=1, out_channels=1, modes1=5, modes2=5,
                 width=8, n_blocks=2)
    variables = mine.init(jax.random.key(0), jnp.asarray(x))
    p = variables["params"]

    def t2j(t):
        return jnp.asarray(np.array(t.detach().numpy(), copy=True))

    def conv1x1(mod):
        w = mod.weight.detach().numpy()[:, :, 0, 0]
        return {"kernel": jnp.asarray(np.ascontiguousarray(w.T)),
                "bias": t2j(mod.bias)}

    p["TorchLinear_0"] = conv1x1(ref.lifting)
    for i, blk in enumerate(ref.fno_blocks):
        w1 = blk.spectral_conv.weights1.detach().numpy()
        w2 = blk.spectral_conv.weights2.detach().numpy()
        p[f"FNOBlock2d_{i}"]["SpectralConv2dLayer_0"] = {
            "weights1": jnp.asarray(np.stack([w1.real, w1.imag], -1)),
            "weights2": jnp.asarray(np.stack([w2.real, w2.imag], -1)),
        }
        p[f"FNOBlock2d_{i}"]["TorchLinear_0"] = conv1x1(blk.bypass_conv)
    p["PointwiseMLP_0"] = {
        "TorchLinear_0": conv1x1(ref.projection.mlp1),
        "TorchLinear_1": conv1x1(ref.projection.mlp2),
    }
    got = np.asarray(mine.apply({"params": p}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_unet1d_full_model_golden(rng):
    """Reference models/unet.py:7-108 UNet1d -> our UNet1d via the library
    importer (utils.torch_import.import_unet1d): convs, BN affine +
    running stats, flipped transposed convs, head."""
    import torch

    sys.path.insert(0, REF)
    try:
        from models import unet as ref_unet
    finally:
        sys.path.remove(REF)

    torch.manual_seed(0)
    ref = ref_unet.UNet1d(in_channels=1, out_channels=1, width=4)
    # give the BN running stats non-trivial values
    with torch.no_grad():
        ref.train()
        ref(torch.randn(8, 1, 32))
        ref.eval()

    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.models.unet import UNet1d
    from resolution_pde_tpu.utils.torch_import import import_unet1d

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = import_unet1d(sd)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    ours = UNet1d(in_channels=1, out_channels=1, width=4)
    x = rng.standard_normal((2, 1, 32)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.tensor(x)).numpy()
    y = ours.apply(variables, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)


def test_ffno1d_parity_across_resolutions_32_to_1024(ref_modules, rng):
    """North-star acceptance (BASELINE.json:5): rel-L2 parity within 1e-4 at
    EVERY eval resolution in [32..1024] with one transplanted weight set —
    the effective-mode slicing must track the reference's
    (models/spectral_convolution.py:183-196) at each grid size."""
    import torch
    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.models import FFNO1D

    kw = dict(width=8, n_layers=2, n_modes=16, factor=2,
              ff_weight_norm=False, n_ff_layers=2, layer_norm=False,
              dropout=0.0, mode="full", activation="identity")
    ref = ref_modules["ffno"].FFNO1D(in_channels=1, out_channels=1, **kw)
    ref.eval()

    mine = FFNO1D(in_channels=1, out_channels=1, use_grid=False, **kw)
    x0 = rng.standard_normal((2, 1, 32)).astype(np.float32)
    p = mine.init(jax.random.key(0), jnp.asarray(x0))["params"]

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    p["WNDense_0"]["TorchLinear_0"]["kernel"] = t2j(ref.in_proj.weight).T
    p["WNDense_0"]["TorchLinear_0"]["bias"] = t2j(ref.in_proj.bias)
    p["WNDense_1"]["TorchLinear_0"]["kernel"] = t2j(ref.out_proj.weight).T
    p["WNDense_1"]["TorchLinear_0"]["bias"] = t2j(ref.out_proj.bias)
    for i, layer in enumerate(ref.fourier_layers):
        blk = p[f"FSpectralConv1d_{i}"]
        blk["fourier_weight"] = t2j(layer.fourier_weight[0])
        ff = blk["FeedForward_0"]
        for j in range(2):
            lin = layer.backcast_ff.layers[j][0]
            ff[f"WNDense_{j}"]["TorchLinear_0"]["kernel"] = t2j(lin.weight).T
            ff[f"WNDense_{j}"]["TorchLinear_0"]["bias"] = t2j(lin.bias)

    fwd = jax.jit(lambda x: mine.apply({"params": p}, x))
    for res in (32, 64, 128, 256, 512, 1024):
        x = rng.standard_normal((2, 1, res)).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x)).numpy()
        got = np.asarray(fwd(jnp.asarray(x)))
        rel_l2 = (np.linalg.norm(got - expected)
                  / (np.linalg.norm(expected) + 1e-8))
        assert rel_l2 < 1e-4, f"res {res}: rel-L2 {rel_l2:.2e}"


def test_s4d_module_golden(rng):
    """Full reference S4D module (models/s4d.py:84-129: diagonal kernel ->
    FFT conv -> D skip -> GELU -> Conv1d+GLU) == our S4D with transplanted
    weights."""
    import torch
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    try:
        from models.s4d import S4D as RefS4D
    finally:
        sys.path.remove(REF)
    from resolution_pde_tpu.models.s4 import S4D

    h, n, L = 8, 8, 24
    ref = RefS4D(d_model=h, d_state=n, dropout=0.0, transposed=True)
    ref.eval()
    x = rng.standard_normal((2, h, L)).astype(np.float32)
    with torch.no_grad():
        expected, _ = ref(torch.from_numpy(x))
    expected = expected.numpy()  # (B, H, L)

    mine = S4D(d_model=h, d_state=n, dropout=0.0)
    xl = jnp.asarray(np.moveaxis(x, 1, 2))  # channels-last (B, L, H)
    p = mine.init(jax.random.key(0), xl)["params"]

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    kern = p["FFTConvLayer_0"]["S4DKernelLayer_0"]
    kern["log_dt"] = t2j(ref.kernel.log_dt)
    kern["log_A_real"] = t2j(ref.kernel.log_A_real)
    kern["A_imag"] = t2j(ref.kernel.A_imag)
    kern["C"] = t2j(ref.kernel.C)[None]  # add channels dim
    p["FFTConvLayer_0"]["D"] = t2j(ref.D)[None]
    conv1d = ref.output_linear[0]
    p["Dense_0"]["kernel"] = t2j(conv1d.weight)[:, :, 0].T
    p["Dense_0"]["bias"] = t2j(conv1d.bias)

    got = np.asarray(mine.apply({"params": p}, xl))  # (B, L, H)
    np.testing.assert_allclose(np.moveaxis(got, 1, 2), expected,
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# S4 (DPLR) golden transplants — the hardest numerics in the reference
# (SSMKernelDPLR, models/s4.py:1234-1447), verified against the actual
# torch module on the cauchy_naive CPU path (VERDICT r2 item #2).
# ---------------------------------------------------------------------------

def _import_ref_s4():
    """Import the reference models/s4.py with a pytorch_lightning stub (it
    only uses rank_zero_only, a logging decorator)."""
    import types

    added = []
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        plu = types.ModuleType("pytorch_lightning.utilities")
        plu.rank_zero_only = lambda fn: fn
        pl.utilities = plu
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.utilities"] = plu
        added = ["pytorch_lightning", "pytorch_lightning.utilities"]
    sys.path.insert(0, REF)
    try:
        from models import s4 as ref_s4
    finally:
        sys.path.remove(REF)
        for m in added:
            sys.modules.pop(m, None)
    return ref_s4


def _transplant_dplr_kernel(ref_kernel, sub):
    """Map a reference SSMKernelDPLR's parameters (N/2 conjugate-pair
    storage, models/s4.py:1290-1346) onto a DPLRKernelLayer param subtree
    (full-N spectrum with explicit conjugate pairs).

    Mapping (derived from cauchy_naive's internal _conj expansion,
    s4.py:159-168): Lambda/P/B -> concat with conjugates; the stored C is
    C-tilde, ours is conj(C-tilde) on the first half. dt_transform='exp' and
    dt_tie=True give log_dt = inv_dt[:, 0]. Handles n_ssm tying (stores at
    S rows when the target subtree is tied, repeats to H otherwise) and
    rank >= 1 low-rank corrections. The reference module must have run
    forward() once so _setup_C has attuned C to the kernel length."""
    import jax.numpy as jnp

    def c(t):
        t = t.detach().numpy()
        return t[..., 0] + 1j * t[..., 1]

    assert ref_kernel.real_transform == "exp"
    assert ref_kernel.imag_transform == "none"
    A = (-np.exp(ref_kernel.A_real.detach().numpy())
         - 1j * ref_kernel.A_imag.detach().numpy())  # (S, N)
    B = c(ref_kernel.B)[0]        # (S, N)
    P = c(ref_kernel.P)           # (R, S, N)
    Ct = c(ref_kernel.C)          # (channels, H, N) — C-tilde after setup
    s_target = np.asarray(sub["Lambda_log_neg_re"]).shape[0]
    if s_target != A.shape[0]:    # target is untied: TILE S -> H
        # (einops '(v t)' ordering: feature h uses copy h mod S)
        rep = s_target // A.shape[0]
        A = np.tile(A, (rep, 1))
        B = np.tile(B, (rep, 1))
        P = np.tile(P, (1, rep, 1))

    def full(z):
        return np.concatenate([z, np.conj(z)], axis=-1)

    lam = full(A)
    p_full = full(P)              # (R, S, 2N)
    if np.asarray(sub["P_vec"]).ndim == 3:  # rank-1 historical layout
        assert p_full.shape[0] == 1
        p_full = p_full[0]
    ct_full = np.concatenate([np.conj(Ct), Ct], axis=-1)
    sub = dict(sub)
    inv_dt = ref_kernel.inv_dt.detach().numpy()  # (H, 1) or (H, N/2)
    sub["log_dt"] = jnp.asarray(
        inv_dt[:, 0] if ref_kernel.dt_tie else inv_dt, jnp.float32)
    sub["Lambda_log_neg_re"] = jnp.asarray(
        np.log(np.maximum(-lam.real, 1e-4)), jnp.float32)
    sub["Lambda_im"] = jnp.asarray(lam.imag, jnp.float32)
    sub["P_vec"] = jnp.asarray(
        np.stack([p_full.real, p_full.imag], -1), jnp.float32)
    sub["B_vec"] = jnp.asarray(
        np.stack([full(B).real, full(B).imag], -1), jnp.float32)
    sub["C"] = jnp.asarray(
        np.stack([ct_full.real, ct_full.imag], -1), jnp.float32)
    return sub


def test_dplr_kernel_golden(rng):
    """Reference SSMKernelDPLR.forward (models/s4.py:1343-1447, cauchy_naive
    path) == DPLRKernelLayer with transplanted parameters."""
    import torch
    import jax
    import jax.numpy as jnp

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.models.s4 import DPLRKernelLayer

    torch.manual_seed(0)
    h, n_ref, L = 4, 4, 16
    ref = ref_s4.SSMKernelDPLR(d_model=h, d_state=2 * n_ref, l_max=L,
                               verbose=False)
    with torch.no_grad():
        k_ref, _ = ref.forward(L=L)  # triggers _setup_C
    k_ref = k_ref.detach().numpy()  # (1, H, L)

    layer = DPLRKernelLayer(d_model=h, d_state=2 * n_ref, channels=1)
    params = jax.jit(layer.init, static_argnums=1)(jax.random.key(0), L)
    sub = _transplant_dplr_kernel(ref, params["params"])
    k_mine = np.asarray(
        jax.jit(lambda p: layer.apply({"params": p}, L))(sub))
    np.testing.assert_allclose(k_mine, k_ref, rtol=1e-4, atol=1e-6)


def _transplant_fftconv(ref_fc, sub):
    """Map a reference FFTConv (models/s4.py:1649-1784) onto our
    FFTConvLayer params: DPLR kernel + D skip."""
    import jax.numpy as jnp

    sub = dict(sub)
    sub["DPLRKernelLayer_0"] = _transplant_dplr_kernel(
        ref_fc.kernel, sub["DPLRKernelLayer_0"])
    sub["D"] = jnp.asarray(ref_fc.D.detach().numpy())
    return sub


def test_fftconv_dplr_golden(rng):
    """Reference FFTConv (dplr mode) forward == FFTConvLayer, both
    unidirectional and bidirectional (incl. the deliberate off-by-one in
    the reversed kernel, models/s4.py:1737-1744)."""
    import torch
    import jax
    import jax.numpy as jnp

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.models.s4 import FFTConvLayer

    h, n_ref, L = 4, 4, 16
    for bidir in (False, True):
        torch.manual_seed(1)
        ref = ref_s4.FFTConv(d_model=h, d_state=2 * n_ref, l_max=L,
                             mode="dplr", bidirectional=bidir,
                             transposed=False, verbose=False)
        ref.eval()
        x = rng.standard_normal((2, L, h)).astype(np.float32)
        with torch.no_grad():
            expected, _ = ref(torch.from_numpy(x))
        expected = expected.numpy()  # (B, L, H)

        mine = FFTConvLayer(d_model=h, d_state=2 * n_ref, mode="dplr",
                            bidirectional=bidir)
        xl = jnp.asarray(x)
        p = mine.init(jax.random.key(0), xl)["params"]
        p = _transplant_fftconv(ref, p)
        got = np.asarray(mine.apply({"params": p}, xl))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5,
                                   err_msg=f"bidirectional={bidir}")


def test_s4block_dplr_golden(rng):
    """Reference S4Block (models/s4.py:1838-1999, default gate/bottleneck
    off, final_act='glu') == our S4Block with transplanted weights."""
    import torch
    import jax
    import jax.numpy as jnp

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.models.s4 import S4Block

    torch.manual_seed(2)
    h, n_ref, L = 4, 4, 16
    ref = ref_s4.S4Block(d_model=h, d_state=2 * n_ref, l_max=L,
                         transposed=False, bidirectional=True,
                         verbose=False)
    ref.eval()
    x = rng.standard_normal((2, L, h)).astype(np.float32)
    with torch.no_grad():
        expected, _ = ref(torch.from_numpy(x))
    expected = expected.numpy()

    mine = S4Block(d_model=h, d_state=2 * n_ref, mode="dplr",
                   bidirectional=True)
    xl = jnp.asarray(x)
    p = mine.init(jax.random.key(0), xl)["params"]
    p = dict(p)
    p["FFTConvLayer_0"] = _transplant_fftconv(ref.layer,
                                              p["FFTConvLayer_0"])
    out_lin = ref.output_linear[0] if hasattr(
        ref.output_linear, "__getitem__") else ref.output_linear
    p["Dense_0"] = {
        "kernel": jnp.asarray(out_lin.weight.detach().numpy()).T,
        "bias": jnp.asarray(out_lin.bias.detach().numpy()),
    }
    got = np.asarray(mine.apply({"params": p}, xl))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_s4model_dplr_golden(rng):
    """Reference S4Model end-to-end (models/s4_1d.py:7-185: grid concat,
    encoder, bidirectional S4Blocks with the discarded post-norm,
    decoder) == our S4Model with transplanted weights."""
    import torch
    import jax
    import jax.numpy as jnp

    ref_s4 = _import_ref_s4()
    sys.path.insert(0, REF)
    try:
        from models.s4_1d import S4Model as RefS4Model
    finally:
        sys.path.remove(REF)
    from resolution_pde_tpu.models.s4 import S4Model

    torch.manual_seed(3)
    h, L, n_layers = 8, 16, 2
    ref = RefS4Model(d_input=1, d_output=1, d_model=h, n_layers=n_layers,
                     dropout=0.0, prenorm=False)
    ref.eval()
    x = rng.standard_normal((2, 1, L)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()  # (B, 1, L)

    mine = S4Model(d_input=1, d_output=1, d_model=h, n_layers=n_layers,
                   dropout=0.0, prenorm=False, mode="dplr")
    xj = jnp.asarray(x)
    p = mine.init(jax.random.key(0), xj)["params"]
    p = dict(p)

    def lin(mod):
        return {"kernel": jnp.asarray(mod.weight.detach().numpy()).T,
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    p["Dense_0"] = lin(ref.encoder)
    p["Dense_1"] = lin(ref.decoder)
    for i, blk in enumerate(ref.s4_layers):
        sub = dict(p[f"S4Block_{i}"])
        sub["FFTConvLayer_0"] = _transplant_fftconv(
            blk.layer, sub["FFTConvLayer_0"])
        out_lin = blk.output_linear[0] if hasattr(
            blk.output_linear, "__getitem__") else blk.output_linear
        sub["Dense_0"] = lin(out_lin)
        p[f"S4Block_{i}"] = sub

    got = np.asarray(jax.jit(
        lambda pp, xx: mine.apply({"params": pp}, xx))(p, xj))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def _transplant_diag_kernel(ref_kernel, sub):
    """Map a reference SSMKernelDiag (models/s4.py:987-1189) onto an
    S4DKernelLayer subtree. The reference's separate B parameter is folded
    into C (the kernel only ever uses the product B*C, s4.py:1143); the
    recurrent state then differs by a diagonal rescale that cancels in y
    (PARITY.md). A_imag is stored negated with the 'none' transform
    (historical signed storage); any other imag_transform stores the
    reference value verbatim (both sides resolve -param_transform).
    Handles dt_tie=False ((H, N) inv_dt copied whole), dt_fast /
    dt_transform (stored parameterization is identical on both sides),
    is_real (real folded B*C, no A_imag), and bandlimit (masking happens
    at resolve on both sides, so parameters transplant unchanged)."""
    import jax.numpy as jnp

    def c(t):
        t = t.detach().numpy()
        return t[..., 0] + 1j * t[..., 1]

    s_target = np.asarray(sub["log_A_real"]).shape[0]
    a_real = ref_kernel.A_real.detach().numpy()     # (S, N) stored
    if ref_kernel.is_real:
        B = ref_kernel.B.detach().numpy()[0]         # (S, N) real
        C = ref_kernel.C.detach().numpy()            # (channels, H, N)
    else:
        a_imag_stored = ref_kernel.A_imag.detach().numpy()
        B = c(ref_kernel.B)[0]                       # (S, N)
        C = c(ref_kernel.C)                          # (channels, H, N)
    rep_h = C.shape[1] // B.shape[0]
    BC = np.tile(B, (rep_h, 1))[None] * C            # (channels, H, N)
    if s_target != a_real.shape[0]:
        rep = s_target // a_real.shape[0]
        a_real = np.tile(a_real, (rep, 1))
        if not ref_kernel.is_real:
            a_imag_stored = np.tile(a_imag_stored, (rep, 1))
    sub = dict(sub)
    inv_dt = ref_kernel.inv_dt.detach().numpy()      # (H, 1) or (H, N)
    sub["log_dt"] = jnp.asarray(
        inv_dt[:, 0] if ref_kernel.dt_tie else inv_dt, jnp.float32)
    sub["log_A_real"] = jnp.asarray(a_real, jnp.float32)
    if ref_kernel.is_real:
        sub["C"] = jnp.asarray(BC, jnp.float32)
    else:
        sub["A_imag"] = jnp.asarray(
            -a_imag_stored if ref_kernel.imag_transform == "none"
            else a_imag_stored, jnp.float32)
        sub["C"] = jnp.asarray(np.stack([BC.real, BC.imag], -1), jnp.float32)
    return sub


@pytest.mark.parametrize("disc", ["zoh", "bilinear", "dss"])
def test_diag_kernel_disc_golden(disc, rng):
    """Reference SSMKernelDiag with each discretization (zoh / bilinear /
    dss, models/s4.py:1149-1178) == S4DKernelLayer(disc=...) with
    transplanted parameters (B folded into C)."""
    import torch
    import jax
    import jax.numpy as jnp

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.models.s4 import S4DKernelLayer

    torch.manual_seed(4)
    h, n_ref, L = 4, 4, 12
    ref = ref_s4.SSMKernelDiag(d_model=h, d_state=2 * n_ref, l_max=L,
                               disc=disc, verbose=False)
    with torch.no_grad():
        k_ref, _ = ref.forward(L=L)
    k_ref = k_ref.detach().numpy()  # (1, H, L)

    layer = S4DKernelLayer(d_model=h, d_state=2 * n_ref, channels=1,
                           disc=disc)
    params = jax.jit(layer.init, static_argnums=1)(jax.random.key(0), L)
    sub = _transplant_diag_kernel(ref, params["params"])
    k_mine = np.asarray(
        jax.jit(lambda p: layer.apply({"params": p}, L))(sub))
    np.testing.assert_allclose(k_mine, k_ref, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mode", ["diag", "dplr"])
def test_kernel_n_ssm_tying_golden(mode, rng):
    """n_ssm < H parameter tying (models/s4.py:1060-1064 repeat): reference
    kernels with n_ssm=2, H=4 == ours with the same tied storage."""
    import torch
    import jax
    import jax.numpy as jnp

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.models.s4 import (DPLRKernelLayer,
                                              S4DKernelLayer)

    torch.manual_seed(5)
    h, n_ref, L, n_ssm = 4, 4, 12, 2
    if mode == "diag":
        ref = ref_s4.SSMKernelDiag(d_model=h, d_state=2 * n_ref, l_max=L,
                                   n_ssm=n_ssm, verbose=False)
    else:
        ref = ref_s4.SSMKernelDPLR(d_model=h, d_state=2 * n_ref, l_max=L,
                                   n_ssm=n_ssm, verbose=False)
    with torch.no_grad():
        # the legs init makes all tied copies IDENTICAL, which would hide
        # a wrong copy->feature mapping (the reference TILES: feature h
        # uses copy h mod S, einops '(v t)'); perturb per-copy so the
        # mapping is actually discriminated
        ref.A_real += 0.1 * torch.randn_like(ref.A_real)
        ref.A_imag += 0.1 * torch.randn_like(ref.A_imag)
        ref.B += 0.1 * torch.randn_like(ref.B)
        if mode == "dplr":
            ref.P += 0.1 * torch.randn_like(ref.P)
        k_ref, _ = ref.forward(L=L)
    k_ref = k_ref.detach().numpy()
    assert ref.A_real.shape[0] == n_ssm  # tying actually active

    if mode == "diag":
        layer = S4DKernelLayer(d_model=h, d_state=2 * n_ref, channels=1,
                               n_ssm=n_ssm)
    else:
        layer = DPLRKernelLayer(d_model=h, d_state=2 * n_ref, channels=1,
                                n_ssm=n_ssm)
    params = jax.jit(layer.init, static_argnums=1)(jax.random.key(0), L)
    transplant = (_transplant_diag_kernel if mode == "diag"
                  else _transplant_dplr_kernel)
    sub = transplant(ref, params["params"])
    assert np.asarray(sub["Lambda_log_neg_re" if mode == "dplr"
                          else "log_A_real"]).shape[0] == n_ssm
    k_mine = np.asarray(
        jax.jit(lambda p: layer.apply({"params": p}, L))(sub))
    np.testing.assert_allclose(k_mine, k_ref, rtol=1e-4, atol=1e-6)


def test_dplr_kernel_rank2_golden(rng):
    """Rank-2 low-rank correction (the general Woodbury branch,
    models/s4.py:1412-1422): reference SSMKernelDPLR(rank=2) ==
    DPLRKernelLayer(rank=2) with transplanted parameters."""
    import torch
    import jax
    import jax.numpy as jnp

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.models.s4 import DPLRKernelLayer

    torch.manual_seed(6)
    h, n_ref, L = 4, 4, 12
    ref = ref_s4.SSMKernelDPLR(d_model=h, d_state=2 * n_ref, l_max=L,
                               rank=2, verbose=False)
    # make the second rank row non-trivial (legs init zero-pads it)
    with torch.no_grad():
        ref.P[1] += 0.3 * torch.randn_like(ref.P[1])
        k_ref, _ = ref.forward(L=L)
    k_ref = k_ref.detach().numpy()

    layer = DPLRKernelLayer(d_model=h, d_state=2 * n_ref, channels=1,
                            rank=2)
    params = jax.jit(layer.init, static_argnums=1)(jax.random.key(0), L)
    assert np.asarray(params["params"]["P_vec"]).shape[0] == 2
    sub = _transplant_dplr_kernel(ref, params["params"])
    k_mine = np.asarray(
        jax.jit(lambda p: layer.apply({"params": p}, L))(sub))
    np.testing.assert_allclose(k_mine, k_ref, rtol=1e-4, atol=1e-6)


def test_fftconv_diag_golden(rng):
    """Reference FFTConv(mode='diag') — the SSMKernelDiag path with its
    separate B parameter — == FFTConvLayer(mode='diag') with B folded into
    C (PARITY.md #18)."""
    import torch
    import jax
    import jax.numpy as jnp

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.models.s4 import FFTConvLayer

    torch.manual_seed(8)
    h, n_ref, L = 4, 4, 16
    ref = ref_s4.FFTConv(d_model=h, d_state=2 * n_ref, l_max=L,
                         mode="diag", transposed=False, verbose=False)
    ref.eval()
    x = rng.standard_normal((2, L, h)).astype(np.float32)
    with torch.no_grad():
        expected, _ = ref(torch.from_numpy(x))
    expected = expected.numpy()

    mine = FFTConvLayer(d_model=h, d_state=2 * n_ref, mode="diag")
    xl = jnp.asarray(x)
    p = dict(mine.init(jax.random.key(0), xl)["params"])
    p["S4DKernelLayer_0"] = _transplant_diag_kernel(
        ref.kernel, p["S4DKernelLayer_0"])
    p["D"] = jnp.asarray(ref.D.detach().numpy())
    got = np.asarray(mine.apply({"params": p}, xl))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_s4nd_dplr_golden(rng):
    """Reference S4ND (models/s4nd.py:1815-2100, default mode='dplr',
    linear=True, bidirectional): per-axis DPLR kernels, frequency-domain
    outer product, 2D FFT conv, D skip == S4ND2dLayer(mode='dplr',
    linear=True) with transplanted per-axis kernels. Non-square grid to
    pin the axis ordering."""
    import types

    import torch
    import jax
    import jax.numpy as jnp

    _import_ref_s4()  # installs the pytorch_lightning stub if needed
    added = []
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        plu = types.ModuleType("pytorch_lightning.utilities")
        plu.rank_zero_only = lambda fn: fn
        pl.utilities = plu
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.utilities"] = plu
        added = ["pytorch_lightning", "pytorch_lightning.utilities"]
    sys.path.insert(0, REF)
    try:
        from models.s4nd import S4ND as RefS4ND
    finally:
        sys.path.remove(REF)
        for m in added:
            sys.modules.pop(m, None)
    from resolution_pde_tpu.models.s4 import S4ND2dLayer

    torch.manual_seed(7)
    h, n_ref, H, W = 3, 4, 8, 12
    ref = RefS4ND(d_model=h, d_state=2 * n_ref, dim=2, transposed=False,
                  bidirectional=True, verbose=False)
    ref.eval()
    x = rng.standard_normal((2, H, W, h)).astype(np.float32)
    with torch.no_grad():
        expected, _ = ref(torch.from_numpy(x))  # attunes both kernels
    expected = expected.numpy()  # (B, H, W, h)

    mine = S4ND2dLayer(d_model=h, d_state=2 * n_ref, bidirectional=True,
                       mode="dplr", linear=True)
    xl = jnp.asarray(x)
    p = dict(mine.init(jax.random.key(0), xl)["params"])
    # axis 0 kernel convolves H (our kernel_x), axis 1 convolves W
    p["kernel_x"] = _transplant_dplr_kernel(ref.kernel[0], p["kernel_x"])
    p["kernel_y"] = _transplant_dplr_kernel(ref.kernel[1], p["kernel_y"])
    p["D"] = jnp.asarray(ref.D.detach().numpy()[0])
    got = np.asarray(mine.apply({"params": p}, xl))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_linear_attention_golden(rng):
    """Reference LinearAttention ('l1' linear attention, mgpt.py:31-90)
    == ours with transplanted weights, both self- and cross-attention."""
    import types

    import torch
    import jax
    import jax.numpy as jnp

    # the reference module imports dgl at top level (graph paths only,
    # unused by LinearAttention); stub it — dgl is not installed here
    dgl_stub = types.ModuleType("dgl")
    dgl_stub.function = types.ModuleType("dgl.function")
    added = [m for m in ("dgl", "dgl.function") if m not in sys.modules]
    sys.modules.setdefault("dgl", dgl_stub)
    sys.modules.setdefault("dgl.function", dgl_stub.function)
    sys.path.insert(0, REF)
    try:
        from models.mgpt import LinearAttention as RefAttn
    finally:
        sys.path.remove(REF)
        for m in added:
            sys.modules.pop(m, None)
    from resolution_pde_tpu.models.mgpt import LinearAttention

    cfg = types.SimpleNamespace(n_embd=16, n_head=4, attn_pdrop=0.0)
    ref = RefAttn(cfg)
    ref.eval()

    x = rng.standard_normal((2, 7, 16)).astype(np.float32)
    y = rng.standard_normal((2, 5, 16)).astype(np.float32)
    with torch.no_grad():
        e_self = ref(torch.from_numpy(x)).numpy()
        e_cross = ref(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    mine = LinearAttention(n_embd=16, n_head=4)
    p = mine.init(jax.random.key(0), jnp.asarray(x))["params"]

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    for name, lin in (("query", ref.query), ("key", ref.key),
                      ("value", ref.value), ("proj", ref.proj)):
        p[name]["kernel"] = t2j(lin.weight).T
        p[name]["bias"] = t2j(lin.bias)

    g_self = np.asarray(mine.apply({"params": p}, jnp.asarray(x)))
    g_cross = np.asarray(mine.apply({"params": p}, jnp.asarray(x),
                                    jnp.asarray(y)))
    np.testing.assert_allclose(g_self, e_self, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(g_cross, e_cross, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("opts", [
    dict(dt_tie=False),
    dict(dt_transform="softplus"),
    dict(dt_fast=True),
    dict(real_transform="softplus", imag_transform="exp"),
    dict(bandlimit=0.05),
    dict(is_real=True),
], ids=["dt_untied", "dt_softplus", "dt_fast", "re_im_transforms",
        "bandlimit", "is_real"])
def test_diag_kernel_option_surface_golden(opts, rng):
    """SSMKernelDiag's long-tail option surface (models/s4.py:819-820,
    992-999): untied per-state dt, dt_transform, dt_fast (asinh/sinh
    parameterization), real/imag transforms, bandlimit masking, and the
    real-valued EMA mode — each golden vs S4DKernelLayer with the same
    option and transplanted parameters."""
    import torch
    import jax
    import jax.numpy as jnp

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.models.s4 import S4DKernelLayer

    torch.manual_seed(7)
    h, n_ref, L = 4, 4, 12
    d_state = 2 * n_ref
    ref = ref_s4.SSMKernelDiag(d_model=h, d_state=d_state, l_max=L,
                               verbose=False, **opts)
    with torch.no_grad():
        k_ref, _ = ref.forward(L=L)
    k_ref = k_ref.detach().numpy()  # (1, H, L)

    layer = S4DKernelLayer(d_model=h, d_state=d_state, channels=1, **opts)
    params = jax.jit(layer.init, static_argnums=1)(jax.random.key(0), L)
    sub = _transplant_diag_kernel(ref, params["params"])
    k_mine = np.asarray(
        jax.jit(lambda p: layer.apply({"params": p}, L))(sub))
    np.testing.assert_allclose(k_mine, k_ref, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("measure,rank", [("legt", 2), ("fout", 1)])
def test_dplr_kernel_measure_golden(measure, rank, rng):
    """Non-legs HiPPO measures (models/s4.py:310-382 transition /
    rank_correction; 'legt' requires rank 2): reference SSMKernelDPLR
    with init=measure == DPLRKernelLayer(measure=...) after transplant.
    The fourier measure exercises the zero-real-part eigenvalue clamp
    (s4.py:637 inv_transform min=1e-4)."""
    import torch
    import jax
    import jax.numpy as jnp

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.models.s4 import DPLRKernelLayer

    torch.manual_seed(8)
    h, n_ref, L = 4, 4, 16
    ref = ref_s4.SSMKernelDPLR(d_model=h, d_state=2 * n_ref, l_max=L,
                               init=measure, rank=rank, verbose=False)
    with torch.no_grad():
        k_ref, _ = ref.forward(L=L)
    k_ref = k_ref.detach().numpy()

    layer = DPLRKernelLayer(d_model=h, d_state=2 * n_ref, channels=1,
                            measure=measure, rank=rank)
    params = jax.jit(layer.init, static_argnums=1)(jax.random.key(0), L)
    sub = _transplant_dplr_kernel(ref, params["params"])
    k_mine = np.asarray(
        jax.jit(lambda p: layer.apply({"params": p}, L))(sub))
    np.testing.assert_allclose(k_mine, k_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("opts", [
    dict(dt_tie=False),
    dict(dt_transform="softplus"),
    dict(dt_fast=True),
], ids=["dt_untied", "dt_softplus", "dt_fast"])
def test_dplr_kernel_dt_options_golden(opts, rng):
    """DPLR kernel with the dt parameterization options (models/s4.py:
    819-820, 992, 1097-1099): untied (H, N/2) dt broadcast over conjugate
    pairs, softplus transform, and the asinh/sinh fast parameterization."""
    import torch
    import jax
    import jax.numpy as jnp

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.models.s4 import DPLRKernelLayer

    torch.manual_seed(9)
    h, n_ref, L = 4, 4, 16
    ref = ref_s4.SSMKernelDPLR(d_model=h, d_state=2 * n_ref, l_max=L,
                               verbose=False, **opts)
    with torch.no_grad():
        k_ref, _ = ref.forward(L=L)
    k_ref = k_ref.detach().numpy()

    layer = DPLRKernelLayer(d_model=h, d_state=2 * n_ref, channels=1,
                            **opts)
    params = jax.jit(layer.init, static_argnums=1)(jax.random.key(0), L)
    sub = _transplant_dplr_kernel(ref, params["params"])
    k_mine = np.asarray(
        jax.jit(lambda p: layer.apply({"params": p}, L))(sub))
    np.testing.assert_allclose(k_mine, k_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("init", ["inv", "legs"])
def test_diag_init_family_golden(init, rng):
    """Deterministic parts of the diag init families (models/s4.py:463-560
    dplr() with P_scale=0, reached via init='diag-inv'/'diag-legs'):
    A agrees with ops.ssm.diag_ssm_init up to the conjugate convention
    (ours stores positive imag); B agrees in magnitude (eigenvector phase
    freedom for 'legs')."""
    import torch  # noqa: F401

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.ops import ssm as ssm_ops

    n_half = 8
    A_ref, P_ref, B_ref, _ = ref_s4.dplr(
        init=init, N=2 * n_half, rank=1, H=1, P_scale=0.0)
    A_ref = A_ref[0].numpy()
    B_ref = B_ref[0].numpy()
    neg_real, imag, b = ssm_ops.diag_ssm_init(init, n_half)
    np.testing.assert_allclose(-neg_real, A_ref.real, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(imag, -A_ref.imag, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.abs(b), np.abs(B_ref), rtol=1e-5,
                               atol=1e-5)


def test_nplr_fourier_matches_reference_half_spectrum(rng):
    """nplr_init('fourier') full-N spectrum contains exactly the
    reference nplr('fourier') half spectrum plus conjugates
    (models/s4.py:384-455; incl. the double zero eigenvalue)."""
    import torch

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.ops import ssm as ssm_ops

    n = 8
    W_ref, P_ref, B_ref, _ = ref_s4.nplr("fourier", n)
    lam, p, b = ssm_ops.nplr_init("fourier", n)

    def key(z):
        return np.sort_complex(np.round(z, 5))

    ours_half = lam[np.argsort(lam.imag)][: n // 2]
    np.testing.assert_allclose(
        key(ours_half), key(W_ref.numpy()), atol=1e-4)
    # full spectrum closed under conjugation
    np.testing.assert_allclose(
        key(lam), key(np.conj(lam)), atol=1e-6)


def test_dplr_kernel_hippo_combination_golden(rng):
    """The 'hippo' combination init (models/s4.py:612-625: half the n_ssm
    copies 'legs', half 'fourier'): reference SSMKernelDPLR with
    init='hippo', n_ssm=2 == DPLRKernelLayer(measure='hippo', n_ssm=2)
    after transplant — exercises the combination + tying resolve path."""
    import torch
    import jax

    ref_s4 = _import_ref_s4()
    from resolution_pde_tpu.models.s4 import DPLRKernelLayer

    torch.manual_seed(10)
    h, n_ref, L = 4, 4, 16
    ref = ref_s4.SSMKernelDPLR(d_model=h, d_state=2 * n_ref, l_max=L,
                               init="hippo", n_ssm=2, verbose=False)
    with torch.no_grad():
        k_ref, _ = ref.forward(L=L)
    k_ref = k_ref.detach().numpy()

    layer = DPLRKernelLayer(d_model=h, d_state=2 * n_ref, channels=1,
                            measure="hippo", n_ssm=2)
    params = jax.jit(layer.init, static_argnums=1)(jax.random.key(0), L)
    sub = _transplant_dplr_kernel(ref, params["params"])
    k_mine = np.asarray(
        jax.jit(lambda p: layer.apply({"params": p}, L))(sub))
    np.testing.assert_allclose(k_mine, k_ref, rtol=1e-4, atol=1e-5)


def test_dplr_hippo_combination_init_structure():
    """Our OWN 'hippo' init assigns copy 0 the legs NPLR spectrum and
    copy 1 the fourier NPLR spectrum (contiguous blocks, like the
    reference's combination(), models/s4.py:619-630)."""
    import jax

    from resolution_pde_tpu.models.s4 import DPLRKernelLayer
    from resolution_pde_tpu.ops import ssm as ssm_ops

    n = 8
    layer = DPLRKernelLayer(d_model=4, d_state=n, channels=1,
                            measure="hippo", n_ssm=2)
    params = jax.jit(layer.init, static_argnums=1)(jax.random.key(0), 16)
    p = params["params"]
    lam = (-np.exp(np.asarray(p["Lambda_log_neg_re"]))
           + 1j * np.asarray(p["Lambda_im"]))  # (2, N)

    legs, _, _, _ = ssm_ops.make_dplr_hippo(n)
    four, _, _ = ssm_ops.nplr_init("fourier", n)
    # the stored real part went through the 1e-4 clamp + log roundtrip
    np.testing.assert_allclose(lam[0].imag, legs.imag, atol=1e-5)
    np.testing.assert_allclose(lam[0].real,
                               np.minimum(legs.real, -1e-4), atol=1e-5)
    np.testing.assert_allclose(lam[1].imag, four.imag, atol=1e-5)
    np.testing.assert_allclose(lam[1].real,
                               np.minimum(four.real, -1e-4), atol=1e-5)


def test_ffno2d_parity_across_resolutions_32_to_256(ref_modules, rng):
    """The 2D mirror of the north-star sweep (BASELINE.json:5 names FFNO2D
    on NS): rel-L2 parity within 1e-4 at EVERY eval resolution in
    [32..256] with ONE transplanted weight set — the 2D effective-mode
    slicing must track the reference's per-axis truncation
    (models/spectral_convolution.py:269-305) at each grid size.
    n_modes=20 > 32//2+1 so the coarsest grid exercises the slicing."""
    import torch
    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.models import FFNO2D

    kw = dict(width=8, n_layers=2, n_modes=20, factor=2,
              ff_weight_norm=False, n_ff_layers=2, layer_norm=False,
              dropout=0.0, mode="full")
    ref = ref_modules["ffno"].FFNO2D(in_channels=1, out_channels=1,
                                     use_grid=True, **kw)
    ref.eval()

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    mine = FFNO2D(in_channels=1, out_channels=1, use_grid=True, **kw)
    x0 = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    p = mine.init(jax.random.key(0), jnp.asarray(x0))["params"]
    p["WNDense_0"]["TorchLinear_0"]["kernel"] = t2j(ref.in_proj.weight).T
    p["WNDense_0"]["TorchLinear_0"]["bias"] = t2j(ref.in_proj.bias)
    p["WNDense_1"]["TorchLinear_0"]["kernel"] = t2j(ref.out_proj.weight).T
    p["WNDense_1"]["TorchLinear_0"]["bias"] = t2j(ref.out_proj.bias)
    for i, layer in enumerate(ref.fourier_layers):
        blk = p[f"FSpectralConv2d_{i}"]
        blk["fourier_weight_y"] = t2j(layer.fourier_weight[0])
        blk["fourier_weight_x"] = t2j(layer.fourier_weight[1])
        ff = blk["FeedForward_0"]
        for j in range(2):
            lin = layer.backcast_ff.layers[j][0]
            ff[f"WNDense_{j}"]["TorchLinear_0"]["kernel"] = t2j(lin.weight).T
            ff[f"WNDense_{j}"]["TorchLinear_0"]["bias"] = t2j(lin.bias)

    fwd = jax.jit(lambda x: mine.apply({"params": p}, x))
    for res in (32, 48, 64, 128, 256):
        x = rng.standard_normal((2, 1, res, res)).astype(np.float32)
        with torch.no_grad():
            expected = ref(torch.from_numpy(x)).numpy()
        got = np.asarray(fwd(jnp.asarray(x)))
        rel_l2 = (np.linalg.norm(got - expected)
                  / (np.linalg.norm(expected) + 1e-8))
        assert rel_l2 < 1e-4, f"res {res}: rel-L2 {rel_l2:.2e}"
