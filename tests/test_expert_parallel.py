"""Expert parallelism: the stacked-expert MoE layout (models/mgpt.py
expert_impl='stacked') must match the loop implementation exactly with
transplanted weights, and sharding the expert dim over an "expert" mesh
axis (parallel/ep.py) must not change the output."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from resolution_pde_tpu.models.mgpt import MoEGPTNO
from resolution_pde_tpu.parallel import (
    make_mesh,
    moe_ep_specs,
    specs_to_shardings,
)


def _inputs(rng, b=2, t1=12, t2=10):
    g = jnp.asarray(rng.standard_normal((b, t1, 2)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((b, t2, 2)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((b, t1, 2)), jnp.float32)
    return g, u, pos


def _transplant_loop_to_stacked(loop_params, stacked_params, n_experts):
    """Copy the loop impl's per-expert Dense weights into the stacked
    tensors (expert i -> slice i)."""
    out = jax.tree_util.tree_map(lambda x: x, stacked_params)  # copy
    for bname, block in loop_params.items():
        if not bname.startswith("block_"):
            continue
        for moe in ("moe1", "moe2"):
            stacked = out[bname][f"{moe}_stacked"]
            w1 = jnp.stack([block[f"{moe}_{i}"]["Dense_0"]["kernel"]
                            for i in range(n_experts)])
            b1 = jnp.stack([block[f"{moe}_{i}"]["Dense_0"]["bias"]
                            for i in range(n_experts)])
            w2 = jnp.stack([block[f"{moe}_{i}"]["Dense_1"]["kernel"]
                            for i in range(n_experts)])
            b2 = jnp.stack([block[f"{moe}_{i}"]["Dense_1"]["bias"]
                            for i in range(n_experts)])
            stacked.update({"w1": w1, "b1": b1, "w2": w2, "b2": b2})
    return out


def test_stacked_experts_match_loop(rng):
    n_experts = 4
    kw = dict(trunk_size=2, branch_size=2, space_dim=2, output_size=3,
              n_layers=2, n_hidden=16, n_experts=n_experts)
    loop = MoEGPTNO(**kw)
    stacked = MoEGPTNO(**kw, expert_impl="stacked")
    g, u, pos = _inputs(rng)

    vp = jax.jit(loop.init)(jax.random.key(0), g, u, pos)["params"]
    vs = jax.jit(stacked.init)(jax.random.key(0), g, u, pos)["params"]
    # shared (non-expert) modules got identical init from the same key
    vs = jax.device_get(vs)
    vs = _transplant_loop_to_stacked(vp, vs, n_experts)

    out_loop = loop.apply({"params": vp}, g, u, pos)
    out_stacked = stacked.apply({"params": vs}, g, u, pos)
    np.testing.assert_allclose(np.asarray(out_stacked),
                               np.asarray(out_loop), rtol=2e-5, atol=2e-6)


def test_expert_sharded_forward_matches_replicated(rng):
    n_experts = 4
    mesh = make_mesh({"data": 2, "expert": 4})
    model = MoEGPTNO(trunk_size=2, branch_size=2, space_dim=2,
                     output_size=3, n_layers=2, n_hidden=16,
                     n_experts=n_experts, expert_impl="stacked")
    g, u, pos = _inputs(rng, b=4)
    params = jax.jit(model.init)(jax.random.key(0), g, u, pos)["params"]
    ref = model.apply({"params": params}, g, u, pos)

    specs = moe_ep_specs(params, mesh)
    # every stacked expert tensor got the expert axis; nothing else did
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda l: isinstance(l, P))[0]
    n_sharded = 0
    for path, spec in flat:
        names = "/".join(getattr(p, "key", str(p)) for p in path)
        if "_stacked" in names:
            assert spec[0] == "expert", names
            n_sharded += 1
        else:
            assert spec == P(), names
    assert n_sharded == 2 * 2 * 4  # blocks x moes x tensors

    sp = jax.device_put(params, specs_to_shardings(specs, mesh))
    k = sp["block_0"]["moe1_stacked"]["w1"]
    assert k.sharding.shard_shape(k.shape)[0] == n_experts // 4

    with mesh:
        out = jax.jit(model.apply)({"params": sp},
                                   jax.device_put(g), u, pos)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
