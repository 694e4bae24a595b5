"""Expert parallelism (parallel/expert.py): GShard-style top-1 MoE MLP —
dense equivalence, routing behavior, and ep-sharded exactness on the
virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.parallel.expert import (
    init_moe_params,
    moe_mlp,
    moe_mlp_sharded,
    shard_moe_params,
)

D, FF, E = 16, 32, 4


@pytest.fixture(scope="module")
def setup():
    params = init_moe_params(jax.random.PRNGKey(0), D, FF, E)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, D), jnp.float32)
    return params, x


def test_dense_equivalence(setup):
    """With identical expert weights the switch layer equals the plain MLP
    (times the top-1 gate), for any routing."""
    params, x = setup
    tied = dict(params,
                w1=jnp.broadcast_to(params["w1"][:1], params["w1"].shape),
                b1=jnp.zeros_like(params["b1"]),
                w2=jnp.broadcast_to(params["w2"][:1], params["w2"].shape),
                b2=jnp.zeros_like(params["b2"]))
    y = moe_mlp(x, tied)
    gates = jax.nn.softmax(x @ tied["router"]["w"], axis=-1)
    gv = jnp.max(gates, axis=-1, keepdims=True)
    dense = jax.nn.gelu(x @ tied["w1"][0], approximate=False) @ tied["w2"][0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(dense * gv),
                               rtol=1e-5, atol=1e-5)


def test_routing_selects_distinct_experts(setup):
    params, x = setup
    gates = jax.nn.softmax(x @ params["router"]["w"], axis=-1)
    top = np.asarray(jnp.argmax(gates, axis=-1))
    assert len(np.unique(top)) > 1          # random router spreads tokens


def test_ep_sharded_matches_unsharded(setup):
    params, x = setup
    ref = np.asarray(moe_mlp(x, params))
    # a dedicated (dp, ep) mesh
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, axis_names=("dp", "ep"))
    sp = shard_moe_params(params, mesh)
    got = np.asarray(moe_mlp_sharded(x, sp, mesh, batch_axis="dp"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_gate_scaling_bounds(setup):
    params, x = setup
    y = moe_mlp(x, params)
    assert np.isfinite(np.asarray(y)).all()
