"""Mesh construction and sharding-spec sanitation."""

import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

from whisper_tpu.parallel.mesh import (
    activation_shardings,
    make_mesh,
    param_pspecs,
    sanitize_pspec,
    shard_params,
)


def test_make_mesh_axes():
    m = make_mesh(dp=2, sp=2, tp=2)
    assert m.axis_names == ("dp", "sp", "tp")
    assert m.shape == {"dp": 2, "sp": 2, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=2)           # 6 != 8 devices


def test_sanitize_pspec_drops_indivisible_axes():
    mesh = make_mesh(dp=2, tp=4)
    # 51865 % 4 != 0 -> vocab axis replicated; 384 % 4 == 0 -> kept
    assert sanitize_pspec((51865, 64), P("tp", None), mesh) == P(None, None)
    assert sanitize_pspec((128, 384), P(None, "tp"), mesh) == P(None, "tp")
    # tuple axes: ("dp","tp") size 8 divides 64
    assert sanitize_pspec((64, 3), P(("dp", "tp"), None), mesh) == \
        P(("dp", "tp"), None)
    # short spec is padded with None; divisible leading axis is kept
    assert sanitize_pspec((8, 8, 8), P("tp"), mesh) == P("tp", None, None)
    assert sanitize_pspec((9, 8, 8), P("tp"), mesh) == P(None, None, None)


def test_param_pspecs_shapes(small_cfg):
    from whisper_tpu.models.whisper import init_params
    params = init_params(small_cfg, jax.random.PRNGKey(0))
    specs = param_pspecs(params)
    assert specs["decoder"]["tok_emb"] == P("tp", None)
    assert specs["encoder"]["layers"]["fc1"]["w"] == P(None, None, "tp")
    assert specs["encoder"]["layers"]["fc2"]["w"] == P(None, "tp", None)
    assert specs["encoder"]["layers"]["attn"]["o"]["w"] == P(None, "tp", None)


def test_shard_params_places_on_mesh(small_cfg):
    from whisper_tpu.models.whisper import init_params
    params = init_params(small_cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(dp=4, tp=2)
    sharded = shard_params(params, mesh)
    fc1 = sharded["encoder"]["layers"]["fc1"]["w"]
    assert "tp" in str(fc1.sharding.spec)
    # vocab (51865) indivisible by 2 -> replicated, not an error
    tok = sharded["decoder"]["tok_emb"]
    assert tok.sharding.spec == P(None, None)


def test_activation_shardings_sp_aware():
    m3 = make_mesh(dp=2, sp=2, tp=2)
    sh = activation_shardings(m3)
    assert sh["mel"].spec == P("dp", None, "sp")
    assert sh["enc_out"].spec == P("dp", "sp", None)
