"""Numeric validation of the Pallas fused head kernel (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import acezero_tpu.ops.fused_head as fh
from acezero_tpu.models.head import HeadConfig, init_head_params


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(fh, "INTERPRET", True)


def _reference_chain(x, w, b, res_after):
    """Pure-jnp replica of the fused chain (same dtypes/rounding)."""
    res = x
    h = x
    for l, is_res in enumerate(res_after):
        pre = jnp.dot(h.astype(jnp.bfloat16), w[l], preferred_element_type=jnp.float32) + b[l]
        a = jnp.maximum(pre, 0).astype(jnp.bfloat16)
        if is_res:
            res = res + a
            h = res
        else:
            h = a
    return h


@pytest.mark.parametrize("num_blocks", [0, 1, 2])
def test_forward_matches_reference(num_blocks):
    cfg = HeadConfig(num_head_blocks=num_blocks)
    params = init_head_params(jax.random.PRNGKey(0), cfg, jnp.zeros(3))
    w, b, res_after = fh.head_params_to_stack(params, cfg)
    x = (jax.random.normal(jax.random.PRNGKey(1), (512, 512)) * 0.5).astype(jnp.bfloat16)

    out = fh.fused_head_mlp(x, w, b, res_after)
    ref = _reference_chain(x, w, b, res_after)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=0.05, atol=0.2
    )


def test_gradients_match_autodiff():
    cfg = HeadConfig(num_head_blocks=1)
    params = init_head_params(jax.random.PRNGKey(2), cfg, jnp.zeros(3))
    w, b, res_after = fh.head_params_to_stack(params, cfg)
    x = (jax.random.normal(jax.random.PRNGKey(3), (512, 512)) * 0.5).astype(jnp.bfloat16)
    tgt = jax.random.normal(jax.random.PRNGKey(4), (512, 512))

    def loss_fused(x, w, b):
        out = fh.fused_head_mlp(x, w, b, res_after).astype(jnp.float32)
        return jnp.mean((out - tgt) ** 2)

    def loss_ref(x, w, b):
        out = _reference_chain(x, w, b, res_after).astype(jnp.float32)
        return jnp.mean((out - tgt) ** 2)

    lf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, w, b)

    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-2)
    for a, r, name in zip(gf, gr, ("dx", "dw", "db")):
        a = np.asarray(a, np.float32)
        r = np.asarray(r, np.float32)
        denom = np.abs(r).max() + 1e-6
        np.testing.assert_allclose(a / denom, r / denom, atol=0.03, err_msg=name)


def test_stack_roundtrip_grads_layout():
    cfg = HeadConfig(num_head_blocks=1)
    params = init_head_params(jax.random.PRNGKey(5), cfg, jnp.zeros(3))
    w, b, res_after = fh.head_params_to_stack(params, cfg)
    assert w.shape == (8, 512, 512)
    assert res_after == (0, 0, 1, 0, 0, 1, 0, 0)

    dw = jnp.arange(8, dtype=jnp.float32)[:, None, None] * jnp.ones((8, 512, 512))
    db = jnp.arange(8, dtype=jnp.float32)[:, None] * jnp.ones((8, 512))
    grads = fh.stack_to_head_grads(params, cfg, dw, db)
    assert float(grads["res3_conv1"]["w"][0, 0]) == 0.0
    assert float(grads["blocks"][0]["c0"]["w"][0, 0]) == 3.0
    assert float(grads["fc2"]["b"][0]) == 7.0
    assert float(jnp.abs(grads["fc3"]["w"]).sum()) == 0.0
