"""Shared building blocks for the model zoo: conv/dense params and init.

Parameters are plain pytrees (nested dicts of jnp arrays) applied by pure
functions — no module framework. This keeps sharding annotations, torch
checkpoint conversion, and Pallas kernel substitution trivial.

Initialization mirrors torch's Conv2d/Linear default (kaiming-uniform with
a=sqrt(5), i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias)
so that trained-from-scratch behavior matches the reference networks
(/root/reference/ace_network.py uses default-initialized Conv2d layers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_conv(key: jax.Array, kh: int, kw: int, cin: int, cout: int) -> dict:
    """Conv kernel in HWIO layout + bias, torch-default initialized."""
    wkey, bkey = jax.random.split(key)
    fan_in = cin * kh * kw
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(wkey, (kh, kw, cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound),
    }


def init_dense(key: jax.Array, cin: int, cout: int) -> dict:
    """Dense layer (== 1x1 conv) params, torch-default initialized."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(cin)
    return {
        "w": jax.random.uniform(wkey, (cin, cout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound),
    }


def conv2d(x: jax.Array, p: dict, stride: int = 1, compute_dtype=jnp.bfloat16) -> jax.Array:
    """3x3 (or any) conv, NHWC, explicit symmetric padding of 1 per 3-kernel.

    Matches torch Conv2d(k=3, padding=1) spatial semantics exactly (output
    ceil(H/stride) for the strides used here). Computation runs in
    `compute_dtype` on the MXU with float32 accumulation.
    """
    kh, kw = p["w"].shape[:2]
    pad_h, pad_w = (kh - 1) // 2, (kw - 1) // 2
    # NOTE: no explicit preferred_element_type — the TPU MXU accumulates conv
    # partials in f32 internally regardless of the bf16 output dtype, and a
    # f32 preferred type breaks conv's transpose rule under grad (mixed-dtype
    # cotangents), which the encoder-pretraining path exercises.
    out = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        window_strides=(stride, stride),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(compute_dtype)


def dense(x: jax.Array, p: dict, compute_dtype=jnp.bfloat16) -> jax.Array:
    """(..., cin) @ (cin, cout) + b on the MXU with f32 accumulation."""
    out = jnp.dot(
        x.astype(compute_dtype),
        p["w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return (out + p["b"]).astype(compute_dtype)


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)
