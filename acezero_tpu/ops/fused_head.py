"""Pallas TPU kernel: fused scene-coordinate head MLP (forward + custom VJP).

The head is a chain of 512-wide dense layers with residual skips
(acezero_tpu/models/head.py). Under plain XLA every layer's activation
round-trips HBM; at batch 5120 x 512 bf16 that's ~5 MB per layer per
direction. This kernel keeps the whole chain in VMEM:

  forward: grid over batch tiles; the full weight stack (~4 MB bf16) stays
  resident in VMEM across grid steps; each tile runs the whole matmul chain
  on the MXU with f32 accumulation, writing only the final activation.

  backward (custom VJP, recompute-based): the forward saves only the input.
  A second kernel re-runs the chain per tile, walks it backwards producing
  dx plus the per-layer pre-activation gradients and layer inputs; the
  weight gradients then reduce in one batched XLA einsum over those stacks
  (a single large MXU contraction instead of L separate ones).

Layout contract: the residual chain is expressed as a stacked (L, 512, 512)
weight tensor plus a static "skip tag" tuple describing where residual adds
happen, so one kernel serves any `num_head_blocks`. The final 512->(3|4)
projection runs outside the kernel (tiny; fuses into the homogeneous
epilogue).

Measured on TPU v5e (batch 5120, 1 extra block, loop-carried inputs so
nothing hoists): XLA 0.444 ms per fwd+bwd (~74% MFU) vs this kernel
0.636 ms — XLA's automatic fusion wins at these shapes, so the kernel is
OFF by default (`TrainConfig.use_fused_head`); it remains the substrate for
shapes XLA fuses worse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acezero_tpu.models.head import HeadConfig

TILE_FWD = 512
TILE_BWD = 256

# test hook: run kernels in the Pallas interpreter (pure-Python semantics,
# works on the CPU backend); flipped by tests/conftest-level fixtures
INTERPRET = False


def head_params_to_stack(params: dict, cfg: HeadConfig):
    """Stack the 512x512 chain into (L, C, C) weights / (L, C) biases.

    Returns (w_stack, b_stack, res_after): `res_after[l]` is 1 where a
    residual add happens after layer l (the end of res3 and of each extra
    block; fc1/fc2 have none).
    """
    chain = [params["res3_conv1"], params["res3_conv2"], params["res3_conv3"]]
    for block in params["blocks"]:
        chain += [block["c0"], block["c1"], block["c2"]]
    chain += [params["fc1"], params["fc2"]]

    w = jnp.stack([c["w"] for c in chain]).astype(jnp.bfloat16)
    b = jnp.stack([c["b"] for c in chain]).astype(jnp.float32)
    n_res = 1 + cfg.num_head_blocks
    res_after = [0] * len(chain)
    for k in range(n_res):
        res_after[3 * k + 2] = 1
    return w, b, tuple(res_after)


def stack_to_head_grads(params: dict, cfg: HeadConfig, dw, db):
    """Scatter stacked (L, C, C)/(L, C) grads back into the head pytree
    layout (zeros for fc3 and non-chain leaves, which stay on the XLA path)."""
    names = ["res3_conv1", "res3_conv2", "res3_conv3"]
    grads = {k: jax.tree.map(jnp.zeros_like, v) for k, v in params.items()}
    idx = 0
    for name in names:
        grads[name] = {"w": dw[idx], "b": db[idx]}
        idx += 1
    for bi in range(cfg.num_head_blocks):
        for j in range(3):
            grads["blocks"][bi][f"c{j}"] = {"w": dw[idx], "b": db[idx]}
            idx += 1
    grads["fc1"] = {"w": dw[idx], "b": db[idx]}
    grads["fc2"] = {"w": dw[idx + 1], "b": db[idx + 1]}
    return grads


def _chain_forward(x, w_ref, b_ref, res_after, record=None):
    """Shared fused chain; optionally records (acts_in, masks) per layer."""
    res = x
    h = x
    for l, is_res in enumerate(res_after):
        if record is not None:
            record["acts_in"].append(h)
        pre = jnp.dot(h, w_ref[l], preferred_element_type=jnp.float32) + b_ref[l]
        a = jnp.maximum(pre, 0).astype(jnp.bfloat16)
        if record is not None:
            record["masks"].append((pre > 0).astype(jnp.bfloat16))
        if is_res:
            res = res + a
            h = res
        else:
            h = a
    return h


def _forward_kernel(x_ref, w_ref, b_ref, out_ref, *, res_after):
    out_ref[...] = _chain_forward(x_ref[...], w_ref, b_ref, res_after)


def _backward_kernel(
    x_ref, w_ref, b_ref, g_ref, dx_ref, gpre_ref, actsin_ref, *, res_after
):
    record = {"acts_in": [], "masks": []}
    _chain_forward(x_ref[...], w_ref, b_ref, res_after, record)

    g = g_ref[...].astype(jnp.bfloat16)  # grad wrt the chain output
    g_res = jnp.zeros_like(g)  # pending skip-path grad
    for l in reversed(range(len(res_after))):
        if res_after[l]:
            g = g + g_res
            g_res = g
        g_pre = (g * record["masks"][l]).astype(jnp.bfloat16)
        gpre_ref[l] = g_pre
        actsin_ref[l] = record["acts_in"][l]
        g = jnp.dot(g_pre, w_ref[l].T, preferred_element_type=jnp.float32).astype(
            jnp.bfloat16
        )
    dx_ref[...] = (g + g_res).astype(dx_ref.dtype)


def _run_forward(x, w, b, res_after):
    B, C = x.shape
    L = w.shape[0]
    return pl.pallas_call(
        functools.partial(_forward_kernel, res_after=res_after),
        grid=(B // TILE_FWD,),
        in_specs=[
            pl.BlockSpec((TILE_FWD, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_FWD, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.bfloat16),
        interpret=INTERPRET,
    )(x, w, b)


def _run_backward(x, w, b, g, res_after):
    B, C = x.shape
    L = w.shape[0]
    dx, gpre, actsin = pl.pallas_call(
        functools.partial(_backward_kernel, res_after=res_after),
        grid=(B // TILE_BWD,),
        in_specs=[
            pl.BlockSpec((TILE_BWD, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_BWD, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_BWD, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TILE_BWD, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, TILE_BWD, C), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, C), jnp.bfloat16),
        ],
        interpret=INTERPRET,
    )(x, w, b, g)

    # weight/bias grads: one large batched MXU contraction over the stacks
    dw = jnp.einsum(
        "lbc,lbd->lcd", actsin, gpre, preferred_element_type=jnp.float32
    )
    db = jnp.sum(gpre.astype(jnp.float32), axis=1)
    return dx, dw, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_head_mlp(x, w_stack, b_stack, res_after):
    """Fused residual-MLP chain: (B, C) bf16 -> (B, C) bf16.

    B must be a multiple of 512. `res_after` is the static skip layout from
    head_params_to_stack.
    """
    return _run_forward(x, w_stack, b_stack, res_after)


def _fwd(x, w_stack, b_stack, res_after):
    out = _run_forward(x, w_stack, b_stack, res_after)
    return out, (x, w_stack, b_stack)


def _bwd(res_after, saved, g):
    x, w_stack, b_stack = saved
    dx, dw, db = _run_backward(x, w_stack, b_stack, g, res_after)
    return dx, dw, db


fused_head_mlp.defvjp(_fwd, _bwd)
