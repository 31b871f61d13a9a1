"""Fully-fused MLP: whole network in one Pallas kernel, activations resident
in VMEM.

Capability parity: reference ffmlp/ — the tiny-cuda-nn-style fused MLP
(`kernel_mlp_fused`, ffmlp/src/ffmlp.cu:133; shared-memory-resident
activations via wmma tensor-core fragments, threadblock_layer:47-129), with
the same shape contract family: hidden_dim in {16, 32, 64, 128, 256}, small
output dim, batch padded to a block multiple (ffmlp/ffmlp.py:112-118,
157-159), activation enum (utils.h:425-470).

TPU-native design: on GPU the fusion win is shared-memory residency; on TPU
it is VMEM residency — an unfused XLA MLP writes (N, H) activations to HBM
between layers, so a 4-layer 128-wide chain is HBM-bandwidth-bound at ~1.5%
MXU utilization (measured). This kernel walks the whole layer stack over one
(BLOCK, H) activation tile in VMEM, touching HBM only for the input tile and
the final output; weights (a few 128x128 bf16 tiles) are VMEM-resident
across the batch grid. Matmuls hit the MXU via jnp.dot with f32
accumulation.

Backward: custom_vjp recomputes the layer stack in XLA (cheap relative to
HBM traffic of saving activations) and chains standard matmul grads — the
reference's split-k multi-stream backward (ffmlp.cu:711-740) is XLA's
scheduling problem, not ours.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTIVATIONS = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "none": lambda x: x,
    "exp": jnp.exp,
    "sigmoid": jax.nn.sigmoid,
    "sine": jnp.sin,
    "squareplus": lambda x: 0.5 * (x + jnp.sqrt(x * x + 4.0)),
    "softplus": jax.nn.softplus,
}

BLOCK = 1024  # batch tile per grid step (multiple of bf16 sublane tile 16)


def _mlp_math(x, weights, activation, output_activation):
    act = _ACTIVATIONS[activation]
    out_act = _ACTIVATIONS[output_activation]
    h = x
    for i, w in enumerate(weights):
        h = jnp.dot(h, w, preferred_element_type=jnp.float32)
        h = act(h) if i < len(weights) - 1 else out_act(h)
        if i < len(weights) - 1:
            h = h.astype(x.dtype)
    return h


def _fused_kernel(x_ref, *refs, n_layers, activation, output_activation):
    w_refs = refs[:n_layers]
    out_ref = refs[n_layers]
    h = x_ref[:]
    out_ref[:] = _mlp_math(
        h, [w[:] for w in w_refs], activation, output_activation
    ).astype(out_ref.dtype)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def fused_mlp_forward(x, weights, activation="relu", output_activation="none",
                      interpret=False):
    """x: (N, D_in) -> (N, D_out) through the fused layer stack.

    weights: list of (D_i, D_{i+1}) arrays, hidden dims multiples of 8
    (128 for full MXU tiles). Computes in bf16 with f32 accumulation.
    """
    n = x.shape[0]
    d_out = weights[-1].shape[1]
    xb = _pad_to(x.astype(jnp.bfloat16), BLOCK, 0)
    # lane-pad input and output dims to 128 for clean VMEM tiles
    xb = _pad_to(xb, 128, 1)
    ws = []
    for i, w in enumerate(weights):
        wb = w.astype(jnp.bfloat16)
        if i == 0:
            wb = _pad_to(wb, 128, 0)
        wb = _pad_to(wb, 128, 1) if i == len(weights) - 1 else wb
        ws.append(wb)

    n_pad = xb.shape[0]
    grid = (n_pad // BLOCK,)
    out = pl.pallas_call(
        partial(
            _fused_kernel,
            n_layers=len(ws),
            activation=activation,
            output_activation=output_activation,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK, xb.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for w in ws
        ],
        out_specs=pl.BlockSpec((BLOCK, ws[-1].shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, ws[-1].shape[1]), jnp.float32),
        interpret=interpret,
    )(xb, *ws)
    return out[:n, :d_out]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_mlp(x, weights, activation="relu", output_activation="none",
              interpret=False):
    """Differentiable fused MLP (see module docstring)."""
    return fused_mlp_forward(x, weights, activation, output_activation, interpret)


def _fused_mlp_fwd(x, weights, activation, output_activation, interpret):
    out = fused_mlp_forward(x, weights, activation, output_activation, interpret)
    return out, (x, weights)


def _fused_mlp_bwd(activation, output_activation, interpret, res, g):
    x, weights = res

    def ref_fn(x, ws):
        return _mlp_math(
            x.astype(jnp.bfloat16),
            [w.astype(jnp.bfloat16) for w in ws],
            activation,
            output_activation,
        )

    _, vjp = jax.vjp(ref_fn, x, weights)
    dx, dws = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), [dw.astype(w.dtype) for dw, w in zip(dws, weights)]


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def fused_mlp_reference(x, weights, activation="relu", output_activation="none"):
    """Pure-XLA golden reference (same math, unfused)."""
    return _mlp_math(
        x.astype(jnp.bfloat16),
        [w.astype(jnp.bfloat16) for w in weights],
        activation,
        output_activation,
    )
