"""Fused Pallas kernel for the per-step circuit-metrics update.

The XLA lowering of MatrixEnvCore._metrics_update runs as ~a dozen small
kernels over [B, n]-shaped operands (~200 us/step at B=8192 — as much as the
whole bitpacked state update). This kernel fuses the entire read-modify-write
— one-hot layer lookups, ASAP layer bumps, counter deltas, weighted penalty —
into a single VMEM-resident pass per env block.

Semantics are identical to the reference MetricsTracker (rust
rust/src/envs/metrics.rs:19-184, via the spec twin spec/metrics.py); the
weights are baked in as static constants (they are fixed per env instance).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tables import MT_1Q, MT_CX, MT_CZ, MT_SWAP

_NEG = np.int32(-(2 ** 30))


def _kernel(weights, last_g_ref, last_c_ref, scal_ref,
            out_g_ref, out_c_ref, out_scal_ref, pen_ref):
    """scal columns: 0 max_g, 1 max_c, 2 n_cnots, 3 n_gates,
    4 mtype, 5 q1, 6 q2, 7 is_noop."""
    last_g = last_g_ref[:, :]
    last_c = last_c_ref[:, :]
    BB, n = last_g.shape
    qid = jax.lax.broadcasted_iota(jnp.int32, (BB, n), 1)
    q1 = scal_ref[:, 5:6]
    q2 = scal_ref[:, 6:7]
    oh1 = qid == q1
    oh2 = qid == q2
    lg1 = jnp.max(jnp.where(oh1, last_g, _NEG), axis=1, keepdims=True)
    lg2 = jnp.max(jnp.where(oh2, last_g, _NEG), axis=1, keepdims=True)
    lc1 = jnp.max(jnp.where(oh1, last_c, _NEG), axis=1, keepdims=True)
    lc2 = jnp.max(jnp.where(oh2, last_c, _NEG), axis=1, keepdims=True)

    mtype = scal_ref[:, 4:5]
    noop = scal_ref[:, 7:8] != 0
    is1q = mtype == MT_1Q
    iscx = mtype == MT_CX
    issw = mtype == MT_SWAP

    m_cx = jnp.maximum(lg1, lg2) + 1
    m_sw = jnp.maximum(lg1, lg2) + 3
    m_cz = jnp.maximum(lg1, lg2 + 1) + 1
    v1 = jnp.where(is1q, lg1 + 1, jnp.where(iscx, m_cx,
         jnp.where(issw, m_sw, m_cz)))
    v2 = jnp.where(is1q, lg1 + 1, jnp.where(iscx, m_cx,
         jnp.where(issw, m_sw, m_cz + 1)))
    v1 = jnp.where(noop, lg1, v1)
    v2 = jnp.where(noop, lg2, v2)
    out_g_ref[:, :] = jnp.where(oh2, v2, jnp.where(oh1, v1, last_g))

    c_inc = jnp.where(issw, 3, 1)
    c_new = jnp.maximum(lc1, lc2) + c_inc
    has_cx = (~is1q) & (~noop)
    w1 = jnp.where(has_cx, c_new, lc1)
    w2 = jnp.where(has_cx, c_new, lc2)
    out_c_ref[:, :] = jnp.where(oh2, w2, jnp.where(oh1, w1, last_c))

    max_g = scal_ref[:, 0:1]
    max_c = scal_ref[:, 1:2]
    new_max_g = jnp.maximum(max_g, jnp.maximum(v1, v2))
    new_max_c = jnp.maximum(max_c, jnp.maximum(w1, w2))
    d_gates = jnp.where(noop, 0, jnp.where(is1q | iscx, 1, 3))
    d_cnots = jnp.where(is1q | noop, 0, jnp.where(issw, 3, 1))
    d_layers = new_max_g - max_g
    d_layers_c = new_max_c - max_c

    out = jnp.concatenate([
        new_max_g, new_max_c,
        scal_ref[:, 2:3] + d_cnots,
        scal_ref[:, 3:4] + d_gates,
        scal_ref[:, 4:8],
    ], axis=1)
    out_scal_ref[:, :] = out

    w0, w1f, w2f, w3f = weights
    pen_ref[:, :] = (
        w0 * d_cnots.astype(jnp.float32)
        + w1f * d_layers_c.astype(jnp.float32)
        + w2f * d_layers.astype(jnp.float32)
        + w3f * d_gates.astype(jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("weights", "block_b", "interpret"))
def metrics_update_pallas(last_g, last_c, scal, weights,
                          block_b: int = 512, interpret: bool = False):
    """Fused metrics step. last_g/last_c int32 [B, n]; scal int32 [B, 8]
    (max_g, max_c, n_cnots, n_gates, mtype, q1, q2, is_noop); weights a
    static 4-tuple of floats. Returns (new_last_g, new_last_c, new_scal,
    penalty [B])."""
    B, n = last_g.shape
    bb = min(block_b, B)
    while B % bb:
        bb //= 2
    grid = (B // bb,)
    kernel = functools.partial(_kernel, weights)
    out_g, out_c, out_scal, pen = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, n), lambda i: (i, 0)),
            pl.BlockSpec((bb, n), lambda i: (i, 0)),
            pl.BlockSpec((bb, 8), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bb, n), lambda i: (i, 0)),
            pl.BlockSpec((bb, n), lambda i: (i, 0)),
            pl.BlockSpec((bb, 8), lambda i: (i, 0)),
            pl.BlockSpec((bb, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n), jnp.int32),
            jax.ShapeDtypeStruct((B, n), jnp.int32),
            jax.ShapeDtypeStruct((B, 8), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        interpret=interpret,
    )(last_g, last_c, scal)
    return out_g, out_c, out_scal, pen[:, 0]
