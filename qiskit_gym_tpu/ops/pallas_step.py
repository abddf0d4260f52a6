"""Fused Pallas TPU kernel for the matrix-env hot step.

Fuses, in one HBM pass: per-env gate application, the mod-2 reduction, the
random state-inversion buffer swap, and the solved-state check. Strategy:
every phase-less gate is <= 2 rank-1 GF(2) row updates M' = M xor (u w^T)
with u a destination one-hot combo and w a source-row combo (see
ops/matrix_env.gate_rank2_terms); u and w are materialized from
scalar-prefetched per-action index tables via iota compares + masked row
reductions — no matmuls, no dynamic indexing, pure VPU, so the kernel is
HBM-bandwidth-bound. (A per-env bf16 MXU-matmul kernel was tried first and
only matched the XLA batched-GEMM path: 16k serialized [64, 64] matmuls are
latency-bound.)

Measured on v5e at B=8192, 27q Clifford: this kernel reaches 2.1M steps/s —
3x SLOWER than the XLA batched-GEMM path in ops/matrix_env.apply_gates
(6.1M), because Mosaic serializes the per-env work inside a block while
XLA's batched int8 GEMM pipelines the whole batch through the MXU. It is
kept as a correctness-tested baseline for future kernel work; the production
step uses the XLA path. Equivalence is tested in interpret mode
(tests/test_pallas.py) and was verified on hardware.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vpu_kernel(d1a_ref, d1b_ref, s1a_ref, s1b_ref, t1_ref,
                d2a_ref, d2b_ref, s2a_ref, s2b_ref, t2_ref,
                actions_ref, flips_ref,
                a_ref, ainv_ref, ident_ref,
                out_a_ref, out_ainv_ref, succ_ref, *, block_b: int, D: int):
    """Row-op step. Per action, term k has destination rows (dka, dkb),
    source rows (ska, skb) and an enable flag tk; single-row terms set the
    second index to D (out of range -> zero one-hot)."""
    i = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
    ident = ident_ref[...]
    solved_bits = []
    for e in range(block_b):  # static unroll
        b = i * block_b + e
        act = actions_ref[b]
        flip = flips_ref[b]
        m = a_ref[e]          # int8 [D, D]
        minv = ainv_ref[e]

        def onehot2(ia, ib):
            return ((rows == ia).astype(jnp.int8)
                    ^ (rows == ib).astype(jnp.int8))   # [D, 1]

        def left_term(mat, u, s, on):
            # mat' = mat ^ u (s^T mat); 0/1 values -> products are ANDs and
            # int8 muls (unsupported by Mosaic) are avoided
            w = (jnp.sum((mat & s).astype(jnp.int32), axis=0, keepdims=True)
                 & 1).astype(jnp.int8)                        # [1, D]
            return mat ^ (u & w & on)

        def right_term(mat, u, s, on):
            # mat' = mat ^ (mat u) s^T
            w = (jnp.sum((mat & u.reshape(1, D)).astype(jnp.int32), axis=1,
                         keepdims=True) & 1).astype(jnp.int8)
            return mat ^ (w & s.reshape(1, D) & on)

        u1 = onehot2(d1a_ref[act], d1b_ref[act])
        s1 = onehot2(s1a_ref[act], s1b_ref[act])
        u2 = onehot2(d2a_ref[act], d2b_ref[act])
        s2 = onehot2(s2a_ref[act], s2b_ref[act])
        t1 = t1_ref[act].astype(jnp.int8)
        t2 = t2_ref[act].astype(jnp.int8)

        new_a = left_term(left_term(m, u1, s1, t1), u2, s2, t2)
        # G = I ^ (u1 s1^T ^ u2 s2^T) is an involution; the tracked inverse
        # right-multiplies by the same G
        new_i = right_term(right_term(minv, u1, s1, t1), u2, s2, t2)

        fl = flip != 0
        sel_a = jnp.where(fl, new_i, new_a)
        sel_i = jnp.where(fl, new_a, new_i)
        out_a_ref[e] = sel_a
        out_ainv_ref[e] = sel_i
        # avoid i1-vector relayouts: reduce the XOR-difference instead
        diff = jnp.sum((sel_a ^ ident).astype(jnp.int32))
        solved_bits.append((diff == 0).astype(jnp.int32))
    succ_ref[...] = jnp.stack(solved_bits).reshape(block_b, 1)


def build_rowop_tables(core):
    """Per-action scalar index tables for the vpu kernel."""
    from qiskit_gym_tpu.ops.matrix_env import gate_rank2_terms

    D = core.D
    A = core.num_actions
    cols = {k: np.full((A + 1,), D, np.int32)
            for k in ("d1a", "d1b", "s1a", "s1b", "d2a", "d2b", "s2a", "s2b")}
    on = {k: np.zeros((A + 1,), np.int32) for k in ("t1", "t2")}
    for a, gate in enumerate(core.gateset):
        U, S = gate_rank2_terms(gate, core.num_qubits, core.kind, D)
        for k in range(2):
            u_rows = np.flatnonzero(U[:, k])
            s_rows = np.flatnonzero(S[k])
            if len(u_rows) == 0:
                continue
            key = str(k + 1)
            cols[f"d{key}a"][a] = u_rows[0]
            cols[f"d{key}b"][a] = u_rows[1] if len(u_rows) > 1 else D
            cols[f"s{key}a"][a] = s_rows[0]
            cols[f"s{key}b"][a] = s_rows[1] if len(s_rows) > 1 else D
            on[f"t{key}"][a] = 1
    names = ("d1a", "d1b", "s1a", "s1b", "t1", "d2a", "d2b", "s2a", "s2b", "t2")
    table = {**cols, **on}
    return [jnp.asarray(table[k]) for k in names]


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def _vpu_call(tables, a, ainv, actions, flips, ident,
              block_b: int, interpret: bool):
    B, D, _ = a.shape
    grid = (B // block_b,)
    kernel = functools.partial(_vpu_kernel, block_b=block_b, D=D)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=12,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, D, D), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, D, D), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, D), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((block_b, D, D), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, D, D), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_b, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, D, D), jnp.int8),
            jax.ShapeDtypeStruct((B, D, D), jnp.int8),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ],
        interpret=interpret,
    )(*tables, actions.astype(jnp.int32), flips.astype(jnp.int32),
      a, ainv, ident)


def fused_step_apply(core, a, ainv, actions, flips,
                     block_b: int = 16, interpret: bool = False):
    """Apply per-env actions + inversion flips in one fused pass.

    Returns (new_a, new_ainv, success bool [B])."""
    if a.shape[0] % block_b:
        raise ValueError(
            f"batch {a.shape[0]} not divisible by block_b={block_b}: the "
            "grid would floor-truncate and leave trailing envs unwritten")
    if not hasattr(core, "_rowop_tables"):
        core._rowop_tables = tuple(build_rowop_tables(core))
    new_a, new_ainv, succ = _vpu_call(
        core._rowop_tables, a, ainv, actions, flips, core.ident,
        block_b=block_b, interpret=interpret,
    )
    return new_a, new_ainv, succ[:, 0].astype(bool)
