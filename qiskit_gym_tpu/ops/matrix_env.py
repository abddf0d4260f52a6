"""Batched GF(2) matrix envs (LinearFunction and Clifford) on device.

One core implements both families — they differ only in matrix dimension and
gate tables (kind='linear' -> n x n, kind='clifford' -> 2n x 2n phase-less
symplectic; reference semantics rust/src/envs/{linear_function,clifford}.rs).

State layout is struct-of-arrays over the env batch; every method is pure and
jit/vmap/shard_map-friendly. The transposed inverse `ct` rides along so the
reference's 50% per-step state inversion is a pair of bit-transposes + select
instead of an O(dim^3) Gauss-Jordan (see ops/__init__ docstring).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from qiskit_gym_tpu.quantum.linear import gf2_inverse
from qiskit_gym_tpu.spec.gates import parse_gateset
from qiskit_gym_tpu.spec.metrics import MetricsWeights

from .bitops import bit_transpose, pack_bits, packed_identity, unpack_bits, words_for, padded_rows
from .tables import (
    MT_1Q, MT_CX, MT_CZ, MT_SWAP,
    GateTables, MetricsTables, build_gate_tables,
)


class MatrixEnvState(NamedTuple):
    a: jnp.ndarray         # uint32 [B, R, W]   current matrix
    ct: jnp.ndarray        # uint32 [B, R, W]   transposed inverse
    depth: jnp.ndarray     # int32  [B]
    success: jnp.ndarray   # bool   [B]
    reward: jnp.ndarray    # float32[B]
    inverted: jnp.ndarray  # bool   [B]
    last_g: jnp.ndarray    # int32  [B, n]      per-qubit last gate layer
    last_c: jnp.ndarray    # int32  [B, n]      per-qubit last CX layer
    max_g: jnp.ndarray     # int32  [B]
    max_c: jnp.ndarray     # int32  [B]
    n_cnots: jnp.ndarray   # int32  [B]
    n_gates: jnp.ndarray   # int32  [B]

    @property
    def batch(self) -> int:
        return self.a.shape[0]


class MatrixEnvCore:
    """Static config + pure batched kernels for one env family instance."""

    def __init__(
        self,
        num_qubits: int,
        gateset: Sequence,
        kind: str,                      # 'linear' | 'clifford'
        depth_slope: int = 2,
        max_depth: int = 128,
        metrics_weights: Optional[dict] = None,
        add_inverts: bool = True,
    ):
        assert kind in ("linear", "clifford")
        self.kind = kind
        self.num_qubits = int(num_qubits)
        self.gateset = parse_gateset(gateset)
        self.dim = 2 * self.num_qubits if kind == "clifford" else self.num_qubits
        self.W = words_for(self.dim)
        self.R = padded_rows(self.dim)
        self.depth_slope = int(depth_slope)
        self.max_depth = int(max_depth)
        self.add_inverts = bool(add_inverts)
        self.weights = jnp.asarray(
            MetricsWeights.from_dict(metrics_weights).as_array()
        )

        t: GateTables = build_gate_tables(self.gateset, self.num_qubits, kind)
        self.perm = jnp.asarray(t.perm)
        self.mask = jnp.asarray(t.mask)
        self.xsrc = jnp.asarray(t.xsrc)
        self.perm_t = jnp.asarray(t.perm_t)
        self.mask_t = jnp.asarray(t.mask_t)
        self.xsrc_t = jnp.asarray(t.xsrc_t)
        mt = MetricsTables.build(self.gateset)
        self.mtype = jnp.asarray(mt.mtype)
        self.mq1 = jnp.asarray(mt.q1)
        self.mq2 = jnp.asarray(mt.q2)
        self.ident = jnp.asarray(packed_identity(self.dim))  # uint32 [R, W]

    # ------------------------------------------------------------ properties
    @property
    def num_actions(self) -> int:
        return len(self.gateset)

    @property
    def obs_shape(self) -> Tuple[int, int]:
        return (self.dim, self.dim)

    # ------------------------------------------------------- matrix updates
    def _apply(self, mat, action, perm, mask, xsrc):
        """mat uint32[B, R, W]; action int32[B] -> new mat."""
        p = perm[action]                                     # [B, R]
        m = mask[action]                                     # [B, R]
        s = xsrc[action]                                     # [B, R]
        permuted = jnp.take_along_axis(mat, p[:, :, None], axis=1)
        xorrow = jnp.take_along_axis(mat, s[:, :, None], axis=1)
        return permuted ^ (m[:, :, None] & xorrow)

    def apply_gates(self, a, ct, action):
        """Apply per-env actions to (state, transposed-inverse)."""
        new_a = self._apply(a, action, self.perm, self.mask, self.xsrc)
        new_ct = self._apply(ct, action, self.perm_t, self.mask_t, self.xsrc_t)
        return new_a, new_ct

    def _solved(self, a) -> jnp.ndarray:
        return jnp.all(a == self.ident[None], axis=(1, 2))

    # -------------------------------------------------------------- metrics
    def _metrics_update(self, state: MatrixEnvState, action):
        B = action.shape[0]
        bidx = jnp.arange(B)
        mtype = self.mtype[action]
        q1 = self.mq1[action]
        q2 = self.mq2[action]
        lg1 = state.last_g[bidx, q1]
        lg2 = state.last_g[bidx, q2]
        lc1 = state.last_c[bidx, q1]
        lc2 = state.last_c[bidx, q2]

        is1q = mtype == MT_1Q
        iscx = mtype == MT_CX
        iscz = mtype == MT_CZ
        issw = mtype == MT_SWAP

        m_cx = jnp.maximum(lg1, lg2) + 1
        m_sw = jnp.maximum(lg1, lg2) + 3
        m_cz = jnp.maximum(lg1, lg2 + 1) + 1
        v1 = jnp.where(is1q, lg1 + 1,
             jnp.where(iscx, m_cx,
             jnp.where(issw, m_sw, m_cz)))
        v2 = jnp.where(is1q, lg1 + 1,
             jnp.where(iscx, m_cx,
             jnp.where(issw, m_sw, m_cz + 1)))
        new_last_g = state.last_g.at[bidx, q1].set(v1).at[bidx, q2].set(v2)

        c_inc = jnp.where(issw, 3, 1)
        c_new = jnp.maximum(lc1, lc2) + c_inc
        has_cx = ~is1q
        w1 = jnp.where(has_cx, c_new, lc1)
        w2 = jnp.where(has_cx, c_new, lc2)
        new_last_c = state.last_c.at[bidx, q1].set(w1).at[bidx, q2].set(w2)

        new_max_g = jnp.maximum(state.max_g, jnp.maximum(v1, v2))
        new_max_c = jnp.maximum(state.max_c, jnp.maximum(w1, w2))

        d_gates = jnp.where(is1q | iscx, 1, 3)
        d_cnots = jnp.where(is1q, 0, jnp.where(issw, 3, 1))
        d_layers = new_max_g - state.max_g
        d_layers_c = new_max_c - state.max_c

        penalty = (
            self.weights[0] * d_cnots.astype(jnp.float32)
            + self.weights[1] * d_layers_c.astype(jnp.float32)
            + self.weights[2] * d_layers.astype(jnp.float32)
            + self.weights[3] * d_gates.astype(jnp.float32)
        )
        return state._replace(
            last_g=new_last_g,
            last_c=new_last_c,
            max_g=new_max_g,
            max_c=new_max_c,
            n_cnots=state.n_cnots + d_cnots,
            n_gates=state.n_gates + d_gates,
        ), penalty

    # ----------------------------------------------------------------- step
    def step(
        self,
        state: MatrixEnvState,
        action: jnp.ndarray,
        key: jax.Array,
        invert_override: Optional[jnp.ndarray] = None,
    ) -> MatrixEnvState:
        """One batched env step. `key` is consumed for the inversion coin-flip;
        `invert_override` (bool [B]) injects the flips for trace tests."""
        state, penalty = self._metrics_update(state, action)
        new_a, new_ct = self.apply_gates(state.a, state.ct, action)

        if self.add_inverts:
            if invert_override is None:
                flip = jax.random.bernoulli(key, 0.5, (state.batch,))
            else:
                flip = invert_override
            a_t = bit_transpose(new_a)
            ct_t = bit_transpose(new_ct)
            f3 = flip[:, None, None]
            new_a, new_ct = (
                jnp.where(f3, ct_t, new_a),
                jnp.where(f3, a_t, new_ct),
            )
            inverted = state.inverted ^ flip
        else:
            inverted = state.inverted

        depth = jnp.maximum(state.depth - 1, 0)
        success = self._solved(new_a)
        reward = jnp.where(success, 1.0, 0.0).astype(jnp.float32) - penalty
        return state._replace(
            a=new_a, ct=new_ct, depth=depth, success=success,
            reward=reward, inverted=inverted,
        )

    # ---------------------------------------------------------------- reset
    def _fresh(self, B: int) -> MatrixEnvState:
        n = self.num_qubits
        ident = jnp.tile(self.ident[None], (B, 1, 1))
        return MatrixEnvState(
            a=ident,
            ct=ident,
            depth=jnp.ones(B, jnp.int32),
            success=jnp.ones(B, bool),
            reward=jnp.ones(B, jnp.float32),
            inverted=jnp.zeros(B, bool),
            last_g=jnp.full((B, n), -1, jnp.int32),
            last_c=jnp.full((B, n), -1, jnp.int32),
            max_g=jnp.full(B, -1, jnp.int32),
            max_c=jnp.full(B, -1, jnp.int32),
            n_cnots=jnp.zeros(B, jnp.int32),
            n_gates=jnp.zeros(B, jnp.int32),
        )

    def reset(
        self,
        key: jax.Array,
        B: int,
        difficulty: jnp.ndarray,
        scramble_override: Optional[jnp.ndarray] = None,
    ) -> MatrixEnvState:
        """Scramble identity with `difficulty` random gateset actions per env.

        `scramble_override` (int32 [B, K]) injects the scramble actions (its
        static width K then bounds the loop; entries >= num_actions are
        ignored, letting tests express per-env variable-length scrambles).
        """
        state = self._fresh(B)
        difficulty = jnp.asarray(difficulty, jnp.int32)

        if scramble_override is not None:
            K = scramble_override.shape[1]

            def body(i, mats):
                a, ct = mats
                act = scramble_override[:, i]
                valid = act < self.num_actions
                act = jnp.where(valid, act, 0)
                na, nct = self.apply_gates(a, ct, act)
                v3 = valid[:, None, None]
                return jnp.where(v3, na, a), jnp.where(v3, nct, ct)

            a, ct = jax.lax.fori_loop(0, K, body, (state.a, state.ct))
        else:
            def body(i, carry):
                a, ct, k = carry
                k, sub = jax.random.split(k)
                act = jax.random.randint(sub, (B,), 0, self.num_actions)
                a, ct = self.apply_gates(a, ct, act)
                return a, ct, k

            a, ct, _ = jax.lax.fori_loop(
                0, difficulty, body, (state.a, state.ct, key)
            )

        success = self._solved(a)
        depth = jnp.minimum(self.depth_slope * difficulty, self.max_depth)
        return state._replace(
            a=a, ct=ct,
            depth=jnp.full((B,), depth, jnp.int32),
            success=success,
            reward=success.astype(jnp.float32),
        )

    # ------------------------------------------------------------- state io
    def set_state(self, dense: np.ndarray) -> MatrixEnvState:
        """Host-side: dense uint8/bool [B, dim, dim] -> device state.

        Mirrors the reference set_state semantics: depth budget = max_depth,
        metrics cleared (reference clifford.rs:299-304)."""
        dense = np.asarray(dense)
        if dense.ndim == 2:
            dense = dense[None]
        B = dense.shape[0]
        a = np.stack([pack_bits(m) for m in dense])
        ct = np.stack([pack_bits(gf2_inverse(m).T) for m in dense])
        state = self._fresh(B)
        a = jnp.asarray(a)
        success = self._solved(a)
        return state._replace(
            a=a, ct=jnp.asarray(ct),
            depth=jnp.full(B, self.max_depth, jnp.int32),
            success=success,
            reward=success.astype(jnp.float32),
        )

    # -------------------------------------------------------------- observe
    def dense(self, state: MatrixEnvState) -> jnp.ndarray:
        """uint8 [B, dim, dim] current matrices."""
        return unpack_bits(state.a, self.dim)

    def observe(self, state: MatrixEnvState, dtype=jnp.float32) -> jnp.ndarray:
        """Policy observation: [B, dim, dim] in the requested float dtype."""
        return self.dense(state).astype(dtype)

    def masks(self, state: MatrixEnvState) -> jnp.ndarray:
        """bool [B, A]: all actions legal unless already solved."""
        return jnp.broadcast_to(
            (~state.success)[:, None], (state.batch, self.num_actions)
        )

    def is_final(self, state: MatrixEnvState) -> jnp.ndarray:
        return (state.depth == 0) | state.success
