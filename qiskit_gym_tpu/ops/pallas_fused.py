"""Whole-step fused Pallas TPU kernel for the bitpacked matrix env.

One kernel per step, fusing everything `MatrixEnvCore.step` does on the
bitpacked path: the per-action table decode, the GF(2) rank-2 left/right
multiplies on the packed state, the per-qubit layer-metrics update, the
random-inversion buffer swap, the solved check, and the reward — a single
HBM pass over the [B, W*D] state with no intermediate materialization.

Why this attempt is shaped differently from the two measured-and-lost
Pallas baselines (docs/PERF.md):

- `ops/pallas_step.py` (apply-only) unrolled a PYTHON LOOP over envs inside
  each block, so Mosaic serialized per-env work that XLA pipelines — 3x
  slower. Here every operation is batched [BB, lanes]: no per-env loop
  exists anywhere in the kernel.
- `ops/pallas_metrics.py` (metrics-only) lost to custom-call dispatch at
  [B, n]-sized operands. Here the dispatch is amortized over the WHOLE
  step (state update + metrics + swap + solved), the op chain XLA runs as
  several fusions with [n, B] transposes in between becomes one VMEM-
  resident pass, and the fat-table gather + its HBM round-trip disappear
  into an in-kernel one-hot MXU matmul.

Mechanics (all per-action operands come from one f32 table row, gathered
with a one-hot [BB, A+1] @ [A+1, F] matmul — exact, since every column is
a byte or a 0/1 flag):

- left multiply  a' = a ^ U (S a): the source-row combination per term is
  the PARITY of the masked state words, computed with a 5-step xor-fold
  (v ^= v>>16 ... v>>1) — no popcount, no gathers.
- right multiply ainv' = ainv ^ (ainv U) S: U's columns are one-hot combos
  of <= 2 state columns (= lanes), so the lane "gather" is an iota-compare
  mask + lane-sum over 16-bit halves (exact in int32), xor'd pairwise.
- metrics: `_metrics_update_terms` ported verbatim to [BB, n] layout —
  the B-minor transposes the XLA path pays every step vanish.

Equivalence with the XLA step is bit-exact and pinned in
tests/test_pallas_fused.py (interpret mode, W=1 and W=2 cores, plus the
27q clifford bench config). Enable with core.use_pallas_step = True or
QGT_PALLAS_STEP=1; hardware measurement gates whether it becomes the
default (docs/PERF.md).

Reference scope: this is the TPU replacement for the hot loop of the
reference's Rust env cores (reference rust/src/envs/*.rs step functions);
the reference has no analogue of a fused device step.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FULL = np.uint32(0xFFFFFFFF)
# metrics gate classes (must match ops/tables.py MT_* — asserted on build)
_MT_1Q, _MT_CX, _MT_CZ, _MT_SWAP = 0, 1, 2, 3


def build_fused_table(core) -> np.ndarray:
    """[A+1, F] f32 per-action operand table for the fused kernel.

    Layout (all exactly f32-representable):
      [0:3]                 mtype, q1, q2
      [3:3+KW4]             U32 words as 4 bytes each (k-major, w, byte)
      [.. +KW4]             S32 words as 4 bytes each
      [.. +2K]              right-mult column indices u_ka, u_kb (absent -> Dr)
      [.. +K*Dr]            Slm scatter flags (0/1), k-major
    """
    from .tables import MT_1Q, MT_CX, MT_CZ, MT_SWAP

    assert (MT_1Q, MT_CX, MT_CZ, MT_SWAP) == (_MT_1Q, _MT_CX, _MT_CZ,
                                              _MT_SWAP)
    U32 = np.asarray(core.U32)           # [A1, K, W] uint32
    S32 = np.asarray(core.S32)
    Ulm = np.asarray(core.Ulm)           # [A1, K, Dr] 0/FULL masks
    Slm = np.asarray(core.Slm)
    A1, K, W = U32.shape
    Dr = Ulm.shape[2]
    cols = [np.asarray(core.mtype, np.float32),
            np.asarray(core.mq1, np.float32),
            np.asarray(core.mq2, np.float32)]
    for T in (U32, S32):
        for k in range(K):
            for w in range(W):
                for byte in range(4):
                    cols.append(((T[:, k, w] >> (8 * byte)) & 0xFF
                                 ).astype(np.float32))
    for k in range(K):
        for slot in range(2):
            idx = np.full((A1,), Dr, np.float32)
            for a in range(A1):
                nz = np.flatnonzero(Ulm[a, k])
                if len(nz) > slot:
                    idx[a] = nz[slot]
            cols.append(idx)
    for k in range(K):
        for d in range(Dr):
            cols.append((Slm[:, k, d] != 0).astype(np.float32))
    return np.stack(cols, axis=1)


def _parity32(v):
    """Per-lane parity of uint32 words via xor-fold; result in {0, 1}."""
    v = v ^ (v >> 16)
    v = v ^ (v >> 8)
    v = v ^ (v >> 4)
    v = v ^ (v >> 2)
    v = v ^ (v >> 1)
    return v & jnp.uint32(1)


def _gather_word(m_w, oh_i32):
    """Extract the uint32 word at the one-hot lane of `m_w` [BB, Dr].

    Summed as two 16-bit halves so the int32 lane reduction is exact; an
    all-zero one-hot (absent second column) yields 0, the xor identity."""
    lo = jnp.sum((m_w & jnp.uint32(0xFFFF)).astype(jnp.int32) * oh_i32,
                 axis=1, keepdims=True)
    hi = jnp.sum((m_w >> 16).astype(jnp.int32) * oh_i32,
                 axis=1, keepdims=True)
    return lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 16)


def _fused_kernel(act_ref, flip_ref, a_ref, ainv_ref, lg_ref, lc_ref,
                  scal_ref, tab_ref, ident_ref,
                  oa_ref, oainv_ref, olg_ref, olc_ref, oscal_ref, orew_ref,
                  *, K: int, W: int, Dr: int, n: int, A1: int,
                  noop_action: int, weights: tuple):
    BB = act_ref.shape[0]
    act = act_ref[:, 0:1]                                    # [BB, 1] i32
    # Mosaic-supported cast chains only: bool -> f32 via select,
    # f32 -> u32 via i32 (the direct casts don't lower)
    oh_a = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (BB, A1), 1) == act,
        jnp.float32(1.0), jnp.float32(0.0))
    row = jnp.dot(oh_a, tab_ref[...],
                  preferred_element_type=jnp.float32)        # [BB, F]

    # ------------------------------------------------- decode the table row
    def col_u32(c):
        return row[:, c:c + 1].astype(jnp.int32).astype(jnp.uint32)

    o = 3
    U32 = [[None] * W for _ in range(K)]
    S32 = [[None] * W for _ in range(K)]
    for T in (U32, S32):
        for k in range(K):
            for w in range(W):
                T[k][w] = (col_u32(o) | (col_u32(o + 1) << 8)
                           | (col_u32(o + 2) << 16) | (col_u32(o + 3) << 24))
                o += 4
    ucol = [[None, None] for _ in range(K)]
    for k in range(K):
        for slot in range(2):
            ucol[k][slot] = row[:, o:o + 1].astype(jnp.int32)
            o += 1
    slm = []
    for k in range(K):
        slm.append(jnp.where(row[:, o:o + Dr] != 0, _FULL, jnp.uint32(0)))
        o += Dr

    # ------------------------------------------ left multiply a' = a ^ U(Sa)
    a_w = [a_ref[:, w * Dr:(w + 1) * Dr] for w in range(W)]
    acc_l = [jnp.zeros((BB, Dr), jnp.uint32) for _ in range(W)]
    for k in range(K):
        par = jnp.zeros((BB, Dr), jnp.uint32)
        for w in range(W):
            par = par ^ _parity32(a_w[w] & S32[k][w])
        rm = jnp.where(par != 0, _FULL, jnp.uint32(0))
        for w in range(W):
            acc_l[w] = acc_l[w] ^ (U32[k][w] & rm)
    new_a = [a_w[w] ^ acc_l[w] for w in range(W)]

    # --------------------------------- right multiply ainv' = ainv ^ (mU)S
    lane = jax.lax.broadcasted_iota(jnp.int32, (BB, Dr), 1)
    m_w = [ainv_ref[:, w * Dr:(w + 1) * Dr] for w in range(W)]
    acc_r = [jnp.zeros((BB, Dr), jnp.uint32) for _ in range(W)]
    for k in range(K):
        oh0 = (lane == ucol[k][0]).astype(jnp.int32)
        oh1 = (lane == ucol[k][1]).astype(jnp.int32)
        for w in range(W):
            c = _gather_word(m_w[w], oh0) ^ _gather_word(m_w[w], oh1)
            acc_r[w] = acc_r[w] ^ (c & slm[k])
    new_ainv = [m_w[w] ^ acc_r[w] for w in range(W)]

    # ------------------------------- metrics (_metrics_update_terms, B-major)
    mtype = row[:, 0:1].astype(jnp.int32)
    q1 = row[:, 1:2].astype(jnp.int32)
    q2 = row[:, 2:3].astype(jnp.int32)
    noop = act == noop_action                                # [BB, 1] bool
    qlane = jax.lax.broadcasted_iota(jnp.int32, (BB, n), 1)
    oh1q = q1 == qlane                                       # [BB, n]
    oh2q = q2 == qlane
    lg = lg_ref[...]
    lc = lc_ref[...]
    neg = jnp.int32(-(2 ** 30))
    lg1 = jnp.max(jnp.where(oh1q, lg, neg), axis=1, keepdims=True)
    lg2 = jnp.max(jnp.where(oh2q, lg, neg), axis=1, keepdims=True)
    lc1 = jnp.max(jnp.where(oh1q, lc, neg), axis=1, keepdims=True)
    lc2 = jnp.max(jnp.where(oh2q, lc, neg), axis=1, keepdims=True)

    is1q = mtype == _MT_1Q
    iscx = mtype == _MT_CX
    issw = mtype == _MT_SWAP

    m_cx = jnp.maximum(lg1, lg2) + 1
    m_sw = jnp.maximum(lg1, lg2) + 3
    m_cz = jnp.maximum(lg1, lg2 + 1) + 1
    v1 = jnp.where(is1q, lg1 + 1,
                   jnp.where(iscx, m_cx, jnp.where(issw, m_sw, m_cz)))
    v2 = jnp.where(is1q, lg1 + 1,
                   jnp.where(iscx, m_cx, jnp.where(issw, m_sw, m_cz + 1)))
    v1 = jnp.where(noop, lg1, v1)
    v2 = jnp.where(noop, lg2, v2)
    new_lg = jnp.where(oh2q, v2, jnp.where(oh1q, v1, lg))

    c_inc = jnp.where(issw, 3, 1)
    c_new = jnp.maximum(lc1, lc2) + c_inc
    has_cx = jnp.logical_and(jnp.logical_not(is1q), jnp.logical_not(noop))
    w1 = jnp.where(has_cx, c_new, lc1)
    w2 = jnp.where(has_cx, c_new, lc2)
    new_lc = jnp.where(oh2q, w2, jnp.where(oh1q, w1, lc))

    max_g = scal_ref[:, 0:1]
    max_c = scal_ref[:, 1:2]
    n_cnots = scal_ref[:, 2:3]
    n_gates = scal_ref[:, 3:4]
    depth = scal_ref[:, 4:5]
    inverted = scal_ref[:, 5:6]

    new_max_g = jnp.maximum(max_g, jnp.maximum(v1, v2))
    new_max_c = jnp.maximum(max_c, jnp.maximum(w1, w2))
    d_gates = jnp.where(noop, 0, jnp.where(jnp.logical_or(is1q, iscx), 1, 3))
    d_cnots = jnp.where(jnp.logical_or(is1q, noop), 0, jnp.where(issw, 3, 1))
    d_layers = new_max_g - max_g
    d_layers_c = new_max_c - max_c
    penalty = (weights[0] * d_cnots.astype(jnp.float32)
               + weights[1] * d_layers_c.astype(jnp.float32)
               + weights[2] * d_layers.astype(jnp.float32)
               + weights[3] * d_gates.astype(jnp.float32))

    # ----------------------------------------- inversion swap, solved, reward
    flip = flip_ref[:, 0:1] != 0                             # [BB, 1]
    diff = jnp.zeros((BB, Dr), jnp.uint32)
    for w in range(W):
        sel_a = jnp.where(flip, new_ainv[w], new_a[w])
        sel_i = jnp.where(flip, new_a[w], new_ainv[w])
        oa_ref[:, w * Dr:(w + 1) * Dr] = sel_a
        oainv_ref[:, w * Dr:(w + 1) * Dr] = sel_i
        diff = diff | (sel_a ^ ident_ref[0:1, w * Dr:(w + 1) * Dr])
    success = jnp.sum((diff != 0).astype(jnp.int32), axis=1,
                      keepdims=True) == 0                    # [BB, 1]

    olg_ref[...] = new_lg
    olc_ref[...] = new_lc
    new_depth = jnp.maximum(depth - 1, 0)
    new_inverted = inverted ^ flip.astype(jnp.int32)
    oscal_ref[...] = jnp.concatenate(
        [new_max_g, new_max_c, n_cnots + d_cnots, n_gates + d_gates,
         new_depth, new_inverted, success.astype(jnp.int32),
         jnp.zeros((BB, 1), jnp.int32)], axis=1)
    orew_ref[...] = (jnp.where(success, 1.0, 0.0).astype(jnp.float32)
                     - penalty)


@functools.partial(
    jax.jit,
    static_argnames=("K", "W", "Dr", "n", "A1", "noop_action", "weights",
                     "block_b", "interpret"))
def _fused_call(action, flip, a, ainv, lg, lc, scal, tab, ident,
                K, W, Dr, n, A1, noop_action, weights,
                block_b, interpret):
    B = a.shape[0]
    L = W * Dr
    grid = (B // block_b,)
    kernel = functools.partial(
        _fused_kernel, K=K, W=W, Dr=Dr, n=n, A1=A1,
        noop_action=noop_action, weights=weights)

    def blk(shape):
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def rep(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk((block_b, 1)), blk((block_b, 1)),
                  blk((block_b, L)), blk((block_b, L)),
                  blk((block_b, n)), blk((block_b, n)),
                  blk((block_b, 8)), rep(tab.shape), rep((1, L))],
        out_specs=[blk((block_b, L)), blk((block_b, L)),
                   blk((block_b, n)), blk((block_b, n)),
                   blk((block_b, 8)), blk((block_b, 1))],
        out_shape=[jax.ShapeDtypeStruct((B, L), jnp.uint32),
                   jax.ShapeDtypeStruct((B, L), jnp.uint32),
                   jax.ShapeDtypeStruct((B, n), jnp.int32),
                   jax.ShapeDtypeStruct((B, n), jnp.int32),
                   jax.ShapeDtypeStruct((B, 8), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), jnp.float32)],
        interpret=interpret,
    )(action, flip, a, ainv, lg, lc, scal, tab, ident)


def fused_step(core, state, action, flip, block_b: int = 512,
               interpret: bool = False):
    """Whole `MatrixEnvCore.step` as one fused kernel (bitpacked path only).

    `flip` is the precomputed inversion coin-flip (bool [B]); RNG stays
    outside the kernel so traces match the XLA path bit-for-bit. Returns a
    new MatrixEnvState."""
    if not core.bitpack or not core.add_inverts:
        raise ValueError("fused_step requires bitpack=True, add_inverts=True")
    B = state.a.shape[0]
    bb = min(block_b, B)
    while B % bb:
        bb //= 2
    if not hasattr(core, "_fused_tab"):
        core._fused_tab = jnp.asarray(build_fused_table(core))
    scal = jnp.stack([state.max_g, state.max_c, state.n_cnots, state.n_gates,
                      state.depth, state.inverted.astype(jnp.int32),
                      jnp.zeros_like(state.max_g), jnp.zeros_like(state.max_g)
                      ], axis=1)
    a, ainv, lg, lc, scal, rew = _fused_call(
        action.astype(jnp.int32)[:, None], flip.astype(jnp.int32)[:, None],
        state.a, state.ainv, state.last_g, state.last_c, scal,
        core._fused_tab, core.ident_pk[None, :],
        K=int(core.U32.shape[1]), W=int(core.W), Dr=int(core.dim),
        n=int(core.num_qubits), A1=int(core.num_actions + 1),
        noop_action=int(core.noop_action), weights=core.weights_static,
        block_b=bb, interpret=interpret)
    return state._replace(
        a=a, ainv=ainv, last_g=lg, last_c=lc,
        max_g=scal[:, 0], max_c=scal[:, 1], n_cnots=scal[:, 2],
        n_gates=scal[:, 3], depth=scal[:, 4],
        inverted=scal[:, 5].astype(bool), success=scal[:, 6].astype(bool),
        reward=rew[:, 0])
