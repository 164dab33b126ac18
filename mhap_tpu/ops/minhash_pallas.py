"""Pallas TPU kernel for the weighted-MinHash xorshift min-reduction.

The hottest loop of the overlapper (sketch/MinHashSketch.java:134-153,
SURVEY.md section 3.1 "HOTTEST LOOP").  The XLA scan formulation
(ops/minhash.py) round-trips the [B, n] stream state through HBM on every
slot step; this kernel keeps the stream state, window minima, and
selection masks resident in VMEM for the whole 512-slot loop -- one HBM
read of the inputs, one HBM write of the [B, H] sketch.

Grid: one program per BT-row batch tile.  Per slot: ``w_max`` statically
unrolled xorshift advances + masked signed-64-bit window minima on
(hi, lo) uint32 pairs, then a lexicographic (value, tiebreak) argmin over
the k-mer axis.  Identical results to ops/minhash.weighted_min_reduce
(same selection rules); used when w_max fits the unroll budget.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import u64

import numpy as np

U32 = jnp.uint32
I32 = jnp.int32
# plain numpy scalars: jnp constants would be captured tracers in pallas
_SIGN = np.uint32(0x80000000)
_UMAX = np.uint32(0xFFFFFFFF)
_IMAX = np.int32(0x7FFFFFFF)


def _make_kernel(num_hashes: int, w_max: int):
    def kernel(hi_ref, lo_ref, w_ref, act_ref, tb_ref, out_ref, acc_ref):
        key_hi = hi_ref[:]
        key_lo = lo_ref[:]
        w = w_ref[:]
        act = act_ref[:] != 0
        tb = tb_ref[:]
        BT = key_hi.shape[0]

        def one_slot(s, xh, xl):
            wm_hi = jnp.full_like(xh, _UMAX)
            wm_lo = jnp.full_like(xl, _UMAX)
            for t in range(w_max):
                nh, nl = u64.xorshift((xh, xl))
                adv = t < w
                xh = jnp.where(adv, nh, xh)
                xl = jnp.where(adv, nl, xl)
                vh = nh ^ _SIGN  # signed 64-bit order == unsigned on ^hi
                less = (vh < wm_hi) | ((vh == wm_hi) & (nl < wm_lo))
                upd = adv & less
                wm_hi = jnp.where(upd, vh, wm_hi)
                wm_lo = jnp.where(upd, nl, wm_lo)
            wm_hi = jnp.where(act, wm_hi, _UMAX)
            wm_lo = jnp.where(act, wm_lo, _UMAX)

            # mosaic has no unsigned reductions: reduce in sign-flipped
            # int32 space (order-preserving bijection with uint32)
            def umin(x, keep=True):
                s_ = (x ^ _SIGN).astype(I32)
                return jnp.min(s_, axis=1, keepdims=keep).astype(U32) ^ _SIGN

            def umax_sel(mask, x):
                s_ = jnp.where(mask, (x ^ _SIGN).astype(I32), -_IMAX - 1)
                return jnp.max(s_, axis=1).astype(U32) ^ _SIGN

            # lexicographic argmin over k-mers: (value, tiebreak)
            m_hi = umin(wm_hi)
            m1 = wm_hi == m_hi
            m_lo = umin(jnp.where(m1, wm_lo, _UMAX))
            m2 = m1 & (wm_lo == m_lo)
            widx = jnp.min(jnp.where(m2, tb, _IMAX), axis=1, keepdims=True)
            sel = m2 & (tb == widx)
            klo = umax_sel(sel, key_lo)
            khi = umax_sel(sel, key_hi)
            val = jnp.where(s % 2 == 0, klo, khi).astype(I32)
            return val, xh, xl

        # accumulate into a [num_hashes, BT] VMEM scratch with
        # sublane-aligned 8-row group stores; one transpose at the end
        # (lane-dim dynamic stores would need 128-aligned offsets)
        def group_body(g, carry):
            xh, xl = carry
            rows = []
            for j in range(8):
                val, xh, xl = one_slot(g * 8 + j, xh, xl)
                rows.append(val)
            tile = jnp.stack(rows, axis=0)  # [8, BT]
            acc_ref[pl.ds(pl.multiple_of(g * 8, 8), 8), :] = tile
            return xh, xl

        jax.lax.fori_loop(0, num_hashes // 8, group_body, (key_hi, key_lo))
        out_ref[:] = acc_ref[:].T

    return kernel


def _make_w1_kernel(num_hashes: int):
    """Specialized w=1 rung (the common case: rows without repeated
    k-mers; pipeline/overlapper._sketch_core).  With every weight 1 the
    window minimum IS the slot value and -- xorshift64 being a bijection
    -- value ties only occur between copies of the same k-mer, so the
    tiebreak machinery drops out entirely: 3 lane reductions per slot
    (min hi, masked min lo, one masked-max key extraction of the half the
    slot's parity stores) instead of the generic kernel's 6."""

    def kernel(hi_ref, lo_ref, act_ref, out_ref, acc_ref):
        key_hi = hi_ref[:]
        key_lo = lo_ref[:]
        inact = act_ref[:] == 0

        def umin(x):
            s_ = (x ^ _SIGN).astype(I32)
            return jnp.min(s_, axis=1, keepdims=True).astype(U32) ^ _SIGN

        def umax_sel(mask, x):
            s_ = jnp.where(mask, (x ^ _SIGN).astype(I32), -_IMAX - 1)
            return jnp.max(s_, axis=1).astype(U32) ^ _SIGN

        def one_slot(j, xh, xl):
            nh, nl = u64.xorshift((xh, xl))
            vh = jnp.where(inact, _UMAX, nh ^ _SIGN)
            vl = jnp.where(inact, _UMAX, nl)
            m_hi = umin(vh)
            m1 = vh == m_hi
            m_lo = umin(jnp.where(m1, vl, _UMAX))
            sel = m1 & (vl == m_lo)
            # slot parity is static per unrolled j: even slots store the
            # low half of the winning k-mer's hash, odd the high half
            val = umax_sel(sel, key_lo if j % 2 == 0 else key_hi)
            return val.astype(I32), nh, nl

        def group_body(g, carry):
            xh, xl = carry
            rows = []
            for j in range(8):
                val, xh, xl = one_slot(j, xh, xl)
                rows.append(val)
            tile = jnp.stack(rows, axis=0)  # [8, BT]
            acc_ref[pl.ds(pl.multiple_of(g * 8, 8), 8), :] = tile
            return xh, xl

        jax.lax.fori_loop(0, num_hashes // 8, group_body, (key_hi, key_lo))
        out_ref[:] = acc_ref[:].T

    return kernel


@partial(jax.jit, static_argnames=("num_hashes", "block_rows", "interpret"))
def min_reduce_w1_pallas(hi, lo, active, *, num_hashes: int,
                         block_rows: int = 8, interpret: bool = False):
    """w_max == 1 variant of weighted_min_reduce_pallas: every active lane
    has weight exactly 1 (duplicate positions of the same k-mer may all be
    active -- they tie to the same value and the same stored key).
    Bit-identical to weighted_min_reduce(..., weight=1, w_max=1)."""
    if num_hashes % 8:
        raise ValueError("num_hashes must be a multiple of 8 for the "
                         "pallas kernel")
    B, n = hi.shape
    BT = block_rows
    pad_b = (-B) % BT
    pad_n = (-n) % 128
    if pad_b or pad_n:
        padc = lambda a, v: jnp.pad(a, ((0, pad_b), (0, pad_n)),
                                    constant_values=v)
        hi = padc(hi, 0)
        lo = padc(lo, 0)
        active = padc(active, False)
    Bp, np_ = hi.shape

    out = pl.pallas_call(
        _make_w1_kernel(num_hashes),
        grid=(Bp // BT,),
        in_specs=[pl.BlockSpec((BT, np_), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((BT, num_hashes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, num_hashes), jnp.int32),
        scratch_shapes=[pltpu.VMEM((num_hashes, BT), jnp.int32)],
        interpret=interpret,
    )(hi, lo, active.astype(I32))
    return out[:B]


@partial(jax.jit, static_argnames=("num_hashes", "w_max", "block_rows",
                                   "interpret"))
def weighted_min_reduce_pallas(hi, lo, weight, active, tiebreak, *,
                               num_hashes: int, w_max: int,
                               block_rows: int = 8,
                               interpret: bool = False):
    """Same contract as ops/minhash.weighted_min_reduce.

    hi/lo [B, n] uint32, weight/tiebreak [B, n] int32, active [B, n] bool.
    n should be a multiple of 128 and B of block_rows (callers pad with
    active=False rows/columns).
    """
    if num_hashes % 8:
        raise ValueError("num_hashes must be a multiple of 8 for the "
                         "pallas kernel")
    B, n = hi.shape
    BT = block_rows
    pad_b = (-B) % BT
    pad_n = (-n) % 128
    if pad_b or pad_n:
        padc = lambda a, v: jnp.pad(a, ((0, pad_b), (0, pad_n)),
                                    constant_values=v)
        hi = padc(hi, 0)
        lo = padc(lo, 0)
        weight = padc(weight, 0)
        active = padc(active, False)
        tiebreak = padc(tiebreak, _IMAX)
    Bp, np_ = hi.shape

    w = jnp.where(active, weight, 0).astype(I32)
    out = pl.pallas_call(
        _make_kernel(num_hashes, w_max),
        grid=(Bp // BT,),
        in_specs=[pl.BlockSpec((BT, np_), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec((BT, num_hashes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, num_hashes), jnp.int32),
        scratch_shapes=[pltpu.VMEM((num_hashes, BT), jnp.int32)],
        interpret=interpret,
    )(hi, lo, w, active.astype(I32), tiebreak)
    return out[:B]
