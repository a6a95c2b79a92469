"""Pallas TPU kernel: per-shard ANSV via a sequential run-stack scan.

The walk-based local ANSV (``psac_tpu.ops.walk``) costs O(log s) full-size
random gathers per query batch — ~1 s per walk at 4M elements on a v5e.
This kernel instead performs the classic monotone run-stack scan
(the same algorithm as the ``psac_tpu.ops.ansv`` sequential oracle) on the
TPU scalar unit: one O(s) pass produces every element's left match for any
of the three match types.

TPU constraints shape the implementation: scalar stores can only target
SMEM, so the run stack lives in SMEM (its size bounds the stack depth — the
number of live runs never exceeds the number of distinct values on an
increasing prefix-minima chain, ~max(LCP) for LCP arrays), and per-element
outputs accumulate in a register vector via one-hot selects, stored to VMEM
once per chunk.  On stack overflow a flag output tells the caller to fall
back to the walk path via ``lax.cond``.

Right matches = left matches of the reversed array (handled by the caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from psac_tpu.ops.ansv import FURTHEST_EQ, NEAREST_EQ, NEAREST_SM

CHUNK = 2048
STACK_CAP = 8192  # runs; 3 SMEM arrays x 32 KB


def _load_regs(st_v, st_first, st_last, sp, vz):
    """Load the top and below stack cells into registers.

    ``vz`` is a varying zero (derived from the kernel's input block): adding
    it promotes SMEM reads (axis-unvarying) to the input's varying-axis
    type, keeping while/fori carries uniformly typed under shard_map.
    """
    k1 = jnp.maximum(sp - 1, 0)
    k2 = jnp.maximum(sp - 2, 0)
    return tuple(x + vz for x in
                 (sp, st_v[k1], st_first[k1], st_last[k1],
                  st_v[k2], st_first[k2], st_last[k2]))


def _flush_regs(st_v, st_first, st_last, carry):
    sp, tv, tf, tl, bv, bf, bl = carry
    k1 = jnp.maximum(sp - 1, 0)
    k2 = jnp.maximum(sp - 2, 0)
    st_v[k2] = bv
    st_first[k2] = bf
    st_last[k2] = bl
    st_v[k1] = tv
    st_first[k1] = tf
    st_last[k1] = tl


def _one_elem_reg(x_ref, idx_ref, val_ref, st_v, st_first, st_last,
                  ovf_ref, ovf_slot: int, base, j, typ: int, carry, vz):
    """Register-resident variant: the top and below stack cells live in the
    fori_loop carry, so the hot path does ZERO SMEM loads (pops reload the
    new below cell; pushes flush the old below cell).  ~25% faster than the
    all-SMEM formulation on the scalar unit."""
    sp, tv, tf, tl, bv, bf, bl = carry
    v = x_ref[0, 0, j] + vz
    gi = base + j + vz

    def pcond(c2):
        return jnp.logical_and(c2[0] > 0, c2[1] > v)

    def pbody(c2):
        sp2 = c2[0] - 1
        k = jnp.maximum(sp2 - 2, 0)
        return (sp2, c2[4], c2[5], c2[6],
                st_v[k] + vz, st_first[k] + vz, st_last[k] + vz)

    sp, tv, tf, tl, bv, bf, bl = lax.while_loop(
        pcond, pbody, (sp, tv, tf, tl, bv, bf, bl))

    has = sp > 0
    if typ == NEAREST_SM:
        eq_top = has & (tv == v)
        midx = jnp.where(eq_top,
                         jnp.where(sp > 1, bl, -1),
                         jnp.where(has, tl, -1))
        mval = jnp.where(eq_top, bv, tv)
    elif typ == NEAREST_EQ:
        midx = jnp.where(has, tl, -1)
        mval = tv
    else:  # FURTHEST_EQ
        midx = jnp.where(has, tf, -1)
        mval = tv

    idx_ref[0, 0, j] = midx
    val_ref[0, 0, j] = jnp.where(midx >= 0, mval, 0)

    merge = has & (tv == v)
    ok = sp < STACK_CAP
    # on push the old below cell leaves the registers: flush it
    # (unconditional: on merge it rewrites the already-correct cell)
    k2 = jnp.maximum(sp - 2, 0)
    st_v[k2] = bv
    st_first[k2] = bf
    st_last[k2] = bl
    ovf_ref[ovf_slot] = ovf_ref[ovf_slot] | jnp.int32(
        jnp.logical_not(merge) & jnp.logical_not(ok))
    spn = jnp.where(merge, sp, jnp.minimum(sp + 1, STACK_CAP))
    return (spn,
            v,
            jnp.where(merge, tf, gi),
            gi,
            jnp.where(merge, bv, tv),
            jnp.where(merge, bf, tf),
            jnp.where(merge, bl, tl))


def _scan_kernel(x_ref, idx_ref, val_ref, flag_ref,
                 st_v, st_first, st_last, sp_ref, *, typ: int, nchunks: int):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        sp_ref[0] = 0  # stack size
        sp_ref[1] = 0  # overflow flag

    base = c * CHUNK
    vz = x_ref[0, 0, 0] * 0  # varying zero (see _load_regs)

    def body4(k, carry):
        j0 = k * 4
        for u in range(4):
            carry = _one_elem_reg(x_ref, idx_ref, val_ref, st_v, st_first,
                                  st_last, sp_ref, 1, base, j0 + u, typ,
                                  carry, vz)
        return carry

    carry = lax.fori_loop(0, CHUNK // 4, body4,
                          _load_regs(st_v, st_first, st_last, sp_ref[0],
                                     vz))
    _flush_regs(st_v, st_first, st_last, carry)
    sp_ref[0] = carry[0]

    @pl.when(c == nchunks - 1)
    def _():
        flag_ref[0] = sp_ref[1]


def _dual_kernel(x_ref, xr_ref, il_ref, vl_ref, ir_ref, vr_ref, flag_ref,
                 lv, lf, ll, rv, rf, rl, sp_ref, *,
                 typ_l: int, typ_r: int, nchunks: int):
    """Two independent run-stack scans in one kernel pass: the forward
    stream (left matches of x) and the reverse stream (left matches of
    reversed x = right matches of x).  The two scalar dependency chains are
    independent, so interleaving them fills the scalar unit's load-use
    stalls — measurably faster than two sequential passes."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        sp_ref[0] = 0
        sp_ref[1] = 0
        sp_ref[2] = 0
        sp_ref[3] = 0

    base = c * CHUNK
    vz = x_ref[0, 0, 0] * 0  # varying zero (see _load_regs)

    def body2(k, carry):
        cl, cr = carry
        j0 = k * 2
        for u in range(2):
            cl = _one_elem_reg(x_ref, il_ref, vl_ref, lv, lf, ll, sp_ref,
                               1, base, j0 + u, typ_l, cl, vz)
            cr = _one_elem_reg(xr_ref, ir_ref, vr_ref, rv, rf, rl, sp_ref,
                               3, base, j0 + u, typ_r, cr, vz)
        return (cl, cr)

    cl, cr = lax.fori_loop(
        0, CHUNK // 2, body2,
        (_load_regs(lv, lf, ll, sp_ref[0], vz),
         _load_regs(rv, rf, rl, sp_ref[2], vz)))
    _flush_regs(lv, lf, ll, cl)
    _flush_regs(rv, rf, rl, cr)
    sp_ref[0] = cl[0]
    sp_ref[2] = cr[0]

    @pl.when(c == nchunks - 1)
    def _():
        flag_ref[0] = sp_ref[1] | sp_ref[3]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def nsv_scan_dual(x, xr, typ_l: int, typ_r: int, interpret: bool = False,
                  vma: tuple = ()):
    """One-pass dual scan: left matches of ``x`` (typ_l) AND left matches
    of ``xr`` (the reversed array, giving x's right matches, typ_r).

    Returns (idx_l, val_l, idx_r, val_r, overflow); idx_r/val_r are in
    ``xr``'s (reversed) coordinates — the caller un-reverses.
    """
    s = x.shape[0]
    assert s % CHUNK == 0, s
    nchunks = s // CHUNK
    x2 = x.reshape(nchunks, 1, CHUNK)
    xr2 = xr.reshape(nchunks, 1, CHUNK)
    sblk = pl.BlockSpec((1, 1, CHUNK), lambda c: (c, 0, 0),
                        memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        functools.partial(_dual_kernel, typ_l=typ_l, typ_r=typ_r,
                          nchunks=nchunks),
        grid=(nchunks,),
        in_specs=[sblk, sblk],
        out_specs=[sblk, sblk, sblk, sblk,
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((nchunks, 1, CHUNK), jnp.int32,
                                        vma=frozenset(vma))] * 4
        + [jax.ShapeDtypeStruct((1,), jnp.int32, vma=frozenset(vma))],
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)] * 6
        + [pltpu.SMEM((4,), jnp.int32)],
        interpret=interpret,
    )(x2, xr2)
    il, vl, ir, vr, flag = outs
    return (il.reshape(s), vl.reshape(s), ir.reshape(s), vr.reshape(s),
            flag[0])


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def nsv_scan_left(x, typ: int, interpret: bool = False, vma: tuple = ()):
    """Left matches of every element of (s,) int32 ``x`` (s % 2048 == 0).

    Returns (idx, val, overflow): match indices (-1 = none), values at the
    matches, and a scalar overflow flag (nonzero => results invalid, caller
    must fall back to the walk path).  ``vma`` names the mesh axes the
    output varies over when called inside shard_map.
    """
    s = x.shape[0]
    assert s % CHUNK == 0, s
    nchunks = s // CHUNK
    x2 = x.reshape(nchunks, 1, CHUNK)
    sblk = pl.BlockSpec((1, 1, CHUNK), lambda c: (c, 0, 0),
                        memory_space=pltpu.SMEM)
    idx, val, flag = pl.pallas_call(
        functools.partial(_scan_kernel, typ=typ, nchunks=nchunks),
        grid=(nchunks,),
        in_specs=[sblk],
        out_specs=[sblk, sblk, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((nchunks, 1, CHUNK), jnp.int32,
                                 vma=frozenset(vma)),
            jax.ShapeDtypeStruct((nchunks, 1, CHUNK), jnp.int32,
                                 vma=frozenset(vma)),
            jax.ShapeDtypeStruct((1,), jnp.int32, vma=frozenset(vma)),
        ],
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32),
                        pltpu.SMEM((STACK_CAP,), jnp.int32),
                        pltpu.SMEM((STACK_CAP,), jnp.int32),
                        pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(x2)
    return idx.reshape(s), val.reshape(s), flag[0]


def scan_left(x, typ: int):
    """Backend-dispatching wrapper (interpret mode off-TPU)."""
    interpret = jax.default_backend() != "tpu"
    return nsv_scan_left(x, typ, interpret)
