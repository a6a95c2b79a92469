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

The stack is *type-specialized*: each match type reads only one of the
run's two endpoints (``furthest_eq`` the run FIRST, ``nearest_eq``/
``nearest_sm`` the run LAST), so each chain keeps 2 SMEM arrays
(value, endpoint) instead of 3, and only ``nearest_sm`` (whose equal-top
answer is the *below* run's last) keeps the below cell in registers.
After the pops every element's new top value is its own value (merge keeps
the equal value, push installs it), which removes most merge/push selects
from the carry update.  The overflow flag also rides in the carry and hits
SMEM once per chunk.  These halve the per-element scalar-op count vs the
generic 3-array formulation, but only buy ~12% wall time (16M dual pass:
1.20 s -> 1.07 s, CHUNK 2048 == 4096, and the dual pass now costs exactly
the sum of the two single passes): the floor is the per-element while_loop
control flow, not ALU/SMEM throughput, so further gains need a
tile-vectorized decomposition (VPU all-pairs per tile + this scan over the
compressed per-tile prefix-minima spines), not more micro-optimization.

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
STACK_CAP = 8192  # runs; 2 SMEM arrays x 32 KB per chain


def _needs_below(typ: int) -> bool:
    return typ == NEAREST_SM


def _load_regs(st_v, st_a, sp, ovf, vz, typ: int):
    """Load the register-resident stack cells for one chain.

    ``vz`` is a varying zero (derived from the kernel's input block): adding
    it promotes SMEM reads (axis-unvarying) to the input's varying-axis
    type, keeping while/fori carries uniformly typed under shard_map.
    """
    k1 = jnp.maximum(sp - 1, 0)
    cells = (sp, st_v[k1], st_a[k1])
    if _needs_below(typ):
        k2 = jnp.maximum(sp - 2, 0)
        cells = cells + (st_v[k2], st_a[k2])
    return tuple(x + vz for x in cells) + (ovf + vz,)


def _flush_regs(st_v, st_a, carry, typ: int):
    sp, tv, ta = carry[:3]
    k1 = jnp.maximum(sp - 1, 0)
    if _needs_below(typ):
        bv, ba = carry[3:5]
        k2 = jnp.maximum(sp - 2, 0)
        st_v[k2] = bv
        st_a[k2] = ba
    st_v[k1] = tv
    st_a[k1] = ta


def _one_elem(x_ref, idx_ref, val_ref, st_v, st_a,
              base, j, typ: int, carry, vz, g_ref=None):
    """One scan step with the top (and, for nearest_sm, the below) stack
    cell register-resident; the hot path does ZERO SMEM loads (pops reload
    from SMEM; pushes flush the displaced cell).  With ``g_ref`` the
    element's global index comes from an explicit index stream (the spine
    variant) instead of ``base + j``."""
    below = _needs_below(typ)
    if below:
        sp, tv, ta, bv, ba, ovf = carry
    else:
        sp, tv, ta, ovf = carry
    v = x_ref[0, 0, j] + vz
    gi = (base + j + vz) if g_ref is None else (g_ref[0, 0, j] + vz)

    # ---- pop runs with value > v -----------------------------------------
    if below:
        def pcond(c2):
            return jnp.logical_and(c2[0] > 0, c2[1] > v)

        def pbody(c2):
            sp2 = c2[0] - 1
            k = jnp.maximum(sp2 - 2, 0)
            return (sp2, c2[3], c2[4], st_v[k] + vz, st_a[k] + vz)

        sp, tv, ta, bv, ba = lax.while_loop(pcond, pbody,
                                            (sp, tv, ta, bv, ba))
    else:
        def pcond(c2):
            return jnp.logical_and(c2[0] > 0, c2[1] > v)

        def pbody(c2):
            sp2 = c2[0] - 1
            k = jnp.maximum(sp2 - 1, 0)
            return (sp2, st_v[k] + vz, st_a[k] + vz)

        sp, tv, ta = lax.while_loop(pcond, pbody, (sp, tv, ta))

    popped = (sp, tv, ta, bv, ba) if below else (sp, tv, ta)
    return _emit(idx_ref, val_ref, st_v, st_a, j, typ, popped, ovf, v, gi)


def _emit(idx_ref, val_ref, st_v, st_a, j, typ: int, popped, ovf, v, gi):
    """Post-pop output + merge/push carry update (shared by the single and
    merged-pop element steps)."""
    below = _needs_below(typ)
    if below:
        sp, tv, ta, bv, ba = popped
    else:
        sp, tv, ta = popped
    has = sp > 0
    if typ == NEAREST_SM:
        eq_top = has & (tv == v)
        midx = jnp.where(eq_top,
                         jnp.where(sp > 1, ba, -1),
                         jnp.where(has, ta, -1))
        mval = jnp.where(eq_top, bv, tv)
    else:  # FURTHEST_EQ (ta = run first) / NEAREST_EQ (ta = run last)
        midx = jnp.where(has, ta, -1)
        mval = tv
    idx_ref[0, 0, j] = midx
    val_ref[0, 0, j] = jnp.where(midx >= 0, mval, 0)

    # ---- merge into the top run, or push a new one ------------------------
    # after the pops tv <= v, so the new top's value is always v
    merge = has & (tv == v)
    ovf = ovf | jnp.int32(jnp.logical_not(merge) & (sp >= STACK_CAP))
    spn = jnp.where(merge, sp, jnp.minimum(sp + 1, STACK_CAP))
    if below:
        # the displaced below cell leaves the registers on push: flush it
        # (idempotent on merge — it rewrites the already-correct cell)
        k2 = jnp.maximum(sp - 2, 0)
        st_v[k2] = bv
        st_a[k2] = ba
        return (spn, v, gi,
                jnp.where(merge, bv, tv), jnp.where(merge, ba, ta), ovf)
    # the register top's own SMEM slot is refreshed in place (idempotent on
    # merge for FURTHEST_EQ; for NEAREST_EQ the slot goes stale on merge but
    # the register copy is authoritative until the next push rewrites it)
    k1 = jnp.maximum(sp - 1, 0)
    st_v[k1] = tv
    st_a[k1] = ta
    if typ == FURTHEST_EQ:
        return (spn, v, jnp.where(merge, ta, gi), ovf)
    return (spn, v, gi, ovf)  # NEAREST_EQ: run last = gi on merge AND push


# NB: a merged-pop variant (ONE while_loop per element with select-based
# pops serving both chains) measured SLOWER (1.17 s vs 1.07 s dual at 16M):
# the unconditional per-iteration SMEM reads + selects for both chains cost
# more than the loop-control branch they save.


def _scan_kernel(x_ref, idx_ref, val_ref, flag_ref,
                 st_v, st_a, sp_ref, *, typ: int, nchunks: int):
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
            carry = _one_elem(x_ref, idx_ref, val_ref, st_v, st_a,
                              base, j0 + u, typ, carry, vz)
        return carry

    carry = lax.fori_loop(0, CHUNK // 4, body4,
                          _load_regs(st_v, st_a, sp_ref[0], sp_ref[1], vz,
                                     typ))
    _flush_regs(st_v, st_a, carry, typ)
    sp_ref[0] = carry[0]
    sp_ref[1] = carry[-1]

    @pl.when(c == nchunks - 1)
    def _():
        flag_ref[0] = sp_ref[1]


def _dual_kernel(x_ref, xr_ref, il_ref, vl_ref, ir_ref, vr_ref, flag_ref,
                 lv, la, rv, ra, sp_ref, *,
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
            cl = _one_elem(x_ref, il_ref, vl_ref, lv, la,
                           base, j0 + u, typ_l, cl, vz)
            cr = _one_elem(xr_ref, ir_ref, vr_ref, rv, ra,
                           base, j0 + u, typ_r, cr, vz)
        return (cl, cr)

    cl, cr = lax.fori_loop(
        0, CHUNK // 2, body2,
        (_load_regs(lv, la, sp_ref[0], sp_ref[1], vz, typ_l),
         _load_regs(rv, ra, sp_ref[2], sp_ref[3], vz, typ_r)))
    _flush_regs(lv, la, cl, typ_l)
    _flush_regs(rv, ra, cr, typ_r)
    sp_ref[0] = cl[0]
    sp_ref[1] = cl[-1]
    sp_ref[2] = cr[0]
    sp_ref[3] = cr[-1]

    @pl.when(c == nchunks - 1)
    def _():
        flag_ref[0] = sp_ref[1] | sp_ref[3]


def _spine_kernel(xf_ref, gf_ref, xn_ref, gn_ref,
                  fi_ref, fv_ref, fh_ref, ni_ref, nv_ref, flag_ref,
                  lv, la, rv, ra, sp_ref, *, nchunks: int):
    """Spine variant of the dual kernel (the tile-spine engine's scalar
    phase, ``psac_tpu.ops.tansv``): a FURTHEST_EQ chain over explicit
    (value, global-index) stream 1 interleaved with a NEAREST_SM chain
    over stream 2.  The FEQ chain additionally emits each element's
    post-process run FIRST (h = leftmost visible equal including self),
    which the tile engine reads at jstar for its case-3 answers.  Padding
    entries (value = +inf) pop nothing, merge into one top run, and are
    popped by the next real element — they cost scan time but never
    corrupt real answers."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        sp_ref[0] = 0
        sp_ref[1] = 0
        sp_ref[2] = 0
        sp_ref[3] = 0

    vz = xf_ref[0, 0, 0] * 0

    def body2(k, carry):
        cl, cr = carry
        j0 = k * 2
        for u in range(2):
            j = j0 + u
            cl = _one_elem(xf_ref, fi_ref, fv_ref, lv, la, 0, j,
                           FURTHEST_EQ, cl, vz, g_ref=gf_ref)
            fh_ref[0, 0, j] = cl[2]  # run first after merge/push
            cr = _one_elem(xn_ref, ni_ref, nv_ref, rv, ra, 0, j,
                           NEAREST_SM, cr, vz, g_ref=gn_ref)
        return (cl, cr)

    cl, cr = lax.fori_loop(
        0, CHUNK // 2, body2,
        (_load_regs(lv, la, sp_ref[0], sp_ref[1], vz, FURTHEST_EQ),
         _load_regs(rv, ra, sp_ref[2], sp_ref[3], vz, NEAREST_SM)))
    _flush_regs(lv, la, cl, FURTHEST_EQ)
    _flush_regs(rv, ra, cr, NEAREST_SM)
    sp_ref[0] = cl[0]
    sp_ref[1] = cl[-1]
    sp_ref[2] = cr[0]
    sp_ref[3] = cr[-1]

    @pl.when(c == nchunks - 1)
    def _():
        flag_ref[0] = sp_ref[1] | sp_ref[3]


@functools.partial(jax.jit, static_argnums=(4, 5))
def nsv_scan_spine(xf, gf, xn, gn, interpret: bool = False, vma: tuple = ()):
    """Run-stack scan over two compacted spine streams (see
    ``_spine_kernel``): FURTHEST_EQ left matches of stream (xf, gf) and
    NEAREST_SM left matches of stream (xn, gn), with answers expressed in
    the streams' explicit global indices.

    Returns (f_idx, f_val, f_h, n_idx, n_val, overflow); idx = -1 when no
    match; f_h = the FEQ element's own run head (leftmost visible equal,
    itself if none).
    """
    s = xf.shape[0]
    assert s % CHUNK == 0, s
    nchunks = s // CHUNK

    def shape(a):
        return a.reshape(nchunks, 1, CHUNK)

    sblk = pl.BlockSpec((1, 1, CHUNK), lambda c: (c, 0, 0),
                        memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        functools.partial(_spine_kernel, nchunks=nchunks),
        grid=(nchunks,),
        in_specs=[sblk] * 4,
        out_specs=[sblk] * 5 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((nchunks, 1, CHUNK), jnp.int32,
                                        vma=frozenset(vma))] * 5
        + [jax.ShapeDtypeStruct((1,), jnp.int32, vma=frozenset(vma))],
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)] * 4
        + [pltpu.SMEM((4,), jnp.int32)],
        interpret=interpret,
    )(shape(xf), shape(gf), shape(xn), shape(gn))
    fi, fv, fh, ni, nv, flag = outs
    return (fi.reshape(s), fv.reshape(s), fh.reshape(s),
            ni.reshape(s), nv.reshape(s), flag[0])


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
        scratch_shapes=[pltpu.SMEM((STACK_CAP,), jnp.int32)] * 4
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
                        pltpu.SMEM((2,), jnp.int32)],
        interpret=interpret,
    )(x2)
    return idx.reshape(s), val.reshape(s), flag[0]


def scan_left(x, typ: int):
    """Backend-dispatching wrapper (interpret mode off-TPU)."""
    interpret = jax.default_backend() != "tpu"
    return nsv_scan_left(x, typ, interpret)
