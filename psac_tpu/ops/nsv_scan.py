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


def _scan_kernel(x_ref, idx_ref, val_ref, flag_ref,
                 st_v, st_first, st_last, sp_ref, *, typ: int, nchunks: int):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        sp_ref[0] = 0  # stack size
        sp_ref[1] = 0  # overflow flag

    base = c * CHUNK

    def body(j, _):
        v = x_ref[0, 0, j]  # x block lives in SMEM: dynamic scalar reads OK
        gi = base + j

        def cond(sp):
            return jnp.logical_and(sp > 0, st_v[sp - 1] > v)

        sp = lax.while_loop(cond, lambda sp: sp - 1, sp_ref[0])

        top_v = st_v[jnp.maximum(sp - 1, 0)]
        top_first = st_first[jnp.maximum(sp - 1, 0)]
        top_last = st_last[jnp.maximum(sp - 1, 0)]
        below_last = st_last[jnp.maximum(sp - 2, 0)]
        below_v = st_v[jnp.maximum(sp - 2, 0)]
        has = sp > 0
        if typ == NEAREST_SM:
            eq_top = has & (top_v == v)
            midx = jnp.where(eq_top,
                             jnp.where(sp > 1, below_last, -1),
                             jnp.where(has, top_last, -1))
            mval = jnp.where(eq_top, below_v, top_v)
        elif typ == NEAREST_EQ:
            midx = jnp.where(has, top_last, -1)
            mval = top_v
        else:  # FURTHEST_EQ: leftmost member of the matched run
            midx = jnp.where(has, top_first, -1)
            mval = top_v

        idx_ref[0, 0, j] = midx
        val_ref[0, 0, j] = jnp.where(midx >= 0, mval, 0)

        # merge into an equal run or push a new run — all stores are
        # unconditional (branch regions cost more than clobber-safe writes):
        # on merge, st_v[slot] == v already and st_first keeps the old head
        merge = has & (top_v == v)
        ok = sp < STACK_CAP
        slot = jnp.where(merge, sp - 1, jnp.where(ok, sp, STACK_CAP - 1))
        st_v[slot] = v
        st_first[slot] = jnp.where(merge, top_first, gi)
        st_last[slot] = gi
        sp_ref[1] = sp_ref[1] | jnp.int32(
            jnp.logical_not(merge) & jnp.logical_not(ok))
        sp_ref[0] = jnp.where(merge, sp, jnp.minimum(sp + 1, STACK_CAP))
        return 0

    def body4(k, _):
        j0 = k * 4
        body(j0, 0)
        body(j0 + 1, 0)
        body(j0 + 2, 0)
        body(j0 + 3, 0)
        return 0

    lax.fori_loop(0, CHUNK // 4, body4, 0)

    @pl.when(c == nchunks - 1)
    def _():
        flag_ref[0] = sp_ref[1]


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
