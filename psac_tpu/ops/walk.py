"""Vectorized sparse-table "walk" primitives for nearest-value searches.

These answer, for a batch of q queries over a local (s,) int32 array,
questions of the form "largest j < start with x[j] < v" or "smallest
j >= start with x[j] <= v" in O(log s) vectorized steps — one gather into a
doubling min-table per step.  They are the TPU-native replacement for the
reference's sequential stack scans inside ANSV
(reference ``include/ansv.hpp:292-405``) and for its succinct RMQ walks:
instead of a data-dependent stack, every element binary-searches the
doubling table in lockstep on the VPU.

Pure per-shard compute (no collectives); usable inside or outside shard_map.
"""

from __future__ import annotations

import jax.numpy as jnp

INT32_INF = jnp.iinfo(jnp.int32).max


def build_min_table(x):
    """Doubling min-table: table[k][i] = min(x[i : i+2**k]) (clipped at s).

    Shape (L, s) with L = ceillog2(s)+1 levels; out-of-range tail padded
    with +inf so clipped windows are correct.
    """
    s = x.shape[0]
    L = max(1, (s - 1).bit_length() + 1)
    rows = [x]
    for k in range(1, L):
        w = 1 << (k - 1)
        prev = rows[-1]
        if w >= s:
            rows.append(prev)
            continue
        shifted = jnp.concatenate(
            [prev[w:], jnp.full((w,), INT32_INF, prev.dtype)])[:s]
        rows.append(jnp.minimum(prev, shifted))
    return jnp.stack(rows)


def prev_lt(table, start, v, strict: bool = True):
    """Largest j < start with x[j] < v (strict) or x[j] <= v; -1 if none.

    start: (q,) int32 in [0, s]; v: (q,) int32. Vectorized binary descent:
    maintain the invariant that everything in [pos, start) fails the
    predicate, and extend the failing window downward by powers of two.
    """
    L = table.shape[0]
    pos = start.astype(jnp.int32)
    for k in reversed(range(L)):
        cand = pos - (1 << k)
        w = table[k][jnp.maximum(cand, 0)]
        fail = (w >= v) if strict else (w > v)
        pos = jnp.where((cand >= 0) & fail, cand, pos)
    return pos - 1


def next_leq(table, start, v, strict: bool = False):
    """Smallest j >= start with x[j] <= v (or < v if strict); s if none.

    start: (q,) int32 in [0, s]; clamped windows let the walk jump straight
    to s when the remaining suffix has no match.
    """
    L, s = table.shape
    pos = jnp.clip(start.astype(jnp.int32), 0, s)
    for k in reversed(range(L)):
        w = table[k][jnp.clip(pos, 0, s - 1)]
        fail = (w >= v) if strict else (w > v)
        pos = jnp.where((pos < s) & fail, jnp.minimum(pos + (1 << k), s), pos)
    return pos
