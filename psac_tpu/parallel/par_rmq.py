"""Distributed bulk range-minimum queries (reference include/par_rmq.hpp equivalent).

Answers q global inclusive ranges [l, r] over a block-distributed int32 array.
Same decomposition as the reference's ``bulk_rmq_v2`` (``par_rmq.hpp:199-332``):
per-shard local RMQ + replicated per-shard minima + a left/middle/right split
per query — but the MPI all2allv query routing becomes two capacity-padded
all-to-all round trips (``route_apply``):

  * every query is shipped to shard(l): same-shard queries are answered
    entirely by the local RMQ; cross-shard queries get min(suffix-part, middle)
    (middle from the replicated shard minima);
  * cross-shard queries are also shipped to shard(r) for the prefix part;
  * the two partials are min-combined at the issuing shard.

Runs inside shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from psac_tpu.ops.rmq import INT32_INF, LocalRMQ, query_local_rmq
from psac_tpu.parallel.mesh import AXIS
from psac_tpu.parallel.route import route_apply


def bulk_rmq_local(rmq: LocalRMQ, shard_mins, l, r, valid, s: int, p: int,
                   cap: int | None = None, with_overflow: bool = False):
    """Min over global ranges [l, r] (inclusive); (q,) queries per shard.

    Args:
      rmq: this shard's LocalRMQ over its (s,) block.
      shard_mins: (p,) replicated per-shard minima.
      l, r: (q,) int32 global endpoints, l <= r; invalid entries arbitrary.
      valid: (q,) bool.
      cap: per-destination routing capacity (see ``route_apply``; default q =
        never overflows but allocates O(p*q) exchange buffers — the
        imbalance the reference reports at ``bulk_rma.hpp:27-35``).  Invalid
        queries are never routed and consume no capacity.
      with_overflow: also return the psum'd count of capacity-dropped
        queries so the caller can retry the jitted call with a larger cap.
    Returns:
      (q,) minima (INF at invalid entries); plus the overflow count if
      requested.
    """
    INF = jnp.iinfo(rmq.x.dtype).max
    l = jnp.where(valid, l, 0)
    r = jnp.where(valid, r, 0)
    shard_l = (l // s).astype(jnp.int32)
    shard_r = (r // s).astype(jnp.int32)
    cross = shard_l != shard_r

    def answer_left(recv, recv_valid):
        rl, rr = recv
        q_shard_l = (rl // s).astype(jnp.int32)
        q_shard_r = (rr // s).astype(jnp.int32)
        base = lax.axis_index(AXIS).astype(rl.dtype) * s
        lo = jnp.clip(rl - base, 0, s - 1).astype(jnp.int32)
        hi_same = jnp.clip(rr - base, 0, s - 1).astype(jnp.int32)
        q_cross = q_shard_l != q_shard_r
        hi = jnp.where(q_cross, s - 1, hi_same)
        part = query_local_rmq(rmq, lo, hi)
        # middle shards (q_shard_l, q_shard_r) exclusive, from replicated minima
        sh = jnp.arange(p, dtype=jnp.int32)[None, :]
        mid_mask = (sh > q_shard_l[:, None]) & (sh < q_shard_r[:, None])
        mid = jnp.min(jnp.where(mid_mask, shard_mins[None, :], INF), axis=1)
        ans = jnp.where(q_cross, jnp.minimum(part, mid), part)
        return (jnp.where(recv_valid, ans, INF),)

    (left_ans,), ovf_l = route_apply((l, r), shard_l, answer_left,
                                     (rmq.x.dtype,), p, cap=cap,
                                     skip=~valid, with_overflow=True)

    def answer_right(recv, recv_valid):
        (rr,) = recv
        base = lax.axis_index(AXIS).astype(rr.dtype) * s
        hi = jnp.clip(rr - base, 0, s - 1).astype(jnp.int32)
        ans = query_local_rmq(rmq, jnp.zeros_like(hi), hi)
        return (jnp.where(recv_valid, ans, INF),)

    (right_ans,), ovf_r = route_apply((r,), shard_r, answer_right,
                                      (rmq.x.dtype,), p, cap=cap,
                                      skip=~(valid & cross),
                                      with_overflow=True)
    right_ans = jnp.where(cross, right_ans, INF)

    # skipped/overflowed answers come back as 0, which would win the min —
    # mask both partials to INF wherever they were not actually computed
    left_ans = jnp.where(valid, left_ans, INF)
    out = jnp.minimum(left_ans, right_ans)
    if with_overflow:
        return jnp.where(valid, out, INF), ovf_l + ovf_r
    return jnp.where(valid, out, INF)
