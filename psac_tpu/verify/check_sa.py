"""Suffix-array correctness checks (reference include/check_suffix_array.hpp).

Three tiers, mirroring the reference's strategy (SURVEY.md §4):

1. ``check_sa_np`` / ``check_lcp_np`` — sequential property checks on host
   (the reference's ``check_SA``/``check_lcp``,
   ``include/check_suffix_array.hpp:55-126``).
2. ``d_check_sa`` — fully distributed check that never gathers: SA is a
   permutation (scatter-count), ISA is its inverse, and the order
   invariants hold via one character gather + halo compare (the
   reference's ``d_check_sa``, ``include/check_suffix_array.hpp:206-267``).
3. The native SA-IS oracle (``psac_tpu.native``) for byte-identical
   comparison — used by ``bench.py`` and the CLI ``-c`` flags.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from psac_tpu.parallel.collectives import global_index_base, halo_from_right
from psac_tpu.parallel.mesh import AXIS, mesh_key, num_shards
from psac_tpu.parallel.route import route_apply, route_scatter


def check_sa_np(text: bytes, sa: np.ndarray) -> bool:
    """SA is the sorted suffix order: permutation + order + rank tiebreak."""
    t = np.frombuffer(text, np.uint8) if isinstance(text, (bytes, bytearray)) \
        else np.asarray(text, np.uint8)
    n = len(t)
    sa = np.asarray(sa, np.int64)
    if len(sa) != n or n == 0:
        return len(sa) == n
    if not np.array_equal(np.sort(sa), np.arange(n)):
        return False
    rank = np.empty(n + 1, np.int64)
    rank[sa] = np.arange(n)
    rank[n] = -1  # empty suffix is smallest
    a, b = sa[:-1], sa[1:]
    ca, cb = t[a], t[b]
    # first chars non-decreasing; on equal first char, the rank of the
    # one-shorter suffixes must increase (the reference's ISA condition)
    ra = rank[np.minimum(a + 1, n)]
    rb = rank[np.minimum(b + 1, n)]
    ra = np.where(a + 1 >= n, -1, ra)
    rb = np.where(b + 1 >= n, -1, rb)
    return bool(np.all((ca < cb) | ((ca == cb) & (ra < rb))))


def check_lcp_np(text: bytes, sa: np.ndarray, lcp: np.ndarray) -> bool:
    from psac_tpu.ops.oracle import lcp_kasai
    return np.array_equal(np.asarray(lcp, np.int64), lcp_kasai(text, sa))


def _d_check_local(sa_l, xs_l, *, s: int, p: int, n: int):
    N = s * p
    off = N - n
    g = global_index_base(s) + jnp.arange(s, dtype=jnp.int32)
    real = g >= off

    # (1) permutation: n real values scattered onto n real rows with every
    # row hit at least once <=> exactly once (pigeonhole)
    dest = jnp.where(real, sa_l + off, g)  # map text pos -> padded row space
    (hits,) = route_scatter(dest, (jnp.ones((s,), jnp.int32),),
                            (jnp.zeros((s,), jnp.int32),), real, s, p,
                            combine=("max",))
    missed = jnp.sum((real & (hits == 0)).astype(jnp.int32))
    perm_ok = lax.psum(missed, AXIS) == 0

    # (2) order invariants via ISA: rank[pos] = row of pos in SA
    rank = jnp.zeros((s,), jnp.int32)
    (rank,) = route_scatter(dest, (g,), (rank,), real, s, p)
    # rank array indexed by padded row space (text pos + off)

    def gather(arr):
        def fn(idx, valid):
            r = lax.axis_index(AXIS).astype(jnp.int32)
            safe = jnp.clip(jnp.where(valid, idx, 0), 0, N - 1)
            d2 = jnp.where(valid, safe // s, r)

            def answer(recv, recv_valid):
                (q,) = recv
                return (arr[jnp.clip(q - r * s, 0, s - 1)],)

            (out,) = route_apply((safe,), d2, answer, (jnp.int32,), p)
            return jnp.where(valid, out, 0)
        return fn

    # chars at SA[i] and ranks of SA[i]+1
    ch = gather(xs_l)(sa_l, real)
    nxt_exists = real & (sa_l + 1 < n)
    rk1 = gather(rank)(jnp.where(nxt_exists, sa_l + 1 + off, 0), nxt_exists)
    rk1 = jnp.where(nxt_exists, rk1, -1)

    halo_c = halo_from_right(ch, 1, p, fill=0)
    halo_r = halo_from_right(rk1, 1, p, fill=0)
    halo_real = halo_from_right(real, 1, p, fill=False)
    nc = jnp.concatenate([ch[1:], halo_c])
    nr = jnp.concatenate([rk1[1:], halo_r])
    nreal = jnp.concatenate([real[1:], halo_real])
    pair = real & nreal
    ok_pair = (~pair) | (ch < nc) | ((ch == nc) & (rk1 < nr))
    order_ok = lax.psum(jnp.sum((~ok_pair).astype(jnp.int32)), AXIS) == 0
    return perm_ok & order_ok


_CHECK_CACHE: dict = {}


def d_check_sa(dsa, xs) -> bool:
    """Distributed SA check on device arrays (nothing gathered to host)."""
    p = num_shards(dsa.mesh)
    key = (mesh_key(dsa.mesh), dsa.N, dsa.n)
    if key not in _CHECK_CACHE:
        fn = jax.shard_map(
            functools.partial(_d_check_local, s=dsa.N // p, p=p, n=dsa.n),
            mesh=dsa.mesh, in_specs=(P(AXIS), P(AXIS)), out_specs=P())
        _CHECK_CACHE[key] = jax.jit(fn)
    return bool(_CHECK_CACHE[key](dsa.sa, xs))
