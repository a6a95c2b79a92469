"""Local and distributed RMQ vs exhaustive NumPy checks (cf. reference test_rmq.cpp)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from psac_tpu.ops.rmq import INT32_INF, build_local_rmq, query_local_rmq
from psac_tpu.parallel.mesh import AXIS, block_sharding
from psac_tpu.parallel.collectives import shard_minima
from psac_tpu.parallel.par_rmq import bulk_rmq_local


def test_local_rmq_exhaustive():
    rng = np.random.RandomState(0)
    for s, block in [(16, 4), (64, 8), (256, None)]:
        x = rng.randint(0, 100, size=s).astype(np.int32)
        los, his = [], []
        for lo in range(s):
            for hi in range(lo, s):
                los.append(lo)
                his.append(hi)
        los, his = np.array(los, np.int32), np.array(his, np.int32)

        @jax.jit
        def run(xv, lov, hiv):
            rmq = build_local_rmq(xv, block)
            return query_local_rmq(rmq, lov, hiv)

        got = np.asarray(run(jnp.asarray(x), jnp.asarray(los), jnp.asarray(his)))
        want = np.array([x[lo:hi + 1].min() for lo, hi in zip(los, his)])
        np.testing.assert_array_equal(got, want)


def test_bulk_rmq_distributed(mesh8):
    N, p = 128, 8
    s = N // p
    rng = np.random.RandomState(5)
    x = rng.randint(0, 1000, size=N).astype(np.int32)
    nq = N  # one query per element slot
    lo = rng.randint(0, N, size=nq).astype(np.int32)
    hi = (lo + rng.randint(0, N, size=nq)).clip(max=N - 1).astype(np.int32)
    valid = np.ones(nq, bool)
    valid[5] = False

    def inner(xv, lov, hiv, vv):
        rmq = build_local_rmq(xv)
        smins = shard_minima(xv, p)
        return bulk_rmq_local(rmq, smins, lov, hiv, vv, s, p)

    f = jax.jit(jax.shard_map(inner, mesh=mesh8, in_specs=(P(AXIS),) * 4, out_specs=P(AXIS)))
    got = np.asarray(f(*[jax.device_put(a, block_sharding(mesh8)) for a in (x, lo, hi, valid)]))
    want = np.array([x[l:h + 1].min() if v else INT32_INF for l, h, v in zip(lo, hi, valid)])
    np.testing.assert_array_equal(got, want)


def test_arg_rmq_bruteforce():
    """Leftmost-argmin RMQ vs brute force (heavy ties + wide values)."""
    import jax.numpy as jnp
    import numpy as np
    from psac_tpu.ops.rmq import build_arg_rmq, query_arg_rmq

    rng = np.random.RandomState(0)
    for s, vmax in [(64, 5), (256, 8), (1024, 4), (512, 10**6)]:
        x = rng.randint(0, vmax, size=s).astype(np.int32)
        r = build_arg_rmq(jnp.array(x))
        qs = [(l, h) for l in range(0, s, 7) for h in range(l, s, 13)]
        lo = jnp.array([q[0] for q in qs], jnp.int32)
        hi = jnp.array([q[1] for q in qs], jnp.int32)
        got = np.asarray(query_arg_rmq(r, lo, hi))
        want = np.array([q[0] + int(np.argmin(x[q[0]:q[1] + 1])) for q in qs])
        np.testing.assert_array_equal(got, want)
