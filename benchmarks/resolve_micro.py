"""Micro-benchmark: the fused LCP resolve (`_resolve_fused_local`) in
isolation at 100M rows, p=1, across query counts and width mixes — to
attribute the adversarial corpus's LCP cost (compaction sort vs chunk loop
vs scatter) without rebuilding the whole SA."""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def sync(x):
    jax.device_get(x[:4])


def main():
    import psac_tpu
    psac_tpu.enable_compile_cache()
    from psac_tpu.models.suffix_array import _get_builder
    from psac_tpu.parallel.mesh import AXIS, make_mesh

    N = int(os.environ.get("RES_N", 100_000_000))
    N -= N % 8
    mesh = make_mesh(1)
    b = _get_builder(mesh, N, (4, 4), 7, True)
    rdiv = int(os.environ.get("RES_RDIV", 32))
    m_pad = max(8, N // rdiv)
    L = int(os.environ.get("RES_L", 8))

    rng = np.random.RandomState(0)
    lcp = jnp.asarray(rng.randint(0, 3000, N).astype(np.int32))
    d = jnp.int32(2048)

    fn = jax.jit(jax.shard_map(
        functools.partial(b._resolve_fused_local, m_pad=m_pad, L=L),
        mesh=mesh, in_specs=(P(AXIS),) * 5 + (P(),),
        out_specs=P(AXIS)))

    for nq, wmix in ((600_000, "wide"), (27_000_000, "mixed"),
                     (47_000_000, "narrow")):
        rows = np.sort(rng.choice(N, nq, replace=False)).astype(np.int32)
        if wmix == "wide":
            w = rng.randint(1, 3000, nq)
        elif wmix == "mixed":
            w = np.where(rng.rand(nq) < 0.5, rng.randint(0, 8, nq),
                         rng.randint(8, 500, nq))
        else:
            w = rng.randint(0, 8, nq)
        lq = rng.randint(0, N - 3001, nq).astype(np.int32)
        rq = (lq + w).astype(np.int32)
        qkey = np.full(N, np.iinfo(np.int32).max, np.int32)
        qkey[rows] = rows
        lqf = np.zeros(N, np.int32)
        rqf = np.zeros(N, np.int32)
        lqf[rows] = lq
        rqf[rows] = rq
        jc = np.ones(N, np.int32)
        args = tuple(jnp.asarray(a) for a in (qkey, lqf, rqf, jc)) + (d,)
        out = fn(lcp, *args)
        sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(lcp, *args)
            sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"[res] nq={nq/1e6:.1f}M {wmix}: {best*1e3:.0f} ms "
              f"({best/nq*1e9:.1f} ns/q, chunks={-(-nq // m_pad)})",
              flush=True)


if __name__ == "__main__":
    main()
