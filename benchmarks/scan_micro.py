"""Micro-benchmark: the Pallas run-stack ANSV scan kernel on real LCP input.

Times the dual (FURTHEST_EQ, NEAREST_SM) pass — the suffix tree's ANSV —
at 2^24 random-DNA LCP, plus the single-direction kernels, so kernel
changes can be A/B'd without rebuilding the whole ST.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.device_get(x[:4])


def main():
    import psac_tpu
    psac_tpu.enable_compile_cache()
    from psac_tpu.models.suffix_array import construct_device, encode_and_shard
    from psac_tpu.ops.alphabet import rand_dna
    from psac_tpu.ops.ansv import FURTHEST_EQ, NEAREST_EQ, NEAREST_SM
    from psac_tpu.ops.nsv_scan import nsv_scan_dual, nsv_scan_left
    from psac_tpu.parallel.mesh import make_mesh

    n = 1 << int(os.environ.get("SCAN_MICRO_E", 24))
    mesh = make_mesh(1)
    text = rand_dna(n, seed=42)
    xs, alpha, n_, N = encode_and_shard(text, mesh)
    dsa = construct_device(xs, alpha, n_, N, mesh)
    # re-put as plain single-device arrays: pallas_call outside shard_map
    # rejects mesh-sharded operands
    lcp = jnp.asarray(np.asarray(jax.device_get(dsa.lcp), np.int32))
    lcpr = lcp[::-1]
    print("devices:", jax.devices(), flush=True)

    def bench(fn, *args, reps=3, tag=""):
        out = fn(*args)
        sync(out[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out[0])
            best = min(best, time.perf_counter() - t0)
        ovf = int(jax.device_get(out[-1]))
        print(f"[micro] {tag}: {best*1e3:.0f} ms (ovf={ovf})", flush=True)
        return best

    bench(lambda a, b: nsv_scan_dual(a, b, FURTHEST_EQ, NEAREST_SM),
          lcp, lcpr, tag="dual FE/NSM 2^%d" % n.bit_length())
    bench(lambda a: nsv_scan_left(a, FURTHEST_EQ), lcp, tag="left FE")
    bench(lambda a: nsv_scan_left(a, NEAREST_SM), lcp, tag="left NSM")
    bench(lambda a: nsv_scan_left(a, NEAREST_EQ), lcp, tag="left NE")

    # correctness spot check vs the sequential oracle on a small slice
    from psac_tpu.ops.ansv import NONSV as SEQ_NONSV
    from psac_tpu.ops.ansv import _left_scan
    a = np.asarray(jax.device_get(lcp[: 1 << 14]))
    il, vl, ir, vr, ovf = jax.device_get(
        nsv_scan_dual(jnp.asarray(a), jnp.asarray(a[::-1]),
                      FURTHEST_EQ, NEAREST_SM))
    ref_l = _left_scan(a, FURTHEST_EQ)
    ref_r = _left_scan(a[::-1], NEAREST_SM)
    ref_l = np.where(ref_l == SEQ_NONSV, -1, ref_l)
    ref_r = np.where(ref_r == SEQ_NONSV, -1, ref_r)
    assert np.array_equal(il, ref_l), "FE mismatch"
    assert np.array_equal(ir, ref_r), "NSM mismatch"
    print("[micro] oracle spot-check ok", flush=True)


if __name__ == "__main__":
    main()
