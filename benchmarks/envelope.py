"""Benchmark envelope beyond the headline bench.py config.

Modes (select with argv[1]):
  chip     — real-TPU single-chip runs: SA+LCP at 2^24..2^28 random DNA,
             repetitive 2^24, DESA bulk_locate on a 2^28 index.
  scaling  — virtual CPU mesh p in {1,2,4,8} SA+LCP scaling curve
             (shape-only: CPU timings do not model ICI, but expose
             collective-volume scaling).

Results are recorded in BASELINE.md.
"""
import os
import sys
import time

import numpy as np

# runnable as `python benchmarks/envelope.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    import jax
    try:
        jax.device_get(x[:4])
    except Exception:  # multi-shard arrays: eager slices can't reshard
        jax.device_get(x)


def time_construct(text, mesh, reps=2, conf=None):
    import psac_tpu
    from psac_tpu import config as cfg
    from psac_tpu.models.suffix_array import construct_device, encode_and_shard

    conf = conf or cfg.DEFAULT
    xs, alpha, n, N = encode_and_shard(text, mesh, conf)
    sync(xs)
    construct_device(xs, alpha, n, N, mesh, conf)  # compile + warm
    best = float("inf")
    d = None
    for _ in range(reps):
        del d  # free the previous result's device buffers first
        t0 = time.perf_counter()
        d = construct_device(xs, alpha, n, N, mesh, conf)
        sync(d.sa)
        best = min(best, time.perf_counter() - t0)
    del d, xs
    return best


def chip():
    import jax
    import psac_tpu
    psac_tpu.enable_compile_cache()
    from psac_tpu.ops.alphabet import rand_dna, rep_dna
    from psac_tpu.parallel.mesh import make_mesh

    print("devices:", jax.devices(), flush=True)
    mesh = make_mesh(1)

    for e in (24, 25, 26, 27, 28):
        n = 1 << e
        try:
            dt = time_construct(rand_dna(n, seed=42), mesh)
            print(f"[env] SA+LCP random 2^{e}: {dt:.2f}s "
                  f"({n / dt / 1e6:.0f} MB/s)", flush=True)
        except Exception as ex:  # noqa: BLE001 - report OOM tiers
            print(f"[env] SA+LCP random 2^{e}: FAILED ({type(ex).__name__}: "
                  f"{str(ex)[:120]})", flush=True)
            break

    try:
        dt = time_construct(rep_dna(1 << 24, seed=0), mesh)
        print(f"[env] SA+LCP repetitive 2^24: {dt:.2f}s", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"[env] repetitive: FAILED ({str(ex)[:120]})", flush=True)

    # DESA on the largest index that fits; bulk_locate throughput
    from psac_tpu.models.desa import build_desa
    for e in (28, 27, 26):
        n = 1 << e
        text = rand_dna(n, seed=7)
        try:
            t0 = time.perf_counter()
            desa = build_desa(text, mesh=mesh)
            dt = time.perf_counter() - t0
            print(f"[env] DESA construct 2^{e}: {dt:.2f}s", flush=True)
            rng = np.random.RandomState(1)
            B = 65536
            pats = []
            for _ in range(B):
                st = rng.randint(0, n - 20)
                pats.append(text[st:st + 20])
            desa.bulk_locate(pats[:1024])  # compile
            t0 = time.perf_counter()
            ranges = desa.bulk_locate(pats)
            dt = time.perf_counter() - t0
            hits = int((ranges[:, 1] > ranges[:, 0]).sum())
            print(f"[env] DESA bulk_locate 2^{e} idx, {B} pats len 20: "
                  f"{B / dt / 1e3:.0f}K q/s ({hits} hits)", flush=True)
            break
        except Exception as ex:  # noqa: BLE001
            print(f"[env] DESA 2^{e}: FAILED ({type(ex).__name__}: "
                  f"{str(ex)[:120]})", flush=True)
    print("done", flush=True)


def scaling():
    import os
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from psac_tpu.ops.alphabet import rand_dna
    from psac_tpu.parallel.mesh import make_mesh

    n = 1 << 22
    text = rand_dna(n, seed=42)
    base = None
    for p in (1, 2, 4, 8):
        dt = time_construct(text, make_mesh(p))
        base = base or dt
        print(f"[env] CPU scaling p={p}: {dt:.2f}s "
              f"(speedup {base / dt:.2f}x)", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "chip"
    (chip if mode == "chip" else scaling)()
