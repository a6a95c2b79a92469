"""Persistence of finished artifacts (reference suffix_array::write/read).

The reference writes ``.sa``/``.lcp``/``.lc``/``.alpha`` files with MPI-IO
(``include/suffix_array.hpp:130-265``) and the ``psac -o`` tool writes
``.sa64``/``.lcp64`` (``src/psac.cpp:127-128``); files reload under a
*different* rank count (re-block-decomposed, tested
``test/test_psac.cpp:333-343``).

Here artifacts are plain little-endian uint64 flat files with the same
extensions — readable by the reference's ``print64`` and trivially
re-shardable onto any mesh size.  The alphabet is stored as the raw byte
set (the reference serializes exactly that, ``include/alphabet.hpp:296-347``).
"""

from __future__ import annotations

import os

import numpy as np

from psac_tpu.ops.alphabet import Alphabet


def write_u64(path: str, arr: np.ndarray) -> None:
    np.asarray(arr, dtype="<u8").tofile(path)


def read_u64(path: str) -> np.ndarray:
    return np.fromfile(path, dtype="<u8").astype(np.int64)


def write_suffix_array(prefix: str, res) -> None:
    """Write ``<prefix>.sa64`` (+ ``.lcp64``/``.lc64`` when present) and
    ``<prefix>.alpha``."""
    write_u64(prefix + ".sa64", res.sa)
    if getattr(res, "lcp", None) is not None:
        write_u64(prefix + ".lcp64", res.lcp)
    lc = getattr(res, "lc", None)
    if lc is not None:
        write_u64(prefix + ".lc64", lc)
    with open(prefix + ".alpha", "wb") as f:
        f.write(res.alphabet.chars.tobytes())


def read_alphabet(prefix: str) -> Alphabet:
    with open(prefix + ".alpha", "rb") as f:
        chars = np.frombuffer(f.read(), np.uint8)
    mapping = np.zeros(256, np.uint8)
    mapping[chars] = np.arange(1, len(chars) + 1, dtype=np.uint8)
    inverse = np.zeros(len(chars) + 1, np.uint8)
    inverse[1:] = chars
    from psac_tpu.ops.bitops import ceillog2
    return Alphabet(chars=chars.copy(), mapping=mapping, inverse=inverse,
                    bits_per_char=ceillog2(len(chars) + 1))


def read_suffix_array(prefix: str):
    """Reload a persisted SA(+LCP) artifact; works on any mesh size."""
    from psac_tpu.models.suffix_array import SuffixArray

    sa = read_u64(prefix + ".sa64")
    lcp = None
    if os.path.exists(prefix + ".lcp64"):
        lcp = read_u64(prefix + ".lcp64")
    alpha = read_alphabet(prefix) if os.path.exists(prefix + ".alpha") else None
    return SuffixArray(sa=sa, lcp=lcp, alphabet=alpha, n=len(sa))


# ---------------------------------------------------------------------------
# Distributed (per-process shard) writes and reads — the multi-host IO path.
#
# The reference writes per-rank blocks collectively via MPI-IO and reloads
# under a different rank count (include/suffix_array.hpp:130-166,
# test/test_psac.cpp:333-343).  Equivalent here: every process pwrites ONLY
# its addressable shards' rows at their computed file offsets (the inverse
# of parallel/staging.stage_file_block), so no process ever allocates the
# full-n array.  Disjoint-offset pwrites need no inter-process ordering;
# the idempotent truncate sets the final size from every process.
# ---------------------------------------------------------------------------

def _pwrite_rows(fd, rows: "np.ndarray", file_row: int) -> None:
    os.pwrite(fd, np.ascontiguousarray(rows, dtype="<u8").tobytes(),
              8 * file_row)


def write_shards_u64(path: str, arr, n: int, *, front_pad: bool = True,
                     fix_first_zero: bool = False) -> None:
    """Write a block-sharded device array's addressable shards into a flat
    ``<u8`` file of n rows.  ``front_pad``: the array is (N,) with the first
    N-n global rows being padding (the construction layout); global row g
    maps to file row g-(N-n).  ``fix_first_zero`` zeroes file row 0 (the
    LCP's padding-boundary fixup, as ``materialize`` does)."""
    N = arr.shape[0]
    off = N - n if front_pad else 0
    fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o644)
    try:
        os.truncate(fd, 8 * n)
        for sh in arr.addressable_shards:
            (sl,) = sh.index
            lo = sl.start or 0
            data = np.asarray(sh.data)
            start = max(lo, off)
            hi = min(lo + data.shape[0], off + n)
            if start >= hi:
                continue
            seg = data[start - lo:hi - lo]
            if fix_first_zero and start == off and seg.shape[0]:
                seg = seg.copy()
                seg[0] = 0
            _pwrite_rows(fd, seg, start - off)
    finally:
        os.close(fd)


def write_suffix_array_distributed(prefix: str, dsa) -> None:
    """Per-process shard write of a device-resident SA(+LCP) — each process
    writes only its addressable shards (O(n/p) host bytes per process)."""
    import jax

    write_shards_u64(prefix + ".sa64", dsa.sa, dsa.n)
    if dsa.lcp is not None:
        write_shards_u64(prefix + ".lcp64", dsa.lcp, dsa.n,
                         fix_first_zero=True)
    if jax.process_index() == 0:
        with open(prefix + ".alpha", "wb") as f:
            f.write(dsa.alphabet.chars.tobytes())


def stage_u64_front_padded(path: str, mesh, dtype=np.int64):
    """Stage a flat ``<u8`` artifact block-sharded over the mesh in the
    construction layout (front padding: global row g = file row g-(N-n));
    each process reads only its addressable shards' byte ranges.

    Returns (arr, n, N)."""
    import jax

    from psac_tpu.parallel.mesh import block_sharding, num_shards, padded_size

    n = os.path.getsize(path) // 8
    p = num_shards(mesh)
    N = padded_size(max(n, 1), p)
    off = N - n

    def cb(index):
        (sl,) = index
        lo = sl.start or 0
        hi = sl.stop if sl.stop is not None else N
        out = np.zeros(hi - lo, dtype)
        a = max(lo, off)
        if a < hi:
            with open(path, "rb") as f:
                f.seek(8 * (a - off))
                out[a - lo:] = np.frombuffer(
                    f.read(8 * (hi - a)), "<u8").astype(dtype)
        return out

    return (jax.make_array_from_callback((N,), block_sharding(mesh), cb),
            n, N)


def read_suffix_array_distributed(prefix: str, mesh, force_int64: bool = False):
    """Reload a persisted SA(+LCP) artifact as a block-sharded
    DeviceSuffixArray on any mesh/process count, each process staging only
    its addressable shards (reference re-block-decomposed reload,
    test/test_psac.cpp:333-343)."""
    import jax.numpy as jnp

    from psac_tpu import config as cfg_mod
    from psac_tpu.models.suffix_array import DeviceSuffixArray

    n = os.path.getsize(prefix + ".sa64") // 8
    from psac_tpu.parallel.mesh import num_shards, padded_size
    N = padded_size(max(n, 1), num_shards(mesh))
    idt = jnp.int64 if force_int64 else cfg_mod.index_dtype(N)
    np_idt = np.dtype(jnp.dtype(idt).name)
    sa, n, N = stage_u64_front_padded(prefix + ".sa64", mesh, np_idt)
    lcp = None
    if os.path.exists(prefix + ".lcp64"):
        lcp, _, _ = stage_u64_front_padded(prefix + ".lcp64", mesh, np_idt)
    alpha = read_alphabet(prefix) if os.path.exists(prefix + ".alpha") else None
    return DeviceSuffixArray(sa=sa, lcp=lcp, isa=None, alphabet=alpha, n=n,
                             N=N, mesh=mesh)
