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
