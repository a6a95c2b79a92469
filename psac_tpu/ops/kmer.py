"""k-mer packing (per-shard compute; vectorized equivalent of reference include/kmer.hpp).

The reference packs k chars MSB-first into one machine word so that integer
order equals lexicographic order (``include/kmer.hpp:119-177``), choosing
``k = get_optimal_k`` to fill the word (``include/kmer.hpp:25-40``). Here a
k-mer is a *pair* of int32 words (hi, lo) — lexicographic order of the pair is
k-mer order — so the hot sort stays on native int32 lanes with no int64
emulation on TPU.

Per-shard packing needs a halo of the next shard's first k-1 chars; the
wrapper in ``psac_tpu.parallel`` provides it via one ``ppermute``.
"""

from __future__ import annotations

import jax.numpy as jnp


def optimal_k(bits_per_char: int, max_bits: int = 31) -> tuple[int, int]:
    """Chars per int32 word (sign bit kept zero): returns (k1, k2) word capacities."""
    per_word = max(1, max_bits // bits_per_char)
    return per_word, per_word


def pack_kmers_local(chars_with_halo, s: int, k1: int, k2: int, bits: int):
    """Pack (k1+k2)-mers for the s window starts of this shard.

    Args:
      chars_with_halo: (s + k1 + k2 - 1,) int32 encoded chars (codes 1..sigma,
        0 = padding/sentinel), the shard's chars followed by the halo from the
        right neighbor (zeros past the end of the text).
      s: number of window starts (the shard size).
    Returns:
      (hi, lo): two (s,) int32 arrays; (hi, lo) compares like the k-mer.
    """
    hi = jnp.zeros((s,), jnp.int32)
    for j in range(k1):
        hi = jnp.left_shift(hi, bits) | chars_with_halo[j:j + s]
    lo = jnp.zeros((s,), jnp.int32)
    for j in range(k1, k1 + k2):
        lo = jnp.left_shift(lo, bits) | chars_with_halo[j:j + s]
    return hi, lo


def pack_kmers_host(codes, k1: int, k2: int, bits: int):
    """NumPy single-host reference of pack_kmers_local (for tests/oracles)."""
    import numpy as np

    n = len(codes)
    padded = np.concatenate([np.asarray(codes, np.int64), np.zeros(k1 + k2 - 1, np.int64)])
    hi = np.zeros(n, np.int64)
    for j in range(k1):
        hi = (hi << bits) | padded[j:j + n]
    lo = np.zeros(n, np.int64)
    for j in range(k1, k1 + k2):
        lo = (lo << bits) | padded[j:j + n]
    return hi.astype(np.int32), lo.astype(np.int32)
