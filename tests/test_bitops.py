import jax.numpy as jnp
import numpy as np

from psac_tpu.ops.bitops import lcp_bitwise32, lcp_bitwise_pair
from psac_tpu.ops.kmer import pack_kmers_host


def naive_kmer_lcp(codes, i, j, k):
    """Leading equal chars of the k-windows at i and j (0 past the end)."""
    get = lambda t: codes[t] if t < len(codes) else 0
    c = 0
    while c < k and get(i + c) == get(j + c):
        c += 1
    return c


def test_lcp_bitwise32_exhaustive_small():
    bits, k = 3, 5
    rng = np.random.RandomState(0)
    codes = rng.randint(1, 5, size=40)
    hi, _ = pack_kmers_host(codes, (k, 1), bits)
    # compare all pairs of kmer words
    for i in range(35):
        for j in range(35):
            got = int(lcp_bitwise32(jnp.int32(hi[i]), jnp.int32(hi[j]), k, bits))
            want = min(naive_kmer_lcp(codes, i, j, k), k)
            assert got == want, (i, j, got, want)


def test_lcp_bitwise_pair():
    bits, k1, k2 = 3, 4, 4
    rng = np.random.RandomState(1)
    codes = rng.randint(1, 5, size=60)
    hi, lo = pack_kmers_host(codes, (k1, k2), bits)
    for i in range(50):
        for j in range(50):
            got = int(lcp_bitwise_pair(jnp.int32(hi[i]), jnp.int32(lo[i]),
                                       jnp.int32(hi[j]), jnp.int32(lo[j]), k1, k2, bits))
            want = naive_kmer_lcp(codes, i, j, k1 + k2)
            assert got == want, (i, j, got, want)
