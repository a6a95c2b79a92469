"""Native SA-IS + Kasai oracle vs the independent NumPy oracles."""

import numpy as np
import pytest

from psac_tpu import native
from psac_tpu.ops.alphabet import rand_dna
from psac_tpu.ops.oracle import lcp_kasai, suffix_array_naive, suffix_array_np


@pytest.mark.parametrize("text", [
    b"mississippi", b"banana", b"a", b"ab", b"ba", b"aaaaaaa", b"abab",
    b"abracadabra" * 3, bytes(range(1, 256)),
])
def test_sais_small(text):
    np.testing.assert_array_equal(native.suffix_array(text), suffix_array_naive(text))


@pytest.mark.parametrize("n", [100, 1000, 130370])
def test_sais_random(n):
    text = rand_dna(n, seed=n)
    np.testing.assert_array_equal(native.suffix_array(text), suffix_array_np(text))


def test_sais_random_bytes():
    rng = np.random.RandomState(0)
    text = rng.randint(1, 256, size=50000, dtype=np.uint8).tobytes()
    np.testing.assert_array_equal(native.suffix_array(text), suffix_array_np(text))


def test_kasai_native():
    text = rand_dna(5000, seed=1)
    sa = native.suffix_array(text)
    np.testing.assert_array_equal(native.lcp_array(text, sa), lcp_kasai(text, sa))
