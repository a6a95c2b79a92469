"""LCP sampling: stack oracle vs ANSV characterization (reference
test_samplelcp.cpp / seq_check_sample)."""

import numpy as np
import pytest

from psac_tpu.ops.sample_lcp import sample_lcp_ansv, sample_lcp_seq


@pytest.mark.parametrize("maxsize", [2, 4, 16, 100])
def test_sample_lcp_equivalence(maxsize):
    rng = np.random.RandomState(maxsize)
    for n in [13, 137, 1000, 5000]:
        lcp = rng.randint(0, 8, size=n)
        lcp[0] = 0
        a = sample_lcp_seq(lcp, maxsize)
        b = sample_lcp_ansv(lcp, maxsize)
        np.testing.assert_array_equal(a, b)


def test_sample_lcp_real_lcp():
    from psac_tpu.ops.alphabet import rand_dna
    from psac_tpu.ops.oracle import lcp_kasai, suffix_array_np
    text = rand_dna(4000, seed=2)
    sa = suffix_array_np(text)
    lcp = lcp_kasai(text, sa)
    for maxsize in [2, 8, 64]:
        a = sample_lcp_seq(lcp, maxsize)
        b = sample_lcp_ansv(lcp, maxsize)
        np.testing.assert_array_equal(a, b)
        assert a[0] == 0 and len(a) < len(lcp)
