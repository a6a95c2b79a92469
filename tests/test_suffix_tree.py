"""Suffix tree: distributed construction vs the sequential interval oracle.

Mirrors the reference's test matrix (test/test_suffixtree.cpp: mississippi
golden, random DNA across sizes, (abc)^n repeat families).
"""

import numpy as np
import pytest

from psac_tpu.ops.alphabet import Alphabet, rand_dna
from psac_tpu.ops.oracle import lcp_kasai, suffix_array_np
from psac_tpu.verify.suffix_tree_oracle import suffix_tree_oracle


def expected_tree(text: bytes) -> np.ndarray:
    alpha = Alphabet.from_bytes(text)
    codes = alpha.encode(text)
    sa = suffix_array_np(text)
    lcp = lcp_kasai(text, sa)
    return suffix_tree_oracle(codes, sa, lcp, alpha.sigma)


def test_oracle_mississippi_structure():
    """Sanity-check the oracle itself on the classic example."""
    text = b"mississippi"
    nodes = expected_tree(text)
    n = len(text)
    # every leaf 11..21 appears exactly once among all slots
    flat = nodes.ravel()
    leaves = sorted(x for x in flat if x >= n)
    assert leaves == list(range(n, 2 * n))
    # root (node 0) has children for i, m, p, s (no terminator, no $ edge)
    assert np.count_nonzero(nodes[0]) == 4


@pytest.mark.parametrize("text", [
    b"mississippi",
    b"abab",
    b"aaaaaaaaaa",
    b"banana",
])
def test_st_golden(mesh8, text):
    from psac_tpu.models.suffix_tree import build_suffix_tree
    got = build_suffix_tree(text, mesh=mesh8)
    np.testing.assert_array_equal(got, expected_tree(text))


@pytest.mark.parametrize("n", [116, 1000, 4177])
def test_st_dna(mesh8, n):
    from psac_tpu.models.suffix_tree import build_suffix_tree
    text = rand_dna(n, seed=n)
    got = build_suffix_tree(text, mesh=mesh8)
    np.testing.assert_array_equal(got, expected_tree(text))


def test_st_repeats(mesh8):
    from psac_tpu.models.suffix_tree import build_suffix_tree
    text = b"abc" * 300
    got = build_suffix_tree(text, mesh=mesh8)
    np.testing.assert_array_equal(got, expected_tree(text))
