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


def test_st_byte_alphabet(mesh8):
    """Wide (byte/printable, sigma~=90) alphabets: the node scatter routes
    by (row, slot), so no flat N*(sigma+1) int32 index exists to overflow
    (round 3 raised at N*(sigma+1) >= 2^31, i.e. ~8 MiB English text;
    reference is index_t-templated, include/suffix_tree.hpp:479)."""
    from psac_tpu.models.suffix_tree import build_suffix_tree
    rng = np.random.RandomState(17)
    text = rng.randint(32, 122, size=3000).astype(np.uint8).tobytes()
    got = build_suffix_tree(text, mesh=mesh8)
    np.testing.assert_array_equal(got, expected_tree(text))


def test_gst_byte_alphabet(mesh8):
    """Same wide-alphabet coverage for the GST (sigma+2 slots)."""
    from psac_tpu.models.suffix_tree import build_gst

    from test_gsa import gst_expected  # shared oracle helper (rootdir import)
    rng = np.random.RandomState(19)
    parts = [rng.randint(33, 120, size=rng.randint(5, 60)).astype(
        np.uint8).tobytes() for _ in range(40)]
    got = build_gst(parts, mesh=mesh8)
    np.testing.assert_array_equal(got, gst_expected(parts))


def test_st_64mib_byte_text_shapes(mesh8):
    """eval_shape proof: a 64 MiB byte text (sigma=95, the old-gate regime
    N*(sigma+1) = 2^26*96 >> 2^31) traces through the ST node scatter on an
    8-shard mesh — the per-shard (s, sigma+1) table is what must fit int32,
    not the global product."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from psac_tpu.models.suffix_tree import _st_local
    from psac_tpu.parallel.mesh import AXIS

    N = 1 << 26
    p = 8
    s = N // p
    sigma = 95
    fn = jax.shard_map(
        functools.partial(_st_local, s=s, p=p, n=N - 5, sigma=sigma,
                          capscale=6),
        mesh=mesh8, in_specs=(P(AXIS),) * 3, out_specs=(P(AXIS), P()))
    arr = jax.ShapeDtypeStruct((N,), jnp.int32)
    nodes, ovf = jax.eval_shape(fn, arr, arr, arr)
    assert nodes.shape == (N * (sigma + 1),) and nodes.dtype == jnp.int32


def test_st_int64_build(mesh8):
    """force_int64 suffix trees (int64 node ids / node table — the
    reference's index_t-addressed table, include/suffix_tree.hpp:479) must
    be bit-identical to the int32 build at testable sizes."""
    import dataclasses

    from psac_tpu import config as cfg
    from psac_tpu.models.suffix_tree import build_suffix_tree

    conf64 = dataclasses.replace(cfg.DEFAULT, force_int64=True)
    for text in [rand_dna(3001, seed=42), b"abc" * 300]:
        want = expected_tree(text)
        got = build_suffix_tree(text, mesh=mesh8, config=conf64)
        np.testing.assert_array_equal(got, want)


def test_st_int64_2pow31_shapes(mesh8):
    """eval_shape proof at 2^31 chars: the int64 ST program (node ids reach
    2n-1 > 2^31) traces with an int64 node table over an 8-shard mesh —
    the regime BASELINE config #5's 3 GB tree tier needs (the former hard
    int32 node ids silently overflowed here)."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from psac_tpu.models.suffix_array import _x64_ctx
    from psac_tpu.models.suffix_tree import _gst_local, _st_local
    from psac_tpu.parallel.mesh import AXIS

    N = 1 << 31
    p = 8
    s = N // p
    sigma = 4
    with _x64_ctx(jnp.int64):
        fn = jax.shard_map(
            functools.partial(_st_local, s=s, p=p, n=N - 5, sigma=sigma,
                              capscale=6),
            mesh=mesh8, in_specs=(P(AXIS),) * 3, out_specs=(P(AXIS), P()))
        a64 = jax.ShapeDtypeStruct((N,), jnp.int64)
        a32 = jax.ShapeDtypeStruct((N,), jnp.int32)
        nodes, ovf = jax.eval_shape(fn, a64, a64, a32)
        assert nodes.shape == (N * (sigma + 1),) and nodes.dtype == jnp.int64
        # GST: sigma+2 slots, eos in the index dtype
        gfn = jax.shard_map(
            functools.partial(_gst_local, s=s, p=p, n=N - 5, sigma=sigma,
                              dlr_cap=1 << 16, capscale=6),
            mesh=mesh8, in_specs=(P(AXIS),) * 4, out_specs=(P(AXIS), P()))
        gnodes, govf = jax.eval_shape(gfn, a64, a64, a32, a64)
        assert gnodes.shape == (N * (sigma + 2),)
        assert gnodes.dtype == jnp.int64


def test_gst_int64_build(mesh8):
    """force_int64 GST bit-identical to the int32 build."""
    import dataclasses

    from psac_tpu import config as cfg
    from psac_tpu.models.gsa import build_gsa_device
    from psac_tpu.models.suffix_tree import construct_gst_device

    from test_gsa import gst_expected

    parts = [b"banana", b"ananas", b"ban", b"nan" * 7, b"a"]
    conf64 = dataclasses.replace(cfg.DEFAULT, force_int64=True)
    dgsa = build_gsa_device(parts, mesh=mesh8, config=conf64)
    import jax.numpy as jnp
    assert jnp.dtype(dgsa.sa.dtype) == jnp.int64
    got = construct_gst_device(dgsa).materialize()
    np.testing.assert_array_equal(got, gst_expected(parts))
