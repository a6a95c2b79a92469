"""End-to-end suffix array + LCP conformance (3-tier oracle, SURVEY.md §4)."""

import numpy as np
import pytest

from psac_tpu.config import SAConfig
from psac_tpu.models.suffix_array import build_suffix_array
from psac_tpu.ops.alphabet import rand_dna
from psac_tpu.ops.oracle import lcp_kasai, suffix_array_naive, suffix_array_np


# golden: README example of the reference (README.md:88-101)
MISSISSIPPI_SA = [10, 7, 4, 1, 0, 9, 8, 6, 3, 5, 2]
MISSISSIPPI_LCP = [0, 1, 1, 4, 0, 0, 1, 0, 2, 1, 3]


def check(text, mesh, lcp=True, k=0):
    cfg = SAConfig(construct_lcp=lcp, k=k)
    res = build_suffix_array(text, mesh=mesh, config=cfg)
    want_sa = suffix_array_np(text)
    np.testing.assert_array_equal(res.sa, want_sa, err_msg=f"SA mismatch n={len(text)}")
    if lcp:
        want_lcp = lcp_kasai(text, want_sa)
        np.testing.assert_array_equal(res.lcp, want_lcp, err_msg=f"LCP mismatch n={len(text)}")
    return res


def test_oracles_agree():
    t = b"mississippi"
    np.testing.assert_array_equal(suffix_array_naive(t), MISSISSIPPI_SA)
    np.testing.assert_array_equal(suffix_array_np(t), MISSISSIPPI_SA)
    np.testing.assert_array_equal(lcp_kasai(t, np.array(MISSISSIPPI_SA)), MISSISSIPPI_LCP)


def test_mississippi(mesh8):
    res = check(b"mississippi", mesh8)
    np.testing.assert_array_equal(res.sa, MISSISSIPPI_SA)
    np.testing.assert_array_equal(res.lcp, MISSISSIPPI_LCP)


def test_mississippi_single_device(mesh1):
    res = check(b"mississippi", mesh1)
    np.testing.assert_array_equal(res.sa, MISSISSIPPI_SA)


@pytest.mark.parametrize("n", [13, 137, 1000, 4096])
def test_random_dna(mesh8, n):
    check(rand_dna(n, seed=n), mesh8)


@pytest.mark.parametrize("n", [137, 1000])
def test_random_dna_single_device(mesh1, n):
    check(rand_dna(n, seed=n), mesh1)


def test_small_k_forces_doubling(mesh8):
    # tiny k means many doubling iterations and heavy RMQ resolution
    check(rand_dna(700, seed=9), mesh8, k=2)
    check(b"mississippi" * 30, mesh8, k=2)


def test_repeats(mesh8):
    check(b"a" * 200, mesh8)
    check(b"ab" * 100, mesh8)
    check(b"abc" * 67, mesh8)
    check(b"banana$banana$banana$" * 10, mesh8)


def test_byte_alphabet(mesh8):
    rng = np.random.RandomState(123)
    text = rng.randint(1, 256, size=777, dtype=np.uint8).tobytes()
    check(text, mesh8)


def test_english_like(mesh8):
    text = (b"the quick brown fox jumps over the lazy dog. " * 40)
    check(text, mesh8)


def test_n_smaller_than_p(mesh8):
    # n < p exercised like the reference's n<p tests (test_psac.cpp:114)
    check(b"ab", mesh8)
    check(b"x", mesh8)
    check(b"baa", mesh8)


def test_sa_only(mesh8):
    res = check(rand_dna(500, seed=2), mesh8, lcp=False)
    assert res.lcp is None


def test_int_alphabet(mesh8):
    """Wide integer characters (reference int_alphabet, test_psac.cpp)."""
    import numpy as np
    from psac_tpu.models.suffix_array import build_suffix_array
    from psac_tpu.ops.oracle import lcp_kasai, suffix_array_np

    rng = np.random.RandomState(0)
    for vals in [rng.randint(1, 1 << 16, size=997).astype(np.int32),
                 rng.randint(10**5, 10**5 + 17, size=2000).astype(np.int64)]:
        res = build_suffix_array(vals, mesh=mesh8)
        want = suffix_array_np(vals)
        np.testing.assert_array_equal(res.sa, want)
        np.testing.assert_array_equal(res.lcp, lcp_kasai(vals, want))


@pytest.mark.parametrize("factor", [3, 4])
def test_prefix_lpling(mesh8, factor):
    """construct_arr<L> analogue: tripling/quadrupling, SA-only."""
    import numpy as np
    from psac_tpu import config as cfg
    from psac_tpu.models.suffix_array import build_suffix_array
    from psac_tpu.ops.alphabet import rand_dna
    from psac_tpu.ops.oracle import suffix_array_np

    conf = cfg.SAConfig(construct_lcp=False, factor=factor)
    for text in [rand_dna(5000, seed=factor), b"abab" * 600, b"a" * 300]:
        res = build_suffix_array(text, mesh=mesh8, config=conf)
        np.testing.assert_array_equal(res.sa, suffix_array_np(text))


def test_real_text_corpus(mesh8):
    """English-like real text (this repo's own sources) vs the native oracle."""
    import glob
    import numpy as np
    from psac_tpu import native
    from psac_tpu.models.suffix_array import build_suffix_array

    parts = []
    for f in sorted(glob.glob("psac_tpu/**/*.py", recursive=True)):
        with open(f, "rb") as fh:
            parts.append(fh.read())
    text = b"".join(parts).replace(b"\x00", b" ")[:200000]
    res = build_suffix_array(text, mesh=mesh8)
    np.testing.assert_array_equal(res.sa, native.suffix_array(text))
    np.testing.assert_array_equal(res.lcp, native.lcp_array(text, res.sa))


def test_int64_index_build(mesh8, mesh1):
    """Texts >= 2^30 chars build with int64 indexes (the reference's uint64
    index_t, src/psac.cpp:54).  force_int64 runs the same code path at a
    testable size; results must be bit-identical to the int32 build."""
    import dataclasses

    from psac_tpu import config as cfg
    from psac_tpu.models.suffix_array import index_dtype_for

    import jax.numpy as jnp
    assert index_dtype_for(1 << 30, cfg.DEFAULT) == jnp.int64
    assert index_dtype_for((1 << 30) - 8, cfg.DEFAULT) == jnp.int32

    conf64 = dataclasses.replace(cfg.DEFAULT, force_int64=True)
    for text in [rand_dna(5000, seed=9), b"ab" * 700 + b"ba" * 700]:
        want = build_suffix_array(text, mesh=mesh8)
        got = build_suffix_array(text, mesh=mesh8, config=conf64)
        np.testing.assert_array_equal(got.sa, want.sa)
        np.testing.assert_array_equal(got.lcp, want.lcp)
        got1 = build_suffix_array(text, mesh=mesh1, config=conf64)
        np.testing.assert_array_equal(got1.sa, want.sa)
        # repetitive input exercises the int64 dense loop + tail
        np.testing.assert_array_equal(got1.lcp, want.lcp)


def test_fused_vs_host_loop(mesh8):
    """The fused one-dispatch path and the host-driven loop must agree
    bit-for-bit, including at the fused tail capacity boundary."""
    import dataclasses
    from psac_tpu.models.suffix_array import build_suffix_array as bsa

    for text in [rand_dna(3000, seed=5), b"ab" * 500 + bytes(rand_dna(64, seed=1))]:
        want_sa = suffix_array_np(text)
        want_lcp = lcp_kasai(text, want_sa)
        for fused in (True, False):
            cfg = SAConfig(fused=fused)
            res = bsa(text, mesh=mesh8, config=cfg)
            np.testing.assert_array_equal(res.sa, want_sa)
            np.testing.assert_array_equal(res.lcp, want_lcp)


def test_int64_2pow31_shapes(mesh8):
    """The int64 construction programs must trace at 2^31 chars over an
    8-shard mesh (the int32-impossible regime; per-shard blocks stay under
    2^31 as on any real machine).  eval_shape proves every intermediate —
    bucket ids to N+1, distances to 2N, pad ranks — is shape- and
    dtype-sound without allocating the ~100 GB of buffers a real 2^31 run
    needs (executed coverage of the same code path is
    test_int64_index_build)."""
    import jax
    import jax.numpy as jnp

    from psac_tpu.models.suffix_array import _Builder, _x64_ctx

    N = 1 << 31
    with _x64_ctx(jnp.int64):
        b = _Builder(mesh8, N, (10, 10), 3, with_lcp=True, idt=jnp.int64)
        codes = jax.ShapeDtypeStruct((N,), jnp.int32)
        nn = jax.ShapeDtypeStruct((), jnp.int64)
        outs = jax.eval_shape(b._init, codes, nn)
        assert outs[0].shape == (N,) and outs[0].dtype == jnp.int64  # ISA
        isa = jax.ShapeDtypeStruct((N,), jnp.int64)
        lcp = jax.ShapeDtypeStruct((N,), jnp.int64)
        d = jax.ShapeDtypeStruct((), jnp.int64)
        souts = jax.eval_shape(b.step(0), isa, lcp, d)
        assert souts[1].dtype == jnp.int64  # SA
        m_cap = 1 << 22
        bb = jax.ShapeDtypeStruct((N,), jnp.int64)
        act = jax.ShapeDtypeStruct((N,), jnp.bool_)
        touts = jax.eval_shape(b.tail_enter(m_cap), bb, bb, act)
        cs = jax.ShapeDtypeStruct((m_cap,), jnp.int64)
        uts = jax.eval_shape(b.tail_step(m_cap), cs, cs, isa, bb, lcp, d)
        assert uts[3].dtype == jnp.int64


def test_two_stage_tail_big_stage(mesh1):
    """Corpora sized so the active set lands between the small and big tail
    capacities at mesh1 exercise the fused path's BIG tail stage + the
    recompaction to the small stage (converging corpora enter the small
    stage directly and never cover it)."""
    from psac_tpu.ops.alphabet import rep_dna

    for n, unit, mut in [(32768, 512, 6), (32768, 1024, 12),
                         (65536, 2048, 20)]:
        text = rep_dna(n, unit_len=unit, seed=n + unit, mutations=mut)
        check(text, mesh1)


@pytest.mark.parametrize("words", [1, 3])
def test_kmer_words(mesh8, words):
    """The initial ranking generalizes to W int32 k-mer words (the
    reference packs one machine word, include/kmer.hpp:25-40; 3 words =
    30-char DNA init, saving a dense iteration on repeat-heavy corpora):
    results must be bit-identical to the default 2-word build."""
    import dataclasses

    from psac_tpu.ops.alphabet import rep_dna

    for text in (rep_dna(5000, unit_len=250, seed=21), rand_dna(4000, seed=22)):
        want = suffix_array_np(text)
        conf = dataclasses.replace(SAConfig(), kmer_words=words)
        res = build_suffix_array(text, mesh=mesh8, config=conf)
        np.testing.assert_array_equal(res.sa, want)
        np.testing.assert_array_equal(res.lcp, lcp_kasai(text, want))


def test_pack_keys_parity(mesh8, mesh1):
    """Packed int64 sort lanes (SAConfig.pack_keys, the dense-sort-wall
    lever measured in benchmarks/sort_micro.py) must be bit-identical to
    the unpacked build on every path (dense factor 2/4, fused + host)."""
    import dataclasses

    from psac_tpu import config as cfg

    for text in [rand_dna(4000, seed=77), b"ab" * 900 + b"ba" * 100]:
        want_sa = suffix_array_np(text)
        want_lcp = lcp_kasai(text, want_sa)
        for mesh in (mesh8, mesh1):
            for packed in (True, False):
                # fused dense F=5 (6 key columns -> 3 packed lanes), LCP on
                conf = dataclasses.replace(
                    cfg.DEFAULT, dense_factor=5, pack_keys=packed)
                res = build_suffix_array(text, mesh=mesh, config=conf)
                np.testing.assert_array_equal(res.sa, want_sa)
                np.testing.assert_array_equal(res.lcp, want_lcp)
                # host-loop construct_arr<5> (SA-only, like the reference)
                conf = dataclasses.replace(
                    cfg.DEFAULT, fused=False, factor=5, construct_lcp=False,
                    pack_keys=packed)
                res = build_suffix_array(text, mesh=mesh, config=conf)
                np.testing.assert_array_equal(res.sa, want_sa)
