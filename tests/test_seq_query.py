"""Typed tests over the sequential index ladder (reference test_seq_query.cpp)."""

import numpy as np
import pytest

from psac_tpu.ops.alphabet import rand_dna
from psac_tpu.seq import (
    BSESAIndex,
    DESAIndex,
    ESAIndex,
    LookupDESAIndex,
    SAIndex,
    SALCPIndex,
)

INDEXES = [SAIndex, SALCPIndex, ESAIndex, BSESAIndex, DESAIndex, LookupDESAIndex]


def occurrences(text, pat):
    out, start = [], 0
    while True:
        i = text.find(pat, start)
        if i < 0:
            return sorted(out)
        out.append(i)
        start = i + 1


@pytest.mark.parametrize("cls", INDEXES)
def test_seq_index_locate(cls):
    texts = [b"mississippi", b"abab" * 40, rand_dna(2000, seed=3)]
    rng = np.random.RandomState(1)
    for text in texts:
        idx = cls(text)
        pats = [b"a", b"iss", b"ssi", b"zz", text[:7], text[-5:], b"ab",
                b"ipi", b"sipp"]
        for ln in (1, 3, 6, 11):
            if len(text) > ln:
                st = rng.randint(0, len(text) - ln)
                pats.append(text[st:st + ln])
        for P in pats:
            l, r = idx.locate(P)
            got = sorted(int(idx.sa[j]) for j in range(l, r))
            assert got == occurrences(text, P), (cls.__name__, P, l, r)


@pytest.mark.parametrize("cls", [ESAIndex, DESAIndex, LookupDESAIndex])
def test_locate_possible_superset(cls):
    text = rand_dna(1500, seed=9)
    idx = cls(text)
    for P in [text[100:110], text[7:9], b"GGGGGGGGGG"]:
        l, r = idx.locate_possible(P)
        occ = occurrences(text, P)
        if occ:  # all occurrences inside the candidate range
            rows = sorted(int(idx.sa[j]) for j in range(l, r))
            assert rows == occ


def test_check_sa_layer(mesh8):
    """Verification layer: sequential + distributed property checks."""
    from psac_tpu.models.suffix_array import construct_device, encode_and_shard
    from psac_tpu.verify.check_sa import check_lcp_np, check_sa_np, d_check_sa

    text = rand_dna(3000, seed=5)
    from psac_tpu import native
    sa = native.suffix_array(text)
    assert check_sa_np(text, sa)
    assert check_lcp_np(text, sa, native.lcp_array(text, sa))
    # corrupt
    bad = sa.copy()
    bad[[3, 4]] = bad[[4, 3]]
    assert not check_sa_np(text, bad)

    xs, alpha, n, N = encode_and_shard(text, mesh8)
    dsa = construct_device(xs, alpha, n, N, mesh8)
    assert d_check_sa(dsa, xs)
