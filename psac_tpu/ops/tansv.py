"""Tile-spine single-shard ANSV: the suffix tree's (furthest_eq,
nearest_sm) both-sides pass with the scalar scan compressed to a few
percent of the input.

The Pallas run-stack scan (``psac_tpu.ops.nsv_scan``) is floor-bound at
~34 ns/element of *control flow* per chain, so at 16M the dual pass costs
~1.07 s no matter how lean each step gets.  This engine keeps the scan but
feeds it only the elements whose answers can cross tile boundaries:

  1. **In-tile all-pairs (VPU)** over T-element tiles: per-element in-tile
     PSV (+ its value via a one-hot reduce — 4x cheaper than a random
     gather at 16M, measured on v5e: 40 ms vs 171 ms) and, for the
     furthest_eq side, the leftmost in-tile equal after the PSV.
  2. **Spine scan (scalar)** over the compacted spine: the union of each
     tile's weak prefix minima (elements with no strictly-smaller in-tile
     predecessor — the ones whose matches live in earlier tiles) and weak
     suffix minima (the ones visible from later tiles), compressed to the
     FIRST and LAST member of each maximal adjacent-equal run (interiors
     of equal runs are never match targets, and their own answers derive
     from the run boundaries).  On a 2^24 random-DNA LCP array the
     uncompressed spine is ~2.7% of elements at T=512; compression bounds
     it on repetitive inputs too (an all-equal tile contributes 2 entries).
  3. **Combine**: chain elements take scan answers (interiors of chain
     runs read their run-last's scan answers through a next-spine-member
     one-hot); others take in-tile answers, with case-3 run heads read at
     jstar through one more one-hot over ``H = where(chain, scan_h, h_in)``.

Correctness of the spine closure (why scanning only the compressed spine
gives exact answers):

  * chain and suffix-visibility are uniform over maximal adjacent-equal
    runs, so flagged runs are well-defined;
  * any in-tile *visible equal* of a chain element is itself chain
    (everything before a chain element in its tile is >= it), and any
    earlier-tile element visible from a later element is a weak suffix
    minimum of its tile (else something strictly smaller would block
    visibility) — so every NSM target, every visible equal, and every
    matched run's boundary members are in the spine;
  * a run's interior members are never answers (NSM wants the run's last;
    furthest_eq wants the run's first), and the scan's run-merge keeps
    exactly (value, first, last) per visible run;
  * the PSV of any element always lands on a run LAST (the nearest
    strictly-smaller), so ``H`` is only ever read at run lasts, where the
    scan's post-process run-first is exact;
  * a chain-run interior i has its run head r0 as a visible equal, so it
    is always case 2 with value v; its leftmost visible equal equals the
    scan's emitted answer at the run LAST r1 (same visible-equal set), and
    its NSM answer equals r1's (same PSV).

Match types are fixed to (FURTHEST_EQ left, NEAREST_SM right) — the suffix
tree / GST pass (reference ``include/suffix_tree.hpp:44-223``; ANSV call
``:62``).  Overflow of the spine capacity or the scan stack surfaces in
the returned flag; the caller falls back to the full dual scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

T = 512       # tile width (all-pairs cost is flat 36-42 ms at 256-512)
CAPDIV = 16   # spine capacity = s // CAPDIV, padded to the scan CHUNK
I32_INF = jnp.iinfo(jnp.int32).max


def _tile_side(a, nt: int, with_eq: bool):
    """Per-tile vector phase for LEFT matches of ``a`` (one side).

    Returns (psv_g, psv_val, chain, spine, nxt_l, e_g, h_in): in-tile PSV
    as a GLOBAL index (-1 when none in-tile), its value, the chain mask
    (PSV not in-tile), the compressed spine mask, the in-tile position of
    the next spine member at-or-right of each element (T when none), and —
    when ``with_eq`` — the global index of the leftmost in-tile equal
    after the PSV (I32_INF when none) and the in-tile run head (leftmost
    visible equal including self, global).
    """
    a2 = a.reshape(nt, T)
    j = jnp.arange(T, dtype=jnp.int32)
    tri = j[None, :] < j[:, None]  # (i, j): j < i
    tile_base = (jnp.arange(nt, dtype=jnp.int32) * T)[:, None]

    lt = a2[:, None, :] < a2[:, :, None]  # x[j] < x[i]
    psv = jnp.max(jnp.where(lt & tri[None], j[None, None, :], -1), axis=2)
    sel_psv = j[None, None, :] == psv[:, :, None]
    psv_val = jnp.max(jnp.where(sel_psv, a2[:, None, :], 0), axis=2)
    chain = psv < 0
    psv_g = jnp.where(chain, -1, tile_base + psv)

    # weak suffix minima: nothing strictly smaller after, within the tile
    sufmin = lax.cummin(a2[:, ::-1], axis=1)[:, ::-1]  # min over [i, T)
    suf_excl = jnp.concatenate(
        [sufmin[:, 1:], jnp.full((nt, 1), I32_INF, a2.dtype)], axis=1)
    sufvis = a2 <= suf_excl

    # compress to run boundaries (runs = maximal adjacent equal values)
    tru = jnp.ones((nt, 1), jnp.bool_)
    run_first = jnp.concatenate([tru, a2[:, 1:] != a2[:, :-1]], axis=1)
    run_last = jnp.concatenate([a2[:, :-1] != a2[:, 1:], tru], axis=1)
    spine2 = (chain | sufvis) & (run_first | run_last)

    # next spine member at-or-right of each position (in-tile; T if none)
    nxt = lax.cummin(jnp.where(spine2, j[None, :], T)[:, ::-1],
                     axis=1)[:, ::-1]

    if not with_eq:
        return (psv_g.reshape(-1), psv_val.reshape(-1), chain.reshape(-1),
                spine2.reshape(-1), nxt, None, None)

    eq = (a2[:, None, :] == a2[:, :, None]) & tri[None] & \
        (j[None, None, :] > psv[:, :, None])
    e = jnp.min(jnp.where(eq, j[None, None, :], T), axis=2)
    e_g = jnp.where(e < T, tile_base + e, I32_INF)
    h_in = jnp.where(e < T, e, j[None, :])  # leftmost visible equal or self
    return (psv_g.reshape(-1), psv_val.reshape(-1), chain.reshape(-1),
            spine2.reshape(-1), nxt, e_g.reshape(-1),
            (tile_base + h_in).reshape(-1))


def _compact_spine(a, spine, cap: int):
    """Compact spine rows to (cap,) (gidx, value) streams by one 1-key
    sort; returns (gidx, values, overflow-count).  Padding entries carry
    (I32_INF, I32_INF) — inert in the scan (see nsv_scan._spine_kernel)."""
    s = a.shape[0]
    gidx = jnp.arange(s, dtype=jnp.int32)
    key = jnp.where(spine, gidx, I32_INF)
    vals = jnp.where(spine, a, I32_INF)
    ks, vs = lax.sort((key, vals), num_keys=1)
    cnt = jnp.sum(spine.astype(jnp.int32))
    return ks[:cap], vs[:cap], jnp.maximum(cnt - cap, 0)


def _scatter_back(keys, vals_list, s: int):
    """Scatter per-spine-row answers to (s,) arrays (drop padding rows)."""
    pos = jnp.where(keys != I32_INF, keys, s)
    outs = []
    for v in vals_list:
        outs.append(jnp.zeros((s + 1,), v.dtype).at[pos].set(v)[:s])
    return outs


def _onehot_rows(values_list, sel_local, nt: int, fills):
    """r_k[i] = values_k[tile_base + sel_local[i]] for several arrays
    sharing one selection (an all-pairs one-hot reduce per array — random
    gathers cost ~4x more than a masked reduce at 16M)."""
    j = jnp.arange(T, dtype=jnp.int32)
    sel = j[None, None, :] == sel_local[:, :, None]
    outs = []
    for v, fill in zip(values_list, fills):
        v2 = v.reshape(nt, T)
        outs.append(jnp.max(jnp.where(sel, v2[:, None, :], fill),
                            axis=2).reshape(-1))
    return outs


def tansv_feq_nsm(x, s: int, vma: tuple = (), interpret: bool = False):
    """Both-sides matches of (s,) int32 ``x``: FURTHEST_EQ left and
    NEAREST_SM right (reversed-coordinate) — the suffix-tree pass.

    Returns (lidx, lval, ridx_r, rval_r, ovf) with idx = -1 when no match
    and the right side in reversed coordinates (caller flips, as with the
    dual scan).  ``ovf`` > 0 means the spine capacity or the scan stack
    overflowed and results are INVALID — the caller must fall back.
    """
    from psac_tpu.ops.nsv_scan import CHUNK, nsv_scan_spine

    assert s % T == 0 and s >= CHUNK, s
    nt = s // T
    xr = x[::-1]

    (psv_g, psv_val, chain_f, spine_f, nxt_f, e_g, h_in) = _tile_side(
        x, nt, with_eq=True)
    (npsv_g, npsv_val, chain_n, spine_n, nxt_n, _, _) = _tile_side(
        xr, nt, with_eq=False)

    cap = max(CHUNK, ((s // CAPDIV) // CHUNK) * CHUNK)
    kf, vf, ovf_f = _compact_spine(x, spine_f, cap)
    kn, vn, ovf_n = _compact_spine(xr, spine_n, cap)

    fi, fv, fh, ni, nv, kovf = nsv_scan_spine(vf, kf, vn, kn, interpret, vma)

    f_scan, fval_scan, h_scan = _scatter_back(kf, (fi, fv, fh), s)
    n_scan, nval_scan = _scatter_back(kn, (ni, nv), s)

    # ---- furthest_eq combine ----------------------------------------------
    # chain-run interiors read their run-last's scan answer (same visible-
    # equal set); the run-last is each interior's next spine member
    (f_fill,) = _onehot_rows((f_scan,), nxt_f, nt, (-1,))
    interior_f = chain_f & ~spine_f
    f_chain = jnp.where(spine_f, f_scan, f_fill)
    fval_chain = jnp.where(spine_f, fval_scan, x)  # interiors: case 2, v

    psv_local = jnp.where(chain_f, -1, psv_g % T).reshape(nt, T)
    H = jnp.where(chain_f, h_scan, h_in)
    (f3,) = _onehot_rows((H,), psv_local, nt, (-1,))
    case2 = e_g != I32_INF
    lidx = jnp.where(chain_f, f_chain,
                     jnp.where(case2, e_g, f3))
    lval = jnp.where(chain_f, fval_chain,
                     jnp.where(case2, x, psv_val))
    lval = jnp.where(lidx < 0, 0, lval)

    # ---- nearest_sm combine (reversed coords) ------------------------------
    n_fill, nval_fill = _onehot_rows((n_scan, nval_scan), nxt_n, nt, (-1, 0))
    n_chain = jnp.where(spine_n, n_scan, n_fill)
    nval_chain = jnp.where(spine_n, nval_scan, nval_fill)
    ridx_r = jnp.where(chain_n, n_chain, npsv_g)
    rval_r = jnp.where(chain_n, nval_chain, npsv_val)
    rval_r = jnp.where(ridx_r < 0, 0, rval_r)

    del interior_f  # (documentation alias; selects above encode it)
    ovf = ovf_f + ovf_n + kovf
    return lidx, lval, ridx_r, rval_r, ovf
