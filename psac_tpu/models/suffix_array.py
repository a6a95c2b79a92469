"""Distributed suffix-array + LCP construction (the core of the framework).

TPU-native re-design of the reference's ``suffix_array`` class
(``include/suffix_array.hpp:170-1513``): k-mer initial ranking followed by
prefix multiplication, with the LCP array resolved incrementally via
distributed bulk RMQs, over a 1-D device mesh instead of MPI ranks:

  * the text (encoded, 0-padded to N = p*s) is block-sharded; all per-element
    state (ISA ranks, LCP) lives in (N,) sharded index-dtype arrays — int32
    below 2^30 chars, int64 beyond (the reference's ``index_t`` template,
    ``src/psac.cpp:54``), with in-shard offsets always int32;
  * "bucket id" keeps the reference's convention: 1-based global index of the
    bucket's first element, 0 reserved for shifted-past-the-end
    (``include/bucketing.hpp:59-63``);
  * one dense iteration = shift(s) (B@jd = ISA[i+j*d]) -> distributed
    merge-split bitonic sort -> segmented-max rebucket -> scatter-by-sort
    SA->ISA, with LCP range-queries resolved against a row-window RMQ;
  * padding: the 0-sentinel padding suffixes are strictly smallest and occupy
    SA[0 : N-n]; the real SA/LCP are the trailing n entries.

Two drivers share the step/tail kernels:

  * **single shard** (the per-chip hot path): ``_Builder.fused_full`` runs
    the ENTIRE construction as one dispatched program — init, a dense
    prefix-quadrupling ``lax.while_loop`` with a *traced* shift distance
    (a local dynamic slice needs no ppermute pattern) and LCP interleaved
    via the per-column additive j*d recurrence (beyond the reference, whose
    ``construct_arr<L>`` is SA-only), then a two-stage sparse
    bucket-chaising tail whose capacity recompacts downward — with a single
    (3,) stats readback;
  * **multi-shard**: a host-staged loop of jitted SPMD steps; the
    shard-distance q = d // s selects the ppermute pattern (O(log p)
    distinct jit entries) and the in-iteration remainder is traced.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from psac_tpu import config as cfg_mod
from psac_tpu.ops.alphabet import Alphabet
from psac_tpu.ops.bitops import lcp_bitwise_words
from psac_tpu.ops.kmer import optimal_k, pack_kmers_local
from psac_tpu.ops.rmq import build_local_rmq, query_local_rmq
from psac_tpu.parallel.collectives import (
    global_cummax,
    global_index_base,
    global_shift_left,
    global_shift_left_dyn,
    halo_from_left,
    halo_from_right,
    shard_minima,
)
from psac_tpu.parallel.mesh import AXIS, block_sharding, make_mesh, mesh_key, num_shards, padded_size
from psac_tpu.parallel.par_rmq import bulk_rmq_local
from psac_tpu.parallel.route import route_apply, route_scatter
from psac_tpu.parallel.sort import dist_sort_local, scatter_by_index_local


@dataclasses.dataclass
class SuffixArray:
    """Finished artifact: SA (and optionally LCP) of the input text."""

    sa: np.ndarray
    lcp: np.ndarray | None
    alphabet: Alphabet
    n: int


@dataclasses.dataclass
class DeviceSuffixArray:
    """Device-resident result, block-sharded over the mesh (like the
    reference's per-rank distributed arrays — nothing is gathered).

    ``sa``/``lcp``/``isa`` are (N,) padded: the first N-n SA entries are the
    all-sentinel padding suffixes; real entries are the trailing n.
    """

    sa: jax.Array
    lcp: jax.Array | None
    isa: jax.Array
    alphabet: Alphabet
    n: int
    N: int
    mesh: object
    #: left-branching characters (reference ``_CONSTRUCT_LC``), present when
    #: ``SAConfig.construct_lc`` was set (computed post-hoc as one bulk
    #: gather — the TPU-native replacement for the reference's interleaved
    #: ``bulk_rmq_Lc`` maintenance, include/suffix_array.hpp:1353-1396)
    lc: jax.Array | None = None

    def block_until_ready(self):
        jax.block_until_ready(self.sa)
        # the experimental axon tunnel can return early from
        # block_until_ready; a scalar readback is a reliable fence.
        _ = int(self.sa[0])
        return self

    def materialize(self) -> SuffixArray:
        # np.array(copy=True): device_get of an int64 array returns a
        # read-only view, and the lcp_np[0] fixup below writes
        sa_np = np.array(jax.device_get(self.sa), dtype=np.int64)[self.N - self.n:]
        lcp_np = None
        if self.lcp is not None:
            lcp_np = np.array(jax.device_get(self.lcp), dtype=np.int64)[self.N - self.n:]
            if self.n > 0:
                lcp_np[0] = 0
        return SuffixArray(sa=sa_np, lcp=lcp_np, alphabet=self.alphabet, n=self.n)


def _pow2ceil(x: int) -> int:
    return 1 << max(0, int(x - 1).bit_length())


class _Builder:
    """Holds the mesh geometry and the jitted construction steps."""

    def __init__(self, mesh, N: int, ks: tuple[int, ...], bits: int,
                 with_lcp: bool, idt=jnp.int32, pack: bool = False):
        self.mesh = mesh
        self.p = num_shards(mesh)
        self.N = N
        self.s = N // self.p
        self.ks, self.bits = tuple(ks), bits
        self.with_lcp = with_lcp
        # index dtype (the reference's index_t template parameter,
        # include/suffix_array.hpp:170): int64 for texts >= 2^30 chars; all
        # global indices / bucket ids / distances / LCP values carry it,
        # while kmer words, shard ids and in-shard offsets stay int32
        self.idt = idt
        self.INF = jnp.iinfo(idt).max
        # pack pairs of 31-bit sort keys into int64 lanes (int32 builds
        # only; needs an x64-enabled trace — construct_device arranges it)
        self.pack = bool(pack) and jnp.dtype(idt) == jnp.int32
        self.sharded = NamedSharding(mesh, P(AXIS))
        self._step_cache: dict[int, object] = {}
        self._resolve_cache: dict[int, object] = {}

        shmap = functools.partial(jax.shard_map, mesh=mesh)
        x = P(AXIS)
        r = P()

        self._init = jax.jit(shmap(
            self._init_local,
            in_specs=(x, r),
            out_specs=(x, x) + ((x,) if with_lcp else ()) + (x, x) + (r, r),
        ))

    # ---------------- shared sort front end ----------------

    def _sort_keys(self, cols, gidx, p):
        """Distributed sort by (cols..., gidx); returns (sorted_cols, sa).

        Packed-key mode: pairs of the 31-bit nonnegative int32 key columns
        ride ONE int64 sort lane, with ``gidx`` packed into the final lane
        — a 64-bit sort lane costs the same as a 32-bit lane on this chip
        (benchmarks/sort_micro.py at 2^26: 5-key+payload 663 ms, packed
        3-lane 453 ms; 1-key int32 281 ms vs 1-key int64 284 ms), so
        packing nearly halves the dense sort, the wall the reference also
        names (``mxx::sort`` dominance).  Columns are recovered exactly by
        shift/mask; lexicographic order is preserved since every column is
        nonnegative and < 2^31.
        """
        seq = list(cols) + [gidx]
        # measured threshold: at 3-5 columns the pack/unpack passes and the
        # int64 comparator eat the lane saving (2^26 DNA: 0.605 s unpacked
        # vs 0.634 s packed); at 6 columns (the F=5 dense iteration,
        # benchmarks/sort_micro.py) packing wins 663 -> 453 ms
        if not self.pack or len(seq) < 6:
            ops = dist_sort_local(tuple(seq), num_keys=len(seq), p=p)
            return ops[:-1], ops[-1]
        i64 = jnp.int64
        lanes = []
        for k in range(0, len(seq) - 1, 2):
            lanes.append((seq[k].astype(i64) << 32) | seq[k + 1].astype(i64))
        odd = len(seq) % 2
        if odd:
            # the trailing key stays int32: an int64 lane for one 31-bit
            # key adds 4 bytes/element of sort traffic for nothing
            lanes.append(seq[-1])
        lanes = dist_sort_local(tuple(lanes), num_keys=len(lanes), p=p)
        mask = (1 << 32) - 1
        out = []
        for lane in (lanes[:-1] if odd else lanes):
            out.append((lane >> 32).astype(jnp.int32))
            out.append((lane & mask).astype(jnp.int32))
        if odd:
            out.append(lanes[-1])
        return tuple(out[:-1]), out[-1]

    # ---------------- init: k-mer ranking ----------------

    def _init_local(self, codes_l, n_real):
        s, p, N = self.s, self.p, self.N
        ks, bits = self.ks, self.bits
        idt = self.idt
        halo = halo_from_right(codes_l, sum(ks) - 1, p)
        words = pack_kmers_local(jnp.concatenate([codes_l, halo]), s, ks, bits)
        gidx = (global_index_base(s) + jnp.arange(s, dtype=jnp.int32)).astype(idt)
        # Padding suffixes (all-0 windows <=> first word == 0, since 0-chars
        # only occur as a suffix of the padded text; real suffixes always
        # have word0 >= 1) are content-indistinguishable at any doubling
        # distance, so give them their final ranks now: all-sentinel suffixes
        # order by descending position (shorter-is-prefix rule), before every
        # real suffix. Encode as a unique low key in the LAST word.
        # pad_rank stays int32: word0==0 rows sit within k + padding of the
        # global end, so N - gidx < 2^31 on those lanes (others discarded)
        pad_rank = (jnp.asarray(N, idt) - gidx).astype(jnp.int32)
        words = words[:-1] + (jnp.where(words[0] == 0, pad_rank, words[-1]),)
        wsort, sa = self._sort_keys(words, gidx, p)
        prevs = tuple(
            jnp.concatenate([halo_from_left(w, 1, p, fill=-1), w[:-1]])
            for w in wsort)
        newb = functools.reduce(
            jnp.logical_or, (w != pw for w, pw in zip(wsort, prevs)))
        isa_new, b_new, active, counts = self._rebucket_and_isa(newb, gidx, sa)
        outs = (isa_new, sa)
        if self.with_lcp:
            lcpv = lcp_bitwise_words(prevs, wsort, ks, bits)
            lcp0 = jnp.where(newb, lcpv.astype(idt), jnp.asarray(N, idt))
            # ranks 0..N-n-1 are the padding suffixes (zeros of length r+...):
            # adjacent all-sentinel suffixes overlap in exactly r chars.
            lcp0 = jnp.where(gidx < jnp.asarray(N, idt) - n_real, gidx, lcp0)
            lcp0 = jnp.where(gidx == 0, jnp.asarray(0, idt), lcp0)
            outs = outs + (lcp0,)
        return outs + (b_new, active) + counts

    # ---------------- shared rebucket + SA->ISA ----------------

    def _rebucket_and_isa(self, newb, gpos, sa):
        """New bucket ids (1-based start-index convention) + ISA scatter + counts.

        Reference ``rebucket`` (``include/bucketing.hpp:58-129``): boundary
        marking with a one-element halo, segmented broadcast of the bucket
        head index via a distributed max-scan, and the (buckets, elements)
        unfinished counters that drive loop exit.  Also returns the new
        bucket ids and the active (non-singleton) mask *by SA row* so the
        sparse-tail entry needs no re-derivation.
        """
        p, N = self.p, self.N
        idt = self.idt
        cand = jnp.where(newb, gpos + 1, 0).astype(idt)
        b_new = global_cummax(cand, p)
        nxt_halo = halo_from_right(newb, 1, p, fill=True)
        nxt = jnp.concatenate([newb[1:], nxt_halo])
        singleton = newb & nxt
        tot_buckets = lax.psum(jnp.sum(newb.astype(idt)), AXIS)
        tot_single = lax.psum(jnp.sum(singleton.astype(idt)), AXIS)
        unfinished_buckets = tot_buckets - tot_single
        unfinished_els = jnp.asarray(N, idt) - tot_single
        (isa_new,) = scatter_by_index_local(sa, (b_new,), p)
        return isa_new, b_new, ~singleton, (unfinished_buckets, unfinished_els)

    # ---------------- one doubling iteration ----------------

    def step(self, q: int):
        """Jitted doubling step for static shard-distance q = d // s."""
        if q not in self._step_cache:
            x, r = P(AXIS), P()
            lcp_outs = (x, x, x, x, r) if self.with_lcp else ()
            fn = jax.shard_map(
                functools.partial(self._step_local, q=q),
                mesh=self.mesh,
                in_specs=(x,) + ((x,) if self.with_lcp else ()) + (r,),
                out_specs=(x, x) + lcp_outs + (x, x) + (r, r),
            )
            self._step_cache[q] = jax.jit(fn)
        return self._step_cache[q]

    # ---------------- prefix-L-pling step (reference construct_arr<L>) ----

    def step_arr(self, qs: tuple):
        """Jitted prefix-L-pling step: sort by (B, B[i+d], ..., B[i+(L-1)d]).

        Reference ``construct_arr<L>`` (include/suffix_array.hpp:488-641):
        L-1 shifts per iteration triple/quadruple the covered prefix, no LCP
        support. ``qs`` are the static shard-distances of the L-1 shifts.
        """
        key = ("arr",) + tuple(qs)
        if key not in self._step_cache:
            x, r = P(AXIS), P()
            fn = jax.shard_map(
                functools.partial(self._step_arr_local, qs=tuple(qs)),
                mesh=self.mesh,
                in_specs=(x, r),
                out_specs=(x, x, x, x, r, r))
            self._step_cache[key] = jax.jit(fn)
        return self._step_cache[key]

    def _step_arr_local(self, isa_l, d, *, qs: tuple):
        s, p, N = self.s, self.p, self.N
        gidx = (global_index_base(s) + jnp.arange(s, dtype=jnp.int32)).astype(self.idt)
        keys = [isa_l]
        for j, qj in enumerate(qs, start=1):
            keys.append(global_shift_left(isa_l, jnp.asarray(j, self.idt) * d, qj, p))
        sorted_ops = self._sort_keys(tuple(keys), gidx, p)
        sa = sorted_ops[1]
        sorted_ops = sorted_ops[0] + (sa,)
        newb = jnp.zeros((s,), jnp.bool_)
        for ks in sorted_ops[:-1]:
            prev = jnp.concatenate([halo_from_left(ks, 1, p, fill=-1), ks[:-1]])
            newb = newb | (ks != prev)
        isa_new, b_new, active, counts = self._rebucket_and_isa(newb, gidx, sa)
        return (isa_new, sa, b_new, active) + counts

    def _shift(self, x, d, q):
        """Doubling shift: static shard-distance ``q`` selects the 2-ppermute
        pattern (host-driven loop); ``q=None`` uses the traced-distance
        ladder (fused while_loop)."""
        if q is None:
            return global_shift_left_dyn(x, d, self.p)
        return global_shift_left(x, d, q, self.p)

    def _step_local(self, isa_l, *rest, q):
        s, p, N = self.s, self.p, self.N
        if self.with_lcp:
            lcp_l, d = rest
        else:
            (d,) = rest
        b2 = self._shift(isa_l, d, q)
        gidx = (global_index_base(s) + jnp.arange(s, dtype=jnp.int32)).astype(self.idt)
        (b_s, b2_s), sa = self._sort_keys((isa_l, b2), gidx, p)
        pb = jnp.concatenate([halo_from_left(b_s, 1, p, fill=-1), b_s[:-1]])
        pb2 = jnp.concatenate([halo_from_left(b2_s, 1, p, fill=-1), b2_s[:-1]])
        newb = (b_s != pb) | (b2_s != pb2)
        isa_new, b_new, active, counts = self._rebucket_and_isa(newb, gidx, sa)
        if not self.with_lcp:
            return (isa_new, sa) + (b_new, active) + counts

        # --- LCP bookkeeping (reference resolve_next_lcp,
        #     suffix_array.hpp:1444-1508): new splits inside an old bucket.
        split = (b_s == pb) & (b2_s != pb2)
        zerocase = split & ((pb2 == 0) | (b2_s == 0))
        lcp_l = jnp.where(zerocase & (lcp_l == N), d.astype(self.idt), lcp_l)
        querycase = split & (pb2 != 0) & (b2_s != 0)
        # range between the two old B2 buckets: 1-based ids lb < rb ->
        # 0-based inclusive LCP range [lb, rb-1].
        lq = jnp.minimum(pb2, b2_s)
        rq = jnp.maximum(pb2, b2_s) - 1
        nq = lax.psum(jnp.sum(querycase.astype(self.idt)), AXIS)
        qkey = jnp.where(querycase, gidx, self.INF)
        return (isa_new, sa, lcp_l, qkey, lq, rq, nq) + (b_new, active) + counts

    # ---------------- LCP resolve (bulk RMQ + scatter) ----------------

    def resolve(self, m_pad: int, capscale: int | None = None):
        """Host-path LCP resolve: compact queries, bulk-RMQ, scatter back.

        ``capscale`` bounds the routed exchange buffers to
        ~capscale*m_pad/p per destination (reference routes O(m) via ragged
        all2allv, ``bulk_rma.hpp:112-135``); the returned overflow count is
        nonzero if the destination skew exceeded it and the caller must
        retry with ``capscale=None`` (cap = m, never overflows).
        """
        key = (m_pad, capscale)
        if key not in self._resolve_cache:
            x = P(AXIS)

            # compact by one distributed 1-key sort (INF keys sink to
            # the tail); searchsorted compaction costs ~10x more at
            # multi-M needle counts on TPU
            def impl(lcp, qkey, lq, rq, d):
                compact = jax.shard_map(
                    lambda a, b, c: dist_sort_local((a, b, c),
                                                    num_keys=1, p=self.p),
                    mesh=self.mesh, in_specs=(x, x, x),
                    out_specs=(x, x, x))
                ks, ls, rs = compact(qkey, lq, rq)
                ks = jax.sharding.reshard(ks[:m_pad], self.sharded)
                ls = jax.sharding.reshard(ls[:m_pad], self.sharded)
                rs = jax.sharding.reshard(rs[:m_pad], self.sharded)
                solve = jax.shard_map(
                    functools.partial(self._resolve_local,
                                      capscale=capscale),
                    mesh=self.mesh, in_specs=(x, x, x, x, P()),
                    out_specs=(x, P()))
                return solve(lcp, ks, ls, rs, d)

            self._resolve_cache[key] = jax.jit(impl)
        return self._resolve_cache[key]

    def _resolve_fused_local(self, lcp_l, qkey, lq, rq, jcol, d, *,
                             m_pad: int, L: int = 2):
        """In-program LCP resolve: one local 1-key compaction sort per shard
        (INF keys sink), then m_pad-sized chunks answered against a
        local/distributed RMQ and scattered back.  ``jcol`` is the per-query
        L-pling column (1..L-1; the additive distance is jcol*d).

        The compaction sorts a packed key — local row * (L-1) + (jcol-1) —
        so the per-query distance column never rides the sort (the chunk
        decodes jcol from the key); lq/rq stay sort operands (re-gathering
        them per chunk from the full arrays measured SLOWER: two random
        m_pad-gathers per chunk beat carrying two operands through a 1-key
        sort only for tiny query counts).  Packing needs s*(L-1) to fit the
        index dtype; the rare int32 build with s*(L-1) >= 2^31 falls back
        to the extra operand.

        Every query's target row is generated by — and therefore owned by —
        this shard (qkey comes from the step's own gidx), so the chunk
        scatter is LOCAL at any p, into a drop-slot-padded (s+1,) buffer
        carried through the whole while_loop: padding the buffer inside the
        chunk body instead re-copied the full LCP array once per chunk
        (~0.8 GB of pure copy traffic per chunk at 100M).  Only the RMQ
        answering is distributed at p > 1 (left/middle/right shard query);
        the chunk loop runs to the MAX per-shard query count (a pmax) so
        every shard participates in each chunk's collectives; drained
        shards pass all-invalid chunks.

        All chunks are answered against the PRE-resolve LCP state (the RMQ
        is built once), matching the reference's bulk answer timing
        (resolve_next_lcp answers every query of an iteration against the
        post-zerocase array).  A duplicate chunk caused by the final
        dynamic-slice clamp rewrites identical values (idempotent).
        """
        s, p = self.s, self.p
        idt = self.idt
        Lm = max(1, L - 1)
        cnt = jnp.sum((qkey != self.INF).astype(idt))
        nq = lax.pmax(cnt, AXIS) if p > 1 else cnt
        base = (lax.axis_index(AXIS).astype(
            jax.dtypes.canonicalize_dtype(jnp.int64)) * s).astype(idt) \
            if p > 1 else jnp.asarray(0, idt)
        imax = int(np.iinfo(np.dtype(jnp.dtype(idt).name)).max)
        # narrow tier (p == 1 only: global == local LCP ranges): bucket
        # splits concentrate at TINY ranges — [lq, rq] with rq-lq < 8 spans
        # at most two 8-wide rows, answered with two row reads instead of
        # the 128-wide windows + table gathers of the general path.  A
        # class bit packed above the row key groups narrow queries into
        # their own chunks (the sort is ascending, so at most one chunk
        # straddles and takes the general path for all its rows).
        narrow = p == 1 and s % 8 == 0 and imax // (2 * Lm) > s
        packed = imax // Lm > s
        if narrow:
            wide = (rq - lq) >= 8
            key2 = jnp.where(
                qkey == self.INF, self.INF,
                (jnp.where(wide, s, 0) + qkey - base) * Lm
                + (jcol - 1).astype(idt))
            ks, ls, rs = lax.sort((key2, lq, rq), num_keys=1)
            js = None
        elif packed and Lm > 1:
            key2 = jnp.where(qkey == self.INF, self.INF,
                             (qkey - base) * Lm + (jcol - 1).astype(idt))
            ks, ls, rs = lax.sort((key2, lq, rq), num_keys=1)
            js = None
        elif Lm == 1:
            ks, ls, rs = lax.sort((qkey, lq, rq), num_keys=1)
            js = None
        else:
            ks, ls, rs, js = lax.sort((qkey, lq, rq, jcol), num_keys=1)
        rmq = build_local_rmq(lcp_l, with_small=False)
        smins = shard_minima(lcp_l, p) if p > 1 else None
        xb8 = lcp_l.reshape(s // 8, 8) if narrow else None
        INFV = jnp.iinfo(lcp_l.dtype).max

        def cond(st):
            return st[0].astype(idt) * m_pad < nq

        def body(st):
            c, lcp_pad = st
            off = c.astype(idt) * m_pad
            kq_c = lax.dynamic_slice_in_dim(ks, off, m_pad)
            l_c = lax.dynamic_slice_in_dim(ls, off, m_pad)
            r_c = lax.dynamic_slice_in_dim(rs, off, m_pad)
            valid = kq_c != self.INF
            if js is not None:
                j_c = lax.dynamic_slice_in_dim(js, off, m_pad)
                row_loc = jnp.where(valid, kq_c - base, 0)
            elif narrow or Lm > 1:
                kdec = jnp.where(valid, kq_c, 0)
                if narrow:
                    kdec = jnp.where(kdec >= s * Lm, kdec - s * Lm, kdec)
                row_loc = jnp.clip(kdec // Lm, 0, s - 1)
                j_c = (kdec - row_loc * Lm).astype(idt) + 1
            else:
                row_loc = jnp.where(valid, kq_c - base, 0)
                j_c = jnp.ones_like(kq_c)
            d_c = j_c * d.astype(idt)
            if p == 1:
                lo = jnp.clip(jnp.where(valid, l_c, 0), 0, s - 1)
                hi = jnp.clip(jnp.where(valid, jnp.maximum(r_c, l_c), 0),
                              0, s - 1)

                def narrow_mins(_):
                    bl = lo // 8
                    bh = hi // 8
                    lw = jnp.take(xb8, bl, axis=0)  # (m_pad, 8)
                    rw = jnp.take(xb8, bh, axis=0)
                    o8 = jnp.arange(8, dtype=jnp.int32)[None, :]
                    lo_off = (lo - bl * 8)[:, None].astype(jnp.int32)
                    hi_off = (hi - bh * 8)[:, None].astype(jnp.int32)
                    same = (bl == bh)[:, None]
                    lmask = (o8 >= lo_off) & (~same | (o8 <= hi_off))
                    rmask = (o8 <= hi_off) & (~same | (o8 >= lo_off))
                    return jnp.minimum(
                        jnp.min(jnp.where(lmask, lw, INFV), axis=1),
                        jnp.min(jnp.where(rmask, rw, INFV), axis=1))

                def wide_mins(_):
                    return query_local_rmq(rmq, lo, hi)

                if narrow:
                    # ascending class keys: a chunk is all-narrow unless it
                    # contains a wide (class-1) key
                    has_wide = jnp.max(jnp.where(valid, kq_c, 0)) >= s * Lm
                    mins = lax.cond(has_wide, wide_mins, narrow_mins, None)
                else:
                    mins = wide_mins(None)
            else:
                # lq/rq are GLOBAL LCP ranges; bulk_rmq_local splits them
                # into left/middle/right shard parts itself
                mins = bulk_rmq_local(rmq, smins,
                                      jnp.where(valid, l_c, 0),
                                      jnp.where(valid, r_c, 0),
                                      valid, s, p)
            newv = d_c + mins
            row = jnp.where(valid, row_loc, jnp.asarray(s, idt))
            lcp_pad = lcp_pad.at[row].set(jnp.where(valid, newv, 0))
            return (c + 1, lcp_pad)

        lcp_pad0 = jnp.concatenate([lcp_l, jnp.zeros((1,), lcp_l.dtype)])
        _, lcp_new = lax.while_loop(cond, body, (jnp.int32(0), lcp_pad0))
        return lcp_new[:s]

    # ---------------- prefix-quadrupling dense step (with LCP) ----------

    def _step4_local(self, isa_l, *rest, qs):
        return self._stepL_local(isa_l, *rest, qs=qs, L=4)

    def _stepL_local(self, isa_l, *rest, qs, L: int):
        """One prefix-L-pling iteration WITH interleaved LCP: sort by
        (B, B@d, ..., B@(L-1)d, i); a split at first-differing column j gets
        LCP = j*d + min-range between the two column-j buckets (the same
        resolve_next_lcp recurrence, with additive j*d — the reference's
        construct_arr<L> supports no LCP; this extends it, and to L = 8:
        sort width grows linearly with L while the dense iteration count
        shrinks by log L, a net win on repeat-heavy corpora)."""
        s, p, N = self.s, self.p, self.N
        idt = self.idt
        if self.with_lcp:
            lcp_l, d = rest
        else:
            (d,) = rest
        gidx = (global_index_base(s) + jnp.arange(s, dtype=jnp.int32)).astype(idt)
        qcols = qs if qs is not None else (None,) * (L - 1)
        cols = [isa_l] + [self._shift(isa_l, j * d, qcols[j - 1])
                          for j in range(1, L)]
        bcols, sa = self._sort_keys(tuple(cols), gidx, p)

        def prev_of(a, fill=-1):
            return jnp.concatenate(
                [halo_from_left(a, 1, p, fill=fill), a[:-1]])

        pcols = [prev_of(a) for a in bcols]
        diffs = [b != pb for b, pb in zip(bcols, pcols)]
        newb = functools.reduce(jnp.logical_or, diffs)
        isa_new, b_new, active, counts = self._rebucket_and_isa(newb, gidx, sa)
        if not self.with_lcp:
            return (isa_new, sa) + (b_new, active) + counts

        split = ~diffs[0] & functools.reduce(jnp.logical_or, diffs[1:])
        # first differing column j in 1..L-1 and its (prev, cur) bucket pair
        jcol = jnp.asarray(L - 1, idt)
        pv, cv = pcols[L - 1], bcols[L - 1]
        for j in range(L - 2, 0, -1):
            jcol = jnp.where(diffs[j], j, jcol)
            pv = jnp.where(diffs[j], pcols[j], pv)
            cv = jnp.where(diffs[j], bcols[j], cv)
        zero = (pv == 0) | (cv == 0)
        lcp_l = jnp.where(split & zero & (lcp_l == N), jcol * d.astype(idt),
                          lcp_l)
        querycase = split & ~zero
        lq = jnp.minimum(pv, cv)
        rq = jnp.maximum(pv, cv) - 1
        nq = lax.psum(jnp.sum(querycase.astype(idt)), AXIS)
        qkey = jnp.where(querycase, gidx, self.INF)
        return (isa_new, sa, lcp_l, qkey, lq, rq, jcol, nq) + \
            (b_new, active) + counts

    def _redistribute_compact(self, bufs: tuple, cnt, fills, m_cap: int):
        """Block-redistribute per-shard compacted prefixes into (m_cap,)
        globally compact buffers (sl = m_cap/p slots per shard).  ``bufs``
        are per-shard local arrays whose first ``cnt`` entries are valid and
        in global row order (shard-major), so the global compact position of
        shard r's local slot t is carry_r + t."""
        p = self.p
        idt = self.idt
        sl = m_cap // p
        llen = bufs[0].shape[0]
        counts = lax.all_gather(cnt, AXIS)  # (p,)
        total = lax.psum(cnt, AXIS)  # psum is vma-replicated (all_gather isn't)
        i = lax.axis_index(AXIS)
        carries = jnp.concatenate(
            [jnp.zeros((1,), idt), jnp.cumsum(counts).astype(idt)])
        gath = [lax.all_gather(bf, AXIS) for bf in bufs]  # (p, llen) each
        g = i.astype(jnp.int32) * sl + jnp.arange(sl, dtype=jnp.int32)
        owner = jnp.clip(
            jnp.searchsorted(carries, g, side="right").astype(jnp.int32) - 1,
            0, p - 1)
        slot = jnp.clip(g - carries[owner], 0, llen - 1).astype(jnp.int32)
        valid = g < jnp.minimum(total, m_cap)
        outs = tuple(jnp.where(valid, ga[owner, slot], jnp.asarray(f, ga.dtype))
                     for ga, f in zip(gath, fills))
        return outs, total

    def _tail_recompact_local(self, bufs: tuple, *, m_from: int, m_to: int):
        """Shrink the compact tail buffers once the active count fits a
        smaller capacity (static tail shapes scale every tail sort/route
        with the capacity, so converged-down phases should not keep paying
        the entry capacity).  Each shard extracts its valid prefix locally
        (order preserved); at p > 1 the prefixes are then block-
        redistributed over the smaller capacity."""
        p = self.p
        sl_from = m_from // p
        cb = bufs[1]
        valid = cb != self.INF
        le = min(sl_from, m_to)
        c_l = jnp.cumsum(valid.astype(jnp.int32))
        tq = jnp.arange(1, le + 1, dtype=jnp.int32)
        idx = jnp.searchsorted(c_l, tq, side="left").astype(jnp.int32)
        ok = tq <= c_l[-1]
        safe = jnp.clip(idx, 0, sl_from - 1)
        fills = (0, self.INF, 0)
        loc = tuple(jnp.where(ok, b[safe], jnp.asarray(f, b.dtype))
                    for b, f in zip(bufs, fills))
        if p == 1:
            return loc
        cnt = jnp.sum(valid.astype(self.idt))
        outs, _total = self._redistribute_compact(
            loc, cnt, fills[:len(bufs)], m_to)
        return outs

    def _resolve_local(self, lcp_l, kq, lq, rq, d, capscale=None):
        from psac_tpu.parallel.route import cap_for

        s, p = self.s, self.p
        # row-window few-query mode: random gathers into the (log b, s)
        # in-block tables run ~1us/row at multi-M-element footprints, while
        # row-aligned 128-wide window reads stay bandwidth-bound
        rmq = build_local_rmq(lcp_l, with_small=False)
        smins = shard_minima(lcp_l, p)
        valid = kq != self.INF
        cap = cap_for(kq.shape[0], p, capscale)
        mins, ovf_q = bulk_rmq_local(rmq, smins, lq, rq, valid, s, p,
                                     cap=cap, with_overflow=True)
        newval = (d.astype(self.idt) + mins)
        (lcp_new,), ovf_s = route_scatter(kq, (newval,), (lcp_l,), valid,
                                          s, p, cap=cap, with_overflow=True)
        return lcp_new, ovf_q + ovf_s

    # ---------------- sparse tail ("bucket chaising") ----------------
    #
    # Reference ``construct_msgs`` (include/suffix_array.hpp:1033-1299):
    # once few elements remain unfinished, stop sorting all n — keep a
    # compacted record (SA row, suffix pos, bucket id) per active element
    # in a capacity-padded buffer, and per iteration: sparse-gather
    # B2 = ISA[pos + d] from the dense ISA, sort only the compacted set,
    # rebucket segment-wise, and scatter the refined rows/ranks (and LCP
    # values via dense bulk RMQ) back into the dense arrays.  The
    # reference's dynamic per-bucket subcommunicator sorts collapse to one
    # static-shape distributed sort of the compacted buffer.

    gsa_mode = False  # _GsaBuilder flips this: eos-aware tail

    def tail_enter(self, m_cap: int):
        key = ("enter", m_cap)
        if key not in self._step_cache:
            x = P(AXIS)
            nin = 4 if self.gsa_mode else 3
            nout = 3 if self.gsa_mode else 2
            fn = jax.shard_map(
                functools.partial(self._tail_enter_local, m_cap=m_cap),
                mesh=self.mesh, in_specs=(x,) * nin,
                out_specs=(x,) * nout + (P(),))
            self._step_cache[key] = jax.jit(fn)
        return self._step_cache[key]

    def _tail_enter_local(self, sa_l, brow_l, active_l, eos_row=None, *, m_cap: int):
        """Compact the active rows into the (m_cap,) tail buffers; the
        bucket-by-row and active mask come straight from the previous
        rebucket (no re-derivation).  In GSA mode also carries each
        record's end-of-string bound.

        Gather formulation: the t-th active element's index is a
        ``searchsorted`` over the inclusive cumsum of the mask (cost scales
        with m_cap; ~0.5us per slot at 16M inputs), or — when m_cap is a
        large fraction of s — one stable local sort by the inactive flag
        (actives first, row order preserved; flat ~7ns/elem), whichever is
        cheaper.  A scatter formulation runs ~1us per update row
        (serialized) and loses to both.
        """
        s, p = self.s, self.p
        idt = self.idt
        cnt = jnp.sum(active_l.astype(idt))
        vals = (sa_l, brow_l) + (() if eos_row is None else (eos_row,))
        fills = (0, self.INF) + (() if eos_row is None else (0,))
        if m_cap >= s // 16:
            # sort-based compaction: actives first, stable => row order kept
            key = (~active_l).astype(jnp.int32)
            sorted_ops = lax.sort((key,) + vals, num_keys=1, is_stable=True)
            ok = jnp.arange(m_cap, dtype=jnp.int32) < cnt
            take = min(m_cap, s)
            bufs = []
            for o, f in zip(sorted_ops[1:], fills):
                b = o[:take]
                if m_cap > s:
                    b = jnp.concatenate(
                        [b, jnp.full((m_cap - s,), f, o.dtype)])
                bufs.append(jnp.where(ok, b, jnp.asarray(f, o.dtype)))
        else:
            # local extraction: local slot t (0-based) holds the (t+1)-th
            # active element; searchsorted over the inclusive count gives
            # its index
            c_l = jnp.cumsum(active_l.astype(idt))
            tq = jnp.arange(1, m_cap + 1, dtype=jnp.int32)
            idx = jnp.searchsorted(c_l, tq, side="left")
            ok = tq <= cnt
            safe = jnp.clip(idx, 0, s - 1).astype(idt)
            # no row field: the compact set stays in row order, and ties
            # inside a (bucket, B2) group sort by position cs — the same
            # deterministic order the dense sort produces
            bufs = [jnp.where(ok, v[safe], jnp.asarray(f, v.dtype))
                    for v, f in zip(vals, fills)]
        if p == 1:
            total = lax.psum(cnt, AXIS)  # vma-replicated for the P() output
            return tuple(bufs) + (total,)
        outs, total = self._redistribute_compact(tuple(bufs), cnt, fills,
                                                 m_cap)
        return outs + (total,)

    # ---------------- fully fused construction (any shard count) --------
    #
    # Through a remote-device transport every host<->device round trip costs
    # tens of ms; the host-driven loop pays one per iteration.  The whole
    # construction therefore runs as ONE dispatched program at every p:
    # k-mer init -> dense L-pling lax.while_loop with the shift distance d
    # TRACED (p == 1: a local dynamic slice; p > 1: the conditional
    # power-of-two ppermute ladder, ``global_shift_left_dyn``) and the LCP
    # resolve chunked in-program -> two-stage sparse bucket-chaising tail —
    # with a single (4,) stats readback.  The reference's entire hot loop is
    # likewise rank-native with no coordinator
    # (``include/suffix_array.hpp:365-486``).

    def fused_full(self, m_cap: int, m_cap2: int, factor: int = 4,
                   resolve_div: int = 32):
        key = ("fused_full", m_cap, m_cap2, factor, resolve_div)
        if key not in self._step_cache:
            x, r = P(AXIS), P()
            nout = 6 if self.with_lcp else 5
            fn = jax.shard_map(
                functools.partial(self._fused_full_local, m_cap=m_cap,
                                  m_cap2=m_cap2, factor=factor,
                                  resolve_div=resolve_div),
                mesh=self.mesh, in_specs=(x, r),
                out_specs=(x,) * (nout - 1) + (r,))
            self._step_cache[key] = jax.jit(fn)
        return self._step_cache[key]

    def _fused_full_local(self, codes_l, n_real, *, m_cap: int,
                          m_cap2: int, factor: int = 4,
                          resolve_div: int = 32):
        """init -> dense L-pling while_loop -> two-stage sparse tail."""
        idt = self.idt
        # small chunks: early iterations (few queries) pay one small chunk
        # instead of a quarter-array one; late iterations loop a few times
        # (measured on the 16 MiB repetitive corpus: s/32 1.86s, s/16
        # 1.93s, s/8 2.40s, s/4 3.26s)
        m_pad = max(8, self.s // resolve_div)
        outs = self._init_local(codes_l, n_real)
        if self.with_lcp:
            isa, sa, lcp, brow, active, ub, ue = outs
        else:
            isa, sa, brow, active, ub, ue = outs
            lcp = None

        def dense_step(isa, lcp, extra, d):
            if self.with_lcp:
                if factor >= 3:
                    isa, sa, lcp, qkey, lq, rq, jcol, _nq, brow, active, \
                        ub, ue = self._stepL_local(isa, lcp, d, qs=None,
                                                   L=factor)
                else:
                    isa, sa, lcp, qkey, lq, rq, _nq, brow, active, ub, ue = \
                        self._step_local(isa, lcp, d, q=None)
                    jcol = jnp.ones(qkey.shape, idt)
                # PSAC_DIAG_NO_RESOLVE: benchmark diagnostic ONLY — skips
                # the range-min resolve so its share of the LCP cost can be
                # isolated (results are WRONG with it set)
                import os as _os
                if not _os.environ.get("PSAC_DIAG_NO_RESOLVE"):
                    lcp = self._resolve_fused_local(lcp, qkey, lq, rq, jcol,
                                                    d, m_pad=m_pad, L=factor)
            elif factor >= 3:
                isa, sa, brow, active, ub, ue = self._stepL_local(
                    isa, d, qs=None, L=factor)
            else:
                isa, sa, brow, active, ub, ue = self._step_local(
                    isa, d, q=None)
            return isa, sa, lcp, brow, active, (), ub, ue, d * factor

        return self._fused_drive((isa, sa, lcp, brow, active, (), ub, ue),
                                 dense_step, m_cap=m_cap, m_cap2=m_cap2)

    def _fused_drive(self, init_outs, dense_step, *, m_cap: int,
                     m_cap2: int):
        """Shared fused-construction orchestration (SA and GSA drivers).

        ``init_outs`` = (isa, sa, lcp|None, brow, active, extra, ub, ue)
        with ``extra`` the per-SA-row companion buffers the tail entry needs
        (GSA: the row-aligned end-of-string bound).  ``dense_step(isa, lcp,
        extra, d)`` runs ONE dense iteration including its LCP resolve and
        returns (isa, sa, lcp, brow, active, extra, ub, ue, d_next).

        Dense while_loop (hands over once the active set fits ``m_cap``) ->
        two-stage sparse tail: entry at ``m_cap``, recompaction to
        ``m_cap2`` once the active count drops — converging corpora (k-mer
        init separates almost everything) enter at ``m_cap2`` directly and
        never pay the big stage.  Returns (isa, sa[, lcp], brow, active,
        stats) with stats = [ub, ue, tail_ran, d] (replicated) so a host
        fallback can resume from d if the tail never fit.
        """
        N = self.N
        idt = self.idt
        isa, sa, lcp, brow, active, extra, ub, ue = init_outs
        with_lcp = self.with_lcp
        if lcp is None:
            lcp = jnp.zeros((self.s,), idt)  # carried placeholder
        ne = len(extra)
        nb = 3 if self.gsa_mode else 2  # compact tail buffer count
        d0 = jnp.asarray(sum(self.ks), idt)
        max_iters = jnp.int32(max(4, int(N).bit_length() + 2))
        cap_t = jnp.asarray(m_cap, idt)
        cap2_t = jnp.asarray(m_cap2, idt)

        def dcond(st):
            ub, ue, d, it = st[5 + ne:]
            return (ub > 0) & (ue > cap_t) & (it < max_iters)

        def dbody(st):
            isa, sa, lcp, brow, active = st[:5]
            extra = st[5:5 + ne]
            ub, ue, d, it = st[5 + ne:]
            isa, sa, lcp, brow, active, extra, ub, ue, d = dense_step(
                isa, lcp, extra, d)
            return (isa, sa, lcp, brow, active) + extra + (ub, ue, d, it + 1)

        st = (isa, sa, lcp, brow, active) + extra + (ub, ue, d0,
                                                     jnp.int32(0))
        st = lax.while_loop(dcond, dbody, st)
        isa, sa, lcp, brow, active = st[:5]
        extra = st[5:5 + ne]
        ub, ue, d, _ = st[5 + ne:]

        fits = (ue > 0) & (ue <= cap_t)

        def tail_loop(ts, cap, stop):
            def cond(t_):
                return (t_[-1] > stop) & (t_[-2] < max_iters)

            def body(t_):
                cbufs = t_[:nb]
                isa, sa, lcp, dd, it, _ = t_[nb:]
                if with_lcp:
                    *cbufs, isa, sa, lcp, tue = self._tail_step_local(
                        *cbufs, isa, sa, lcp, dd, m_cap=cap)
                else:
                    *cbufs, isa, sa, tue = self._tail_step_local(
                        *cbufs, isa, sa, dd, m_cap=cap)
                dd = jnp.minimum(dd * 2, jnp.asarray(N, idt))
                return tuple(cbufs) + (isa, sa, lcp, dd, it + 1, tue)

            return lax.while_loop(cond, body, ts)

        def run_tail(args):
            isa, sa, lcp, d = args

            def big(args2):
                isa, sa, lcp, d = args2
                outs = self._tail_enter_local(sa, brow, active, *extra,
                                              m_cap=m_cap)
                cbufs = outs[:-1]
                ts = cbufs + (isa, sa, lcp, d, jnp.int32(0), ue)
                ts = tail_loop(ts, m_cap, cap2_t)
                cbufs = ts[:nb]
                isa, sa, lcp, d = ts[nb:nb + 4]
                ue2 = ts[-1]
                cbufs2 = self._tail_recompact_local(cbufs, m_from=m_cap,
                                                    m_to=m_cap2)
                return cbufs2 + (isa, sa, lcp, d, ue2)

            def small(args2):
                isa, sa, lcp, d = args2
                outs = self._tail_enter_local(sa, brow, active, *extra,
                                              m_cap=m_cap2)
                return outs[:-1] + (isa, sa, lcp, d, ue)

            st2 = lax.cond(ue > cap2_t, big, small, (isa, sa, lcp, d))
            cbufs2 = st2[:nb]
            isa, sa, lcp, d, ue2 = st2[nb:]
            ts = cbufs2 + (isa, sa, lcp, d, jnp.int32(0), ue2)
            ts = tail_loop(ts, m_cap2, jnp.asarray(0, idt))
            return ts[nb], ts[nb + 1], ts[nb + 2], ts[-1]

        def no_tail(args):
            isa, sa, lcp, _ = args
            return isa, sa, lcp, ue

        isa, sa, lcp, ue_out = lax.cond(fits, run_tail, no_tail,
                                        (isa, sa, lcp, d))
        stats = jnp.stack([ub, ue_out, fits.astype(idt), d])
        base = (isa, sa) + ((lcp,) if with_lcp else ())
        return base + (brow, active, stats)

    def tail_step(self, m_cap: int):
        key = ("tail", m_cap)
        if key not in self._step_cache:
            x, rr = P(AXIS), P()
            lcp_io = (x,) if self.with_lcp else ()
            nc = 3 if self.gsa_mode else 2
            fn = jax.shard_map(
                functools.partial(self._tail_step_local, m_cap=m_cap),
                mesh=self.mesh,
                in_specs=(x,) * nc + (x, x) + lcp_io + (rr,),
                out_specs=(x,) * nc + (x, x) + lcp_io + (rr,))
            self._step_cache[key] = jax.jit(fn)
        return self._step_cache[key]

    def _tail_step_local(self, cs, cb, *rest, m_cap: int):
        s, p, N = self.s, self.p, self.N
        ce = None
        if self.gsa_mode:
            ce, *rest = rest
        isa_l, sa_l, *rest = rest
        if self.with_lcp:
            lcp_l, d = rest
        else:
            (d,) = rest
        idt = self.idt
        sl = m_cap // p
        r = lax.axis_index(AXIS).astype(jnp.int32)
        valid = cb != self.INF

        # sparse B2 = ISA[pos + d] from the dense ISA (0 past the end of
        # the text / of the record's own string in GSA mode)
        tgt = cs + d.astype(idt)
        bound = jnp.asarray(N, idt) if ce is None else ce
        inb = valid & (tgt < bound)
        dest = jnp.where(inb, jnp.clip(tgt, 0, N - 1) // s, r).astype(jnp.int32)
        base = lax.axis_index(AXIS).astype(
            jax.dtypes.canonicalize_dtype(jnp.int64)) * s  # int32 w/o x64

        def gather(recv, recv_valid):
            (q,) = recv
            return (isa_l[jnp.clip(q - base, 0, s - 1).astype(jnp.int32)],)

        (b2,) = route_apply((jnp.where(inb, tgt, 0),), dest, gather,
                            (idt,), p)
        b2 = jnp.where(inb, b2, 0)
        b2 = jnp.where(valid, b2, self.INF)

        # sort the compacted records by (bucket, B2, position)
        if ce is None:
            cb_s, b2_s, cs_s = dist_sort_local((cb, b2, cs), num_keys=3, p=p)
            ce_s = None
        else:
            cb_s, b2_s, cs_s, ce_s = dist_sort_local(
                (cb, b2, cs, ce), num_keys=3, p=p)
        valid_s = cb_s != self.INF
        gi = (r * sl + jnp.arange(sl, dtype=jnp.int32)).astype(idt)

        pcb = jnp.concatenate([halo_from_left(cb_s, 1, p, fill=-1), cb_s[:-1]])
        pb2 = jnp.concatenate([halo_from_left(b2_s, 1, p, fill=-1), b2_s[:-1]])
        new_bkt = cb_s != pcb
        new_seg = new_bkt | (b2_s != pb2)

        # SA row within the (static) bucket row range [cb-1, cb-1+size)
        bkt_start = global_cummax(jnp.where(new_bkt, gi + 1, 0), p) - 1
        row = cb_s - 1 + (gi - bkt_start)
        # new bucket id = row of the (cb, b2)-segment head + 1
        b_new = global_cummax(jnp.where(new_seg, row + 1, 0), p)

        nseg_h = halo_from_right(new_seg, 1, p, fill=True)
        nseg = jnp.concatenate([new_seg[1:], nseg_h])
        settled = new_seg & nseg
        if ce is not None:
            # GSA: fully-ended suffix groups (B2 == 0) can never split
            settled = settled | (b2_s == 0)
        ue = lax.psum(jnp.sum((valid_s & ~settled).astype(idt)), AXIS)

        # scatter refined rows/ranks into the dense arrays
        (sa_new,) = route_scatter(row, (cs_s,), (sa_l,), valid_s, s, p)
        (isa_new,) = route_scatter(cs_s, (b_new,), (isa_l,), valid_s, s, p)

        cb_out = jnp.where(valid_s & ~settled, b_new, self.INF)
        outs_base = (cs_s, cb_out) + (() if ce is None else (ce_s,)) \
            + (isa_new, sa_new)
        if not self.with_lcp:
            return outs_base + (ue,)

        # LCP at new split rows (reference resolve_next_lcp semantics)
        split = valid_s & ~new_bkt & (b2_s != pb2)
        zerocase = split & ((pb2 == 0) | (b2_s == 0))
        querycase = split & (pb2 != 0) & (b2_s != 0)
        dz = jnp.broadcast_to(d.astype(idt), row.shape)
        (lcp_l,) = route_scatter(row, (dz,), (lcp_l,), zerocase, s, p)
        lq = jnp.minimum(pb2, b2_s)
        rq = jnp.maximum(pb2, b2_s) - 1
        kq = jnp.where(querycase, row, self.INF)
        # capscale None => cap = m (never overflows); ovf is statically 0
        lcp_new, _ovf = self._resolve_local(lcp_l, kq, lq, rq, d)
        return outs_base + (lcp_new, ue)


def _lc_local(lcp_l, sa_l, xs_l, *, s: int, p: int, n: int,
              capscale: int | None = None):
    """Lc[g] = text[SA[g-1] + LCP[g]] (0 past the end / at the first row)."""
    from psac_tpu.parallel.route import cap_for, route_apply

    N = s * p
    off = N - n
    g = global_index_base(s) + jnp.arange(s, dtype=jnp.int32)
    prev = jnp.concatenate([halo_from_left(sa_l, 1, p, fill=0), sa_l[:-1]])
    idx = prev + lcp_l
    real = (g > off) & (idx < n)
    safe = jnp.clip(jnp.where(real, idx, 0), 0, N - 1)
    r = lax.axis_index(AXIS).astype(jnp.int32)

    def gather(recv, recv_valid):
        (q,) = recv
        base = jnp.asarray(r, q.dtype) * s  # idt product: no int32 overflow
        return (xs_l[jnp.clip(q - base, 0, s - 1).astype(jnp.int32)],)

    (ch,), ovf = route_apply((safe,), (safe // s).astype(jnp.int32), gather,
                             (jnp.int32,), p,
                             cap=cap_for(s, p, capscale), skip=~real,
                             with_overflow=True)
    return jnp.where(real, ch, 0), ovf


_LC_CACHE: dict = {}


def compute_lc_device(dsa: DeviceSuffixArray, xs) -> jax.Array:
    """Left-branching-character array (reference ``_CONSTRUCT_LC``;
    ``include/seq_query.hpp:463-467``: Lc[i] = S[SA[i-1]+LCP[i]]), computed
    post-hoc as one bulk gather instead of interleaved with doubling.
    Returns the (N,) block-sharded padded array (codes, 0 = none/$)."""
    if dsa.lcp is None:
        raise ValueError("Lc requires the LCP array")
    p = num_shards(dsa.mesh)
    idt = jnp.dtype(dsa.sa.dtype)
    with _x64_ctx(idt):  # int64-indexed builds trace int64 ops here
        for capscale in (6, None):
            key = (mesh_key(dsa.mesh), dsa.N, dsa.n, capscale, idt.name)
            if key not in _LC_CACHE:
                fn = jax.shard_map(
                    functools.partial(_lc_local, s=dsa.N // p, p=p, n=dsa.n,
                                      capscale=capscale),
                    mesh=dsa.mesh, in_specs=(P(AXIS),) * 3,
                    out_specs=(P(AXIS), P()))
                _LC_CACHE[key] = jax.jit(fn)
            lc, ovf = _LC_CACHE[key](dsa.lcp, dsa.sa, xs)
            if capscale is None or p == 1 or int(ovf) == 0:
                break
        return lc


#: Diagnostics of the most recent ``construct_device`` call ON THIS THREAD:
#: whether the fused one-dispatch path ran and how many host-driven loop
#: iterations (each a separate dispatch + scalar readback) were needed after
#: it.  The multichip dryrun asserts host_iters == 0 (the one-program
#: guarantee).  Thread-local so overlapping builds from different threads
#: cannot corrupt each other's counters.
import threading as _threading


class _LastBuild(_threading.local):
    def __init__(self):
        self.d: dict = {}

    def update(self, **kw):
        self.d.update(kw)

    def get(self, k, default=None):
        return self.d.get(k, default)

    def __getitem__(self, k):
        return self.d[k]

    def __setitem__(self, k, v):
        self.d[k] = v

    def __repr__(self):
        return repr(self.d)


LAST_BUILD = _LastBuild()


_BUILDER_CACHE: dict[tuple, _Builder] = {}


def _get_builder(mesh, N, ks, bits, with_lcp, idt=jnp.int32,
                 pack: bool = False) -> _Builder:
    """Reuse builders (and their jitted steps) across construction calls."""
    key = (mesh_key(mesh), N, tuple(ks), bits, with_lcp,
           jnp.dtype(idt).name, pack)
    if key not in _BUILDER_CACHE:
        if len(_BUILDER_CACHE) > 64:
            _BUILDER_CACHE.clear()
        _BUILDER_CACHE[key] = _Builder(mesh, N, ks, bits, with_lcp, idt=idt,
                                       pack=pack)
    return _BUILDER_CACHE[key]


def resolve_with_retry(b: _Builder, m_pad: int, lcp, qkey, lq, rq, d):
    """Host-path LCP resolve with bounded routing buffers: try a small
    per-destination capacity first (O(m) exchange volume), escalate to the
    never-overflowing cap = m only when the destination skew demands it
    (reference imbalance reporting: ``bulk_rma.hpp:27-35``)."""
    from psac_tpu.utils.timers import timers_enabled

    for capscale in ((6, None) if b.p > 1 else (None,)):
        lcp_new, ovf = b.resolve(m_pad, capscale)(lcp, qkey, lq, rq, d)
        if capscale is None or int(ovf) == 0:
            break
        if timers_enabled():
            import sys
            print(f"[psac_tpu] resolve route overflow ({int(ovf)} records "
                  f"at capscale={capscale}); retrying with cap=m",
                  file=sys.stderr)
    return lcp_new


def index_dtype_for(N: int, config) -> object:
    """int32 while every derived quantity (bucket ids <= N+1, doubling
    distances < 2N, padding ranks) fits; int64 beyond (the reference's
    uint64 index_t builds, src/psac.cpp:54).  The ceiling lives in
    config.index_dtype."""
    if getattr(config, "force_int64", False):
        return jnp.int64
    return cfg_mod.index_dtype(N)


def _x64_ctx(idt):
    """jax_enable_x64 scope for int64 builds (without it jnp silently
    downcasts int64 to int32); a no-op scope for int32 builds."""
    import contextlib
    if jnp.dtype(idt) != jnp.int64:
        return contextlib.nullcontext()
    try:
        from jax._src.config import enable_x64  # scoped (thread-local)
        return enable_x64(True)
    except ImportError:  # pragma: no cover - jax version fallback

        @contextlib.contextmanager
        def _global_x64():
            old_val = jax.config.jax_enable_x64
            jax.config.update("jax_enable_x64", True)
            try:
                yield
            finally:
                jax.config.update("jax_enable_x64", old_val)

        return _global_x64()


def _decode_staged(xb, alpha, mesh):
    """uint8 -> dense int32 codes on device via the replicated mapping."""
    mapping = jax.device_put(alpha.mapping.astype(np.int32),
                             NamedSharding(mesh, P()))
    key = ("decode", mesh_key(mesh), xb.shape[0])
    if key not in _BUILDER_CACHE:
        _BUILDER_CACHE[key] = jax.jit(jax.shard_map(
            lambda t, m: jnp.take(m, t.astype(jnp.int32)),
            mesh=mesh, in_specs=(P(AXIS), P()), out_specs=P(AXIS)))
    return _BUILDER_CACHE[key](xb, mapping)


def encode_and_shard_file(path: str, mesh,
                          config: cfg_mod.SAConfig = cfg_mod.DEFAULT):
    """Multi-host data path: stage a file block-sharded (each process reads
    only its addressable shards' byte ranges) and detect the alphabet on
    device — no full-n host allocation on any process.  The reference's
    per-rank ``file_block_decompose`` + allreduced alphabet histogram
    (``src/psac.cpp:85``, ``include/alphabet.hpp:213-218``)."""
    from psac_tpu.parallel.staging import stage_file_block, staged_histogram

    xb, n, N = stage_file_block(path, mesh)
    hist = staged_histogram(xb, mesh)
    alpha = Alphabet.from_hist(hist, pad_zeros=N - n)
    xs = _decode_staged(xb, alpha, mesh)
    return xs, alpha, n, N


def construct_from_file(path: str, mesh=None,
                        config: cfg_mod.SAConfig = cfg_mod.DEFAULT):
    """Build SA(+LCP) from a file with per-host staging; returns the
    device-resident result plus the staged codes (for distributed checks).

    Unlike ``build_suffix_array`` this never gathers to one host, so it is
    the multi-process (N>=2 hosts) entry point: call under
    ``jax.distributed`` with a global mesh and consume the sharded result
    collectively (e.g. ``verify.check_sa.d_check_sa`` or per-host IO)."""
    from psac_tpu.parallel.mesh import make_mesh

    mesh = mesh or make_mesh()
    xs, alpha, n, N = encode_and_shard_file(path, mesh, config)
    dsa = construct_device(xs, alpha, n, N, mesh, config)
    return dsa, xs


def encode_and_shard(text: bytes | np.ndarray, mesh,
                     config: cfg_mod.SAConfig = cfg_mod.DEFAULT):
    """Host preprocessing: alphabet detection, encoding, pad + device_put.

    Byte inputs use the dense histogram alphabet; wider integer arrays use
    the min/max ``IntAlphabet`` (reference ``alphabet_helper`` dispatch,
    include/alphabet.hpp:509-513)."""
    from psac_tpu.ops.alphabet import IntAlphabet

    p = num_shards(mesh)
    if len(text) >= (1 << 40):
        raise ValueError(f"text too large: {len(text)} (2^40 char ceiling)")
    if isinstance(text, (bytes, bytearray)) or \
            np.asarray(text).dtype == np.uint8:
        # ship raw uint8 and decode on-device: host->device bandwidth is the
        # binding setup cost on remote transports, and bytes are 4x smaller
        # than int32 codes; per-shard staging avoids a full padded host copy.
        # The alphabet histogram also runs on device (a host bincount of the
        # full text costs ~0.1 s warm and 1-3 s on its first touch of a
        # fresh 100 MB buffer on this host class).
        from psac_tpu.parallel.staging import stage_bytes_block, staged_histogram

        xb, n, N = stage_bytes_block(text, mesh)
        hist = staged_histogram(xb, mesh)
        alpha = Alphabet.from_hist(hist, pad_zeros=N - n)
        xs = _decode_staged(xb, alpha, mesh)
    else:
        alpha = IntAlphabet.from_array(text)
        codes = alpha.encode(text)
        n = len(codes)
        N = padded_size(max(n, 1), p, multiple=8)
        padded = np.zeros(N, np.int32)
        padded[:n] = codes
        xs = jax.device_put(padded, block_sharding(mesh))
    return xs, alpha, n, N


def construct_device(xs, alpha, n: int, N: int, mesh,
                     config: cfg_mod.SAConfig = cfg_mod.DEFAULT) -> DeviceSuffixArray:
    """Run the construction loop; inputs/outputs stay device-resident."""
    ks = kmer_words_for(alpha.bits_per_char, config)
    k = sum(ks)
    bits = alpha.bits_per_char

    from psac_tpu.utils.timers import SectionTimer
    timer = SectionTimer(label="construct")

    idt = index_dtype_for(N, config)
    # packed-key sorts build int64 lanes inside an int32 build's trace,
    # which needs a scoped x64 trace context (all other dtypes in the
    # pipeline are explicit, so nothing else widens).  Only wide dense
    # sorts (>= 6 key columns, i.e. factor >= 5) benefit — see _sort_keys
    wide = max(config.dense_factor if config.fused else 2, config.factor) >= 5
    pack = (getattr(config, "pack_keys", True) and wide
            and jnp.dtype(idt) == jnp.int32)
    with _x64_ctx(jnp.int64 if pack else idt):
        dsa = _construct_device_inner(xs, alpha, n, N, mesh, config, idt,
                                      k, ks, bits, timer, pack)
    if config.construct_lc:
        if not config.construct_lcp:
            raise ValueError("construct_lc requires construct_lcp")
        dsa = dataclasses.replace(dsa, lc=compute_lc_device(dsa, xs))
    return dsa


def kmer_words_for(bits_per_char: int,
                   config: cfg_mod.SAConfig) -> tuple[int, ...]:
    """Per-word char counts of the initial k-mer ranking: ``kmer_words``
    int32 words filled to capacity, optionally capped by an explicit total
    ``config.k`` (the reference's ``-k`` flag, spread across words)."""
    ks = list(optimal_k(bits_per_char, words=config.kmer_words))
    if config.k:
        rem = max(1, config.k)
        out = []
        for i, kw in enumerate(ks):
            share = max(1, -(-rem // (len(ks) - i)))
            take = min(kw, share)
            out.append(take)
            rem -= take
            if rem <= 0:
                break
        ks = out
    return tuple(ks)


def _construct_device_inner(xs, alpha, n, N, mesh, config, idt,
                            k, ks, bits, timer,
                            pack: bool = False) -> DeviceSuffixArray:
    b = _get_builder(mesh, N, ks, bits, config.construct_lcp, idt=idt,
                     pack=pack)

    use_fused = config.fused
    if config.construct_lcp:
        fused_factor = config.dense_factor
    else:
        # honor the user-facing construct_arr<L> factor in the fused path
        fused_factor = config.factor

    d = k
    if use_fused:
        # one-dispatch fast path at every p: init + dense while_loop +
        # two-stage sparse tail inside a single program, a single (4,)
        # readback decides whether a host-driven fallback is needed
        m_cap2 = max(8 * b.p, min(N, _pow2ceil(max(256, N // 1024))))
        m_cap_f = max(m_cap2, min(N, _pow2ceil(
            N // max(1, config.fused_tail_div))))
        outs = b.fused_full(m_cap_f, m_cap2, factor=fused_factor,
                            resolve_div=config.resolve_div)(
            xs, jnp.asarray(n, idt))
        if config.construct_lcp:
            isa, sa, lcp, brow, active, stats = outs
        else:
            isa, sa, brow, active, stats = outs
            lcp = None
        ub, ue, tail_ran, d_out = (int(v) for v in
                                   np.asarray(jax.device_get(stats)))
        timer.end_section(
            f"fused construction (k={k}, cap {m_cap_f}, tail_ran={tail_ran})")
        timer.info(f"n={n} N={N} p={b.p} unfinished buckets={ub} "
                   f"elements(after)={ue}")
        if tail_ran:
            if ue != 0:
                raise AssertionError("fused tail failed to converge")
            ub = 0
        elif ue == 0:
            ub = 0
        else:
            d = max(d, d_out)  # resume the host fallback where the fused
            # dense loop stopped (max_iters safety bound hit)
        LAST_BUILD.update(fused=True, host_iters=0, p=b.p, n=n, N=N)
    else:
        outs = b._init(xs, jnp.asarray(n, idt))
        if config.construct_lcp:
            isa, sa, lcp, brow, active, ub, ue = outs
        else:
            isa, sa, brow, active, ub, ue = outs
            lcp = None
        ub = int(ub)
        ue = int(ue)
        timer.end_section(f"kmer-init (k={k})")
        timer.info(f"n={n} N={N} p={b.p} unfinished buckets={ub} elements={ue}")
        LAST_BUILD.update(fused=False, host_iters=0, p=b.p, n=n, N=N)

    tail_limit = int(N * config.tail_threshold_frac)
    while ub > 0:
        LAST_BUILD["host_iters"] += 1
        if d >= 2 * N:
            raise AssertionError("doubling failed to converge")
        if 0 < ue <= tail_limit:
            # ---- sparse tail: process only the active elements ----
            m_cap = min(N, max(8 * b.p, _pow2ceil(ue)))
            # the active count equals ue from the last rebucket, so the
            # capacity check needs no device readback
            cs, cb, _total = b.tail_enter(m_cap)(sa, brow, active)
            if ue <= m_cap:
                timer.end_section(f"tail-enter ({ue} active, cap {m_cap})")
                while True:
                    if config.construct_lcp:
                        cs, cb, isa, sa, lcp, ue = b.tail_step(m_cap)(
                            cs, cb, isa, sa, lcp, jnp.asarray(d, idt))
                    else:
                        cs, cb, isa, sa, ue = b.tail_step(m_cap)(
                            cs, cb, isa, sa, jnp.asarray(d, idt))
                    ue = int(ue)
                    timer.end_section(f"tail-step d={d}")
                    timer.info(f"d={d}: tail unfinished elements={ue}")
                    d *= 2
                    if ue == 0:
                        ub = 0
                        break
                    if d >= 4 * N:
                        raise AssertionError("tail failed to converge")
                break
        # loop-control scalars are stacked into ONE buffer before readback:
        # each separate device_get is a full host<->device round trip
        if not config.construct_lcp and config.factor > 2:
            qs = tuple(min(j * d // b.s, b.p) for j in range(1, config.factor))
            isa, sa, brow, active, ub, ue = b.step_arr(qs)(isa, jnp.asarray(d, idt))
            ub, ue = (int(v) for v in
                      np.asarray(jax.device_get(jnp.stack([ub, ue]))))
            timer.end_section(f"{config.factor}-pling-step d={d}")
            timer.info(f"d={d}: unfinished buckets={ub} elements={ue}")
            d *= config.factor
            continue
        q = min(d // b.s, b.p)
        if config.construct_lcp:
            isa, sa, lcp, qkey, lq, rq, nq, brow, active, ub, ue = b.step(q)(
                isa, lcp, jnp.asarray(d, idt))
            ub, ue, nq = (int(v) for v in
                          np.asarray(jax.device_get(jnp.stack([ub, ue, nq]))))
            timer.end_section(f"doubling-step d={d}")
            if nq > 0:
                m_pad = min(max(_pow2ceil(nq), b.p), N)
                lcp = resolve_with_retry(b, m_pad, lcp, qkey, lq, rq,
                                         jnp.asarray(d, idt))
                timer.end_section(f"lcp-resolve d={d} ({nq} queries)")
        else:
            isa, sa, brow, active, ub, ue = b.step(q)(isa, jnp.asarray(d, idt))
            ub, ue = (int(v) for v in
                      np.asarray(jax.device_get(jnp.stack([ub, ue]))))
            timer.end_section(f"doubling-step d={d}")
        timer.info(f"d={d}: unfinished buckets={ub} elements={ue}")
        d *= 2
    timer.summary()

    return DeviceSuffixArray(sa=sa, lcp=lcp, isa=isa, alphabet=alpha, n=n, N=N, mesh=mesh)


def build_suffix_array(text: bytes | np.ndarray, mesh=None,
                       config: cfg_mod.SAConfig = cfg_mod.DEFAULT) -> SuffixArray:
    """Construct the suffix array (and optionally LCP) of ``text`` on the mesh.

    Host-staged equivalent of the reference's
    ``suffix_array::construct`` (``include/suffix_array.hpp:365-486``).
    """
    mesh = mesh or make_mesh()
    if len(text) < 1:
        alpha = Alphabet.from_bytes(text)
        return SuffixArray(sa=np.zeros(0, np.int64),
                           lcp=np.zeros(0, np.int64) if config.construct_lcp else None,
                           alphabet=alpha, n=0)
    xs, alpha, n, N = encode_and_shard(text, mesh, config)
    return construct_device(xs, alpha, n, N, mesh, config).materialize()
