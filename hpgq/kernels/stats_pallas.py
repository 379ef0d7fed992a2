"""Pallas TPU kernel: fused single-pass stats + inline-filter partials.

One grid sweep over batch tiles of the packed ``[B, L]`` read tensors
computes — while the tile sits in VMEM — the filter verdicts and every
histogram the `stats` command needs, accumulating into VMEM-resident output
blocks across grid steps.  This guarantees exactly ONE HBM read of the
codes/quals bytes per batch (the op is memory-bound; the jnp/XLA path may
materialize intermediates), replacing the reference's per-read worker loop
(``fastq_reads_stats``, call site ``src/stats_fastq.c:230,244``) and its
serial consumer histogram merge (``src/stats_fastq.c:257-417``).

Histogram scatters are expressed as one-hot compare-reduces (TPU has no fast
vector scatter): keys ``[TB, 1]`` against a bin iota ``[1, BINS]``, summed
over the tile's read dim — O(TB·BINS) VPU ops per tile, negligible next to
the O(TB·L) data pass.

The k-mer fields (optional ``--kmers`` mode) stay on the jnp path
(``stats_jnp.kmer_codes``/``kmer_hist2d``) around this kernel; see
``make_batch_partials``.  The kernel exports its per-read pass mask, so the
ride-along reuses the in-kernel verdicts instead of recomputing them — its
only extra HBM traffic is one more read of the codes tensor (~10 us/batch;
a VMEM-resident [1024, L] per-position one-hot inside the kernel would cost
O(TB*L*1024) VPU ops per tile, ~250x the data pass, so the second read is
the right trade).

Differentially tested against ``stats_jnp.batch_partials`` (exact for all
integer fields; the f32 ``acc_quality`` tile-order sum is compared to 1e-3
relative) in ``tests/test_pallas.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import BASE_C, BASE_G, BASE_N, MAX_VALUE, MIN_VALUE
from ..io.packer import round_up as _round_up
from ..core.counters import GC_BINS, QUAL_BINS
from ..options import FilterCriteria
from .stats_jnp import MIN_LENGTH_INIT

TB = 256  # batch-tile rows (multiple of the int8 sublane tile, 32)


def _out_struct(shape, dtype, vary_axis=None):
    """pallas out_shape struct; under shard_map the vma typing requires the
    outputs to declare the manual axis they vary over."""
    if vary_axis is None:
        return jax.ShapeDtypeStruct(shape, dtype)
    return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset({vary_axis}))

# o_scalars_i lane slots
_NUM_READS, _ACC_LENGTH, _MIN_LEN, _MAX_LEN, _NUM_PASSED, _NUM_FAILED = range(6)


def _stats_kernel(codes_ref, quals_ref, lens_ref, valid_ref,
                  o_si, o_sf, o_lh, o_qh, o_gh, o_cov, o_qpn, o_bpn, o_pass,
                  *, lcap: int, phred: int, crit, lhp: int):
    """Per-tile body. crit is a substituted FilterCriteria or None (static)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_si[:] = jnp.where(lane == _MIN_LEN, MIN_LENGTH_INIT, 0)
        o_sf[:] = jnp.zeros_like(o_sf)
        o_lh[:] = jnp.zeros_like(o_lh)
        o_qh[:] = jnp.zeros_like(o_qh)
        o_gh[:] = jnp.zeros_like(o_gh)
        o_cov[:] = jnp.zeros_like(o_cov)
        o_qpn[:] = jnp.zeros_like(o_qpn)
        o_bpn[:] = jnp.zeros_like(o_bpn)

    codes = codes_ref[:].astype(jnp.int32)          # [TB, L]
    quals = quals_ref[:].astype(jnp.int32)          # [TB, L]
    lens = lens_ref[:]                              # [TB, 1]
    valid = valid_ref[:] != 0                       # [TB, 1] bool

    L = codes.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (TB, L), 1)
    mask = pos < lens
    qm = jnp.where(mask, quals, 0)
    qsum = qm.sum(axis=1, keepdims=True)            # [TB, 1]
    nn = ((codes == BASE_N) & mask).sum(axis=1, keepdims=True, dtype=jnp.int32)

    # ---- inline filter verdict (fastq_filter semantics, [D2][D3]) ----
    if crit is not None:
        ok = (lens >= crit.min_read_length) & (lens <= crit.max_read_length)
        if crit.quality_window_on:
            # [D8] legacy quality position window: the two quality screens
            # evaluate positions [begin, end) ∩ [0, len)
            qwmask = mask & (pos >= crit.begin_quality_nt) & (pos < crit.end_quality_nt)
            wlen = qwmask.sum(axis=1, keepdims=True, dtype=jnp.int32)
            wqsum = jnp.where(qwmask, quals, 0).sum(axis=1, keepdims=True)
        else:
            qwmask, wlen, wqsum = mask, lens, qsum
        qn = wqsum - phred * wlen
        ok &= (crit.min_read_quality * wlen <= qn) & (qn <= crit.max_read_quality * wlen)
        if crit.max_out_of_quality != MAX_VALUE:
            nq = quals - phred
            out_of = (
                ((nq < crit.min_read_quality) | (nq > crit.max_read_quality)) & qwmask
            ).sum(axis=1, keepdims=True, dtype=jnp.int32)
            ok &= out_of <= crit.max_out_of_quality
        if crit.left_length > MIN_VALUE:
            w = jnp.minimum(lens, crit.left_length)
            ls = jnp.where(pos < w, qm, 0).sum(axis=1, keepdims=True)
            lqn = ls - phred * w
            ok &= (crit.min_left_quality * w <= lqn) & (lqn <= crit.max_left_quality * w)
        if crit.right_length > MIN_VALUE:
            w = jnp.minimum(lens, crit.right_length)
            rs = jnp.where((pos >= lens - w) & mask, qm, 0).sum(axis=1, keepdims=True)
            rqn = rs - phred * w
            ok &= (crit.min_right_quality * w <= rqn) & (rqn <= crit.max_right_quality * w)
        ok &= nn <= crit.max_N
        passed = valid & ok
        n_passed = passed.astype(jnp.int32).sum()
        n_failed = (valid & ~ok).astype(jnp.int32).sum()
        v = passed
    else:
        n_passed = jnp.int32(0)
        n_failed = jnp.int32(0)
        v = valid

    v32 = v.astype(jnp.int32)                       # [TB, 1]
    o_pass[:] = v32  # per-read final selection (valid & verdict) — lets the
    # kmer ride-along reuse the in-kernel verdicts instead of recomputing
    vmask = mask & v

    # ---- per-position stats (one pass over the tile) ----
    o_cov[:] += vmask.sum(axis=0, keepdims=True, dtype=jnp.int32)
    o_qpn[:] += jnp.where(vmask, quals, 0).sum(axis=0, keepdims=True)
    ngc = jnp.zeros((TB, 1), jnp.int32)
    for b in range(5):
        hit = (codes == b) & vmask
        o_bpn[b, :] += hit.sum(axis=0, dtype=jnp.int32)
        if b in (BASE_C, BASE_G):
            ngc += hit.sum(axis=1, keepdims=True, dtype=jnp.int32)

    # ---- per-read reductions -> scalar + histogram partials ----
    mean_q = jnp.where(
        lens > 0, qsum.astype(jnp.float32) / lens.astype(jnp.float32), 0.0
    )

    tile_nr = v32.sum()
    tile_al = (lens * v32).sum()
    tile_min = jnp.where(v, lens, MIN_LENGTH_INIT).min()
    tile_max = jnp.where(v, lens, 0).max()
    tile_aq = jnp.where(v, mean_q, 0.0).sum()

    sumvec = (
        jnp.where(lane == _NUM_READS, tile_nr, 0)
        + jnp.where(lane == _ACC_LENGTH, tile_al, 0)
        + jnp.where(lane == _NUM_PASSED, n_passed, 0)
        + jnp.where(lane == _NUM_FAILED, n_failed, 0)
    )
    cur = o_si[:]
    upd = cur + sumvec
    upd = jnp.where(lane == _MIN_LEN, jnp.minimum(cur, tile_min), upd)
    upd = jnp.where(lane == _MAX_LEN, jnp.maximum(cur, tile_max), upd)
    o_si[:] = upd
    o_sf[:] += jnp.where(lane == 0, tile_aq, 0.0)

    # ---- histograms as one-hot compare-reduce ----
    def hist(keys, weight, bins):  # keys/weight [TB,1] -> [1, bins]
        b = jax.lax.broadcasted_iota(jnp.int32, (1, bins), 1)
        eq = (keys == b).astype(jnp.int32) * weight
        return eq.sum(axis=0, keepdims=True)

    o_lh[:] += hist(jnp.clip(lens, 0, lcap), v32, lhp)
    # [D1] integer round-half-up of the rational mean — backend-exact
    qkey = jnp.clip(
        (2 * qsum + lens) // jnp.maximum(2 * lens, 1), 0, QUAL_BINS - 1
    )
    o_qh[:] += hist(qkey, v32, QUAL_BINS)
    # integer GC% key, 100*(G+C)//len (src/stats_fastq.c:327); zero-length
    # reads take no key (the reference would divide by zero)
    gkey = jnp.clip((100 * ngc) // jnp.maximum(lens, 1), 0, GC_BINS - 1)
    o_gh[:] += hist(gkey, v32 * (lens > 0).astype(jnp.int32), _round_up(GC_BINS, 128))


def batch_partials_pallas(codes, quals, lens, valid, lcap: int, phred: int,
                          crit=None, interpret: bool = False,
                          vary_axis=None):
    """Pallas analog of ``stats_jnp.batch_partials`` (non-kmer fields).

    Requires ``codes.shape == [B, L]`` with ``L % 128 == 0``; B is padded to
    a TB multiple here (padded rows are invalid).  Returns the same partials
    dict contract as the jnp path (kmer fields excluded).

    ``vary_axis``: shard_map manual axis the call runs under — stamped as
    ``vma`` on the kernel's out_shape structs (jax's vma typing requires
    pallas outputs to declare how they vary across mesh axes).
    """
    B, L = codes.shape
    assert L % 128 == 0 and L <= lcap, (L, lcap)
    if crit is not None:
        crit = crit.substituted()

    Bp = _round_up(max(B, 1), TB)
    if Bp != B:
        pad = Bp - B
        codes = jnp.pad(codes, ((0, pad), (0, 0)), constant_values=5)
        quals = jnp.pad(quals, ((0, pad), (0, 0)))
        lens = jnp.pad(lens, (0, pad))
        valid = jnp.pad(valid, (0, pad))

    lhp = _round_up(lcap + 1, 128)
    kernel = functools.partial(
        _stats_kernel, lcap=lcap, phred=phred, crit=crit, lhp=lhp
    )
    grid = (Bp // TB,)
    row = lambda i: (i, 0)
    fixed = lambda i: (0, 0)
    sds = functools.partial(_out_struct, vary_axis=vary_axis)
    out_shapes = (
        sds((1, 128), jnp.int32),        # scalars int
        sds((1, 128), jnp.float32),      # scalars f32
        sds((1, lhp), jnp.int32),        # length hist
        sds((1, QUAL_BINS), jnp.int32),  # quality hist
        sds((1, _round_up(GC_BINS, 128)), jnp.int32),
        sds((1, L), jnp.int32),          # coverage per nt
        sds((1, L), jnp.int32),          # qual sum per nt
        sds((8, L), jnp.int32),          # base per nt (5 used)
        sds((Bp, 1), jnp.int32),         # per-read pass mask
    )
    out_specs = tuple(
        pl.BlockSpec(s.shape, fixed, memory_space=pltpu.VMEM)
        for s in out_shapes[:-1]
    ) + (pl.BlockSpec((TB, 1), row, memory_space=pltpu.VMEM),)
    si, sf, lh, qh, gh, cov, qpn, bpn, passed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, L), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, L), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), row, memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        interpret=interpret,
    )(
        codes,
        quals.astype(jnp.int8),  # ASCII < 128: lossless, int8 tiles
        lens.astype(jnp.int32).reshape(Bp, 1),
        valid.astype(jnp.int32).reshape(Bp, 1),
    )

    bpn = bpn[:5]
    pad_l = lcap - L
    p = {
        "num_reads": si[0, _NUM_READS],
        "acc_length": si[0, _ACC_LENGTH],
        "min_length": si[0, _MIN_LEN],
        "max_length": si[0, _MAX_LEN],
        "acc_quality": sf[0, 0],
        "base_totals": bpn.sum(axis=1),
        "length_hist": lh[0, : lcap + 1],
        "quality_hist": qh[0],
        "gc_hist": gh[0, :GC_BINS],
        "cov_per_nt": jnp.pad(cov[0], (0, pad_l)),
        "qual_per_nt": jnp.pad(qpn[0], (0, pad_l)),
        "base_per_nt": jnp.pad(bpn, ((0, 0), (0, pad_l))),
    }
    p["_passed_mask"] = passed[:B, 0] != 0
    if crit is not None:
        p["_num_passed"] = si[0, _NUM_PASSED]
        p["_num_failed"] = si[0, _NUM_FAILED]
    return p


_MAX_SINGLE_L = 4096  # above this, the [TB, L] single-block tile outgrows VMEM
_MAX_BLOCKWISE_L = 65536  # full-width per-position outputs must stay VMEM-resident
_HIST_CHUNK = 4096  # one-hot bin chunk for the wide length histogram


def _stats_kernel_blockwise(codes_ref, quals_ref, lens_ref, valid_ref,
                            o_si, o_sf, o_lh, o_qh, o_gh, o_cov, o_qpn,
                            o_bpn, o_pass,
                            s_qsum, s_nn, s_ngc, s_lq, s_rq, s_oo, s_v, s_wq,
                            *, LB: int, nL: int, sweeps: int, lcap: int,
                            phred: int, crit, lhp: int):
    """Blockwise-L body: grid (batch_tile i, L-block step jj).

    Per-read reductions (qsum, N-count, GC, filter windows) accumulate in
    VMEM scratch across the read's L-blocks; the verdict + all per-read
    histograms finalize when the last block of the tile has been seen
    (jj == nL-1).  With a filter criteria the per-position outputs need the
    verdict, so the grid makes a second sweep over the same L-blocks
    (inputs re-fetched from HBM: 2 reads of the batch bytes — still far
    below the jnp path's materialized intermediates at these lengths).
    Without criteria the selection mask is just ``valid`` and one sweep
    does everything.  Per-position outputs are full-width VMEM-resident
    (fixed index maps keep accumulation safe across the whole grid);
    blocks land via 128-aligned dynamic lane stores."""
    i = pl.program_id(0)
    jj = pl.program_id(1)
    jb = jax.lax.rem(jj, nL) if sweeps == 2 else jj
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    @pl.when((i == 0) & (jj == 0))
    def _init_outputs():
        o_si[:] = jnp.where(lane == _MIN_LEN, MIN_LENGTH_INIT, 0)
        o_sf[:] = jnp.zeros_like(o_sf)
        o_lh[:] = jnp.zeros_like(o_lh)
        o_qh[:] = jnp.zeros_like(o_qh)
        o_gh[:] = jnp.zeros_like(o_gh)
        o_cov[:] = jnp.zeros_like(o_cov)
        o_qpn[:] = jnp.zeros_like(o_qpn)
        o_bpn[:] = jnp.zeros_like(o_bpn)

    @pl.when(jj == 0)
    def _init_tile_scratch():
        for s in (s_qsum, s_nn, s_ngc, s_lq, s_rq, s_oo, s_v, s_wq):
            s[:] = jnp.zeros_like(s)

    codes = codes_ref[:].astype(jnp.int32)          # [TB, LB]
    quals = quals_ref[:].astype(jnp.int32)          # [TB, LB]
    lens = lens_ref[:]                              # [TB, 1]
    valid = valid_ref[:] != 0                       # [TB, 1] bool

    base = jb * LB
    gpos = base + jax.lax.broadcasted_iota(jnp.int32, (TB, LB), 1)
    mask = gpos < lens
    qm = jnp.where(mask, quals, 0)

    def acc_per_read():
        s_qsum[:] += qm.sum(axis=1, keepdims=True)
        s_nn[:] += ((codes == BASE_N) & mask).sum(
            axis=1, keepdims=True, dtype=jnp.int32
        )
        s_ngc[:] += (((codes == BASE_C) | (codes == BASE_G)) & mask).sum(
            axis=1, keepdims=True, dtype=jnp.int32
        )
        if crit is not None:
            # [D8] legacy quality position window: quality screens see
            # positions [begin, end) ∩ [0, len) only
            if crit.quality_window_on:
                qwmask = mask & (gpos >= crit.begin_quality_nt) \
                    & (gpos < crit.end_quality_nt)
                s_wq[:] += jnp.where(qwmask, quals, 0).sum(
                    axis=1, keepdims=True
                )
            else:
                qwmask = mask
            if crit.max_out_of_quality != MAX_VALUE:
                nq = quals - phred
                s_oo[:] += (
                    ((nq < crit.min_read_quality)
                     | (nq > crit.max_read_quality)) & qwmask
                ).sum(axis=1, keepdims=True, dtype=jnp.int32)
            if crit.left_length > MIN_VALUE:
                s_lq[:] += jnp.where(gpos < crit.left_length, qm, 0).sum(
                    axis=1, keepdims=True
                )
            if crit.right_length > MIN_VALUE:
                s_rq[:] += jnp.where(gpos >= lens - crit.right_length, qm,
                                     0).sum(axis=1, keepdims=True)

    def finalize():
        qsum = s_qsum[:]
        nn = s_nn[:]
        ngc = s_ngc[:]
        if crit is not None:
            ok = (lens >= crit.min_read_length) & (lens <= crit.max_read_length)
            if crit.quality_window_on:
                # [D8] window width is analytic: |[begin,end) ∩ [0,len)|
                wlen = jnp.maximum(
                    jnp.minimum(lens, crit.end_quality_nt)
                    - crit.begin_quality_nt, 0)
                qn = s_wq[:] - phred * wlen
            else:
                wlen = lens
                qn = qsum - phred * lens
            # Overflow care (mirrors stats_jnp.verdicts:127-137): the MAX
            # sentinel (100000) times a long read length wraps int32 at
            # lens > ~21474 — exactly this kernel's range — but the check
            # is vacuous then (qn <= 126*len always), so skip it.  The MIN
            # sentinel is 0: `0*len <= qn` is exact and cannot wrap.
            ok &= crit.min_read_quality * wlen <= qn
            if crit.max_read_quality != MAX_VALUE:
                ok &= qn <= crit.max_read_quality * wlen
            if crit.max_out_of_quality != MAX_VALUE:
                ok &= s_oo[:] <= crit.max_out_of_quality
            if crit.left_length > MIN_VALUE:
                w = jnp.minimum(lens, crit.left_length)
                lqn = s_lq[:] - phred * w
                ok &= crit.min_left_quality * w <= lqn
                if crit.max_left_quality != MAX_VALUE:
                    ok &= lqn <= crit.max_left_quality * w
            if crit.right_length > MIN_VALUE:
                w = jnp.minimum(lens, crit.right_length)
                rqn = s_rq[:] - phred * w
                ok &= crit.min_right_quality * w <= rqn
                if crit.max_right_quality != MAX_VALUE:
                    ok &= rqn <= crit.max_right_quality * w
            ok &= nn <= crit.max_N
            v = valid & ok
            n_passed = v.astype(jnp.int32).sum()
            n_failed = (valid & ~ok).astype(jnp.int32).sum()
        else:
            v = valid
            n_passed = jnp.int32(0)
            n_failed = jnp.int32(0)
        v32 = v.astype(jnp.int32)
        s_v[:] = v32
        o_pass[:] = v32

        mean_q = jnp.where(
            lens > 0, qsum.astype(jnp.float32) / lens.astype(jnp.float32), 0.0
        )
        tile_nr = v32.sum()
        tile_al = (lens * v32).sum()
        tile_min = jnp.where(v, lens, MIN_LENGTH_INIT).min()
        tile_max = jnp.where(v, lens, 0).max()
        tile_aq = jnp.where(v, mean_q, 0.0).sum()
        sumvec = (
            jnp.where(lane == _NUM_READS, tile_nr, 0)
            + jnp.where(lane == _ACC_LENGTH, tile_al, 0)
            + jnp.where(lane == _NUM_PASSED, n_passed, 0)
            + jnp.where(lane == _NUM_FAILED, n_failed, 0)
        )
        cur = o_si[:]
        upd = cur + sumvec
        upd = jnp.where(lane == _MIN_LEN, jnp.minimum(cur, tile_min), upd)
        upd = jnp.where(lane == _MAX_LEN, jnp.maximum(cur, tile_max), upd)
        o_si[:] = upd
        o_sf[:] += jnp.where(lane == 0, tile_aq, 0.0)

        def hist(keys, weight, bins):
            b = jax.lax.broadcasted_iota(jnp.int32, (1, bins), 1)
            eq = (keys == b).astype(jnp.int32) * weight
            return eq.sum(axis=0, keepdims=True)

        # wide length hist in bin chunks: a single [TB, lhp] one-hot would
        # be ~67 MB of VMEM intermediates at lcap 64k
        lkey = jnp.clip(lens, 0, lcap)
        for c0 in range(0, lhp, _HIST_CHUNK):
            cb = min(_HIST_CHUNK, lhp - c0)
            b = c0 + jax.lax.broadcasted_iota(jnp.int32, (1, cb), 1)
            part = ((lkey == b).astype(jnp.int32) * v32).sum(
                axis=0, keepdims=True
            )
            o_lh[:, c0 : c0 + cb] += part
        qkey = jnp.clip(
            (2 * qsum + lens) // jnp.maximum(2 * lens, 1), 0, QUAL_BINS - 1
        )
        o_qh[:] += hist(qkey, v32, QUAL_BINS)
        gkey = jnp.clip((100 * ngc) // jnp.maximum(lens, 1), 0, GC_BINS - 1)
        o_gh[:] += hist(gkey, v32 * (lens > 0).astype(jnp.int32),
                        _round_up(GC_BINS, 128))

    def acc_per_pos():
        v = s_v[:] != 0 if sweeps == 2 else valid
        vmask = mask & v
        sl = (slice(0, 1), pl.ds(base, LB))
        o_cov[sl] += vmask.sum(axis=0, keepdims=True, dtype=jnp.int32)
        o_qpn[sl] += jnp.where(vmask, quals, 0).sum(axis=0, keepdims=True)
        slb = (slice(0, 8), pl.ds(base, LB))
        bpn = jnp.stack(
            [((codes == b) & vmask).sum(axis=0, dtype=jnp.int32)
             for b in range(5)]
            + [jnp.zeros((LB,), jnp.int32)] * 3
        )
        o_bpn[slb] += bpn

    if sweeps == 1:
        acc_per_read()
        pl.when(jj == nL - 1)(finalize)
        acc_per_pos()
    else:
        pl.when(jj < nL)(acc_per_read)
        pl.when(jj == nL - 1)(finalize)
        pl.when(jj >= nL)(acc_per_pos)


def batch_partials_pallas_long(codes, quals, lens, valid, lcap: int,
                               phred: int, crit=None,
                               interpret: bool = False,
                               vary_axis=None):
    """Blockwise-L pallas partials for long reads (L > 4096): same contract
    as :func:`batch_partials_pallas` (SURVEY §5 long-context row).  Keeps
    the fused in-VMEM design up to lcap 65536 by tiling the read dimension;
    with an inline filter the batch bytes are read twice from HBM (the
    verdict must complete before the per-position accumulation)."""
    B, L = codes.shape
    assert L % 128 == 0 and L <= lcap <= _MAX_BLOCKWISE_L, (L, lcap)
    if crit is not None:
        crit = crit.substituted()

    LB = next(lb for lb in (512, 256, 128) if L % lb == 0)
    nL = L // LB
    sweeps = 1 if crit is None else 2
    Bp = _round_up(max(B, 1), TB)
    if Bp != B:
        pad = Bp - B
        codes = jnp.pad(codes, ((0, pad), (0, 0)), constant_values=5)
        quals = jnp.pad(quals, ((0, pad), (0, 0)))
        lens = jnp.pad(lens, (0, pad))
        valid = jnp.pad(valid, (0, pad))

    lhp = _round_up(lcap + 1, 128)
    kernel = functools.partial(
        _stats_kernel_blockwise, LB=LB, nL=nL, sweeps=sweeps, lcap=lcap,
        phred=phred, crit=crit, lhp=lhp,
    )
    grid = (Bp // TB, sweeps * nL)
    lblk = lambda i, j: (i, j % nL)
    tile = lambda i, j: (i, 0)
    fixed = lambda i, j: (0, 0)
    sds = functools.partial(_out_struct, vary_axis=vary_axis)
    out_shapes = (
        sds((1, 128), jnp.int32),        # scalars int
        sds((1, 128), jnp.float32),      # scalars f32
        sds((1, lhp), jnp.int32),        # length hist
        sds((1, QUAL_BINS), jnp.int32),  # quality hist
        sds((1, _round_up(GC_BINS, 128)), jnp.int32),
        sds((1, L), jnp.int32),          # coverage per nt
        sds((1, L), jnp.int32),          # qual sum per nt
        sds((8, L), jnp.int32),          # base per nt (5 used)
        sds((Bp, 1), jnp.int32),         # per-read pass mask
    )
    out_specs = tuple(
        pl.BlockSpec(s.shape, fixed, memory_space=pltpu.VMEM)
        for s in out_shapes[:-1]
    ) + (pl.BlockSpec((TB, 1), tile, memory_space=pltpu.VMEM),)
    scratch = [pltpu.VMEM((TB, 1), jnp.int32) for _ in range(8)]
    si, sf, lh, qh, gh, cov, qpn, bpn, passed = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, LB), lblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, LB), lblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), tile, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), tile, memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        codes,
        quals.astype(jnp.int8),
        lens.astype(jnp.int32).reshape(Bp, 1),
        valid.astype(jnp.int32).reshape(Bp, 1),
    )

    bpn = bpn[:5]
    pad_l = lcap - L
    p = {
        "num_reads": si[0, _NUM_READS],
        "acc_length": si[0, _ACC_LENGTH],
        "min_length": si[0, _MIN_LEN],
        "max_length": si[0, _MAX_LEN],
        "acc_quality": sf[0, 0],
        "base_totals": bpn.sum(axis=1),
        "length_hist": lh[0, : lcap + 1],
        "quality_hist": qh[0],
        "gc_hist": gh[0, :GC_BINS],
        "cov_per_nt": jnp.pad(cov[0], (0, pad_l)),
        "qual_per_nt": jnp.pad(qpn[0], (0, pad_l)),
        "base_per_nt": jnp.pad(bpn, ((0, 0), (0, pad_l))),
    }
    p["_passed_mask"] = passed[:B, 0] != 0
    if crit is not None:
        p["_num_passed"] = si[0, _NUM_PASSED]
        p["_num_failed"] = si[0, _NUM_FAILED]
    return p


def make_batch_partials(lcap: int, phred: int, kmers_on: bool, crit=None,
                        interpret: bool = False, vary_axis=None):
    """Fused-partials fn matching the jnp contract, with verdicts computed
    in-kernel; the optional kmer fields ride the jnp path around the kernel
    (XLA fuses both under one jit).  ``vary_axis``: shard_map manual axis
    the call runs under (threaded to the kernel out_shapes' vma and the
    kmer scan's carry)."""
    from . import stats_jnp

    def fn(codes, quals, lens, valid):
        # the single-block kernel's tile AND its [TB, lhp] length-hist
        # one-hot must fit VMEM, so dispatch on lcap (which sizes lhp),
        # not just the batch L
        bp = (batch_partials_pallas_long if lcap > _MAX_SINGLE_L
              else batch_partials_pallas)
        p = bp(
            codes, quals, lens, valid, lcap, phred, crit,
            interpret=interpret, vary_axis=vary_axis
        )
        kvalid = p.pop("_passed_mask")  # in-kernel verdicts, not recomputed
        if kmers_on:
            from ..constants import KMER_K, NUM_KMERS

            L = codes.shape[1]
            if L >= KMER_K:
                kc, okw = stats_jnp.kmer_codes(codes, lens.astype(jnp.int32))
                okw &= kvalid[:, None]
                k2d = stats_jnp.kmer_hist2d(kc, okw, lcap,
                                            vary_axis=vary_axis)
            else:
                k2d = stats_jnp._vary(
                    jnp.zeros((NUM_KMERS, lcap), jnp.int32), vary_axis)
            p["kmer_per_nt"] = k2d
            p["kmer_counts"] = k2d.sum(axis=1)
        return p

    return fn
