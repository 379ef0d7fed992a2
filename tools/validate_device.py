"""On-device oracle validation: run every engine path against the numpy
oracle on whatever jax backend is live (designed for the real TPU — the
CPU-forced test suite cannot catch device-specific numerics, e.g. the
bf16 default-matmul precision class; see CLAUDE.md hard-won notes).

    python tools/validate_device.py [--reads N]   # default 100k

Checks (all exact unless noted):
  1. stats+filter+kmers: every counter vs oracle (acc_quality rtol 1e-3).
  2. paired stats: pair-consistent counters vs oracle, both mates.
  3. filter: passed/failed output BYTES vs the oracle partition.
  4. CGR: table_seq, table_q, word count vs the faithful f64 loop oracle.
  5. sharded session (degenerate 1-device mesh on the live backend):
     wire decode + voted trimmed shapes vs the same oracle as (1).
  6. sharded PAIRED session (fused 1-dispatch pair step) vs oracle.
  7. coalesced dispatch (explicit small batch + HPGQ_COALESCE) == (1).
  8. [D8] quality position window: fused kernel (short reads) + blockwise-L
     s_wq scratch (long reads) vs the per-read oracle.
  9. binned (RTA3) corpus through the 2q qual-palette wire: stats engine
     feed, filter verdict + output bytes, fused paired, and the tiered
     sharded session (per-step tier vote) vs the oracle.

Exits non-zero on any mismatch; prints one PASS line per check.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests"))

import numpy as np  # noqa: E402


def arr_eq(a, b):
    """Engine arrays are lcap-padded; compare the common prefix + zero tails."""
    a, b = np.asarray(a), np.asarray(b)
    if a.ndim != b.ndim:
        return False
    if a.ndim == 1:
        m = min(a.shape[0], b.shape[0])
        return (np.array_equal(a[:m], b[:m])
                and a[m:].sum() == 0 and b[m:].sum() == 0)
    m = min(a.shape[1], b.shape[1])
    return (np.array_equal(a[:, :m], b[:, :m])
            and a[:, m:].sum() == 0 and b[:, m:].sum() == 0)


def counters_equal(eng, orc, skip=()):
    bad = []
    for name in vars(orc):
        if name in skip:
            continue
        a, b = getattr(eng, name), getattr(orc, name)
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            ok = arr_eq(a, b)
        elif isinstance(a, float) or isinstance(b, float):
            tol = 1e-3 if name == "acc_quality" else 1e-6
            ok = abs(a - b) <= tol * max(1.0, abs(b))
        else:
            ok = a == b
        if not ok:
            bad.append(name)
    return bad


def corpus(n, tag="v", **kw):
    from gen import make_fastq

    path = os.path.join(".bench", "devval_%s_%d.fq" % (tag, n))
    os.makedirs(".bench", exist_ok=True)
    if not os.path.exists(path):
        make_fastq(path, n, **dict(dict(min_len=100, max_len=100,
                                        n_prob=0.005, seed=7), **kw))
    return path


def check_stats(n):
    from hpgq.options import FilterCriteria, StatsOptions
    from hpgq.oracle import spec
    from hpgq.pipeline.run import run_stats

    fq = corpus(n)
    kw = dict(min_read_quality=18, max_read_quality=40, max_N=3)
    o = StatsOptions()
    o.in_filename = fq
    o.out_dirname = tempfile.mkdtemp(prefix="devval_")
    o.quality_encoding_value = 33
    o.quality_encoding_name = "phred33"
    o.batch_size = 131072
    o.kmers_on = True
    for k, v in kw.items():
        setattr(o.criteria, k, v)
    o.filter_on = True
    eng = run_stats(o)
    eng = eng[0] if isinstance(eng, tuple) else eng
    orc = spec.stats_of_file(spec.iter_seq_qual(fq), kmers_on=True,
                             criteria=FilterCriteria(**kw), phred=33)
    bad = counters_equal(eng, orc)
    assert not bad, "stats counters differ: %s" % bad
    return "stats+filter+kmers: %d reads, all counters equal" % n


def check_paired(n):
    from hpgq.options import FilterCriteria, StatsOptions
    from hpgq.oracle import spec
    from hpgq.pipeline.run import run_stats

    m1 = corpus(n, "m1", seed=31)
    m2 = corpus(n, "m2", seed=32)
    kw = dict(min_read_quality=18, max_read_quality=40, max_N=2)
    o = StatsOptions()
    o.in_filename, o.in_filename2 = m1, m2
    o.out_dirname = tempfile.mkdtemp(prefix="devval_")
    o.quality_encoding_value = 33
    o.quality_encoding_name = "phred33"
    o.batch_size = 131072
    for k, v in kw.items():
        setattr(o.criteria, k, v)
    o.filter_on = True
    c1, c2 = run_stats(o)
    crit = FilterCriteria(**kw).substituted()
    r1 = list(spec.iter_seq_qual(m1))
    r2 = list(spec.iter_seq_qual(m2))
    both = [spec.filter_verdict(s1, q1, crit, 33)
            and spec.filter_verdict(s2, q2, crit, 33)
            for (s1, q1), (s2, q2) in zip(r1, r2)]

    def sel(recs):
        return (r for r, b in zip(recs, both) if b)

    o1 = spec.stats_of_file(sel(r1))
    o2 = spec.stats_of_file(sel(r2))
    skip = ("filter_on", "num_passed", "num_failed")
    bad = counters_equal(c1, o1, skip) + counters_equal(c2, o2, skip)
    assert not bad, "paired counters differ: %s" % bad
    assert c1.num_passed == sum(both)
    assert c1.num_failed == len(both) - sum(both), (c1.num_failed, len(both))
    assert (c2.num_passed, c2.num_failed) == (c1.num_passed, c1.num_failed)
    return "paired stats: %d pairs, both mates equal (passed %d)" % (
        n, sum(both))


def check_filter_bytes(n):
    from hpgq.options import FilterCriteria, FilterOptions
    from hpgq.oracle import spec
    from hpgq.pipeline.run import run_filter

    fq = corpus(n)
    kw = dict(min_read_quality=18, max_read_quality=40, max_N=2)
    o = FilterOptions()
    o.in_filename = fq
    o.out_dirname = tempfile.mkdtemp(prefix="devval_")
    o.quality_encoding_value = 33
    o.quality_encoding_name = "phred33"
    o.batch_size = 131072
    for k, v in kw.items():
        setattr(o.criteria, k, v)
    o.filter_on = True
    res = run_filter(o)
    crit = FilterCriteria(**kw).substituted()
    pp, ff = [], []
    with open(fq, "rb") as f:
        raw = f.read().split(b"\n")
    for i in range(0, len(raw) - 1, 4):
        rec = b"\n".join(raw[i:i + 4]) + b"\n"
        (pp if spec.filter_verdict(raw[i + 1], raw[i + 3], crit, 33)
         else ff).append(rec)
    assert open(res["passed_filename"], "rb").read() == b"".join(pp)
    assert open(res["failed_filename"], "rb").read() == b"".join(ff)
    return "filter: %d reads, passed/failed bytes == oracle (%d/%d)" % (
        n, len(pp), len(ff))


def check_cgr(n, k=7):
    from hpgq.io.fastq import FastqReader
    from hpgq.io.packer import pack_block
    from hpgq.options import CgrOptions
    from hpgq.oracle.cgr import fill_tables_loop
    from hpgq.pipeline.cgr_run import run_cgr

    fq = corpus(n)
    o = CgrOptions()
    o.in_filename = fq
    o.out_dirname = tempfile.mkdtemp(prefix="devval_")
    o.quality_encoding_value = 33
    o.quality_encoding_name = "phred33"
    o.batch_size = 131072
    o.k = k
    res = run_cgr(o)
    dim = 1 << k
    ts = np.zeros((dim, dim), np.int64)
    tq = np.zeros((dim, dim), np.int64)
    words = 0
    with FastqReader(fq, batch_size=20000) as rd:
        for block in rd:
            codes, quals, lens, valid = pack_block(block)
            bs, bq, w = fill_tables_loop(codes, quals, lens, valid, k, 33)
            ts += bs
            tq += bq
            words += w
    assert words == res["fq_word_count"], (words, res["fq_word_count"])
    assert np.array_equal(np.asarray(res["table_seq"]), ts), "table_seq"
    assert np.array_equal(np.asarray(res["table_q"]), tq), "table_q"
    return "cgr k=%d: %d reads, tables + word count exact" % (k, n)


def check_sharded(n):
    from hpgq.options import FilterCriteria, StatsOptions
    from hpgq.oracle import spec
    from hpgq.dist.run_dist import run_stats_sharded

    fq = corpus(n)
    kw = dict(min_read_quality=18, max_read_quality=40, max_N=3)
    o = StatsOptions()
    o.in_filename = fq
    o.out_dirname = tempfile.mkdtemp(prefix="devval_")
    o.quality_encoding_value = 33
    o.quality_encoding_name = "phred33"
    o.batch_size = 65536
    for k, v in kw.items():
        setattr(o.criteria, k, v)
    o.filter_on = True
    eng = run_stats_sharded(o)
    orc = spec.stats_of_file(spec.iter_seq_qual(fq), kmers_on=False,
                             criteria=FilterCriteria(**kw), phred=33)
    bad = counters_equal(eng, orc)
    assert not bad, "sharded counters differ: %s" % bad
    return "sharded stats (1-device mesh): %d reads, all counters equal" % n


def check_sharded_paired(n):
    """Fused sharded-paired step (ONE shard_map dispatch per step: pair
    verdict + both mates' accumulation) vs the per-read oracle."""
    from hpgq.options import FilterCriteria, StatsOptions
    from hpgq.oracle import spec
    from hpgq.dist.run_dist import run_stats_sharded

    m1 = corpus(n, "sp1", seed=51)
    m2 = corpus(n, "sp2", seed=52)
    kw = dict(min_read_quality=18, max_read_quality=40, max_N=2)
    o = StatsOptions()
    o.in_filename, o.in_filename2 = m1, m2
    o.out_dirname = tempfile.mkdtemp(prefix="devval_")
    o.quality_encoding_value = 33
    o.quality_encoding_name = "phred33"
    o.batch_size = 65536
    for k, v in kw.items():
        setattr(o.criteria, k, v)
    o.filter_on = True
    c1, c2 = run_stats_sharded(o)
    crit = FilterCriteria(**kw).substituted()
    r1 = list(spec.iter_seq_qual(m1))
    r2 = list(spec.iter_seq_qual(m2))
    both = [spec.filter_verdict(s1, q1, crit, 33)
            and spec.filter_verdict(s2, q2, crit, 33)
            for (s1, q1), (s2, q2) in zip(r1, r2)]

    def sel(recs):
        return (r for r, b in zip(recs, both) if b)

    o1 = spec.stats_of_file(sel(r1))
    o2 = spec.stats_of_file(sel(r2))
    skip = ("filter_on", "num_passed", "num_failed")
    bad = counters_equal(c1, o1, skip) + counters_equal(c2, o2, skip)
    assert not bad, "sharded-paired counters differ: %s" % bad
    assert c1.num_passed == sum(both), (c1.num_passed, sum(both))
    assert c1.num_failed == len(both) - sum(both), (c1.num_failed, len(both))
    assert (c2.num_passed, c2.num_failed) == (c1.num_passed, c1.num_failed)
    return ("sharded paired (fused 1-dispatch step): %d pairs, both mates "
            "equal (passed %d)" % (n, sum(both)))


def check_coalesced(n):
    from hpgq.options import FilterCriteria, StatsOptions
    from hpgq.oracle import spec
    from hpgq.pipeline.run import run_stats

    fq = corpus(n)
    kw = dict(min_read_quality=18, max_read_quality=40, max_N=3)
    o = StatsOptions()
    o.in_filename = fq
    o.out_dirname = tempfile.mkdtemp(prefix="devval_")
    o.quality_encoding_value = 33
    o.quality_encoding_name = "phred33"
    o.batch_size = 10000  # reference default, explicitly set
    o.batch_size_set = True
    for k, v in kw.items():
        setattr(o.criteria, k, v)
    o.filter_on = True
    os.environ["HPGQ_COALESCE"] = "131072"
    try:
        eng = run_stats(o)
    finally:
        del os.environ["HPGQ_COALESCE"]
    orc = spec.stats_of_file(spec.iter_seq_qual(fq), kmers_on=False,
                             criteria=FilterCriteria(**kw), phred=33)
    bad = counters_equal(eng, orc)
    assert not bad, "coalesced counters differ: %s" % bad
    return "coalesced dispatch (10k blocks -> 131k): %d reads equal" % n


def check_quality_window(n):
    """[D8] legacy --start/--end-quality-nt window on device: the fused
    Pallas kernel's windowed quality screens (short reads) AND the
    blockwise-L kernel's s_wq scratch path (long reads) vs the per-read
    oracle."""
    from hpgq.options import FilterCriteria, StatsOptions
    from hpgq.oracle import spec
    from hpgq.pipeline.run import run_stats

    msgs = []
    for tag, ckw, gkw in (
        ("short", dict(), dict(min_len=60, max_len=160, seed=41)),
        ("long-blockwise", dict(begin_quality_nt=500, end_quality_nt=900),
         dict(min_len=4200, max_len=4600, seed=42)),
    ):
        nn = n if tag == "short" else max(256, n // 40)
        fq = corpus(nn, "qw_" + tag, **gkw)
        kw = dict(min_read_quality=20, max_read_quality=23,
                  begin_quality_nt=10, end_quality_nt=40)
        kw.update(ckw)
        o = StatsOptions()
        o.in_filename = fq
        o.out_dirname = tempfile.mkdtemp(prefix="devval_")
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 131072
        for k, v in kw.items():
            setattr(o.criteria, k, v)
        o.filter_on = True
        eng = run_stats(o)
        orc = spec.stats_of_file(spec.iter_seq_qual(fq),
                                 criteria=FilterCriteria(**kw), phred=33)
        bad = counters_equal(eng, orc)
        assert not bad, "%s windowed counters differ: %s" % (tag, bad)
        assert 0 < eng.num_passed < nn, (tag, eng.num_passed)
        msgs.append("%s %d (passed %d)" % (tag, nn, eng.num_passed))
    return "[D8] quality window: " + ", ".join(msgs)


def check_binned_palette(n):
    """Binned (NovaSeq RTA3) quals ride the 2q qual-palette wire on every
    single-host dispatch path — stats engine feed, filter verdict+bytes,
    fused paired — and the TIERED sharded session (per-step tier vote).
    All vs the oracle on the live backend (ADVICE r3 medium: the palette
    decode was default-on with no on-device coverage)."""
    import dataclasses

    from hpgq.options import FilterCriteria, FilterOptions, StatsOptions
    from hpgq.oracle import spec
    from hpgq.pipeline.run import run_filter, run_stats

    bins = (2, 12, 23, 37)
    fq = corpus(n, "bin", qual_bins=bins)
    kw = dict(min_read_quality=18, max_read_quality=40, max_N=3)
    crit = FilterCriteria(**kw)

    # the palette tier must actually engage on this corpus
    from hpgq.io.fastq import FastqReader
    from hpgq.io.packer import round_up, try_pack_block_palette, wire_len

    with FastqReader(fq, batch_size=4096) as rd:
        first = next(iter(rd))
    wl = wire_len(first.max_len(), round_up(first.max_len(), 128))
    assert try_pack_block_palette(first, wl) is not None, \
        "palette tier did not engage on the binned corpus"

    def sopts(paired=False):
        o = StatsOptions()
        o.in_filename = fq
        if paired:
            o.in_filename2 = corpus(n, "bin2", seed=33, qual_bins=bins)
        o.out_dirname = tempfile.mkdtemp(prefix="devval_")
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 131072
        o.criteria = dataclasses.replace(crit)
        o.filter_on = True
        return o

    # 1) stats engine feed (adaptive ladder picks 2q)
    eng = run_stats(sopts())
    orc = spec.stats_of_file(spec.iter_seq_qual(fq),
                             criteria=FilterCriteria(**kw), phred=33)
    bad = counters_equal(eng, orc)
    assert not bad, "binned stats counters differ: %s" % bad

    # 2) filter verdict (ShapeCachedFn palette tier) + output bytes
    fo = FilterOptions()
    fo.in_filename = fq
    fo.out_dirname = tempfile.mkdtemp(prefix="devval_")
    fo.quality_encoding_value = 33
    fo.quality_encoding_name = "phred33"
    fo.batch_size = 131072
    fo.criteria = dataclasses.replace(crit)
    run_filter(fo)
    sub = crit.substituted()
    recs = open(fq, "rb").read().splitlines(keepends=True)
    passed, failed = [], []
    for i, (s, q) in enumerate(spec.iter_seq_qual(fq)):
        (passed if spec.filter_verdict(s, q, sub, 33) else failed).extend(
            recs[4 * i: 4 * i + 4])
    got_p = open(os.path.join(fo.out_dirname, "passed.fq"), "rb").read()
    got_f = open(os.path.join(fo.out_dirname, "failed.fq"), "rb").read()
    assert got_p == b"".join(passed), "binned filter passed bytes differ"
    assert got_f == b"".join(failed), "binned filter failed bytes differ"

    # 3) fused paired (ShapeCachedPairFn palette preference)
    po = sopts(paired=True)
    c1, c2 = run_stats(po)
    r1 = list(spec.iter_seq_qual(fq))
    r2 = list(spec.iter_seq_qual(po.in_filename2))
    both = [spec.filter_verdict(s1, q1, sub, 33)
            and spec.filter_verdict(s2, q2, sub, 33)
            for (s1, q1), (s2, q2) in zip(r1, r2)]
    o1 = spec.stats_of_file(r for r, b in zip(r1, both) if b)
    skip = ("filter_on", "num_passed", "num_failed")
    bad = counters_equal(c1, o1, skip)
    assert not bad, "binned paired counters differ: %s" % bad
    assert c1.num_passed == sum(both)

    # 4) tiered sharded session (per-step tier vote, 2q width dispatch)
    from hpgq.dist.run_dist import run_stats_sharded

    sh = run_stats_sharded(sopts())
    bad = counters_equal(sh, orc)
    assert not bad, "binned sharded counters differ: %s" % bad

    # 5) tiered fused sharded-PAIRED (shared-mate tier votes)
    sp1, sp2 = run_stats_sharded(sopts(paired=True))
    bad = counters_equal(sp1, c1) + counters_equal(sp2, c2)
    assert not bad, "binned sharded-paired differs from single-host: %s" % bad
    return ("binned 2q palette: %d reads — stats, filter bytes, paired, "
            "tiered sharded + sharded-paired all equal" % n)


def check_wire2c(n):
    """The 2c wire tier (2-bit codes + qual palette + exception sidecar)
    on the live backend: engine == oracle on an N-containing binned
    corpus through every 2c consumer — stats engine feed, filter verdict
    bytes, fused paired, and the tiered sharded session (per-step tier
    -1 vote + sharded sidecar) — and the exact-N restoration shows in
    num_Ns/base_per_nt."""
    import dataclasses

    from hpgq.options import FilterCriteria, FilterOptions, StatsOptions
    from hpgq.oracle import spec
    from hpgq.pipeline.run import run_filter, run_stats

    bins = (2, 12, 23, 37)
    fq = corpus(n, "bin2c", qual_bins=bins, n_prob=0.02)
    kw = dict(min_read_quality=18, max_read_quality=40, max_N=2)
    crit = FilterCriteria(**kw)

    # the 2c tier must actually engage on this corpus
    from hpgq.io.fastq import FastqReader
    from hpgq.io.packer import round_up, try_pack_block_2c, wire_len

    with FastqReader(fq, batch_size=4096) as rd:
        first = next(iter(rd))
    wl = wire_len(first.max_len(), round_up(first.max_len(), 128))
    out = try_pack_block_2c(first, wl)
    assert out is not None, "2c tier did not engage on the binned corpus"
    assert int((out[1] < ((first.num_reads * wl) << 1)).sum()) > 0, \
        "no exceptions recorded on an N-containing corpus"

    def sopts(paired=False):
        o = StatsOptions()
        o.in_filename = fq
        if paired:
            o.in_filename2 = corpus(n, "bin2c2", seed=37, qual_bins=bins,
                                    n_prob=0.02)
        o.out_dirname = tempfile.mkdtemp(prefix="devval_")
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 131072
        o.criteria = dataclasses.replace(crit)
        o.filter_on = True
        return o

    # 1) stats engine feed (ladder picks 2c)
    eng = run_stats(sopts())
    orc = spec.stats_of_file(spec.iter_seq_qual(fq),
                             criteria=FilterCriteria(**kw), phred=33)
    bad = counters_equal(eng, orc)
    assert not bad, "2c stats counters differ: %s" % bad
    assert eng.num_Ns == orc.num_Ns and eng.num_Ns > 0

    # 2) filter verdict (2c preference in ShapeCachedFn) + output bytes
    fo = FilterOptions()
    fo.in_filename = fq
    fo.out_dirname = tempfile.mkdtemp(prefix="devval_")
    fo.quality_encoding_value = 33
    fo.quality_encoding_name = "phred33"
    fo.batch_size = 131072
    fo.criteria = dataclasses.replace(crit)
    run_filter(fo)
    sub = crit.substituted()
    recs = open(fq, "rb").read().splitlines(keepends=True)
    passed, failed = [], []
    for i, (s, q) in enumerate(spec.iter_seq_qual(fq)):
        (passed if spec.filter_verdict(s, q, sub, 33) else failed).extend(
            recs[4 * i: 4 * i + 4])
    got_p = open(os.path.join(fo.out_dirname, "passed.fq"), "rb").read()
    got_f = open(os.path.join(fo.out_dirname, "failed.fq"), "rb").read()
    assert got_p == b"".join(passed), "2c filter passed bytes differ"
    assert got_f == b"".join(failed), "2c filter failed bytes differ"

    # 3) fused paired (both mates 2c)
    po = sopts(paired=True)
    c1, c2 = run_stats(po)
    r1 = list(spec.iter_seq_qual(fq))
    r2 = list(spec.iter_seq_qual(po.in_filename2))
    both = [spec.filter_verdict(s1, q1, sub, 33)
            and spec.filter_verdict(s2, q2, sub, 33)
            for (s1, q1), (s2, q2) in zip(r1, r2)]
    o1 = spec.stats_of_file(r for r, b in zip(r1, both) if b)
    skip = ("filter_on", "num_passed", "num_failed")
    bad = counters_equal(c1, o1, skip)
    assert not bad, "2c paired counters differ: %s" % bad
    assert c1.num_passed == sum(both)

    # 4) tiered sharded session (tier -1 vote + per-device sidecar)
    from hpgq.dist.run_dist import run_stats_sharded

    sh = run_stats_sharded(sopts())
    bad = counters_equal(sh, orc)
    assert not bad, "2c sharded counters differ: %s" % bad
    return ("2c wire: %d reads (Ns present) — stats, filter bytes, paired, "
            "tiered sharded all equal; exact-N restoration verified" % n)


def check_wire2u(n):
    """The bitpack2u (uniform) wire tier on the live backend: a uniform-
    length RTA3-binned N-containing corpus rides the bare-bit-plane wire
    (52 B per 100 bp read) through the stats engine — all counters must
    equal the oracle, and the tier must actually carry batches."""
    import dataclasses

    import hpgq.io.packer as packer_mod
    from hpgq.options import FilterCriteria, StatsOptions
    from hpgq.oracle import spec
    from hpgq.pipeline.run import run_stats

    bins = (2, 12, 23, 37)
    fq = corpus(n, "bin2u", qual_bins=bins, n_prob=0.02, min_len=100,
                max_len=100)
    kw = dict(min_read_quality=18, max_read_quality=40, max_N=2)

    hits = {"n": 0}
    orig = packer_mod.try_pack_block_2u

    def spy(*a, **k):
        out = orig(*a, **k)
        hits["n"] += int(out is not None)
        return out

    packer_mod.try_pack_block_2u = spy
    try:
        o = StatsOptions()
        o.in_filename = fq
        o.out_dirname = tempfile.mkdtemp(prefix="devval_")
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 131072
        o.criteria = FilterCriteria(**kw)
        o.filter_on = True
        eng = run_stats(o)
    finally:
        packer_mod.try_pack_block_2u = orig
    assert hits["n"] > 0, "2u tier never engaged on the uniform corpus"
    orc = spec.stats_of_file(spec.iter_seq_qual(fq),
                             criteria=FilterCriteria(**kw), phred=33)
    bad = counters_equal(eng, orc)
    assert not bad, "2u stats counters differ: %s" % bad
    assert eng.num_Ns == orc.num_Ns and eng.num_Ns > 0
    return ("2u uniform wire: %d reads (Ns present) — engaged on %d "
            "batches, all counters equal" % (n, hits["n"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--cgr-reads", type=int, default=50_000,
                    help="the loop oracle is slow; smaller default")
    args = ap.parse_args()

    from hpgq.utils.compile_cache import enable

    enable()
    import jax

    print("backend:", jax.default_backend(), jax.devices()[0], flush=True)
    rc = 0
    for fn, n in ((check_stats, args.reads), (check_paired, args.reads // 2),
                  (check_filter_bytes, args.reads),
                  (check_cgr, args.cgr_reads),
                  (check_sharded, args.reads // 2),
                  (check_sharded_paired, args.reads // 4),
                  (check_coalesced, args.reads // 2),
                  (check_quality_window, args.reads // 2),
                  (check_binned_palette, args.reads // 2),
                  (check_wire2c, args.reads // 2),
                  (check_wire2u, args.reads // 2)):
        t0 = time.perf_counter()
        try:
            msg = fn(n)
            print("PASS %5.1fs  %s" % (time.perf_counter() - t0, msg),
                  flush=True)
        except AssertionError as e:
            print("FAIL %5.1fs  %s: %s" % (time.perf_counter() - t0,
                                           fn.__name__, e), flush=True)
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
