"""Checkpoint/resume: interrupted stats run == uninterrupted run."""

import os

import numpy as np
import pytest

from gen import make_fastq

from hpgq.options import StatsOptions
from hpgq.pipeline.run import run_stats
from hpgq.utils.checkpoint import (
    load_counters_checkpoint,
    save_counters_checkpoint,
)
from hpgq.core.counters import StatsCounters


def _opts(fq, out, **kw):
    o = StatsOptions()
    o.in_filename = str(fq)
    o.out_dirname = str(out)
    o.quality_encoding_value = 33
    o.quality_encoding_name = "phred33"
    for k, v in kw.items():
        setattr(o, k, v)
    return o


def test_roundtrip(tmp_path):
    c = StatsCounters(phred=33)
    c.ensure_length(128)
    c.num_reads = 42
    c.acc_quality = 1234.5
    c.length_hist[100] = 42
    c.min_length = 80
    p = str(tmp_path / "ck.npz")
    save_counters_checkpoint(p, c, offset=9999, config_key="k1",
                             extra={"t": np.arange(6)})
    c2, off, extra = load_counters_checkpoint(p, "k1")
    assert off == 9999
    assert c2.num_reads == 42 and c2.min_length == 80
    assert c2.acc_quality == pytest.approx(1234.5)
    assert c2.length_hist[100] == 42
    np.testing.assert_array_equal(extra["t"], np.arange(6))
    with pytest.raises(ValueError):
        load_counters_checkpoint(p, "other-config")
    assert load_counters_checkpoint(str(tmp_path / "none.npz"), "k1") is None


def test_resume_equals_uninterrupted(tmp_path):
    fq = str(tmp_path / "in.fq")
    make_fastq(fq, 4000, min_len=60, max_len=100, n_prob=0.01, seed=3)

    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    out_a.mkdir()
    out_b.mkdir()

    full = run_stats(_opts(fq, out_a, batch_size=512))

    # interrupted run: checkpoint every batch, stop after 3 batches
    ck = str(tmp_path / "ck.npz")
    opts_b = _opts(fq, out_b, batch_size=512, checkpoint_path=ck,
                   checkpoint_every=1)

    from hpgq.pipeline import run as run_mod

    real_iter = run_mod._iter_packed
    calls = {"n": 0}

    def limited(*args, **kw):
        for item in real_iter(*args, **kw):
            if calls["n"] >= 3:
                raise KeyboardInterrupt
            calls["n"] += 1
            yield item

    run_mod._iter_packed = limited
    try:
        with pytest.raises(KeyboardInterrupt):
            run_stats(opts_b)
    finally:
        run_mod._iter_packed = real_iter

    assert os.path.exists(ck)
    _, off, _ = load_counters_checkpoint(
        ck, run_mod._stats_config_key(opts_b, None)
    )
    assert 0 < off < os.path.getsize(fq)

    resumed = run_stats(opts_b)  # resumes from ck, finishes the file
    assert not os.path.exists(ck)  # completed runs clear their checkpoint

    assert resumed.equals(full), "resumed counters != uninterrupted counters"
    # report bytes identical too
    sa = (out_a / "in.fq.summary.txt").read_bytes()
    sb = (out_b / "in.fq.summary.txt").read_bytes()
    assert sa == sb


def test_filter_resume_equals_uninterrupted(tmp_path):
    from hpgq.options import FilterOptions
    from hpgq.pipeline.run import run_filter
    from hpgq.pipeline import run as run_mod

    fq = str(tmp_path / "in.fq")
    make_fastq(fq, 3000, min_len=60, max_len=100, n_prob=0.02, seed=21)

    def fopts(out, **kw):
        o = FilterOptions()
        o.in_filename = fq
        o.out_dirname = str(out)
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 256
        o.criteria.min_read_quality = 18
        o.criteria.max_read_quality = 40
        o.criteria.max_N = 2
        for k, v in kw.items():
            setattr(o, k, v)
        return o

    out_a, out_b = tmp_path / "a", tmp_path / "b"
    out_a.mkdir(); out_b.mkdir()
    full = run_filter(fopts(out_a))

    ck = str(tmp_path / "f.ck.npz")
    ob = fopts(out_b, checkpoint_path=ck, checkpoint_every=1)

    real_iter = run_mod._iter_with
    calls = {"n": 0}

    def limited(*a, **k):
        for b in real_iter(*a, **k):
            if calls["n"] >= 4:
                raise KeyboardInterrupt
            calls["n"] += 1
            yield b

    run_mod._iter_with = limited
    try:
        with pytest.raises(KeyboardInterrupt):
            run_filter(ob)
    finally:
        run_mod._iter_with = real_iter
    assert os.path.exists(ck)

    res = run_filter(ob)
    assert not os.path.exists(ck)
    assert res["num_passed"] == full["num_passed"]
    assert res["num_failed"] == full["num_failed"]
    assert (out_b / "passed.fq").read_bytes() == (out_a / "passed.fq").read_bytes()
    assert (out_b / "failed.fq").read_bytes() == (out_a / "failed.fq").read_bytes()


def test_edit_resume_equals_uninterrupted(tmp_path):
    from hpgq.options import EditOptions
    from hpgq.pipeline.run import run_edit
    from hpgq.pipeline import run as run_mod

    fq = str(tmp_path / "in.fq")
    make_fastq(fq, 2500, min_len=60, max_len=100, seed=31)

    def eopts(out, **kw):
        o = EditOptions()
        o.in_filename = fq
        o.out_dirname = str(out)
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 300
        o.criteria.left_length = 10
        o.criteria.min_left_quality = 30
        o.criteria.max_left_quality = 60
        for k, v in kw.items():
            setattr(o, k, v)
        return o

    out_a, out_b = tmp_path / "a", tmp_path / "b"
    out_a.mkdir(); out_b.mkdir()
    full = run_edit(eopts(out_a))

    ck = str(tmp_path / "e.ck.npz")
    ob = eopts(out_b, checkpoint_path=ck, checkpoint_every=2)

    real_iter = run_mod._iter_with
    calls = {"n": 0}

    def limited(*a, **k):
        for b in real_iter(*a, **k):
            if calls["n"] >= 5:
                raise KeyboardInterrupt
            calls["n"] += 1
            yield b

    run_mod._iter_with = limited
    try:
        with pytest.raises(KeyboardInterrupt):
            run_edit(ob)
    finally:
        run_mod._iter_with = real_iter
    assert os.path.exists(ck)

    res = run_edit(ob)
    assert not os.path.exists(ck)
    assert res["num_edited"] == full["num_edited"]
    assert (out_b / "edit.fq").read_bytes() == (out_a / "edit.fq").read_bytes()


def test_cgr_resume_equals_uninterrupted(tmp_path):
    from hpgq.options import CgrOptions
    from hpgq.pipeline.cgr_run import run_cgr
    from hpgq.pipeline import run as run_mod

    fq = str(tmp_path / "in.fq")
    make_fastq(fq, 2000, min_len=50, max_len=90, n_prob=0.02, seed=41)

    def copts(out, **kw):
        o = CgrOptions()
        o.in_filename = fq
        o.out_dirname = str(out)
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 250
        o.k = 4
        for k, v in kw.items():
            setattr(o, k, v)
        return o

    out_a, out_b = tmp_path / "a", tmp_path / "b"
    out_a.mkdir(); out_b.mkdir()
    full = run_cgr(copts(out_a))

    ck = str(tmp_path / "c.ck.npz")
    ob = copts(out_b, checkpoint_path=ck, checkpoint_every=1)

    from hpgq.pipeline import cgr_run as cgr_mod

    real_iter = cgr_mod._iter_blocks
    calls = {"n": 0}

    def limited(*a, **k):
        for b in real_iter(*a, **k):
            if calls["n"] >= 3:
                raise KeyboardInterrupt
            calls["n"] += 1
            yield b

    cgr_mod._iter_blocks = limited
    try:
        with pytest.raises(KeyboardInterrupt):
            run_cgr(ob)
    finally:
        cgr_mod._iter_blocks = real_iter
    assert os.path.exists(ck)

    res = run_cgr(ob)
    assert not os.path.exists(ck)
    assert res["fq_word_count"] == full["fq_word_count"]
    np.testing.assert_array_equal(res["table_seq"], full["table_seq"])
    np.testing.assert_array_equal(res["table_q"], full["table_q"])
    fa = (out_a / "in.fq_k=4_FG.pgm").read_bytes()
    fb = (out_b / "in.fq_k=4_FG.pgm").read_bytes()
    assert fa == fb


def test_paired_filter_resume(tmp_path):
    from gen import make_records, write_fastq
    from hpgq.options import FilterOptions
    from hpgq.pipeline.run import run_filter
    from hpgq.pipeline import run as run_mod

    n = 1200
    r1 = make_records(n, min_len=60, max_len=60, seed=5)
    r2 = make_records(n, min_len=80, max_len=80, seed=6)
    f1 = str(tmp_path / "m1.fq")
    f2 = str(tmp_path / "m2.fq")
    write_fastq(f1, r1)
    write_fastq(f2, r2)

    def fopts(out, **kw):
        o = FilterOptions()
        o.in_filename = f1
        o.in_filename2 = f2
        o.out_dirname = str(out)
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 128
        o.criteria.min_read_quality = 15
        o.criteria.max_read_quality = 40
        for k, v in kw.items():
            setattr(o, k, v)
        return o

    out_a, out_b = tmp_path / "a", tmp_path / "b"
    out_a.mkdir(); out_b.mkdir()
    full = run_filter(fopts(out_a))

    ck = str(tmp_path / "p.ck.npz")
    ob = fopts(out_b, checkpoint_path=ck, checkpoint_every=1)

    real = run_mod._iter_blocks_paired
    calls = {"n": 0}

    def limited(*a, **k):
        for pair in real(*a, **k):
            if calls["n"] >= 4:
                raise KeyboardInterrupt
            calls["n"] += 1
            yield pair

    run_mod._iter_blocks_paired = limited
    try:
        with pytest.raises(KeyboardInterrupt):
            run_filter(ob)
    finally:
        run_mod._iter_blocks_paired = real
    assert os.path.exists(ck)

    res = run_filter(ob)
    assert not os.path.exists(ck)
    assert res["num_passed"] == full["num_passed"]
    for name in ("passed_1.fq", "passed_2.fq", "failed_1.fq", "failed_2.fq"):
        assert (out_b / name).read_bytes() == (out_a / name).read_bytes(), name


def test_paired_stats_resume(tmp_path):
    from gen import make_records, write_fastq
    from hpgq.options import StatsOptions
    from hpgq.pipeline.run import run_stats
    from hpgq.pipeline import run as run_mod

    n = 1500
    write_fastq(str(tmp_path / "s1.fq"), make_records(n, min_len=50, max_len=80, seed=7))
    write_fastq(str(tmp_path / "s2.fq"), make_records(n, min_len=70, max_len=90, seed=8))

    def sopts(out, **kw):
        o = StatsOptions()
        o.in_filename = str(tmp_path / "s1.fq")
        o.in_filename2 = str(tmp_path / "s2.fq")
        o.out_dirname = str(out)
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 200
        o.criteria.min_read_quality = 15
        o.criteria.max_read_quality = 40
        o.filter_on = True
        for k, v in kw.items():
            setattr(o, k, v)
        return o

    out_a, out_b = tmp_path / "a", tmp_path / "b"
    out_a.mkdir(); out_b.mkdir()
    f1, f2 = run_stats(sopts(out_a))

    ck = str(tmp_path / "ps.ck.npz")
    ob = sopts(out_b, checkpoint_path=ck, checkpoint_every=1)

    real = run_mod._iter_blocks_paired
    calls = {"n": 0}

    def limited(*a, **k):
        for pair in real(*a, **k):
            if calls["n"] >= 3:
                raise KeyboardInterrupt
            calls["n"] += 1
            yield pair

    run_mod._iter_blocks_paired = limited
    try:
        with pytest.raises(KeyboardInterrupt):
            run_stats(ob)
    finally:
        run_mod._iter_blocks_paired = real
    assert os.path.exists(ck)

    r1, r2 = run_stats(ob)
    assert not os.path.exists(ck)
    assert r1.equals(f1) and r2.equals(f2)
    assert r1.num_passed == f1.num_passed
    for name in ("s1.fq.summary.txt", "s2.fq.summary.txt"):
        assert (out_b / name).read_bytes() == (out_a / name).read_bytes()
