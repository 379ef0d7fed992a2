"""Top-level Python API (hpgq.stats / filter_reads / edit / cgr)."""

import os

import pytest

from gen import make_fastq

import hpgq


def test_api_end_to_end(tmp_path):
    fq = str(tmp_path / "a.fq")
    make_fastq(fq, 500, min_len=60, max_len=90, seed=1)

    c = hpgq.stats(fq, outdir=str(tmp_path / "s"), kmers=True)
    assert c.num_reads == 500
    assert (tmp_path / "s" / "a.fq.summary.txt").exists()

    r = hpgq.filter_reads(fq, outdir=str(tmp_path / "f"),
                          read_quality_range=(18, 40))
    assert r["num_passed"] + r["num_failed"] == 500

    r = hpgq.edit(fq, outdir=str(tmp_path / "e"), left_length=5,
                  left_quality_range=(30, 60))
    assert os.path.exists(r["edit_filename"])

    r = hpgq.cgr(fq, outdir=str(tmp_path / "c"), k=4, write_gs=True)
    assert r["fq_word_count"] > 0 and os.path.exists(r["gs_file"])


def test_api_errors(tmp_path):
    fq = str(tmp_path / "a.fq")
    make_fastq(fq, 10, min_len=50, max_len=50)
    with pytest.raises(ValueError):
        hpgq.filter_reads(fq, outdir=str(tmp_path))
    with pytest.raises(ValueError):
        hpgq.edit(fq, outdir=str(tmp_path))
    with pytest.raises(ValueError):
        hpgq.stats(fq, outdir=str(tmp_path), encoding="phred99")


def test_parallel_shard_reader_matches_serial(tmp_path, monkeypatch):
    """run_stats with concurrent byte-range readers == serial run on every
    integer counter and the summary bytes (f32 acc_quality folds in shard
    order — deterministic; tolerance only on the derived mean)."""
    from hpgq.options import StatsOptions
    from hpgq.pipeline import run as run_mod

    fq = str(tmp_path / "p.fq")
    make_fastq(fq, 4000, min_len=60, max_len=120, n_prob=0.02, seed=13)

    def opts(out, kmers=False, flt=False):
        o = StatsOptions()
        o.in_filename = fq
        o.out_dirname = str(out)
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 700
        o.kmers_on = kmers
        if flt:
            o.read_quality_range = "18,40"
            o.criteria.min_read_quality = 18
            o.criteria.max_read_quality = 40
            o.filter_on = True
        return o

    for kw in ({}, {"kmers": True}, {"flt": True}):
        a, b = tmp_path / ("a%s" % kw), tmp_path / ("b%s" % kw)
        a.mkdir(), b.mkdir()
        serial = run_mod.run_stats(opts(a, **kw))
        monkeypatch.setenv("HPGQ_READ_SHARDS", "3")
        monkeypatch.setattr(run_mod, "_PARALLEL_MIN_BYTES", 1)
        par = run_mod.run_stats(opts(b, **kw))
        monkeypatch.delenv("HPGQ_READ_SHARDS")
        monkeypatch.setattr(run_mod, "_PARALLEL_MIN_BYTES", 32 << 20)
        assert par.equals(serial), kw
        assert (b / "p.fq.summary.txt").read_bytes() == (
            a / "p.fq.summary.txt"
        ).read_bytes(), kw


def test_parallel_output_shards_match_serial(tmp_path, monkeypatch):
    """filter/edit over concurrent byte-range shards: byte-identical
    passed/failed/edit files and equal counts vs the serial run."""
    from hpgq.options import EditOptions, FilterOptions
    from hpgq.pipeline import run as run_mod

    fq = str(tmp_path / "po.fq")
    make_fastq(fq, 5000, min_len=50, max_len=110, n_prob=0.02, seed=19)

    def fopts(out):
        o = FilterOptions()
        o.in_filename = fq
        o.out_dirname = str(out)
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 600
        o.criteria.min_read_quality = 18
        o.criteria.max_read_quality = 40
        o.filter_on = True
        return o

    def eopts(out):
        o = EditOptions()
        o.in_filename = fq
        o.out_dirname = str(out)
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 600
        o.criteria.left_length = 6
        o.criteria.min_left_quality = 28
        o.criteria.max_left_quality = 60
        return o

    for which, opts_of, runner, files in (
        ("filter", fopts, run_mod.run_filter, ("passed.fq", "failed.fq")),
        ("edit", eopts, run_mod.run_edit, ("edit.fq",)),
    ):
        a, b = tmp_path / ("sa_" + which), tmp_path / ("sb_" + which)
        a.mkdir(), b.mkdir()
        serial = runner(opts_of(a))
        monkeypatch.setenv("HPGQ_READ_SHARDS", "3")
        monkeypatch.setattr(run_mod, "_PARALLEL_MIN_BYTES", 1)
        par = runner(opts_of(b))
        monkeypatch.delenv("HPGQ_READ_SHARDS")
        monkeypatch.setattr(run_mod, "_PARALLEL_MIN_BYTES", 32 << 20)
        for f in files:
            assert (b / f).read_bytes() == (a / f).read_bytes(), (which, f)
        for k in ("num_passed", "num_failed", "num_edited"):
            assert par.get(k, 0) == serial.get(k, 0), (which, k)
        assert not [d for d in os.listdir(b) if d.startswith(".pshard")]


def test_parallel_shard_dir_owner_guard(tmp_path, monkeypatch):
    """A leftover .pshard dir from a dead run is cleaned up and the run
    succeeds; one owned by a LIVE process is refused (never rmtree'd out
    from under a concurrent run)."""
    import pytest

    from hpgq.options import FilterOptions
    from hpgq.pipeline import run as run_mod

    fq = str(tmp_path / "og.fq")
    make_fastq(fq, 1500, min_len=50, max_len=90, n_prob=0.02, seed=23)

    def fopts(out):
        o = FilterOptions()
        o.in_filename = fq
        o.out_dirname = str(out)
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 500
        o.criteria.min_read_quality = 18
        o.criteria.max_read_quality = 40
        o.filter_on = True
        return o

    monkeypatch.setenv("HPGQ_READ_SHARDS", "2")
    monkeypatch.setattr(run_mod, "_PARALLEL_MIN_BYTES", 1)

    # stale dir (marker pid long dead, and a junk file that must not leak
    # into the concatenated outputs)
    d = tmp_path / "dead"
    d.mkdir()
    sd = d / ".pshard0000"
    sd.mkdir()
    (sd / run_mod._SHARD_OWNER).write_text("999999999")
    (sd / "passed.fq").write_bytes(b"@junk\nA\n+\n!\n")
    out = run_mod.run_filter(fopts(d))
    assert out["num_passed"] + out["num_failed"] == 1500
    assert b"@junk" not in (d / "passed.fq").read_bytes()
    assert not [p for p in os.listdir(d) if p.startswith(".pshard")]

    # live owner: refuse instead of deleting
    l = tmp_path / "live"
    l.mkdir()
    sd = l / ".pshard0001"
    sd.mkdir()
    (sd / run_mod._SHARD_OWNER).write_text(str(os.getppid() or os.getpid()))
    with pytest.raises(RuntimeError, match="concurrent run"):
        run_mod.run_filter(fopts(l))
    assert sd.is_dir()  # the concurrent run's outputs were left alone


def test_parallel_paired_shards_match_serial(tmp_path, monkeypatch):
    """Paired stats/filter over record-count-aligned shard pairs ==
    serial: equal counters, byte-identical passed/failed mate files."""
    from hpgq.options import FilterOptions, StatsOptions
    from hpgq.pipeline import run as run_mod

    f1 = str(tmp_path / "pm1.fq")
    f2 = str(tmp_path / "pm2.fq")
    make_fastq(f1, 3000, min_len=50, max_len=110, n_prob=0.02, seed=23)
    make_fastq(f2, 3000, min_len=50, max_len=110, n_prob=0.02, seed=24)

    def sopts(out):
        o = StatsOptions()
        o.in_filename, o.in_filename2 = f1, f2
        o.out_dirname = str(out)
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 500
        o.criteria.min_read_quality = 18
        o.criteria.max_read_quality = 40
        o.filter_on = True
        return o

    def fopts(out):
        o = FilterOptions()
        o.in_filename, o.in_filename2 = f1, f2
        o.out_dirname = str(out)
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 500
        o.criteria.max_N = 1
        o.filter_on = True
        return o

    a, b = tmp_path / "sa", tmp_path / "sb"
    a.mkdir(), b.mkdir()
    s1, s2 = run_mod.run_stats(sopts(a))
    fa, fb = tmp_path / "fa", tmp_path / "fb"
    fa.mkdir(), fb.mkdir()
    rf = run_mod.run_filter(fopts(fa))

    monkeypatch.setenv("HPGQ_READ_SHARDS", "3")
    monkeypatch.setattr(run_mod, "_PARALLEL_MIN_BYTES", 1)
    p1, p2 = run_mod.run_stats(sopts(b))
    pf = run_mod.run_filter(fopts(fb))
    monkeypatch.delenv("HPGQ_READ_SHARDS")
    monkeypatch.setattr(run_mod, "_PARALLEL_MIN_BYTES", 32 << 20)

    assert p1.equals(s1) and p2.equals(s2)
    assert (p1.num_passed, p1.num_failed) == (s1.num_passed, s1.num_failed)
    assert (b / "pm1.fq.summary.txt").read_bytes() == (
        a / "pm1.fq.summary.txt").read_bytes()
    for f in ("passed_1.fq", "passed_2.fq", "failed_1.fq", "failed_2.fq"):
        assert (fb / f).read_bytes() == (fa / f).read_bytes(), f
    assert (pf["num_passed"], pf["num_failed"]) == (
        rf["num_passed"], rf["num_failed"])


def test_api_stats_inline_filter_and_sharded(tmp_path):
    fq = str(tmp_path / "b.fq")
    make_fastq(fq, 600, min_len=50, max_len=100, n_prob=0.02, seed=2)
    c = hpgq.stats(fq, outdir=str(tmp_path / "x"), read_quality_range=(18, 40),
                   max_N=1)
    assert c.filter_on and c.num_passed + c.num_failed == 600
    c2 = hpgq.stats(fq, outdir=str(tmp_path / "y"), sharded=True)
    assert c2.num_reads == 600


def test_api_prepro(tmp_path):
    from gen import make_fastq

    path = str(tmp_path / "in.fq")
    make_fastq(path, 120, min_len=40, max_len=60, seed=71)
    out = tmp_path / "o"
    out.mkdir()
    import hpgq

    res = hpgq.prepro(path, outdir=str(out), ltrim_nts=4, min_quality=25,
                      max_quality=64)
    valid = out / "in.fq.valid"
    assert valid.exists()
    assert res["num_edited"] >= 0
    assert valid.read_bytes().count(b"\n") == 480


def test_profile_dir_trace(tmp_path):
    """--profile-dir writes a jax.profiler trace (SURVEY §5 tracing row)."""
    from gen import make_fastq

    from hpgq.options import StatsOptions
    from hpgq.pipeline.run import run_stats

    path = str(tmp_path / "in.fq")
    make_fastq(path, 200, min_len=40, max_len=60, seed=81)
    prof = tmp_path / "prof"
    o = StatsOptions(in_filename=path, out_dirname=str(tmp_path))
    o.quality_encoding_value = 33
    o.quality_encoding_name = "phred33"
    o.profile_dir = str(prof)
    run_stats(o, report=False)
    files = [p for p in prof.rglob("*") if p.is_file()]
    assert files, "profiler trace directory is empty"


def test_paired_edit_bad_mate_preserves_outputs(tmp_path):
    """A paired edit whose mate-2 fails to OPEN must not destroy the
    previous run's outputs: writers (mode 'wb' — truncating) open only
    after both readers opened."""
    import pytest

    from gen import make_fastq
    from hpgq.options import EditOptions
    from hpgq.pipeline.run import run_edit

    f1 = str(tmp_path / "e1.fq")
    f2 = str(tmp_path / "e2.fq")
    make_fastq(f1, 300, min_len=50, max_len=90, seed=21)
    make_fastq(f2, 300, min_len=50, max_len=90, seed=22)

    def opts(mate2):
        o = EditOptions()
        o.in_filename = f1
        o.in_filename2 = mate2
        o.out_dirname = str(tmp_path)
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 100
        o.criteria.left_length = 5
        o.criteria.min_left_quality = 20
        o.criteria.max_left_quality = 60
        return o

    run_edit(opts(f2))
    before = {n: (tmp_path / n).read_bytes()
              for n in ("edit_1.fq", "edit_2.fq")}
    assert all(before.values())

    with pytest.raises(FileNotFoundError):
        run_edit(opts(str(tmp_path / "missing.fq")))
    for n, data in before.items():
        assert (tmp_path / n).read_bytes() == data, n
