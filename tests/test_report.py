import os

import numpy as np
import pytest

from hpgq.io import FastqReader, pack_block
from hpgq.options import FilterCriteria, StatsOptions
from hpgq.oracle import baseline, spec
from hpgq.report.stats_report import sorted_kmers, stats_report

from gen import make_fastq


def _counters(tmp_path, n=200, **kw):
    path = str(tmp_path / "reads.fq")
    make_fastq(path, n, **kw)
    pairs = list(spec.iter_seq_qual(path))
    return path, pairs


def test_summary_and_data_files(tmp_path):
    path, pairs = _counters(tmp_path, min_len=40, max_len=60, n_prob=0.02, seed=21)
    counters = spec.stats_of_file(pairs, kmers_on=True)
    opts = StatsOptions(in_filename=path, out_dirname=str(tmp_path), kmers_on=True)
    stats_report(counters, opts)

    base = str(tmp_path / "reads.fq")
    summary = open(base + ".summary.txt").read()
    assert summary.startswith(
        "-----------------------------------\n"
        "      FastQ quality report\n"
        "-----------------------------------\n"
        "FastQ filename: reads.fq\n"
    )
    assert "Filter         : Disabled\n" in summary
    assert "Number of reads: 200\n" in summary
    assert "Read length (min., mean, max.): (%i, " % counters.min_length in summary
    # percent lines keep the literal '%' like glibc's handling of "%0.2f %\n"
    assert "\tA: " in summary and " %\n" in summary
    # k-mer top-20 table has the reference's 21-row quirk
    kmer_rows = summary.split("K-mers (top 20)\n\tSequence\tCount\n")[1]
    assert len([l for l in kmer_rows.strip("\n").split("\n") if l]) == 21

    # length histogram covers 1..max_length inclusive with zeros
    lh = open(base + ".length.histogram.data").read().strip("\n").split("\n")
    assert len(lh) == counters.max_length
    assert lh[0].startswith("1\t")
    total = sum(int(r.split("\t")[1]) for r in lh)
    assert total == counters.num_reads

    # GC histogram rows only non-zero, bins 1..99
    for row in open(base + ".GC.histogram.data").read().strip("\n").split("\n"):
        b, v = map(int, row.split("\t"))
        assert 1 <= b <= 99 and v > 0

    # quality.per.nt.data final state is the int-format (nt_content) variant
    qrows = open(base + ".quality.per.nt.data").read().strip("\n").split("\n")
    assert len(qrows) == counters.max_length
    for row in qrows:
        k, v = row.split("\t")
        int(k), int(v)  # both plain ints

    # nucleotides.data: 5 percentage columns summing ~100
    for row in open(base + ".nucleotides.data").read().strip("\n").split("\n"):
        cols = row.split("\t")
        assert len(cols) == 6
        assert abs(sum(float(x) for x in cols[1:]) - 100.0) < 0.2

    # kmers.txt has all 1024 rows sorted by count desc
    krows = open(base + ".kmers.txt").read().strip("\n").split("\n")[1:]
    assert len(krows) == 1024
    counts = [int(r.split("\t")[1]) for r in krows]
    assert counts == sorted(counts, reverse=True)
    assert sum(counts) == int(counters.kmer_counts.sum())

    # kmers.per.nt.data row count = max_length - 4
    prows = open(base + ".kmers.per.nt.data").read().strip("\n").split("\n")
    assert len(prows) == counters.max_length - 4

    # gnuplot scripts exist for all seven plots
    for suffix in (
        ".length.histogram", ".read.quality.histogram", ".quality.per.nt",
        ".GC.histogram", ".GC.per.nt", ".nucleotides", ".kmers.per.nt",
    ):
        assert os.path.exists(base + suffix + ".gnuplot"), suffix


def test_summary_filtered(tmp_path):
    path, pairs = _counters(tmp_path, min_len=40, max_len=60, seed=22)
    crit = FilterCriteria(min_read_quality=20, max_read_quality=40)
    counters = spec.stats_of_file(pairs, criteria=crit)
    opts = StatsOptions(
        in_filename=path,
        out_dirname=str(tmp_path),
        read_quality_range="20,40",
        criteria=crit.substituted(),
    )
    opts.filter_on = True
    stats_report(counters, opts)
    summary = open(str(tmp_path / "reads.fq.summary.txt")).read()
    assert "Filter options:\n" in summary
    assert "\tRead quality range  : 20,40\n" in summary
    assert (
        "Number of reads in file  : %d\n" % (counters.num_passed + counters.num_failed)
        in summary
    )
    assert "(%0.2f %%)" % (100.0 * counters.num_reads / 200) in summary.replace(
        "%)", "%%)"
    ) or " %)" in summary


def test_read_quality_histogram_keys(tmp_path):
    path, pairs = _counters(tmp_path, min_len=30, max_len=30, seed=23)
    counters = spec.stats_of_file(pairs)
    opts = StatsOptions(in_filename=path, out_dirname=str(tmp_path))
    stats_report(counters, opts)
    rows = (
        open(str(tmp_path / "reads.fq.read.quality.histogram.data"))
        .read().strip("\n").split("\n")
    )
    keys = [int(r.split("\t")[0]) for r in rows]
    # keys are phred-normalized and contiguous
    assert keys == list(range(keys[0], keys[0] + len(keys)))
    assert sum(int(r.split("\t")[1]) for r in rows) == counters.num_reads
    # raw keys span [min,max] observed
    nz = np.flatnonzero(counters.quality_hist)
    assert keys[0] == int(nz.min()) - counters.phred
    assert keys[-1] == int(nz.max()) - counters.phred


def test_sorted_kmers_tiebreak(tmp_path):
    from hpgq.core.counters import StatsCounters

    c = StatsCounters(kmers_on=True)
    c.kmer_counts[5] = 10
    c.kmer_counts[3] = 10
    c.kmer_counts[100] = 50
    km = sorted_kmers(c)
    assert km[0][0] == 100
    assert km[1][0] == 3 and km[2][0] == 5  # ties by id ascending


def test_filtered_summary_omits_unset_threshold_lines(tmp_path):
    """Unset thresholds must not echo as '-1' lines — the reference
    substitutes defaults before reporting (src/stats_fastq.c:431-444)."""
    from gen import make_fastq
    from hpgq.options import StatsOptions
    from hpgq.pipeline.run import run_stats

    fq = str(tmp_path / "e.fq")
    make_fastq(fq, 300, min_len=60, max_len=60, seed=2)
    o = StatsOptions()
    o.in_filename = fq
    o.out_dirname = str(tmp_path)
    o.quality_encoding_value = 33
    o.quality_encoding_name = "phred33"
    o.read_quality_range = "20,40"
    o.criteria.min_read_quality = 20
    o.criteria.max_read_quality = 40
    o.filter_on = True
    run_stats(o)
    txt = (tmp_path / "e.fq.summary.txt").read_bytes()
    assert b"Read quality range  : 20,40" in txt
    assert b"-1" not in txt
    assert b"Max. number of Ns" not in txt
    assert b"Max. out of quality" not in txt
    assert b"Left length" not in txt


def test_native_png_charts(tmp_path, monkeypatch):
    """HPGQ_CHARTS=native renders one valid 640x360 PNG per chart (the
    image half of the report contract, src/stats_report.c:654-655) without
    a gnuplot binary."""
    monkeypatch.setenv("HPGQ_CHARTS", "native")
    path, pairs = _counters(tmp_path, min_len=40, max_len=60, n_prob=0.02,
                            seed=23)
    counters = spec.stats_of_file(pairs, kmers_on=True)
    opts = StatsOptions(in_filename=path, out_dirname=str(tmp_path),
                        kmers_on=True)
    stats_report(counters, opts)

    from PIL import Image

    pngs = sorted(f for f in os.listdir(tmp_path) if f.endswith(".png"))
    gnuplots = [f for f in os.listdir(tmp_path) if f.endswith(".gnuplot")]
    assert len(pngs) == len(gnuplots) and len(pngs) >= 7
    for p in pngs:
        with Image.open(os.path.join(str(tmp_path), p)) as im:
            im.verify()
        with Image.open(os.path.join(str(tmp_path), p)) as im:
            assert im.size == (640, 360), p


def test_strict_case_mode(tmp_path):
    """HPGQ_STRICT_CASE=1 ([D6] strict-compat): lowercase bases drop out of
    the base counters in BOTH engine and oracle (they stay differentially
    equal), and counts shrink vs the default case-folding mode."""
    import subprocess
    import sys

    fq = str(tmp_path / "lc.fq")
    make_fastq(fq, 400, min_len=50, max_len=80, lowercase_prob=0.3, seed=31)
    prog = r"""
import sys
sys.path.insert(0, %r)
sys.path.insert(0, %r)
import jax
jax.config.update("jax_platforms", "cpu")
from gen import make_fastq  # noqa
from hpgq.oracle import spec
from hpgq.options import StatsOptions
from hpgq.pipeline.run import run_stats
o = StatsOptions()
o.in_filename = %r
o.out_dirname = %r
o.quality_encoding_value = 33
o.quality_encoding_name = "phred33"
c = run_stats(o)
w = spec.stats_of_file(spec.iter_seq_qual(%r))
assert c.equals(w), "engine != oracle in this case mode"
print("ACGT", c.num_As + c.num_Cs + c.num_Gs + c.num_Ts + c.num_Ns)
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tests = os.path.join(repo, "tests")

    def run(strict):
        env = dict(os.environ, HPGQ_CHARTS="off")
        env.pop("HPGQ_STRICT_CASE", None)
        if strict:
            env["HPGQ_STRICT_CASE"] = "1"
        out = str(tmp_path / ("s" if strict else "d"))
        os.makedirs(out, exist_ok=True)
        r = subprocess.run(
            [sys.executable, "-c", prog % (repo, tests, fq, out, fq)],
            capture_output=True, text=True, env=env, timeout=180,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        return int(r.stdout.split("ACGT")[1].split()[0])

    folded, strict = run(False), run(True)
    assert strict < folded  # lowercase bases no longer counted


def test_empty_input_summary_modes(tmp_path, monkeypatch):
    """Zero processed reads: the default mode writes the explicit empty
    summary; HPGQ_STRICT_EMPTY=1 reproduces the reference's unguarded
    printf bytes (src/stats_report.c:60-153 — '-nan' means, the x86
    (int)NaN 'Mean quality = -2147483648 [!]').  The golden was captured
    from a compiled C replica of report_summary with the zero-state
    counters (min_length init 100000, src/stats_fastq.c:24)."""
    from hpgq.core.counters import StatsCounters

    fq = str(tmp_path / "empty.fq")
    open(fq, "wb").close()
    counters = StatsCounters(phred=33)
    opts = StatsOptions(in_filename=fq, out_dirname=str(tmp_path))

    stats_report(counters, opts)
    default = open(fq + ".summary.txt").read()
    assert "Number of reads: 0" in default
    assert "no reads processed" in default

    monkeypatch.setenv("HPGQ_STRICT_EMPTY", "1")
    stats_report(counters, opts)
    golden = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden", "empty_strict", "empty.fq.summary.txt")
    assert open(fq + ".summary.txt", "rb").read() == open(golden, "rb").read()
    # strict mode runs the full writer set like the reference
    assert os.path.exists(fq + ".length.histogram.data")
    assert os.path.getsize(fq + ".length.histogram.data") == 0

    # filter-on empty: total > 0 so the processed line is 0.00, means nan
    c2 = StatsCounters(phred=33)
    c2.filter_on = True
    c2.num_failed = 7
    stats_report(c2, opts)
    strict = open(fq + ".summary.txt").read()
    assert "Number of reads in file  : 7" in strict
    assert "Number of processed reads: 0 (0.00 %)" in strict
    assert "Mean quality = -2147483648 [!]" in strict


def test_f32pct_large_count_semantics():
    """Percentages follow the C float chain: f32(100f * f32(count)) / f32(b)."""
    from hpgq.utils.cfmt import f32pct, fmt2f

    # 2^24+1 is not representable in f32; the C chain loses the +1
    assert fmt2f(f32pct(16777217, 16778056)) == fmt2f(f32pct(16777216, 16778056))
