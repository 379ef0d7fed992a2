"""The bitpack2u (uniform) wire tier: native-vs-numpy differential,
decode round-trip exactness, fallback conditions, and end-to-end engine
equality."""

import numpy as np
import pytest

from gen import make_fastq

from hpgq.io import native
from hpgq.io.fastq import FastqReader
from hpgq.io.packer import (
    pack_block,
    round_up,
    try_pack_block_2u,
    wire_bitpack2u_np,
)


def _np_pack(block, max_len=0, pad_reads_to=0):
    saved = native.available
    native.available = lambda: False
    try:
        return pack_block(block, max_len=max_len, pad_reads_to=pad_reads_to)
    finally:
        native.available = saved


@pytest.mark.parametrize("length", [100, 64, 37])
def test_pack_2u_native_matches_numpy(tmp_path, length):
    if not native.available():
        pytest.skip("native packer not built")
    path = tmp_path / "u.fq"
    make_fastq(str(path), 3000, min_len=length, max_len=length, n_prob=0.02,
               lowercase_prob=0.1, seed=8, qual_bins=(2, 12, 23, 37))
    with FastqReader(str(path), batch_size=1024) as rd:
        for block in rd:
            for pr in (0, 4096):
                nrows = max(pr, block.num_reads)
                got = native.pack_bitwire2u(
                    block.arr, block.starts[:, 1], block.starts[:, 3],
                    block.seq_lens, length, nrows)
                want = wire_bitpack2u_np(*_np_pack(
                    block, max_len=round_up(length, 8), pad_reads_to=nrows))
                assert (got is None) == (want is None)
                if got is not None:
                    np.testing.assert_array_equal(got[0], want[0], err_msg="buf")
                    np.testing.assert_array_equal(got[1], want[1], err_msg="exc")
                    np.testing.assert_array_equal(got[2], want[2], err_msg="pal")
                    assert got[3] == want[3]


def test_2u_fallback_conditions(tmp_path):
    """Non-uniform lengths and >4-distinct unions miss the tier in both
    implementations (and via try_pack_block_2u)."""
    var = tmp_path / "var.fq"
    make_fastq(str(var), 500, min_len=60, max_len=100, n_prob=0.01, seed=9,
               qual_bins=(2, 12, 23, 37))
    with FastqReader(str(var), batch_size=512) as rd:
        block = next(iter(rd))
    assert try_pack_block_2u(block) is None
    assert wire_bitpack2u_np(*_np_pack(block, max_len=128)) is None

    wide = tmp_path / "wide.fq"
    make_fastq(str(wide), 500, min_len=80, max_len=80, n_prob=0.01, seed=10)
    with FastqReader(str(wide), batch_size=512) as rd:
        block = next(iter(rd))
    assert try_pack_block_2u(block) is None  # unbinned quals: union > 4

    # per-row palettes can each fit while the block UNION exceeds 4
    mixed = tmp_path / "mix.fq"
    with open(mixed, "wb") as f:
        for i, qv in enumerate(([2, 12] * 20, [23, 37] * 20, [5, 30] * 20)):
            q = bytes(33 + v for v in qv)
            f.write(b"@m%d\n%s\n+\n%s\n" % (i, b"ACGT" * 10, q))
    with FastqReader(str(mixed), batch_size=64) as rd:
        block = next(iter(rd))
    assert try_pack_block_2u(block) is None
    from hpgq.io.packer import try_pack_block_2c

    assert try_pack_block_2c(block, 40) is not None  # per-row tier still fits


@pytest.mark.parametrize("length", [100, 48])
def test_decode_round_trip_exact(tmp_path, length):
    from hpgq.kernels.stats_jnp import wire_unbits2u

    path = tmp_path / "u.fq"
    make_fastq(str(path), 2000, min_len=length, max_len=length, n_prob=0.02,
               lowercase_prob=0.05, seed=12, qual_bins=(2, 12, 23, 37))
    with FastqReader(str(path), batch_size=700) as rd:
        for block in rd:
            out = try_pack_block_2u(block, pad_reads_to=1024)
            assert out is not None
            buf, exc, pal, n_valid, Lu = out
            assert Lu == length and n_valid == block.num_reads
            codes, quals, lens, valid = (np.asarray(x) for x in
                                         wire_unbits2u(buf, exc, pal,
                                                       n_valid, L=Lu))
            Lp = codes.shape[1]
            ref = pack_block(block, max_len=Lp, pad_reads_to=1024)
            np.testing.assert_array_equal(codes, ref[0], err_msg="codes")
            np.testing.assert_array_equal(quals, ref[1], err_msg="quals")
            np.testing.assert_array_equal(lens, ref[2], err_msg="lens")
            np.testing.assert_array_equal(valid, ref[3], err_msg="valid")


def test_paired_2u_equals_plain(tmp_path, monkeypatch):
    """Fused paired step over the uniform wire (mates with DIFFERENT
    uniform lengths, each its own palette/sidecar) == the wire-off run;
    a spy proves the 2u pair path engaged."""
    import dataclasses

    import hpgq.io.packer as packer_mod
    from hpgq.options import FilterCriteria, StatsOptions
    from hpgq.pipeline.run import run_stats

    p1 = str(tmp_path / "m1.fq")
    p2 = str(tmp_path / "m2.fq")
    make_fastq(p1, 4000, min_len=100, max_len=100, n_prob=0.02, seed=25,
               qual_bins=(2, 12, 23, 37))
    make_fastq(p2, 4000, min_len=80, max_len=80, n_prob=0.02, seed=26,
               qual_bins=(2, 12, 23, 37))
    crit = FilterCriteria(min_read_quality=20, max_read_quality=60, max_N=2)

    hits = {"n": 0}
    orig = packer_mod.try_pack_block_2u

    def spy(*a, **k):
        out = orig(*a, **k)
        hits["n"] += int(out is not None)
        return out

    monkeypatch.setattr(packer_mod, "try_pack_block_2u", spy)

    def run(wire):
        monkeypatch.setenv("HPGQ_WIRE", wire)
        o = StatsOptions()
        o.in_filename, o.in_filename2 = p1, p2
        o.out_dirname = str(tmp_path / ("out_" + wire))
        o.quality_encoding_value = 33
        o.quality_encoding_name = "phred33"
        o.batch_size = 1500
        o.criteria = dataclasses.replace(crit)
        o.filter_on = True
        return run_stats(o, report=False)

    w1, w2 = run("bitpack")
    assert hits["n"] > 0, "2u pair path never engaged"
    o1, o2 = run("off")
    for got, want in ((w1, o1), (w2, o2)):
        assert got.num_passed == want.num_passed
        assert got.num_failed == want.num_failed
        assert got.num_reads == want.num_reads
        assert (got.num_As, got.num_Ns) == (want.num_As, want.num_Ns)
        np.testing.assert_array_equal(got.base_per_nt, want.base_per_nt)
        np.testing.assert_array_equal(got.quality_hist, want.quality_hist)
        np.testing.assert_array_equal(got.acc_quality_per_nt,
                                      want.acc_quality_per_nt)


def test_engine_2u_equals_oracle(tmp_path, monkeypatch):
    """End-to-end stats+filter through the uniform wire == the numpy
    oracle (jnp engine, forced bitpack wire), with a spy proving the 2u
    tier actually carried batches."""
    import dataclasses

    import hpgq.io.packer as packer_mod
    from hpgq.core.counters import StatsCounters
    from hpgq.options import FilterCriteria, StatsOptions
    from hpgq.oracle import baseline as ob
    from hpgq.pipeline.run import run_stats

    monkeypatch.setenv("HPGQ_WIRE", "bitpack")
    path = tmp_path / "c.fq"
    make_fastq(str(path), 8000, min_len=100, max_len=100, n_prob=0.02,
               seed=14, qual_bins=(2, 12, 23, 37))

    hits = {"n": 0}
    orig = packer_mod.try_pack_block_2u

    def spy(*a, **k):
        out = orig(*a, **k)
        hits["n"] += int(out is not None)
        return out

    monkeypatch.setattr(packer_mod, "try_pack_block_2u", spy)

    crit = FilterCriteria(min_read_length=50, max_read_length=200,
                          min_read_quality=20, max_read_quality=60, max_N=2)
    o = StatsOptions()
    o.in_filename = str(path)
    o.out_dirname = str(tmp_path / "out")
    o.quality_encoding_value = 33
    o.quality_encoding_name = "phred33"
    o.batch_size = 3000
    o.criteria = dataclasses.replace(crit)
    o.filter_on = True
    got = run_stats(o, report=False)
    assert hits["n"] > 0, "2u tier never engaged"

    acc = StatsCounters(phred=33)
    n_passed = n_failed = 0
    with FastqReader(str(path), batch_size=3000) as rd:
        for block in rd:
            codes, quals, lens, valid = pack_block(block)
            ok = ob.block_verdicts(codes, quals, lens, crit, 33) & valid
            n_passed += int(ok.sum())
            n_failed += int((valid & ~ok).sum())
            acc = acc.merge(ob.block_stats(codes, quals, lens, ok, phred=33))
    assert (got.num_reads, got.num_passed, got.num_failed) == \
        (acc.num_reads, n_passed, n_failed)
    assert (got.num_As, got.num_Cs, got.num_Gs, got.num_Ts, got.num_Ns) == \
        (acc.num_As, acc.num_Cs, acc.num_Gs, acc.num_Ts, acc.num_Ns)
    np.testing.assert_array_equal(got.base_per_nt, acc.base_per_nt)
    np.testing.assert_array_equal(got.length_hist, acc.length_hist)
    np.testing.assert_array_equal(got.quality_hist, acc.quality_hist)
    np.testing.assert_array_equal(got.gc_hist, acc.gc_hist)
    np.testing.assert_array_equal(got.acc_quality_per_nt,
                                  acc.acc_quality_per_nt)
    np.testing.assert_array_equal(got.count_quality_per_nt,
                                  acc.count_quality_per_nt)
