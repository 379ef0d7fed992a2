"""The 2c wire tier (2-bit codes + 2-bit qual palette + exception
sidecar): width invertibility, native-vs-numpy differential, decode
round-trip exactness, and end-to-end engine equality on N-containing
corpora."""

import os

import numpy as np
import pytest

from gen import make_fastq

from hpgq.io import native
from hpgq.io.fastq import FastqReader
from hpgq.io.packer import (
    pack_block,
    try_pack_block_2c,
    wire_bitpack2c_np,
)


def _np_pack(block, max_len=0, pad_reads_to=0):
    saved = native.available
    native.available = lambda: False
    try:
        return pack_block(block, max_len=max_len, pad_reads_to=pad_reads_to)
    finally:
        native.available = saved


def test_width_families_disjoint_and_invertible():
    """bitwire2c_width never collides with the 7/6/2q families and
    bitwire_kind inverts every family's width for all L in tier scope."""
    from hpgq.io.native import (
        bitwire2c_width,
        bitwire2q_width,
        bitwire6_width,
    )
    from hpgq.kernels.stats_jnp import bitwire_kind

    for L in range(8, 2049, 8):
        widths = {
            7: 10 * L // 8 + 8,
            6: bitwire6_width(L),
            2: bitwire2q_width(L),
            -2: bitwire2c_width(L),
        }
        assert len(set(widths.values())) == 4, (L, widths)
        for qbits, w in widths.items():
            got = bitwire_kind(w)
            assert got == (qbits, L), (L, qbits, w, got)


@pytest.mark.parametrize("varlen", [False, True])
def test_pack_2c_native_matches_numpy(tmp_path, varlen):
    """Native single-pass 2c wire == numpy oracle, byte-exact, including
    the exception sidecar (order, encoding, padding)."""
    if not native.available():
        pytest.skip("native packer not built")
    path = tmp_path / "r.fq"
    kw = dict(min_len=41, max_len=151) if varlen else dict(min_len=90,
                                                           max_len=90)
    make_fastq(str(path), 3000, n_prob=0.02, lowercase_prob=0.1, seed=6,
               qual_bins=(2, 12, 23, 37), **kw)
    with FastqReader(str(path), batch_size=1024) as rd:
        for block in rd:
            for L, pr in ((256, 0), (256, 4096), (128, 2048)):
                got = native.pack_bitwire2c(
                    block.arr, block.starts[:, 1], block.starts[:, 3],
                    block.seq_lens, L, max(pr, block.num_reads))
                want = wire_bitpack2c_np(*_np_pack(
                    block, max_len=L, pad_reads_to=max(pr, block.num_reads)))
                assert (got is None) == (want is None)
                if got is not None:
                    np.testing.assert_array_equal(got[0], want[0], err_msg="buf")
                    np.testing.assert_array_equal(got[1], want[1], err_msg="exc")


def test_pack_2c_edge_rows(tmp_path):
    """Edge rows: all-N reads, other chars, zero-length reads, truncation
    past the wire width, 5-distinct-qual misfit."""
    rows = [
        (b"N" * 40, [2] * 40),                       # all exceptions
        (b"ACGTRYKM" * 5, [2, 12, 23, 37] * 10),     # OTHER chars
        (b"", []),                                   # zero-length
        (b"NNACGT" * 30, [2, 37] * 90),              # longer than L=128
        (b"acgtn" * 8, [12] * 40),                   # lowercase
    ]
    path = tmp_path / "edge.fq"
    with open(path, "wb") as f:
        for i, (seq, qv) in enumerate(rows):
            q = bytes(33 + v for v in qv)
            f.write(b"@e%d\n%s\n+\n%s\n" % (i, seq, q))
    with FastqReader(str(path), batch_size=64) as rd:
        block = next(iter(rd))
    want = wire_bitpack2c_np(*_np_pack(block, max_len=128, pad_reads_to=64))
    assert want is not None
    if native.available():
        got = native.pack_bitwire2c(
            block.arr, block.starts[:, 1], block.starts[:, 3],
            block.seq_lens, 128, 64)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])

    # a 5-distinct-qual row misfits in both implementations
    with open(path, "ab") as f:
        q = bytes(33 + v for v in (0, 20, 40, 60, 80) * 8)
        f.write(b"@e9\n%s\n+\n%s\n" % (b"ACGT" * 10, q))
    with FastqReader(str(path), batch_size=64) as rd:
        block = next(iter(rd))
    assert wire_bitpack2c_np(*_np_pack(block, max_len=128)) is None
    if native.available():
        assert native.pack_bitwire2c(
            block.arr, block.starts[:, 1], block.starts[:, 3],
            block.seq_lens, 128, block.num_reads) is None


@pytest.mark.parametrize("varlen", [False, True])
def test_decode_round_trip_exact(tmp_path, varlen):
    """wire_unbits2c(pack_2c(block)) == pack_block(block) exactly —
    codes (incl. restored N/OTHER and padding byte 5), quals, lens,
    valid."""
    from hpgq.kernels.stats_jnp import wire_unbits2c

    path = tmp_path / "r.fq"
    kw = dict(min_len=41, max_len=127) if varlen else dict(min_len=100,
                                                           max_len=100)
    make_fastq(str(path), 2000, n_prob=0.02, lowercase_prob=0.05, seed=11,
               qual_bins=(2, 12, 23, 37), **kw)
    with FastqReader(str(path), batch_size=700) as rd:
        for block in rd:
            out = try_pack_block_2c(block, 128, pad_reads_to=1024)
            assert out is not None
            buf, exc = out
            codes, quals, lens, valid = (np.asarray(x) for x in
                                         wire_unbits2c(buf, exc))
            ref = pack_block(block, max_len=128, pad_reads_to=1024)
            np.testing.assert_array_equal(codes, ref[0], err_msg="codes")
            np.testing.assert_array_equal(quals, ref[1], err_msg="quals")
            np.testing.assert_array_equal(lens, ref[2], err_msg="lens")
            np.testing.assert_array_equal(valid, ref[3], err_msg="valid")


def test_paired_2c_equals_plain(tmp_path, monkeypatch):
    """Paired stats+filter through the 2c wire == the wire-off run on an
    N-containing binned corpus (pair-consistent verdicts ride the
    restored exact codes)."""
    import dataclasses

    from hpgq.options import FilterCriteria, StatsOptions
    from hpgq.pipeline.run import run_stats

    p1 = str(tmp_path / "m1.fq")
    p2 = str(tmp_path / "m2.fq")
    make_fastq(p1, 4000, min_len=100, max_len=100, n_prob=0.02, seed=21,
               qual_bins=(2, 12, 23, 37))
    make_fastq(p2, 4000, min_len=100, max_len=100, n_prob=0.02, seed=22,
               qual_bins=(2, 12, 23, 37))
    crit = FilterCriteria(min_read_quality=20, max_read_quality=60, max_N=2)

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
    o1, o2 = run("off")
    for got, want in ((w1, o1), (w2, o2)):
        assert got.num_passed == want.num_passed
        assert got.num_failed == want.num_failed
        assert got.num_reads == want.num_reads
        assert (got.num_As, got.num_Ns) == (want.num_As, want.num_Ns)
        np.testing.assert_array_equal(got.base_per_nt, want.base_per_nt)
        np.testing.assert_array_equal(got.quality_hist, want.quality_hist)


def test_engine_2c_equals_oracle(tmp_path, monkeypatch):
    """End-to-end stats+filter through the 2c wire == the numpy oracle on
    an N-containing binned corpus (jnp engine, forced bitpack wire)."""
    import dataclasses

    from hpgq.core.counters import StatsCounters
    from hpgq.options import FilterCriteria, StatsOptions
    from hpgq.oracle import baseline as ob
    from hpgq.pipeline.run import run_stats

    monkeypatch.setenv("HPGQ_WIRE", "bitpack")
    path = tmp_path / "c.fq"
    make_fastq(str(path), 8000, min_len=100, max_len=100, n_prob=0.02,
               seed=13, qual_bins=(2, 12, 23, 37))

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

    acc = StatsCounters(phred=33)
    n_passed = n_failed = 0
    with FastqReader(str(path), batch_size=3000) as rd:
        for block in rd:
            codes, quals, lens, valid = pack_block(block)
            ok = ob.block_verdicts(codes, quals, lens, crit, 33) & valid
            n_passed += int(ok.sum())
            n_failed += int((valid & ~ok).sum())
            acc = acc.merge(ob.block_stats(codes, quals, lens, ok, phred=33))
    assert got.num_reads == acc.num_reads
    assert got.num_passed == n_passed
    assert got.num_failed == n_failed
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
