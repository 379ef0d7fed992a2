"""Differential tests: per-read spec vs vectorized numpy baseline."""

import numpy as np
import pytest

from hpgq.core.counters import StatsCounters
from hpgq.io import FastqReader, pack_block
from hpgq.options import FilterCriteria
from hpgq.oracle import baseline, spec

from gen import make_fastq

CRIT = FilterCriteria(
    min_read_length=20,
    max_read_length=80,
    min_read_quality=20,
    max_read_quality=40,
    max_out_of_quality=30,
    left_length=10,
    min_left_quality=15,
    max_left_quality=45,
    right_length=8,
    min_right_quality=10,
    max_right_quality=60,
    max_N=2,
)


def _load(tmp_path, **kw):
    path = str(tmp_path / "a.fq")
    make_fastq(path, kw.pop("n", 300), **kw)
    with FastqReader(path, batch_size=10**9) as rd:
        (block,) = list(rd)
    packed = pack_block(block)
    pairs = [(block.sequence(i), block.quality(i)) for i in range(block.num_reads)]
    return pairs, packed


@pytest.mark.parametrize("kmers_on", [False, True])
def test_stats_spec_vs_baseline(tmp_path, kmers_on):
    pairs, (codes, quals, lens, valid) = _load(
        tmp_path, min_len=8, max_len=70, n_prob=0.03, seed=11, lowercase_prob=0.05
    )
    ref = spec.stats_of_file(pairs, kmers_on=kmers_on)
    got = baseline.block_stats(codes, quals, lens, valid, kmers_on=kmers_on)
    assert got.equals(ref)
    assert ref.equals(got)


def test_stats_with_filter(tmp_path):
    pairs, (codes, quals, lens, valid) = _load(
        tmp_path, min_len=8, max_len=90, n_prob=0.03, seed=12
    )
    ref = spec.stats_of_file(pairs, criteria=CRIT)
    verdicts = baseline.block_verdicts(codes, quals, lens, CRIT)
    got = baseline.block_stats(codes, quals, lens, valid & verdicts)
    got.filter_on = True
    got.num_passed = int(verdicts.sum())
    got.num_failed = int((~verdicts).sum())
    assert got.equals(ref)
    assert got.num_passed == ref.num_passed
    assert got.num_failed == ref.num_failed
    assert 0 < got.num_passed < len(pairs)


def test_verdicts_spec_vs_baseline(tmp_path):
    pairs, (codes, quals, lens, valid) = _load(
        tmp_path, min_len=8, max_len=90, n_prob=0.05, seed=13
    )
    sub = CRIT.substituted()
    ref = np.array([spec.filter_verdict(s, q, sub) for s, q in pairs])
    got = baseline.block_verdicts(codes, quals, lens, CRIT)
    np.testing.assert_array_equal(got, ref)


def test_partial_criteria_verdicts(tmp_path):
    pairs, (codes, quals, lens, valid) = _load(
        tmp_path, min_len=8, max_len=90, n_prob=0.05, seed=17
    )
    crit = FilterCriteria(min_read_quality=22, max_read_quality=38, max_N=1)
    sub = crit.substituted()
    ref = np.array([spec.filter_verdict(s, q, sub) for s, q in pairs])
    got = baseline.block_verdicts(codes, quals, lens, crit)
    np.testing.assert_array_equal(got, ref)
    assert 0 < got.sum() < len(pairs)


def test_trims_spec_vs_baseline(tmp_path):
    pairs, (codes, quals, lens, valid) = _load(
        tmp_path, min_len=5, max_len=60, seed=14, min_q=2, max_q=41
    )
    crit = FilterCriteria(
        left_length=12,
        min_left_quality=22,
        max_left_quality=90,
        right_length=6,
        min_right_quality=25,
        max_right_quality=90,
    )
    sub = crit.substituted()
    ref = np.array([spec.trim_lengths(s, q, sub) for s, q in pairs])
    lt, rt = baseline.block_trims(quals, lens, crit)
    np.testing.assert_array_equal(lt, ref[:, 0])
    np.testing.assert_array_equal(rt, ref[:, 1])
    assert lt.sum() > 0 and rt.sum() > 0


def test_merge_associativity(tmp_path):
    pairs, (codes, quals, lens, valid) = _load(
        tmp_path, min_len=8, max_len=70, n_prob=0.02, seed=15
    )
    whole = baseline.block_stats(codes, quals, lens, valid, kmers_on=True)
    merged = StatsCounters(kmers_on=True)
    for lo in range(0, codes.shape[0], 77):
        hi = min(lo + 77, codes.shape[0])
        merged.merge(
            baseline.block_stats(
                codes[lo:hi], quals[lo:hi], lens[lo:hi], valid[lo:hi], kmers_on=True
            )
        )
    assert merged.equals(whole)


def test_kmer_string_ids():
    assert spec.kmer_string(0) == "AAAAA"
    assert spec.kmer_string(1023) == "TTTTT"
    assert spec.kmer_string(1) == "AAAAC"
    assert spec.kmer_id(b"AAAAC") == 1
    assert spec.kmer_id(b"TTTTT") == 1023
    assert spec.kmer_id(b"AANAA") == -1
    # ids sort lexicographically
    strings = [spec.kmer_string(i) for i in range(64)]
    assert strings == sorted(strings)


def test_apply_trims(tmp_path):
    pairs, (codes, quals, lens, valid) = _load(tmp_path, min_len=10, max_len=40, seed=16)
    lt = np.minimum(3, lens).astype(np.int32)
    rt = np.minimum(2, lens - lt).astype(np.int32)
    nc, nq, nl = baseline.apply_trims(codes, quals, lens, lt, rt)
    for i, (s, q) in enumerate(pairs):
        n = int(nl[i])
        assert n == len(s) - int(lt[i]) - int(rt[i])
        np.testing.assert_array_equal(
            nq[i, :n], np.frombuffer(q, dtype=np.uint8)[int(lt[i]) : len(q) - int(rt[i])]
        )
