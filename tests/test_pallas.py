"""Differential tests: Pallas fused stats kernel vs the jnp engine.

Runs the Pallas kernel in interpreter mode on CPU (tests execute on the
8-virtual-device CPU backend, see conftest); on real TPU the same kernel
compiles via Mosaic.  Integer fields must match exactly; the f32
``acc_quality`` sum differs only by tile summation order.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hpgq.constants import PHRED33
from hpgq.kernels import stats_jnp
from hpgq.kernels.stats_pallas import TB, batch_partials_pallas, make_batch_partials
from hpgq.options import FilterCriteria


def _rand_batch(B, L, seed=0, with_n=True, varlen=True):
    rng = np.random.default_rng(seed)
    lens = (
        rng.integers(1, L + 1, size=B) if varlen else np.full(B, L)
    ).astype(np.int32)
    codes = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    if with_n:
        codes[rng.random((B, L)) < 0.02] = 4
    pos = np.arange(L)[None, :]
    codes = np.where(pos < lens[:, None], codes, np.int8(5))
    quals = np.where(
        pos < lens[:, None], rng.integers(33, 74, size=(B, L)), 0
    ).astype(np.uint8)
    valid = rng.random(B) < 0.9
    return codes, quals, lens, valid


CRIT = FilterCriteria(
    min_read_length=10, max_read_length=100,
    min_read_quality=5, max_read_quality=45,
    left_length=8, min_left_quality=10, max_left_quality=60,
    right_length=8, min_right_quality=10, max_right_quality=60,
    max_out_of_quality=30, max_N=3,
)
# [D8] legacy quality position window active (screens see [12, 60) only)
WCRIT = __import__("dataclasses").replace(
    CRIT, begin_quality_nt=12, end_quality_nt=60)

INT_KEYS = (
    "num_reads", "acc_length", "min_length", "max_length", "base_totals",
    "length_hist", "quality_hist", "gc_hist", "cov_per_nt", "qual_per_nt",
    "base_per_nt",
)


def _compare(p_jnp, p_pal, valid_count):
    for k in INT_KEYS:
        np.testing.assert_array_equal(
            np.asarray(p_jnp[k]), np.asarray(p_pal[k]), err_msg=k
        )
    if valid_count:
        np.testing.assert_allclose(
            float(p_pal["acc_quality"]), float(p_jnp["acc_quality"]), rtol=1e-3
        )


@pytest.mark.parametrize("crit", [None, CRIT, WCRIT],
                         ids=["plain", "filtered", "qwindow"])
@pytest.mark.parametrize("B,L", [(TB, 128), (TB * 3, 128), (100, 256)])
def test_partials_match_jnp(B, L, crit):
    lcap = max(L, 128)
    codes, quals, lens, valid = _rand_batch(B, L, seed=B + L)
    if crit is not None:
        ok = np.asarray(stats_jnp.verdicts(codes, quals, lens, crit, PHRED33))
        sel = valid & ok
    else:
        sel = valid
    p_jnp = stats_jnp.batch_partials(codes, quals, lens, sel, lcap, PHRED33)
    p_pal = batch_partials_pallas(
        codes, quals, lens, valid, lcap, PHRED33, crit, interpret=True
    )
    if crit is not None:
        assert int(p_pal["_num_passed"]) == int(sel.sum())
        assert int(p_pal["_num_failed"]) == int((valid & ~ok).sum())
    _compare(p_jnp, p_pal, int(sel.sum()))


def test_all_invalid_rows():
    codes, quals, lens, _ = _rand_batch(TB, 128, seed=3)
    valid = np.zeros(TB, dtype=bool)
    p = batch_partials_pallas(codes, quals, lens, valid, 128, PHRED33, None,
                              interpret=True)
    assert int(p["num_reads"]) == 0
    assert int(p["max_length"]) == 0
    assert int(np.asarray(p["length_hist"]).sum()) == 0


def test_lcap_larger_than_l():
    codes, quals, lens, valid = _rand_batch(64, 128, seed=5)
    lcap = 384
    p_jnp = stats_jnp.batch_partials(codes, quals, lens, valid, lcap, PHRED33)
    p_pal = batch_partials_pallas(codes, quals, lens, valid, lcap, PHRED33,
                                  None, interpret=True)
    _compare(p_jnp, p_pal, int(valid.sum()))


def test_kmers_ride_along():
    codes, quals, lens, valid = _rand_batch(TB, 128, seed=9)
    fn = make_batch_partials(128, PHRED33, kmers_on=True, crit=None,
                             interpret=True)
    p = fn(codes, quals, jnp.asarray(lens), jnp.asarray(valid))
    p_jnp = stats_jnp.batch_partials(codes, quals, lens, valid, 128, PHRED33,
                                     kmers_on=True)
    np.testing.assert_array_equal(
        np.asarray(p["kmer_counts"]), np.asarray(p_jnp["kmer_counts"])
    )
    np.testing.assert_array_equal(
        np.asarray(p["kmer_per_nt"]), np.asarray(p_jnp["kmer_per_nt"])
    )


@pytest.mark.parametrize("crit", [None, CRIT, WCRIT],
                         ids=["plain", "filtered", "qwindow"])
@pytest.mark.parametrize("B,L,lcap", [
    (TB, 4608, 4608),      # just past the single-block limit
    (100, 8192, 8192),     # padded batch rows + 512-lane blocks
    (64, 4608, 8192),      # lcap wider than the batch L
])
def test_blockwise_long_matches_jnp(B, L, lcap, crit):
    """Blockwise-L kernel (lcap > 4096) vs the jnp engine at long-read
    lengths — the SURVEY §5 long-context row (VERDICT r1 #5)."""
    from hpgq.kernels.stats_pallas import batch_partials_pallas_long

    codes, quals, lens, valid = _rand_batch(B, L, seed=B + L)
    if crit is not None:
        ok = np.asarray(stats_jnp.verdicts(codes, quals, lens, crit, PHRED33))
        sel = valid & ok
    else:
        sel = valid
    p_jnp = stats_jnp.batch_partials(codes, quals, lens, sel, lcap, PHRED33)
    p_pal = batch_partials_pallas_long(
        codes, quals, lens, valid, lcap, PHRED33, crit, interpret=True
    )
    if crit is not None:
        assert int(p_pal["_num_passed"]) == int(sel.sum())
        assert int(p_pal["_num_failed"]) == int((valid & ~ok).sum())
    np.testing.assert_array_equal(np.asarray(p_pal["_passed_mask"]), sel)
    _compare(p_jnp, p_pal, int(sel.sum()))


def test_blockwise_long_max_sentinel_no_overflow():
    """Reads longer than ~21474 nt with an unset max quality threshold
    (substituted MAX sentinel 100000): the sentinel multiply would wrap
    int32 and fail every read — the kernel must skip the vacuous check
    (mirrors stats_jnp.verdicts' guard)."""
    from hpgq.kernels.stats_pallas import batch_partials_pallas_long

    L = 24576
    B = 32
    # only a MIN threshold set -> max_read_quality substitutes to 100000
    crit = FilterCriteria(min_read_quality=5)
    rng = np.random.default_rng(77)
    lens = np.full(B, L, np.int32)  # every read deep in overflow range
    codes = rng.integers(0, 4, size=(B, L)).astype(np.int8)
    quals = rng.integers(40, 70, size=(B, L)).astype(np.uint8)
    valid = rng.random(B) < 0.9
    ok = np.asarray(stats_jnp.verdicts(codes, quals, lens, crit, PHRED33))
    assert ok[valid].all()  # sanity: quals >= 33 pass min_quality=5
    p = batch_partials_pallas_long(codes, quals, lens, valid, L, PHRED33,
                                   crit, interpret=True)
    assert int(p["_num_passed"]) == int(valid.sum())
    assert int(p["_num_failed"]) == 0
    np.testing.assert_array_equal(np.asarray(p["_passed_mask"]), valid)


def test_blockwise_long_via_make_stats_step():
    """lcap > 4096 keeps the pallas engine (no silent jnp fallback) and
    matches the jnp step."""
    L = 4608
    codes, quals, lens, valid = _rand_batch(TB, L, seed=31)
    step_j = stats_jnp.make_stats_step(L, PHRED33, crit=CRIT, jit=False,
                                       engine="jnp")
    step_p = stats_jnp.make_stats_step(L, PHRED33, crit=CRIT, jit=False,
                                       engine="pallas_interpret")
    acc_j = step_j(stats_jnp.zero_partials(L), codes, quals, lens, valid)
    acc_p = step_p(stats_jnp.zero_partials(L), codes, quals, lens, valid)
    for k in INT_KEYS + ("num_passed", "num_failed"):
        np.testing.assert_array_equal(
            np.asarray(acc_j[k]), np.asarray(acc_p[k]), err_msg=k
        )


def test_stats_step_engine_pallas_end_to_end():
    """Full step contract through make_stats_step(engine='pallas_interpret')."""
    codes, quals, lens, valid = _rand_batch(TB * 2, 128, seed=11)
    for crit in (None, CRIT):
        acc_j = stats_jnp.zero_partials(128)
        acc_p = stats_jnp.zero_partials(128)
        step_j = stats_jnp.make_stats_step(128, PHRED33, crit=crit, jit=False,
                                           engine="jnp")
        step_p = stats_jnp.make_stats_step(128, PHRED33, crit=crit, jit=False,
                                           engine="pallas_interpret")
        for s in (0, TB):
            sl = slice(s, s + TB)
            acc_j = step_j(acc_j, codes[sl], quals[sl], lens[sl], valid[sl])
            acc_p = step_p(acc_p, codes[sl], quals[sl], lens[sl], valid[sl])
        for k in INT_KEYS + (("num_passed", "num_failed") if crit else ()):
            np.testing.assert_array_equal(
                np.asarray(acc_j[k]), np.asarray(acc_p[k]), err_msg=k
            )
        np.testing.assert_allclose(
            float(acc_p["acc_quality"]), float(acc_j["acc_quality"]), rtol=1e-3
        )


def test_fused4_wire_through_pallas_engine():
    """The production-default TPU combination (fused4 wire + pallas engine),
    exercised via interpret mode on CPU."""
    from hpgq.kernels.stats_jnp import (
        make_stats_step,
        wire_fuse,
        zero_partials,
    )

    codes, quals, lens, valid = _rand_batch(TB, 128, seed=21)
    buf = wire_fuse(codes, quals, lens, valid)
    for crit in (None, CRIT):
        ref = stats_jnp.make_stats_step(128, PHRED33, crit=crit, jit=False,
                                        engine="jnp")(
            zero_partials(128), codes, quals, lens, valid
        )
        got = make_stats_step(128, PHRED33, crit=crit, jit=False,
                              engine="pallas_interpret", wire="fused4")(
            zero_partials(128), buf
        )
        for k in INT_KEYS:
            np.testing.assert_array_equal(
                np.asarray(ref[k]), np.asarray(got[k]), err_msg=k
            )
        np.testing.assert_allclose(
            float(got["acc_quality"]), float(ref["acc_quality"]), rtol=1e-3
        )
