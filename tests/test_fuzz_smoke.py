"""Smoke tests for the config-space fuzzer machinery (tools/fuzz_configs.py):
one handcrafted round per command shape, so the fuzzer's oracle plumbing,
checkpoint-interrupt hook, and sharded arm stay green under the CPU suite.
The real randomized sweeps run from the CLI (`python tools/fuzz_configs.py`)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import fuzz_configs as fz  # noqa: E402


def _base_cfg(**kw):
    cfg = {
        "round": 0,
        "n": 400,
        "min_len": 40,
        "max_len": 90,
        "n_prob": 0.02,
        "lowercase_prob": 0.0,
        "wire": "off",
        "qn": "1",
        "batch_size": 64,
        "coalesce": 0,
        "paired": False,
        "kmers": False,
        "checkpoint": False,
        "sharded": False,
        "seed": 5,
    }
    cfg.update(kw)
    return cfg


def _run(cfg, crit_kw, filter_on):
    cfg["criteria"] = crit_kw
    cfg["filter_on"] = filter_on
    return fz._run_round(cfg, crit_kw, filter_on, fz.make_kw_of(cfg))


def test_stats_round():
    _run(_base_cfg(cmd="stats", kmers=True),
         {"min_read_quality": 18, "max_N": 2}, True)


def test_filter_checkpoint_interrupt_round():
    cfg = _base_cfg(cmd="filter", checkpoint=True, stop_after=2)
    _run(cfg, {"min_read_quality": 20, "max_read_length": 150}, True)
    assert cfg["interrupted"], "the rigged iterator should have fired"


def test_edit_round():
    _run(_base_cfg(cmd="edit"),
         {"left_length": 6, "min_left_quality": 25, "max_left_quality": 60},
         False)


def test_cgr_sharded_round():
    _run(_base_cfg(cmd="cgr", k=4, sharded=True, n=250), {}, False)
