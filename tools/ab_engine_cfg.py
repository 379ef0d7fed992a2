#!/usr/bin/env python
"""Engine configuration A/B on the 1M corpus: shard count x batch size,
interleaved round-robin so every config samples every phase.  Finds where
the per-pass wall goes (the stage breakdown says read/pack/h2d/compute
are each >=5M reads/s, yet a pass is ~2 s)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from bench import corpus, _engine_pass_factory


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    path = corpus(args.reads, 100)
    cfgs = [
        ("sh4_b131", {"HPGQ_READ_SHARDS": "4"}, 131072),
        ("sh8_b131", {"HPGQ_READ_SHARDS": "8"}, 131072),
        ("sh4_b262", {"HPGQ_READ_SHARDS": "4"}, 262144),
        ("sh2_b262", {"HPGQ_READ_SHARDS": "2"}, 262144),
    ]
    # snapshot the ORIGINAL environment before any config mutates it —
    # per-config snapshots taken mid-loop record the previous config's
    # values and the restore loop then leaves mid-run overrides behind
    all_keys = sorted({k for _, env, _ in cfgs for k in env})
    saved = {k: os.environ.get(k) for k in all_keys}
    passes = {}
    for name, env, br in cfgs:
        os.environ.update(env)
        one = _engine_pass_factory(path, br, br)
        t0 = time.perf_counter()
        one()  # warmup/compile
        print(json.dumps({"cfg": name,
                          "warmup_s": round(time.perf_counter() - t0, 2)}),
              flush=True)
        passes[name] = (one, env)
    for r in range(args.rounds):
        row = {"round": r}
        for name, env, br in cfgs:
            one, e = passes[name]
            os.environ.update(e)
            t0 = time.perf_counter()
            n = one()
            row[name] = round(n / (time.perf_counter() - t0))
        print(json.dumps(row), flush=True)
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


if __name__ == "__main__":
    main()
