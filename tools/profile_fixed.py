#!/usr/bin/env python
"""Per-pass fixed-cost + gz-overhead measurement: runs the single-end
stats+filter engine over several corpus sizes (and the gz/bgzf twins of
the big one) back to back, printing seconds per pass.  The linear fit of
seconds vs reads separates marginal rate from flat per-pass cost."""

import dataclasses
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CRIT, PHRED, bgzf_corpus, corpus, gz_corpus
from hpgq.options import StatsOptions
from hpgq.pipeline.run import run_stats
from hpgq.utils.timers import StageTimers


def one(path, tmp, batch=131072):
    o = StatsOptions()
    o.in_filename = path
    o.out_dirname = tmp
    o.quality_encoding_value = PHRED
    o.quality_encoding_name = "phred33"
    o.batch_size = batch
    o.device_batch_reads = batch
    o.criteria = dataclasses.replace(CRIT)
    o.filter_on = True
    t = StageTimers()
    t0 = time.perf_counter()
    c = run_stats(o, t)
    dt = time.perf_counter() - t0
    n = c.num_passed + c.num_failed
    return {"reads": n, "s": round(dt, 3), "rps": round(n / dt, 1),
            "stages": {k: round(v, 3) for k, v in sorted(t.totals.items())}}


def main():
    tmp = tempfile.mkdtemp(prefix="hpgq_proffix_")
    p1m = corpus(1_000_000, 100)
    p200 = corpus(200_000, 100)
    p50 = corpus(50_000, 100)
    one(p50, tmp)  # warmup/compile
    for rnd in range(2):
        r = {"round": rnd}
        for tag, p in (("50k", p50), ("200k", p200), ("1m", p1m),
                       ("gz1m", gz_corpus(p1m)), ("bgz1m", bgzf_corpus(p1m))):
            r[tag] = one(p, tmp)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
