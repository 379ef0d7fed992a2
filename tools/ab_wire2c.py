"""On-device A/B of the 2c wire tier (2-bit codes + 2-bit qual palette +
exception sidecar, ~4.1 bits/base) vs the 2q palette tier (5 bits/base):
the stats+filter engine with HPGQ_WIRE2C=1 (default) vs =0, on an
RTA3-binned corpus where both palette tiers fit.

    python tools/ab_wire2c.py [--reads N] [--rounds R]   # default 1M x 3

Prints one JSON line per round and a best-same-round summary, plus the
deterministic wire-bytes ratio (the phase-independent part of the win).
Arms are interleaved off/on within each round so both see the same
tunnel/machine phase.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1_000_000)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from hpgq.utils.compile_cache import enable

    enable()
    import jax

    from gen import make_fastq
    from hpgq.options import FilterCriteria, StatsOptions
    from hpgq.pipeline.run import run_stats

    print("backend:", jax.default_backend(), flush=True)
    os.makedirs(".bench", exist_ok=True)
    os.environ.setdefault("HPGQ_CHARTS", "gnuplot")  # bench protocol
    fq = os.path.join(".bench", "ab2c_%d_rta3.fq" % args.reads)
    if not os.path.exists(fq):
        make_fastq(fq, args.reads, min_len=100, max_len=100, n_prob=0.005,
                   seed=31, qual_bins=(2, 12, 23, 37))

    # deterministic part: wire bytes per read, both tiers
    from hpgq.io.fastq import FastqReader
    from hpgq.io.packer import (
        round_up,
        try_pack_block_2c,
        try_pack_block_palette,
        wire_len,
    )

    with FastqReader(fq, batch_size=131072) as rd:
        first = next(iter(rd))
    wl = wire_len(first.max_len(), round_up(first.max_len(), 128))
    p2c = try_pack_block_2c(first, wl)
    p2q = try_pack_block_palette(first, wl)
    assert p2c is not None and p2q is not None
    b2c = (p2c[0].nbytes + p2c[1].nbytes) / first.num_reads
    b2q = p2q.nbytes / first.num_reads
    print(json.dumps({"wire_bytes_per_read_2c": round(b2c, 2),
                      "wire_bytes_per_read_2q": round(b2q, 2),
                      "bytes_ratio_2q_vs_2c": round(b2q / b2c, 3)}),
          flush=True)

    import shutil
    import tempfile

    crit = FilterCriteria(min_read_length=50, max_read_length=200,
                          min_read_quality=20, max_read_quality=60, max_N=2)

    def one(on: bool) -> float:
        os.environ["HPGQ_WIRE2C"] = "1" if on else "0"
        tmp = tempfile.mkdtemp(prefix="ab2c_")
        try:
            o = StatsOptions()
            o.in_filename = fq
            o.out_dirname = tmp
            o.quality_encoding_value = 33
            o.quality_encoding_name = "phred33"
            o.criteria = dataclasses.replace(crit)
            o.filter_on = True
            t0 = time.perf_counter()
            run_stats(o)
            return args.reads / (time.perf_counter() - t0)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            del os.environ["HPGQ_WIRE2C"]

    one(True)  # jit warmup
    one(False)
    pairs = []
    for r in range(args.rounds):
        off = one(False)
        on = one(True)
        pairs.append((on, off))
        print(json.dumps({"round": r, "wire2c_off_reads_per_sec": round(off),
                          "wire2c_on_reads_per_sec": round(on),
                          "ratio_on_vs_off": round(on / off, 3)}), flush=True)
    best = max(pairs, key=lambda p: p[0] / p[1])
    print(json.dumps({
        "summary": "wire2c_ab", "rounds": args.rounds,
        "best_same_round_speedup": round(best[0] / best[1], 3),
        "per_round": [round(a / b, 3) for a, b in pairs],
        "bytes_ratio_2q_vs_2c": round(b2q / b2c, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
