"""On-device A/B of the adaptive 6-bit-qual wire (bitpack6): the stats
engine with HPGQ_WIRE6=1 (default — 9 bits/base + per-row qbase when every
row's qual range fits 6 bits) vs HPGQ_WIRE6=0 (plain 7-bit bitpack,
10 bits/base).

    python tools/ab_wire6.py [--reads N] [--rounds R]   # default 1M x 3

Prints one JSON line per (round, arm) and a best-same-round summary.
Tunnel/machine phases are noisy — arms are interleaved off/on/off/on within
each round so both see the same phase; the summary's speedup is the best
SAME-ROUND on/off pair (and the per-round list shows the spread).
"""

import argparse
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
    ap.add_argument("--binned", action="store_true",
                    help="RTA3 4-level binned quals: the adaptive ladder "
                         "takes the 2-bit palette tier instead of 6-bit")
    args = ap.parse_args()

    from hpgq.utils.compile_cache import enable

    enable()
    import jax

    from gen import make_fastq
    from hpgq.options import StatsOptions
    from hpgq.pipeline.run import run_stats

    print("backend:", jax.default_backend(), flush=True)
    os.makedirs(".bench", exist_ok=True)
    os.environ.setdefault("HPGQ_CHARTS", "gnuplot")  # bench protocol
    fq = os.path.join(".bench", "abw6_%d%s.fq"
                      % (args.reads, "_rta3" if args.binned else ""))
    if not os.path.exists(fq):
        make_fastq(fq, args.reads, min_len=60, max_len=160, n_prob=0.005,
                   seed=29,
                   qual_bins=(2, 12, 23, 37) if args.binned else None)

    import shutil
    import tempfile

    def one(wire6_on: bool) -> float:
        os.environ["HPGQ_WIRE6"] = "1" if wire6_on else "0"
        tmp = tempfile.mkdtemp(prefix="abw6_")
        try:
            o = StatsOptions()
            o.in_filename = fq
            o.out_dirname = tmp
            o.quality_encoding_value = 33
            o.quality_encoding_name = "phred33"
            t0 = time.perf_counter()
            run_stats(o)
            return args.reads / (time.perf_counter() - t0)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            del os.environ["HPGQ_WIRE6"]

    one(True)  # jit warmup (both widths share everything but the decode)
    one(False)
    pairs = []
    for r in range(args.rounds):
        off = one(False)
        on = one(True)
        pairs.append((on, off))
        print(json.dumps({"round": r, "wire6_off_reads_per_sec": round(off),
                          "wire6_on_reads_per_sec": round(on),
                          "ratio_on_vs_off": round(on / off, 3)}), flush=True)
    best = max(pairs, key=lambda p: p[0] / p[1])
    print(json.dumps({
        "summary": "wire6_ab", "rounds": args.rounds,
        "best_same_round_speedup": round(best[0] / best[1], 3),
        "per_round": [round(a / b, 3) for a, b in pairs],
    }), flush=True)


if __name__ == "__main__":
    main()
