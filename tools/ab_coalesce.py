"""On-device A/B of dispatch coalescing at the reference's default
--batch-size 10000 (explicitly set): HPGQ_COALESCE=0 vs auto (131072).

    python tools/ab_coalesce.py [--reads N]   # default 500k

Prints one JSON line per arm ({"arm", "reads_per_sec", "dispatches"}) and
the speedup.  Tunnel phases are noisy — arms are interleaved A/B/A/B and
the best per-arm round is reported alongside the per-round pairs.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=500_000)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from hpgq.utils.compile_cache import enable

    enable()
    import jax

    from gen import make_fastq
    from hpgq.options import StatsOptions
    from hpgq.pipeline.run import run_stats
    from hpgq.utils.timers import StageTimers

    print("backend:", jax.default_backend(), flush=True)
    fq = os.path.join(".bench", "abco_%d.fq" % args.reads)
    os.makedirs(".bench", exist_ok=True)
    if not os.path.exists(fq):
        make_fastq(fq, args.reads, min_len=100, max_len=100, n_prob=0.005,
                   seed=11)

    def one(coalesce: int):
        os.environ["HPGQ_COALESCE"] = str(coalesce)
        try:
            o = StatsOptions()
            o.in_filename = fq
            o.out_dirname = tempfile.mkdtemp(prefix="abco_")
            o.quality_encoding_value = 33
            o.quality_encoding_name = "phred33"
            o.batch_size = 10000
            o.batch_size_set = True
            t = StageTimers()
            t0 = time.perf_counter()
            run_stats(o, t, report=False)
            dt = time.perf_counter() - t0
            return args.reads / dt, t.num_batches
        finally:
            del os.environ["HPGQ_COALESCE"]

    best = {"off": 0.0, "auto": 0.0}
    for r in range(args.rounds):
        for arm, co in (("off", 0), ("auto", 131072)):
            rps, nb = one(co)
            best[arm] = max(best[arm], rps)
            print(json.dumps({"round": r, "arm": arm,
                              "reads_per_sec": round(rps),
                              "dispatches": nb}), flush=True)
    print(json.dumps({"best_off": round(best["off"]),
                      "best_auto": round(best["auto"]),
                      "speedup": round(best["auto"] / max(best["off"], 1e-9),
                                       2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
