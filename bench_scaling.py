#!/usr/bin/env python
"""Scaling-efficiency harness: sharded stats throughput vs device count.

BASELINE protocol row "scaling efficiency >= 80% at >= 2 hosts": measures the
data-parallel sharded pipeline (shard_map per-device accumulation, one psum
merge) at 1..N devices and reports reads/s + efficiency vs linear scaling.

On a real pod slice run it once per topology (the mesh picks up all
addressable devices; multi-host via `jax.distributed`):

    python bench_scaling.py                     # all local devices

For a hardware-free functional check it can emulate N CPU devices:

    python bench_scaling.py --cpu-devices 8

Prints one JSON line per device count plus a final summary line:
    {"metric": "scaling_efficiency", "value": E, "unit": "fraction",
     "vs_baseline": E/0.8}
"""

import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# worker for the --two-process mode: ONE emulated CPU device per process,
# the real multi-host path (jax.distributed + byte-range input split +
# lockstep vote + psum merge) when nproc > 1.  Each pass re-runs the full
# production run_stats_sharded over the whole (per-host slice of the)
# corpus; pass 0 carries compile cost, so the parent scores later passes.
_WORKER = r"""
import json, os, sys, tempfile, time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1")
import jax

jax.config.update("jax_platforms", "cpu")
coord, pid, nproc, fq, repo, passes, benchdir = sys.argv[1:8]
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(benchdir, "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if int(nproc) > 1:
    jax.distributed.initialize(coord, int(nproc), int(pid))
sys.path.insert(0, repo)
from hpgq.options import StatsOptions
from hpgq.dist.run_dist import run_stats_sharded

from hpgq.utils.timers import StageTimers

dts, reads = [], 0
stages = []
outdir = tempfile.mkdtemp(prefix="hpgq_scal_")
for i in range(int(passes)):
    o = StatsOptions()
    o.in_filename = fq
    o.out_dirname = outdir
    o.quality_encoding_value = 33
    o.quality_encoding_name = "phred33"
    o.batch_size = 65536
    o.criteria.min_read_quality = 20
    o.criteria.max_read_quality = 60
    o.filter_on = True
    t = StageTimers()
    t0 = time.perf_counter()
    c = run_stats_sharded(o, t)
    dts.append(time.perf_counter() - t0)
    stages.append({k: round(v, 3) for k, v in sorted(t.totals.items())})
    reads = c.num_passed + c.num_failed  # psum'd: global totals
print(json.dumps({"pid": int(pid), "pass_seconds": dts, "reads": reads,
                  "stages": stages}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_two_process(reads: int, read_len: int, passes: int = 3) -> None:
    """Measured 1-process vs 2-process CPU lockstep scaling (VERDICT r3 #5
    — replaces the emulated-sharding-overhead number with a real
    multi-process run).

    Protocol: every JAX process is pinned to ONE distinct physical core
    (taskset) with ONE emulated CPU device and single-threaded pools, so
    adding a process adds exactly one core of compute.  Both
    configurations process the SAME corpus end-to-end through the
    production sharded pipeline (run_stats_sharded: byte-range split,
    lockstep shape vote, psum merge).  efficiency =
    rps(2 proc) / (2 * rps(1 proc)) — the BASELINE ">= 80% at >= 2
    hosts" row reads directly against this fraction: the residual is the
    real cost of the per-step collective + host load imbalance, measured,
    not emulated.

    Phase handling: this machine's CPU throughput swings ~10x on minute
    timescales (PERF.md).  Concurrent configs on disjoint cores were
    tried and rejected — hypervisor throttling splits unevenly across
    pinned cores, biasing whichever config holds more of them.  Instead
    the configs launch back-to-back in ROUNDS (adjacent seconds ≈ same
    phase, like the headline's interleave) and the reported efficiency
    is the median per-round ratio."""
    from bench import BENCH_DIR, corpus

    path = corpus(reads, read_len)
    here = os.path.dirname(os.path.abspath(__file__))
    # resolve the scratch dir the same way bench.py does (HPGQ_BENCH_DIR
    # override honored): a redirected bench run must not write inside the
    # repo checkout
    worker = os.path.join(BENCH_DIR, "scal_worker.py")
    os.makedirs(os.path.dirname(worker), exist_ok=True)
    with open(worker, "w") as f:
        f.write(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # one core per process means one thread per pool: otherwise the pinned
    # single-process run is oversubscribed by its own OpenMP packer /
    # transform-pool spin-waiting and the 2-proc number reads superlinear
    env.update({"HPGQ_PACK_THREADS": "1", "OMP_NUM_THREADS": "1",
                "HPGQ_READ_SHARDS": "1",
                # reference chart behavior (no silent matplotlib fallback
                # billing the workers ~2 s/report — see bench.py header)
                "HPGQ_CHARTS": os.environ.get("HPGQ_CHARTS", "gnuplot")})
    pin = shutil.which("taskset")

    def spawn(nproc, cores):
        coord = "localhost:%d" % _free_port()
        procs = []
        for i in range(nproc):
            cmd = [sys.executable, worker, coord, str(i), str(nproc),
                   path, here, str(passes), BENCH_DIR]
            if pin:
                cmd = [pin, "-c", str(cores[i])] + cmd
            procs.append(subprocess.Popen(
                cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                env=env, cwd=here))
        return procs

    def collect(procs):
        outs = []
        try:
            for p in procs:
                out, err = p.communicate(timeout=600)
                if p.returncode != 0:
                    raise RuntimeError("scaling worker failed: %s"
                                       % err.decode()[-1500:])
                outs.append(json.loads(out.decode().strip().splitlines()[-1]))
        finally:
            # a failed/hung rank must not leave its pinned-core lockstep
            # peers spinning until their own distributed timeout (and the
            # kills must be reaped — unwaited children stay zombies for
            # the rest of the run)
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    try:
                        p.wait(timeout=10)
                    except Exception:
                        pass
        n = outs[0]["reads"]
        # per-pass wall = slowest process (lockstep); skip pass 0 (compile)
        walls = [max(o["pass_seconds"][p] for o in outs)
                 for p in range(1, passes)]
        stg = outs[0].get("stages")
        if stg:
            print(json.dumps({"nproc": len(outs), "walls": [round(w, 3)
                              for w in walls], "stages_best": stg[-1]}),
                  file=sys.stderr)
        return n / min(walls)

    effs = []
    rounds = int(os.environ.get("HPGQ_SCALING_ROUNDS", "3"))
    # budget-aware: the caller (bench.py) runs this under a hard timeout —
    # settling for fewer completed rounds beats a timeout kill that loses
    # the metric line entirely
    budget = float(os.environ.get("HPGQ_SCALING_BUDGET_S", "0") or 0)
    t_start = time.perf_counter()
    last_round = 0.0
    for rnd in range(rounds):
        if (effs and budget
                and time.perf_counter() - t_start + last_round > budget):
            break
        t0 = time.perf_counter()
        r1 = collect(spawn(1, [0]))
        r2 = collect(spawn(2, [0, 1]))
        last_round = time.perf_counter() - t0
        effs.append(r2 / (2.0 * r1))
        print(json.dumps({"round": rnd, "rps_1proc": round(r1, 1),
                          "rps_2proc": round(r2, 1),
                          "eff": round(effs[-1], 4),
                          "pinned": bool(pin)}), file=sys.stderr)
    eff = sorted(effs)[len(effs) // 2]
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 4),
        "unit": "fraction@2proc",
        "mode": "2-process-lockstep",
        "vs_baseline": round(eff / 0.8, 3),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=200_000)
    ap.add_argument("--len", dest="read_len", type=int, default=100)
    ap.add_argument("--batch-reads", type=int, default=65_536)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="emulate N CPU devices (0 = use real devices)")
    ap.add_argument("--two-process", action="store_true",
                    help="measured 1-proc vs 2-proc CPU lockstep scaling "
                         "(one pinned core per process) instead of the "
                         "emulated device mesh")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    if args.two_process:
        run_two_process(args.reads, args.read_len, passes=max(4, args.passes))
        return

    if args.cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=%d" % args.cpu_devices
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np

    from bench import corpus, CRIT, PHRED
    from hpgq.dist.mesh import data_mesh
    from hpgq.dist.run_dist import ShardedStatsSession
    from hpgq.io.fastq import FastqReader
    from hpgq.io.packer import pack_block

    path = corpus(args.reads, args.read_len)
    all_devices = jax.devices()

    # pre-pack once: the scaling metric isolates the device-side pipeline
    batches = []
    with FastqReader(path, batch_size=args.batch_reads) as rd:
        for block in rd:
            batches.append(pack_block(block, max_len=128,
                                      pad_reads_to=args.batch_reads))

    def run(ndev: int) -> float:
        mesh = data_mesh(all_devices[:ndev])
        best = 0.0
        for _ in range(args.passes + 1):  # first pass = compile warmup
            sess = ShardedStatsSession(
                mesh, PHRED, crit=CRIT, batch_reads=args.batch_reads
            )
            t0 = time.perf_counter()
            for packed in batches:
                sess.feed_packed(*packed)
            c = sess.finish()
            dt = time.perf_counter() - t0
            assert c.num_reads + c.num_failed == args.reads, (
                c.num_reads, c.num_failed
            )
            best = max(best, args.reads / dt)
        return best

    counts = []
    n = 1
    while n <= len(all_devices):
        counts.append(n)
        n *= 2
    if counts[-1] != len(all_devices):
        counts.append(len(all_devices))

    results = {}
    for ndev in counts:
        rps = run(ndev)
        results[ndev] = rps
        print(json.dumps({
            "devices": ndev,
            "reads_per_sec": round(rps, 1),
            "speedup": round(rps / results[counts[0]], 3),
        }), file=sys.stderr)

    nmax = counts[-1]
    if args.cpu_devices:
        # emulated devices share ONE physical core pool: the 1-device run
        # already uses every core (XLA's intra-op threadpool), so ideal
        # "scaling" is flat wall-time, not Nx.  The honest emulated metric
        # is SHARDING OVERHEAD: how close the N-way sharded run (same
        # total work, same cores) stays to the 1-device run.  1.0 = the
        # shard_map partitioning + collective merge cost nothing; on real
        # N-chip hardware (cpu_devices=0) the classic fraction-of-linear
        # efficiency is reported instead.
        # can exceed 1 when sharding parallelizes better than the single
        # fused kernel does across the host cores; clamp — "no overhead"
        # is the ceiling of what this mode claims
        eff = min(1.0, results[nmax] / results[1]) if nmax > 1 else 1.0
        mode = "emulated-sharding-overhead"
    else:
        eff = results[nmax] / (results[1] * nmax) if nmax > 1 else 1.0
        mode = "hardware"
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 4),
        "unit": "fraction@%dx" % nmax,
        "mode": mode,
        "vs_baseline": round(eff / 0.8, 3),
    }))


if __name__ == "__main__":
    main()
