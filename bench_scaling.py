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
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=200_000)
    ap.add_argument("--len", dest="read_len", type=int, default=100)
    ap.add_argument("--batch-reads", type=int, default=65_536)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="emulate N CPU devices (0 = use real devices)")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

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
