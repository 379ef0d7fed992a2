"""TPU-gated guard for the Pallas-under-shard_map path (VERDICT r4 #8).

The sharded Pallas engine cannot run under this suite's CPU conftest
(interpret mode downgrades to jnp under a vary_axis — see
hpgq/kernels/stats_pallas.py), so the one code path that historically had
no CI coverage is exercised here in a SUBPROCESS against the real TPU:
one ShardedStatsSession batch with engine=pallas on a 1-device mesh,
compared field-by-field against the jnp engine on the same data.  Skips
cleanly when no TPU is reachable (CPU CI machines, dead tunnel).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = r"""
import jax
print(jax.devices()[0].platform)
"""

_RUN = r"""
import sys
sys.path.insert(0, %r)
import os
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(%r, ".bench", "jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()

sys.path.insert(0, os.path.join(%r, "tests"))
from gen import make_fastq
from hpgq.dist.mesh import data_mesh
from hpgq.dist.run_dist import ShardedStatsSession
from hpgq.io.fastq import FastqReader
from hpgq.io.packer import pack_block
from hpgq.options import FilterCriteria

import tempfile
fq = os.path.join(tempfile.mkdtemp(), "t.fq")
make_fastq(fq, 4096, min_len=100, max_len=100, n_prob=0.01, seed=41,
           qual_bins=(2, 12, 23, 37))
crit = FilterCriteria(min_read_quality=20, max_read_quality=60, max_N=2)
mesh = data_mesh(jax.devices()[:1])

def run(engine):
    # the sharded step resolves its engine from HPGQ_ENGINE (dist.mesh
    # make_sharded_stats_step -> stats_jnp.resolve_engine)
    os.environ["HPGQ_ENGINE"] = engine
    sess = ShardedStatsSession(mesh, 33, crit=crit, batch_reads=4096)
    with FastqReader(fq, batch_size=4096) as rd:
        for block in rd:
            sess.feed_packed(*pack_block(block, max_len=128,
                                         pad_reads_to=4096))
    return sess.finish()

cp = run("pallas")
cj = run("jnp")
assert cp.num_reads == cj.num_reads and cp.num_reads > 0
assert cp.num_passed == cj.num_passed and cp.num_failed == cj.num_failed
for f in ("num_As", "num_Cs", "num_Gs", "num_Ts", "num_Ns",
          "acc_length", "min_length", "max_length"):
    assert getattr(cp, f) == getattr(cj, f), f
for f in ("base_per_nt", "length_hist", "quality_hist", "gc_hist",
          "acc_quality_per_nt", "count_quality_per_nt"):
    np.testing.assert_array_equal(getattr(cp, f), getattr(cj, f), err_msg=f)
print("SHARDED_PALLAS_OK")
""" % (REPO, REPO, REPO)


def _tpu_reachable() -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE],
                           capture_output=True, text=True, timeout=90)
    except subprocess.SubprocessError:
        return False
    return r.returncode == 0 and r.stdout.strip().endswith("tpu")


def test_sharded_pallas_matches_jnp_on_tpu():
    if not _tpu_reachable():
        pytest.skip("no TPU reachable (CPU CI or dead tunnel)")
    try:
        r = subprocess.run([sys.executable, "-c", _RUN],
                           capture_output=True, text=True, timeout=540)
    except subprocess.TimeoutExpired:
        pytest.skip("TPU compile/run exceeded timeout (degraded tunnel)")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "SHARDED_PALLAS_OK" in r.stdout
