"""bench.py truncation-guard contract (VERDICT r3 #1): a SIGALRM/SIGTERM at
ANY point — including before the first measurement — must still yield a
parsable final headline JSON line on stdout and a non-empty
``bench_phase_seconds`` dict on stderr.  BENCH_r03.json was empty because
the guard had nothing to emit; these tests pin the bounded
time-to-first-metric behavior on the CPU backend.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# run bench.py as __main__ with the CPU backend forced before jax init
# (the environment's sitecustomize pins the platform; env vars alone are
# not enough — see tests/conftest.py)
_WRAPPER = r"""
import runpy, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.argv = ["bench.py"] + sys.argv[1:]
runpy.run_path(%r, run_name="__main__")
""" % os.path.join(REPO, "bench.py")


def _run_bench(tmp_path, budget_s, reads=6000, timeout=240):
    env = dict(os.environ)
    env["HPGQ_BENCH_BUDGET_S"] = str(budget_s)
    env["HPGQ_BENCH_DIR"] = str(tmp_path / "benchdir")
    env["HPGQ_CHARTS"] = "off"
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", _WRAPPER, "--reads", str(reads),
         "--oracle-reads", "3000"],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    return r


def _last_stdout_json(r):
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert lines, "no stdout lines:\n%s\n%s" % (r.stdout, r.stderr[-2000:])
    return json.loads(lines[-1])


def _phase_dicts(r):
    out = []
    for ln in r.stderr.splitlines():
        try:
            obj = json.loads(ln)
        except ValueError:
            continue
        if "bench_phase_seconds" in obj:
            out.append(obj)
    return out


def test_bench_truncated_immediately(tmp_path):
    """Alarm fires ~1 s in (mid corpus-gen/bootstrap): the run must still
    end rc=0 with a parsable headline line and phase forensics naming the
    phase that was in flight."""
    r = _run_bench(tmp_path, budget_s=1)
    assert r.returncode == 0, r.stderr[-2000:]
    head = _last_stdout_json(r)
    assert head["metric"] == "stats_filter_reads_per_sec"
    assert "value" in head and "vs_baseline" in head
    phases = _phase_dicts(r)
    assert phases, r.stderr[-2000:]
    ph = phases[-1]["bench_phase_seconds"]
    assert ph, "phase dict must not be empty on truncation"
    # the in-flight phase is recorded with an @kill suffix unless the run
    # happened to be exactly between phases
    assert any(k for k in ph), ph


def test_bench_tiny_budget_completes_with_headline(tmp_path):
    """A short-but-workable budget on a tiny CPU corpus: the bootstrap
    registers a provisional headline early, so whether or not the alarm
    fires later, the final stdout line is a real measured headline."""
    r = _run_bench(tmp_path, budget_s=45, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    head = _last_stdout_json(r)
    assert head["metric"] == "stats_filter_reads_per_sec"
    assert head["value"] > 0, (head, r.stderr[-2000:])
    assert head["vs_baseline"] > 0
    assert head.get("qual_shape") == "rta3"
    phases = _phase_dicts(r)
    assert phases and phases[-1]["bench_phase_seconds"]


def test_h2d_history_seeded_floor(tmp_path):
    """link_degraded evidence must survive a lost/fresh .bench dir
    (it is gitignored): with NO history file, _h2d_history_update returns
    the checked-in measured floor, and degraded sessions can never raise
    the floor above a genuinely-measured best."""
    import importlib.util

    env_dir = str(tmp_path / "benchdir")
    os.environ["HPGQ_BENCH_DIR"] = env_dir
    try:
        spec = importlib.util.spec_from_file_location(
            "bench_for_floor", os.path.join(REPO, "bench.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        floor = mod._h2d_history_update(0.0)
        assert floor and floor >= 42.0
        # a degraded session records itself but cannot lower best-known
        mod._h2d_history_update(7.0)
        assert mod._h2d_history_update(0.0) == floor
        # a faster measured session raises it
        mod._h2d_history_update(100.0)
        assert mod._h2d_history_update(0.0) == 100.0
    finally:
        os.environ.pop("HPGQ_BENCH_DIR", None)
