"""bench.py is driver-critical: smoke-test it end-to-end at tiny scale."""

import json
import os
import sys


def test_bench_main_tiny(tmp_path, monkeypatch, capsys):
    import bench
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "bench.py", "--points", "200", "--max-points", "256",
        "--capacity", "2048", "--frames", "2", "--iters", "1"])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    result = json.loads(out)
    assert result["unit"] == "points/sec/chip"
    assert result["value"] > 0
    assert "vs_baseline" in result
    details = json.load(open(tmp_path / "bench_details.json"))
    assert details["frames"] == 2


def test_bench_budget_guard_never_hangs(tmp_path):
    """VERDICT r3 item 1 regression: with an exhausted budget the bench
    must still terminate promptly by itself -- rc 0 with a valid headline
    JSON line (fallback emitted) or rc 3 (nothing measurable yet), never a
    hang for an external `timeout` to SIGKILL (the r3 failure mode).

    Run as a subprocess (the watchdog os._exit's the process) on the CPU
    backend with a COLD compile cache so the budget genuinely expires
    inside a compile."""
    import subprocess
    import time

    env = dict(os.environ)
    env["TLN_BENCH_BUDGET_S"] = "1"
    env["TLN_COMPILE_CACHE_DIR"] = str(tmp_path / "cold_cache")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "bench.py"),
         "--cpu", "--points", "200", "--max-points", "256",
         "--capacity", "2048", "--frames", "2", "--iters", "1"],
        env=env, cwd=tmp_path, capture_output=True, text=True, timeout=240)
    took = time.time() - t0
    assert proc.returncode in (0, 3), (proc.returncode, proc.stderr[-500:])
    if proc.returncode == 0:
        lines = [l for l in proc.stdout.strip().splitlines()
                 if l.startswith("{")]
        assert lines, proc.stdout
        result = json.loads(lines[-1])
        assert result["unit"] == "points/sec/chip"
    # the watchdog fired (or the run finished) well before any external
    # timeout would have had to step in
    assert took < 200, took
