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
