"""Failure containment for the driver bench (VERDICT r4 #1).

Rounds 2 and 4 both shipped a bench that died with rc=1 and NO JSON record.
These tests run `python bench.py` as a real subprocess with injected faults
and assert that ONE parseable JSON line always comes out:
  - a fault on every attempt -> JSON with an "error" field (rc still 0);
  - a fault only while the slab kernel is enabled -> the supervisor's
    SMART_TREE_TPU_SLAB=0 retry succeeds and the JSON is labeled "fallback".
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _run_bench_subprocess(env_extra: dict) -> tuple[dict, int]:
    env = dict(os.environ)
    env.update(env_extra)
    env["SMART_TREE_BENCH_ATTEMPT_TIMEOUT"] = "570"
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--tiny", "--cpu"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, timeout=600,
    )
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.strip().startswith("{")
    ]
    assert json_lines, f"no JSON line in output:\n{proc.stdout}"
    return json.loads(json_lines[-1]), proc.returncode


def test_all_attempts_fail_still_emits_json():
    out, rc = _run_bench_subprocess({"SMART_TREE_BENCH_FAULT": "raise"})
    assert rc == 0  # the JSON line is the record; rc must not mask it
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in out, key
    assert "error" in out
    assert "default" in out["error"] and "slab-off" in out["error"]


@pytest.mark.slow
def test_slab_fault_falls_back_to_slab_off():
    out, rc = _run_bench_subprocess({"SMART_TREE_BENCH_FAULT": "slab"})
    assert rc == 0
    assert out.get("fallback") == "slab-off"
    assert out["value"] > 0
    assert out["device_points_per_sec"] > 0
    assert out["attempt_errors"], "first attempt's failure must be recorded"
