"""bench.py robustness: the driver metric must emit exactly one
parseable JSON line on every path (VERDICT r4 item 1 — the r4 round
ended rc=1 with a raw RESOURCE_EXHAUSTED traceback and parsed: null)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env: dict) -> tuple[int, dict]:
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        SUPER_RAG_FORCE_CPU="1",
        PYTHONPATH=f"{ROOT}:{os.environ.get('PYTHONPATH', '')}",
        **extra_env,
    )
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=ROOT,
    )
    lines = [ln for ln in p.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {p.stdout!r}"
    return p.returncode, json.loads(lines[0])


def test_clean_run_emits_metric():
    rc, out = _run_bench({})
    assert rc == 0
    assert out["unit"] == "queries/sec"
    assert out["value"] > 0
    assert out["extra"]["fallback_rung"] == 0
    assert out["extra"]["dense_recall_at_10_vs_exact_fp32"] > 0.9


def test_ladder_falls_back_and_still_measures():
    rc, out = _run_bench({"BENCH_FAULT_RUNGS": "0,1"})
    assert rc == 0
    assert out["value"] > 0
    assert out["extra"]["fallback_rung"] == 2
    assert out["extra"]["rescore"] is False
    assert len(out["extra"]["fallback_errors"]) == 2


def test_all_rungs_failing_emits_honest_zero():
    rc, out = _run_bench({"BENCH_FAULT_RUNGS": "0,1,2,3,4"})
    assert rc == 0
    assert out["value"] == 0.0
    assert out["vs_baseline"] == 0.0
    assert out["error"]
