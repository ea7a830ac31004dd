"""Control-flow smoke for bench.py (CPU backend, tiny model).

Round-4 postmortem: the driver's bench run timed out inside an optional
phase AFTER all measurements finished, and the round recorded no metric
because the JSON line printed last. These tests pin the fix: the primary
metric line must print immediately after the timed run, optional phases can
only append an enriched second line, and an exhausted wall budget skips
fidelity rather than blocking the metric.

Marked tier2 (each subprocess pays ~40 s of CPU XLA compiles).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

TINY_ENV = {
    "KRON_BENCH_CPU": "1",
    "KRON_BENCH_N_COV": "32",
    "KRON_BENCH_N_LAMBDA": "32",
    "KRON_BENCH_N_QUERY": "16",
    "KRON_BENCH_N_TRAIN": "32",
    "KRON_BENCH_SEQ": "64",
    "KRON_BENCH_VOCAB": "512",
    "KRON_BENCH_LAYERS": "2",
    "KRON_BENCH_HEADS": "4",
    "KRON_BENCH_DMODEL": "64",
    "KRON_BENCH_COV_BATCH": "8",
    "KRON_BENCH_LAMBDA_BATCH": "8",
    "KRON_BENCH_QUERY_BATCH": "4",
    "KRON_BENCH_TRAIN_BATCH": "8",
}


def _run_bench(extra_env):
    env = dict(os.environ, **TINY_ENV, **extra_env)
    # The test conftest pins jax to CPU in THIS process; the subprocess picks
    # its backend from KRON_BENCH_CPU=1 (jax.config route, env vars alone are
    # ignored once the sitecustomize pre-imports jax).
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    records = [json.loads(l) for l in lines]
    for rec in records:
        assert rec["metric"] == "gpt2_wikitext_ekfac_pairwise_throughput"
        assert rec["value"] and rec["value"] > 0
    return records, proc.stderr


@pytest.mark.tier2
def test_metric_line_prints_before_fidelity_and_enriched_after():
    records, _ = _run_bench({"KRON_BENCH_BUDGET_S": "100000"})
    # Primary line first (no fidelity fields), enriched line after.
    assert len(records) == 2
    assert "pearson_lowp_fp32" not in records[0]
    assert "pearson_lowp_fp32" in records[1]
    assert records[1]["fidelity_scope"] in ("full_width", "one_block")
    # The enriched line is a superset of the primary record.
    for key, val in records[0].items():
        assert records[1][key] == val, key


@pytest.mark.tier2
def test_exhausted_budget_skips_fidelity_but_keeps_metric():
    # Also rides the KRON_BENCH_DAMPING=heuristic path (damping_factor=None
    # on both the timed and fp32 recipes) and a float budget value.
    records, stderr = _run_bench(
        {"KRON_BENCH_BUDGET_S": "1.5", "KRON_BENCH_DAMPING": "heuristic"}
    )
    assert len(records) == 1  # metric stands; no enriched line
    assert "pearson_lowp_fp32" not in records[0]
    assert "fidelity: skipped" in stderr
