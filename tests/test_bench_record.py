"""The bench result line must survive the driver's 2000-char-tail
parse — the contract that silently orphaned round 4's record
(BENCH_r04.parsed: null).  These tests feed bench.emit_result a result
dict FATTER than the one that broke (real r4-shaped stage lists, probe
arrays, host ceilings) and assert the printed line still parses out of
the simulated tail with the gate numbers intact."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

import bench  # noqa: E402
from check_record import TAIL_CHARS, parse_driver_tail  # noqa: E402


def _fat_stage_list(n: int) -> list[dict]:
    return [
        {"stage": f"{i:02d}_stage_name_{i}", "secs": round(1.234 + i, 2),
         "rows": 120000 + i}
        for i in range(n)
    ]


def _fat_result() -> dict:
    """A result dict strictly larger than the one that broke round 4:
    full stage breakdowns on every leg, 7 scaling pairs with all probe
    arrays, right_sizing with its own stage list, host ceilings."""
    pairs = 7
    return {
        "metric": "e2e_dedup_secs",
        "value": 20.32,
        "unit": "sec",
        "queries": {f"q_headline_query_number_{i}": round(0.47 + i, 2)
                    for i in range(8)},
        "sf": 0.1,
        "pages": 120000,
        "cpus": 32,
        "docs_per_sec": 5904.9,
        "stages": _fat_stage_list(9),
        "recall": 1.0,
        "precision": 1.0,
        "scaling": {
            "cpus_low": 1, "cpus_high": 4, "pages": 180000,
            "secs_low": 231.4, "secs_high": 63.1,
            "runs_low_secs": [231.4 + i for i in range(pairs)],
            "runs_high_secs": [63.1 + i for i in range(pairs)],
            "loadavg_low": [2.1] * pairs, "loadavg_high": [1.7] * pairs,
            "cpu_probe_low": [5.59] * pairs, "cpu_probe_high": [6.11] * pairs,
            "dram_probe_low": [22.0] * pairs, "dram_probe_high": [20.5] * pairs,
            "docs_per_sec_low": 777.9, "docs_per_sec_high": 2852.6,
            "pair_efficiencies": [0.658, 0.747, 0.846, 0.872, 0.908, 0.94, 0.989],
            "efficiency_all_pairs": 0.872,
            "least_contended_pair_efficiency": 0.94,
            "uncontended_pair_efficiencies": [0.846, 0.908, 0.917, 0.94],
            "efficiency_uncontended": 0.917,
            "efficiency": 0.917,
            "pair_4_to_16": {"secs_4": 63.1, "secs_16": 27.4,
                             "cpu_probes": [6.1, 5.8],
                             "dram_probes": [21.0, 19.5],
                             "efficiency": 0.576},
        },
        "skew": {"pages": 60000, "exact_unsalted_secs": 1.91,
                 "exact_salted_secs": 2.02,
                 "lsh_capped_candidates_secs": 5.2,
                 "lsh_dropped_buckets": 3, "lsh_dropped_rows": 11980,
                 "lsh_buckets": 48211},
        "incremental": {
            "base_pages": 108000, "delta_pages": 12000, "cpus": 16,
            "store_build_secs": 55.3,
            "incremental_secs": 18.16, "incremental_core_seconds": 290.6,
            "delta_docs_per_sec": 660.8,
            "full_rerun_secs": 67.4, "full_rerun_core_seconds": 1078.4,
            "speedup_vs_full_rerun": 3.71, "cost_ratio_vs_full_rerun": 3.71,
            "runs_full_secs": [67.4, 69.2], "runs_delta_secs": [18.16, 19.4],
            "pair_speedups": [3.71, 3.57],
            "cpu_probes_full": [5.6, 5.8], "cpu_probes_delta": [6.0, 5.9],
            "dram_probes_full": [20.1, 21.3], "dram_probes_delta": [22.0, 20.8],
            "stages_delta": _fat_stage_list(9),
            "stages_full": _fat_stage_list(9),
            "right_sizing": {
                "delta_secs_at_half_cores": 18.16, "half_cores": 16,
                "delta_secs_at_full_cores": 22.1, "full_cores": 32,
                "shuffle_partitions_delta": 16,
                "stages_at_full_cores": _fat_stage_list(9),
            },
            "headline_full_secs_at_32_cores": 20.32,
        },
        "host_ceilings": {
            "levels": [1, 4],
            "cpu": {"1": 5.9, "4": 23.1, "efficiency_1_to_4": 0.979},
            "dram": {"1": 22.4, "4": 76.2, "efficiency_1_to_4": 0.85},
        },
    }


def test_fat_result_is_bigger_than_the_line_that_broke_r4():
    # guard the guard: if the synthetic result ever shrinks below the
    # real failure size, the test stops exercising the failure mode
    assert len(json.dumps(_fat_result())) > 3000


def test_emit_result_line_fits_and_parses_from_driver_tail(tmp_path):
    details = str(tmp_path / "details.json")
    line = bench.emit_result(_fat_result(), details_file=details)
    assert len(line) <= bench._MAX_RESULT_LINE < TAIL_CHARS

    # simulate the real stdout: Spark console noise before the line
    stdout = ("WARN noise\n" * 400) + line + "\n"
    parsed = parse_driver_tail(stdout)
    assert parsed is not None, "driver tail parse must succeed"

    # the gate numbers the verdict reads must be on the line itself
    assert parsed["metric"] == "e2e_dedup_secs"
    assert parsed["recall"] == 1.0 and parsed["precision"] == 1.0
    assert parsed["scaling"]["efficiency"] == 0.917
    assert parsed["scaling"]["pair_efficiencies"]
    assert parsed["incremental"]["speedup_vs_full_rerun"] == 3.71
    assert parsed["incremental"]["incremental_secs"] == 18.16
    assert parsed["incremental"]["full_rerun_secs"] == 67.4
    rs = parsed["incremental"]["right_sizing"]
    assert rs["delta_secs_at_full_cores"] == 22.1

    # and the sidecar must carry the full detail, untrimmed
    with open(details) as fh:
        full = json.load(fh)
    assert full["incremental"]["stages_full"]
    assert full["host_ceilings"]["dram"]
    assert parsed["details_file"] == details


def test_emit_result_never_exceeds_cap_even_with_huge_optionals(tmp_path):
    r = _fat_result()
    # blow up the optional sections far past anything real
    r["queries"] = {f"q_very_long_query_name_{i}": 1.0 for i in range(60)}
    r["skew"].update({f"extra_{i}": 9.99 for i in range(40)})
    r["scaling"]["pair_efficiencies"] = [0.9] * 120
    r["scaling"]["uncontended_pair_efficiencies"] = [0.9] * 120
    r["incremental"]["pair_speedups"] = [3.7] * 120
    line = bench.emit_result(r, details_file=str(tmp_path / "d.json"))
    assert len(line) <= bench._MAX_RESULT_LINE
    parsed = json.loads(line)
    # trimming must never touch the gate numbers
    assert parsed["scaling"]["efficiency"] == 0.917
    assert parsed["incremental"]["speedup_vs_full_rerun"] == 3.71


def test_truncated_front_reads_as_null_like_r4():
    # sanity: the replay actually reproduces the r4 failure signature
    long_line = json.dumps({"metric": "x", "pad": "y" * 3000})
    assert parse_driver_tail("noise\n" + long_line + "\n") is None


def test_incremental_error_still_fits(tmp_path):
    r = _fat_result()
    r["incremental"] = {"error": "boom " * 80, "returncode": 1}
    line = bench.emit_result(r, details_file=str(tmp_path / "d.json"))
    assert len(line) <= bench._MAX_RESULT_LINE
    assert "boom" in json.loads(line)["incremental"]["error"]


def test_incremental_leg_runs_before_and_outside_the_soft_budget():
    """Round-5 lesson (builder run6): with the incremental section
    LAST and gated on the soft budget, one stolen window inflating the
    scaling pairs dropped the leg entirely (`incremental: null`) from
    the official record.  Pin the source order — the incremental
    subprocess launches before the scaling-pair loop — and that no
    budget comparison guards its launch."""
    import inspect

    src = inspect.getsource(bench.main)
    inc_at = src.index("_incremental_bench_subprocess(corpus_path)")
    pairs_at = src.index("while len(pairs)")
    assert inc_at < pairs_at, "incremental leg must run before the pairs"
    gate = src[: inc_at].rsplit("if ", 1)[-1].split(":", 1)[0]
    assert "SPARK_GRAFT_BENCH_INCREMENTAL" in gate
    assert "budget" not in gate, "incremental launch must not be budget-gated"
