"""Bench harness unit tests: the driver-facing JSON contract.

The round-3 official capture was rc=124/parsed=null; the harness now
guarantees a parseable line under interruption (VERDICT r3 #1/#8).
"""
import json

import numpy as np

import bench


def _reset():
    bench._PARTIAL.update(diffs=[], iters=0, builder=None, done=False,
                          result=None)


def test_partial_result_with_completed_reps():
    _reset()
    bench._PARTIAL["builder"] = lambda sec: {
        "metric": "m", "value": round(1e-3 / sec, 2), "unit": "x",
        "vs_baseline": 1.0}
    bench._PARTIAL["diffs"] = [2e-3, 1e-3, 3e-3]
    r = bench._partial_result()
    assert r["partial"] is True and r["reps_completed"] == 3
    assert r["value"] == 0.5            # median 2e-3 -> 1e-3/2e-3
    json.dumps(r)                        # driver-parseable


def test_partial_result_before_first_measurement():
    _reset()
    r = bench._partial_result()
    assert r["partial"] is True and r["reps_completed"] == 0
    assert r["value"] == 0.0 and "note" in r
    json.dumps(r)


def test_partial_result_after_full_line():
    _reset()
    bench._PARTIAL["done"] = True
    assert bench._partial_result() is None


def test_frozen_result_wins_over_aux_chain_diffs():
    # --compare-xla reuses timeit_chain after the primary measurement;
    # an interrupt during the baseline must emit the frozen fused result,
    # not the (slower) baseline diffs under the fused metric (r4 ADVICE)
    _reset()
    frozen = {"metric": "fused_conv3x3_1x1_int8_roofline_pct",
              "value": 81.19, "unit": "%", "vs_baseline": 0.9022}
    bench._PARTIAL["result"] = dict(frozen)
    bench._PARTIAL["builder"] = lambda sec: {
        "metric": "fused_conv3x3_1x1_int8_roofline_pct",
        "value": round(1e-3 / sec, 2), "unit": "%", "vs_baseline": 0.0}
    bench._PARTIAL["diffs"] = [5e-3]       # stale: the XLA baseline's
    assert bench._partial_result() == frozen


def test_prefirst_fallback_uses_active_metric():
    # an interrupt during compile of a non-fused bench must file the
    # zero under THAT bench's metric name (r4 ADVICE)
    _reset()
    bench._PARTIAL["builder"] = lambda sec: {
        "metric": "concat_relu_hbm_pct", "value": 1.0, "unit": "%",
        "vs_baseline": 0.0}
    r = bench._partial_result()
    assert r["metric"] == "concat_relu_hbm_pct" and r["value"] == 0.0
    json.dumps(r)


def test_median_is_reported_not_min():
    # min-of-reps compounds tunnel-noise undershoot (docs/PERF.md
    # protocol notes); the median of the paired differences is unbiased
    diffs = [0.9e-3, 1.0e-3, 1.1e-3, 0.2e-3, 1.05e-3]
    assert bench._median_sec(diffs) == 1.0e-3


def test_timeit_chain_records_incrementally():
    calls = []

    def step(x):
        calls.append(1)
        return x + 1

    x0 = np.zeros((), np.float32)
    sec = bench.timeit_chain(step, x0, iters=2, reps=3, spread_s=0.0)
    assert sec > 0
    assert len(bench._PARTIAL["diffs"]) == 3
