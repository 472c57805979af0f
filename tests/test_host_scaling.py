"""Smoke test for the multi-process host-entropy scaling harness
(tools/host_scaling.py — the measured 'scales with cores' evidence that
bench.py emits as its host_scaling block)."""

import os
import sys

def test_host_scaling_measure_smoke():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import host_scaling as HS
    buf = HS._init_fixture()
    out = HS.measure(buf, per_proc=4, proc_counts=(1, 2), ship_probe=False)
    assert set(out["decode"]) == {"1", "2"}
    for blk in (out["decode"], out["encode"]):
        for p in ("1", "2"):
            assert blk[p]["aggregate_images_per_sec"] > 0
        assert blk["1"]["efficiency_vs_1proc"] == 1.0
    assert 0 < out["cpu_availability"] <= 2.0
    cross = HS.crossover_cores(out, {"rgb": 5000.0})
    assert cross["rgb"] >= 1
