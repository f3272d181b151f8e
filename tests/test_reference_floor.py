"""The vs_baseline denominator artifact (results/reference_floor.json,
produced by bench_reference_floor.py from the ACTUAL reference code)
must exist, be self-describing, and clear the BASELINE.md 20x target
against the recorded on-chip beam-3 throughput."""

import json
from pathlib import Path

import pytest


REPO = Path(__file__).resolve().parent.parent
ARTIFACT = REPO / "results" / "reference_floor.json"


def test_reference_floor_artifact_contract():
    data = json.loads(ARTIFACT.read_text())
    bound = data["bound"]
    ceiling = bound["reference_a100_beam3_clips_per_s_upper_bound"]
    assert ceiling > 0
    # the ceiling must follow from its own components
    floor_ms = min(bound["python_wall_floor_ms_per_clip"],
                   bound["kernel_launch_floor_ms_per_clip"])
    assert bound["per_clip_floor_ms"] == pytest.approx(floor_ms, abs=1e-3)
    assert ceiling == pytest.approx(1000.0 / floor_ms, rel=1e-3)
    # launch floor = ops x per-launch latency
    assert bound["kernel_launch_floor_ms_per_clip"] == pytest.approx(
        data["beam3"]["torch_ops_per_clip"] * bound["a100_launch_us"]
        / 1e3, rel=1e-3)
    # derivation + anchors are recorded for the reader
    assert "base.py:254-325" in data["meta"]["reference_anchor"]
    assert data["bound"]["derivation"]


def test_vs_baseline_clears_the_north_star():
    """Recorded on-chip beam-3 throughput (BENCH_r04 fused_beam3_b256)
    over the reference ceiling must exceed the 20x BASELINE target."""
    data = json.loads(ARTIFACT.read_text())
    ceiling = data["bound"][
        "reference_a100_beam3_clips_per_s_upper_bound"]
    bench = json.loads((REPO / "BENCH_r04.json").read_text())
    if "parsed" in bench:                  # driver wrapper format
        bench = bench["parsed"]
    configs = bench.get("configs", {})
    beam = {k: v["clips_per_sec"] for k, v in configs.items()
            if "beam" in k}
    assert beam, f"no beam configs in BENCH_r04: {list(configs)}"
    ratio = max(beam.values()) / ceiling
    assert ratio >= 20.0, (max(beam.values()), ceiling)
