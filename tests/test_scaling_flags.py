"""The scale rehearsal's super-linearity flag computation
(tools/scale_rehearsal.compute_flags) — the machine check behind
SCALING.json's "flagged" field (r6 VERDICT item 2: the zero-flags
claim must be computed into the artifact, not asserted in prose)."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "scale_rehearsal",
    os.path.join(os.path.dirname(__file__), "..", "tools", "scale_rehearsal.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)

compute_flags = _mod.compute_flags
EXEMPT = _mod.EXEMPT_KNOWN_SUPERLINEAR
FLOOR = _mod.FLAG_FLOOR_SEC

STEPS = [("0.01", "0.1"), ("0.1", "1")]


def _row(name, **ratios):
    return {"query": name, **ratios}


def test_linear_rows_not_flagged():
    table = [_row("q", **{"r_0.01_0.1": 3.0, "r_0.1_1": 9.9})]
    results = {"q": {"0.01": 1.0, "0.1": 3.0, "1": 29.7}}
    assert compute_flags(table, results, STEPS) == ([], [], [])


def test_superlinear_above_floor_is_flagged():
    table = [_row("q", **{"r_0.1_1": 20.0})]
    results = {"q": {"0.1": 0.5, "1": 10.0}}
    flagged, exempt, floor = compute_flags(table, results, STEPS)
    assert [f["query"] for f in flagged] == ["q"]
    assert flagged[0]["step"] == "0.1->1" and flagged[0]["ratio"] == 20.0
    assert exempt == [] and floor == []


def test_at_the_line_ratio_sits_in_noise_headroom():
    """Round-8 ADVICE: exactly-linear-plus-jitter (10-15x on a 10x step)
    must NOT flag — min-of-3 noise on a just-above-floor base otherwise
    breaks the publishable-curve invariant. 15x is the cutoff."""
    table = [_row("q", **{"r_0.1_1": 14.0})]
    results = {"q": {"0.1": 0.5, "1": 7.0}}
    assert compute_flags(table, results, STEPS) == ([], [], [])


def test_floor_deflated_base_is_separated_not_flagged():
    """The r6 bpe_token_count shape: ratio > 10 but the base time sits
    under the fixed job floor — recorded for visibility, not flagged."""
    table = [_row("bpe", **{"r_0.1_1": 18.0})]
    results = {"bpe": {"0.1": 0.111, "1": 1.998}}
    flagged, exempt, floor = compute_flags(table, results, STEPS)
    assert flagged == [] and exempt == []
    assert [f["query"] for f in floor] == ["bpe"]
    assert floor[0]["base_sec"] == 0.111 < FLOOR


def test_documented_quadratics_are_exempt_with_reason():
    table = [_row(n, **{"r_0.1_1": 50.0}) for n in EXEMPT]
    results = {n: {"0.1": 2.0, "1": 100.0} for n in EXEMPT}
    flagged, exempt, floor = compute_flags(table, results, STEPS)
    assert flagged == [] and floor == []
    assert {f["query"] for f in exempt} == set(EXEMPT)
    assert all(f["reason"] for f in exempt)


def test_threshold_scales_with_step_data_growth():
    """A 0.01->0.1 step is 10x data (threshold 10); a hypothetical
    0.1->10 step is 100x data (threshold 100): ratio 50 flags the
    former, not the latter."""
    steps = [("0.1", "10")]
    table = [_row("q", **{"r_0.1_10": 50.0})]
    results = {"q": {"0.1": 1.0, "10": 50.0}}
    assert compute_flags(table, results, steps) == ([], [], [])
    steps = [("0.01", "0.1")]
    table = [_row("q", **{"r_0.01_0.1": 50.0})]
    results = {"q": {"0.01": 1.0, "0.1": 50.0}}
    flagged, _, _ = compute_flags(table, results, steps)
    assert len(flagged) == 1
