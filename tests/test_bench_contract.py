"""bench.py output contract: the driver parses stdout's LAST 2000 chars
as one JSON line, so the trim helper must (a) shed optional keys until the
line fits and (b) terminate even when nothing droppable remains — the
ADVICE r9 finding was a potential infinite loop once every droppable key
was gone. Pure-python tests; no Spark session."""

import json

import bench


def test_trim_line_fits_by_shedding_keys():
    compact = {
        "metric": "headline_total_runtime",
        "value": 12.3,
        "unit": "sec",
        "queries": {f"q{i}": 1.0 for i in range(400)},  # ~4000 chars
        "reps": 3,
        "loadavg": [1.0, 2.0],
        "errors": {},
        "sf": 0.1,
    }
    line = bench._trim_stdout_line(compact)
    assert len(line) <= 1900
    parsed = json.loads(line)
    # the mandatory fields survive every shed
    assert parsed["metric"] == "headline_total_runtime"
    assert parsed["value"] == 12.3
    assert "queries" not in parsed  # the big key was shed


def test_trim_line_terminates_with_nothing_droppable():
    # an irreducibly-oversized payload with NO droppable keys: the loop
    # must return (oversized) instead of spinning forever
    compact = {
        "metric": "x" * 3000,
        "value": 1,
        "unit": "sec",
        "sf": 0.1,
    }
    line = bench._trim_stdout_line(compact)
    assert json.loads(line)["value"] == 1  # still valid JSON, just long


def test_trim_line_short_payload_untouched():
    compact = {"metric": "m", "value": 1, "queries": {"a": 1.0}}
    line = bench._trim_stdout_line(compact)
    assert json.loads(line) == {"metric": "m", "value": 1, "queries": {"a": 1.0}}
