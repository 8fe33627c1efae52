"""Result trackers (E13, reference trackers.py:45-233): protocol,
console filters, JSONL artifact round-trip."""

import json
import logging

from klinker_spark.trackers import (
    ConsoleResultTracker,
    JsonlResultTracker,
    ResultTracker,
    flatten_dictionary,
)


def test_flatten_dictionary_nested_and_prefix():
    assert flatten_dictionary({"a": {"b": 1, "c": {"d": 2}}, "e": 3}) == {
        "a.b": 1,
        "a.c.d": 2,
        "e": 3,
    }
    assert flatten_dictionary({"x": 1}, prefix="pre") == {"pre.x": 1}


def test_base_tracker_is_noop():
    t = ResultTracker()
    t.start_run("r")
    t.log_params({"a": 1})
    t.log_metrics({"m": 0.5}, step=1)
    t.end_run()


def test_console_tracker_filters(capsys):
    t = ConsoleResultTracker(
        writer="builtin", parameter_filter="keep.*", metric_filter="recall",
        start_end_run=True,
    )
    t.start_run("myrun")
    t.log_params({"keep_me": 1, "drop_me": 2})
    t.log_metrics({"recall": 0.9, "precision": 0.1}, step=3)
    t.end_run()
    out = capsys.readouterr().out
    assert "keep_me = 1" in out and "drop_me" not in out
    assert "recall = 0.9" in out and "precision" not in out
    assert "Starting run: myrun" in out and "Finished run." in out


def test_jsonl_tracker_roundtrip(tmp_path):
    path = str(tmp_path / "runs.jsonl")
    t = JsonlResultTracker(path)
    t.start_run("exp1")
    t.log_params({"blocker": {"name": "token", "k": 5}})
    t.log_metrics({"recall": 1.0}, step=None)
    t.end_run(success=True)
    events = [json.loads(line) for line in open(path)]
    assert [e["event"] for e in events] == ["start", "params", "metrics", "end"]
    assert all(e["run"] == "exp1" for e in events)
    assert events[1]["params"] == {"blocker.name": "token", "blocker.k": 5}
    assert events[2]["metrics"] == {"recall": 1.0}
    assert events[3]["success"] is True
