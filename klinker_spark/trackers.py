"""Result trackers (E13) — record experiment parameters and metrics.

Reference: ``/root/reference/src/klinker/trackers.py:45-233``
(``ResultTracker`` protocol, ``ConsoleResultTracker``,
``WANDBResultTracker``).  Same four-call protocol here: ``start_run`` /
``log_params`` / ``log_metrics`` / ``end_run``.  Concrete trackers:

- :class:`ConsoleResultTracker` — prints (or logs) flattened
  params/metrics with optional regex filters, like the reference;
- :class:`JsonlResultTracker` — appends one JSON object per event to a
  file, the storage-friendly form a cluster job can aggregate;
- ``WANDBResultTracker`` is deliberately NOT implemented: it would
  publish to an external service; the JSONL file is the offline
  equivalent a user can upload themselves.
"""

from __future__ import annotations

import json
import logging
import re
from typing import Any, Mapping, Pattern


def flatten_dictionary(
    dictionary: Mapping[str, Any],
    prefix: str | None = None,
    sep: str = ".",
) -> dict[str, Any]:
    """Flatten nested mappings into dotted keys (reference
    ``trackers.py:24-42``)."""
    out: dict[str, Any] = {}

    def rec(d: Mapping[str, Any], pre: str | None) -> None:
        for k, v in d.items():
            key = f"{pre}{sep}{k}" if pre else str(k)
            if isinstance(v, Mapping):
                rec(v, key)
            else:
                out[key] = v

    rec(dictionary, prefix)
    return out


class ResultTracker:
    """No-op base protocol (``trackers.py:45-88``)."""

    def start_run(self, run_name: str | None = None) -> None:
        """Start a run with an optional name."""

    def log_params(self, params: Mapping[str, Any], prefix: str | None = None) -> None:
        """Log parameters to the result store."""

    def log_metrics(
        self,
        metrics: Mapping[str, float],
        step: int | None = None,
        prefix: str | None = None,
    ) -> None:
        """Log metrics, optionally attached to a step."""

    def end_run(self, success: bool = True) -> None:
        """End a run; MUST be called after the experiment finishes."""


class ConsoleResultTracker(ResultTracker):
    """Print/log flattened params and metrics (``trackers.py:91-165``)."""

    def __init__(
        self,
        *,
        track_parameters: bool = True,
        parameter_filter: str | Pattern[str] | None = None,
        track_metrics: bool = True,
        metric_filter: str | Pattern[str] | None = None,
        start_end_run: bool = False,
        writer: str = "logging",
    ):
        self.start_end_run = start_end_run
        self.track_parameters = track_parameters
        self.parameter_filter = (
            re.compile(parameter_filter) if isinstance(parameter_filter, str) else parameter_filter
        )
        self.track_metrics = track_metrics
        self.metric_filter = (
            re.compile(metric_filter) if isinstance(metric_filter, str) else metric_filter
        )
        if writer == "builtin":
            self.write = print
        elif writer == "logging":
            self.write = logging.getLogger("klinker_spark").info
        else:
            raise ValueError(f"writer must be builtin|logging, got {writer!r}")

    def start_run(self, run_name: str | None = None) -> None:
        if run_name is not None and self.start_end_run:
            self.write(f"Starting run: {run_name}")

    def log_params(self, params: Mapping[str, Any], prefix: str | None = None) -> None:
        if not self.track_parameters:
            return
        for key, value in flatten_dictionary(params, prefix).items():
            if not self.parameter_filter or self.parameter_filter.match(key):
                self.write(f"Parameter: {key} = {value}")

    def log_metrics(
        self,
        metrics: Mapping[str, float],
        step: int | None = None,
        prefix: str | None = None,
    ) -> None:
        if not self.track_metrics:
            return
        self.write(f"Step: {step}")
        for key, value in flatten_dictionary(metrics, prefix).items():
            if not self.metric_filter or self.metric_filter.match(key):
                self.write(f"Metric: {key} = {value}")

    def end_run(self, success: bool = True) -> None:
        if not success:
            self.write("Run failed.")
        if self.start_end_run:
            self.write("Finished run.")


class JsonlResultTracker(ResultTracker):
    """Append one JSON object per event to ``path`` — the offline
    artifact form of the reference's wandb tracker."""

    def __init__(self, path: str):
        self.path = path
        self._run: str | None = None

    def _emit(self, event: dict[str, Any]) -> None:
        event["run"] = self._run
        with open(self.path, "a") as fh:
            fh.write(json.dumps(event, default=str) + "\n")

    def start_run(self, run_name: str | None = None) -> None:
        self._run = run_name
        self._emit({"event": "start"})

    def log_params(self, params: Mapping[str, Any], prefix: str | None = None) -> None:
        self._emit({"event": "params", "params": flatten_dictionary(params, prefix)})

    def log_metrics(
        self,
        metrics: Mapping[str, float],
        step: int | None = None,
        prefix: str | None = None,
    ) -> None:
        self._emit(
            {"event": "metrics", "step": step, "metrics": flatten_dictionary(metrics, prefix)}
        )

    def end_run(self, success: bool = True) -> None:
        self._emit({"event": "end", "success": success})
