"""Retry-lane reference policy (bench.py): the per-row reference must be
the MINIMUM across recent committed BENCH_LOCAL.json versions, not the
single latest artifact — a flap-inflated committed row must not mask a
real outlier in the next run (r12: golden_records committed at 27.6 s
hid an 11.5 s sample whose healthy history is ~5 s).
"""

from __future__ import annotations

import json
import os
import subprocess

import pytest

import bench

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _head_artifact():
    try:
        raw = subprocess.run(
            ["git", "-C", HERE, "show", "HEAD:BENCH_LOCAL.json"],
            capture_output=True,
            text=True,
            timeout=30,
        ).stdout
        return json.loads(raw)
    except Exception:
        return None


def test_retry_refs_are_min_across_committed_history():
    head = _head_artifact()
    if not head:
        pytest.skip("no committed BENCH_LOCAL.json (gitless checkout)")
    refs = bench._committed_refs()
    assert refs, "committed refs must parse"
    checked = 0
    for lane, sec in (
        ("headline", "queries"),
        ("curation", "queries_curation"),
        ("extras", "queries_extra"),
    ):
        for name, t in (head.get(sec) or {}).items():
            if isinstance(t, (int, float)) and t > 0:
                # min over history can only be <= the latest committed row
                assert refs[(lane, name)] <= float(t) + 1e-9
                checked += 1
    assert checked > 20, "expected a populated reference table"
