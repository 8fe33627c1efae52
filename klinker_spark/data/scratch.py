"""Session-scoped scratch directories for operators that materialize a
side-channel (sharded kNN query chunks, IVF probe projections).

Default scratch dirs live under ONE per-process root that is removed
at interpreter exit, so repeated calls in a long-lived session (bench
loops, notebooks) don't accumulate orphan /tmp directories — each call
still gets a fresh subdirectory because the returned DataFrames
lazily re-read their own files.

On a real cluster pass an explicit shared-filesystem path instead:
executors must be able to read the directory.  The consuming tasks
verify the ROOT is visible and fail fast with guidance, rather than
treating an invisible driver-local path as legitimately empty data.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

_ROOT: str | None = None


def session_scratch_dir(prefix: str) -> str:
    """A fresh scratch directory under the per-process root."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="klinker_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    path = os.path.join(_ROOT, f"{prefix}{uuid.uuid4().hex[:12]}")
    os.makedirs(path, exist_ok=True)
    return path


def require_visible(path: str, what: str) -> None:
    """Executor-side guard: the scratch ROOT must exist where the task
    runs.  A driver-local default path on a multi-node cluster would
    otherwise read as 'no chunks' and silently return empty results."""
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"{what} scratch directory {path!r} is not visible from this "
            "executor — on a cluster, pass scratch_dir= on a shared "
            "filesystem (HDFS/S3/NFS) instead of the driver-local default"
        )
