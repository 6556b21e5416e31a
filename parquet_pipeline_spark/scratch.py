"""Process-scoped scratch directories for operators that persist an
index to disk mid-query (d11, s01, a09 — the persisted-index shapes).

The returned DataFrame of those operators is LAZY: the driver
materializes it after the registry callable returns, so the scratch
parquet must outlive the call. Cleaning up per-call would break the
read; never cleaning up leaks an unbounded parquet tree into /tmp
across repeated gate/bench runs (ADVICE r7). Middle ground: every
scratch dir nests under ONE process-level root that is rmtree'd via
atexit, so a process (one gate run, one bench run, one pytest
session) leaves nothing behind no matter how many queries it ran.
"""
from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: str | None = None


def scratch_dir(prefix: str) -> str:
    """A fresh directory under the process-level scratch root,
    removed (with everything the process put in it) at interpreter
    exit."""
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="pps_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT)
