"""Driver-side scratch directories with guaranteed cleanup.

Long-lived driver sessions are exactly why dup_labels spills its CC
labels to parquet (ops/dedup.py), but every spill previously leaked a
mkdtemp directory for the life of /tmp (ADVICE r02): now every
scratch dir is registered for atexit removal, and callers that fully
materialize the contents (e.g. a drained memory-sink stream) can
`release()` eagerly. Spill dirs whose DataFrame is consumed lazily
(dup_labels' returned reader) stay until interpreter exit — the
bounded, self-cleaning version of the old behavior.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

__all__ = ["scratch_dir", "crawl_workdir", "release", "spill_and_reread"]

_DIRS: set[str] = set()


def scratch_dir(prefix: str = "crawlspark-") -> str:
    """mkdtemp that is removed at interpreter exit (or via release)."""
    d = tempfile.mkdtemp(prefix=prefix)
    _DIRS.add(d)
    return d


def crawl_workdir(prefix: str = "crawlspark-run-") -> str:
    """mkdtemp that is NOT atexit-removed: crawler snapshot stores
    must survive a graceful interruption (Ctrl-C runs atexit hooks —
    removing the workdir there would destroy exactly the mid-wave
    checkpoint that `run(resume=True)` needs; ADVICE r03). The path
    is printed so the operator can resume or clean it up."""
    import sys

    d = tempfile.mkdtemp(prefix=prefix)
    print(f"crawlspark: workdir {d} (kept on exit; resume with workdir=...)",
          file=sys.stderr)
    return d


def release(path: str) -> None:
    """Remove a scratch dir NOW — call once its contents are fully
    materialized (never while a lazy DataFrame still reads it)."""
    _DIRS.discard(path)
    shutil.rmtree(path, ignore_errors=True)


def spill_and_reread(df, prefix: str, return_dir: bool = False):
    """Break lineage + release an iterative loop's cached frames via a
    parquet spill (the engine's store-backed pattern — never a driver
    collect): a long-lived session should not accumulate per-call
    cache entries, and downstream consumers should not re-run the
    iterative joins. The caller unpersists its own frames; the spill
    dir is atexit-cleaned (the returned DataFrame reads it lazily).
    ``return_dir=True`` also returns the spill directory so an
    iterative caller can ``release()`` a SUPERSEDED earlier spill
    once the new one has materialized (code-review r05: a
    deep-diameter loop otherwise accumulates one full label-set copy
    per spill until process exit). Shared by ops/dedup.cc_labels and
    analysis.graph_depths."""
    import os

    d = scratch_dir(prefix=prefix)
    out = os.path.join(d, "data")
    df.write.mode("overwrite").parquet(out)
    reread = df.sparkSession.read.parquet(out)
    return (reread, d) if return_dir else reread


@atexit.register
def _cleanup() -> None:
    for d in list(_DIRS):
        shutil.rmtree(d, ignore_errors=True)
        _DIRS.discard(d)
