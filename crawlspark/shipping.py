"""Ship the crawlspark package to executors.

UDF closures (mapInPandas/applyInPandas stages) unpickle on executor
Python workers, which import ``crawlspark`` there. On a real cluster
the job runs ``spark-submit --py-files crawlspark.zip`` (north_rule);
for driver-side API use from an arbitrary cwd, ``ensure_shipped``
zips the installed package once per session and registers it via
``SparkContext.addPyFile`` — the same mechanism --py-files uses.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

__all__ = ["ensure_shipped", "ensure_shipped_df", "make_pyfiles_zip"]


def _loaded_from_zip() -> bool:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    return not os.path.isdir(pkg_dir)


def make_pyfiles_zip(dest: str | None = None) -> str:
    """Zip the crawlspark package (for --py-files or addPyFile)."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        raise RuntimeError(
            "crawlspark already runs from a zip (--py-files); nothing to re-zip"
        )
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(), "crawlspark-pyfiles.zip")
    tmp = dest + ".tmp"
    with zipfile.ZipFile(tmp, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    os.replace(tmp, dest)  # atomic — never leaves a half-written zip
    return dest


def ensure_shipped(spark) -> None:
    """MUST run before any crawlspark Python-UDF frame is DEFINED,
    not merely before it executes: PySpark snapshots the session's
    py-files list into the serialized PythonFunction at UDF creation,
    so a mapInPandas/applyInPandas/pandas_udf frame built before
    addPyFile never sees the zip (its workers then fail with
    ModuleNotFoundError from any non-repo cwd — found round 7 driving
    benchgen from /tmp). Every public UDF-creating entry point
    therefore calls ensure_shipped/ensure_shipped_df itself."""
    sc = spark.sparkContext
    if getattr(sc, "_crawlspark_shipped", False):
        return
    if _loaded_from_zip():
        # running under spark-submit --py-files: executors already
        # have the zip; re-zipping from inside the archive is both
        # impossible and (previously) clobbered the shared zip
        sc._crawlspark_shipped = True
        return
    sc.addPyFile(make_pyfiles_zip())
    sc._crawlspark_shipped = True


def ensure_shipped_df(df) -> None:
    """ensure_shipped for APIs that receive a DataFrame, not a session."""
    ensure_shipped(df.sparkSession)
