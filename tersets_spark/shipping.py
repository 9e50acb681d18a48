"""Ship the tersets_spark package to Spark Python workers.

The round driver (and any spark-submit launcher) may run with a cwd that is
not the repo root, so worker processes can't import ``tersets_spark`` from
sys.path. ``ensure_shipped(spark)`` zips the package once per process and
registers it with ``sparkContext.addPyFile`` — the local-mode equivalent of
``spark-submit --py-files engine.zip`` (north_rule launch contract); on a
real cluster the same zip rides the same API.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_shipped_app_ids: set[str] = set()
_zip_path: str | None = None


def _build_zip() -> str:
    global _zip_path
    if _zip_path is not None and os.path.exists(_zip_path):
        return _zip_path
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    fd, path = tempfile.mkstemp(prefix="tersets_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for name in files:
                # .c rides along so workers can build the native histogram
                # fast path locally (codecs/_native.py, zip-safe loader)
                if not name.endswith((".py", ".c")):
                    continue
                full = os.path.join(root, name)
                rel = os.path.join("tersets_spark", os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    _zip_path = path
    return path


def ensure_shipped(spark) -> None:
    """Idempotently make the package importable on this session's workers."""
    app_id = spark.sparkContext.applicationId
    if app_id in _shipped_app_ids:
        return
    spark.sparkContext.addPyFile(_build_zip())
    _shipped_app_ids.add(app_id)
