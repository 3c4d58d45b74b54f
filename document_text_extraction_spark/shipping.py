"""Ship this package to Spark executors (the ``--py-files`` equivalent).

The driver may create its SparkSession from any working directory;
Python workers then have no path to this repo. ``ensure_package_shipped``
zips the package once per session and registers it with ``addPyFile`` —
exactly what ``spark-submit --py-files dte.zip`` does on a real cluster
(north rule: "run via spark-submit --py-files").
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: set[int] = set()


def build_package_zip(dest: str | None = None) -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    if dest is None:
        dest = os.path.join(
            tempfile.gettempdir(),
            f"document_text_extraction_spark-{os.getpid()}.zip",
        )
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_STORED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, root))
    return dest


def ensure_package_shipped(spark: SparkSession) -> None:
    key = id(spark.sparkContext)
    if key in _SHIPPED_SESSIONS:
        return
    zip_path = build_package_zip()
    spark.sparkContext.addPyFile(zip_path)
    _SHIPPED_SESSIONS.add(key)
