"""Python-worker import-cache patch: make ``importlib.invalidate_caches``
cheap when nothing changed (guide §4 — the Python boundary).

Measured on this rig (JFR + an instrumented worker, OPTIMIZATION_r15.md
§arrow-floor): EVERY PySpark worker task calls ``setup_spark_files`` →
``importlib.invalidate_caches()``, and CPython 3.10+'s
``zipimport.zipimporter.invalidate_caches`` EAGERLY re-parses the whole
zip central directory. The worker's ``sys.path`` carries pyspark.zip
(1 328 entries), the py4j zip, and the multi-MB spark-core JAR, and
``sys.path_importer_cache`` holds one zipimporter per (archive, inner
path) pair ever probed — so one task pays a dozen full directory
re-parses: **0.17–0.25 s per task on a warm, reused worker**, the
dominant cost of every Arrow/pandas-UDF stage at bench SF (the measured
~0.26 s "arrow floor"), and pure per-task overhead on any cluster whose
workers run with zip/jar PYTHONPATH entries (the standard distribution
layout), at any scale.

The patch keeps the invalidation CORRECT but lazy: re-read the archive
directory only when the archive's (mtime, size, path) actually changed —
exactly the staleness signal CPython's FileFinder uses for directories.
A changed or vanished archive still invalidates; the unchanged common
case becomes one ``os.stat``. ``sc.addPyFile`` mid-job therefore still
works: new files land in a *directory* (spark_files_dir, FileFinder
semantics untouched), and a genuinely replaced zip has a new stamp.

Installation is idempotent and happens at import time of the operator
modules that define pandas UDFs: unpickling any engine UDF on a worker
imports that module, so every worker that has ever run one engine Arrow
task runs all later tasks without the re-parse tax. The driver process
is patched too (harmless — it calls invalidate_caches rarely).
"""

from __future__ import annotations

import os
import zipimport

_INSTALLED = False

#: archive path → (stat stamp, parsed directory). Module-global (not
#: per-instance) because the import machinery RECREATES zipimporter
#: instances across tasks — a per-instance stamp would re-pay the parse
#: on every fresh instance, which is exactly the per-task cost observed.
_DIR_CACHE: dict[str, tuple[tuple[float, int], object]] = {}


def install() -> None:
    """Idempotently replace ``zipimport.zipimporter.invalidate_caches``
    with a stamp-checked variant (module docstring has the measured
    rationale). Safe to call from any process, any number of times."""
    global _INSTALLED
    if _INSTALLED or getattr(zipimport.zipimporter, "_ne_lazy_inval", False):
        _INSTALLED = True
        return
    orig = zipimport.zipimporter.invalidate_caches

    def invalidate_caches(self):  # noqa: ANN001 — stdlib signature
        try:
            st = os.stat(self.archive)
            stamp = (st.st_mtime, st.st_size)
        except OSError:
            _DIR_CACHE.pop(self.archive, None)
            return orig(self)
        hit = _DIR_CACHE.get(self.archive)
        if hit is not None and hit[0] == stamp and hit[1]:
            # unchanged archive: restore the parsed directory instead of
            # re-parsing the central directory (the stdlib re-parses
            # unconditionally, per instance)
            self._files = hit[1]
            zipimport._zip_directory_cache[self.archive] = hit[1]
            return None
        res = orig(self)
        files = getattr(self, "_files", None)
        if files:
            _DIR_CACHE[self.archive] = (stamp, files)
        return res

    zipimport.zipimporter.invalidate_caches = invalidate_caches
    zipimport.zipimporter._ne_lazy_inval = True
    _INSTALLED = True
