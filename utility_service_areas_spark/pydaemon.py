"""Preloading Python worker daemon (``spark.python.daemon.module``).

``pyspark.daemon`` forks one worker per task; each forked worker then
imports the UDF's module and its heavy dependencies (numpy, pandas,
pyarrow) on first use, so a session's first Python-evaluation stage
pays the import bill once per *concurrent worker* — on a 32-core
executor that is up to 32 parallel copies of the same ~1 s import
storm, all charged to whichever query first touches Python.

Importing those modules HERE — in the daemon process, before its fork
loop starts — lets every forked worker inherit the warm modules
through fork copy-on-write: the bill is paid once per daemon (i.e.
once per executor), and a fork costs a fork. Same preload pattern as
``gunicorn --preload``. Wired in by ``session.build_session`` via the
``spark.python.daemon.module`` conf (``python -m`` entry, so this
module must stay importable from the worker interpreter's
``PYTHONPATH`` — build_session guarantees the repo root is on it).

Preload failures are non-fatal: the daemon must come up even on a
stripped worker image, and workers then import on demand exactly as
the stock daemon's workers do.
"""

from __future__ import annotations

import importlib

#: Modules forked workers would otherwise import per-process on first
#: use. pyspark.worker is pulled in by pyspark.daemon itself; the
#: package modules cover the engine's Arrow kernels (geometry ray
#: cast, hamming popcount), whose unpickle-by-reference otherwise
#: triggers the package + numpy/pandas import inside each worker.
PRELOAD_MODULES: tuple[str, ...] = (
    "numpy",
    "pandas",
    "pyarrow",
    "utility_service_areas_spark.functions.geometry",
    "utility_service_areas_spark.functions.hashing",
)


def preload() -> list[str]:
    """Import PRELOAD_MODULES, returning the names that loaded."""
    loaded: list[str] = []
    for mod in PRELOAD_MODULES:
        try:
            importlib.import_module(mod)
            loaded.append(mod)
        except Exception:  # pragma: no cover - stripped-image fallback
            pass
    return loaded


if __name__ == "__main__":
    preload()
    # Import AFTER preload so the daemon's own module-level worker-module
    # selection (it reads sys.argv, which `python -m` preserves) happens
    # with the heavy modules already in sys.modules.
    from pyspark.daemon import manager

    manager()
