"""Custom PySpark worker daemon (``spark.python.daemon.module``).

Identical to ``pyspark.daemon`` except that, before the fork loop starts,
it (a) applies the zipimport invalidate_caches fix
(``oxbow_spark._worker_env`` — Python 3.11 re-parses every zip on
``sys.path`` on EVERY task otherwise, ~140-220 ms/task measured) and
(b) pre-imports the Arrow/pandas stack plus the worker entrypoint, so every
forked worker inherits warm modules copy-on-write instead of paying the
~270 ms first-task import cost per worker (guide §4.5 — heavyweight init
once, here hoisted from once-per-worker to once-per-executor).

Robustness contract (ADVICE r15, medium): everything before ``manager()``
is best-effort. ``_worker_env`` is loaded by FILE PATH (no package
``__init__`` executes — the operators package pulls the full scientific
stack), and every prelude step is wrapped so that any failure — a worker
venv without numpy, a missing repo checkout, a broken optional dep —
degrades to exactly ``pyspark.daemon.manager()`` instead of killing every
Python task in the session.

Importability contract: the daemon is spawned as
``python -m oxbow_spark.worker_daemon`` with the driver's cwd and env, so
it resolves ``oxbow_spark`` exactly like the Arrow kernels already do when
workers unpickle them by module reference (``spark.executorEnv.PYTHONPATH``
is additionally pinned to the repo root by ``session.get_spark``).
"""

from __future__ import annotations

try:  # zipimport fix: load by file path, no package __init__ involved
    import importlib.util as _ilu
    import os as _os

    _spec = _ilu.spec_from_file_location(
        "oxbow_spark._worker_env",
        _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                      "_worker_env.py"))
    _mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    _mod.patch_zipimport_invalidate_caches()
except Exception:  # pragma: no cover - degrade to a slower, working daemon
    pass

try:  # preload = pure optimization; degrade silently if anything is off
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.sql.pandas.types  # noqa: F401
    import pyspark.worker  # noqa: F401
except Exception:  # pragma: no cover - defensive
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
