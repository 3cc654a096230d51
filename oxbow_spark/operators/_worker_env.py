"""Back-compat shim: the worker environment fix lives in
``oxbow_spark._worker_env`` (top-level, import-light — see ADVICE r15: the
daemon must be able to load it without executing the operators package
``__init__``). Importing this shim, like importing the real module, applies
the zipimport patch only inside PySpark worker/daemon processes."""

from oxbow_spark._worker_env import (  # noqa: F401
    patch_zipimport_invalidate_caches,
)
