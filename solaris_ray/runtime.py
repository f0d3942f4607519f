"""Runtime/session helpers (no ray.init here — sessions belong to callers).

``ensure_shippable()`` makes the package's stage classes deserializable
on Ray workers even when the driver's cwd is not the repo root: workers
inherit the raylet's cwd, not the driver's ``sys.path``, so a
``map_batches(TileCutter, ...)`` pickle would fail to import
``solaris_ray`` there.  On a real multi-node cluster the package would
be installed (or shipped via ``runtime_env={"py_modules": [...]}`` on
``ray job submit``); in a local session the portable fix is cloudpickle
by-value registration of the package.
"""

from __future__ import annotations

import os
import sys


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


_registered = False


def ensure_shippable() -> None:
    """Register the package for by-value pickling (idempotent)."""
    global _registered
    if _registered:
        return
    try:
        import solaris_ray

        from ray import cloudpickle

        cloudpickle.register_pickle_by_value(solaris_ray)
        _registered = True
    except Exception:
        # Workers that can already import the package (cwd == repo or
        # installed wheel) don't need this; stay silent.
        pass


def ensure_importable() -> None:
    """Driver-side: make ``import solaris_ray`` work from any cwd."""
    root = repo_root()
    if root not in sys.path:
        sys.path.insert(0, root)
