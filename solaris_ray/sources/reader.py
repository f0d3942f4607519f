"""Input readers — Lance-first with Parquet fallback.

BASELINE.json mandates a Lance images table; this environment has no
``lance`` wheel, so ``read_images`` tries ``ray.data.read_lance`` and
falls back to Parquet (same schema; the engine is format-agnostic past
the read).  Column pruning is ALWAYS pushed down — a metadata-only
consumer (tile planner, join) must never lift pixel bytes off storage
(SURVEY.md 'prune at the read').
"""

from __future__ import annotations

IMAGE_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
META_COLUMNS = ["image_id", "w", "h", "fmt", "caption", "phash"]


def read_images(path: str, columns: list[str] | None = None, **kwargs):
    """Read the images table (Lance if available/applicable, else
    Parquet).  ``columns=None`` reads everything; pass
    ``META_COLUMNS`` for plan-only pipelines so ``bytes`` stays in
    storage."""
    import ray

    if path.endswith(".lance") or path.endswith("/lance"):
        try:
            return ray.data.read_lance(path, columns=columns, **kwargs)
        except (ImportError, AttributeError):
            pass  # no lance wheel: fall through to parquet twin
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def read_image_metadata(path: str, **kwargs):
    """Plan-only read: every column except pixel bytes."""
    return read_images(path, columns=META_COLUMNS, **kwargs)
