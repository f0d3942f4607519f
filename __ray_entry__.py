"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init()`` / ``ray.shutdown()`` happens here or in the library.

- ``entry()``     — flagship pipeline over /root/testdata/sf0.001.
- ``queries()``   — one callable per implemented operator/pipeline
                    (SURVEY.md §2 coverage; solaris_ray.pipelines.queries).
- ``oracle_sql()``— DuckDB-runnable ANSI SQL twins for the
                    SQL-expressible subset (same column names; integer
                    outputs or bit-identical float derivations).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from solaris_ray.runtime import ensure_importable, ensure_shippable, tune_data_context

ensure_importable()
ensure_shippable()
tune_data_context()


def entry() -> Any:
    """Flagship pipeline on sf0.001: tile-grid plan over part-derived
    imagery, clip spatial join against customer-derived footprints,
    per-cell rollup of join rows (the tiles+join-rows headline path)."""
    from ray.data.aggregate import Count, Sum

    import pyarrow as pa
    import pyarrow.compute as pc

    from solaris_ray.pipelines import queries as Q

    sf_dir = "/root/testdata/sf0.001"
    joined = Q.q_clip_join(sf_dir)
    agg = (
        joined.map_batches(
            lambda b: pa.table(
                {
                    "tile_id": b["tile_id"],
                    "truncated": pc.cast(b["truncated"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("tile_id")
        .aggregate(Count(), Sum("truncated"))
    )
    return agg


def queries() -> dict[str, Callable[[str], Any]]:
    from solaris_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from solaris_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
