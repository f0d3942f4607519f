"""Operator library — every stage is a map_batches body / grouped
kernel over Arrow batches; see each module's docstring for the
reference semantics it re-expresses."""

from . import (  # noqa: F401
    ann,
    augment,
    chips,
    dedup,
    evaluate,
    export,
    fill,
    graph,
    joins,
    knn,
    masks,
    matchkeys,
    multimodal,
    pip,
    polygonize,
    preproc,
    quantiles,
    text,
    tiler,
    transforms,
    windows,
    zonal,
)
