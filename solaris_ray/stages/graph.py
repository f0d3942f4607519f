"""Road-network graph builder — solaris.vector.graph re-expressed.

Reference (/root/reference/solaris/vector/graph.py):

- nodes = every linestring vertex, deduplicated by EXACT geometry with
  ``drop_duplicates(keep='last')`` (:326-334), ids assigned
  sequentially; built in parallel with a Pool + broadcast node frame
  (:318-349).
- edges = consecutive vertex pairs per linestring, weighted by
  Euclidean distance (:79-88).
- export: nodes.geojson + edges.geojson (:453-545).

Ray mapping (SURVEY.md §2.7): node dedup is a hash-partition groupby on
the exact (x, y) pair; node ids here are assigned by (x, y) sort order
— deterministic at any parallelism, unlike the reference's
insertion-order ids (documented deviation: the graphs are isomorphic,
ids differ; tests compare structure).  Edge endpoint resolution uses a
broadcast node map (the Pool-initializer pattern, :341-349).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

NODE_SCHEMA = pa.schema(
    [("node_id", pa.int64()), ("x", pa.float64()), ("y", pa.float64()), ("n_refs", pa.int64())]
)
EDGE_SCHEMA = pa.schema(
    [
        ("edge_id", pa.int64()),
        ("road_id", pa.int64()),
        ("seq", pa.int32()),
        ("u", pa.int64()),
        ("v", pa.int64()),
        ("length", pa.float64()),
    ]
)


def explode_vertices(batch: pa.Table, id_col: str = "feature_id") -> pa.Table:
    xs = batch["xs"].combine_chunks() if isinstance(batch["xs"], pa.ChunkedArray) else batch["xs"]
    ys = batch["ys"].combine_chunks() if isinstance(batch["ys"], pa.ChunkedArray) else batch["ys"]
    if isinstance(xs, pa.ChunkedArray):
        xs = pa.concat_arrays(xs.chunks)
        ys = pa.concat_arrays(ys.chunks)
    counts = np.diff(xs.offsets.to_numpy())
    rid = np.repeat(batch[id_col].to_numpy(), counts)
    seq = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.empty(0, dtype=np.int64)
    return pa.table(
        {
            "road_id": pa.array(rid.astype(np.int64)),
            "seq": pa.array(seq.astype(np.int32)),
            "x": pa.array(xs.values.to_numpy()),
            "y": pa.array(ys.values.to_numpy()),
        }
    )


def build_graph(roads, id_col: str = "feature_id") -> tuple[pa.Table, "object"]:
    """roads Dataset (xs/ys linestrings) -> (nodes table, edges Dataset).

    Nodes are materialized (they are the small side: |nodes| <<
    |vertices| after dedup) and broadcast for edge endpoint lookup.
    """
    import ray
    from ray.data.aggregate import Count

    verts = roads.map_batches(
        lambda b: explode_vertices(b, id_col), batch_format="pyarrow", batch_size=4096
    )
    uniq = verts.groupby(["x", "y"]).aggregate(Count()).to_pandas()
    # deterministic ids: sort by (x, y)
    uniq = uniq.sort_values(["x", "y"], kind="mergesort").reset_index(drop=True)
    nodes = pa.table(
        {
            "node_id": pa.array(np.arange(len(uniq), dtype=np.int64)),
            "x": pa.array(uniq["x"].to_numpy()),
            "y": pa.array(uniq["y"].to_numpy()),
            "n_refs": pa.array(uniq["count()"].to_numpy().astype(np.int64)),
        }
    )
    node_map = {(x, y): i for i, (x, y) in enumerate(zip(nodes["x"].to_numpy(), nodes["y"].to_numpy()))}
    map_ref = ray.put(node_map)

    class EdgeBuilder:
        def __init__(self, map_ref):
            self.node_map = ray.get(map_ref) if not isinstance(map_ref, dict) else map_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {k: [] for k in EDGE_SCHEMA.names}
            xs_l = batch["xs"].to_pylist()
            ys_l = batch["ys"].to_pylist()
            rid = batch[id_col].to_numpy()
            for i in range(batch.num_rows):
                px, py = np.asarray(xs_l[i]), np.asarray(ys_l[i])
                seg = np.hypot(np.diff(px), np.diff(py))
                for j in range(len(px) - 1):
                    u = self.node_map[(px[j], py[j])]
                    v = self.node_map[(px[j + 1], py[j + 1])]
                    out["edge_id"].append(int(rid[i]) * 4096 + j)
                    out["road_id"].append(int(rid[i]))
                    out["seq"].append(j)
                    out["u"].append(u)
                    out["v"].append(v)
                    out["length"].append(float(seg[j]))
            return pa.table({k: pa.array(out[k], EDGE_SCHEMA.field(k).type) for k in EDGE_SCHEMA.names})

    edges = roads.map_batches(
        EdgeBuilder,
        fn_constructor_kwargs={"map_ref": map_ref},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=2,
    )
    return nodes, edges
