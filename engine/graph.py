"""Graph primitives over edge Datasets.

The dedup family already runs distributed min-label propagation internally
(engine/dedup._propagate_labels — the cluster-assembly scale path); this
module exposes it as a first-class operator over an arbitrary integer edge
table: co-citation graphs, url link graphs, user-interaction graphs — the
"cluster the corpus by relation" step of a training-data pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count


DRIVER_EDGE_MAX = 2_000_000  # distinct-edge cap for the driver union-find


def connected_components(edges: "ray.data.Dataset", src: str = "src",
                         dst: str = "dst", max_iters: int = 25,
                         num_buckets: int = 32,
                         driver_edge_max: int = DRIVER_EDGE_MAX
                         ) -> "ray.data.Dataset":
    """Connected components of an undirected graph given as (src, dst)
    integer edge rows (direction ignored; duplicates allowed). Returns a
    Dataset (node, component) — component = min node id of the component,
    one row per distinct endpoint.

    Plan (size-gated, the dedup-family discipline): symmetrize per block
    (narrow (node, peer) stream), ONE groupby distinct on the pair
    (repeated edges collapse before any component work). Distinct edge
    sets ≤ ``driver_edge_max`` take a driver union-find (numeric-min,
    O(E α(E)) — node count is bounded by 2×cap); larger graphs take
    min-label propagation: each round one vectorized hash_join carries
    every node's current label to its neighbors + a per-node Min groupby —
    labels only decrease, the label sum detects the fixpoint, rounds ≲
    graph diameter, and only (node, label) rows ever cross the wire.
    Isolated nodes: not visible in an edge list — union their ids into
    ``edges`` as self-loops if needed.
    """
    import ray.data as rd

    from engine.dedup import _propagate_labels

    def symmetrize(t: pa.Table) -> pa.Table:
        a = pc.cast(t[src], pa.int64())
        b = pc.cast(t[dst], pa.int64())
        return pa.table({
            "node": pa.chunked_array([*a.chunks, *b.chunks], type=pa.int64()),
            "peer": pa.chunked_array([*b.chunks, *a.chunks], type=pa.int64()),
        })

    from engine.joins import _coalesced

    sym = (
        _coalesced(edges.map_batches(symmetrize, batch_format="pyarrow"),
                   num_buckets, "auto")  # shuffle cost scales with block
        .groupby(["node", "peer"])       # count, not bytes (CLAUDE.md)
        .aggregate(Count(alias_name="__n"))
        .map_batches(lambda t: t.drop_columns(["__n"]),
                     batch_format="pyarrow")
        .materialize()  # consumed twice below on either plan
    )

    if sym.count() <= driver_edge_max:
        df = sym.to_pandas()
        parent: dict = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in zip(df["node"].tolist(), df["peer"].tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = sorted(set(df["node"].tolist()))
        return rd.from_arrow(pa.table({
            "node": pa.array(nodes, type=pa.int64()),
            "component": pa.array([find(n) for n in nodes],
                                  type=pa.int64()),
        }))

    nodes_ds = sym.map_batches(lambda t: t.select(["node"]),
                               batch_format="pyarrow") \
        .groupby("node").aggregate(Count(alias_name="__n")) \
        .map_batches(lambda t: t.drop_columns(["__n"]),
                     batch_format="pyarrow")

    labeled = _propagate_labels(sym, nodes_ds, max_iters)
    return labeled.map_batches(
        lambda t: pa.table({"node": t["doc_id"], "component": t["cluster_id"]}),
        batch_format="pyarrow",
    )
