"""Property-based check of the k-means assignment invariant.

For arbitrary small vector sets, the distributed Lloyd result must
satisfy the defining property of an assignment step: every vector's
cluster is the argmin of squared L2 distance to the FINAL centroid set
(ties to the lower cluster id), with the distance matching a plain
Python recomputation.  This pins the broadcast-argmin aggregate
(min over struct(dist, cluster)) against an independent oracle the way
the DuckDB twin pins the full query at fixed data.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from debezium_server_bigquery_spark.functions.kmeans import lloyd_kmeans

_DIM = 4
_VEC = st.lists(
    st.floats(
        min_value=-8, max_value=8, allow_nan=False, allow_infinity=False, width=32
    ),
    min_size=_DIM,
    max_size=_DIM,
)

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _sqdist(a, b):
    # identical fold shape to the Spark/DuckDB twins: left-to-right sum
    s = 0.0
    for x, y in zip(a, b):
        s += (float(x) - float(y)) * (float(x) - float(y))
    return s


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_VEC, min_size=4, max_size=16))
@pytest.mark.heavy
def test_assignment_is_argmin_of_final_centroids(spark, vectors):
    k = 3
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vectors)], schema=_SCHEMA
    )
    assigned = lloyd_kmeans(emb, k=k, iters=1).collect()
    rows = {r["vec_id"]: r for r in assigned}
    assert set(rows) == set(range(len(vectors)))

    # recompute the final centroids from the PENULTIMATE assignment the
    # same way _update does: exact mean per (cluster, pos) — here plain
    # float math is fine because we only need the argmin to agree within
    # fp slack, not bit equality
    prev = {r["vec_id"]: r["cluster_id"] for r in lloyd_kmeans(emb, k=k, iters=0).collect()}
    by_cluster: dict[int, list[int]] = {}
    for vid, cid in prev.items():
        by_cluster.setdefault(cid, []).append(vid)
    centroids = {
        cid: [
            sum(float(vectors[v][d]) for v in vids) / len(vids)
            for d in range(_DIM)
        ]
        for cid, vids in by_cluster.items()
    }
    for vid, r in rows.items():
        dists = {
            cid: _sqdist(vectors[vid], c) for cid, c in centroids.items()
        }
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))
        # fp slack: the distributed path folds float32 casts to double in
        # a fixed order; the recompute uses plain python floats
        assert abs(dists[r["cluster_id"]] - r["dist"]) < 1e-6
        assert dists[r["cluster_id"]] <= best[1] + 1e-6
