"""Unit tests for deterministic spherical k-means (IVF codebook trainer)."""

import pyspark.sql.functions as F

from arcane_framework_scala_spark.functions.kmeans import (
    kmeans_centroids_fixed_point,
    kmeans_fit,
)
from arcane_framework_scala_spark.functions.similarity import ivf_topk


def _two_cluster_df(spark):
    # two tight angular clusters: near +x axis and near +y axis
    rows = []
    for i in range(20):
        e = 0.01 * (i % 5)
        rows.append((i, [1.0, e]))  # cluster A
        rows.append((100 + i, [e, 1.0]))  # cluster B
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_separates_angular_clusters(spark):
    df = _two_cluster_df(spark)
    cent = {r.centroid_id: r.embedding for r in kmeans_fit(df, k=2, iters=3).collect()}
    assert len(cent) == 2
    # one centroid must point near +x, the other near +y
    dirs = sorted((v[0] > v[1]) for v in cent.values())
    assert dirs == [False, True], cent


def test_deterministic_under_repartition(spark):
    df = _two_cluster_df(spark)
    a = sorted(map(tuple, kmeans_centroids_fixed_point(df, k=2, iters=3).collect()))
    b = sorted(
        map(
            tuple,
            kmeans_centroids_fixed_point(df.repartition(7), k=2, iters=3).collect(),
        )
    )
    assert a == b


def test_empty_cell_keeps_previous_centroid(spark):
    # all vectors identical -> every point joins one cell; the other
    # centroid must survive as its init value instead of vanishing
    df = spark.createDataFrame(
        [(i, [1.0, 0.5]) for i in range(6)], "vec_id long, embedding array<double>"
    )
    cent = kmeans_fit(df, k=2, iters=2).collect()
    assert len(cent) == 2


def test_trained_codebook_plugs_into_ivf(spark):
    df = _two_cluster_df(spark)
    codebook = kmeans_fit(df, k=2, iters=2)
    got = ivf_topk(df, query_ids=[0, 100], k=3, n_probe=1, centroids=codebook)
    rows = got.collect()
    assert {r.query_id for r in rows} == {0, 100}
    # with n_probe=1 and trained centroids, neighbors of a +x query are
    # all +x-cluster members (ids < 100), and vice versa
    for r in rows:
        assert (r.vec_id < 100) == (r.query_id < 100), r


def test_ivf_index_matches_inline_ivf_and_prunes_partitions(spark, sf_dir, tmp_path):
    from arcane_framework_scala_spark.functions.similarity import (
        build_ivf_index,
        ivf_index_topk,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_centroids=8)
    qids = [0, 1, 2]
    inline = ivf_topk(emb, qids, k=5, n_centroids=8, n_probe=2)
    indexed = ivf_index_topk(spark, path, qids, k=5, n_probe=2)
    # the persisted index is a pure materialization: identical results
    assert sorted(map(tuple, inline.collect())) == sorted(
        map(tuple, indexed.collect())
    )
    # and the candidate scan actually prunes: the physical plan's list scan
    # carries a centroid_id partition filter (planning-time pruning — only
    # probed cells are read at 100 TB)
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "centroid_id" in plan and ("PartitionFilters" in plan or "isin" in plan)
    import os as _os

    parts = [
        d for d in _os.listdir(f"{path}/lists") if d.startswith("centroid_id=")
    ]
    assert len(parts) == 8  # one directory per inverted list


def test_quantize_int8_roundtrip_error_bound(spark):
    """Symmetric int8 quantization invariants: q in [-127, 127], the
    max-|x| component hits ±127 exactly (floor can undershoot by 1 on
    the positive side), and dequantization error is bounded by one
    quantization step (max_abs / 127)."""
    import math

    from arcane_framework_scala_spark.functions.similarity import (
        quantize_embeddings,
    )

    vecs = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [-2.0, 1.5, 0.1, 0.9]),
        (2, [1e-6, -1e-6, 5e-7, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # all-zero: filtered (no scale exists)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert set(out) == {0, 1, 2}  # zero vector dropped
    raw = dict(vecs)
    for vid, r in out.items():
        ma = max(abs(x) for x in raw[vid])
        assert abs(r["scale_micro"] - math.floor(ma * 1_000_000)) == 0
        step = ma / 127.0
        for q, x in zip(r["q8"], raw[vid]):
            assert -127 <= q <= 127
            assert abs(q * step - x) <= step + 1e-12, (vid, q, x)
