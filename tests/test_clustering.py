"""k-means + SemDeDup semantic dedup (operators/clustering.py).

Hand-built goldens: two well-separated directions in 4-dim space, so the
expected clustering is known by inspection; near-dup pairs are planted
with known cosine so the keep/drop split is exact.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ahrd_spark.operators.clustering import kmeans_assign, semantic_dedup


SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)

# ids 0,1,2 point along +x (with small jitter), ids 3,4,5 along +y.
# Seeds are the two lowest ids (0 -> cluster 0, 1 -> cluster 1), both in
# the +x family: after one mean update the +y rows pull whichever seed
# they joined toward +y and the partition converges to the two families.
VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),
    (2, [1.0, 0.05, 0.0, 0.0]),
    (3, [0.0, 1.0, 0.0, 0.0]),
    (4, [0.1, 0.9, 0.0, 0.0]),
    (5, [0.0, 1.0, 0.05, 0.0]),
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(VECS, SCHEMA)


def test_kmeans_two_families(emb):
    rows = {r.vec_id: r.cluster_id for r in kmeans_assign(
        emb, n_clusters=2, iters=3
    ).collect()}
    assert len(rows) == 6
    x_family = {rows[0], rows[1], rows[2]}
    y_family = {rows[3], rows[4], rows[5]}
    assert len(x_family) == 1 and len(y_family) == 1
    assert x_family != y_family


def test_kmeans_deterministic(emb):
    a = sorted(map(tuple, kmeans_assign(emb, n_clusters=2, iters=2).collect()))
    b = sorted(map(tuple, kmeans_assign(emb, n_clusters=2, iters=2).collect()))
    assert a == b


def test_kmeans_single_cluster_all_assigned(emb):
    out = kmeans_assign(emb, n_clusters=1, iters=1).collect()
    assert len(out) == 6
    assert {r.cluster_id for r in out} == {0}


def test_kmeans_reliable_checkpoint_dir(emb, tmp_path):
    out = kmeans_assign(
        emb, n_clusters=2, iters=2, checkpoint_dir=str(tmp_path / "ck")
    )
    assert out.count() == 6
    # the reliable checkpoint actually wrote something
    assert any((tmp_path / "ck").rglob("*"))


def test_semantic_dedup_keeps_lowest_id(spark):
    # 0 and 2 are exact duplicates; 1 is distinct; 3/4 near-dups in +y
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 1.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.01, 0.0]),
    ]
    df = spark.createDataFrame(vecs, SCHEMA)
    out = {
        r.vec_id: r.keep
        for r in semantic_dedup(
            df, n_clusters=2, iters=2, threshold=0.99
        ).collect()
    }
    assert out[0] is True          # lowest id of the dup pair survives
    assert out[2] is False         # its exact duplicate is dropped
    assert out[1] is True          # lone vector untouched
    assert out[3] is True and out[4] is False  # near-dup pair: lowest wins


def test_semantic_dedup_threshold_one_epsilon(spark):
    # nothing reaches cosine >= 1.0 except exact dups
    vecs = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0, 0.0])]
    df = spark.createDataFrame(vecs, SCHEMA)
    out = semantic_dedup(df, n_clusters=1, iters=1, threshold=1.0)
    assert all(r.keep for r in out.collect())


def test_kmeans_empty_cluster_drops_out(spark):
    # 3 clusters seeded but only 2 distinct directions: one seed loses all
    # members after the first update and its id disappears
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.001, 0.0, 0.0]),
        (2, [1.0, 0.002, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.001, 0.0]),
    ]
    df = spark.createDataFrame(vecs, SCHEMA)
    out = kmeans_assign(df, n_clusters=3, iters=3)
    assert out.count() == 5
    assert len({r.cluster_id for r in out.collect()}) <= 3


def test_kmeans_matches_duckdb_replay(spark):
    """Same bit-for-bit parity contract the driver enforces, pinned in a
    unit test on the sf0.001 embeddings table."""
    duckdb = pytest.importorskip("duckdb")
    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not available")
    emb = spark.read.parquet(path)
    got = sorted(
        (r.vec_id, r.cluster_id, float(r.cosine))
        for r in kmeans_assign(emb, n_clusters=5, iters=2).collect()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')"
    )
    cos = (
        "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b})))"
    )
    assign = (
        "SELECT vid, v, cluster_id FROM (SELECT c.vid, c.v, ce.cluster_id,"
        " row_number() OVER (PARTITION BY c.vid ORDER BY "
        + cos.format(a="c.v", b="ce.cv")
        + " DESC, ce.cluster_id ASC) rk FROM c, cents{i} ce) WHERE rk = 1"
    )
    update = (
        "SELECT cluster_id, list(m ORDER BY pos) AS cv FROM ("
        "SELECT cluster_id, pos, avg(x) AS m FROM ("
        "SELECT cluster_id, generate_subscripts(v,1) AS pos, unnest(v) AS x"
        " FROM a{i}) t GROUP BY cluster_id, pos) t2 GROUP BY cluster_id"
    )
    want = sorted(
        (r[0], r[1], float(r[2]))
        for r in con.sql(
            "WITH c AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v"
            " FROM embeddings),"
            " cents0 AS (SELECT row_number() OVER (ORDER BY vid ASC) - 1"
            " AS cluster_id, v AS cv FROM"
            " (SELECT * FROM c ORDER BY vid ASC LIMIT 5)),"
            f" a0 AS ({assign.format(i=0)}),"
            f" cents1 AS ({update.format(i=0)}),"
            f" a1 AS ({assign.format(i=1)}),"
            f" cents2 AS ({update.format(i=1)}),"
            " af AS (SELECT vid, cluster_id, cos FROM ("
            " SELECT c.vid, ce.cluster_id, "
            + cos.format(a="c.v", b="ce.cv")
            + " AS cos, row_number() OVER (PARTITION BY c.vid ORDER BY "
            + cos.format(a="c.v", b="ce.cv")
            + " DESC, ce.cluster_id ASC) rk FROM c, cents2 ce) WHERE rk = 1)"
            " SELECT vid, cluster_id, round(cos, 6) FROM af"
        ).fetchall()
    )
    assert got == want


def test_pca_dominant_component_rank1_exact(spark):
    from ahrd_spark.operators.pca import dominant_component, project_dominant

    # rank-1 data along (0.6, 0.8): one power step recovers the direction
    # exactly (covariance is an outer product), sign fixed by the uniform
    # positive start vector
    rows = [(i, [t * 0.6, t * 0.8]) for i, t in enumerate([-2.0, -1.0, 1.0, 2.0])]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    comp = {r["dim"]: (r["mu"], r["loading"])
            for r in dominant_component(emb, iters=2).collect()}
    assert abs(comp[1][0]) < 1e-12 and abs(comp[2][0]) < 1e-12
    assert abs(comp[1][1] - 0.6) < 1e-12
    assert abs(comp[2][1] - 0.8) < 1e-12

    proj = {r["id"]: r["proj"] for r in project_dominant(emb, iters=2).collect()}
    for i, t in enumerate([-2.0, -1.0, 1.0, 2.0]):
        assert abs(proj[i] - t) < 1e-12


def test_pca_matches_numpy_power_iteration(spark):
    import numpy as np

    from ahrd_spark.operators.pca import dominant_component

    rng = np.random.default_rng(11)
    X = rng.normal(size=(40, 6)) @ np.diag([3.0, 2.0, 1.0, 0.5, 0.3, 0.1])
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    got = {r["dim"]: r["loading"]
           for r in dominant_component(emb, iters=3).collect()}

    # identical math in NumPy: centered C*v identity, 3 iterations,
    # uniform unit start
    mu = X.mean(axis=0)
    C = (X - mu).T @ (X - mu) / X.shape[0]
    v = np.ones(6) / np.sqrt(6)
    for _ in range(3):
        w = C @ v
        v = w / np.linalg.norm(w)
    for j in range(6):
        assert abs(got[j + 1] - v[j]) < 1e-9, (j, got[j + 1], v[j])
