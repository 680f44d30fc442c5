"""Graph analytics over edge tables — PageRank for entity salience.

A knowledge-graph pipeline needs more than canonicalization (connected
components, ``connected_components.py``): once (subj, pred, obj) triples
materialize, ranking entities by link structure is the standard salience
signal (which GO terms / descriptors dominate the graph).  This module
implements damped PageRank as a deterministic, replayable DataFrame loop.

Semantics (classic Brin-Page with uniform dangling redistribution):
- nodes = union of edge endpoints; rank initialized to 1/N;
- per iteration: every node sends rank/out_degree along each out-edge;
  the rank mass of dangling nodes (no out-edges) is redistributed
  uniformly; new_rank = (1-d)/N + d * (in_mass + dangling_mass/N).
  Total rank mass stays 1 every iteration.

Scale shape:
- the edges ⋈ out_degree join happens ONCE, outside the loop (both sides
  keyed by src — one co-partitioned shuffle), and the result is cached;
- each iteration is exactly two shuffles: ranks ⋈ weighted-edges on src,
  then groupBy(dst) sum with map-side partial agg.  The dangling-mass and
  node-count terms are 1-row frames (global agg riding the same ranks
  scan) cross-joined back — never a driver collect;
- the ranks frame is checkpointed per iteration (reliable
  ``checkpoint_dir`` option, localCheckpoint fallback — same contract as
  ``connected_components`` / the closure loops) so the plan stays flat at
  any iteration count;
- no comparisons ride on floats (pure arithmetic), so cross-engine ulp
  noise never flips a row — the DuckDB oracle replays the same unrolled
  iterations and matches at 6-decimal rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """-> (node, rank): damped PageRank after ``iters`` synchronous
    iterations over the DISTINCT edge set (multi-edges collapse to one;
    self-loops count as ordinary edges)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_count = nodes.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    out_deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    # per-edge transfer weight fixed across iterations: join once, cache
    weighted = e.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    )
    weighted = weighted.persist()
    has_out = out_deg.select(F.col("src").alias("node"))

    ranks = nodes.crossJoin(F.broadcast(n_count)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    try:
        for _ in range(iters):
            in_mass = (
                ranks.join(weighted, ranks["node"] == weighted["src"])
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w")).alias("m"))
                .withColumnRenamed("dst", "node")
            )
            dangling = (
                ranks.join(has_out, "node", "left_anti")
                .groupBy()
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            ranks = (
                nodes.join(in_mass, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .crossJoin(F.broadcast(n_count))
                .select(
                    "node",
                    (
                        (1.0 - damping) / F.col("n")
                        + damping
                        * (
                            F.coalesce(F.col("m"), F.lit(0.0))
                            + F.col("dm") / F.col("n")
                        )
                    ).alias("rank"),
                )
            )
            ranks = (
                ranks.checkpoint(eager=True)
                if checkpoint_dir
                else ranks.localCheckpoint(eager=True)
            )
    finally:
        weighted.unpersist()
    return ranks


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """-> (node, rank): personalized PageRank — teleport and dangling mass
    return to the SEED set (uniformly) instead of all nodes, so rank
    measures proximity-weighted salience relative to the seeds.  This is
    the standard entity-disambiguation signal for KG linking: seed the
    mention's unambiguous neighbor entities and rank the candidate
    senses.  Seeds not present in the edge set still emit teleport mass
    (they join the node universe); mass stays 1 every iteration.

    Same loop shape, checkpoint contract, and scale notes as ``pagerank``:
    the edges x out-degree join happens once and is cached; each
    iteration is one src-keyed join + one dst-keyed partial agg; restart
    and dangling terms ride broadcast 1-row / seed-flag frames.  The
    restart vector is a COLUMN (r0), never a driver-side map."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    seed_nodes = seeds.select(F.col(seed_col).alias("node")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .union(seed_nodes)
        .distinct()
    )
    n_count = seed_nodes.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("s")
    )
    # r0: 1/|S| on seeds, 0 elsewhere — the personalization vector
    base = (
        nodes.join(seed_nodes.withColumn("is_seed", F.lit(1)), "node", "left")
        .crossJoin(F.broadcast(n_count))
        .select(
            "node",
            F.when(F.col("is_seed") == 1, F.lit(1.0) / F.col("s"))
            .otherwise(F.lit(0.0))
            .alias("r0"),
        )
    )
    base = base.persist()
    out_deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    weighted = e.join(out_deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    )
    weighted = weighted.persist()
    has_out = out_deg.select(F.col("src").alias("node"))

    ranks = base.select("node", F.col("r0").alias("rank"))
    try:
        for _ in range(iters):
            in_mass = (
                ranks.join(weighted, ranks["node"] == weighted["src"])
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("w")).alias("m"))
                .withColumnRenamed("dst", "node")
            )
            dangling = (
                ranks.join(has_out, "node", "left_anti")
                .groupBy()
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            ranks = (
                base.join(in_mass, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        (1.0 - damping) * F.col("r0")
                        + damping
                        * (
                            F.coalesce(F.col("m"), F.lit(0.0))
                            + F.col("dm") * F.col("r0")
                        )
                    ).alias("rank"),
                )
            )
            ranks = (
                ranks.checkpoint(eager=True)
                if checkpoint_dir
                else ranks.localCheckpoint(eager=True)
            )
    finally:
        weighted.unpersist()
        base.unpersist()
    return ranks


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """-> (node, community): synchronous label propagation after ``iters``
    rounds — each node adopts its neighbors' most frequent label
    (ties -> smallest label; labels start as the node's own id).

    Communities refine connected components for KG canonicalization:
    a synonym blob that CC fuses into one component often contains
    several dense senses bridged by a single noisy edge — LPA keeps the
    dense cores apart.  Deterministic by construction (fixed iteration
    count, total-order tie-break), so the DuckDB oracle replays it
    exactly; synchronous updates can oscillate on bipartite structure,
    which fixed ``iters`` turns into a stable, replayable output rather
    than a convergence hazard.

    Scale shape: one edges ⋈ labels join (src-keyed) + one (node, label)
    partial-agg count + one per-node top-1 window per round; the labels
    frame is re-checkpointed per round (same ``checkpoint_dir`` contract
    as ``pagerank``).  Hot nodes are AQE skew-join territory; no driver
    state."""
    from pyspark.sql import Window

    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    e = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nodes = e.select(F.col("src").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("community"))
    top1 = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("community").asc()
    )
    for _ in range(iters):
        counts = (
            labels.join(e, labels["node"] == e["src"])
            .select(F.col("dst").alias("node"), "community")
            .groupBy("node", "community")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(top1))
            .filter(F.col("rn") == 1)
            .select("node", "community")
        )
        labels = (
            labels.checkpoint(eager=True)
            if checkpoint_dir
            else labels.localCheckpoint(eager=True)
        )
    return labels


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 4,
    directed: bool = True,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    seed_col: str = "node",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Bounded-hop weighted single-source(-set) shortest paths ->
    (node, dist): ``iters`` rounds of Bellman-Ford relaxation from the
    seed set (dist 0), so the result is the cheapest path using at most
    ``iters`` edges — the weighted generalization of ``khop_nodes``
    (edge weights = link-score costs, trust penalties, 1/evidence).

    Deterministic: dist is a MIN over identically-constructed float sums,
    so equal-cost path ties cannot diverge across engines — the DuckDB
    oracle replays the unrolled rounds exactly.

    Scale shape: multi-edges pre-collapse to their min weight once; each
    round is one dist ⋈ edges join (src-keyed) + one min-agg keyed by
    node (map-side partial), dist re-checkpointed per round (same
    ``checkpoint_dir`` contract as ``pagerank``).  Unreached nodes never
    enter the frame."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    )
    if not directed:
        e = e.union(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
            )
        )
    e = e.groupBy("src", "dst").agg(F.min("w").alias("w"))
    e = e.persist()

    dist = seeds.select(F.col(seed_col).alias("node")).distinct().select(
        "node", F.lit(0.0).alias("dist")
    )
    try:
        for _ in range(iters):
            cand = dist.join(e, dist["node"] == e["src"]).select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            dist = (
                dist.unionAll(cand)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
            )
            dist = (
                dist.checkpoint(eager=True)
                if checkpoint_dir
                else dist.localCheckpoint(eager=True)
            )
    finally:
        e.unpersist()
    return dist


def neighbor_jaccard(
    edges: DataFrame,
    min_shared: int = 1,
    max_block_degree: int | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Structural entity-resolution candidates: node pairs scored by the
    Jaccard similarity of their (undirected) neighbor sets ->
    (a, b, shared, deg_a, deg_b, jaccard) with a < b and
    ``shared >= min_shared``.

    Two KG entities whose neighborhoods mostly coincide are merge
    candidates even when no synonym edge links them directly — this is
    the relational complement of the lexical/embedding dedup family.

    Block-then-verify shape (same contract as LSH -> exact-Jaccard in
    ``dedup.py``): candidate pairs are generated ONLY through shared
    neighbors, and ``max_block_degree`` skips hub middles during
    generation (a neighbor shared by millions of nodes — the stopword
    analog — would wedge-explode; pairs whose ONLY shared neighbors are
    such hubs are not generated, the documented recall trade).  Emitted
    scores are EXACT regardless of the cap: the intersection is counted
    by middle-degree class — low-degree middles fall straight out of the
    wedge join (one wedge row per shared middle, so a groupBy count IS
    the low-side intersection; no second pass over the full adjacency),
    and the hub remainder comes from one join against the hub-middle
    slice only (``deg > cap``, by construction a small fraction of the
    adjacency — this is what keeps verification off the
    |candidates| x degree full-adjacency join)."""
    adj = edges.select(F.col(src_col).alias("node"), F.col(dst_col).alias("nbr"))
    adj = adj.union(
        adj.select(F.col("nbr").alias("node"), F.col("node").alias("nbr"))
    ).filter(F.col("node") != F.col("nbr")).distinct()
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))

    block = adj.select(F.col("nbr").alias("v"), F.col("node").alias("x"))
    if max_block_degree is not None:
        ok = deg.filter(F.col("deg") <= max_block_degree).select(
            F.col("node").alias("v")
        )
        block = block.join(ok, "v")
    # one wedge row per (low-degree shared middle, pair) -> the count is
    # exactly |{v in N(a) ∩ N(b) : deg(v) <= cap}|
    low = (
        block.select("v", F.col("x").alias("a"))
        .join(block.select("v", F.col("x").alias("b")), "v")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w_low"))
    )
    if max_block_degree is None:
        shared = low.select("a", "b", F.col("w_low").alias("shared"))
    else:
        hub = deg.filter(F.col("deg") > max_block_degree).select(
            F.col("node").alias("v")
        )
        hub_adj = adj.select(F.col("nbr").alias("v"), F.col("node").alias("x")).join(
            hub, "v"
        )
        high = (
            low.select("a", "b")
            .join(
                hub_adj.select(F.col("x").alias("a"), "v"),
                "a",
            )
            .join(hub_adj.select(F.col("x").alias("b"), "v"), ["b", "v"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("w_high"))
        )
        shared = (
            low.join(high, ["a", "b"], "left")
            .select(
                "a",
                "b",
                (F.col("w_low") + F.coalesce("w_high", F.lit(0))).alias("shared"),
            )
        )
    shared = shared.filter(F.col("shared") >= min_shared)
    return (
        shared.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b")), "b")
        .select(
            "a",
            "b",
            "shared",
            "deg_a",
            "deg_b",
            (
                F.col("shared")
                / (F.col("deg_a") + F.col("deg_b") - F.col("shared"))
            ).alias("jaccard"),
        )
    )


def kg_negative_samples(
    triples: DataFrame,
    salt: str = "",
    buckets: int = 64,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Filtered negative sampling for KG link-prediction training ->
    one corrupted triple (subj, pred, obj_neg) per input triple, with
    accidental TRUE triples removed (the standard TransE-family protocol:
    corrupt the tail, then filter positives so the loss never pushes a
    real edge apart).

    Fully deterministic — no randomness: the replacement entity is chosen
    by the portable 60-bit md5 of (triple, salt), so the same corpus and
    salt always yield the same negatives and a new salt yields an
    independent draw (same reproducibility contract as
    ``weighted_sample``).

    Scale shape — no global index: a global row_number over the entity
    dictionary would funnel every entity through one reducer, so
    selection is two-level instead: hash the triple to an entity BUCKET
    (md5 % buckets), rank entities WITHIN each bucket (per-bucket window,
    distributed), and pick rank = md5' % bucket_size.  The entity-pick
    join is keyed by (bucket, rank); bucket-size skew is hash-bounded.
    Slight non-uniformity across unequal buckets is the documented trade
    for never materializing a global order.
    """
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    from ahrd_spark.functions.hashing import md5_prefix60

    t = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    )
    ents = (
        t.select(F.col("subj").alias("entity"))
        .union(t.select(F.col("obj").alias("entity")))
        .distinct()
    )
    ents = ents.withColumn(
        "bkt", (md5_prefix60(F.col("entity")) % buckets).cast("int")
    )
    rank_w = Window.partitionBy("bkt").orderBy(F.col("entity").asc())
    ents = ents.withColumn("rnk", F.row_number().over(rank_w) - 1)
    sizes = ents.groupBy("bkt").agg(F.count(F.lit(1)).alias("bkt_n"))
    # Triples hash onto NON-EMPTY buckets only, via a dense bucket index:
    # when distinct entities < buckets (or a hash residue is simply
    # unoccupied), `h1 % buckets` would land some triples in an
    # entity-empty bucket and the inner join would silently drop them,
    # breaking the one-negative-per-triple contract.  The sizes frame is
    # <= `buckets` rows, so the global window and the driver count are
    # dictionary-sized, not data-sized.
    dense_w = Window.orderBy(F.col("bkt").asc())
    sizes = sizes.withColumn("bidx", F.row_number().over(dense_w) - 1)
    n_nonempty = sizes.count()
    if n_nonempty == 0:
        return t.select(
            "subj", "pred", F.col("obj").alias("obj_pos"),
            F.lit(None).cast("string").alias("obj_neg"),
        ).limit(0)

    key = F.concat_ws(chr(31), F.col("subj"), F.col("pred"), F.col("obj"))
    h1 = md5_prefix60(F.concat(key, F.lit(":b:" + salt)))
    h2 = md5_prefix60(F.concat(key, F.lit(":r:" + salt)))
    picked = (
        t.withColumn("bidx", (h1 % n_nonempty).cast("int"))
        .join(sizes, "bidx")
        .withColumn("rnk", (h2 % F.col("bkt_n")).cast("int"))
        .join(ents.select("bkt", "rnk", F.col("entity").alias("obj_neg")),
              ["bkt", "rnk"])
        .select("subj", "pred", "obj", "obj_neg")
    )
    # filtered protocol: drop corruptions that are real edges or no-ops
    return (
        picked.filter(F.col("obj_neg") != F.col("obj"))
        .join(
            t.select("subj", "pred", F.col("obj").alias("obj_neg")),
            ["subj", "pred", "obj_neg"],
            "left_anti",
        )
        .select("subj", "pred", F.col("obj").alias("obj_pos"), "obj_neg")
    )


# ---------------------------------------------------------------------------
# KG maintenance: summary statistics and incremental snapshot merge.
# ---------------------------------------------------------------------------

def predicate_stats(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Per-predicate graph summary: (pred, n_triples, n_subjects,
    n_objects).  One hash aggregation keyed by predicate; the distinct
    counts are Spark's two-phase distinct-aggregate expansion (partials
    map-side), so a predicate appearing in 10^11 triples never funnels raw
    rows to one reducer.  Predicates are low-cardinality by construction
    (an ontology's relation set), so the final agg is tiny."""
    return triples.groupBy(F.col(pred_col).alias("pred")).agg(
        F.count("*").alias("n_triples"),
        F.countDistinct(subj_col).alias("n_subjects"),
        F.countDistinct(obj_col).alias("n_objects"),
    )


def entity_degree(
    triples: DataFrame,
    subj_col: str = "subj",
    obj_col: str = "obj",
) -> DataFrame:
    """Per-entity degree summary: (entity, out_degree, in_degree, degree).
    Subjects contribute out-edges, objects in-edges; a node missing on one
    side counts 0 there.  Two entity-keyed hash aggs + one outer merge —
    all shuffles keyed by entity hash.  Hot entities (a GO term every
    protein links) are safe: count aggs combine map-side, so the reducer
    sees one partial per upstream partition, not one row per triple."""
    out_d = triples.groupBy(F.col(subj_col).alias("entity")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = triples.groupBy(F.col(obj_col).alias("entity")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, "entity", "full_outer")
        .select(
            "entity",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            (
                F.coalesce("out_degree", F.lit(0))
                + F.coalesce("in_degree", F.lit(0))
            ).alias("degree"),
        )
    )


def degree_histogram(
    triples: DataFrame,
    subj_col: str = "subj",
    obj_col: str = "obj",
) -> DataFrame:
    """Log2-bucketed degree histogram -> (bucket, n_nodes, min_degree,
    max_degree) with ``bucket = floor(log2(degree))`` — the KG-health
    dashboard row: a healthy entity graph shows a power-law tail, a
    boilerplate flood shows one monster bucket.  Bucket is computed as
    ``length(bin(degree)) - 1`` (integer bit-length), never a float log,
    so engine libm differences can't shift a power-of-two edge across
    buckets.  Piggybacks on ``entity_degree``; the histogram agg is
    bucket-keyed (max ~64 buckets) with map-side partials."""
    deg = entity_degree(triples, subj_col=subj_col, obj_col=obj_col)
    return (
        deg.select(
            (F.length(F.bin(F.col("degree"))) - 1).cast("int").alias("bucket"),
            "degree",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("degree").alias("min_degree"),
            F.max("degree").alias("max_degree"),
        )
    )


def merge_triples(
    existing: DataFrame,
    incoming: DataFrame,
    score_col: str = "score",
    snapshot_col: str = "snapshot",
) -> DataFrame:
    """Incremental KG upsert: union an existing graph table with a new
    extraction snapshot and collapse per (subj, pred, obj):

        (subj, pred, obj, n_evidence, best_score, first_snapshot,
         last_snapshot)

    ``n_evidence``  total supporting rows across both inputs,
    ``best_score``  max score seen,
    ``first/last_snapshot``  min/max of ``snapshot_col``.

    Each input is either RAW extraction rows (subj, pred, obj, score,
    snapshot — every row counts 1 evidence) or an ALREADY-MERGED table
    (this function's own output shape, detected by its ``n_evidence``
    column) — so snapshot 3 merges into the merged graph of snapshots
    1-2 and evidence counts ADD across merges instead of resetting.

    Scale shape: ONE hash aggregation keyed by the (s,p,o) hash — uniform
    by construction — with map-side partial aggregation."""

    def _as_evidence(df: DataFrame) -> DataFrame:
        if "n_evidence" in df.columns:  # already-merged shape: pass through
            return df.select(
                "subj", "pred", "obj", "n_evidence", "best_score",
                "first_snapshot", "last_snapshot",
            )
        return df.select(
            "subj", "pred", "obj",
            F.lit(1).cast("bigint").alias("n_evidence"),
            F.col(score_col).alias("best_score"),
            F.col(snapshot_col).alias("first_snapshot"),
            F.col(snapshot_col).alias("last_snapshot"),
        )

    both = _as_evidence(existing).unionByName(_as_evidence(incoming))
    return both.groupBy("subj", "pred", "obj").agg(
        F.sum("n_evidence").alias("n_evidence"),
        F.max("best_score").alias("best_score"),
        F.min("first_snapshot").alias("first_snapshot"),
        F.max("last_snapshot").alias("last_snapshot"),
    )


def new_triples(
    existing: DataFrame,
    incoming: DataFrame,
) -> DataFrame:
    """The snapshot delta: DISTINCT (subj, pred, obj) of ``incoming`` that
    the existing graph does not contain — what an incremental run actually
    adds.  A left-anti hash join on the triple key; both sides dedupe
    before the join (map-side partials), so the join is keeper-vs-keeper,
    never row-vs-row."""
    key = ["subj", "pred", "obj"]
    return (
        incoming.select(*key).distinct()
        .join(existing.select(*key).distinct(), key, "left_anti")
    )


def canonicalize_triples(
    triples: DataFrame,
    sameas_edges: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """owl:sameAs canonicalization applied to the triple table itself ->
    distinct ``(subj, pred, obj)`` with every entity id rewritten to its
    synonym-component representative (MIN id over the connected component
    of ``sameas_edges``, any 2-column frame).  Ids that participate in no
    synonym edge pass through unchanged — canonicalization is a no-op on
    a synonym-free graph.

    This is the standalone form of the pipeline's canonicalize stage
    (plans/pipeline.py): merge duplicate entity nodes discovered by
    matching/linking, then dedupe the rewritten assertions (two aliases
    asserting the same fact collapse to one triple).

    Scale shape: the (node -> canonical) map contains only nodes that
    appear in synonym edges — orders of magnitude smaller than the entity
    universe, and far smaller than the triple table; the two rewrite
    joins are LEFT joins keyed on the entity id (AQE broadcasts the map
    when it fits), and the final distinct is one hash aggregate on the
    triple key.  The CC itself is the two-level contraction scheme in
    operators/connected_components.py.
    """
    from ahrd_spark.operators.connected_components import (
        connected_components,
    )

    m = connected_components(sameas_edges).select(
        "node", F.col("component").alias("_canon")
    )
    t = triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
    )
    ms = m.withColumnRenamed("node", "subj").withColumnRenamed(
        "_canon", "_cs"
    )
    mo = m.withColumnRenamed("node", "obj").withColumnRenamed(
        "_canon", "_co"
    )
    return (
        t.join(ms, "subj", "left")
        .join(mo, "obj", "left")
        .select(
            F.coalesce("_cs", "subj").alias("subj"),
            "pred",
            F.coalesce("_co", "obj").alias("obj"),
        )
        .distinct()
    )


def snapshot_at(
    log: DataFrame,
    at: int,
    ts_col: str = "ts",
    op_col: str = "op",
) -> DataFrame:
    """Reconstruct the triple state at time ``at`` from an add/delete log
    -> distinct ``(subj, pred, obj)``: a triple is live iff its LATEST log
    event with ``ts <= at`` is an ``'add'``.  Same-timestamp conflicts
    resolve delete-wins (``'del' > 'add'`` lexicographically, and the
    ordering sorts op descending after ts), matching the usual
    tombstone-compaction rule of log-structured stores.

    This is the time-travel read of an incrementally-maintained graph:
    ``merge_triples``/``new_triples`` handle snapshot deltas, this replays
    the event log to an arbitrary point.

    Scale shape: one scan-side timestamp filter (partition-prunable when
    the log is date-partitioned, as an Iceberg event log would be), then
    a single window over the triple key — no joins, no iteration.  The
    window's sort is per-triple-key (few events per triple), not global.
    """
    w = Window.partitionBy("subj", "pred", "obj").orderBy(
        F.col(ts_col).desc(), F.col(op_col).desc()
    )
    return (
        log.where(F.col(ts_col) <= at)
        .withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col(op_col) == "add"))
        .select("subj", "pred", "obj")
    )


def triple_provenance(
    assertions: DataFrame,
    sample_k: int = 3,
    doc_col: str = "doc_id",
    source_col: str = "source",
    snapshot_col: str = "snapshot",
) -> DataFrame:
    """Per-triple provenance rollup -> one row per distinct
    ``(subj, pred, obj)`` with ``n_docs``, ``n_sources``,
    ``first_snapshot``/``last_snapshot``, and ``sample_docs`` — the
    ``sample_k`` SMALLEST distinct doc ids '|'-joined (deterministic, so
    two runs and the SQL oracle agree byte-for-byte).

    The materialize stage's audit companion: every emitted triple keeps a
    bounded, queryable trace of where it came from without dragging the
    full evidence list around.

    Scale shape: the sample is bounded BEFORE any collection — a
    row_number window over the distinct (triple, doc) pairs keeps only
    ``sample_k`` rows per triple, so the later collect_list holds at most
    ``sample_k`` elements regardless of how many billions of docs assert
    a boilerplate triple (no giant per-key array ever materializes).
    The stats aggregate and the sample aggregate are both keyed on the
    triple hash and joined co-partitioned.
    """
    key = ["subj", "pred", "obj"]
    stats = assertions.groupBy(*key).agg(
        F.countDistinct(doc_col).alias("n_docs"),
        F.countDistinct(source_col).alias("n_sources"),
        F.min(snapshot_col).alias("first_snapshot"),
        F.max(snapshot_col).alias("last_snapshot"),
    )
    w = Window.partitionBy(*key).orderBy(F.col(doc_col).asc())
    sample = (
        assertions.select(*key, doc_col)
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= sample_k)
        .groupBy(*key)
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.sort_array(F.collect_list(F.col(doc_col))),
                    lambda x: x.cast("string"),
                ),
            ).alias("sample_docs")
        )
    )
    return stats.join(sample, key)


def khop_nodes(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 2,
    directed: bool = False,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """BFS neighborhood expansion: -> (node, hop) where hop is the minimum
    edge distance (<= ``k``) from any seed.  Seeds are hop 0 whether or not
    they appear in the edge table; ``directed=False`` (default) symmetrizes
    the edge set first.  The standard KG workflow this serves: carve the
    k-hop induced subgraph around a query entity set (see
    ``khop_edges``) for local inference / visualization / negative
    sampling without touching the full graph.

    Scale shape: each hop is ONE frontier(node) ⋈ edges(src) join plus one
    anti-join against the visited set — all keyed by node hash; hub nodes
    (a GO term linked by millions of proteins) are exactly the AQE
    skew-join case.  The visited set is re-checkpointed per hop (reliable
    ``checkpoint_dir`` or localCheckpoint fallback — same contract as
    ``pagerank``) so the plan stays flat at any k.  No driver collect; the
    frontier lives distributed end to end.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if not directed:
        e = e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct()

    visited = seeds.select(
        F.col(seed_col).alias("node"), F.lit(0).alias("hop")
    ).distinct()
    visited = (
        visited.checkpoint(eager=True)
        if checkpoint_dir
        else visited.localCheckpoint(eager=True)
    )
    frontier = visited
    for hop in range(1, k + 1):
        reached = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        fresh = reached.join(visited, "node", "left_anti").withColumn(
            "hop", F.lit(hop)
        )
        visited = visited.union(fresh)
        visited = (
            visited.checkpoint(eager=True)
            if checkpoint_dir
            else visited.localCheckpoint(eager=True)
        )
        frontier = visited.filter(F.col("hop") == hop)
        # frontier exhausted -> remaining rounds are no-ops; the count is a
        # scan of the just-materialized checkpoint, not a plan re-run
        if frontier.count() == 0:
            break
    return visited


def khop_edges(
    edges: DataFrame,
    seeds: DataFrame,
    k: int = 2,
    directed: bool = False,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Induced subgraph of the k-hop neighborhood: the original
    (directed) edges whose BOTH endpoints sit within ``k`` hops of the
    seed set under ``khop_nodes`` semantics -> (src, dst, src_hop,
    dst_hop).  Two semi-ish joins of the edge table against the
    (small-relative-to-graph) hop frame — both endpoint-keyed; the full
    edge scan happens once."""
    hops = khop_nodes(
        edges, seeds, k=k, directed=directed, src_col=src_col,
        dst_col=dst_col, seed_col=seed_col, checkpoint_dir=checkpoint_dir,
    )
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    return (
        e.join(hops.withColumnRenamed("node", "src").withColumnRenamed("hop", "src_hop"), "src")
        .join(hops.withColumnRenamed("node", "dst").withColumnRenamed("hop", "dst_hop"), "dst")
        .select("src", "dst", "src_hop", "dst_hop")
    )


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected simple graph ->
    (node, triangles), one row per node in at least one triangle.

    Triangle density is the standard KG-quality diagnostic (clustering
    coefficient numerator): synonym/co-mention graphs with near-zero
    triangle counts are star-shaped boilerplate floods, not communities.

    Scale shape — degree-ordered orientation (the classic
    arboricity-bounded formulation): every undirected edge is directed
    from its (degree, id)-smaller endpoint to the larger one, so each
    wedge is generated at its lowest-ordered corner and each triangle is
    counted EXACTLY once.  Max oriented out-degree is O(sqrt(m))
    regardless of hub size — a billion-follower hub node generates no
    wedge explosion because its edges all point INTO it.  The wedge
    self-join and the closing-edge join are both plain equi-joins keyed
    by node / edge hash (AQE-splittable); per-node counts ride one final
    union + groupBy.  No UDFs; the DuckDB oracle (``triangle_counts``)
    replays the identical orientation + join chain.
    """
    canon = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        canon.select(F.col("u").alias("node"))
        .unionAll(canon.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    with_deg = (
        canon.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
    )
    o1 = oriented.select("a", F.col("b").alias("b1"), F.col("db").alias("db1"))
    o2 = oriented.select("a", F.col("b").alias("b2"), F.col("db").alias("db2"))
    wedges = o1.join(o2, "a").filter(
        (F.col("db1") < F.col("db2"))
        | ((F.col("db1") == F.col("db2")) & (F.col("b1") < F.col("b2")))
    )
    tri = wedges.join(
        oriented.select(F.col("a").alias("b1"), F.col("b").alias("b2")),
        ["b1", "b2"],
    ).select("a", "b1", "b2")
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b1").alias("node")))
        .unionAll(tri.select(F.col("b2").alias("node")))
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Bounded-round k-core peel over an undirected simple graph ->
    (node, deg): the nodes surviving ``rounds`` peel iterations (drop
    every node of degree < k, shrink the edge set, repeat) with their
    degree in the final shrunken graph.

    The exact k-core is this loop run to fixpoint; a FIXED round count
    keeps every round an engine-portable relational expression (and in
    practice a handful of rounds reaches the fixpoint on power-law
    graphs — callers wanting the exact core iterate until the survivor
    count stops changing, same convergence recipe as
    ``connected_components``).  Output degrees are degrees in the
    round-``rounds`` graph and can drop below ``k`` for nodes whose
    neighbors died in the final round — peeling one more round would
    remove them; reporting them is what makes bounded rounds honest.

    Scale shape per round: one degree aggregation plus two
    survivor-semi-joins, all keyed on node id — the same exchange is
    reused, and the edge set only ever shrinks.  No per-row Python.
    """
    if k < 1 or rounds < 1:
        raise ValueError("k and rounds must be >= 1")
    und = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionAll(
            edges.select(
                F.col(dst_col).alias("s"), F.col(src_col).alias("d")
            )
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    for _ in range(rounds):
        keep = (
            und.groupBy("s")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("s")
        )
        und = und.join(keep, "s").join(
            keep.withColumnRenamed("s", "d"), "d"
        )
    return und.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )


def cooccurrence_projection(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_count: int = 1,
    max_group_size: int | None = None,
) -> DataFrame:
    """Project a (group, item) bipartite relation onto weighted
    item-item edges -> (item_a, item_b, n) with ``item_a < item_b`` and
    ``n`` = number of groups containing both — co-purchase graphs from
    baskets, co-citation from papers, entity co-mention from documents.

    ``max_group_size`` is the hub guard: a group holding m items emits
    m*(m-1)/2 pairs, so one viral basket/document can dwarf the rest of
    the join; groups above the cap are dropped ENTIRELY (count-loss
    documented, same blocking trade as ``neighbor_jaccard``).

    Scale shape: dedupe to distinct memberships, one group-keyed
    self-join bounded by the cap, then a pair-keyed count with map-side
    partials.  AQE's skew split handles residual hot groups under the
    cap.
    """
    m = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("i")
    ).distinct()
    if max_group_size is not None:
        sizes = m.groupBy("g").agg(F.count(F.lit(1)).alias("sz"))
        m = m.join(
            sizes.filter(F.col("sz") <= max_group_size).select("g"), "g"
        )
    a = m.select("g", F.col("i").alias("item_a"))
    b = m.select("g", F.col("i").alias("item_b"))
    return (
        a.join(b, "g")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )


def kcore(
    edges: DataFrame,
    k: int,
    max_rounds: int = 64,
    checkpoint_dir: str | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Exact k-core -> (node, deg): :func:`kcore_peel` run to fixpoint —
    peel rounds repeat until the surviving edge set stops shrinking, so
    every returned node has degree >= k within the returned subgraph.

    Convergence recipe shared with ``connected_components``: each round
    materializes the shrunken edge set via checkpoint (``checkpoint_dir``
    -> reliable ``DataFrame.checkpoint`` for real clusters, None ->
    ``localCheckpoint`` for single-process runs) and reads the edge count
    off the materialized blocks — the count is the convergence test AND
    the lineage truncation, so the per-round plan stays constant-depth
    instead of growing by three joins every iteration (the failure mode
    that kills naive iterative DataFrame loops at scale).  Peeling
    removes at least one node per non-converged round, so ``max_rounds``
    is a backstop, not a tuning knob.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sess = edges.sparkSession
    if checkpoint_dir:
        sess.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return (
            df.checkpoint(eager=True)
            if checkpoint_dir
            else df.localCheckpoint(eager=True)
        )

    und = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionAll(
            edges.select(
                F.col(dst_col).alias("s"), F.col(src_col).alias("d")
            )
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    und = _ckpt(und)
    n_edges = und.count()
    converged = n_edges == 0
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        keep = (
            und.groupBy("s")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("s")
        )
        nxt = _ckpt(
            und.join(keep, "s").join(keep.withColumnRenamed("s", "d"), "d")
        )
        n_next = nxt.count()
        converged = n_next == n_edges  # edge set stopped shrinking
        und, n_edges = nxt, n_next
        if converged:
            break
    if not converged and n_edges > 0:
        # Peeling can remove as few as 2 nodes per round (e.g. a long
        # path with k=2), so a fixed max_rounds can exit before the
        # fixpoint and the result would contain degree < k survivors —
        # refuse to return a non-k-core silently.
        raise RuntimeError(
            f"kcore(k={k}) did not reach fixpoint within "
            f"max_rounds={max_rounds} ({n_edges} edges still shrinking); "
            "raise max_rounds"
        )
    return und.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )


def degree_assortativity_profile(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Degree-mixing profile -> (deg, avg_neighbor_deg, n_nodes): for
    each undirected-degree class, the mean over its nodes of the mean
    neighbor degree.  Assortative graphs (social) slope up, dissortative
    ones (web, biology) slope down; a KG whose profile flips between
    snapshots changed its growth regime (or its extractor broke).

    Scale shape: one degree aggregation, one edge->degree join per
    endpoint (node-keyed, AQE-skewable), then two bounded aggregations
    (nodes, then degree classes — output is bounded by max degree).
    """
    und = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionAll(
            edges.select(
                F.col(dst_col).alias("s"), F.col(src_col).alias("d")
            )
        )
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    deg = und.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    nbr = (
        und.join(deg.withColumnRenamed("s", "d")
                    .withColumnRenamed("deg", "deg_d"), "d")
        .groupBy("s")
        .agg(F.avg("deg_d").alias("avg_nbr"))
    )
    return (
        deg.join(nbr, "s")
        .groupBy("deg")
        .agg(
            F.avg("avg_nbr").alias("avg_neighbor_deg"),
            F.count(F.lit(1)).alias("n_nodes"),
        )
    )


def predicate_symmetry(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Ontology-inference stat: per predicate -> (pred, n, n_sym,
    sym_ratio) where ``n_sym`` counts distinct triples whose exact
    inverse (obj, pred, subj) is also asserted.  A ratio near 1 flags a
    symmetric property (spouse-of, linked-to) the schema should declare;
    a ratio that DRIFTS between snapshots flags an extractor emitting
    accidental inverses.

    Scale shape: distinct triples, then one self-join keyed on
    (pred, subj, obj) vs (pred, obj, subj) — a plain equi-join after
    column swap, partitioned by the same key layout, then a per-pred
    aggregate (output bounded by predicate count).
    """
    t = triples.select(
        F.col(pred_col).alias("p"),
        F.col(subj_col).alias("s"),
        F.col(obj_col).alias("o"),
    ).distinct()
    inv = t.select("p", F.col("o").alias("s"), F.col("s").alias("o"))
    sym = (
        t.join(inv, ["p", "s", "o"], "left_semi")
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_sym"))
    )
    return (
        t.groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(sym, "p", "left")
        .select(
            F.col("p").alias("pred"),
            "n",
            F.coalesce("n_sym", F.lit(0)).alias("n_sym"),
            F.round(
                F.coalesce("n_sym", F.lit(0)) / F.col("n"), 6
            ).alias("sym_ratio"),
        )
    )


def predicate_functionality(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Ontology-inference stat: per predicate -> (pred, n_subjects,
    avg_objects, max_objects, functional) over DISTINCT triples.  A
    predicate whose every subject has exactly one object is functional
    (birth-date, canonical-id) — and a functional predicate suddenly
    averaging 1.4 objects per subject means the upstream extractor
    started double-emitting.

    Scale shape: distinct triples, a (pred, subj)-keyed count, then a
    per-pred aggregate; all map-side-combinable.
    """
    t = triples.select(
        F.col(pred_col).alias("p"),
        F.col(subj_col).alias("s"),
        F.col(obj_col).alias("o"),
    ).distinct()
    per_subj = t.groupBy("p", "s").agg(F.count(F.lit(1)).alias("k"))
    return per_subj.groupBy("p").agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.round(F.avg("k"), 6).alias("avg_objects"),
        F.max("k").alias("max_objects"),
        (F.max("k") == 1).cast("int").alias("functional"),
    ).withColumnRenamed("p", "pred")


def hits_scores(
    edges: DataFrame,
    iters: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Kleinberg HITS -> ``(node, hub, authority)`` after ``iters``
    synchronous iterations over the DISTINCT edge set.

    In a knowledge graph the two scores separate roles PageRank merges:
    an aggregator page linking to many canonical entities is a hub; a
    canonical entity referenced by many good hubs is an authority — the
    standard signal for picking the canonical node of an entity cluster
    when synonym edges are directional (mention -> entity).

    Update rule (max-normalized, the float-stable variant: dividing by
    the max is one multiply per row and replays exactly in any engine,
    while L2 norms inject a sqrt whose last-bit noise compounds across
    iterations): ``a(v) = sum_{u->v} h(u)``, ``h(u) = sum_{u->v} a(v)``,
    each rescaled by its global max every iteration.  Nodes with no
    in-edges hold authority 0; no out-edges -> hub 0.

    Scale shape mirrors :func:`pagerank`: per iteration exactly two
    node-keyed join+partial-agg shuffles (edges never re-shuffle; the
    global max is a 1-row aggregate broadcast back), scores checkpointed
    per iteration so the plan stays flat at any iteration count.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    scores = nodes.select(
        "node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
    )

    def _ckpt(df: DataFrame) -> DataFrame:
        return (
            df.checkpoint(eager=True)
            if checkpoint_dir
            else df.localCheckpoint(eager=True)
        )

    try:
        for _ in range(iters):
            # authority pass: pull hub mass along in-edges
            auth = (
                scores.select(F.col("node").alias("src"), "hub")
                .join(e, "src")
                .groupBy("dst")
                .agg(F.sum("hub").alias("a_raw"))
            )
            a_max = auth.groupBy().agg(
                F.coalesce(F.max("a_raw"), F.lit(1.0)).alias("a_max")
            )
            auth_n = auth.crossJoin(F.broadcast(a_max)).select(
                F.col("dst").alias("node"),
                (F.col("a_raw") / F.col("a_max")).alias("authority"),
            )
            # hub pass: pull the NEW authority mass along out-edges
            hub = (
                auth_n.select(F.col("node").alias("dst"), "authority")
                .join(e, "dst")
                .groupBy("src")
                .agg(F.sum("authority").alias("h_raw"))
            )
            h_max = hub.groupBy().agg(
                F.coalesce(F.max("h_raw"), F.lit(1.0)).alias("h_max")
            )
            hub_n = hub.crossJoin(F.broadcast(h_max)).select(
                F.col("src").alias("node"),
                (F.col("h_raw") / F.col("h_max")).alias("hub"),
            )
            scores = _ckpt(
                nodes.join(hub_n, "node", "left")
                .join(auth_n, "node", "left")
                .select(
                    "node",
                    F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
                    F.coalesce(
                        F.col("authority"), F.lit(0.0)
                    ).alias("authority"),
                )
            )
    finally:
        e.unpersist()
    return scores


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 1,
    seed: str = "w",
    max_degree: int | None = None,
    checkpoint_dir: str | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Deterministic hash-seeded random walks over the graph ->
    ``(start, walk_ix, path: array<string>)``, one row per (start node,
    walk index): the DeepWalk/node2vec corpus-generation step
    (Perozzi et al., KDD 2014) re-expressed so the walks are a PURE
    FUNCTION of (graph, seed) — stable across runs, partition layouts,
    and engines (the DuckDB oracle replays every hop), unlike RNG-driven
    samplers whose corpora can never be rebuilt bit-identically.

    Each hop from node u at step t of walk w started at node v picks
    ``sorted_neighbors(u)[ md5_prefix60(u|v|t|w|seed) % degree(u) ]`` —
    uniform over neighbors, independent across (node, START, step, walk)
    by the hash.  The walk's START is in the hash input on purpose: two
    walks with the same walk index that happen to reach the same node at
    the same step would otherwise make identical picks and coalesce
    permanently, correlating the DeepWalk corpus and biasing downstream
    skip-gram counts.  Dead-end nodes truncate their walk (path keeps
    what it has).

    ``max_degree``: optional deterministic cap — only the first
    ``max_degree`` SORTED neighbors participate, bounding the per-node
    adjacency row a celebrity hub would otherwise materialize (the
    documented-exclusion contract of the metapath/chain hub caps).

    Scale shape: adjacency built once ((src)-keyed hash agg, sorted
    arrays); each of the ``walk_len`` hops is ONE join of the walk
    frontier against the adjacency keyed on the current node, frontier
    checkpointed per hop (``checkpoint_dir`` on clusters, localCheckpoint
    fallback) so plan lineage stays constant-depth.  Walk state carries
    the path array only — rows never fan out (one row per walk
    throughout).
    """
    if walk_len < 1 or walks_per_node < 1:
        raise ValueError("walk_len and walks_per_node must be >= 1")
    from ahrd_spark.functions.hashing import md5_prefix60

    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return (
            df.checkpoint(eager=True)
            if checkpoint_dir
            else df.localCheckpoint(eager=True)
        )

    e = edges.select(
        F.col(src_col).cast("string").alias("node"),
        F.col(dst_col).cast("string").alias("dst"),
    ).distinct()
    nbrs = e.groupBy("node").agg(
        F.array_sort(F.collect_set("dst")).alias("nbrs")
    )
    if max_degree is not None:
        nbrs = nbrs.select(
            "node", F.slice("nbrs", 1, max_degree).alias("nbrs")
        )
    nbrs = nbrs.persist()

    starts = (
        e.select("node")
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    walks = starts.crossJoin(
        spark.range(walks_per_node).select(
            F.col("id").cast("int").alias("walk_ix")
        )
    ).select(
        F.col("node").alias("start"),
        "walk_ix",
        F.col("node").alias("cur"),
        F.array(F.col("node")).alias("path"),
    )
    walks = _ckpt(walks)
    try:
        for t in range(1, walk_len + 1):
            joined = walks.join(
                nbrs, walks["cur"] == nbrs["node"], "left_outer"
            )
            deg = F.size("nbrs")
            idx = (
                md5_prefix60(
                    F.concat_ws(
                        "|",
                        F.col("cur"),
                        F.col("start"),
                        F.lit(str(t)),
                        F.col("walk_ix").cast("string"),
                        F.lit(seed),
                    )
                )
                % deg
            ).cast("int")
            nxt = F.when(
                F.col("nbrs").isNull() | (deg == 0), F.lit(None)
            ).otherwise(F.element_at("nbrs", idx + F.lit(1)))
            walks = _ckpt(
                joined.select(
                    "start",
                    "walk_ix",
                    nxt.alias("cur"),
                    F.when(nxt.isNull(), F.col("path"))
                    .otherwise(F.array_append("path", nxt))
                    .alias("path"),
                )
            )
        return walks.select("start", "walk_ix", "path")
    finally:
        nbrs.unpersist()


def skipgram_pairs(
    walks: DataFrame,
    window: int = 2,
    path_col: str = "path",
) -> DataFrame:
    """Skip-gram (center, context) pair extraction from walk/token
    sequences -> ``(center, context, n)``: for every position in every
    path, each neighbor within ``window`` hops (both directions,
    excluding the position itself) contributes one pair occurrence —
    the word2vec/DeepWalk training-pair step downstream of
    ``random_walks``.

    Pairs are DIRECTIONAL position pairs (center at i, context at j,
    0 < |i-j| <= window), so a node adjacent on both sides contributes
    twice — the standard skip-gram counting.

    Scale shape: pair generation happens INSIDE each row with one
    posexplode (paths are walk_len-bounded arrays, so per-row fan-out is
    <= walk_len x 2·window — a constant), then one hash aggregate on
    (center, context) with map-side partials.  No joins, no
    corpus-sized shuffle beyond the final count.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    p = F.col(path_col)
    pos = F.posexplode(p)
    exploded = walks.select(p.alias("_p"), pos.alias("i", "center"))
    lo = F.greatest(F.col("i") - window, F.lit(0))
    # slice is 1-based; take [lo, i-1] and [i+1, i+window] around i
    before = F.slice(
        F.col("_p"), lo + 1, F.col("i") - lo
    )
    after = F.slice(
        F.col("_p"),
        F.col("i") + 2,
        F.least(
            F.lit(window),
            F.size("_p") - F.col("i") - 1,
        ),
    )
    ctx = F.explode(F.concat(before, after))
    return (
        exploded.select("center", ctx.alias("context"))
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def contract_graph(
    edges: DataFrame,
    mapping: DataFrame,
    keep_self: bool = False,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Contract a graph along a node -> group mapping (community ids
    from ``lpa_communities``, canonical ids from connected components,
    type buckets) -> the weighted supergraph
    ``(src_group, dst_group, weight)`` where ``weight`` counts the
    distinct underlying edges between the two groups — the coarsening
    step of multilevel graph processing and the community-interaction
    summary a KG dashboard reads.

    ``keep_self=False`` (default) drops intra-group edges (the usual
    coarsening contract); ``True`` keeps them as self-loops carrying the
    group's internal edge count.

    ``mapping`` — ``(node, group)`` rows, node-unique.  This is
    graph-sized, NOT dictionary-sized: both relabel joins key on the
    node column with the edge table hash-partitioned the same way — no
    broadcast, the shape that survives a 10^12-edge graph.

    Scale shape: edges dedup once; two node-keyed equi-joins (src then
    dst relabel); one (group, group) hash aggregate, map-side
    combinable.  Output is group-pair-bounded, not edge-bounded.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    m_src = mapping.select(
        F.col("node").alias("src"), F.col("group").alias("src_group")
    )
    m_dst = mapping.select(
        F.col("node").alias("dst"), F.col("group").alias("dst_group")
    )
    relabeled = e.join(m_src, "src").join(m_dst, "dst")
    if not keep_self:
        relabeled = relabeled.where(
            F.col("src_group") != F.col("dst_group")
        )
    return relabeled.groupBy("src_group", "dst_group").agg(
        F.count(F.lit(1)).alias("weight")
    )


def weighted_random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 1,
    seed: str = "w",
    max_degree: int | None = None,
    checkpoint_dir: str | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> DataFrame:
    """Weight-biased deterministic random walks ->
    ``(start, walk_ix, path: array<string>)``: like ``random_walks`` but
    each hop picks a neighbor with probability proportional to its
    INTEGER edge weight (evidence counts, co-occurrence counts — the
    natural KG edge weights), still a pure function of (graph, seed).

    Selection is integer-exact, never a float threshold: hop t of walk
    w started at v, sitting at node u, draws ``target =
    md5_prefix60(u|v|t|w|seed) mod total_weight(u)`` (start in the hash
    so same-index walks meeting at a node do not coalesce — see
    ``random_walks``) and walks the dst-sorted neighbor list to the
    first neighbor whose cumulative weight exceeds the target — uniform
    over weight mass, identical in every engine (a float fraction would
    risk an ulp flip at a cumsum boundary).  Multi-edges SUM their
    weights first; non-positive weights are dropped; dead ends truncate
    the walk.

    ``max_degree``: optional deterministic cap — only the first
    ``max_degree`` dst-sorted neighbors (and their weight mass)
    participate, the same documented-exclusion contract as
    ``random_walks``.

    Scale shape: identical to ``random_walks`` — adjacency (arrays of
    (dst, weight) structs + one total) built once, one frontier ⋈
    adjacency join per hop with the in-row cumulative scan done by an
    array fold (no per-hop window shuffle), frontier checkpointed per
    hop.
    """
    if walk_len < 1 or walks_per_node < 1:
        raise ValueError("walk_len and walks_per_node must be >= 1")
    from ahrd_spark.functions.hashing import md5_prefix60

    spark = edges.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return (
            df.checkpoint(eager=True)
            if checkpoint_dir
            else df.localCheckpoint(eager=True)
        )

    e = (
        edges.select(
            F.col(src_col).cast("string").alias("node"),
            F.col(dst_col).cast("string").alias("dst"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .where(F.col("w") > 0)
        .groupBy("node", "dst")
        .agg(F.sum("w").alias("w"))
    )
    nbrs = e.groupBy("node").agg(
        F.array_sort(F.collect_list(F.struct("dst", "w"))).alias("nbrs")
    )
    if max_degree is not None:
        nbrs = nbrs.select(
            "node", F.slice("nbrs", 1, max_degree).alias("nbrs")
        )
    nbrs = nbrs.select(
        "node",
        "nbrs",
        F.aggregate(
            "nbrs", F.lit(0).cast("long"), lambda acc, x: acc + x["w"]
        ).alias("total"),
    ).persist()

    starts = (
        e.select("node")
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    walks = _ckpt(
        starts.crossJoin(
            spark.range(walks_per_node).select(
                F.col("id").cast("int").alias("walk_ix")
            )
        ).select(
            F.col("node").alias("start"),
            "walk_ix",
            F.col("node").alias("cur"),
            F.array(F.col("node")).alias("path"),
        )
    )
    try:
        for t in range(1, walk_len + 1):
            joined = walks.join(
                nbrs, walks["cur"] == nbrs["node"], "left_outer"
            )
            # stage 1: materialize the target draw as a plain column
            staged = joined.select(
                "start",
                "walk_ix",
                "path",
                "nbrs",
                "total",
                (
                    md5_prefix60(
                        F.concat_ws(
                            "|",
                            F.col("cur"),
                            F.col("start"),
                            F.lit(str(t)),
                            F.col("walk_ix").cast("string"),
                            F.lit(seed),
                        )
                    )
                    % F.col("total")
                ).alias("_target"),
            )
            # stage 2: fold the dst-sorted list ONCE — first neighbor
            # whose cumulative weight exceeds the target wins.  The fold
            # must appear exactly once in exactly one projection: a
            # lambda that captures an outer column (_target) evaluates
            # INCONSISTENTLY when the same expression is duplicated in
            # a single select (observed: the cur and path copies of the
            # old inline formulation disagreed on the same row), so the
            # pick is materialized here and only the plain _next column
            # is reused downstream.
            pick = F.aggregate(
                F.col("nbrs"),
                F.struct(
                    F.lit(0).cast("long").alias("cum"),
                    F.lit(None).cast("string").alias("pick"),
                ),
                lambda acc, x: F.struct(
                    (acc["cum"] + x["w"]).alias("cum"),
                    F.when(acc["pick"].isNotNull(), acc["pick"])
                    .when(F.col("_target") < acc["cum"] + x["w"], x["dst"])
                    .alias("pick"),
                ),
                lambda acc: acc["pick"],
            )
            stepped = staged.select(
                "start",
                "walk_ix",
                "path",
                F.when(
                    F.col("nbrs").isNull() | (F.col("total") <= 0),
                    F.lit(None).cast("string"),
                )
                .otherwise(pick)
                .alias("_next"),
            )
            walks = _ckpt(
                stepped.select(
                    "start",
                    "walk_ix",
                    F.col("_next").alias("cur"),
                    F.when(F.col("_next").isNull(), F.col("path"))
                    .otherwise(F.array_append("path", F.col("_next")))
                    .alias("path"),
                )
            )
        return walks.select("start", "walk_ix", "path")
    finally:
        nbrs.unpersist()
