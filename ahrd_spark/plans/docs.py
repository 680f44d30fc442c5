"""The engine's document model: an (Iceberg-layout) table of interleaved
text + media documents, one doc per query protein.

    docs(doc_id STRING,
         spans ARRAY<STRUCT<kind STRING, text STRING,
                            media_ref STRING, offset INT>>)

Span kinds:
- ``query``            text = FASTA record (header line + "\\n" + AA sequence)
- ``blast_hit:<db>``   text = tab-joined HSP + subject description:
                       hit_acc \\t q_start \\t q_end \\t s_start \\t s_end \\t
                       e_value \\t bit_score \\t s_len \\t description
- ``interpro_hit``     text = raw InterPro result line
- ``media``            media_ref = opaque pointer to an alignment artifact
                       (e.g. ``aln://<db>/batch001.pairwise#<hit_acc>``),
                       carried through every stage untouched

Per-row invariant (BASELINE): the span sequence (kind, text, media_ref,
offset order) survives every stage byte-identical — stages derive new
tables/columns and never rewrite ``spans``.  ``span_fingerprint`` gives the
per-doc hash asserted between stages.

Scale: one doc = one row; the table partitions by ``hash(doc_id)`` —
`repartition(N, "doc_id")` before writes — so every per-protein computation
in the pipeline is co-partitioned from the start.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

SPAN_TYPE = StructType(
    [
        StructField("kind", StringType(), True),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), True),
    ]
)
DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_TYPE), False),
    ]
)

BLAST_SPAN_SEP = "\t"


def span_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, span_hash) — order-sensitive hash over the exact span
    sequence; equality across stages proves the per-row invariant."""
    return docs.select(
        "doc_id",
        F.sha2(
            F.concat_ws(
                "\x1e",
                F.transform(
                    "spans",
                    lambda s: F.concat_ws(
                        "\x1f",
                        F.coalesce(s["kind"], F.lit("")),
                        F.coalesce(s["text"], F.lit("")),
                        F.coalesce(s["media_ref"], F.lit("")),
                        F.coalesce(s["offset"].cast("string"), F.lit("")),
                    ),
                ),
            ),
            256,
        ).alias("span_hash"),
    )


def _span(kind, text, media_ref, offset):
    return F.struct(
        kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        offset.cast("int").alias("offset"),
    )


def build_docs(
    spark: SparkSession,
    cfg,
    batch_name: str = "batch001",
) -> DataFrame:
    """Assemble the docs table from AHRD-shaped raw inputs (config paths):
    query FASTA + per-DB seq-sim tables joined with subject DBs + raw
    InterPro lines.  Deterministic span order: query span first, then blast
    hits ordered by (db, line_no), then interpro hits, then media refs.
    """
    from ahrd_spark.sources.blast_tabular import read_seq_sim_table
    from ahrd_spark.sources.fasta import read_query_fasta, read_subject_fasta_db

    proteins = read_query_fasta(spark, cfg.proteins_fasta, keep_sequence=True)
    q_span = proteins.select(
        F.col("accession").alias("doc_id"),
        _span(
            F.lit("query"),
            F.concat(F.col("accession"), F.lit("\n"), F.col("sequence")),
            F.lit(None).cast("string"),
            F.lit(0),
        ).alias("span"),
        F.lit(0).alias("ord1"),
        F.lit(0).cast("long").alias("ord2"),
    )

    spans = [q_span]
    for i, db_cfg in enumerate(cfg.blast_dbs):
        # a batch may lack results for some database (Batcher pairing finds
        # no file) — that database simply contributes no spans
        if not db_cfg.seq_sim_table or not db_cfg.fasta_db:
            continue
        raw = read_seq_sim_table(spark, cfg, db_cfg.name)
        subj = read_subject_fasta_db(
            spark, db_cfg.fasta_db, db_cfg.name, db_cfg.fasta_header_regex
        ).select("hit_acc", "description", "s_len")
        subj = subj.join(raw.select("hit_acc").distinct(), "hit_acc", "left_semi")
        joined = raw.join(subj, "hit_acc")
        text = F.concat_ws(
            BLAST_SPAN_SEP,
            F.col("hit_acc"),
            F.col("q_start"),
            F.col("q_end"),
            F.col("s_start"),
            F.col("s_end"),
            F.col("e_value"),
            F.col("bit_score"),
            F.col("s_len"),
            F.col("description"),
        )
        media = F.concat(
            F.lit(f"aln://{db_cfg.name}/{batch_name}.pairwise#"), F.col("hit_acc")
        )
        spans.append(
            joined.select(
                F.col("protein_acc").alias("doc_id"),
                _span(
                    F.lit(f"blast_hit:{db_cfg.name}"), text, media, F.lit(0)
                ).alias("span"),
                F.lit(1 + i).alias("ord1"),
                F.col("line_no").alias("ord2"),
            )
        )
    if cfg.interpro_result:
        ipr_lines = (
            spark.read.text(cfg.interpro_result)
            .withColumn("line_no", F.monotonically_increasing_id())
            .select(
                F.regexp_extract(
                    F.col("value"), r"^(?:(\S+)\s+.*\s(IPR\d{6})\s.*)$", 1
                ).alias("doc_id"),
                F.col("value"),
                F.col("line_no"),
            )
            .filter(F.col("doc_id") != "")
        )
        spans.append(
            ipr_lines.select(
                "doc_id",
                _span(
                    F.lit("interpro_hit"),
                    F.col("value"),
                    F.lit(None).cast("string"),
                    F.lit(0),
                ).alias("span"),
                F.lit(100).alias("ord1"),
                F.col("line_no").alias("ord2"),
            )
        )

    allspans = spans[0]
    for s in spans[1:]:
        allspans = allspans.unionByName(s)
    assembled = (
        allspans.withColumn(
            "sortable", F.struct(F.col("ord1"), F.col("ord2"), F.col("span"))
        )
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("sortable")).alias("sorted_spans"))
        .select(
            "doc_id",
            F.transform(
                "sorted_spans",
                lambda s, i: F.struct(
                    s["span"]["kind"].alias("kind"),
                    s["span"]["text"].alias("text"),
                    s["span"]["media_ref"].alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ).alias("spans"),
        )
    )
    return assembled


def synthesize_docs(
    spark: SparkSession,
    n_docs: int,
    hits_per_doc: int = 24,
    n_dbs: int = 3,
    vocab_size: int = 2000,
    tokens_per_desc: int = 6,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic docs table for benchmarking (no external
    data, no RNG — everything derived from (doc_id, hit index) arithmetic
    with xxhash64 mixing, so the same arguments always produce the same
    table at any parallelism).
    """
    df = spark.range(n_docs)
    if partitions:
        df = df.repartition(partitions, "id")
    doc_id = F.concat(F.lit("doc"), F.lpad(F.col("id").cast("string"), 12, "0"))

    hit_idx = F.sequence(F.lit(0), F.lit(hits_per_doc - 1))
    mix = lambda *cols: F.abs(F.xxhash64(*cols))  # noqa: E731

    def hit_span(i):
        h = mix(F.col("id"), i, F.lit("hit"))
        db = F.concat(F.lit("db"), (h % n_dbs).cast("string"))
        hit_acc = F.concat(F.lit("sub|S"), (h % F.lit(10 * vocab_size)).cast("string"), F.lit("|x"))
        q_start = (h % 50) + 1
        q_end = q_start + 40 + (h % 60)
        s_start = (h % 30) + 1
        s_end = s_start + 45 + (h % 55)
        e_value = F.pow(F.lit(10.0), -(F.lit(3) + (h % 120)).cast("double"))
        bit = (F.lit(40.0) + (h % 900).cast("double") / 2.0)
        s_len = F.lit(120) + (h % 600)
        words = F.transform(
            F.sequence(F.lit(0), F.lit(tokens_per_desc - 1)),
            lambda j: F.concat(
                F.lit("tok"), (mix(h, j) % vocab_size).cast("string")
            ),
        )
        desc = F.concat_ws(" ", words)
        text = F.concat_ws(
            BLAST_SPAN_SEP, hit_acc, q_start, q_end, s_start, s_end,
            F.format_string("%.3e", e_value), F.format_string("%.1f", bit),
            s_len, desc,
        )
        media = F.concat(F.lit("aln://"), db, F.lit("/synth.pairwise#"), hit_acc)
        return F.struct(
            F.concat(F.lit("blast_hit:"), db).alias("kind"),
            text.alias("text"),
            media.alias("media_ref"),
            (i + 1).cast("int").alias("offset"),
        )

    query_span = F.struct(
        F.lit("query").alias("kind"),
        F.concat(
            doc_id, F.lit("\n"),
            F.repeat(F.lit("M"), (mix(F.col("id"), F.lit("len")) % 800 + 80).cast("int")),
        ).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    spans = F.concat(F.array(query_span), F.transform(hit_idx, hit_span))
    return df.select(doc_id.alias("doc_id"), spans.alias("spans"))


def query_length_expr() -> F.Column:
    """Per-doc query-sequence length from the ``query`` span: strip the
    header line and all whitespace, count AA characters."""
    return F.length(
        F.regexp_replace(
            F.get(F.filter("spans", lambda s: s["kind"] == "query"), 0)[
                "text"
            ],
            r"^[^\n]*\n|\s",
            "",
        )
    ).cast("int")


def docs_to_hits(docs: DataFrame) -> DataFrame:
    """Mention-detect input shredding: explode blast_hit spans back into the
    normalized candidate-hit table (pre-gate).  Intra-row transform — no
    shuffle; the spans array itself is never modified."""
    # qlen is a per-doc scalar: compute it BEFORE the explode and let the
    # Generate carry it — zero joins/shuffles in this stage (the naive
    # formulation re-joined an 80k-doc dimension onto millions of exploded
    # hits by protein_acc)
    qlen = query_length_expr()
    # withColumn BEFORE the select places the qlen Project beneath the
    # Generate, so it runs once per doc; putting the expression in the same
    # select as posexplode would place it in the post-Generate projection
    # and recompute the regex once per exploded span (measured 1.5-2x on
    # the whole gate)
    hit_spans = (
        docs.withColumn("qlen", qlen)
        .select(
            F.col("doc_id").alias("protein_acc"),
            "qlen",
            F.posexplode("spans").alias("pos", "span"),
        )
        .filter(F.col("span.kind").startswith("blast_hit:"))
    )
    # F.get (null on out-of-bounds) rather than [] — Catalyst may fuse these
    # extractions into the Generate ahead of the kind-filter, where non-blast
    # spans would make indexed access throw under ANSI mode.
    p = F.split(F.col("span.text"), BLAST_SPAN_SEP, 9)
    g = lambda i: F.get(p, i)  # noqa: E731
    hits = hit_spans.select(
        "protein_acc",
        "qlen",
        F.substring_index(F.col("span.kind"), ":", -1).alias("db"),
        g(0).alias("hit_acc"),
        g(1).try_cast("int").alias("q_start"),
        g(2).try_cast("int").alias("q_end"),
        g(3).try_cast("int").alias("s_start"),
        g(4).try_cast("int").alias("s_end"),
        g(5).try_cast("double").alias("e_value"),
        g(6).try_cast("double").alias("bit_score"),
        g(7).try_cast("int").alias("s_len"),
        g(8).alias("description"),
        F.col("pos").cast("long").alias("line_no"),
        F.col("span.media_ref").alias("media_ref"),
    )
    return hits
