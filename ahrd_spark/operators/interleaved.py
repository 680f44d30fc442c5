"""Operators over interleaved text+media span documents.

The pipeline's input contract (BASELINE.json input_hint) is an Iceberg-style
table of interleaved documents: ``(doc_id, spans: array<struct<kind:string,
text:string, media_ref:string, offset:int>>)`` — text spans carry prose,
media spans carry an opaque reference (the bytes live elsewhere), and the
span ORDER is the document.  These operators treat that interleaved
structure as first-class:

- ``span_stats``            per-doc composition profile (text/media counts,
                            media ratio, text volume, offset-order
                            violations) — pure higher-order array
                            expressions, zero shuffle, whole-stage codegen.
- ``media_text_gate``       the interleaved analogue of a C4/Gopher quality
                            gate: drop documents whose media/text mix or
                            text volume says "not trainable prose".
- ``media_ref_dedup``       cross-document media sharing: which media
                            objects appear in 2+ documents (dedup/canonical
                            pick before re-fetching bytes).  One shuffle
                            keyed by media_ref; hot refs only aggregate
                            counts (no pair expansion), so a viral image
                            shared by millions of docs costs one partial-
                            aggregated row, not a quadratic bucket.
- ``span_fingerprint``      order-SENSITIVE digest of the (kind, text,
                            media_ref) sequence — the reusable form of the
                            north rule's per-row span-sequence-equality
                            invariant: two pipeline stages preserved a row
                            iff its fingerprint is unchanged.

Scale shape: everything except ``media_ref_dedup`` is per-row expression
work (embarrassingly parallel, no shuffle); ``media_ref_dedup`` shuffles
once on the media_ref hash with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# field-level and span-level separators for the order-sensitive digest;
# control bytes cannot appear in tokenized span text, and a NULL sentinel
# distinguishes "field absent" from "field empty"
_FIELD_SEP = chr(2)
_SPAN_SEP = chr(1)
_NULL = chr(3)


def _media_count(spans: Column) -> Column:
    return F.size(F.filter(spans, lambda s: s["kind"] == "media"))


def span_stats(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """-> one row per doc: ``(doc_id, n_spans, n_text, n_media,
    media_ratio, text_chars, offset_violations)``.

    ``offset_violations`` counts adjacent span pairs whose offsets are not
    strictly increasing — the cheap structural-integrity check a 10^12-row
    ingest runs before trusting span order downstream.  All columns are
    chained higher-order array expressions over the spans column: the plan
    is a single scan + project, no explode, no shuffle.
    """
    spans = F.col(spans_col)
    n_spans = F.size(spans)
    n_media = _media_count(spans)
    n_text = n_spans - n_media
    text_chars = F.aggregate(
        F.filter(spans, lambda s: s["kind"] != "media"),
        F.lit(0).cast("bigint"),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
    )
    # adjacent-pair scan without explode: index i in [0, n-2], compare
    # offsets of spans i+1 (1-based slice) and i+2
    idx = F.sequence(F.lit(0), n_spans - 2)
    violations = F.when(n_spans < 2, F.lit(0).cast("bigint")).otherwise(
        F.aggregate(
            idx,
            F.lit(0).cast("bigint"),
            lambda acc, i: acc
            + F.when(
                F.element_at(spans, (i + 2).cast("int"))["offset"]
                <= F.element_at(spans, (i + 1).cast("int"))["offset"],
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
    )
    return docs.select(
        "doc_id",
        n_spans.cast("bigint").alias("n_spans"),
        n_text.cast("bigint").alias("n_text"),
        n_media.cast("bigint").alias("n_media"),
        (n_media.cast("double") / n_spans.cast("double")).alias("media_ratio"),
        text_chars.alias("text_chars"),
        violations.alias("offset_violations"),
    )


def media_text_gate(
    docs: DataFrame,
    max_media_ratio: float = 0.5,
    min_text_chars: int = 20,
    min_text_spans: int = 1,
    spans_col: str = "spans",
) -> DataFrame:
    """-> ``(doc_id, keep, drop_reason)``: interleaved-document quality
    gate.  Reasons fire in fixed precedence (first match wins) so the
    output is deterministic and auditable:

    1. ``no_text``       fewer than ``min_text_spans`` text spans;
    2. ``media_heavy``   media spans exceed ``max_media_ratio`` of all
                         spans;
    3. ``too_short``     total text volume below ``min_text_chars``.

    Same zero-shuffle expression shape as ``span_stats``.
    """
    stats = span_stats(docs, spans_col)
    reason = (
        F.when(F.col("n_text") < min_text_spans, F.lit("no_text"))
        .when(F.col("media_ratio") > max_media_ratio, F.lit("media_heavy"))
        .when(F.col("text_chars") < min_text_chars, F.lit("too_short"))
        .otherwise(F.lit(None).cast("string"))
    )
    return stats.select(
        "doc_id",
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    )


def media_ref_dedup(
    docs: DataFrame, min_docs: int = 2, spans_col: str = "spans"
) -> DataFrame:
    """-> ``(media_ref, n_docs, n_spans, canonical_doc)`` for every media
    reference appearing in ``min_docs``+ DISTINCT documents.

    The per-doc distinct happens inside the array (``array_distinct`` on
    the doc's own media refs) BEFORE the explode, so a doc repeating one
    image 1,000 times contributes 1,000 to ``n_spans`` but only one row to
    the distinct-doc count — and the shuffle carries one row per (doc,
    ref), not per span.  ``canonical_doc`` = min doc_id, the same keeper
    rule as ``dedup.exact_dedup``.
    """
    spans = F.col(spans_col)
    refs = F.filter(spans, lambda s: s["kind"] == "media")
    per_doc = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(refs, lambda s: s["media_ref"])
        ).alias("distinct_refs"),
        F.transform(refs, lambda s: s["media_ref"]).alias("all_refs"),
    )
    # span counts per (doc, ref) computed inside the array: the exploded
    # row count is bounded by distinct refs per doc
    counted = per_doc.select(
        "doc_id",
        F.explode(
            F.transform(
                F.col("distinct_refs"),
                lambda r: F.struct(
                    r.alias("media_ref"),
                    F.size(
                        F.filter(F.col("all_refs"), lambda x: x == r)
                    ).cast("bigint").alias("spans_in_doc"),
                ),
            )
        ).alias("e"),
    ).select("doc_id", "e.media_ref", "e.spans_in_doc")
    return (
        counted.groupBy("media_ref")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("spans_in_doc").alias("n_spans"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def span_fingerprint(
    docs: DataFrame, spans_col: str = "spans", out_col: str = "span_fp"
) -> DataFrame:
    """-> input columns + ``out_col``: md5 over the ORDERED (kind, text,
    media_ref) sequence.  Offsets are excluded on purpose: re-chunking may
    renumber offsets while preserving content order, and the invariant the
    pipeline asserts is content-sequence equality.  NULL fields map to a
    control-byte sentinel so (NULL, "") and ("", NULL) differ."""
    spans = F.col(spans_col)
    null = F.lit(_NULL)
    joined = F.array_join(
        F.transform(
            spans,
            lambda s: F.concat_ws(
                _FIELD_SEP,
                F.coalesce(s["kind"], null),
                F.coalesce(s["text"], null),
                F.coalesce(s["media_ref"], null),
            ),
        ),
        _SPAN_SEP,
    )
    return docs.withColumn(out_col, F.md5(joined))
