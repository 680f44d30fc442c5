"""FASTA scans as distributed Spark reads.

A FASTA file is a sequence of records, each ``>header`` line + sequence
lines.  Instead of a whole-file driver read (the reference slurps the file
into one String — Protein.java:101-113), we read with a custom record
separator ``lineSep='>'`` so each FASTA record lands as one row, fully
distributed and splittable by Spark's text source.  This holds at 100 TB: a
record is one row; Spark parallelizes by file split.

Caveat (checked against all reference fixtures): '>' must only occur at
record starts — true for well-formed FASTA.

Parity:
- A2 query FASTA scan        Protein.java:63-113 (accession = first
  whitespace token of header; seq length = sum of trimmed sequence lines)
- A5 subject DB scan         BlastResult.java:289-373 (per-DB Java
  named-group header regex with Matcher.matches() semantics; subject length
  = sum of sequence-line lengths)
- A9 references FASTA (eval) ReferenceDescription.java:17-47
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ahrd_spark.config import DEFAULT_FASTA_HEADER_REGEX
from ahrd_spark.functions.text import (
    apply_filter_regexes,
    blacklist_fails_expr,
    named_group_index,
    tokenize_expr,
)


def _fasta_records(spark: SparkSession, path: str) -> DataFrame:
    """One row per FASTA record: header (without '>'), body (sequence lines).

    Sequence length counts non-whitespace characters of the body — equal to
    the reference's sum of ``line.trim().length()`` for standard FASTA.
    """
    rec = spark.read.option("lineSep", ">").text(path)
    rec = rec.filter(F.trim(F.col("value")) != "")
    header = F.substring_index(F.col("value"), "\n", 1)
    body = F.expr("substring(value, length(substring_index(value, '\\n', 1)) + 2)")
    return rec.select(
        F.regexp_replace(header, "\r$", "").alias("header"),
        body.alias("body"),
    )


def read_query_fasta(
    spark: SparkSession, path: str, keep_sequence: bool = False
) -> DataFrame:
    """A2: proteins(accession, seq_len[, sequence]).

    accession = first whitespace-token of the header (Protein.java:73).
    Column pruning drops `sequence` unless requested (Protein.java:85-92
    memory-saving analog — in Spark it's free via Catalyst, we simply never
    select it).
    """
    rec = _fasta_records(spark, path)
    seq = F.regexp_replace(F.col("body"), r"\s", "")
    cols = [
        F.split(F.col("header"), " ")[0].alias("accession"),
        F.length(seq).cast("int").alias("seq_len"),
    ]
    if keep_sequence:
        cols.append(seq.alias("sequence"))
    return rec.select(*cols).filter(F.col("accession") != "")


def read_subject_fasta_db(
    spark: SparkSession,
    path: str,
    db_name: str,
    header_regex: str = DEFAULT_FASTA_HEADER_REGEX,
) -> DataFrame:
    """A5: db_fasta(db, hit_acc, description, s_len).

    The per-DB Java named-group regex (groups ``accession``/``description``)
    is applied with Matcher.matches() (whole-string) semantics
    (BlastResult.java:336-337): we wrap it in ``^(?:...)$`` and use
    regexp_extract, which runs java.util.regex on the JVM — dialect-exact.
    Non-matching headers are warn+skip in the reference; here they are
    filtered out (same effect).
    """
    acc_idx = named_group_index(header_regex, "accession")
    desc_idx = named_group_index(header_regex, "description")
    anchored = f"^(?:{header_regex})$"
    rec = _fasta_records(spark, path)
    header = F.concat(F.lit(">"), F.col("header"))
    return (
        rec.select(
            F.trim(F.regexp_extract(header, anchored, acc_idx)).alias("hit_acc"),
            F.trim(F.regexp_extract(header, anchored, desc_idx)).alias("description"),
            F.length(F.regexp_replace(F.col("body"), r"\s", ""))
            .cast("int")
            .alias("s_len"),
        )
        .filter(F.col("hit_acc") != "")
        .withColumn("db", F.lit(db_name))
    )


def read_references_fasta(
    spark: SparkSession,
    path: str,
    description_blacklist: tuple[str, ...] = (),
    description_filter: tuple[str, ...] = (),
    token_blacklist: tuple[str, ...] = (),
) -> DataFrame:
    """A9: references(accession, description, tokens).

    Header = ``>accession description...``; description is everything after
    the first whitespace token (ReferenceDescription.java:17-47).

    Filtering knobs (ReferenceDescription.java:30-45, keys at
    Settings.java:66-68), with the reference's exact nesting:

    - ``references_description_blacklist`` non-empty: a description that
      FAILS the blacklist is blanked to "" (the reference keeps the row —
      its tokens become the empty set, making every prediction for that
      protein score FP-only).  Only when it PASSES is
      ``references_description_filter`` applied (an empty blacklist means
      NO filtering at all, even if a filter is configured).
    - ``references_token_blacklist`` is always threaded into tokenization
      (TokenScoreCalculator.tokenize with the blacklist).
    """
    rec = _fasta_records(spark, path)
    acc = F.split(F.col("header"), " ")[0]
    desc = F.trim(
        F.expr("substring(header, length(split(header, ' ')[0]) + 1)")
    )
    if description_blacklist:
        passes = ~blacklist_fails_expr(desc, description_blacklist)
        if description_filter:
            desc = F.when(
                passes, apply_filter_regexes(desc, description_filter)
            ).otherwise(F.lit(""))
        else:
            desc = F.when(passes, desc).otherwise(F.lit(""))
    return rec.select(
        acc.alias("accession"),
        desc.alias("description"),
        tokenize_expr(desc, token_blacklist).alias("tokens"),
    ).filter(F.col("accession") != "")
