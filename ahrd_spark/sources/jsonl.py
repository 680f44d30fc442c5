"""JSONL document ingestion with corrupt-record quarantine.

Web-corpus deliveries arrive as JSON-lines far more often than as clean
parquet, and at crawl scale some fraction of lines is always broken
(truncated writes, encoding damage, schema drift).  The ingestion
contract that survives 100 TB is: parse with an EXPLICIT schema (never
infer — inference is a second full scan and locks in one shard's
quirks), route unparseable lines to a quarantine output instead of
failing the job, and count both streams so lineage records the loss.

Scale shape: one distributed text scan; PERMISSIVE mode parses each
line independently (no cross-row state), so the job parallelizes by
input split like any file scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOC_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOC_JSONL_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """-> (good, quarantine): ``good`` has exactly ``schema``'s columns
    for every parseable line; ``quarantine`` has the schema columns
    (whatever partially parsed) plus ``raw`` — each unparseable line
    verbatim.

    The corrupt-record column is appended to the user schema here, so
    callers pass only their domain schema.  The quarantine output keeps
    the schema columns (NULL for fully unparseable lines, partial for
    lines that parsed some fields) NEXT TO ``raw`` — both because a
    triager wants them, and because Spark refuses a query that prunes
    down to ONLY the corrupt column straight off a JSON scan (documented
    source restriction; the alternative is caching the raw parse, which
    at corpus scale means materializing the table twice).  Both branches
    re-read the same scan, which Catalyst prunes per branch.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    good = raw.filter(F.col(CORRUPT_COL).isNull()).select(
        *[f.name for f in schema.fields]
    )
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        *[f.name for f in schema.fields],
        F.col(CORRUPT_COL).alias("raw"),
    )
    return good, quarantine


__all__ = ["read_jsonl", "DOC_JSONL_SCHEMA", "CORRUPT_COL"]
