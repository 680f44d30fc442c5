"""InterPro database (XML) + raw-result scans.

Parity:
- A6 XML DB scan   InterproResult.java:74-116 — //interpro elements with
  attributes id/short_name/type, child <name>, first parent_list/rel_ref
  @ipr_ref as parent, all contains/rel_ref @ipr_ref as contains-set.
  The dictionary is small (tens of MB for the full InterPro release), so we
  parse it driver-side with the stdlib and broadcast the resulting
  DataFrame — the idiomatic Spark treatment of a dimension dictionary.
- A7 raw results   InterproResult.java:126-162 — per line, Java regex
  ``(\\S+)\\s+.*\\s(IPR\\d{6})\\s.*`` with Matcher.matches() (whole line);
  distributed text scan + regexp_extract.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

INTERPRO_DB_SCHEMA = StructType(
    [
        StructField("ipr_id", StringType(), False),
        StructField("short_name", StringType(), True),
        StructField("name", StringType(), True),
        StructField("type", StringType(), True),
        StructField("parent_id", StringType(), True),
        StructField("contains", ArrayType(StringType()), False),
    ]
)

# InterproResult.java:134 — anchored to reproduce Matcher.matches()
INTERPRO_RAW_REGEX = r"^(?:(\S+)\s+.*\s(IPR\d{6})\s.*)$"


def read_interpro_db(spark: SparkSession, path: str) -> DataFrame:
    """interpro_db(ipr_id, short_name, name, type, parent_id, contains)."""
    rows = []
    tree = ET.parse(path)
    for el in tree.getroot().iter("interpro"):
        parent_id = None
        plist = el.find("parent_list")
        if plist is not None:
            rel = plist.find("rel_ref")
            if rel is not None:
                parent_id = rel.get("ipr_ref")
        contains = []
        clist = el.find("contains")
        if clist is not None:
            contains = [
                r.get("ipr_ref") for r in clist.findall("rel_ref") if r.get("ipr_ref")
            ]
        name_el = el.find("name")
        rows.append(
            (
                el.get("id", ""),
                el.get("short_name"),
                name_el.text if name_el is not None else None,
                el.get("type"),
                parent_id,
                contains,
            )
        )
    return spark.createDataFrame(rows, INTERPRO_DB_SCHEMA)


def read_interpro_raw(spark: SparkSession, path: str) -> DataFrame:
    """interpro_hits(protein_acc, ipr_id) — distinct (the reference stores
    them in a per-protein Set)."""
    df = spark.read.text(path)
    return (
        df.select(
            F.regexp_extract(F.col("value"), INTERPRO_RAW_REGEX, 1).alias(
                "protein_acc"
            ),
            F.regexp_extract(F.col("value"), INTERPRO_RAW_REGEX, 2).alias("ipr_id"),
        )
        .filter((F.col("protein_acc") != "") & (F.col("ipr_id") != ""))
        .distinct()
    )
