"""GO-term transfer (E11/J3) — winner -> reference GO annotations.

Parity: AHRD.java:233-240 — if the winning hit's short accession has entries
in the GOA map, the query protein inherits that full GO set.

Spark shape: the winners table is small relative to the hits (one row per
protein); GOA is pre-filtered to hit accessions (A8 semi-join).  The
transfer is a broadcast equi-join on short_acc followed by collect_set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transfer_go(winners: DataFrame, goa: DataFrame) -> DataFrame:
    """(protein_acc, go_terms ARRAY<STRING> sorted) for proteins whose
    winning hit has reference GO annotations."""
    return (
        winners.select("protein_acc", "short_acc")
        .join(F.broadcast(goa), "short_acc")
        .groupBy("protein_acc")
        .agg(F.array_sort(F.collect_set("go_term")).alias("go_terms"))
    )
