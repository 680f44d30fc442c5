"""Output writers — the reference's file formats produced distributively.

Parity:
- B1 TSV writer     OutputWriter.java:24-99 + description-line builder
  AbstractOutputWriter.java:43-78 ('# AHRD-Version' banner, blank line,
  header row, 'Unknown protein' fallback keeping the column structure,
  InterPro cell as sorted 'IPR (name)' comma-joined, GO cell sorted
  comma-joined)
- B3 FASTA writer   FastaOutputWriter.java:18-30
- B4 HRD-scores     OutputWriter.java:109-132 (every candidate's AHRD score
  — input for GEV fitting downstream)

The line rendering is a column expression; the write is an ordinary
distributed text write (optionally coalesced for a single file at small
scale — the reference's single-file shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AHRD_VERSION = "3.11"  # format-compat banner (src/ahrd/controller/AHRD.java:32)

HEADER = (
    "Protein-Accession\tBlast-Hit-Accession\tAHRD-Quality-Code\t"
    "Human-Readable-Description\tInterpro-ID (Description)\tGene-Ontology-Term"
)


SCORE_COLS = (
    "sum_token_scores", "token_high_score", "correction_factor",
    "lexical_score", "rel_bit_score",
)
# OutputWriter.java:42-47 optional column headers
TOKEN_SET_HEADER = '\t"Tokens (tkn->score)"'
SCORES_HEADER = (
    "\tSum(Token-Scores)\tTokenHighScore\tCorrection-Factor"
    "\tLexical-Score\tRelativeBitScore"
)


def annotation_lines(result: DataFrame) -> DataFrame:
    """run_annotate output -> one formatted TSV line per protein (column
    ``line``), ordered like the reference (insertion order is HashMap-
    dependent there; we sort by accession for determinism).  The optional
    token-set and winner sub-score cells (write_token_set_to_output /
    write_scores_to_output) render whenever run_annotate attached their
    columns; proteins without a winner get empty score cells
    (OutputWriter.java:197-201)."""
    ipr_cell = F.concat_ws(
        ", ",
        F.transform(
            F.col("interpro"),
            lambda s: F.concat(s["ipr_id"], F.lit(" ("), s["name"], F.lit(")")),
        ),
    )
    go_cell = F.concat_ws(", ", F.col("go_terms"))
    known = F.concat_ws(
        "\t",
        F.col("protein_acc"),
        F.col("hit_acc"),
        F.col("quality_code"),
        F.col("description"),
        ipr_cell,
        go_cell,
    )
    unknown = F.concat(
        F.col("protein_acc"), F.lit("\t\t\tUnknown protein\t"),
        ipr_cell, F.lit("\t"), go_cell,
    )
    line = F.when(F.col("hit_acc").isNotNull(), known).otherwise(unknown)
    cols = set(result.columns)
    if "token_set" in cols:
        line = F.concat(
            line, F.lit("\t"), F.coalesce(F.col("token_set"), F.lit(""))
        )
    if "sum_token_scores" in cols:
        from ahrd_spark.functions.format import format_number_expr

        scored = F.concat(
            *[
                F.concat(
                    F.lit("\t"),
                    F.coalesce(format_number_expr(F.col(c)), F.lit("")),
                )
                for c in SCORE_COLS
            ]
        )
        # reference quirk reproduced for byte parity: buildDescScoreCells
        # (OutputWriter.java:197-199) emits EIGHT empty cells when no
        # high-scoring hit exists, but only five value cells otherwise —
        # unknown-protein rows are 3 columns wider than scored rows.
        line = F.concat(
            line,
            F.when(F.col("hit_acc").isNotNull(), scored).otherwise(
                F.lit("\t" * 8)
            ),
        )
    return result.select(
        F.col("protein_acc"), line.alias("line")
    ).orderBy("protein_acc")


def write_annotation_tsv(result: DataFrame, path: str, single_file: bool = True):
    """B1: write the annotation table in the reference's TSV shape."""
    lines = annotation_lines(result).select(
        F.lit(1).alias("ord"), F.col("protein_acc").alias("key"), "line"
    )
    hdr = HEADER
    if "token_set" in result.columns:
        hdr += TOKEN_SET_HEADER
    if "sum_token_scores" in result.columns:
        hdr += SCORES_HEADER
    header = lines.sparkSession.createDataFrame(
        [
            (0, "0", f"# AHRD-Version {AHRD_VERSION}"),
            (0, "1", ""),
            (0, "2", hdr),
        ],
        "ord int, key string, line string",
    )
    out = header.unionByName(lines)
    if single_file:
        out = out.repartition(1).sortWithinPartitions("ord", "key")
    else:
        out = out.orderBy("ord", "key")
    out.select("line").write.mode("overwrite").text(path)


def fasta_lines(result: DataFrame, sequences: DataFrame) -> DataFrame:
    """B3: '>' + buildDescriptionLine(prot, " ") + newline + AA sequence,
    byte-identical to FastaOutputWriter.java:18-30 over
    AbstractOutputWriter.buildDescriptionLine(:43-77), quirks included:

    - winner lines carry a trailing separator after the description
      (``desc + seperator``, :48-49) BEFORE the (possibly empty) sorted
      InterPro list, so a winner without InterPro hits ends ``desc  `` with
      two spaces once the always-appended post-IPR separator (:67) lands;
    - the unknown branch appends "Unknown protein" with NO separator
      before the InterPro list (:56 — only the tab-mode branch pads);
    - InterPro entries sort by id (InterproResult.compareTo:194) and join
      with ", "; GO terms sort lexically and join with ", ".
    """
    ipr_cell = F.concat_ws(
        ", ",
        F.array_sort(
            F.transform(
                F.col("interpro"),
                lambda s: F.concat(
                    s["ipr_id"], F.lit(" ("), s["name"], F.lit(")")
                ),
            )
        ),
    )
    go_cell = F.concat_ws(", ", F.array_sort(F.col("go_terms")))
    head = F.when(
        F.col("hit_acc").isNotNull(),
        F.concat_ws(
            " ", F.col("protein_acc"), F.col("hit_acc"), F.col("quality_code"),
            F.col("description"), F.lit(""),
        ),
    ).otherwise(F.concat(F.col("protein_acc"), F.lit(" Unknown protein")))
    joined = result.join(
        sequences.select(
            F.col("accession").alias("protein_acc"), "sequence"
        ),
        "protein_acc",
    )
    return joined.select(
        F.col("protein_acc"),
        F.concat(
            F.lit(">"), head, F.coalesce(ipr_cell, F.lit("")), F.lit(" "),
            F.coalesce(go_cell, F.lit("")),
            F.lit("\n"), F.col("sequence"),
        ).alias("line"),
    ).orderBy("protein_acc")


def write_hrd_scores(scored: DataFrame, path: str, single_file: bool = True):
    """B4: every candidate hit's description score (GEV-fitting input;
    OutputWriter.java:109-132 — header misspells 'Accesion' like the
    reference).  A global sort key pins the header row first; relying on
    union partition order is not stable under AQE."""
    lines = scored.select(
        F.lit(1).alias("__k"),
        F.concat_ws(
            "\t", F.col("protein_acc"), F.col("hit_acc"),
            F.col("desc_score").cast("string"),
        ).alias("line"),
    )
    header = scored.sparkSession.createDataFrame(
        [(0, "Protein-Accesion\tBlast-Hit-Accession\tAHRD-Score")],
        "__k int, line string",
    )
    out = header.unionByName(lines).orderBy("__k", "line").select("line")
    writer = out.coalesce(1) if single_file else out
    writer.write.mode("overwrite").text(path)
