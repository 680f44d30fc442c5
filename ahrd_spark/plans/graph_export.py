"""RDF N-Triples export — the interchange sink for the KG pipeline.

The pipeline materializes (subj, pred, obj, obj_kind, ...) rows into the
graph table (plans/pipeline.py:330-590); this module renders those rows as
RDF 1.1 N-Triples lines (W3C REC-n-triples-20140225) so any downstream
triple store / SPARQL engine can load the graph without a custom reader.

Formatting is pure per-row string work — native concat + chained literal
replaces, JVM codegen, no shuffle, no UDF — so the export pipelines into
the materialize stage's write without its own stage.  Writing uses
``df.write.text``, one file per partition of the triples table (the
materialize checkpoint is already hash-partitioned by ``subj``, so export
files inherit that layout; at 10^12-triple scale each partition streams
straight to its own ``.nt`` part-file, optionally codec-compressed).

Escaping per the spec's ECHAR production: ``\\`` first, then ``"``,
newline, CR, tab.  IRI local names percent-encode the characters N-Triples
forbids inside ``<...>`` (space, angle brackets, quotes, backslash) —
enough for this engine's accession-shaped subjects/predicates, documented
as such rather than a full IRI-reference validator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (find, replace) pairs, applied IN ORDER — backslash must go first.
_LITERAL_ESCAPES = (
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
)
_IRI_ESCAPES = (
    ("%", "%25"),  # first, so later escapes aren't double-encoded
    (" ", "%20"),
    ("<", "%3C"),
    (">", "%3E"),
    ('"', "%22"),
    ("\\", "%5C"),
)


def _chain_replace(col: Column, pairs) -> Column:
    for find, repl in pairs:
        col = F.replace(col, F.lit(find), F.lit(repl))
    return col


def escape_literal_expr(col: Column) -> Column:
    """ECHAR-escape a string for an N-Triples literal body."""
    return _chain_replace(col, _LITERAL_ESCAPES)


def escape_iri_local_expr(col: Column) -> Column:
    """Percent-encode the characters N-Triples forbids inside <IRI>."""
    return _chain_replace(col, _IRI_ESCAPES)


def ntriple_line_expr(
    subj: Column,
    pred: Column,
    obj: Column,
    obj_is_iri: Column,
    subj_base: str,
    pred_base: str,
    obj_base: str,
) -> Column:
    """One N-Triples line: ``<s> <p> o .`` with ``o`` an IRI or literal.

    A NULL term fails the job loudly (``raise_error``) rather than letting
    a silently-shortened line corrupt the export — strict RDF parsers
    reject a whole ``.nt`` file on one malformed triple, so the bad row
    must surface at write time, not load time."""
    s = F.concat(F.lit("<" + subj_base), escape_iri_local_expr(subj), F.lit(">"))
    p = F.concat(F.lit("<" + pred_base), escape_iri_local_expr(pred), F.lit(">"))
    o = F.when(
        obj_is_iri,
        F.concat(F.lit("<" + obj_base), escape_iri_local_expr(obj), F.lit(">")),
    ).otherwise(F.concat(F.lit('"'), escape_literal_expr(obj), F.lit('"')))
    any_null = (
        subj.isNull() | pred.isNull() | obj.isNull() | obj_is_iri.isNull()
    )
    return F.when(
        any_null,
        F.raise_error(F.lit("ntriples export: NULL term in triple row")),
    ).otherwise(F.concat_ws(" ", s, p, o, F.lit(".")))


def to_ntriples(
    triples: DataFrame,
    subj_base: str = "urn:ahrd:protein:",
    pred_base: str = "urn:ahrd:pred:",
    obj_base: str = "urn:ahrd:entity:",
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    obj_kind_col: str = "obj_kind",
    iri_kinds: tuple[str, ...] = ("go_term", "interpro", "domain", "entity"),
) -> DataFrame:
    """Render a triples table to one ``line: string`` column.

    ``obj_kind`` decides the object form: kinds in ``iri_kinds`` become
    IRIs under ``obj_base``; everything else (descriptions) becomes an
    escaped literal.  The default covers every kind the pipeline emits
    (plans/pipeline.py:330-590: ``description`` literal, ``go_term`` /
    ``interpro`` IRIs).
    """
    is_iri = F.col(obj_kind_col).isin(*iri_kinds)
    return triples.select(
        ntriple_line_expr(
            F.col(subj_col), F.col(pred_col), F.col(obj_col), is_iri,
            subj_base, pred_base, obj_base,
        ).alias("line")
    )


def write_ntriples(
    triples: DataFrame,
    path: str,
    compression: str | None = "gzip",
    **bases,
) -> None:
    """Export the graph: one ``.nt`` part-file per triples partition."""
    writer = to_ntriples(triples, **bases).write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)
