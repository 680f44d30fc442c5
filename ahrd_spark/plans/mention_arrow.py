"""Vectorized Arrow formulation of the mention-detect shred+gate.

Third formulation of the same row set as ``detect_mentions`` /
``gate_candidates_multi(docs_to_hits(docs))`` (parity pinned by
tests/test_mention_arrow.py).  Why it exists: the fused expression
formulation keeps every expensive expression single-evaluated, but it does
so inside chained higher-order ``transform``s, which Spark evaluates in
INTERPRETED mode (lambda-bearing expressions are CodegenFallback) — the
widest Project of the pipeline runs off the codegen fast path.  This
formulation moves the whole shred into ONE ``mapInArrow`` pass: spans stay
columnar end-to-end (ListArray -> list_flatten / list_parent_indices, no
per-row Python objects), the 9-field parse is a single RE2
``extract_regex``, and every regex pass (C2 blacklist, C3 filters, the
has-token predicate, C8 short accession) is a vectorized RE2 kernel over
the full batch.  This is also the shape the engine wants at cluster scale:
an embarrassingly-parallel Arrow map with zero shuffle, zero JVM<->Python
row conversion, and batch sizes bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.

Dialect gate: the reference's regex files are java.util.regex; Arrow
compute is RE2 (no backreferences/lookaround).  ``re2_compatible(cfg)``
probes every configured pattern against an Arrow kernel ON THE DRIVER at
plan time — callers fall back to the expression formulation when any
pattern is out of dialect, so semantics never silently change.

Reference parity map (same as detect_mentions): shred
AHRD.java:137-156 / BlastResult.java:270-330; C2
DescriptionScoreCalculator.java:25-33; C3 :45-55; C5/C6
BlastResult.java:457-522; C8 BlastResult.java:533-547.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ahrd_spark.config import NON_SPLITTER_CHAR, TOKEN_SPLITTER_FAST, AhrdConfig
from ahrd_spark.functions.text import combine_find_regexes, java_named_to_python

# one RE2 pass replaces split(text, "\t", 9): limit-9 semantics = the last
# group swallows any further tabs; rows with <9 fields do not match and
# surface as an all-null struct (the gate drops them, exactly like the
# split path's null fields)
_TAB9 = (
    "^"
    + "\t".join(f"(?P<f{i}>[^\t]*)" for i in range(8))
    + "\t(?P<f8>(?s:.*))$"
)
_INT_RE = r"^\s*[+-]?\d+\s*$"
_FLOAT_RE = r"^\s*[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?\s*$"

_OUT_SCHEMA = (
    "protein_acc string, qlen int, db string, hit_acc string, "
    "q_start int, q_end int, s_start int, s_end int, "
    "e_value double, bit_score double, s_len int, "
    "description string, line_no long, short_acc string"
)


def re2_compatible(cfg: AhrdConfig) -> bool:
    """True iff every configured pattern the shred needs compiles and runs
    as an RE2 kernel.  Probed on the driver with 1-element arrays — cost is
    microseconds, and a False here routes the caller to the java.util.regex
    expression formulation instead of failing mid-stage on an executor."""
    import pyarrow as pa
    import pyarrow.compute as pc

    probe = pa.array(["x"])
    try:
        for d in cfg.blast_dbs:
            for group in (d.blacklist, d.token_blacklist):
                combined = combine_find_regexes(group)
                if combined is not None:
                    pc.match_substring_regex(probe, combined)
            for r in d.filter:
                pc.replace_substring_regex(probe, r, " ")
            pc.extract_regex(
                probe, java_named_to_python(d.short_accession_regex)
            )
        return True
    except pa.ArrowInvalid:
        return False


def _shred_factory(cfg: AhrdConfig):
    """Build the mapInArrow callable.  All cfg-derived constants (regex
    strings, db groupings) are captured by value so the closure ships to
    executors without the config object."""
    # per-db settings, grouped by identical values so each distinct regex
    # battery runs once over the whole batch (mirrors _grouped_by_regexes)
    bl_groups: dict = {}
    ft_groups: dict = {}
    sa_groups: dict = {}
    for d in cfg.blast_dbs:
        bl_groups.setdefault(combine_find_regexes(d.blacklist), []).append(d.name)
        ft_groups.setdefault(
            (tuple(d.filter), combine_find_regexes(d.token_blacklist)), []
        ).append(d.name)
        sa_groups.setdefault(
            java_named_to_python(d.short_accession_regex), []
        ).append(d.name)
    known_dbs = [d.name for d in cfg.blast_dbs]

    def shred(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        def masked_fill(base, mask, values):
            return pc.if_else(mask, values, base)

        def try_cast(arr, typ, valid_re):
            ok = pc.fill_null(pc.match_substring_regex(arr, valid_re), False)
            masked = pc.if_else(ok, pc.utf8_trim_whitespace(arr),
                                pa.scalar(None, pa.string()))
            return pc.cast(masked, typ)

        for batch in batches:
            spans = batch.column("spans")
            n_spans = len(spans)
            if n_spans == 0 or batch.num_rows == 0:
                continue
            flat = pc.list_flatten(spans)
            if len(flat) == 0:
                continue
            parent = pc.list_parent_indices(spans)
            # original span position within its doc (= line_no): global
            # flat index minus the doc's first flat index
            # fill_null: a null spans row contributes no flat elements but
            # must still occupy a zero-length slot in the offsets math
            counts = pc.fill_null(pc.list_value_length(spans), 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            starts = np.repeat(
                np.concatenate(([0], np.cumsum(counts)[:-1])), counts
            )
            line_no = np.arange(len(flat), dtype=np.int64) - starts

            kind = flat.field("kind")
            keep = pc.fill_null(pc.starts_with(kind, pattern="blast_hit:"),
                                False)
            idx = pa.array(np.flatnonzero(keep.to_numpy(zero_copy_only=False)))
            if len(idx) == 0:
                continue
            text = pc.take(flat.field("text"), idx)
            db = pc.replace_substring_regex(
                pc.take(kind, idx), "^.*:", ""
            )
            parent = pc.take(parent, idx)
            line_no = pa.array(line_no[idx.to_numpy()], pa.int64())
            protein_acc = pc.take(batch.column("doc_id"), parent)
            qlen = pc.take(batch.column("qlen"), parent)

            parse = pc.extract_regex(text, _TAB9)
            # extract_regex children carry "" under a null struct slot —
            # mask every field by the struct's own validity
            ok = pc.is_valid(parse)
            fld = lambda i: pc.if_else(  # noqa: E731
                ok, pc.struct_field(parse, f"f{i}"), pa.scalar(None, pa.string())
            )
            hit_acc = fld(0)
            q_start = try_cast(fld(1), pa.int32(), _INT_RE)
            q_end = try_cast(fld(2), pa.int32(), _INT_RE)
            s_start = try_cast(fld(3), pa.int32(), _INT_RE)
            s_end = try_cast(fld(4), pa.int32(), _INT_RE)
            e_value = try_cast(fld(5), pa.float64(), _FLOAT_RE)
            bit_score = try_cast(fld(6), pa.float64(), _FLOAT_RE)
            s_len = try_cast(fld(7), pa.int32(), _INT_RE)
            raw = fld(8)

            false0 = pa.array(np.zeros(len(db), dtype=bool))
            db_mask = {
                name: pc.is_in(db, value_set=pa.array([name]))
                for name in known_dbs
            }

            def group_mask(names):
                m = false0
                for nm in names:
                    m = pc.or_(m, db_mask[nm])
                return m

            # C2 blacklist verdict on the RAW description (null/empty
            # auto-fail rides the desc-nonempty gate below)
            bl_fail = false0
            for combined, names in bl_groups.items():
                if combined is None:
                    continue
                hits_bl = pc.fill_null(
                    pc.match_substring_regex(raw, combined), False
                )
                bl_fail = pc.or_(bl_fail, pc.and_(group_mask(names), hits_bl))

            # C3 ordered filters -> collapse whitespace runs -> trim ASCII
            # spaces (Spark F.trim trims ' ' only); one battery per distinct
            # setting over the full batch, selected by db mask
            description = raw
            has_tok = false0
            for (filters, tok_bl), names in ft_groups.items():
                d = raw
                for r in filters:
                    d = pc.replace_substring_regex(d, r, " ")
                d = pc.utf8_trim(
                    pc.replace_substring_regex(d, r"\s{2,}", " "),
                    characters=" ",
                )
                m = group_mask(names)
                description = masked_fill(description, m, d)
                if tok_bl is None:
                    ht = pc.fill_null(
                        pc.match_substring_regex(d, NON_SPLITTER_CHAR), False
                    )
                else:
                    # >=1 token surviving the token blacklist: split to a
                    # list, mark survivors, OR-reduce per row
                    toks = pc.split_pattern_regex(
                        pc.utf8_lower(d), TOKEN_SPLITTER_FAST
                    )
                    tflat = pc.list_flatten(toks)
                    surv = pc.and_(
                        pc.not_equal(tflat, ""),
                        pc.invert(pc.fill_null(
                            pc.match_substring_regex(tflat, tok_bl), True
                        )),
                    ).to_numpy(zero_copy_only=False).astype(np.int8)
                    tcnt = pc.fill_null(
                        pc.list_value_length(toks), 0
                    ).to_numpy(zero_copy_only=False).astype(np.int64)
                    out = np.zeros(len(db), dtype=np.int8)
                    nz = tcnt > 0
                    if surv.size and nz.any():
                        offs = np.concatenate(([0], np.cumsum(tcnt)[:-1]))
                        out[nz] = np.maximum.reduceat(surv, offs[nz])
                    ht = pa.array(out.astype(bool))
                has_tok = pc.or_(has_tok, pc.and_(m, ht))

            # C8 short accession with full-accession fallback
            short_acc = hit_acc
            for pattern, names in sa_groups.items():
                ex = pc.extract_regex(hit_acc, pattern)
                got = pc.and_(
                    pc.is_valid(ex),
                    pc.not_equal(pc.struct_field(ex, "shortAccession"), ""),
                )
                got = pc.fill_null(got, False)
                sel = pc.if_else(
                    got, pc.struct_field(ex, "shortAccession"), hit_acc
                )
                short_acc = masked_fill(short_acc, group_mask(names), sel)

            def nn(c):  # null-safe TRUE-only predicate
                return pc.fill_null(c, False)

            gate = nn(pc.not_equal(hit_acc, ""))
            gate = pc.and_(gate, pc.is_valid(bit_score))
            gate = pc.and_(gate, nn(pc.not_equal(description, "")))
            gate = pc.and_(gate, nn(pc.less(q_start, q_end)))
            gate = pc.and_(gate, nn(pc.greater(s_end, s_start)))
            gate = pc.and_(gate, pc.is_valid(s_len))
            gate = pc.and_(gate, pc.is_valid(e_value))
            gate = pc.and_(gate, pc.is_in(db, value_set=pa.array(known_dbs)))
            gate = pc.and_(gate, pc.invert(bl_fail))
            gate = pc.and_(gate, has_tok)

            out = pa.record_batch(
                [protein_acc, qlen, db, hit_acc, q_start, q_end, s_start,
                 s_end, e_value, bit_score, s_len, description, line_no,
                 short_acc],
                names=["protein_acc", "qlen", "db", "hit_acc", "q_start",
                       "q_end", "s_start", "s_end", "e_value", "bit_score",
                       "s_len", "description", "line_no", "short_acc"],
            )
            filtered = out.filter(gate)
            if filtered.num_rows:
                yield filtered

    return shred


def detect_mentions_arrow(docs: DataFrame, cfg: AhrdConfig) -> DataFrame:
    """Slim-schema mention detection (no ``tokens``/``media_ref`` columns —
    the pipeline's checkpoint drops both anyway; callers that need them use
    ``detect_mentions``).  Caller must have verified ``re2_compatible(cfg)``.

    qlen is computed JVM-side before the Arrow map: it is one small
    expression per DOC (not per span), and keeping it out of the batch
    loop keeps the Python side span-shaped only."""
    from ahrd_spark.plans.docs import query_length_expr

    slim = docs.select(
        "doc_id", query_length_expr().alias("qlen"), "spans"
    )
    return slim.mapInArrow(_shred_factory(cfg), _OUT_SCHEMA)
