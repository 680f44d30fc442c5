"""Text scalar functions — tokenization, regex blacklists/filters, parsing.

All of these stay in Spark *native* expressions (JVM-side, whole-stage
codegen, Java regex dialect — the same dialect the reference's blacklist /
filter / header regex files are written in).  No Python UDFs in any hot path.

Parity map (reference file:line):
- T1 tokenize            TokenScoreCalculator.java:54-64 + BlastResult.java:29
- T2 patternize          BlastResult.java:391-401
- T4 e-value repair      BlastResult.java:91-95
- C2 desc blacklist      DescriptionScoreCalculator.java:25-33
- C3 desc filter         DescriptionScoreCalculator.java:45-55 (order-sensitive)
- C4 token blacklist     TokenScoreCalculator.java:32-43
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from ahrd_spark.config import TOKEN_SPLITTER_FAST


def combine_find_regexes(regexes) -> str | None:
    """Combine a regex list into one alternation with `find()` semantics.

    The reference rejects a string when ANY list entry ``Matcher.find()``s
    (unanchored search).  ``rlike`` has exactly `find()` semantics, and
    wrapping each pattern in a non-capturing group keeps inline flags like
    ``(?i)`` scoped to their own pattern.
    """
    regexes = [r for r in regexes if r]
    if not regexes:
        return None
    return "|".join(f"(?:{r})" for r in regexes)


def blacklist_fails_expr(col: Column, regexes) -> Column:
    """TRUE iff the value fails the blacklist (C2/C4 semantics).

    Null/empty strings auto-fail (DescriptionScoreCalculator.java:26,
    TokenScoreCalculator.java:34).
    """
    fails = col.isNull() | (col == F.lit(""))
    combined = combine_find_regexes(regexes)
    if combined is not None:
        fails = fails | col.rlike(combined)
    return fails


def apply_filter_regexes(col: Column, regexes) -> Column:
    """C3 description filter: delete every match of every regex IN ORDER
    (replacement is a single space to keep word boundaries), then collapse
    runs of whitespace and trim.  Serial application matters: a later regex
    may match only after an earlier one rewrote the line
    (DescriptionScoreCalculator.java:45-55, README.textile:125-131).
    """
    out = col
    for r in regexes:
        out = F.regexp_replace(out, F.lit(r), F.lit(" "))
    out = F.trim(F.regexp_replace(out, F.lit(r"\s{2,}"), F.lit(" ")))
    return out


def tokenize_expr(desc: Column, token_blacklist=()) -> Column:
    """T1: split on TOKEN_SPLITTER_REGEX, lowercase, dedupe, drop empties,
    drop blacklisted.  Returns ARRAY<STRING> sorted for determinism (the
    reference keeps a HashSet — order is irrelevant to all downstream math;
    sorting gives us stable results and stable tests).

    Golden: "Flavohemoprotein-1" -> [1, flavohemoprotein]
    (test/ahrd/test/BlastResultTest.java:54-59).
    """
    toks = F.array_distinct(F.split(F.lower(desc), TOKEN_SPLITTER_FAST))
    combined = combine_find_regexes(token_blacklist)
    if combined is not None:
        keep = lambda t: (t != F.lit("")) & ~t.rlike(combined)  # noqa: E731
        return F.sort_array(F.filter(toks, keep))
    # sort_array (not array_sort) and array_remove (not F.filter): both are
    # ordinary codegen'd expressions, while the higher-order variants carry a
    # lambdafunction that knocks EVERY enclosing operator out of whole-stage
    # codegen — with tokenize in the mention gate that de-codegens the widest
    # Filter+Project of the pipeline.  Token arrays contain no nulls, so
    # sort_array(asc, nulls-first) == array_sort(nulls-last) here.
    return F.sort_array(F.array_remove(toks, ""))


def has_token_expr(desc: Column, token_blacklist=()) -> Column:
    """TRUE iff ``tokenize_expr(desc, token_blacklist)`` would be non-empty,
    without materializing the token array (the mention gate only needs the
    emptiness verdict; the array itself is dropped from the slim checkpoint
    and re-derived in link-score).

    - empty blacklist: >=1 token  <=>  >=1 non-splitter character.  One
      rlike, no split, no array.  (lower() cannot turn a non-splitter char
      into a splitter: the splitter class is punctuation/whitespace only.)
    - with a blacklist: exists() over the split — short-circuits on the
      first surviving token and skips tokenize's distinct + sort.

    Equivalence with size(tokenize_expr(...)) > 0 is pinned by
    tests/test_text_functions.py (incl. a hypothesis property).
    """
    from ahrd_spark.config import NON_SPLITTER_CHAR, TOKEN_SPLITTER_FAST

    combined = combine_find_regexes(token_blacklist)
    if combined is None:
        return desc.rlike(NON_SPLITTER_CHAR)
    toks = F.split(F.lower(desc), TOKEN_SPLITTER_FAST)
    return F.exists(toks, lambda t: (t != F.lit("")) & ~t.rlike(combined))


def patternize_expr(tokens: Column) -> Column:
    """T2: sorted unique tokens concatenated — the description-line identity
    key (BlastResult.java:391-401)."""
    return F.concat_ws("", F.array_sort(tokens))


def repair_double_expr(col: Column) -> Column:
    """T4: BLAST writes tiny e-values as 'e-105'; repair to '1e-105' before
    casting (BlastResult.java:91-95)."""
    return F.when(col.rlike("^[eE]"), F.concat(F.lit("1"), col)).otherwise(col)


def java_named_to_python(pattern: str) -> str:
    """Translate Java named groups ``(?<name>`` to Python ``(?P<name>``.

    Lookbehinds ``(?<=`` / ``(?<!`` are left untouched.  Used only to
    *inspect* a Java regex with Python's re (e.g. find a named group's
    positional index); the original Java pattern is what ships to Spark.
    """
    return re.sub(r"\(\?<(?![=!])", "(?P<", pattern)


def named_group_index(pattern: str, group_name: str) -> int:
    """Positional index of a named capturing group in a Java-dialect regex.

    Group numbering is identical between java.util.regex and Python re
    (capturing groups counted by opening parens), so compiling the translated
    pattern with Python gives the index usable in Spark's regexp_extract.
    """
    compiled = re.compile(java_named_to_python(pattern))
    try:
        return compiled.groupindex[group_name]
    except KeyError:
        raise KeyError(
            f"regex {pattern!r} has no named group {group_name!r}"
        ) from None
