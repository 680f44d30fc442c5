"""Distributed BPE tokenizer training — learn merge operations from the
corpus, apply them to segment words.

The tokenizer-training step of an LLM data pipeline (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"): start from
character-split words, repeatedly (a) count adjacent symbol pairs weighted
by word frequency, (b) merge the most frequent pair everywhere.  The
classic implementation is a single-machine loop over a Counter; here both
steps are corpus-scale DataFrame jobs:

- the word-frequency vocabulary is ONE (word)-keyed aggregate of the
  corpus — after that, every iteration touches only the VOCABULARY
  (|vocab| << corpus; Heaps' law), so 100 TB of text trains from the same
  few-million-row frame;
- each iteration is one pair-explode + one (left, right)-keyed count agg
  (map-side partial), then ONE driver-collected row — the argmax pair.
  Collecting it is correct at any scale: the merge list is the MODEL
  (dictionary-sized by construction, one row per iteration);
- the merge application is a pure string ``replace`` on an encoding
  chosen so that leftmost non-overlapping replace IS greedy BPE (see
  below) — no Python UDF anywhere, and DuckDB replays the whole learning
  loop verbatim (``__spark_entry__`` oracle ``bpe_merges``).

Merge-application encoding: a word's symbol sequence is stored as
``' '`` + ``'  '``.join(symbols) + ``' '`` — TWO spaces between symbols,
ONE space of padding at each end.  Merging pair (L, R) is then

    replace(syms, ' L  R ', ' LR ')

Each match consumes one boundary space on each side, leaving the
double-space invariant intact between the new symbol and its neighbors,
and leftmost-non-overlapping scanning resumes exactly at the symbol after
the merged pair — byte-for-byte the greedy left-to-right merge of Sennrich
BPE, including same-symbol runs ('aaaa' + (a,a) -> 'aa aa'), in ONE pass.
(Property-tested against a reference greedy merger over 200k random
symbol sequences; the naive single-space encoding is NOT greedy on runs.)

Symbols never contain spaces (words come from whitespace tokenization),
so the encoding is unambiguous.  No end-of-word sentinel is used: merges
never cross word boundaries, and the segmentation of a word is
self-contained (document-level token counts follow from the vocab join).

Reference framing: AHRD's trainer learns scoring weights from data
(Trainer.java); this is the same "fit the model with Spark aggregates,
keep the model driver-sized" shape applied to subword vocabulary
learning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ahrd_spark.operators.corpus import _ws_tokens


def _symbolize(word_col):
    """'abc' -> ' a  b  c ' (double-space separators, single-space pads)."""
    return F.concat(
        F.lit(" "),
        F.trim(F.regexp_replace(word_col, "(.)", "$1  ")),
        F.lit(" "),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(syms, cnt) -> (left, right, pair_count): adjacent-symbol pairs
    weighted by word frequency.  Same explode-positions shape as
    ``corpus.bigram_lm_scores`` — the shuffle is keyed by (left, right)."""
    base = vocab.select(
        F.split(F.trim("syms"), "  ").alias("toks"), F.col("cnt")
    ).withColumn("n", F.size("toks"))
    pos = F.explode(F.sequence(F.lit(1), F.greatest(F.col("n") - 1, F.lit(1))))
    return (
        base.filter(F.col("n") >= 2)
        .select("toks", "cnt", pos.alias("pos"))
        .select(
            F.try_element_at("toks", F.col("pos")).alias("left"),
            F.try_element_at("toks", F.col("pos") + 1).alias("right"),
            "cnt",
        )
        .groupBy("left", "right")
        .agg(F.sum("cnt").cast("bigint").alias("pair_count"))
    )


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, cnt, syms): the word-frequency table BPE trains
    on, with the double-space symbol encoding attached."""
    return (
        docs.select(F.explode(_ws_tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .withColumn("syms", _symbolize(F.col("word")))
    )


def learn_bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    batch_k: int = 1,
    checkpoint_dir: str | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merge operations from the corpus ->
    [(rank, left, right, pair_count)], rank starting at 1 in learning
    order.  Ties break deterministically by (pair_count DESC, left ASC,
    right ASC).  Stops early if no adjacent pair remains.

    ``batch_k=1`` (default) is EXACT sequential Sennrich BPE — one count
    pass per merge.  ``batch_k>1`` is the scale path for real vocabularies
    (a 32k-merge model at one Spark job pair per merge is 64k jobs): per
    count pass, accept up to ``batch_k`` top pairs that are pairwise
    SYMBOL-DISJOINT (greedy scan down the ranked list, skipping any pair
    sharing a left/right symbol with an already-accepted one), then apply
    them in one chained-replace pass.  Disjointness makes the chained
    application order-independent and keeps every accepted pair's count
    exact (a merge only perturbs pairs sharing one of its symbols); the
    only divergence vs sequential BPE is that a pair CREATED by a merge
    (e.g. ('ab','c') after ('a','b')) can first be picked next round, not
    within the same round — the standard parallel-BPE trade (fastBPE-style),
    cutting rounds by ~batch_k while keeping ranks deterministic.

    The returned list is the model (driver-sized by construction).  Use
    ``segment_vocab`` / ``merges_df`` to take it back distributed.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if batch_k < 1:
        raise ValueError("batch_k must be >= 1")
    spark = docs.sparkSession
    if checkpoint_dir:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    vocab = word_vocab(docs, text_col=text_col).select("syms", "cnt")
    vocab = (
        vocab.checkpoint(eager=True)
        if checkpoint_dir
        else vocab.localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        # over-fetch so the disjointness filter can still fill the batch
        ranked = (
            _pair_counts(vocab)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(batch_k * 4)
            .collect()
        )
        if not ranked:
            break
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for row in ranked:
            if len(accepted) == batch_k or len(merges) + len(accepted) == n_merges:
                break
            left, right = row["left"], row["right"]
            if left in used or right in used:
                continue
            accepted.append((left, right, int(row["pair_count"])))
            used.update((left, right, left + right))
        if not accepted:
            break
        syms = F.col("syms")
        for left, right, pc in accepted:
            merges.append((len(merges) + 1, left, right, pc))
            syms = F.replace(
                syms, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
            )
        vocab = vocab.withColumn("syms", syms)
        # re-anchor per round: keeps the replace chain out of the plan so
        # round N's two jobs never re-run rounds 1..N-1
        vocab = (
            vocab.checkpoint(eager=True)
            if checkpoint_dir
            else vocab.localCheckpoint(eager=True)
        )
    return merges


def merges_df(spark, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    """Model list -> DataFrame (rank, left, right, pair_count)."""
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )


def segment_vocab(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    exprs_per_stage: int = 256,
) -> DataFrame:
    """Apply a learned merge list to the corpus vocabulary ->
    (word, cnt, n_pieces, pieces) with ``pieces`` the '  '-joined subword
    segmentation (one ``replace`` per merge, in rank order — BPE
    application order IS learning order).  No shuffle beyond the vocab
    aggregate itself.

    A real model is 32k merges: one projection with 32k nested replace
    calls would blow Catalyst's expression-tree recursion, so the chain is
    cut into ``exprs_per_stage``-sized projections re-anchored with a
    localCheckpoint between them (the vocab frame is small; the model is
    applied once, not per-document)."""
    vocab = word_vocab(docs, text_col=text_col)
    ordered = sorted(merges)
    for start in range(0, len(ordered), exprs_per_stage):
        syms = F.col("syms")
        for _rank, left, right, _pc in ordered[start:start + exprs_per_stage]:
            syms = F.replace(
                syms, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
            )
        vocab = vocab.withColumn("syms", syms)
        if start + exprs_per_stage < len(ordered):
            vocab = vocab.localCheckpoint(eager=True)
    pieces = F.trim(F.col("syms"))
    return vocab.select(
        "word",
        "cnt",
        F.size(F.split(pieces, "  ")).alias("n_pieces"),
        pieces.alias("pieces"),
    )
