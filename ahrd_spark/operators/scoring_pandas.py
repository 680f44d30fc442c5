"""The AHRD scoring core as ONE vectorized Arrow stage: grouped-map
``applyInPandas`` keyed by protein.

This is the alternative physical strategy to the relational formulation in
``scoring.py``: a single hash-shuffle by protein_acc, then the entire
E1-E10 math (cumulative sums, top-k, token scores, lexical/description
scores, winner selection) runs per group in vectorized pandas/NumPy over
Arrow batches — no per-row Python, no further shuffles.

When to choose which:
- relational (scoring.py): all-JVM, whole-stage codegen, map-side partial
  aggs — wins when token explosion is huge and partial combine pays off.
- grouped-Arrow (this module): one shuffle total, no (protein,token) key
  traffic — wins when proteins are small and many (shuffle-bound regimes).
Both produce identical results (asserted in tests); bench.py can compare.

The 200-hit cap bounds per-group memory, so a group always fits an Arrow
batch even at web scale.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, DoubleType, LongType, StringType, StructField, StructType,
)

WINNER_SCHEMA = StructType(
    [
        StructField("protein_acc", StringType()),
        StructField("db", StringType()),
        StructField("hit_acc", StringType()),
        StructField("short_acc", StringType()),
        StructField("description", StringType()),
        StructField("tokens", ArrayType(StringType())),
        StructField("e_value", DoubleType()),
        StructField("bit_score", DoubleType()),
        StructField("overlap", DoubleType()),
        StructField("line_no", LongType()),
        StructField("lexical_score", DoubleType()),
        StructField("rel_bit_score", DoubleType()),
        StructField("desc_score", DoubleType()),
        StructField("desc_high_score", DoubleType()),
    ]
)


def select_winners_pandas(
    hits: DataFrame,
    db_weights: dict,
    dsbs_weights: dict,
    token_w: tuple[float, float, float],
    top_k: int = 200,
    go_short_accs: set | None = None,
    prefer_go: bool = False,
) -> DataFrame:
    """Gated candidate hits -> one winner row per protein (same semantics as
    scoring.py's pipeline incl. deterministic last-inserted tie-break)."""
    bit_w, db_w, ovl_w = token_w
    go_accs = go_short_accs or set()

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        ovl = (
            (pdf.q_end - pdf.q_start + 1.0) + (pdf.s_end - pdf.s_start + 1.0)
        ) / (pdf.qlen + pdf.s_len)
        pdf = pdf.assign(
            overlap=ovl, dbw=pdf.db.map(db_weights).astype(float)
        )
        # E3 totals + max bit over ALL hits
        tot_bit = pdf.bit_score.sum()
        tot_db = pdf.dbw.sum()
        tot_ovl = pdf.overlap.sum()
        max_bit = pdf.bit_score.max()
        # E2 cumulative per token over ALL hits (vectorized explode+groupby)
        exploded = pdf[["bit_score", "dbw", "overlap", "tokens"]].explode(
            "tokens"
        )
        cum = exploded.groupby("tokens", sort=False).sum()
        # K1 top-k per db by (e_value, line_no)
        topk = (
            pdf.sort_values(["e_value", "line_no"], kind="mergesort")
            .groupby("db", sort=False)
            .head(top_k)
        )
        # E4 token scores for tokens of top-k hits only
        tk_tokens = pd.unique(topk.tokens.explode().dropna())
        c = cum.loc[tk_tokens]
        raw = (
            bit_w * c.bit_score / tot_bit
            + db_w * c.dbw / tot_db
            + ovl_w * c.overlap / tot_ovl
        )
        high = raw.max() if len(raw) else 0.0
        informative = raw > high / 2
        score = raw.where(informative, raw - high / 2)  # E6
        # E7/E8/E9 per top-k hit
        n_tokens = topk.tokens.map(len).astype(float)
        sum_ts = topk.tokens.map(lambda ts: score.loc[ts].sum())
        n_inf = topk.tokens.map(lambda ts: int(informative.loc[ts].sum()))
        lexical = pd.Series(0.0, index=topk.index)
        nz = n_inf > 0
        lexical[nz] = (sum_ts[nz] / high) * n_inf[nz] / n_tokens[nz]
        rel_bit = (
            topk.db.map(dsbs_weights).astype(float) * topk.bit_score / max_bit
        )
        desc = lexical + rel_bit
        out = topk.assign(
            lexical_score=lexical, rel_bit_score=rel_bit, desc_score=desc,
            desc_high_score=desc.max(),
        )
        # E10 (+ GO preference): deterministic last-inserted tie-break
        cand = out
        if prefer_go and go_accs:
            with_go = out[out.short_acc.isin(go_accs)]
            if len(with_go):
                cand = with_go
                out = out.assign(desc_high_score=with_go.desc_score.max())
                cand = cand.assign(desc_high_score=with_go.desc_score.max())
        winner = cand.sort_values(
            ["desc_score", "line_no", "db", "hit_acc"],
            ascending=[False, False, False, False],
            kind="mergesort",
        ).head(1)
        return winner[[f.name for f in WINNER_SCHEMA.fields]]

    cols = [f.name for f in WINNER_SCHEMA.fields
            if f.name not in ("lexical_score", "rel_bit_score", "desc_score",
                              "desc_high_score", "overlap")]
    slim = hits.select(*cols, "q_start", "q_end", "s_start", "s_end",
                       "s_len", "qlen")
    return slim.groupBy("protein_acc").applyInPandas(
        score_group, WINNER_SCHEMA
    )
