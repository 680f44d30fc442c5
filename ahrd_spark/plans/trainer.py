"""Simulated-annealing parameter trainer — Trainer.main (§3.3) re-imagined
for Spark.

Parity (reference file:line):
- SA loop                 Trainer.java:93-138 (memoization :100-106)
- acceptance probability  Trainer.java:179-199
  P = 1 when better/equal; else exp(diff * sf / T) with diff < 0
  (goldens 0.005628006 / 0.5957108, TrainerTest.java:106-128)
- accept/reject codes     Trainer.java:263-286 (0..3)
- averages                Trainer.java:215-245
- cool down               Trainer.java:206-209
- neighbour mutation      Parameters.java:132-303 (Gaussian |N(mean,sd)|
  step, token-weight renormalization to sum 1 rounded to 4 dp, db weight
  step = ceil(100*gauss), hill-climb bias pMutateSameParameter
  Parameters.java:85-95)

Spark-first design: the expensive, parameter-INDEPENDENT work (scan, gate,
tokenize, top-k, per-(protein,token,db) explode, reference tokens) is
computed ONCE and cached; each SA iteration is a handful of cheap
re-aggregations over those cached frames with the new weights folded in as
literal map expressions.  The reference re-runs its whole scoring per
iteration (75k iterations by default); here an iteration touches only
cached columnar data.  The TrainerBatcher's 1024 parallel SA starts
(TrainerBatcher.java:22) map to running this loop once per start point —
the per-start work is a driver loop; fan out with ordinary spark-submit
arrays or one driver iterating start points.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ahrd_spark.config import AhrdConfig
from ahrd_spark.operators.evaluation import eval_tokens_expr, fbeta_expr
from ahrd_spark.operators.scoring import (
    jdiv,
    select_winners,
    top_k_hits,
    weight_map_expr,
    with_overlap,
)
from ahrd_spark.plans.annotate import load_candidate_hits
from ahrd_spark.sources.fasta import read_references_fasta


def _round_n(x: float, n: int) -> float:
    # Utils.roundToNDecimalPlaces (Math.round = half-up on positives)
    f = 10.0 ** n
    return math.floor(x * f + 0.5) / f


@dataclass(frozen=True)
class Params:
    token_bit: float
    token_db: float
    token_ovl: float
    db_weight: tuple  # ((db, int), ...) sorted by db
    dsbsw: tuple  # ((db, float), ...) sorted by db
    last_mutated: int | None = None

    def key(self):
        return (
            round(self.token_bit, 4), round(self.token_db, 4),
            round(self.token_ovl, 4), self.db_weight, self.dsbsw,
        )

    def db_weight_map(self):
        return dict(self.db_weight)

    def dsbsw_map(self):
        return dict(self.dsbsw)


def params_from_config(cfg: AhrdConfig) -> Params:
    return Params(
        token_bit=cfg.token_score_bit_score_weight,
        token_db=cfg.token_score_database_score_weight,
        token_ovl=cfg.token_score_overlap_score_weight,
        db_weight=tuple(sorted(cfg.db_weights.items())),
        dsbsw=tuple(sorted(cfg.dsbs_weights.items())),
    )


def normalize_token_weights(b: float, d: float, o: float):
    """Parameters.normalizeTokenScoreWeights: divide by the 4dp-rounded sum,
    round each to 4dp."""
    s = _round_n(b + d + o, 4)
    return (_round_n(b / s, 4), _round_n(d / s, 4), _round_n(o / s, 4))


def random_params(db_names, rng: random.Random) -> Params:
    """Parameters.randomParameters (Parameters.java:54-69): token-score
    weights drawn as random multiples of 0.1 in [0.1, 1.0]
    (Utils.randomMultipleOfOneTenth:56-58) then normalized to sum 1; per
    sorted DB a description-score bit-score weight from the same
    distribution and a blast-db weight as a random multiple of 10 in
    [10, 100] (Utils.randomMultipleOfTen:65-68).  Draw order mirrors the
    Java loop (dsbsw before db-weight per database) for auditability — the
    streams themselves differ, only the distributions are pinned
    (ParametersTest.java:30-390)."""
    mult10 = lambda: (rng.randrange(10) + 1) * 10  # noqa: E731
    mult01 = lambda: mult10() * 0.01  # noqa: E731
    b, d, o = normalize_token_weights(mult01(), mult01(), mult01())
    dsbsw, dbw = [], []
    for name in sorted(db_names):
        dsbsw.append((name, mult01()))
        dbw.append((name, mult10()))
    return Params(
        token_bit=b, token_db=d, token_ovl=o,
        db_weight=tuple(dbw), dsbsw=tuple(dsbsw),
    )


def distinct_random_starts(
    n: int, db_names, rng: random.Random
) -> list[Params]:
    """TrainerBatcher.generateDistinctRandomParameters
    (TrainerBatcher.java:69-79): redraw until n pairwise-distinct start
    points exist.  NOTE: the distinct-KEY space is smaller than the raw
    draw space (normalization collapses proportional token-weight draws:
    (0.1,0.1,0.1) and (0.2,0.2,0.2) share one key), so exhaustion is
    detected dynamically — a long run of draws with no new key raises
    instead of spinning forever."""
    seen: set = set()
    out: list[Params] = []
    since_progress = 0
    while len(out) < n:
        p = random_params(db_names, rng)
        if p.key() not in seen:
            seen.add(p.key())
            out.append(p)
            since_progress = 0
        else:
            since_progress += 1
            if since_progress > 100_000:
                raise ValueError(
                    f"no new distinct start point in {since_progress} draws "
                    f"({len(out)}/{n} found) — n exceeds the distinct "
                    f"parameter-key space for {len(list(db_names))} database(s)"
                )
    return out


def load_trainer_batcher(yml_path: str, base_dir: str | None = None):
    """Parse a TrainerBatcher-style YAML (trainer_batcher_example.yml) ->
    (AhrdConfig, n_start_positions).  The reference writes
    no_start_positions_in_parameter_space YAML files plus a shell script
    that runs one Trainer JVM per file (TrainerBatcher.java:40-57); the
    engine instead runs the chains in one session via
    Trainer.train_multi_start, where every chain reuses the same cached
    parameter-independent frames.  Default mirrors noOfBatches = 1000
    (TrainerBatcher.java:22)."""
    import yaml

    from ahrd_spark.config import load_config

    cfg = load_config(yml_path, base_dir=base_dir, allow_missing_weights=True)
    with open(yml_path) as fh:
        raw = yaml.safe_load(fh)
    n = int(raw.get("no_start_positions_in_parameter_space", 1000))
    return cfg, n


class Trainer:
    def __init__(
        self,
        spark: SparkSession,
        cfg: AhrdConfig,
        seed: int = 42,
        temperature: int | None = None,
        cool_down_by: int | None = None,
        scaling_factor: float | None = None,
        mutator_mean: float | None = None,
        mutator_deviation: float | None = None,
        p_mutate_same_scale: float | None = None,
        remember_path: bool | None = None,
    ):
        """SA knobs default to the config's YAML-parsed values (the
        reference's temperature / cool_down_by /
        optimization_acceptance_probability_scaling_factor / mutator_* /
        p_mutate_same_parameter_scale / remember_simulated_annealing_path
        keys, Settings.java:292-309); constructor args override."""

        def _or(v, cfg_v):
            return v if v is not None else cfg_v

        self.spark = spark
        self.cfg = cfg
        self.rng = random.Random(seed)
        self.temperature = _or(temperature, cfg.temperature)
        self._initial_temperature = self.temperature
        self.cool_down_by = _or(cool_down_by, cfg.cool_down_by)
        self.sf = _or(
            scaling_factor, cfg.optimization_acceptance_probability_scaling_factor
        )
        self.mutator_mean = _or(mutator_mean, cfg.mutator_mean)
        self.mutator_dev = _or(mutator_deviation, cfg.mutator_deviation)
        self.p_same_scale = _or(
            p_mutate_same_scale, cfg.p_mutate_same_parameter_scale
        )
        self.remember_path = _or(
            remember_path, cfg.remember_simulated_annealing_path
        )
        self.db_names = sorted(cfg.db_names)

        # ---- parameter-independent cached frames ----------------------
        hits = with_overlap(load_candidate_hits(spark, cfg)).cache()
        self.topk = top_k_hits(hits, cfg.top_blast_results).cache()
        # per-(protein, token, db): bit/overlap sums + hit count (db weight
        # folds in per iteration as weight * n_hits)
        self.cum_parts = (
            hits.select(
                "protein_acc", "db", F.explode("tokens").alias("token"),
                "bit_score", "overlap",
            )
            .groupBy("protein_acc", "token", "db")
            .agg(
                F.sum("bit_score").alias("bit_part"),
                F.sum("overlap").alias("ovl_part"),
                F.count("*").alias("n_hits"),
            )
            .cache()
        )
        self.tot_parts = (
            hits.groupBy("protein_acc", "db")
            .agg(
                F.sum("bit_score").alias("bit_part"),
                F.sum("overlap").alias("ovl_part"),
                F.count("*").alias("n_hits"),
                F.max("bit_score").alias("max_bit_part"),
            )
            .cache()
        )
        self.tk_tokens = (
            self.topk.select("protein_acc", F.explode("tokens").alias("token"))
            .distinct()
            .cache()
        )
        self.refs = (
            read_references_fasta(
                spark,
                cfg.references_fasta,
                description_blacklist=cfg.references_description_blacklist,
                description_filter=cfg.references_description_filter,
                token_blacklist=cfg.references_token_blacklist,
            )
            .select(
                F.col("accession").alias("protein_acc"),
                F.col("tokens").alias("ref_tokens"),
            )
            .cache()
        )
        self.n_proteins = (
            hits.select("protein_acc").distinct().count()
        )
        # SA state
        self.accepted: Params | None = None
        self.accepted_score: float | None = None
        self.best: Params | None = None
        self.best_score: float = float("-inf")
        self.best_temperature: int | None = None
        self.tested: dict = {}
        self.path_log: list[dict] = []

    # ---- objective function ------------------------------------------
    def avg_eval_score(self, p: Params) -> float:
        key = p.key()
        if self.remember_path and key in self.tested:
            return self.tested[key]
        dbw = weight_map_expr(p.db_weight_map())
        dsbsw = weight_map_expr(p.dsbsw_map())

        totals = self.tot_parts.groupBy("protein_acc").agg(
            F.sum("bit_part").alias("tot_bit"),
            F.sum(dbw[F.col("db")] * F.col("n_hits")).alias("tot_db"),
            F.sum("ovl_part").alias("tot_ovl"),
            F.max("max_bit_part").alias("max_bit"),
        )
        cum = self.cum_parts.groupBy("protein_acc", "token").agg(
            F.sum("bit_part").alias("cum_bit"),
            F.sum(dbw[F.col("db")] * F.col("n_hits")).alias("cum_db"),
            F.sum("ovl_part").alias("cum_ovl"),
        )
        raw = (
            self.tk_tokens.join(cum, ["protein_acc", "token"])
            .join(totals, "protein_acc")
            .select(
                "protein_acc", "token",
                (
                    F.lit(p.token_bit) * jdiv(F.col("cum_bit"), F.col("tot_bit"))
                    + F.lit(p.token_db) * jdiv(F.col("cum_db"), F.col("tot_db"))
                    + F.lit(p.token_ovl) * jdiv(F.col("cum_ovl"), F.col("tot_ovl"))
                ).alias("raw_score"),
            )
        )
        from pyspark.sql import Window

        wnd = Window.partitionBy("protein_acc")
        tok_scores = raw.withColumn(
            "high", F.max("raw_score").over(wnd)
        ).select(
            "protein_acc", "token",
            F.when(F.col("raw_score") > F.col("high") / 2, F.col("raw_score"))
            .otherwise(F.col("raw_score") - F.col("high") / 2)
            .alias("token_score"),
            (F.col("raw_score") > F.col("high") / 2).alias("informative"),
            F.col("high"),
        )
        per_hit = (
            self.topk.select(
                "protein_acc", "db", "hit_acc",
                F.explode("tokens").alias("token"),
            )
            .join(tok_scores, ["protein_acc", "token"])
            .groupBy("protein_acc", "db", "hit_acc")
            .agg(
                F.sum("token_score").alias("sum_ts"),
                F.count("*").alias("n_tokens"),
                F.sum(F.col("informative").cast("long")).alias("n_inf"),
                F.first("high").alias("high"),
            )
        )
        lexical = F.when(F.col("n_inf") == 0, F.lit(0.0)).otherwise(
            jdiv(
                jdiv(F.col("sum_ts"), F.col("high")),
                jdiv(
                    F.col("n_tokens").cast("double"),
                    F.col("n_inf").cast("double"),
                ),
            )
        )
        scored = (
            self.topk.join(per_hit, ["protein_acc", "db", "hit_acc"])
            .join(totals.select("protein_acc", "max_bit"), "protein_acc")
            .withColumn(
                "desc_score",
                lexical + dsbsw[F.col("db")] * jdiv(F.col("bit_score"), F.col("max_bit")),
            )
        )
        winners = select_winners(scored)
        evald = winners.join(self.refs, "protein_acc").select(
            fbeta_expr(
                eval_tokens_expr(
                    F.col("description"), F.col("tokens"),
                    self.cfg.evaluate_valid_tokens,
                ),
                F.col("ref_tokens"),
                self.cfg.f_measure_beta_parameter,
            ).alias("f")
        )
        row = evald.agg(
            F.sum(F.when(~F.isnan("f"), F.col("f")).otherwise(0.0)).alias("s")
        ).first()
        score = (row["s"] or 0.0) / self.n_proteins
        if self.remember_path:
            self.tested[key] = score
        return score

    # ---- SA mechanics -------------------------------------------------
    def acceptance_probability(self, diff: float) -> float:
        if self.accepted is None or diff >= 0.0:
            return 1.0
        return math.exp(diff * self.sf / self.temperature)

    def _gauss_step(self) -> float:
        return abs(self.rng.gauss(0, 1) * self.mutator_dev + self.mutator_mean)

    def _save_subtract(self, frm: float, sub: float) -> bool:
        return self.rng.random() < 0.5 if frm - sub > 0 else False

    def p_mutate_same(self, increase: float) -> float:
        if increase is None or increase <= 0.0:
            return 0.0
        s = self.p_same_scale
        return (math.exp(-(1.0 - increase)) + s) / (1.0 + s)

    def neighbour(self, p: Params, diff: float) -> Params:
        idx = p.last_mutated
        if not (
            diff is not None and diff > 0.0 and idx is not None
            and self.rng.random() <= self.p_mutate_same(diff)
        ):
            idx = self.rng.randrange(3 + 2 * len(self.db_names))
        b, d, o = p.token_bit, p.token_db, p.token_ovl
        dbw = dict(p.db_weight)
        ds = dict(p.dsbsw)
        if idx < 3:
            step = self._gauss_step()
            vals = [b, d, o]
            vals[idx] = (
                vals[idx] - step
                if self._save_subtract(vals[idx], step)
                else vals[idx] + step
            )
            b, d, o = normalize_token_weights(*vals)
        else:
            dbi = (idx - 3) // 2
            name = self.db_names[dbi]
            if (idx - 3) % 2 == 0:
                step = int(math.ceil(100.0 * self._gauss_step()))
                w = dbw[name]
                dbw[name] = w - step if self._save_subtract(float(w), float(step)) else w + step
            else:
                step = self._gauss_step()
                w = ds[name]
                ds[name] = w - step if self._save_subtract(w, step) else w + step
        return Params(
            token_bit=b, token_db=d, token_ovl=o,
            db_weight=tuple(sorted(dbw.items())),
            dsbsw=tuple(sorted(ds.items())),
            last_mutated=idx,
        )

    def train(
        self, max_iterations: int | None = None, start: Params | None = None
    ) -> Params:
        current = start if start is not None else params_from_config(self.cfg)
        it = 0
        while self.temperature > 0:
            if max_iterations is not None and it >= max_iterations:
                break
            score = self.avg_eval_score(current)
            if self.best is None or score > self.best_score:
                self.best, self.best_score = current, score
                self.best_temperature = self.temperature
            diff = (
                score - self.accepted_score
                if self.accepted_score is not None
                else 0.0
            )
            p_accept = self.acceptance_probability(diff)
            if p_accept == 1.0:
                accepted_code = (
                    3 if self.accepted_score is None
                    or self.accepted_score < score else 2
                )
                self.accepted, self.accepted_score = current, score
            elif self.rng.random() <= p_accept:
                accepted_code = 1
                self.accepted, self.accepted_score = current, score
            else:
                accepted_code = 0
            self.path_log.append(
                {
                    "temperature": self.temperature,
                    "avg_evaluation_score": score,
                    "diff": diff,
                    "accepted": accepted_code,
                    "params": current.key(),
                }
            )
            current = self.neighbour(self.accepted, diff)
            self.temperature -= self.cool_down_by
            it += 1
        if self.cfg.path_log:
            self.write_path_log(self.cfg.path_log)
        return self.best

    def train_multi_start(
        self,
        n_starts: int,
        seed: int | None = None,
        max_iterations: int | None = None,
    ) -> Params:
        """TrainerBatcher re-imagined (TrainerBatcher.java:40-79): instead
        of writing n_starts YAML files and launching one Trainer JVM per
        file, run n_starts SA chains in THIS session from pairwise-distinct
        random start points (Parameters.randomParameters) and return the
        best parameters found across all chains.

        Every chain reuses the SAME cached parameter-independent frames
        (scan/gate/tokenize/top-k partials) — the dominant cost the
        reference pays once per JVM is paid once total here.  When
        remember_path memoization is on, the score cache also spans chains:
        the objective is a pure function of the parameter key, so a point
        revisited by a later chain is free.

        Per-chain summaries land in ``self.multi_start_log``; after the
        run, ``self.path_log`` (and a configured cfg.path_log file) holds
        the WINNING chain's path so the B5 side-channel stays coherent.
        """
        rng = random.Random(seed if seed is not None else self.rng.random())
        starts = distinct_random_starts(n_starts, self.db_names, rng)
        self.multi_start_log = []
        g_best, g_best_score, g_best_temp, g_best_path = None, float("-inf"), None, []
        for i, start in enumerate(starts):
            # reset per-chain SA state; `tested` deliberately persists
            self.temperature = self._initial_temperature
            self.accepted = self.accepted_score = None
            self.best, self.best_score = None, float("-inf")
            self.best_temperature = None
            self.path_log = []
            # defer the path-log file write until the winner is known
            cfg_path_log, self.cfg = self.cfg.path_log, self.cfg.with_(
                path_log=None
            )
            try:
                best = self.train(max_iterations=max_iterations, start=start)
            finally:
                self.cfg = self.cfg.with_(path_log=cfg_path_log)
            if best is None:
                raise ValueError(
                    "SA chain ran zero iterations (temperature <= 0 or "
                    "max_iterations == 0) — nothing to select a best from"
                )
            self.multi_start_log.append(
                {
                    "chain": i,
                    "start": start.key(),
                    "best": best.key(),
                    "best_score": self.best_score,
                    "best_temperature": self.best_temperature,
                }
            )
            if self.best_score > g_best_score:
                g_best, g_best_score = best, self.best_score
                g_best_temp, g_best_path = self.best_temperature, self.path_log
        self.best, self.best_score = g_best, g_best_score
        self.best_temperature, self.path_log = g_best_temp, g_best_path
        if self.cfg.path_log:
            self.write_path_log(self.cfg.path_log)
        return g_best

    # ---- B5: simulated-annealing path log -----------------------------
    @staticmethod
    def _fmt(x) -> str:
        """#,###0.### formatting with NaN/None -> 'NA'
        (AbstractOutputWriter.java:22-33 / TrainerOutputWriter FRMT)."""
        if x is None or (isinstance(x, float) and math.isnan(x)):
            return "NA"
        r = _round_n(float(x), 3)
        return f"{r:,.3f}".rstrip("0").rstrip(".") if r % 1 else f"{int(r):,}"

    @staticmethod
    def _fmt6(x) -> str:
        """TrainerOutputWriter.FRMT '#,######0.######' (6 fractional
        digits) used for the per-DB weight columns — NOT the 3-digit
        AbstractOutputWriter format.  The pattern's grouping size is 6
        digits, which never triggers for weight-range values, so plain
        non-grouped formatting is byte-identical here."""
        if x is None or (isinstance(x, float) and math.isnan(x)):
            return "NA"
        r = _round_n(float(x), 6)
        s = f"{r:.6f}".rstrip("0").rstrip(".")
        return s if s not in ("", "-0") else "0"

    def write_path_log(self, path: str) -> None:
        """Write the per-iteration SA path as the reference's path-log CSV
        (TrainerOutputWriter.java:39-66 header/row shape).  The Spark
        trainer's objective is the average F-score; the TPR/FPR columns
        print NA.  Driver-side write — the log is one row per iteration."""
        hdr = (
            "Temperature\tAverage Evaluation-Score(F-Score)"
            "\tDiff-to-curr-Accepted\tAccepted"
            "\tAverage True-Positive-Rate\tAverage False-Positive-Rate"
            "\tToken-Score-Bit-Score-Weight\tToken-Score-Database-Score-Weight"
            "\tToken-Score-Overlap-Score-Weight"
        )
        for db in self.db_names:
            hdr += f"\t{db}-Weight\t{db}-Description-Score-Bit-Score-Weight"
        lines = [hdr]
        for e in self.path_log:
            bit, dbw, ovl, db_weight, dsbsw = e["params"]
            # the extra empty cell after Average False-Positive-Rate is a
            # deliberate reproduction of the reference's settingsRow quirk
            # ('\t' + '\t', TrainerOutputWriter.java:87): data rows carry
            # one more column than generateHeader emits.  Kept for byte
            # parity with reference path logs.
            row = (
                f"{e['temperature']}\t{e['avg_evaluation_score']!r}"
                f"\t{e['diff']!r}\t{e['accepted']}"
                f"\tNA\tNA\t"
                f"\t{self._fmt(bit)}\t{self._fmt(dbw)}\t{self._fmt(ovl)}"
            )
            dbm, dsm = dict(db_weight), dict(dsbsw)
            for db in self.db_names:
                row += f"\t{self._fmt6(dbm[db])}\t{self._fmt6(dsm[db])}"
            lines.append(row)
        with open(path, "w") as fh:
            fh.write("\n".join(lines) + "\n")
