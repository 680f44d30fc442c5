"""Audit the optimized physical plan of every driver query.

For each ``queries()`` entry this builds (does NOT execute) the plan at
a given sf dir and tallies the markers that matter at 100 TB:

- ``xchg``   Exchange nodes (shuffles) — the scale currency;
- ``bhj``    BroadcastHashJoin count;
- ``smj``    SortMergeJoin count (fact-to-fact joins — fine, but worth
             eyeballing: an SMJ against a dimension is a regression);
- ``bnlj``   BroadcastNestedLoopJoin count (only legitimate for
             deliberate broadcast scans: ANN query panels, centroids);
- ``pyrow``  BatchEvalPython (row-wise Python — banned; the pytest suite
             enforces 0, this prints the receipts);
- ``pyarrow`` ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas
             (the sanctioned vectorized-Python surfaces);
- ``pushed`` scans whose parquet PushedFilters list is non-empty.

Usage: ``python tools/plan_audit.py [sf_dir] [query ...]``
Writes a markdown table to stdout; exit 1 if any plan contains
BatchEvalPython.

Queries that EXECUTE work while building (checkpointed pipeline,
streaming sinks) are skipped by default — their plans are stage-wise by
design and audited via their own oracles.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from ahrd_spark.session import get_spark  # noqa: E402

EXECUTING = {
    "pipeline_triples", "pipeline_triples_goprefer",
    "pipeline_triples_stream", "pipeline_triples_arrowshred",
    "curation_pipeline", "curation_pipeline_full",
    "events_stateful_sessions", "stream_dedup", "stream_interleaved",
    "hits_hub_auth", "media_cc",
    "cc_components", "kcore_peel", "pagerank", "pagerank_personalized",
    "lpa_communities", "sssp_bounded", "pca_loadings", "pca_project",
    "bpe_merges", "bpe_segment", "kmeans_assign", "semantic_dedup",
    "dedup_incremental", "stream_dedup",
    # checkpointed-frontier iteration: the returned plan is mostly
    # truncated checkpoint scans, so a static audit is meaningless
    "kg_path_closure", "kg_owl_rules", "kg_reach_delta",
    "stream_kmv", "kg_owl_delta", "kg_random_walks",
    "kg_weighted_walks",
    # runs docs.count() at build time to size the reduction ratio
    "dedup_blocking_quality",
    # checkpointed staged pipeline (cold-run workdir)
    "kg_embedding_prep",
}


def audit(sf_dir: str, only: list[str]) -> int:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    rows = []
    offenders = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        if not only and name in EXECUTING:
            continue
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001 - audit keeps going
            rows.append((name, f"ERROR {str(e)[:80]}"))
            continue
        pushed = len(
            [
                m
                for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
                if m.strip()
            ]
        )
        n_reused = plan.count("ReusedExchange")
        stats = {
            # "Exchange" also substring-matches ReusedExchange: count real
            # shuffles and reuses separately (a reuse is a WIN, not a cost)
            "xchg": plan.count("Exchange") - n_reused,
            "reuse": n_reused,
            "bhj": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "pyrow": plan.count("BatchEvalPython"),
            "pyarrow": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas"),
            "pushed": pushed,
        }
        if stats["pyrow"]:
            offenders.append(name)
        rows.append((name, stats))
    print(
        "| query | xchg | reuse | bhj | smj | bnlj | pyrow | pyarrow |"
        " pushed |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    for name, s in sorted(rows):
        if isinstance(s, str):
            print(f"| {name} | {s} |")
        else:
            print(
                f"| {name} | {s['xchg']} | {s['reuse']} | {s['bhj']} |"
                f" {s['smj']} | {s['bnlj']} | {s['pyrow']} |"
                f" {s['pyarrow']} | {s['pushed']} |"
            )
    if offenders:
        print(f"\nROW-WISE PYTHON UDFS IN: {offenders}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.001"
    raise SystemExit(audit(sf, args[1:]))
