"""Batcher-style directory ingestion — the reference's batch fan-out
re-imagined as ONE docs table.

Parity: the reference Batcher (src/ahrd/controller/Batcher.java:70-114,
301-351) walks ``proteins_dir``, pairs every protein batch file with the
same-prefix file in each per-database results dir (case-insensitive,
``findFileInDirectory`` Batcher.java:93-114), and emits one YAML + one
shell line per batch for LSF-style submission.

Spark-first replacement: the same discovery walk produces per-batch
configs, but instead of generating shell scripts the batches are UNIONED
into a single docs table and hash-partitioned by ``doc_id`` — cluster
fan-out is ordinary Spark partitioning (SURVEY.md §3.4), not process
spawning.  A ``batch`` column records provenance.

Batcher-YAML keys honored (batcher_input_example.yml): ``proteins_dir``,
per-db ``dir`` (+ the usual weight/blacklist/filter/... keys),
``interpro_results_dir``, ``gene_ontology_results_dir``; per-db
``database`` (subject FASTA) is shared across batches when present.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ahrd_spark.config import AhrdConfig, load_config


def find_batch_file(directory: str, batch_name: str) -> str | None:
    """Batcher.findFileInDirectory (Batcher.java:93-114): strip the batch
    file's extension, then case-insensitively ``find()`` ``<base>.`` in the
    directory's file names.  Exactly one match -> its path; zero -> None;
    several -> error.  (The reference treats the batch name as a regex
    verbatim; mirrored here, quirks included.)"""
    base = re.sub(r"\.\S+$", "", batch_name)
    if not base.endswith("\\."):
        pat = re.compile(base + r"\.", re.IGNORECASE)
    else:  # pragma: no cover — reference's odd pre-escaped corner
        pat = re.compile(base, re.IGNORECASE)
    if not os.path.isdir(directory):
        return None
    matches = [f for f in sorted(os.listdir(directory)) if pat.search(f)]
    if len(matches) > 1:
        raise ValueError(
            f"found {len(matches)} files in {directory!r} case-insensitively "
            f"matching batch name {base!r}: {matches}"
        )
    return os.path.join(directory, matches[0]) if matches else None


def discover_batches(yml_path: str, base_dir: str | None = None) -> list[AhrdConfig]:
    """Parse a Batcher-style YAML and return one AhrdConfig per protein
    batch file, each pointing at its paired per-DB seq-sim table, GO result,
    and InterPro result (Batcher.generateYml analog, minus the shell
    scripts)."""
    import yaml

    with open(yml_path) as fh:
        raw = yaml.safe_load(fh)
    if base_dir is None:
        base_dir = os.path.dirname(os.path.abspath(yml_path))

    def _path(v):
        if v is None:
            return None
        return v if os.path.isabs(v) else os.path.join(base_dir, v)

    # reuse the regular config loader for all non-dir keys (weights,
    # blacklists, regexes...) by synthesizing a file-less config
    base_cfg = load_config(yml_path, base_dir=base_dir)

    proteins_dir = _path(raw["proteins_dir"])
    db_dirs = {
        name: _path(m.get("dir"))
        for name, m in (raw.get("blast_dbs") or {}).items()
    }
    go_dir = _path(raw.get("gene_ontology_results_dir"))
    ipr_dir = _path(raw.get("interpro_results_dir"))

    out = []
    # skip subdirectories, mirroring Batcher.java:319
    # ('!proteinFile.isDirectory()') — a nested dir is not a batch and
    # would otherwise become a bogus config whose proteins_fasta is a
    # directory
    batch_names = sorted(
        name
        for name in os.listdir(proteins_dir)
        if os.path.isfile(os.path.join(proteins_dir, name))
    )
    for batch_name in batch_names:
        dbs = []
        for db in base_cfg.blast_dbs:
            table = (
                find_batch_file(db_dirs[db.name], batch_name)
                if db_dirs.get(db.name)
                else None
            )
            dbs.append(db.__class__(**{**db.__dict__, "seq_sim_table": table}))
        out.append(
            base_cfg.with_(
                blast_dbs=tuple(dbs),
                proteins_fasta=os.path.join(proteins_dir, batch_name),
                gene_ontology_result=(
                    find_batch_file(go_dir, batch_name) if go_dir else None
                ),
                interpro_result=(
                    find_batch_file(ipr_dir, batch_name) if ipr_dir else None
                ),
            )
        )
    return out


def build_docs_batched(
    spark: SparkSession,
    yml_path: str,
    base_dir: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Walk a Batcher-style directory layout into ONE docs table
    (doc_id, spans, batch), hash-partitioned by doc_id — the batches'
    only remaining role is provenance; execution parallelism comes from
    partitioning, not per-batch processes."""
    from ahrd_spark.plans.docs import build_docs

    parts = []
    for cfg in discover_batches(yml_path, base_dir=base_dir):
        batch = os.path.splitext(os.path.basename(cfg.proteins_fasta))[0]
        parts.append(
            build_docs(spark, cfg, batch_name=batch).withColumn(
                "batch", F.lit(batch)
            )
        )
    if not parts:
        raise ValueError(f"no protein batches found via {yml_path!r}")
    docs = parts[0]
    for p in parts[1:]:
        docs = docs.unionByName(p)
    n = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return docs.repartition(n, "doc_id")
