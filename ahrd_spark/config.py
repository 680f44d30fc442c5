"""Run configuration — the engine's equivalent of AHRD's YAML Settings.

Parity notes (reference file:line):
- key names and defaults mirror /root/reference/src/ahrd/controller/Settings.java:44-230
- default FASTA header regex          Settings.java:92-93
- default short-accession regex       Settings.java:94-95
- default reference-GO (GOA) regex    Settings.java:96-98
- default BLAST8 column layout        Settings.java:209-218

Unlike the reference (a thread-local mutable singleton), this is an immutable
dataclass the driver broadcasts implicitly by closure capture; all regex lists
are shipped as plain python lists and compiled into Spark *native* expressions
(Java regex dialect — same engine the reference uses).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace

# Java-dialect regexes, used verbatim in Spark native expressions
# (rlike / regexp_replace / regexp_extract run java.util.regex on the JVM).
DEFAULT_FASTA_HEADER_REGEX = r"^>(?<accession>\S+)\s+(?<description>.+?)\s+(((OS|os)=.+)|((GN|gn)=.+))?$"
DEFAULT_SHORT_ACCESSION_REGEX = r"^[^|]+\|(?<shortAccession>[^|]+)"
DEFAULT_REFERENCE_GO_REGEX = (
    r"^UniProtKB\t(?<shortAccession>[^\t]+)\t[^\t]+\t(?!NOT\|)[^\t]*\t(?<goTerm>GO:\d{7})"
)
# BlastResult.java:29
TOKEN_SPLITTER_REGEX = "-|/|;|\\\\|,|:|\"|'|\\.|\\s+|\\||\\(|\\)"
# Hot-path equivalent of the reference's 12-branch alternation: one
# character class, runs collapsed.  Because the tokenizer drops empty
# strings afterwards, splitting on runs yields the identical token set
# while the regex engine does a single class test per char instead of
# twelve alternation attempts (tokenize is the widest scan expression in
# mention-detect).  Equivalence is asserted in tests/test_text_functions.py.
TOKEN_SPLITTER_FAST = "[-/;\\\\,:\"'.|()\\s]+"
# Negated splitter class: a description yields >=1 token iff it contains
# any character OUTSIDE the splitter set (the mention gate's "has a token"
# predicate reduces to one rlike of this class when the token blacklist is
# empty — no split, no array allocation).  Derived, not hand-copied, so the
# two classes cannot drift.
NON_SPLITTER_CHAR = TOKEN_SPLITTER_FAST[:-1].replace("[", "[^", 1)

# AHRD.java:160 — hardcoded top-k cap per (protein, blast database)
TOP_BLAST_RESULTS = 200


@dataclass(frozen=True)
class BlastDbConfig:
    """Per-database settings (Settings.java blast_dbs sub-map)."""

    name: str
    weight: int  # blast database weight (E2/E3 'database score' summand)
    description_score_bit_score_weight: float  # dsbsw (E8)
    seq_sim_table: str | None = None  # tabular BLAST8 results path
    fasta_db: str | None = None  # subject FASTA database path
    blacklist: tuple[str, ...] = ()  # description blacklist regexes (C2)
    filter: tuple[str, ...] = ()  # description filter regexes, ordered (C3)
    token_blacklist: tuple[str, ...] = ()  # token blacklist regexes (C4)
    fasta_header_regex: str = DEFAULT_FASTA_HEADER_REGEX
    short_accession_regex: str = DEFAULT_SHORT_ACCESSION_REGEX


@dataclass(frozen=True)
class AhrdConfig:
    """Whole-run settings. Field names follow the reference YAML keys."""

    blast_dbs: tuple[BlastDbConfig, ...] = ()
    token_score_bit_score_weight: float = 0.5
    token_score_database_score_weight: float = 0.3
    token_score_overlap_score_weight: float = 0.2
    proteins_fasta: str | None = None
    gene_ontology_result: str | None = None  # GOA path -> enables GO transfer
    reference_go_regex: str = DEFAULT_REFERENCE_GO_REGEX
    interpro_database: str | None = None
    interpro_result: str | None = None
    prefer_reference_with_go_annos: bool = False
    f_measure_beta_parameter: float = 1.0
    evaluate_valid_tokens: bool = True
    references_fasta: str | None = None
    # eval-reference description filtering (Settings.java:66-68,
    # ReferenceDescription.java:30-45); same regex-list file format as the
    # per-DB blacklist/filter knobs
    references_description_blacklist: tuple[str, ...] = ()
    references_description_filter: tuple[str, ...] = ()
    references_token_blacklist: tuple[str, ...] = ()
    blast2go: str | None = None
    output: str | None = None
    output_fasta: bool = False
    write_best_blast_hits_to_output: bool = False
    find_highest_possible_evaluation_score: bool = False
    # tabular scan layout (Settings.java:209-218); 0-based column indices
    seq_sim_search_table_comment_line_regex: str | None = None
    seq_sim_search_table_sep: str = "\t"
    seq_sim_search_table_query_col: int = 0
    seq_sim_search_table_subject_col: int = 1
    seq_sim_search_table_query_start_col: int = 6
    seq_sim_search_table_query_end_col: int = 7
    seq_sim_search_table_subject_start_col: int = 8
    seq_sim_search_table_subject_end_col: int = 9
    seq_sim_search_table_e_value_col: int = 10
    seq_sim_search_table_bit_score_col: int = 11
    top_blast_results: int = TOP_BLAST_RESULTS
    # trainer / simulated annealing (Settings.java:71-78, defaults
    # Settings.java:150-199)
    temperature: int = 75000
    cool_down_by: int = 1
    optimization_acceptance_probability_scaling_factor: float = 2_500_000_000.0
    mutator_mean: float = 0.25
    mutator_deviation: float = 0.15
    p_mutate_same_parameter_scale: float = 0.7
    remember_simulated_annealing_path: bool = False
    path_log: str | None = None  # simulated-annealing path-log CSV (B5)
    # HRD-scores side-channel (Settings.java:60, OutputWriter.java:109-132):
    # non-empty path enables the per-(protein, hit, score) dump (B4)
    hrd_scores_output: str | None = None
    write_scores_to_output: bool = False
    write_token_set_to_output: bool = False

    @property
    def do_write_hrd_scores(self) -> bool:
        # Settings.java:767-768 — trigger is a non-empty path
        return bool(self.hrd_scores_output)

    def __post_init__(self):
        s = (
            self.token_score_bit_score_weight
            + self.token_score_database_score_weight
            + self.token_score_overlap_score_weight
        )
        # TokenScoreCalculator.java:187-197 — weights must sum to 1 +/- 1e-3
        if not (0.999 <= round(s, 9) <= 1.001):
            raise ValueError(
                "token score weights must sum to 1 (+/-0.001), got %r" % s
            )

    @property
    def db_names(self) -> list[str]:
        return [d.name for d in self.blast_dbs]

    @property
    def db_weights(self) -> dict[str, int]:
        return {d.name: d.weight for d in self.blast_dbs}

    @property
    def dsbs_weights(self) -> dict[str, float]:
        return {d.name: d.description_score_bit_score_weight for d in self.blast_dbs}

    def db(self, name: str) -> BlastDbConfig:
        for d in self.blast_dbs:
            if d.name == name:
                return d
        raise KeyError(name)

    @property
    def has_go(self) -> bool:
        return bool(self.gene_ontology_result)

    def with_(self, **kw) -> "AhrdConfig":
        return replace(self, **kw)


def _read_regex_list(path: str | None, base_dir: str) -> tuple[str, ...]:
    """Utils.fromFile (Utils.java:92-101): one regex per line, blanks dropped."""
    if not path:
        return ()
    p = path if os.path.isabs(path) else os.path.join(base_dir, path)
    with open(p) as fh:
        return tuple(ln.rstrip("\n") for ln in fh if ln.strip())


def load_config(
    yml_path: str,
    base_dir: str | None = None,
    allow_missing_weights: bool = False,
) -> AhrdConfig:
    """Parse an AHRD-style input.yml (Settings.java:248-376 analog).

    Relative paths in the YAML resolve against ``base_dir`` (defaults to the
    YAML's own directory — the reference resolves against the CWD of the JVM,
    which its docs assume is the repo root).
    """
    import yaml

    with open(yml_path) as fh:
        raw = yaml.safe_load(fh)
    if base_dir is None:
        base_dir = os.path.dirname(os.path.abspath(yml_path))

    def _path(v):
        if v is None:
            return None
        return v if os.path.isabs(v) else os.path.join(base_dir, v)

    dbs = []
    for name, m in (raw.get("blast_dbs") or {}).items():
        dbs.append(
            BlastDbConfig(
                name=name,
                # weight keys are REQUIRED for annotate/pipeline configs —
                # a missing or typo'd key must fail at load, not silently
                # score with a placeholder.  Only the TrainerBatcher loader
                # passes allow_missing_weights=True: its YAMLs omit weights
                # by design because every start point draws its own via
                # Parameters.randomParameters.
                weight=(
                    int(m.get("weight", 100))
                    if allow_missing_weights
                    else int(m["weight"])
                ),
                description_score_bit_score_weight=(
                    float(m.get("description_score_bit_score_weight", 0.5))
                    if allow_missing_weights
                    else float(m["description_score_bit_score_weight"])
                ),
                seq_sim_table=_path(m.get("file")),
                fasta_db=_path(m.get("database")),
                blacklist=_read_regex_list(m.get("blacklist"), base_dir),
                filter=_read_regex_list(m.get("filter"), base_dir),
                token_blacklist=_read_regex_list(m.get("token_blacklist"), base_dir),
                fasta_header_regex=m.get("fasta_header_regex", DEFAULT_FASTA_HEADER_REGEX),
                short_accession_regex=m.get(
                    "short_accession_regex", DEFAULT_SHORT_ACCESSION_REGEX
                ),
            )
        )
    # Settings.java:448-455 — DB names sorted for deterministic parameter order
    dbs.sort(key=lambda d: d.name)

    kw = dict(
        blast_dbs=tuple(dbs),
        proteins_fasta=_path(raw.get("proteins_fasta")),
        gene_ontology_result=_path(raw.get("gene_ontology_result")),
        interpro_database=_path(raw.get("interpro_database")),
        interpro_result=_path(raw.get("interpro_result")),
        references_fasta=_path(raw.get("references_fasta")),
        references_description_blacklist=_read_regex_list(
            raw.get("references_description_blacklist"), base_dir
        ),
        references_description_filter=_read_regex_list(
            raw.get("references_description_filter"), base_dir
        ),
        references_token_blacklist=_read_regex_list(
            raw.get("references_token_blacklist"), base_dir
        ),
        blast2go=_path(raw.get("blast2go")),
        output=_path(raw.get("output")),
        path_log=_path(raw.get("path_log")),
        hrd_scores_output=_path(raw.get("hrd_scores_output")),
    )
    for k in (
        "token_score_bit_score_weight",
        "token_score_database_score_weight",
        "token_score_overlap_score_weight",
        "f_measure_beta_parameter",
        "optimization_acceptance_probability_scaling_factor",
        "mutator_mean",
        "mutator_deviation",
        "p_mutate_same_parameter_scale",
    ):
        if k in raw:
            kw[k] = float(raw[k])
    for k in (
        "prefer_reference_with_go_annos",
        "evaluate_valid_tokens",
        "output_fasta",
        "write_best_blast_hits_to_output",
        "find_highest_possible_evaluation_score",
        "remember_simulated_annealing_path",
        "write_scores_to_output",
        "write_token_set_to_output",
    ):
        if k in raw:
            kw[k] = str(raw[k]).lower() in ("true", "1", "yes")
    for k in (
        "temperature",
        "cool_down_by",
        "seq_sim_search_table_query_col",
        "seq_sim_search_table_subject_col",
        "seq_sim_search_table_query_start_col",
        "seq_sim_search_table_query_end_col",
        "seq_sim_search_table_subject_start_col",
        "seq_sim_search_table_subject_end_col",
        "seq_sim_search_table_e_value_col",
        "seq_sim_search_table_bit_score_col",
    ):
        if k in raw:
            kw[k] = int(raw[k])
    if "seq_sim_search_table_sep" in raw:
        kw["seq_sim_search_table_sep"] = str(raw["seq_sim_search_table_sep"])
    if "seq_sim_search_table_comment_line_regex" in raw:
        kw["seq_sim_search_table_comment_line_regex"] = str(
            raw["seq_sim_search_table_comment_line_regex"]
        )
    if "reference_go_regex" in raw:
        kw["reference_go_regex"] = str(raw["reference_go_regex"])
    return AhrdConfig(**kw)
