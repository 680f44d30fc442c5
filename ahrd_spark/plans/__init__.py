from ahrd_spark.plans.annotate import (  # noqa: F401
    load_candidate_hits,
    run_annotate,
)
