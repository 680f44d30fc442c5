from ahrd_spark.operators.scoring import (  # noqa: F401
    overlap_score_expr,
    with_overlap,
    protein_totals,
    token_cumulative,
    top_k_hits,
    token_scores,
    score_hits,
    select_winners,
)
from ahrd_spark.operators.go_transfer import transfer_go  # noqa: F401
from ahrd_spark.operators.interpro_filter import (  # noqa: F401
    interpro_closure,
    filter_most_informative,
)
