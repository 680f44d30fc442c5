from ahrd_spark.functions.text import (  # noqa: F401
    tokenize_expr,
    patternize_expr,
    blacklist_fails_expr,
    apply_filter_regexes,
    repair_double_expr,
    named_group_index,
    java_named_to_python,
)
from ahrd_spark.functions.format import (  # noqa: F401
    format_number_expr,
    quality_code_expr,
)
