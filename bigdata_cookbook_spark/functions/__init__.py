from bigdata_cookbook_spark.functions.text import (
    lang_id_expr,
    quality_exprs,
    shingles_expr,
    token_count_expr,
)

__all__ = ["lang_id_expr", "quality_exprs", "shingles_expr", "token_count_expr"]
