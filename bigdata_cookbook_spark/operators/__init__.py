from bigdata_cookbook_spark.operators.analytics import (
    argmax_row_per_group,
    calendar_densify,
    gaussian_smooth,
    group_ffill,
    keep_first_dedup,
    mode_per_group,
    net_exposure,
    pivot_composite,
    topk_per_group,
    zscore_per_series,
)

__all__ = [
    "argmax_row_per_group",
    "calendar_densify",
    "gaussian_smooth",
    "group_ffill",
    "keep_first_dedup",
    "mode_per_group",
    "net_exposure",
    "pivot_composite",
    "topk_per_group",
    "zscore_per_series",
]
