from bigdata_cookbook_spark.ml.ivf import build_ivf, ivf_topk
from bigdata_cookbook_spark.ml.lsh import (
    embedding_ann_brp,
    minhash_neardup_ml,
    text_feature_pipeline,
)

__all__ = [
    "build_ivf",
    "embedding_ann_brp",
    "ivf_topk",
    "minhash_neardup_ml",
    "text_feature_pipeline",
]
