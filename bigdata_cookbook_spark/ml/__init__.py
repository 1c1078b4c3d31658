from bigdata_cookbook_spark.ml.lsh import (
    embedding_ann_brp,
    minhash_neardup_ml,
    text_feature_pipeline,
)

__all__ = ["embedding_ann_brp", "minhash_neardup_ml", "text_feature_pipeline"]
