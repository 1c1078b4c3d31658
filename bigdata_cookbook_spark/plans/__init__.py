from bigdata_cookbook_spark.plans.checkpoint import stage_checkpoint
from bigdata_cookbook_spark.plans.explain import explain_str

__all__ = ["stage_checkpoint", "explain_str"]
