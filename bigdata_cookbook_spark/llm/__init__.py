from bigdata_cookbook_spark.llm.stage import llm_label_stage, pack_token_budget
from bigdata_cookbook_spark.llm.stub import stub_backend

__all__ = ["llm_label_stage", "pack_token_budget", "stub_backend"]
