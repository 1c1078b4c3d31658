"""bigdata_cookbook_spark — a PySpark-native analytics engine.

Re-founds the capabilities of the Bigdata-com/bigdata-cookbook reference
(financial text analytics: semantic search -> chunk/entity normalization ->
LLM labeling -> relational aggregation / time-series / graph analytics ->
report sinks) on Spark DataFrames/SQL, plus the LLM-training-data pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
needed at 100 TB scale.

Layers (SURVEY.md §7):
  1. sources/ + schemas  — corpus tables, fixtures, loaders
  2. query/              — predicate algebra compiling to Column expressions
  3. operators/          — relational analytics, dedup, similarity, normalize
  4. llm/                — dedup->mapInPandas->join-back combinators, stub backend
  5. functions/          — scalar/text/date/vector helpers
  6. streaming/          — Structured Streaming tier over the same operators
"""

from bigdata_cookbook_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
