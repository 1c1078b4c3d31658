"""Live-backend smoke for the embedding provider (VERDICT round-3 item 4).

Runs ``embed_stage`` + a ``Similarity`` query end-to-end with the REAL
``openai.AsyncOpenAI`` client — the wiring the unit tests exercise only
through a fake client. Skips (exit 0, message) unless both the
``openai`` package and ``OPENAI_API_KEY`` are present, so it is safe in
CI and in this container.

Usage:
    OPENAI_API_KEY=sk-... python tools/live_embedding_smoke.py [model]

What it checks:
- the deferred-import client factory constructs the real client;
- texts fan out through the asyncio.gather/semaphore path inside a real
  mapInPandas partition; each unique text is embedded once;
- the produced column is array<float> of a consistent dimension;
- Similarity with the same backend as query-side embedder ranks the
  semantically-matching document first (cosine sanity, not a model
  quality test).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if not os.environ.get("OPENAI_API_KEY"):
        print("SKIP: OPENAI_API_KEY not set")
        return 0
    try:
        import openai  # noqa: F401
    except ImportError:
        print("SKIP: openai package not installed (pip install openai)")
        return 0

    from pyspark.sql import functions as F

    from bigdata_cookbook_spark.llm.embedding_backend import (
        embed_stage,
        make_openai_embedding_backend,
    )
    from bigdata_cookbook_spark.query.algebra import Similarity
    from bigdata_cookbook_spark.session import get_spark

    model = sys.argv[1] if len(sys.argv) > 1 else "text-embedding-3-small"
    spark = get_spark("live_embedding_smoke", shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")

    rows = [
        (0, "the central bank raised interest rates to fight inflation"),
        (1, "the recipe calls for two cups of flour and an egg"),
        (2, "quarterly revenue grew on strong cloud demand"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    backend = make_openai_embedding_backend(model=model, concurrency=4, batch_rows=2)

    out = embed_stage(df, backend, n_partitions=2)
    got = {r.doc_id: r.embedding for r in out.collect()}
    dims = {len(v) for v in got.values()}
    assert len(got) == 3 and len(dims) == 1, f"rows={len(got)} dims={dims}"
    dim = dims.pop()

    sim = Similarity(
        "monetary policy and rate hikes",
        dim=dim,
        embedder=lambda t, d: backend([t])[0],
    )
    ranked = (
        out.withColumn("score", sim.score_column())
        .orderBy(F.desc("score"))
        .select("doc_id", "score")
        .collect()
    )
    assert ranked[0].doc_id == 0, f"expected doc 0 top, got {ranked}"
    print(f"OK: 3 docs embedded at dim={dim} via {model}; top match doc_id=0")
    for r in ranked:
        print(f"  doc {r.doc_id}: cosine {r.score:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
