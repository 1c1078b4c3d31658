"""Async chat-completion backend for the label stage (SURVEY.md §2.9 L1/L2).

Reference envelope (BASELINE.md §A): 200-1000 concurrent requests via an
asyncio semaphore, 3-5 retries with exponential backoff 2^n s,
temperature 0, JSON output, prompt micro-batches of 10-50 sentences
(AI_Cost_Cutting_Market_Analysis/src/labeling.py:62-138,
Tracking_Inflation_Drivers/src/labels.py:74-160).

This module is import-gated: the engine's correctness never depends on a
live model (tests use llm/stub.py). Inside a Spark job the backend runs
WITHIN each mapInPandas partition, so total concurrency =
partitions x semaphore — partition count is the cluster-level knob
(SURVEY §4), the semaphore the per-worker one.

The client is injected (``client_factory``) rather than imported at
module top, so the retry/backoff/semaphore machinery is unit-testable
with a fake and the real ``openai.AsyncOpenAI`` plugs in unchanged.
"""

from __future__ import annotations

import asyncio
import json
from collections.abc import Callable

from bigdata_cookbook_spark.llm.parsing import parse_label_response

SYSTEM_PROMPT = (
    "You label sentences about companies. For each input line "
    '"id;entity;text" return JSON {"<id>": {"label": "<one of P/A/N/U>", '
    '"motivation": "<short reason citing Target Company>"}}.'
)


def _default_client_factory():
    import openai  # deferred: not a pinned dependency of this engine

    return openai.AsyncOpenAI()


def make_async_backend(
    client_factory: Callable = _default_client_factory,
    model: str = "gpt-4o-mini",
    concurrency: int = 200,
    max_retries: int = 4,
    backoff_base: float = 2.0,
    sleep=asyncio.sleep,
    prompt_rows: int = 10,
):
    """Build a ``Backend`` (rows -> labeled rows): the rows are split into
    prompt micro-batches of ``prompt_rows`` sentences and ALL micro-batches
    fan out through one ``asyncio.gather`` under the semaphore — so a
    single backend call drives up to ``concurrency`` in-flight requests,
    and total in-flight across the cluster = partitions x concurrency.
    Pass the stage a large chunk (``llm_label_stage(batch_size=None)``
    hands over whole Arrow batches) to give the gather something to fan
    out; retry/backoff is per micro-batch."""

    def backend(rows: list[dict]) -> list[dict]:
        chunks = [rows[i : i + prompt_rows] for i in range(0, len(rows), prompt_rows)]

        async def run() -> list[dict]:
            client = client_factory()
            sem = asyncio.Semaphore(concurrency)

            async def call_once(prompt: str) -> str:
                resp = await client.chat.completions.create(
                    model=model,
                    temperature=0,
                    response_format={"type": "json_object"},
                    messages=[
                        {"role": "system", "content": SYSTEM_PROMPT},
                        {"role": "user", "content": prompt},
                    ],
                )
                return resp.choices[0].message.content

            async def call_with_retry(prompt: str) -> str:
                async with sem:
                    for attempt in range(max_retries + 1):
                        try:
                            return await call_once(prompt)
                        except Exception:  # noqa: BLE001 — provider errors are opaque
                            if attempt == max_retries:
                                raise
                            await sleep(backoff_base**attempt)
                return ""  # unreachable

            async def label_chunk(chunk: list[dict]) -> list[dict]:
                prompt = "\n".join(
                    f'{r["id"]};{r["entity_id"]};"{r["text"]}"' for r in chunk
                )
                parsed = parse_label_response(await call_with_retry(prompt))
                return [
                    {
                        "id": r["id"],
                        "label": parsed.get(str(r["id"]), {}).get("label", "U"),
                        "motivation": parsed.get(str(r["id"]), {}).get("motivation", ""),
                    }
                    for r in chunk
                ]

            parts = await asyncio.gather(*(label_chunk(c) for c in chunks))
            return [r for part in parts for r in part]

        return asyncio.run(run())

    return backend
