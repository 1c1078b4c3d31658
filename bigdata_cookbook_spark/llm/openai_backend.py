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
):
    """Build a ``Backend`` (rows -> labeled rows) running one async
    completion per micro-batch with semaphore + retry/backoff."""

    def backend(rows: list[dict]) -> list[dict]:
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

            prompt = "\n".join(
                f'{r["id"]};{r["entity_id"]};"{r["text"]}"' for r in rows
            )
            raw = await call_with_retry(prompt)
            parsed = parse_label_response(raw)
            out = []
            for r in rows:
                lab = parsed.get(str(r["id"]), {})
                out.append(
                    {
                        "id": r["id"],
                        "label": lab.get("label", "U"),
                        "motivation": lab.get("motivation", ""),
                    }
                )
            return out

        return asyncio.run(run())

    return backend
