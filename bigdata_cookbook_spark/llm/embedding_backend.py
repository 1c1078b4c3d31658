"""Embedding provider for the Similarity tier (SURVEY.md §2.2 Q1).

The reference's embedding model lives server-side — its API embeds the
query sentence and the corpus invisibly to the notebook
(Election_Monitor/src/query_builder.py:59-82). This engine's declared
semantics are cosine over a PRECOMPUTED ``embedding`` column plus a
deterministic hashing-trick stub for the query side — fully testable
with no model. What was missing for a user migrating a notebook was an
in-repo way to PRODUCE that column: this module is that hook, gated
exactly like the chat backend (llm/openai_backend.py) — the real client
is injected / deferred-imported, correctness never depends on it, and
the deterministic stub remains the test tier.

Two backends, one stage:
- ``make_hash_embedding_backend`` — the engine's seeded hashing-trick
  embedding (sources/fixtures._embedding) as a batch callable:
  deterministic, engine-portable, zero dependencies. The test tier.
- ``make_openai_embedding_backend`` — OpenAI-compatible ``/embeddings``
  over an injected async client: micro-batches fan out through one
  asyncio.gather under a semaphore, exponential-backoff retries per
  micro-batch. The live tier (tools/live_embedding_smoke.py).
- ``embed_stage`` — dedup-on-text -> mapInPandas -> join-back (the
  llm/stage.py combinator shape): each unique text is embedded ONCE
  regardless of how many rows carry it, the backend sees Arrow-batch
  sized text lists, and the output column is ``array<float>`` — the
  exact type the Similarity/ANN/near-dup tiers consume.
"""

from __future__ import annotations

import asyncio
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

EmbeddingBackend = Callable[[list[str]], list[list[float]]]


def make_hash_embedding_backend(dim: int = 16) -> EmbeddingBackend:
    """Deterministic stub tier: the hashing-trick embedding the fixture
    corpus and the Similarity query side already use, batched."""
    from bigdata_cookbook_spark.sources.fixtures import _embedding

    def backend(texts: list[str]) -> list[list[float]]:
        return [_embedding(t or "", dim) for t in texts]

    return backend


def _default_client_factory():
    import openai  # deferred: not a pinned dependency of this engine

    return openai.AsyncOpenAI()


def make_openai_embedding_backend(
    client_factory: Callable = _default_client_factory,
    model: str = "text-embedding-3-small",
    concurrency: int = 64,
    max_retries: int = 4,
    backoff_base: float = 2.0,
    sleep=asyncio.sleep,
    batch_rows: int = 128,
) -> EmbeddingBackend:
    """Live tier: texts -> vectors via an OpenAI-compatible /embeddings
    endpoint. Same envelope as the chat backend: the client is injected
    (unit-testable with a fake; ``openai.AsyncOpenAI`` plugs in
    unchanged), micro-batches of ``batch_rows`` texts all fan out through
    one asyncio.gather under the semaphore, retries back off 2^n s per
    micro-batch. Order-preserving: vector i belongs to text i."""

    def backend(texts: list[str]) -> list[list[float]]:
        chunks = [texts[i : i + batch_rows] for i in range(0, len(texts), batch_rows)]

        async def run() -> list[list[float]]:
            client = client_factory()
            sem = asyncio.Semaphore(concurrency)

            async def embed_chunk(chunk: list[str]) -> list[list[float]]:
                async with sem:
                    for attempt in range(max_retries + 1):
                        try:
                            resp = await client.embeddings.create(
                                model=model, input=chunk
                            )
                            # API contract: data[i].embedding pairs with
                            # input[i]; index field double-checks
                            out = [None] * len(chunk)
                            for d in resp.data:
                                out[d.index] = list(d.embedding)
                            return out
                        except Exception:  # noqa: BLE001 — provider errors are opaque
                            if attempt == max_retries:
                                raise
                            await sleep(backoff_base**attempt)
                return []  # unreachable

            parts = await asyncio.gather(*(embed_chunk(c) for c in chunks))
            return [v for part in parts for v in part]

        return asyncio.run(run())

    return backend


def embed_stage(
    df: DataFrame,
    backend: EmbeddingBackend,
    text_col: str = "text",
    out_col: str = "embedding",
    n_partitions: int | None = None,
) -> DataFrame:
    """Attach ``out_col: array<float>`` to every row, embedding each
    UNIQUE ``text_col`` value once (the dedup -> mapInPandas -> join-back
    combinator of llm/stage.py — the common-subexpression elimination
    Catalyst can't do across a Python boundary). Partition count is the
    cluster-level concurrency knob; the async backend's semaphore
    multiplies it within each partition."""
    unique = df.select(text_col).dropDuplicates([text_col])
    if n_partitions:
        unique = unique.repartition(n_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            texts = ["" if t is None else str(t) for t in pdf[text_col]]
            vecs = backend(texts)
            yield pd.DataFrame({text_col: pdf[text_col], out_col: vecs})

    embedded = unique.mapInPandas(run, schema=f"{text_col} string, {out_col} array<float>")
    return df.join(embedded, on=text_col, how="left")
