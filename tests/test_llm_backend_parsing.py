"""Tests: async backend machinery (fake client — no network) and F13/L10
response parsing/consolidation."""

from __future__ import annotations

import json

import pytest

from bigdata_cookbook_spark.llm.openai_backend import make_async_backend
from bigdata_cookbook_spark.llm.parsing import (
    consolidate_parts,
    parse_label_response,
    repair_json_fragment,
)


class FakeCompletions:
    def __init__(self, log, fail_times=0, response=None):
        self.log = log
        self.fail_times = fail_times
        self.response = response

    async def create(self, **kwargs):
        self.log.append(kwargs)
        if self.fail_times > 0:
            self.fail_times -= 1
            raise RuntimeError("rate limited")
        prompt = kwargs["messages"][-1]["content"]
        if self.response is not None:
            content = self.response
        else:
            ids = [line.split(";", 1)[0] for line in prompt.splitlines()]
            content = json.dumps(
                {i: {"label": "P", "motivation": f"Target Company does {i}"} for i in ids}
            )

        class Msg:  # minimal OpenAI response shape
            pass

        msg = Msg(); msg.content = content
        choice = Msg(); choice.message = msg
        resp = Msg(); resp.choices = [choice]
        return resp


class FakeClient:
    def __init__(self, log, **kw):
        self.chat = type("C", (), {})()
        self.chat.completions = FakeCompletions(log, **kw)


def test_backend_labels_all_rows():
    log = []
    backend = make_async_backend(client_factory=lambda: FakeClient(log))
    rows = [{"id": i, "entity_id": f"E{i}", "text": f"t{i}"} for i in range(7)]
    out = backend(rows)
    assert [r["id"] for r in out] == list(range(7))
    assert all(r["label"] == "P" for r in out)
    assert len(log) == 1  # one prompt per micro-batch
    assert log[0]["temperature"] == 0


def test_backend_retries_with_backoff():
    log = []
    sleeps = []

    async def fake_sleep(s):
        sleeps.append(s)

    backend = make_async_backend(
        client_factory=lambda: FakeClient(log, fail_times=3),
        max_retries=4,
        backoff_base=2.0,
        sleep=fake_sleep,
    )
    out = backend([{"id": 0, "entity_id": "E", "text": "t"}])
    assert out[0]["label"] == "P"
    assert len(log) == 4  # 3 failures + 1 success
    assert sleeps == [1.0, 2.0, 4.0]  # 2^0, 2^1, 2^2


def test_backend_exhausts_retries():
    log = []

    async def fake_sleep(s):
        pass

    backend = make_async_backend(
        client_factory=lambda: FakeClient(log, fail_times=10),
        max_retries=2,
        sleep=fake_sleep,
    )
    with pytest.raises(RuntimeError):
        backend([{"id": 0, "entity_id": "E", "text": "t"}])
    assert len(log) == 3


def test_backend_missing_ids_default_U():
    log = []
    backend = make_async_backend(
        client_factory=lambda: FakeClient(
            log, response='{"0": {"label": "A", "motivation": "m"}}'
        )
    )
    out = backend([
        {"id": 0, "entity_id": "E0", "text": "a"},
        {"id": 1, "entity_id": "E1", "text": "b"},
    ])
    assert out[0]["label"] == "A"
    assert out[1]["label"] == "U" and out[1]["motivation"] == ""


def test_repair_json_fragment():
    assert json.loads(repair_json_fragment('{"a": {"x": 1}}')) == {"a": {"x": 1}}
    # truncated mid-value: trims to last complete entry
    fixed = repair_json_fragment('{"a": {"x": 1}, "b": {"x": 2')
    assert json.loads(fixed) == {"a": {"x": 1}}
    # leading prose before the object
    assert json.loads(repair_json_fragment('Sure! {"a": {"x": 1}}')) == {"a": {"x": 1}}
    assert repair_json_fragment("") == "{}"
    # braces inside strings don't confuse the scanner
    assert json.loads(repair_json_fragment('{"a": {"x": "}{"}}')) == {"a": {"x": "}{"}}


def test_parse_and_consolidate():
    p1 = '{"0": {"label": "P", "motivation": "m0"}, "1": {"label": "N", "motivation": "m1"}'
    p2 = '{"1": {"label": "A", "motivation": "m1b"}, "2": {"label": "U", "motivation": "m2"}}'
    # complete entries survive; only the unclosed outer brace is repaired
    assert parse_label_response(p1) == {
        "0": {"label": "P", "motivation": "m0"},
        "1": {"label": "N", "motivation": "m1"},
    }
    merged = consolidate_parts([p1, p2])
    assert set(merged) == {"0", "1", "2"}
    assert merged["1"]["label"] == "A"  # later part wins
    assert parse_label_response('{"x": 3}') == {}  # non-dict values dropped


def test_backend_fans_out_micro_batches_concurrently():
    """25 rows at prompt_rows=10 -> 3 prompts, issued through one
    asyncio.gather: the in-flight counter must overlap (>1), proving the
    semaphore actually multiplies — not the dead-machinery sequential
    path of round 1."""
    import asyncio

    log = []
    state = {"inflight": 0, "max_inflight": 0}

    class OverlapCompletions(FakeCompletions):
        async def create(self, **kwargs):
            state["inflight"] += 1
            state["max_inflight"] = max(state["max_inflight"], state["inflight"])
            await asyncio.sleep(0.01)  # force overlap to be observable
            try:
                return await super().create(**kwargs)
            finally:
                state["inflight"] -= 1

    class OverlapClient:
        def __init__(self):
            self.chat = type("C", (), {})()
            self.chat.completions = OverlapCompletions(log)

    backend = make_async_backend(client_factory=OverlapClient, prompt_rows=10)
    rows = [{"id": i, "entity_id": f"E{i}", "text": f"t{i}"} for i in range(25)]
    out = backend(rows)
    assert [r["id"] for r in out] == list(range(25))
    assert all(r["label"] == "P" for r in out)
    assert len(log) == 3
    assert state["max_inflight"] == 3


def test_backend_concurrency_capped_by_semaphore():
    import asyncio

    log = []
    state = {"inflight": 0, "max_inflight": 0}

    class OverlapCompletions(FakeCompletions):
        async def create(self, **kwargs):
            state["inflight"] += 1
            state["max_inflight"] = max(state["max_inflight"], state["inflight"])
            await asyncio.sleep(0.01)
            try:
                return await super().create(**kwargs)
            finally:
                state["inflight"] -= 1

    class OverlapClient:
        def __init__(self):
            self.chat = type("C", (), {})()
            self.chat.completions = OverlapCompletions(log)

    backend = make_async_backend(
        client_factory=OverlapClient, prompt_rows=1, concurrency=2
    )
    out = backend([{"id": i, "entity_id": "E", "text": "t"} for i in range(6)])
    assert len(out) == 6 and len(log) == 6
    assert state["max_inflight"] == 2  # semaphore is the ceiling


class _FakeEmbedData:
    def __init__(self, index, embedding):
        self.index = index
        self.embedding = embedding


class _FakeEmbedResp:
    def __init__(self, data):
        self.data = data


def _fake_embed_client(fail_times=0, dim=4, calls=None):
    """OpenAI-shaped fake: embeddings.create returns per-input vectors
    derived from text length (deterministic), failing the first
    ``fail_times`` calls to exercise the retry path."""
    state = {"n": 0}

    class _Embeddings:
        async def create(self, model, input):
            state["n"] += 1
            if calls is not None:
                calls.append(list(input))
            if state["n"] <= fail_times:
                raise RuntimeError("transient provider error")
            return _FakeEmbedResp(
                [
                    # reversed index order: the backend must reorder by
                    # the index field, not trust list position
                    _FakeEmbedData(i, [float(len(t))] * dim)
                    for i, t in reversed(list(enumerate(input)))
                ]
            )

    class _Client:
        embeddings = _Embeddings()

    return _Client()


def test_embedding_backend_orders_batches_and_retries():
    from bigdata_cookbook_spark.llm.embedding_backend import (
        make_openai_embedding_backend,
    )

    calls = []
    sleeps = []

    async def fake_sleep(s):
        sleeps.append(s)

    backend = make_openai_embedding_backend(
        client_factory=lambda: _fake_embed_client(fail_times=2, calls=calls),
        batch_rows=2,
        max_retries=3,
        sleep=fake_sleep,
    )
    texts = ["a", "bb", "ccc", "dddd", "eeeee"]
    vecs = backend(texts)
    # order-preserving across micro-batches AND within (index field)
    assert [v[0] for v in vecs] == [1.0, 2.0, 3.0, 4.0, 5.0]
    # 5 texts / batch_rows=2 -> 3 successful calls (+2 failed retries)
    assert len(calls) == 5
    # the instant fake sleep never yields, so the first chunk eats both
    # injected failures: backoff 2^0 then 2^1
    assert sleeps == [1.0, 2.0]


def test_embedding_backend_exhausted_retries_raise():
    from bigdata_cookbook_spark.llm.embedding_backend import (
        make_openai_embedding_backend,
    )

    async def fake_sleep(s):
        pass

    backend = make_openai_embedding_backend(
        client_factory=lambda: _fake_embed_client(fail_times=10),
        max_retries=2,
        sleep=fake_sleep,
    )
    with pytest.raises(RuntimeError, match="transient"):
        backend(["x"])


def test_embed_stage_unique_texts_and_similarity_plug(spark):
    """embed_stage embeds each unique text once (dedup -> join-back),
    emits array<float>, and the hash backend column matches the fixture
    _embedding exactly — so Similarity's default query-side stub pairs
    with it. A custom embedder changes scores; the default matches."""
    from bigdata_cookbook_spark.llm.embedding_backend import (
        embed_stage,
        make_hash_embedding_backend,
    )
    from bigdata_cookbook_spark.query.algebra import Similarity
    from bigdata_cookbook_spark.sources.fixtures import _embedding

    rows = [(i, t) for i, t in enumerate(["alpha beta", "gamma", "alpha beta", None])]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # executor-side call counting needs an accumulator (a closure list
    # would mutate only the serialized worker copy)
    n_embedded = spark.sparkContext.accumulator(0)
    inner = make_hash_embedding_backend(dim=16)

    def counting_backend(texts):
        n_embedded.add(len(texts))
        return inner(texts)

    out = embed_stage(df, counting_backend)
    got = {r.doc_id: r.embedding for r in out.collect()}
    assert len(got) == 4
    assert n_embedded.value == 3  # unique texts only (dedup -> join-back)
    want = _embedding("alpha beta", 16)
    assert got[0] == got[2]
    # array<float> storage is float32 — compare at that precision
    assert all(abs(a - b) < 1e-6 for a, b in zip(got[0], want))
    assert out.schema["embedding"].dataType.simpleString() == "array<float>"

    sim_default = Similarity("alpha beta", dim=16)
    scored = out.filter("doc_id = 0").select(sim_default.score_column().alias("s")).first()
    assert abs(scored.s - 1.0) < 1e-6  # same stub both sides -> cosine 1

    sim_custom = Similarity(
        "alpha beta", dim=16, embedder=lambda t, d: [1.0] * d
    )
    s2 = out.filter("doc_id = 0").select(sim_custom.score_column().alias("s")).first()
    assert abs(s2.s - scored.s) > 1e-9  # pluggable path actually used
