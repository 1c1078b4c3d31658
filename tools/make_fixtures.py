"""Materialize the deterministic corpus fixtures to committed parquet.

The screening / LLM-workflow queries need their inputs visible to BOTH
engines (Spark query and DuckDB oracle) so the driver can value-check
them. fixture_frames() is deterministic (seeded), but the oracle side
cannot call Python — so we pin the generated corpus as single-file
parquet under <repo>/fixtures/ and read the same files from both sides.

Regenerate (idempotent, byte-stable) with:  python tools/make_fixtures.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_cookbook_spark.sources.fixtures import generate_corpus

ENTITY_PA = pa.schema(
    [
        ("entity_id", pa.string()),
        ("entity_type", pa.string()),
        ("name", pa.string()),
        ("ticker", pa.string()),
        ("sector", pa.string()),
        ("industry", pa.string()),
        ("country", pa.string()),
    ]
)

DOCUMENT_PA = pa.schema(
    [
        ("document_id", pa.string()),
        ("timestamp_utc", pa.timestamp("us")),
        ("document_type", pa.string()),
        ("headline", pa.string()),
        ("source_id", pa.string()),
        ("source_name", pa.string()),
        ("source_rank", pa.int32()),
        ("url", pa.string()),
        ("fiscal_year", pa.int32()),
        ("reporting_entities", pa.list_(pa.string())),
    ]
)

MENTION_PA = pa.struct([("key", pa.string()), ("start", pa.int32()), ("end", pa.int32())])

CHUNK_PA = pa.schema(
    [
        ("document_id", pa.string()),
        ("chunk_idx", pa.int32()),
        ("sentence_id", pa.string()),
        ("text", pa.string()),
        ("entities", pa.list_(MENTION_PA)),
        ("embedding", pa.list_(pa.float32())),
    ]
)


def write(rows: list[tuple], schema: pa.Schema, path: str) -> None:
    cols = list(zip(*rows))
    arrays = [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)]
    pq.write_table(pa.table(arrays, schema=schema), path)


def main(out_dir: str | None = None) -> None:
    out_dir = out_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
    )
    os.makedirs(out_dir, exist_ok=True)
    ents, docs, chunks = generate_corpus(n_docs=200, seed=7)
    # mention structs arrive as python tuples; pa needs dicts for structs
    chunks = [
        (d, ci, sid, txt, [{"key": k, "start": s, "end": e} for (k, s, e) in (ments or [])], emb)
        for (d, ci, sid, txt, ments, emb) in chunks
    ]
    write(ents, ENTITY_PA, os.path.join(out_dir, "entities.parquet"))
    write(docs, DOCUMENT_PA, os.path.join(out_dir, "documents.parquet"))
    write(chunks, CHUNK_PA, os.path.join(out_dir, "chunks.parquet"))
    print(f"wrote {out_dir}/{{entities,documents,chunks}}.parquet")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
