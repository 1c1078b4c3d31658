"""Generate driver-shaped synthetic testdata at arbitrary SF for scale
rehearsals (the driver only ships sf0.001/0.01/0.1; the round-4 scaling
curve needs sf1 = 10x the bench tier).

Usage: python tools/gen_scale_data.py <sf> [out_dir]
       python tools/gen_scale_data.py 1.0          # -> .scale/sf1

Mirrors the DRIVER data's measured statistics (tools-side probes,
2026-08-14: row-count scaling per table, physical parquet types — naive
micros timestamps, BIGINT keys, FLOAT[] embeddings — value ranges,
categorical distributions, FK integrity, and the planted duplicate
structure of documents: ~0.16% exact dups, ~4.7% near-dup clones
sharing a long prefix) so every operator family does ~proportional work
at the higher SF. It is NOT the driver's generator and sf<=0.1 outputs
won't be bit-identical to the committed testdata — correctness stays
pinned by the driver's own tiers; this data exists to measure how the
plans SCALE.

All tables are derived from one seeded numpy Generator per (table, sf):
deterministic, order-stable, no Spark session needed. ~6M lineitem rows
(sf1) generate in seconds and write a single parquet file per table,
matching the driver's one-file-per-table layout.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
P_ADJS = ["large", "hot", "blue", "old", "cold", "small", "red", "new"]
P_NOUNS = ["ring", "bolt", "plate", "screw", "gear", "cap", "disk", "rod"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

DAY_US = 86_400_000_000


def _rng(table: str, sf: float) -> np.random.Generator:
    # round 11 fix: the seed used to be abs(hash((table, sf, 42))) —
    # Python's str hashing is salted per process (PYTHONHASHSEED), so
    # the "deterministic" generator silently produced a DIFFERENT
    # universe every run; cross-session capstone/scaling comparisons
    # were same-distribution but not same-bytes (discovered when a
    # regenerated sf10's stage drop counts drifted ~0.1%). md5 is
    # process-stable, so regeneration is now byte-reproducible.
    import hashlib

    key = f"{table}|{round(sf, 6)}|42".encode()
    seed = int.from_bytes(hashlib.md5(key).digest()[:8], "little") % (1 << 63)
    return np.random.default_rng(seed)


def _ts_us(base: str, us: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base, "us").astype("int64")
    return pa.array(base_us + us, type=pa.timestamp("us"))


def gen_region_nation(out: str) -> None:
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    pq.write_table(
        pa.table({"r_regionkey": pa.array(range(5), pa.int64()), "r_name": regions}),
        f"{out}/region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int64()),
                "n_name": [f"NATION_{i}" for i in range(25)],
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
        f"{out}/nation.parquet",
    )


def gen_customer(out: str, sf: float) -> int:
    n = int(150_000 * sf)
    r = _rng("customer", sf)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n), pa.int64()),
                "c_name": [f"Customer#{i:09d}" for i in range(n)],
                "c_nationkey": pa.array(r.integers(0, 25, n), pa.int32()),
                "c_acctbal": np.round(r.uniform(-1000, 10_000, n), 2),
                "c_mktsegment": pa.array(np.array(SEGMENTS)[r.integers(0, 5, n)]),
            }
        ),
        f"{out}/customer.parquet",
    )
    return n


def gen_supplier(out: str, sf: float) -> int:
    n = int(10_000 * sf)
    r = _rng("supplier", sf)
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n), pa.int64()),
                "s_name": [f"Supplier#{i:09d}" for i in range(n)],
                "s_nationkey": pa.array(r.integers(0, 25, n), pa.int32()),
                "s_acctbal": np.round(r.uniform(-1000, 10_000, n), 2),
            }
        ),
        f"{out}/supplier.parquet",
    )
    return n


def gen_part(out: str, sf: float) -> int:
    n = int(200_000 * sf)
    r = _rng("part", sf)
    adjs = np.array(P_ADJS)[r.integers(0, len(P_ADJS), n)]
    nouns = np.array(P_NOUNS)[r.integers(0, len(P_NOUNS), n)]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n), pa.int64()),
                "p_name": [f"{a} {b}" for a, b in zip(adjs, nouns)],
                "p_brand": [f"Brand#{i}" for i in r.integers(1, 26, n)],
                "p_type": pa.array(np.array(P_TYPES)[r.integers(0, 6, n)]),
                "p_size": pa.array(r.integers(1, 51, n), pa.int32()),
                "p_retailprice": np.round(900.0 + (np.arange(n) % 1000) * 0.1, 1),
            }
        ),
        f"{out}/part.parquet",
    )
    return n


def gen_orders(out: str, sf: float, n_cust: int) -> np.ndarray:
    n = int(1_500_000 * sf)
    r = _rng("orders", sf)
    # day-granular dates over the measured 1995-01-01..2001-08-01 span
    order_day = r.integers(0, 2405, n)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n), pa.int64()),
                "o_custkey": pa.array(r.integers(0, n_cust, n), pa.int64()),
                "o_orderstatus": pa.array(np.array(["O", "P", "F"])[r.integers(0, 3, n)]),
                "o_totalprice": np.round(r.uniform(1000, 500_000, n), 2),
                "o_orderdate": _ts_us("1995-01-01", order_day * DAY_US),
                "o_orderpriority": pa.array(np.array(PRIORITIES)[r.integers(0, 5, n)]),
            }
        ),
        f"{out}/orders.parquet",
    )
    return order_day


def gen_lineitem(out: str, sf: float, order_day: np.ndarray, n_part: int, n_supp: int) -> int:
    n_orders = len(order_day)
    r = _rng("lineitem", sf)
    # 1..7 lines per order, mean ~4.07 (measured 4.075)
    lines_per = r.integers(1, 8, n_orders)
    n = int(lines_per.sum())
    okeys = np.repeat(np.arange(n_orders), lines_per)
    linenum = np.concatenate([np.arange(1, k + 1) for k in lines_per]) if n else np.array([], dtype=np.int64)
    qty = r.integers(1, 51, n).astype(np.float64)
    price_per_unit = r.uniform(900, 2100, n)
    # mostly ship within ~95 days of the order; a tail of fully random
    # dates reproduces the measured negative/huge deltas
    delta = r.integers(1, 96, n)
    wild = r.random(n) < 0.05
    ship_day = np.where(wild, r.integers(0, 2500, n), order_day[okeys] + delta)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_partkey": pa.array(r.integers(0, n_part, n), pa.int64()),
                "l_suppkey": pa.array(r.integers(0, n_supp, n), pa.int64()),
                "l_linenumber": pa.array(linenum, pa.int32()),
                "l_quantity": qty,
                "l_extendedprice": np.round(qty * price_per_unit, 2),
                "l_discount": np.round(r.integers(0, 11, n) * 0.01, 2),
                "l_tax": np.round(r.integers(0, 9, n) * 0.01, 2),
                "l_returnflag": pa.array(np.array(["A", "N", "R"])[r.integers(0, 3, n)]),
                "l_linestatus": pa.array(np.array(["F", "O"])[r.integers(0, 2, n)]),
                "l_shipdate": _ts_us("1995-01-01", ship_day * DAY_US),
            }
        ),
        f"{out}/lineitem.parquet",
    )
    return n


def gen_events(out: str, sf: float) -> int:
    n = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    r = _rng("events", sf)
    # 30 days of Jan 2024, micros granularity (naive TIMESTAMP — the
    # round-3+ driver physical type the loader normalizes)
    ts = r.integers(0, 30 * DAY_US, n)
    ts.sort()
    value = np.round(np.minimum(r.exponential(50.0, n), 560.0), 2)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n), pa.int64()),
                "ts": _ts_us("2024-01-01", ts),
                "user_id": pa.array(r.integers(0, n_users, n), pa.int64()),
                "event_type": pa.array(np.array(EVENT_TYPES)[r.integers(0, 5, n)]),
                "value": value,
                "props": [json.dumps({"k": int(k)}) for k in r.integers(0, 100, n)],
            }
        ),
        f"{out}/events.parquet",
    )
    return n


def gen_documents(out: str, sf: float) -> int:
    n = int(50_000 * sf)
    r = _rng("documents", sf)
    vocab = np.array(VOCAB)
    lengths = r.integers(8, 105, n)
    texts: list[str] = []
    for i in range(n):
        texts.append(" ".join(vocab[r.integers(0, len(vocab), lengths[i])]))
    # planted structure measured on the driver data: ~0.16% exact dups,
    # ~4.7% near-dup clones (long shared prefix, few tokens mutated)
    n_exact = max(1, int(0.0016 * n))
    n_near = max(1, int(0.047 * n))
    clone_targets = r.choice(np.arange(1, n), size=n_exact + n_near, replace=False)
    for j, tgt in enumerate(clone_targets):
        src = int(r.integers(0, tgt))
        if j < n_exact:
            texts[tgt] = texts[src]
        else:
            toks = texts[src].split(" ")
            n_mut = max(1, len(toks) // 12)
            for _ in range(n_mut):
                toks[int(r.integers(len(toks) // 2, len(toks)))] = str(
                    vocab[int(r.integers(0, len(vocab)))]
                )
            texts[tgt] = " ".join(toks)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": texts,
                "lang": pa.array(np.array(LANGS)[r.choice(5, n, p=LANG_P)]),
                "source": [f"src{i % 20}" for i in range(n)],
                "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
            }
        ),
        f"{out}/documents.parquet",
    )
    return n


def gen_embeddings(out: str, sf: float) -> int:
    # the driver grows this table ~4x per 10x SF (500 @0.01, 2000 @0.1):
    # it feeds the O(n^2)-verify families, so growth is deliberately
    # sublinear. Extrapolate the same curve: 8000 @1.0.
    n = int(2000 * (sf / 0.1) ** 0.602)
    dim, n_labels = 64, 10
    r = _rng("embeddings", sf)
    centers = r.normal(0, 1, (n_labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = r.integers(0, n_labels, n)
    vecs = centers[labels] + r.normal(0, 0.55, (n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(
                    [v for v in vecs.astype(np.float32)], pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        f"{out}/embeddings.parquet",
    )
    return n


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    label = f"sf{sf:g}"
    default = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", label)
    out = sys.argv[2] if len(sys.argv) > 2 else default
    os.makedirs(out, exist_ok=True)
    gen_region_nation(out)
    n_cust = gen_customer(out, sf)
    n_supp = gen_supplier(out, sf)
    n_part = gen_part(out, sf)
    order_day = gen_orders(out, sf, n_cust)
    n_li = gen_lineitem(out, sf, order_day, n_part, n_supp)
    n_ev = gen_events(out, sf)
    n_docs = gen_documents(out, sf)
    n_emb = gen_embeddings(out, sf)
    print(
        json.dumps(
            {
                "out": out,
                "sf": sf,
                "rows": {
                    "customer": n_cust,
                    "supplier": n_supp,
                    "part": n_part,
                    "orders": len(order_day),
                    "lineitem": n_li,
                    "events": n_ev,
                    "documents": n_docs,
                    "embeddings": n_emb,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
