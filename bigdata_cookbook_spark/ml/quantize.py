"""Scalar (int8) quantization for embedding columns — the memory tier of
the ANN stack.

At 100 TB an embedding column dominates storage and shuffle width:
float32 x dim bytes per row. Symmetric per-dimension int8 quantization
cuts that 4x with ~1% cosine-score distortion, which the standard
two-stage retrieval absorbs: score ALL candidates on the int8 codes
(cheap, narrow), take an over-fetched top k*rerank_factor, then re-score
just those on the full-precision vectors. Recall vs exact brute force is
the test contract (tests/test_quantize.py).

Quantizer: per-dimension symmetric scale s_d = max|x_d| / 127, code =
round(x_d / s_d). Per-dimension (not per-vector) scales keep the
quantized dot product a valid inner-product approximation:
dot(x, y) ~ sum_d s_d^2 * cx_d * cy_d. Scales are a dim-length array —
KBs, driver-side, broadcast into the scoring stage.

All hot loops are NumPy over Arrow batches (mapInPandas), following the
blocked-GEMM precedent in operators/similarity.py — int8 stays int8 in
the matmul accumulators (np.int32) until the final rescale.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_scales(
    emb: DataFrame, emb_col: str = "embedding"
) -> list[float]:
    """Per-dimension symmetric scales s_d = max|x_d| / 127.

    One aggregation over the corpus: posexplode + groupBy(dim) keeps the
    shuffle at dim x n_partitions partial rows (map-side combined), never
    materializing the transposed matrix.
    """
    dims = emb.select(
        F.posexplode(F.col(emb_col)).alias("d", "x")
    ).groupBy("d").agg(F.max(F.abs(F.col("x"))).alias("mx"))
    rows = dims.orderBy("d").collect()
    return [max(float(r["mx"]), 1e-12) / 127.0 for r in rows]


def quantize(
    emb: DataFrame,
    scales: list[float],
    emb_col: str = "embedding",
    code_col: str = "code",
) -> DataFrame:
    """Add an int8 code column (array<tinyint>); keeps the float column.

    clip to [-127, 127] guards rows that exceed the fitted range (e.g.
    data drift after the scales were fit)."""
    s = np.asarray(scales, dtype=np.float32)

    def run(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            mat = np.stack(pdf[emb_col].to_numpy()).astype(np.float32)
            codes = np.clip(np.rint(mat / s), -127, 127).astype(np.int8)
            out = pdf.copy()
            out[code_col] = list(codes)
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in emb.schema.fields
    )
    return emb.mapInPandas(run, f"{schema}, {code_col} array<tinyint>")


def quantized_topk(
    quantized: DataFrame,
    query_vec: list[float],
    scales: list[float],
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    code_col: str = "code",
) -> DataFrame:
    """Two-stage cosine top-k: int8 coarse scoring -> exact rerank.

    Stage 1 scores every row on codes only (the float column is never
    read — at scale the two live in separate parquet column chunks and
    column pruning skips the wide one), over-fetching k*rerank_factor.
    Stage 2 re-scores the survivors on full precision. Output:
    (id, score) exact-cosine-scored, descending, id-tiebroken.
    """
    s = np.asarray(scales, dtype=np.float32)
    q = np.asarray(query_vec, dtype=np.float32)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    # fold the query and both scale factors into one float vector so the
    # per-row work on N rows is a single int8->float GEMV against it
    q_folded = (qn * s).astype(np.float32)

    def coarse(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            codes = np.stack(pdf[code_col].to_numpy()).astype(np.float32)
            # approx unnormalized dot: (codes * s) . qn == codes . q_folded
            dots = codes @ q_folded
            # approx row norms from codes for cosine normalization
            norms = np.sqrt(((codes * s) ** 2).sum(axis=1))
            score = dots / np.maximum(norms, 1e-12)
            yield pd.DataFrame({id_col: pdf[id_col], "qscore": score})

    cand = (
        quantized.select(id_col, code_col)
        .mapInPandas(coarse, f"{id_col} long, qscore float")
        .orderBy(F.col("qscore").desc(), F.col(id_col))
        .limit(k * rerank_factor)
    )
    exact = quantized.join(F.broadcast(cand), id_col).select(id_col, emb_col)

    def rerank(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[emb_col].to_numpy()).astype(np.float32)
            norms = np.linalg.norm(mat, axis=1)
            score = (mat @ qn) / np.maximum(norms, 1e-12)
            yield pd.DataFrame({id_col: pdf[id_col], "score": score})

    return (
        exact.mapInPandas(rerank, f"{id_col} long, score float")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
