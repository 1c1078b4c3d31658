"""int8 scalar quantization: roundtrip distortion and two-stage recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_cookbook_spark.ml.quantize import fit_scales, quantize, quantized_topk
from bigdata_cookbook_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def scales(emb):
    return fit_scales(emb)


@pytest.fixture(scope="module")
def coded(emb, scales):
    return quantize(emb, scales)


def test_scales_cover_dim(emb, scales):
    dim = len(emb.select("embedding").first()["embedding"])
    assert len(scales) == dim
    assert all(s > 0 for s in scales)


def test_codes_in_int8_range_and_low_distortion(coded, scales):
    rows = coded.select("embedding", "code").limit(50).collect()
    s = np.asarray(scales)
    for r in rows:
        codes = np.asarray(r["code"], dtype=np.int32)
        assert codes.min() >= -127 and codes.max() <= 127
        orig = np.asarray(r["embedding"], dtype=np.float32)
        recon = codes * s
        denom = max(np.linalg.norm(orig), 1e-9)
        assert np.linalg.norm(recon - orig) / denom < 0.02  # <2% rel error


def _exact_topk(emb, qvec, k):
    q = np.asarray(qvec, dtype=np.float32)
    qn = q / np.linalg.norm(q)
    rows = emb.select("vec_id", "embedding").collect()
    scored = []
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float32)
        scored.append((float(v @ qn / max(np.linalg.norm(v), 1e-12)), r["vec_id"]))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [vid for _, vid in scored[:k]]


def test_recall_at_10_vs_exact(emb, coded, scales):
    qvec = emb.select("embedding").first()["embedding"]
    expected = set(_exact_topk(emb, qvec, 10))
    got = {
        r["vec_id"]
        for r in quantized_topk(coded, qvec, scales, k=10, rerank_factor=4).collect()
    }
    recall = len(got & expected) / 10
    assert recall >= 0.9, f"recall@10 {recall}"


def test_rerank_scores_are_exact(emb, coded, scales):
    """Stage-2 scores must equal full-precision cosine (coarse error
    affects candidate choice only, never reported scores)."""
    qvec = emb.select("embedding").first()["embedding"]
    out = quantized_topk(coded, qvec, scales, k=5, rerank_factor=4).collect()
    q = np.asarray(qvec, dtype=np.float32)
    qn = q / np.linalg.norm(q)
    by_id = {r["vec_id"]: r["score"] for r in out}
    rows = emb.filter(F.col("vec_id").isin(list(by_id))).collect()
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float32)
        exact = float(v @ qn / max(np.linalg.norm(v), 1e-12))
        assert abs(by_id[r["vec_id"]] - exact) < 1e-5


def test_ivf_sq_funnel_recall(spark, emb, scales, coded):
    """IVF cell prune + int8 coarse score + exact rerank: recall@10 vs
    exact brute force stays high while scanning only nprobe cells."""
    from bigdata_cookbook_spark.ml.ivf import build_ivf, ivf_sq_topk
    from bigdata_cookbook_spark.ml.quantize import quantize

    assignments, centroids = build_ivf(emb, nlist=8)
    # attach codes to the cell assignments (same rows, same scales)
    with_codes = quantize(
        assignments.select("vec_id", "embedding", "cell"), scales
    )
    out = ivf_sq_topk(
        with_codes, centroids, scales, query_vec_id=0, k=10,
        nprobe=4, rerank_factor=4,
    ).collect()
    got = {r["vec_id"] for r in out}
    qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    expected = set(_exact_topk(emb.filter(F.col("vec_id") != 0), qvec, 10))
    recall = len(got & expected) / 10
    # the IVF cell prune dominates recall loss on this unclustered
    # synthetic corpus (the plain-IVF test bounds it at >= 0.3 with the
    # same nlist/nprobe); int8 coarse scoring adds no measurable loss on
    # top (quantized_topk alone holds >= 0.9 recall)
    assert recall >= 0.6, f"IVF-SQ recall@10 {recall}"
    # scores of returned rows are exact cosine (rerank contract)
    import numpy as np
    q = np.asarray(qvec, dtype=np.float32)
    qn = q / np.linalg.norm(q)
    rows = {r["vec_id"]: r["score"] for r in out}
    for r in emb.filter(F.col("vec_id").isin(list(rows))).collect():
        v = np.asarray(r["embedding"], dtype=np.float32)
        exact = float(v @ qn / max(np.linalg.norm(v), 1e-12))
        assert abs(rows[r["vec_id"]] - exact) < 1e-5
