"""IVF (inverted-file) approximate nearest neighbor search.

The third ANN tier next to hyperplane LSH (__spark_entry__
ann_lsh_buckets) and BRP-LSH (ml/lsh.py): a KMeans coarse quantizer
partitions the corpus into nlist cells; a query probes only the nprobe
nearest cells and runs exact cosine inside them — scanning ~nprobe/nlist
of the corpus.

Scale design: the centroid table is tiny (nlist x dim — KBs) and lives
driver-side / broadcast; cell assignments are a column on the corpus, so
probing is a partition-prunable equi-filter. On 100 TB the corpus would
be written bucketed/partitioned BY cell id, making the probe a physical
partition prune rather than a filter scan. Exact re-ranking inside cells
reuses the JVM-side cosine expression.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_ivf(
    emb: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 123,
):
    """Fit the coarse quantizer. Returns (assignments, centroids):
    assignments = corpus + ``cell`` column; centroids = list of python
    float lists (driver-side, tiny)."""
    vecs = emb.select(
        F.col(id_col),
        F.col(emb_col).cast("array<double>").alias("__arr"),
    ).withColumn("__vec", array_to_vector("__arr"))
    model = KMeans(k=nlist, seed=seed, featuresCol="__vec", predictionCol="cell").fit(
        vecs
    )
    assignments = model.transform(vecs).select(
        id_col, F.col("__arr").alias(emb_col), "cell"
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assignments, centroids


def ivf_topk(
    assignments: DataFrame,
    centroids: list[list[float]],
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors of ``query_vec_id`` probing only the nprobe
    nearest cells. Returns (vec_id, cosine_sim) ordered desc."""
    import numpy as np

    qrow = assignments.filter(F.col(id_col) == query_vec_id).head()
    if qrow is None:
        raise ValueError(f"query vector {query_vec_id} not found")
    q = np.array(qrow[emb_col], dtype=np.float64)
    cents = np.array(centroids, dtype=np.float64)
    dists = np.linalg.norm(cents - q, axis=1)
    probe_cells = [int(c) for c in np.argsort(dists)[:nprobe]]

    qlit = F.array(*[F.lit(float(v)) for v in q])
    e = F.col(emb_col).cast("array<double>")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    qnorm = float(np.linalg.norm(q)) or 1.0
    cos = dot(e, qlit) / (F.sqrt(dot(e, e)) * F.lit(qnorm))

    return (
        assignments.filter(F.col("cell").isin(probe_cells))  # the IVF prune
        .filter(F.col(id_col) != query_vec_id)
        .select(id_col, F.round(cos, 4).alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ivf_sq_topk(
    assignments: DataFrame,
    centroids: list[list[float]],
    scales: list[float],
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 4,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    code_col: str = "code",
) -> DataFrame:
    """IVF-SQ: the FAISS-style three-stage funnel on DataFrames.

    1. cell prune — probe only the nprobe nearest KMeans cells (IVF);
    2. coarse score the survivors on int8 codes (ml/quantize.py SQ; the
       float column is never read, so at scale the scan touches only the
       narrow code column chunks of the probed cells);
    3. exact rerank of the k*rerank_factor best on full-precision floats.

    ``assignments`` must carry both the ``cell`` column (build_ivf) and
    the ``code`` column (quantize.quantize). Output (vec_id, score) with
    EXACT cosine scores — approximation affects candidate choice only.
    """
    import numpy as np

    from bigdata_cookbook_spark.ml.quantize import quantized_topk

    qrow = assignments.filter(F.col(id_col) == query_vec_id).head()
    if qrow is None:
        raise ValueError(f"query vector {query_vec_id} not found")
    q = [float(v) for v in qrow[emb_col]]
    cents = np.array(centroids, dtype=np.float64)
    dists = np.linalg.norm(cents - np.array(q), axis=1)
    probe_cells = [int(c) for c in np.argsort(dists)[:nprobe]]

    probed = assignments.filter(F.col("cell").isin(probe_cells)).filter(
        F.col(id_col) != query_vec_id
    )
    return quantized_topk(
        probed,
        q,
        scales,
        k=k,
        rerank_factor=rerank_factor,
        id_col=id_col,
        emb_col=emb_col,
        code_col=code_col,
    )
