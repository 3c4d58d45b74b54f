"""Similarity search over an embedding column (``array<float>``).

* :func:`cosine_topk` — brute-force cosine top-k, all JVM-side
  (``zip_with`` + ``aggregate`` fold for the dot product). The exact
  baseline; one full scan, no shuffle except the final top-k
  (``TakeOrderedAndProject``).
* :func:`ann_lsh_topk` — random-hyperplane LSH: deterministic
  hash-derived planes, sign-bit bucket, probe the query's bucket and all
  Hamming<=1 neighbors, exact re-rank inside the probed buckets. The
  scale path: at 10^12 rows the bucket column is a partition/cluster key
  so a query touches ~(planes+1)/2^planes of the data.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def _as_double(col):
    return F.transform(col, lambda v: v.cast("double"))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Deterministic ordering: (score desc, id asc). Scores rounded to 6
    decimals (both Spark and DuckDB fold the sum sequentially, but
    rounding removes any residual FP ambiguity from the comparison).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qnorm = math.sqrt(sum(float(v) * float(v) for v in query_vec))
    emb = _as_double(F.col(vec_col))
    score = _dot(emb, q) / (_norm(emb) * F.lit(qnorm))
    return (
        df.select(F.col(id_col), score.alias("cos_raw"))
        .orderBy(F.col("cos_raw").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            (F.floor(F.col("cos_raw") * 1e4) / 1e4).alias("cosine"),
        )
    )


def cosine_topk_join(df: DataFrame, query_df: DataFrame, k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k where the query vector is a (1-row) DataFrame.

    Fully declarative: the query row is broadcast and joined — no
    driver-side ``.first()`` job to fetch the vector (a lookup-table
    shape; at scale the query side is a dimension of size 1).
    """
    q = F.broadcast(query_df.select(_as_double(F.col(vec_col)).alias("_qe")))
    emb = _as_double(F.col(vec_col))
    score = _dot(emb, F.col("_qe")) / (_norm(emb) * _norm(F.col("_qe")))
    return (
        df.crossJoin(q)
        .select(F.col(id_col), score.alias("cos_raw"))
        .orderBy(F.col("cos_raw").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            (F.floor(F.col("cos_raw") * 1e4) / 1e4).alias("cosine"),
        )
    )


def _probe_masks(n_planes: int, hamming_probe: int) -> list[int]:
    """XOR masks enumerating all buckets within Hamming<=probe of the
    query bucket (deterministic, driver-side ints). probe>2 is not
    implemented — refuse rather than silently return probe-2 recall."""
    if hamming_probe > 2:
        raise ValueError(
            f"hamming_probe={hamming_probe} not supported (max 2); "
            "higher probes would silently degrade to 2")
    masks = [0]
    if hamming_probe >= 1:
        masks += [1 << p for p in range(n_planes)]
    if hamming_probe >= 2:
        masks += [
            (1 << p1) | (1 << p2)
            for p1 in range(n_planes) for p2 in range(p1 + 1, n_planes)
        ]
    return masks


def ann_lsh_topk_join(df: DataFrame, query_df: DataFrame, k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      n_planes: int = 12, hamming_probe: int = 1,
                      dim: int | None = None) -> DataFrame:
    """LSH top-k with the query as a DataFrame — zero driver-side jobs
    when ``dim`` is given (the hyperplane literals need the dimension;
    table embedding dims are fixed per corpus).

    The query row's bucket and its Hamming<=probe neighborhood are JVM
    expressions (bucket XOR literal masks, exploded), joined to the
    bucketed data; exact cosine re-rank inside. At 10^12 rows the bucket
    column is a partition key, so the probe join prunes the scan to
    ~|masks|/2^planes of the data.
    """
    if dim is None:
        dim = query_df.select(F.size(vec_col)).first()[0]
    masks = _probe_masks(n_planes, hamming_probe)
    qb = lsh_bucket_col(F.col(vec_col), dim, n_planes)
    probes = F.broadcast(
        query_df.select(
            _as_double(F.col(vec_col)).alias("_qe"), qb.alias("_qb"))
        .select(
            "_qe",
            F.explode(F.array(*[
                F.col("_qb").bitwiseXOR(F.lit(m)) for m in masks
            ])).alias("bucket"),
        )
    )
    bucketed = df.withColumn(
        "bucket", lsh_bucket_col(F.col(vec_col), dim, n_planes)
    )
    emb = _as_double(F.col(vec_col))
    score = _dot(emb, F.col("_qe")) / (_norm(emb) * _norm(F.col("_qe")))
    return (
        bucketed.join(probes, "bucket")
        .select(F.col(id_col), score.alias("cos_raw"))
        .orderBy(F.col("cos_raw").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            (F.floor(F.col("cos_raw") * 1e4) / 1e4).alias("cosine"),
        )
    )


def _planes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 — no RNG state."""
    planes = []
    for p in range(n_planes):
        comps = []
        for d in range(dim):
            h = hashlib.md5(b"plane:%d:%d" % (p, d)).digest()
            comps.append(int.from_bytes(h[:8], "big") / 2**63 - 1.0)
        planes.append(comps)
    return planes


def lsh_bucket_col(vec_col, dim: int, n_planes: int = 12):
    """Sign-bit bucket id from ``n_planes`` deterministic hyperplanes."""
    emb = _as_double(vec_col)
    acc = F.lit(0).cast("long")
    for p, plane in enumerate(_planes(dim, n_planes)):
        lit_plane = F.array(*[F.lit(c) for c in plane])
        acc = acc + F.when(_dot(emb, lit_plane) > 0,
                           F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return acc


def ann_lsh_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_planes: int = 12, hamming_probe: int = 1) -> DataFrame:
    """Approximate top-k: probe the query bucket ± Hamming<=probe buckets,
    exact cosine re-rank inside."""
    if hamming_probe > 2:
        raise ValueError(
            f"hamming_probe={hamming_probe} not supported (max 2); "
            "higher probes would silently degrade to 2")
    dim = len(query_vec)
    planes = _planes(dim, n_planes)
    qbits = 0
    for p, plane in enumerate(planes):
        if sum(a * float(b) for a, b in zip(plane, query_vec)) > 0:
            qbits |= 1 << p
    probe = {qbits}
    if hamming_probe >= 1:
        probe.update(qbits ^ (1 << p) for p in range(n_planes))
    if hamming_probe >= 2:
        for p1 in range(n_planes):
            for p2 in range(p1 + 1, n_planes):
                probe.add(qbits ^ (1 << p1) ^ (1 << p2))
    bucketed = df.withColumn(
        "bucket", lsh_bucket_col(F.col(vec_col), dim, n_planes)
    )
    cand = bucketed.filter(F.col("bucket").isin(list(probe)))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_index(df: DataFrame, vec_col: str = "embedding",
              n_lists: int = 16, seed: int = 42):
    """IVF index: KMeans (pyspark.ml, fixed seed) partitions the vector
    space; every row gets its nearest-centroid ``list_id``.

    Returns (indexed_df, centroids). At 10^12 rows the output would be
    written partitioned/clustered by ``list_id`` so a probe reads only
    n_probe/n_lists of the data (partition pruning on the scan).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = df.withColumn("_v", array_to_vector(F.col(vec_col)))
    model = KMeans(k=n_lists, seed=seed, featuresCol="_v",
                   predictionCol="list_id").fit(vecs)
    indexed = model.transform(vecs).drop("_v")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return indexed, centroids


def ivf_topk(indexed: DataFrame, centroids: list[list[float]],
             query_vec: list[float], k: int = 10, n_probe: int = 4,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Probe the ``n_probe`` nearest inverted lists, exact cosine
    re-rank inside (driver picks the lists — centroid table is tiny)."""
    def sq_dist(c):
        return sum((a - float(b)) ** 2 for a, b in zip(c, query_vec))

    probe = sorted(range(len(centroids)),
                   key=lambda i: sq_dist(centroids[i]))[:n_probe]
    cand = indexed.filter(F.col("list_id").isin(probe))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_assign_col(centroids: list[list[float]], vec_col) -> F.Column:
    """Nearest-centroid list assignment as a pure (map-only) expression.

    argmin over ``|c|^2 - 2 v·c`` (the |v|^2 term is constant per row);
    ties break to the lowest list id via struct ordering. No shuffle —
    at 10^12 rows this is the quantizer of a partitioned IVF write.
    """
    emb = _as_double(vec_col)
    entries = []
    for i, c in enumerate(centroids):
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        cn2 = sum(float(x) * float(x) for x in c)
        entries.append(F.struct(
            (F.lit(cn2) - 2.0 * _dot(emb, lit_c)).alias("score"),
            F.lit(i).alias("list_id"),
        ))
    return F.array_min(F.array(*entries)).getField("list_id")


def ivf_fixed_topk(df: DataFrame, k: int = 10, n_lists: int = 16,
                   n_probe: int = 4, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   query_id: int = 0) -> DataFrame:
    """IVF top-k with a deterministic codebook: the ``n_lists``
    lowest-id vectors serve as centroids (a fixed quantizer — no KMeans
    training, so results are bit-stable across runs/partitionings; the
    KMeans variant lives in :func:`ivf_index`/:func:`ivf_topk`).

    The codebook collect is one tiny job (the centroid table is the
    IVF "model" — same shape as loading a trained quantizer); probe
    selection happens driver-side on that table, and the candidate scan
    is partition-prunable by ``list_id`` at scale.
    """
    cb_rows = (df.filter(F.col(id_col) < n_lists)
               .select(id_col, vec_col).orderBy(id_col).collect())
    centroids = [[float(x) for x in r[vec_col]] for r in cb_rows]
    qvec = centroids[query_id] if query_id < len(centroids) else None
    if qvec is None:
        raise ValueError("query_id must be one of the codebook ids here")

    def score(c):
        cn2 = sum(x * x for x in c)
        return cn2 - 2.0 * sum(a * b for a, b in zip(c, qvec))

    order = sorted(range(len(centroids)),
                   key=lambda i: (score(centroids[i]), i))
    probe = order[:n_probe]
    assigned = df.withColumn(
        "list_id", ivf_assign_col(centroids, F.col(vec_col)))
    cand = assigned.filter(F.col("list_id").isin(probe))
    return cosine_topk(cand, qvec, k, id_col, vec_col)


def embedding_near_duplicates(df: DataFrame, id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              threshold: float = 0.95,
                              n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH-bucket self-join → exact
    cosine verification inside buckets (no cross join; a pair must share
    its sign-bucket, which holds with probability ~(1-θ/π)^planes for
    near-identical vectors).

    Returns (id_a, id_b, cosine) with id_a < id_b, cosine >= threshold.
    """
    dim = df.select(F.size(vec_col)).first()[0]
    b = df.select(
        F.col(id_col), F.col(vec_col),
        lsh_bucket_col(F.col(vec_col), dim, n_planes).alias("bucket"),
        _norm(_as_double(F.col(vec_col))).alias("nrm"),
    )
    l, r = b.alias("l"), b.alias("r")
    cos = _dot(_as_double(F.col(f"l.{vec_col}")),
               _as_double(F.col(f"r.{vec_col}"))) / (
        F.col("l.nrm") * F.col("r.nrm"))
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cos.alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b",
                (F.floor(F.col("cos_raw") * 1e4) / 1e4).alias("cosine"))
    )
