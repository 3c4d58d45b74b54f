"""SemDedup-style semantic deduplication over an embedding column.

Published method (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): cluster the
corpus embeddings, compare pairs ONLY within a cluster, and drop all
but one member of every semantic-duplicate group. The cluster step is
what makes the quadratic pair comparison tractable — at 100 TB the
number of clusters grows with the corpus so the per-cluster candidate
set stays bounded, and the all-pairs join never leaves a cluster.

Spark shape here:

* cluster assignment is :func:`..operators.similarity.ivf_assign_col`
  — a pure map-only argmin expression over a broadcast-literal
  codebook (no shuffle, no Python);
* the candidate join is an equi-join on ``cluster_id`` with an
  ``id <`` triangle predicate — a shuffled hash join keyed on the
  cluster, NEVER a cartesian (asserted in tests);
* the keep policy is deterministic: a row is dropped iff some
  LOWER-id row of the same cluster is within ``threshold`` cosine.
  (The paper keeps the member with the lowest centroid similarity;
  that is a one-line order-key swap — the id policy is chosen so the
  DuckDB oracle and any re-run select bit-identical survivors.)

Reference analogue: none (the reference repo is a set of per-document
single-machine extraction scripts — approach4_v2.py,
cv_doclayout_extractor.py — with no corpus-level dedup layer); this
operator is part of the LLM-training-data layer alongside
``operators/dedup.py`` / ``operators/similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _as_double, _dot, _norm, ivf_assign_col


def assign_clusters(df: DataFrame, centroids: list[list[float]],
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """(id, vec, cluster_id, nrm): map-only nearest-centroid assignment
    plus the L2 norm reused by every downstream cosine."""
    return df.select(
        F.col(id_col), F.col(vec_col),
        ivf_assign_col(centroids, F.col(vec_col)).alias("cluster_id"),
        _norm(_as_double(F.col(vec_col))).alias("nrm"),
    )


def semantic_duplicate_pairs(assigned: DataFrame,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold: float = 0.95) -> DataFrame:
    """(id_a, id_b, cluster_id) with id_a < id_b, same cluster, and
    cosine(a, b) >= threshold. Input must come from
    :func:`assign_clusters` (needs ``cluster_id`` + ``nrm``)."""
    l, r = assigned.alias("l"), assigned.alias("r")
    cos = _dot(_as_double(F.col(f"l.{vec_col}")),
               _as_double(F.col(f"r.{vec_col}"))) / (
        F.col("l.nrm") * F.col("r.nrm"))
    return (
        l.join(r, (F.col("l.cluster_id") == F.col("r.cluster_id"))
               & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
        .filter(cos >= threshold)
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
                F.col("l.cluster_id").alias("cluster_id"))
    )


def semdedup(df: DataFrame, centroids: list[list[float]],
             id_col: str = "vec_id", vec_col: str = "embedding",
             threshold: float = 0.95) -> DataFrame:
    """Survivors of semantic dedup: every row NOT within ``threshold``
    cosine of a lower-id row in its cluster. Returns
    (id, cluster_id) — the training-set keep list.

    One map-only assignment + one cluster-keyed self-join + one
    anti-join; the anti-join's right side is the dropped-id set
    (duplicates only — a small fraction of the corpus, broadcast-able
    at scale like the line-dedup dup set)."""
    assigned = assign_clusters(df, centroids, id_col, vec_col)
    dropped = (semantic_duplicate_pairs(assigned, id_col, vec_col,
                                        threshold)
               .select(F.col("id_b").alias(id_col)).distinct())
    return (assigned.join(dropped, id_col, "left_anti")
            .select(id_col, "cluster_id"))


def fixed_codebook(df: DataFrame, n_clusters: int = 16,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic codebook: the ``n_clusters`` lowest-id vectors
    (same convention as ``similarity.ivf_fixed_topk`` — bit-stable
    across runs and partitionings; a trained KMeans codebook plugs into
    the same interface). One tiny bounded collect (the "model" load)."""
    rows = (df.filter(F.col(id_col) < n_clusters)
            .select(id_col, vec_col).orderBy(id_col).collect())
    return [[float(x) for x in r[vec_col]] for r in rows]
