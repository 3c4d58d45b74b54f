"""CCNet-style perplexity bucketing — LM-based quality partitioning.

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") scores every document with a language
model trained per language and splits the corpus into head / middle /
tail perplexity buckets; the head bucket is what most LLM pretraining
mixtures keep or up-weight. The reference has no analogue (single-shot
folder walks, no corpus statistics); this is the dataset-level
deterministic form: the "LM" is a unigram model derived from a corpus
(add the real KenLM scores as an external column and the bucketing
stage is unchanged).

Scale shapes (the whole module is built-in expressions — no UDF):

* :func:`unigram_model` — explode words, ``groupBy (group, word)``
  count (ONE shuffle, map-side combined: the hot stopword key
  pre-aggregates inside each task before the exchange), per-group
  totals re-aggregated from the vocab counts (vocab-sized input,
  group-count output → broadcast back). log-probability in the model
  table, not recomputed per document.
* :func:`surprisal_scores` — per-(doc, word) counts first (shuffle
  keyed by doc+word, so a hot WORD cannot skew it — every key carries
  the doc id), then a join against the model on (group, word).
  Broadcast the model when the vocabulary fits (the common case: vocab
  grows ~ heaps-law sublinearly in corpus size); at vocabularies past
  the broadcast limit pass ``broadcast_model=False`` for a shuffle
  join — left side is DISTINCT (doc, word) pairs, so the per-word fan
  equals document frequency; AQE skew-join splits the stopword keys.
  Final per-doc mean is one more doc-keyed shuffle.
* :func:`perplexity_buckets` — a pure CASE projection on fixed
  thresholds (CCNet derives thresholds from a held-out distribution;
  they arrive here as constants), so the bucket filter pushes down to
  whatever scan materialized the scores.

OOV policy: words absent from the model get ``oov_logp`` when given
(the smoothing floor), else a null score propagates to the document's
``mean_surprisal`` — strict mode, which a validity filter can catch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(docs: DataFrame, text_col: str,
           keep_cols: Sequence[str], sep: str = " ") -> DataFrame:
    """One row per token: split on the literal separator (the corpus
    text contract is single-spaced; pass the page through
    ``dedup.canonical_text_col`` first for arbitrary whitespace)."""
    return (docs.select(*keep_cols,
                        F.explode(F.split(F.col(text_col), sep,
                                          -1)).alias("word"))
            .filter(F.col("word") != ""))


def unigram_model(docs: DataFrame, text_col: str = "text",
                  group_cols: Sequence[str] = ("lang",)) -> DataFrame:
    """Corpus unigram LM: ``(group…, word, n, logp)`` with
    ``logp = ln(n / total_tokens_in_group)``."""
    w = _words(docs, text_col, list(group_cols))
    counts = w.groupBy(*group_cols, "word").agg(
        F.count("*").alias("n"))
    totals = counts.groupBy(*group_cols).agg(
        F.sum("n").alias("__total"))
    if group_cols:
        joined = counts.join(F.broadcast(totals), list(group_cols))
    else:  # global model: totals is one row
        joined = counts.crossJoin(F.broadcast(totals))
    return (joined
            .withColumn("logp", F.log(F.col("n") / F.col("__total")))
            .drop("__total"))


def surprisal_scores(docs: DataFrame, model: DataFrame,
                     id_cols: Sequence[str] = ("doc_id",),
                     text_col: str = "text",
                     group_cols: Sequence[str] = ("lang",),
                     oov_logp: float | None = None,
                     broadcast_model: bool = True) -> DataFrame:
    """Per-document token-mean negative log-probability:
    ``(id…, group…, mean_surprisal, n_tokens)``. Lower = the model
    finds the document more predictable (CCNet's head)."""
    w = _words(docs, text_col, [*id_cols, *group_cols])
    dw = w.groupBy(*id_cols, *group_cols, "word").agg(
        F.count("*").alias("__k"))
    m = model.select(*group_cols, "word", F.col("logp").alias("__lp"))
    if broadcast_model:
        m = F.broadcast(m)
    j = dw.join(m, [*group_cols, "word"], "left")
    lp = F.col("__lp")
    if oov_logp is not None:
        lp = F.coalesce(lp, F.lit(float(oov_logp)))
    out = (j.groupBy(*id_cols, *group_cols)
           .agg((F.sum(F.col("__k") * -lp) / F.sum("__k"))
                .alias("__mean"),
                F.sum("__k").cast("long").alias("n_tokens"),
                F.sum(F.when(F.col("__lp").isNull(), F.col("__k"))
                      .otherwise(F.lit(0))).cast("long")
                .alias("n_oov_tokens")))
    # SQL sum() skips nulls, so strict mode must null the mean
    # explicitly whenever any token was unmodelled
    mean = (F.col("__mean") if oov_logp is not None else
            F.when(F.col("n_oov_tokens") > 0, F.lit(None))
            .otherwise(F.col("__mean")))
    return (out.withColumn("mean_surprisal", mean.cast("double"))
            .drop("__mean")
            .select(*id_cols, *group_cols, "mean_surprisal",
                    "n_tokens", "n_oov_tokens"))


def perplexity_buckets(scored: DataFrame, head_below: float,
                       tail_from: float,
                       score_col: str = "mean_surprisal",
                       out_col: str = "ppl_bucket") -> DataFrame:
    """CCNet head/middle/tail split on fixed surprisal thresholds
    (``head: s < head_below``, ``tail: s >= tail_from``). A null score
    (strict OOV) lands in ``tail`` — unmodellable text is not head
    data."""
    s = F.col(score_col)
    b = (F.when(s < head_below, "head")
         .when(s < tail_from, "middle")
         .otherwise("tail"))
    return scored.withColumn(out_col, b)


def importance_weights(docs: DataFrame, target_model: DataFrame,
                       raw_model: DataFrame,
                       id_cols: Sequence[str] = ("doc_id",),
                       text_col: str = "text",
                       group_cols: Sequence[str] = (),
                       oov_logp: float = -20.0,
                       broadcast_model: bool = True) -> DataFrame:
    """DSIR importance weight (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document
    token-mean ``log p_target(w) − log p_raw(w)`` under two bag-of-words
    models — positive = the document looks more like the target domain
    than the raw crawl. Same scale shape as
    :func:`surprisal_scores` (per-(doc, word) pre-count, two model
    joins on ``word``); both models take the ``oov_logp`` floor so a
    word absent from either vocabulary contributes a bounded ratio.
    Output: ``(id…, group…, log_importance, n_tokens)``."""
    w = _words(docs, text_col, [*id_cols, *group_cols])
    dw = w.groupBy(*id_cols, *group_cols, "word").agg(
        F.count("*").alias("__k"))
    on = [*group_cols, "word"]
    t = target_model.select(*on, F.col("logp").alias("__lpt"))
    r = raw_model.select(*on, F.col("logp").alias("__lpr"))
    if broadcast_model:
        t, r = F.broadcast(t), F.broadcast(r)
    j = dw.join(t, on, "left").join(r, on, "left")
    floor = F.lit(float(oov_logp))
    ratio = (F.coalesce(F.col("__lpt"), floor)
             - F.coalesce(F.col("__lpr"), floor))
    return (j.groupBy(*id_cols, *group_cols)
            .agg((F.sum(F.col("__k") * ratio) / F.sum("__k"))
                 .alias("log_importance"),
                 F.sum("__k").cast("long").alias("n_tokens")))


def dsir_sample(weights: DataFrame, k: int,
                weight_col: str = "log_importance",
                key_col: str = "doc_id",
                seed: str = "") -> DataFrame:
    """DSIR's importance RESAMPLING step, deterministically: Gumbel
    top-k (keep the k largest ``weight + g``, ``g ~ Gumbel(0,1)``)
    samples without replacement with probability ∝ exp(weight) — here
    the Gumbel noise is derived from the row's md5 hash bucket
    (``g = −ln(−ln((bucket + 0.5) / BUCKETS))``), so a re-run, a
    resumed slice, and the DuckDB oracle all select the same rows, the
    same property as every sampler in :mod:`..functions.sampling`.
    ``orderBy().limit()`` compiles to TakeOrderedAndProject — each
    partition keeps its top k and only k·n_partitions rows reach the
    driver-side merge, no global sort."""
    from ..functions.sampling import BUCKETS, hash_bucket_col
    u = ((hash_bucket_col(F.col(key_col), seed) + F.lit(0.5))
         / F.lit(float(BUCKETS)))
    g = -F.log(-F.log(u))
    scored = weights.withColumn("__gumbel_score",
                                F.col(weight_col) + g)
    return (scored.orderBy(F.col("__gumbel_score").desc(),
                           F.col(key_col).asc())
            .limit(k).drop("__gumbel_score"))
