"""Deterministic hash-based sampling — corpus mixture weighting.

Training-data pipelines rarely keep the raw crawl mixture: sources and
quality bands are re-weighted (keep 100% of one stratum, 20% of
another) the DoReMi / RefinedWeb way. At 100 TB the sampler must be

* **deterministic** — a re-run (or a resumed slice) keeps exactly the
  same rows; no RNG state, no seed-per-partition drift;
* **a pure projection/filter** — md5 of the key → bucket → compare
  against the stratum's rate; no shuffle, pushes to the scan, and any
  engine (DuckDB oracle included) reproduces it byte-for-byte;
* **content- or id-keyed by choice** — keying on content keeps exact
  duplicates together (the leakage-safe choice, same property as
  ``q_train_val_split``); keying on id keeps near-dup variants
  independent.

Same md5-hex technique as the train/val/test split
(``queries.q_train_val_split``); a different ``seed`` decorrelates the
two decisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1_000_000  # rate resolution: parts-per-million


def hash_bucket_col(key: Column, seed: str = "") -> Column:
    """Uniform bucket in [0, BUCKETS): first 8 md5 hex digits of
    ``seed || key``, mod BUCKETS. Integer end to end — no float
    comparison drift between engines."""
    h = F.md5(F.encode(F.concat(F.lit(seed), key.cast("string")),
                       "UTF-8"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(BUCKETS))


def stratified_sample(df: DataFrame, rates_ppm: dict[str, int],
                      stratum_col: str, key_col: str,
                      seed: str = "") -> DataFrame:
    """Keep each row iff its hash bucket < its stratum's rate (in
    parts-per-million). Unlisted strata drop entirely. The rate map is
    a literal ``create_map`` lookup — the whole operator is one JVM
    filter expression."""
    pairs: list[Column] = []
    for k, v in sorted(rates_ppm.items()):
        pairs.extend([F.lit(k), F.lit(int(v))])
    rate = F.coalesce(
        F.element_at(F.create_map(*pairs),
                     F.col(stratum_col).cast("string")),
        F.lit(0),
    )
    return df.filter(hash_bucket_col(F.col(key_col), seed) < rate)


def quota_cap(df: DataFrame, key_cols: list[str], order_col: str,
              cap: int,
              skew_threshold: int | None = None,
              n_bands: int = 32) -> DataFrame:
    """Keep at most ``cap`` rows per key, best-first by ``order_col``
    ascending — the per-domain quota every curated web corpus applies
    so no single host dominates the mixture (C4 and RefinedWeb cap
    per-domain contributions; the reference's single-folder walks have
    no analogue).

    ``order_col`` must be unique within a key (compose a tiebreak —
    e.g. first-seen doc_id — otherwise the surviving set is
    row_number-arbitrary, per SQL semantics). The hosts a quota exists
    FOR are exactly the Zipf-hot ones, so the plain
    ``row_number OVER (PARTITION BY host)`` plan — whose hot-key
    partition serializes into one task — is the wrong shape at 100 TB;
    with ``skew_threshold`` set this delegates to
    :func:`..operators.frontier.ranked_in_key`'s banded plan and
    passes ``cap`` as its ``max_rank`` hint, so a hot host's rows
    beyond the cap are dropped at band granularity BEFORE the rank
    join-back (a 27%-of-corpus host capped at 1k ranks ~cap rows, not
    its millions).
    """
    from ..operators.frontier import ranked_in_key
    ranked = ranked_in_key(df, key_cols, order_col, out_col="__q_rk",
                           skew_threshold=skew_threshold,
                           n_bands=n_bands, max_rank=cap)
    return ranked.filter(F.col("__q_rk") <= cap).drop("__q_rk")


def temperature_rates_ppm(counts: dict[str, int],
                          alpha: float = 0.5) -> dict[str, int]:
    """Language-mixture temperature rates (mT5 / multilingual-sampling
    convention): make the KEPT shares proportional to p_l^alpha by
    keeping stratum l at rate r_l ∝ p_l^(alpha-1), normalized so the
    rarest stratum keeps everything. Rates return as floor-ed ppm for
    :func:`stratified_sample`.

    Cross-engine exactness at the default alpha=0.5: r_l =
    sqrt(n_min / n_l) uses only correctly-rounded IEEE-754 ops
    (division, sqrt, multiply, floor), so a SQL oracle deriving the
    rates from the same counts lands on the identical ppm integers.
    Other alphas go through pow(), which carries no such guarantee —
    fine for production, not for a bit-exact replica."""
    import math
    n_min = min(counts.values())
    out = {}
    for k, n in counts.items():
        if alpha == 0.5:
            r = math.sqrt(n_min / n)
        else:
            r = (n_min / n) ** (1.0 - alpha)
        out[k] = int(math.floor(BUCKETS * r))
    return out


def temperature_sample(df: DataFrame, stratum_col: str, key_col: str,
                       alpha: float = 0.5,
                       seed: str = "") -> DataFrame:
    """Temperature-sample a corpus by stratum: one tiny stratum-count
    aggregate (bounded collect — the "mixture stats" a production job
    would read from its metrics cube), then the deterministic
    hash-bucket filter. The data pass is a pure map-side filter — same
    no-shuffle contract as :func:`stratified_sample` (plan-asserted
    there)."""
    counts = {r[0]: r[1] for r in
              df.groupBy(stratum_col).count().collect()}
    rates = temperature_rates_ppm(counts, alpha)
    return stratified_sample(df, rates, stratum_col, key_col, seed)
