"""Dataset-assembly operators: deterministic splits and benchmark
contamination — the last-mile steps of a training-data pipeline.

Scale design:

- **train_split**: pure Column expression over a hash of the id — no
  shuffle at all, embarrassingly parallel, and *stable*: re-running on
  a grown corpus never moves an existing doc between splits (the
  property that matters for dataset versioning).
- **contamination**: shingle join between corpus and benchmark. The
  benchmark side is tiny (eval sets are thousands of docs) → its
  distinct shingles broadcast; the corpus side streams map-side with
  no shuffle of the corpus itself, then one groupBy(doc_id) counts
  overlapping shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .dedup import _shingled


def train_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.9,
    val: float = 0.05,
    salt: str = "v1",
) -> DataFrame:
    """Assign each row to train/val/test by a hash of its id.

    ``bucket = int(md5(salt || id)[:4], 16) % 10000`` — deterministic,
    engine-portable (md5 on both Spark and DuckDB), stable under
    corpus growth, and tunable per dataset version via ``salt``.
    Fractions are exact over the bucket space (not approximate
    sampling): train gets buckets [0, train·10⁴), val the next
    val·10⁴, test the rest.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4), 16, 10)
        .cast("long") % 10000
    )
    t_hi = int(train * 10000)
    v_hi = t_hi + int(val * 10000)
    split = (
        F.when(bucket < t_hi, F.lit("train"))
        .when(bucket < v_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("bucket", bucket).withColumn("split", split)


def weighted_mix(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default: float = 0.0,
    salt: str = "mix1",
) -> DataFrame:
    """Deterministic corpus mixing: keep each source at its target
    sampling fraction (``weights[source]`` ∈ [0, 1]; unlisted sources
    keep ``default``). The keep decision is
    ``md5(salt || id)-bucket < fraction·10⁴`` — the same hash-bucket
    recipe as :func:`train_split`, so it is

    - a pure Column filter (no shuffle, no RNG state, map-side only),
    - exact over the bucket space rather than Bernoulli-approximate,
    - **stable**: a doc's keep/drop never changes as the corpus grows
      or the job re-runs, and composing with train_split stays
      unbiased (different salt → independent buckets).

    This is the "mix Common Crawl at 60%, books at 30%, code at 10%"
    step of training-data assembly, as a one-line declarative filter.
    """
    for s, w in weights.items():
        if not (0.0 <= w <= 1.0):
            raise ValueError(f"weight for {s!r} must be in [0, 1], got {w}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default must be in [0, 1], got {default}")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4
            ),
            16, 10,
        ).cast("long") % 10000
    )
    frac = F.lit(default * 10000)
    for s, w in sorted(weights.items()):
        frac = F.when(F.col(source_col) == s, F.lit(int(w * 10000))).otherwise(frac)
    return df.filter(bucket < frac)


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark contamination: per corpus doc, how many of its word
    ``n``-gram shingles appear anywhere in the benchmark set.

    Returns ``(doc_id, n_shingles, n_contaminated, contamination)``
    with ``contamination = n_contaminated / n_shingles``. The
    benchmark's distinct shingles broadcast (eval sets are small);
    the corpus never shuffles — one map-side semi-match feeds a single
    groupBy on doc_id.
    """
    corp_sh = _shingled(corpus, text_col, id_col, n)
    bench_sh = _shingled(benchmark, text_col, id_col, n).select("shingle").distinct()
    hits = corp_sh.join(
        F.broadcast(bench_sh).withColumn("_hit", F.lit(1)), "shingle", "left"
    )
    # explicit long casts + 6dp ratio: keeps the result hash-stable
    # against SQL oracles whose sum() widens (DuckDB HUGEINT) or whose
    # float formatting differs in the last ulp
    return (
        hits.groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_shingles",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
                "contamination"
            ),
        )
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global training-order shuffle: assign every row a
    shard and an in-shard position from an md5 sort key.

    The canonical last step of a training-data pipeline — a
    reproducible random order with NO global sort: the shard is
    ``md5-bucket mod n_shards`` (pure Column, zero shuffle) and the
    position is a rank within the shard (ONE shuffle keyed by shard,
    each shard ranked independently — at 100 TB that is
    embarrassingly parallel, and writers emit one file per shard with
    rows already in final order). Re-runs reproduce the exact order;
    changing ``salt`` re-shuffles.
    """
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 15), 16, 10).cast("long"), F.lit(n_shards)
    )
    w = W.partitionBy("shard").orderBy(F.col("_key"), F.col(id_col))
    return (
        df.withColumn("_key", key)
        .withColumn("shard", shard.cast("int"))
        .withColumn("position", (F.row_number().over(w) - 1).cast("long"))
        .drop("_key")
    )


def temperature_mix(
    df: DataFrame,
    target_total: int,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "tmix-v1",
) -> DataFrame:
    """Temperature-weighted corpus mixing (the multilingual α-sampling
    recipe): source s gets share ``N_s^α / Σ_t N_t^α`` of a
    ``target_total`` row budget — α < 1 up-weights small sources, α = 1
    is proportional. Each source keeps probability
    ``p_s = min(1, share_s · target_total / N_s)`` via the same
    deterministic md5-bucket filter as :func:`weighted_mix` (pure
    Column filter, no shuffle on the corpus, stable under re-runs).

    Returns the kept rows plus ``keep_cut`` (the per-source bucket
    cutoff of 10⁴) for auditability. With α = 0.5 every arithmetic
    step (sqrt — correctly-rounded IEEE — ratios, floor to the bucket
    cut) reproduces bit-for-bit in any engine.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    from pyspark.sql import Window as W

    # α = 0.5 routes through sqrt (correctly-rounded in every IEEE
    # libm, unlike pow(x, 0.5) which is only *usually* identical) —
    # this is what keeps the bucket cutoffs bit-stable cross-engine
    if float(alpha) == 0.5:
        pw = F.sqrt(F.col("_n").cast("double"))
    else:
        pw = F.pow(F.col("_n").cast("double"), F.lit(float(alpha)))
    counts = counts.withColumn(
        "_w", pw / F.sum(pw).over(W.partitionBy())
    )
    p = F.least(
        F.lit(1.0), F.col("_w") * F.lit(float(target_total)) / F.col("_n")
    )
    cuts = counts.select(
        source_col, F.floor(p * 10000).cast("int").alias("keep_cut")
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 4
            ),
            16, 10,
        ).cast("long") % 10000
    )
    return (
        df.join(F.broadcast(cuts), source_col)
        .withColumn("_bucket", bucket)
        .filter(F.col("_bucket") < F.col("keep_cut"))
        .drop("_bucket")
    )
