"""Byte-pair-encoding vocabulary induction over the documents table.

The tokenizer-training step of an LLM data pipeline: learn the top-k
merge rules from corpus statistics, then segment text with them.

Shape (the part that matters at 100 TB):

- ONE corpus pass builds the word-frequency table (groupBy word with
  map-side combine) — everything after runs on that vocabulary-bounded
  frame (|V| rows, ≪ corpus), cached. This is how production BPE
  trainers work too (they train on word counts, not raw text).
- Each merge round is one scan of the cached vocab frame: adjacent-pair
  counts (groupBy pair, weighted by word freq), a 1-row argmax to the
  driver (inherent to BPE — the next merge depends on the last), and a
  map-only literal `replace` applying the merge. k rounds ⇒ k small
  jobs over |V| rows; the corpus is never touched again.
- `bpe_apply` replays the k merges as a chain of k literal JVM
  `replace` calls — map-only, zero shuffle, whole-stage codegen.

Determinism / oracle discipline: a word is encoded with each symbol
wrapped in \\x02..\\x03 markers, so one merge pass is a plain literal
``replace('\\x02a\\x03\\x02b\\x03' -> '\\x02ab\\x03')``. Literal
replace is leftmost non-overlapping with scan-continue-after in Spark,
DuckDB, and Python alike, and the self-contained markers make that
EXACTLY the canonical greedy left-to-right BPE pass (runs pair as
(aa)(aa)a, adjacent occurrences both merge). Ties in the argmax break
on (count desc, left asc, right asc) — explicit, engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import tokens_col

# symbol markers: control chars that survive both engines' literal
# replace untouched; input text containing them would only shift token
# boundaries identically in every engine
SOT = "\x02"
EOT = "\x03"


def _encode_word(word):
    """chars of ``word`` each wrapped as \\x02c\\x03."""
    return F.regexp_replace(word, "(.)", f"{SOT}$1{EOT}")


def enc_token(tok: str) -> str:
    return f"{SOT}{tok}{EOT}"


def word_frequencies(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``(word, freq)`` — the one corpus-wide pass BPE training needs."""
    return (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Returns ``(merges, merges_df)`` where ``merges`` is the ordered
    list of ``(left, right, pair_count)`` and ``merges_df`` is the same
    as a DataFrame ``(step, left, right, merged, pair_count)``.
    """
    spark = df.sparkSession
    words = word_frequencies(df, text_col).withColumn(
        "enc", _encode_word(F.col("word"))
    ).select("enc", "freq").cache()

    merges: list[tuple[str, str, int]] = []
    cur = words
    boundary = EOT + SOT
    for _ in range(n_merges):
        toks = F.split(
            F.regexp_replace(F.col("enc"), f"^{SOT}|{EOT}$", ""), boundary
        )
        n = F.size(toks)
        pairs = cur.select(
            F.col("freq"),
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, n - 1).alias("l"),
                    F.slice(toks, 2, n - 1).alias("r"),
                )
            ).alias("p"),
        ).filter(F.col("p.l").isNotNull() & F.col("p.r").isNotNull())
        best = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .first()
        )
        if best is None:
            break
        l, r, cnt = best["l"], best["r"], int(best["cnt"])
        merges.append((l, r, cnt))
        cur = cur.withColumn(
            "enc",
            F.replace(
                F.col("enc"),
                F.lit(enc_token(l) + enc_token(r)),
                F.lit(enc_token(l + r)),
            ),
        )
        # k is small (≤ a few dozen here); at real scale checkpoint the
        # vocab frame every ~16 rounds to bound lineage depth
    words.unpersist()  # every merge already reached the driver
    merges_df = spark.createDataFrame(
        [(i, l, r, l + r, c) for i, (l, r, c) in enumerate(merges)],
        "step int, left string, right string, merged string, pair_count long",
    )
    return merges, merges_df


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment each document with the learned merges: ``(id, subwords
    array<string>, n_subwords)``. Map-only — a chain of literal
    replaces over the marker-encoded words, no shuffle."""
    words = F.transform(tokens_col(F.col(text_col)), _encode_word)
    enc = F.concat_ws("\x01", words)
    for l, r, _ in merges:
        enc = F.replace(enc, F.lit(enc_token(l) + enc_token(r)), F.lit(enc_token(l + r)))
    # collapse word boundaries (EOT \x01 SOT) and symbol boundaries
    # (EOT SOT) into one split char, strip the edge markers, split
    s = F.regexp_replace(enc, f"{EOT}\x01{SOT}", "\x00")
    s = F.regexp_replace(s, f"{EOT}{SOT}", "\x00")
    s = F.regexp_replace(s, f"^{SOT}|{EOT}$", "")
    subwords = F.filter(F.split(s, "\x00"), lambda t: t != "")
    return df.select(
        F.col(id_col),
        subwords.alias("subwords"),
        F.size(subwords).alias("n_subwords"),
    )
