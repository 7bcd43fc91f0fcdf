"""Deduplication operators, column-parameterized.

Scale shape: shingling and minhashing are narrow (per-row generate +
explode, map-side); the only shuffles are the (doc, perm) partial-min
aggregation and the (band, signature) candidate join — candidate
generation never materializes all pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of lowercased, space-tokenized text.

    Guarded for short texts: Spark's sequence(1, 0) counts *down*
    ([1, 0]), so texts below the shingle width need an explicit empty.
    """
    toks = F.split(F.lower(text), " ")
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(df: DataFrame, key: str, text: str) -> DataFrame:
    """Map every row to its canonical (min-key) representative by
    normalized-text hash; ``is_dup`` marks rows to drop."""
    hashed = df.select(F.col(key), F.md5(F.lower(F.col(text))).alias("text_hash"))
    groups = hashed.groupBy("text_hash").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min(key).alias("canonical_id"),
    )
    return hashed.join(groups, "text_hash").select(
        key, "text_hash", "canonical_id", "group_size",
        F.when(F.col(key) != F.col("canonical_id"), 1).otherwise(0).alias("is_dup"),
    )


def minhash_bands(
    df: DataFrame, key: str, text: str, n_perm: int = 16, n_bands: int = 4
) -> DataFrame:
    """(key, band, band_sig) MinHash band signatures.

    Permutation i's hash of a shingle is md5(i ':' shingle); the min
    over a doc's shingles approximates a random-permutation min-hash.
    """
    rows_per_band = n_perm // n_bands
    spark = df.sparkSession
    exploded = df.select(
        F.col(key), F.explode(shingles(F.col(text))).alias("shingle")
    )
    perms = spark.range(n_perm).select(F.col("id").cast("int").alias("perm"))
    hashed = (
        exploded.crossJoin(F.broadcast(perms))
        .groupBy(key, "perm")
        .agg(
            F.min(
                F.md5(F.concat(F.col("perm").cast("string"), F.lit(":"), F.col("shingle")))
            ).alias("mh")
        )
    )
    return (
        hashed.withColumn("band", F.expr(f"perm div {rows_per_band}"))
        .groupBy(key, "band")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "mh"))),
                    lambda s: s["mh"],
                ),
            ).alias("band_sig")
        )
    )


def lsh_candidate_pairs(bands: DataFrame, key: str) -> DataFrame:
    """Self-join band signatures -> candidate near-dup pairs with the
    number of matching bands (more bands = higher similarity)."""
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{key}") < F.col(f"b.{key}")),
        )
        .groupBy(
            F.col(f"a.{key}").alias(f"{key}_a"), F.col(f"b.{key}").alias(f"{key}_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_bands"))
    )
