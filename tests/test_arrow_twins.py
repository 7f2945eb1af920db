"""Equality pins for the round-12 Arrow-vectorized twins.

The dedup operators replaced three CodegenFallback higher-order
expressions with batch-wise Python implementations that must produce
IDENTICAL values: `_shingle_arrow(n)` vs `shingles(col, n)`,
`_minhash_poly_arrow(k)` vs transform(sh, polyhash) + the 32 affine
minima, and the row-shaped xxhash64 signature vs `minhash_signature`.
These tests compare the new implementations element-for-element against
the original expression forms on the real corpus AND on an edge-case
fixture (empty text, tabs/newlines in Java-\\s but not-Python-\\s
positions, single-word docs, unicode whitespace that Python's \\s
matches but Java's does not, non-ASCII codepoints, NULL text).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fraud_detetion_with__kafkastreams_and_grafana_spark.operators import dedup as DD
from fraud_detetion_with__kafkastreams_and_grafana_spark.functions.text import polyhash
from fraud_detetion_with__kafkastreams_and_grafana_spark.sources.tables import load_table

EDGE_TEXTS = [
    (0, ""),                      # empty -> single "" shingle
    (1, "one"),                   # fewer words than n
    (2, "two words"),
    (3, "  leading and trailing  "),
    (4, "\ttab\tseparated\twords here"),   # leading \t survives trim(' ')
    (5, "a b c d e f g"),
    (6, "dup dup dup dup"),       # distinctness
    (7, "line\nbreaks\nand\rcarriage returns"),
    (8, "nbsp is not java whitespace"),  # Java \s misses
    (9, "café résumé 你好 tokens"),  # non-ASCII cps
    (10, None),                   # NULL text
    (11, " \t \n "),              # whitespace-only
    # astral (non-BMP) codepoints — ADVICE r12: Python ord() sees one
    # codepoint where a UTF-16 engine might see a surrogate pair; the
    # twin equality below is the pin that the two paths agree
    (12, "emoji 😀 and deseret 𐐀 mix"),
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")


def _collect_map(df, key, val):
    return {r[key]: r[val] for r in df.collect()}


@pytest.mark.parametrize("n", [1, 3])
def test_shingle_arrow_equals_expression_form(spark, sf_dir, edge_df, n):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for frame in (docs, edge_df):
        expr = _collect_map(
            frame.select("doc_id", DD.shingles(F.col("text"), n).alias("sh")),
            "doc_id", "sh",
        )
        arrow = _collect_map(
            frame.select("doc_id", DD._shingle_arrow(n)(F.col("text")).alias("sh")),
            "doc_id", "sh",
        )
        assert expr == arrow


def test_minhash_poly_arrow_equals_expression_form(spark, sf_dir, edge_df):
    p = 1_000_000_007

    def perm(i):
        a, b = DD.MINHASH_A[i], DD.MINHASH_B[i]
        return lambda h0: (h0 * F.lit(a) + F.lit(b)) % F.lit(p)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for frame in (docs, edge_df.where(F.col("text").isNotNull())):
        frame = frame.filter(F.trim("text") != "")
        sh = DD.shingles(F.col("text"), 3).alias("sh")
        expr_df = frame.select("doc_id", sh).withColumn(
            "hs", F.transform("sh", polyhash)
        ).select(
            "doc_id",
            "sh",
            F.array(
                *[F.array_min(F.transform("hs", perm(i))) for i in range(32)]
            ).alias("sig"),
        )
        arrow_df = frame.select(
            "doc_id", DD._minhash_poly_arrow(32)(F.col("text")).alias("x")
        ).select("doc_id", F.col("x.sh").alias("sh"), F.col("x.sig").alias("sig"))
        expr = {r.doc_id: (r.sh, r.sig) for r in expr_df.collect()}
        arrow = {r.doc_id: (r.sh, r.sig) for r in arrow_df.collect()}
        assert expr == arrow


def test_rowshaped_seeded_minhash_equals_array_form(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select(
        F.col("doc_id").alias("id"), DD.shingles(F.col("text"), 3).alias("sh")
    )
    expr = _collect_map(
        base.select("id", DD.minhash_signature(F.col("sh"), 32).alias("sig")),
        "id", "sig",
    )
    rows = (
        base.select("id", F.explode("sh").alias("s"))
        .groupBy("id")
        .agg(*[F.min(F.xxhash64("s", F.lit(i))).alias(f"m{i}") for i in range(32)])
        .select("id", F.array(*[F.col(f"m{i}") for i in range(32)]).alias("sig"))
    )
    assert expr == _collect_map(rows, "id", "sig")
