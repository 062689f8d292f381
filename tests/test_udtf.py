"""The Python UDTF path (functions/udtfs.py) against a JVM-expression
oracle: same top-k tokens per document, same tie-breaks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from database_fragmentation_and_query_processor_spark.functions.udtfs import HAVE_UDTF

K = 3


@pytest.mark.skipif(not HAVE_UDTF, reason="pyspark without UDTF support")
def test_top_tokens_udtf_matches_jvm_expression(spark, sf_dir):
    from database_fragmentation_and_query_processor_spark.functions.udtfs import (
        TopTokensUDTF,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    spark.udtf.register("top_tokens", TopTokensUDTF)
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        f"""
        SELECT d.doc_id, t.token, t.cnt, t.rank
        FROM udtf_docs d, LATERAL top_tokens(d.text, {K}) t
        """
    ).collect()

    # JVM oracle: explode tokens, count, window-rank with the same ties
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).where(F.length("token") > 0)
    counts = toks.groupBy("doc_id", "token").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("token"))
    want = (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= K)
        .collect()
    )
    as_set = lambda rows: {(r["doc_id"], r["token"], r["cnt"], r["rank"]) for r in rows}  # noqa: E731
    assert as_set(got) == as_set(want)
    assert len(got) > 0
