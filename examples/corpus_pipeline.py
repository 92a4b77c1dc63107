"""End-to-end corpus curation demo on the composable API.

Reads the documents fixture, then: quality gate -> exact dedup ->
cross-doc span rewrite -> perplexity tail drop -> near-dup pair
detection -> canonical survivor selection -> DSIR domain scoring ->
shard assignment — the whole 100 TB training-data funnel in API
calls, each stage a lazy DataFrame Catalyst optimizes across.

Run: python examples/corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scache_spark import api
from scache_spark.catalog import load_table
from scache_spark.functions import hash64
from scache_spark.session import get_session

N_SHARDS = 8


def main(sf_dir: str) -> None:
    spark = get_session("corpus-pipeline-demo")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate: drop docs that are too short or digit-heavy
    scored = api.quality_signals(docs, "text")
    gated = scored.filter(
        (F.col("q_tokens") >= 5) & (F.col("q_digit_ratio") < 0.3)
    )
    n1 = gated.count()

    # 2. exact dedup (hash-before-shuffle: text never moves)
    exact = api.exact_dedup(gated, "text", "doc_id")
    n2 = exact.count()

    # 2b. CCNet-style perplexity gate on the original text: drop the
    #     worst third of the quality distribution
    buckets = api.perplexity_buckets(exact, "doc_id", "text")
    exact = exact.join(
        buckets.filter(F.col("bucket") != "tail").select("doc_id"), "doc_id"
    )

    # 2c. C4-style span rewrite: repeated cross-doc spans are removed
    #     keep-first; the rewritten text feeds every later stage, so
    #     quality token counts are recomputed on it
    rewritten = api.span_dedup_rewrite(
        exact.select("doc_id", "text"), "doc_id", "text"
    )
    exact = api.quality_signals(
        rewritten.join(exact.select("doc_id", "source"), "doc_id"),
        "text",
    )
    n2b = exact.count()

    # 3. near-dup pairs via MinHash banding, then canonical selection:
    #    keep the highest-quality doc (most tokens, min id) per pair
    #    component's representative edge set
    pairs = api.minhash_pairs(exact, "doc_id", "text", threshold=0.5)
    losers = (
        pairs.join(
            exact.select(
                F.col("doc_id").alias("id_a"),
                F.col("q_tokens").alias("tok_a"),
            ),
            "id_a",
        )
        .join(
            exact.select(
                F.col("doc_id").alias("id_b"),
                F.col("q_tokens").alias("tok_b"),
            ),
            "id_b",
        )
        .select(
            F.when(
                (F.col("tok_a") > F.col("tok_b"))
                | (
                    (F.col("tok_a") == F.col("tok_b"))
                    & (F.col("id_a") < F.col("id_b"))
                ),
                F.col("id_b"),
            )
            .otherwise(F.col("id_a"))
            .alias("drop_id")
        )
        .distinct()
    )
    survivors = exact.join(
        losers, exact.doc_id == losers.drop_id, "left_anti"
    )
    n3 = survivors.count()

    # 3b. DSIR: score every survivor against the src0 target domain —
    #     the weights would drive importance resampling at ingestion
    weights = api.dsir_score(
        survivors, "doc_id", "text", F.col("source") == "src0"
    )
    top_w = (
        weights.orderBy(F.col("log_weight").desc(), F.col("doc_id").asc())
        .limit(3)
        .collect()
    )

    # 4. deterministic shard assignment for training ingestion
    sharded = survivors.withColumn(
        "shard",
        F.pmod(
            hash64(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
            F.lit(N_SHARDS),
        ).cast("int"),
    )
    per_shard = sharded.groupBy("shard").count().orderBy("shard")

    print(f"ingested={n0} quality_gated={n1} exact_deduped={n2} "
          f"span_rewritten_ppl_gated={n2b} near_deduped={n3}")
    print("  top DSIR docs:",
          [(r["doc_id"], r["log_weight"]) for r in top_w])
    for row in per_shard.collect():
        print(f"  shard {row['shard']}: {row['count']} docs")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
