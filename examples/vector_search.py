"""Vector-search demo: exact kNN vs LSH-bucketed ANN on the API.

Buckets the corpus once with hyperplane LSH (the partition key a
100 TB index is laid out on), answers a query both ways, and reports
the shortlist size + recall of the bucketed path against brute force.

Run: python examples/vector_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from scache_spark import api
from scache_spark.catalog import load_table
from scache_spark.session import get_session

K = 10


def main(sf_dir: str) -> None:
    spark = get_session("vector-search-demo")
    corpus = load_table(spark, sf_dir, "embeddings")
    queries = corpus.filter(F.col("vec_id") % 100 == 0).limit(5)

    exact = api.knn_topk(
        corpus, queries, vec_col="embedding", id_col="vec_id",
        query_id_col="vec_id", k=K,
    )

    bucketed = corpus.withColumn(
        "bucket", api.lsh_cosine_bucket(F.col("embedding"), dim=64)
    )
    qb = queries.select(
        F.col("vec_id").alias("q_id"),
        api.lsh_cosine_bucket(F.col("embedding"), dim=64).alias("q_bucket"),
    )
    shortlist = bucketed.join(
        F.broadcast(qb), F.col("bucket") == F.col("q_bucket")
    )
    ann = api.knn_topk(
        shortlist.select("vec_id", "embedding").distinct(),
        queries, vec_col="embedding", id_col="vec_id",
        query_id_col="vec_id", k=K,
    )

    n_corpus = corpus.count()
    n_short = shortlist.count()
    e = {(r.q_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.q_id, r.neighbor_id) for r in ann.collect()}
    recall = len(e & a) / len(e)
    print(f"corpus={n_corpus} shortlist_rows={n_short} "
          f"scan_fraction={n_short / (n_corpus * 5):.3f} "
          f"recall@{K}={recall:.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
