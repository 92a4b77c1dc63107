"""User-facing composable API: the engine's operators, parameterized
over ARBITRARY DataFrames.

The registry (`registry.py`) binds every operator to the fixture
tables so the round driver can oracle-check it; this module is the
surface an application actually imports — the same scale-first plans
(hash-before-shuffle dedup, banded LSH joins, broadcast codebooks,
union+window as-of joins) exposed as functions of (DataFrame, column
names, knobs).  Each function returns a lazy DataFrame: callers
compose them and let Catalyst optimize across the seams.

Determinism contract matches the registry: md5-derived hashing only,
every ranking totally ordered, no unseeded randomness anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from scache_spark.functions import (
    bounded_window,
    salted_md5,
    vec_cosine,
    word_shingles,
)

__all__ = [
    "exact_dedup",
    "minhash_pairs",
    "lsh_cosine_bucket",
    "knn_topk",
    "sessionize",
    "asof_join",
    "quality_signals",
    "top_k_per_group",
    "shard_assign",
    "train_val_test_split",
    "bm25_score",
    "semantic_dedup",
    "span_dedup_rewrite",
    "dsir_score",
    "perplexity_buckets",
    "cms_sketch",
    "cms_estimate",
    "edit_distance_pairs",
    "skyline_2d",
    "auc_rank",
]


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep one survivor (min id) per exact content hash.

    Scale shape: only (16-byte md5, id) pairs reach the exchange; the
    content column never shuffles — the survivor set joins back on
    the frame's own id (cf. ``pipeline.dedup_materialize``).
    """
    hashed = df.withColumn("__h", F.md5(F.col(content_col)))
    keep = hashed.groupBy("__h").agg(F.min(id_col).alias("__keep"))
    return (
        hashed.join(keep, "__h")
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__h", "__keep")
    )


def minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 8,
    n_bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, jaccard) via MinHash banding.

    The banded self-join bounds the candidate space (never all-pairs);
    exact Jaccard verifies candidates only (cf. ``dedup.py``).
    ``n_hashes`` must be divisible by ``n_bands``.
    """
    rows = n_hashes // n_bands
    toks = F.split(F.lower(F.col(text_col)), " ")
    sh = df.select(
        F.col(id_col).alias("__id"),
        word_shingles(toks, shingle_n).alias("__sh"),
    ).filter(F.size("__sh") > 0)
    def _sig(i: int):
        # one-parameter closure: a `lambda s, i=i` would be treated by
        # pyspark as an (element, index) lambda and the index column
        # would silently replace the salt
        return F.array_min(
            F.transform(F.col("__sh"), lambda s: salted_md5(s, i))
        ).alias(f"__sig_{i}")

    sigs = sh.select("__id", "__sh", *[_sig(i) for i in range(n_hashes)])
    banded = sigs.select(
        "__id",
        "__sh",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"__sig_{b * rows + r}")
                                for r in range(rows)
                            ],
                        )
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("__band_id", "__band_hash"),
    )
    a = banded.select(
        F.col("__id").alias("id_a"),
        F.col("__sh").alias("__sh_a"),
        "__band_id",
        "__band_hash",
    )
    b = banded.select(
        F.col("__id").alias("id_b"),
        F.col("__sh").alias("__sh_b"),
        F.col("__band_id").alias("__band_id_b"),
        F.col("__band_hash").alias("__band_hash_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("__band_id") == F.col("__band_id_b"))
            & (F.col("__band_hash") == F.col("__band_hash_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b", "__sh_a", "__sh_b")
        .distinct()
    )
    jac = F.size(F.array_intersect("__sh_a", "__sh_b")).cast(
        "double"
    ) / F.size(F.array_union("__sh_a", "__sh_b"))
    return (
        cand.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def lsh_cosine_bucket(
    vec: Column, *, dim: int, n_planes: int = 8
) -> Column:
    """Hyperplane-LSH bucket id of an array<float/double> column:
    sign bits of ``n_planes`` deterministic (sin-derived) planes —
    the partition key that turns ANN into a ~1/2^p partition read
    (cf. ``similarity.lsh_bucket``, here with the dimension as a
    parameter instead of the fixture constant)."""
    def _plane_term(p: int):
        # a one-parameter lambda: pyspark treats two-parameter lambdas
        # as (element, index) functions, so p must close over, not
        # default-arg
        return lambda j: F.element_at(vec, j).cast("double") * F.sin(
            F.lit(float(p * 131)) + j.cast("double") * 7.0
        )

    bucket = None
    for p in range(n_planes):
        dot = F.aggregate(
            F.transform(F.sequence(F.lit(1), F.lit(dim)), _plane_term(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")


def knn_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors per query (queries broadcast,
    corpus scanned once for ALL queries; ranking is totally ordered
    by (cosine desc, neighbor id))."""
    q = queries.select(
        F.col(query_id_col).alias("q_id"), F.col(vec_col).alias("__qv")
    )
    scored = corpus.join(
        F.broadcast(q), F.col(id_col) != F.col("q_id")
    ).select(
        "q_id",
        F.col(id_col).alias("neighbor_id"),
        vec_cosine(F.col(vec_col), F.col("__qv")).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


def sessionize(
    df: DataFrame,
    *,
    user_col: str,
    ts_col: str,
    gap: str = "10 minutes",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign batch session ids: a new session starts when the gap to
    the previous event meets/exceeds ``gap``.  Adds ``session_id``
    (per-user dense from 1).  One shuffle on the user key serves the
    lag and the running sum.

    Pass ``order_cols`` (e.g. an event id) whenever ``ts_col`` can
    tie: the computation runs two window passes, and over a
    NON-unique sort key the session assignment of tied rows is
    underdetermined — an engine may re-sort ties differently between
    passes (r5 scale-stress finding; fixtures with unique timestamps
    never expose it)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(w)
    new_sess = (
        prev.isNull()
        | (F.col(ts_col) >= prev + F.expr(f"INTERVAL {gap}"))
    ).cast("int")
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts`` STRICTLY before ``left_ts`` (per ``on`` key) — the
    union+window plan (ONE shuffle on the key), never an inequality
    join that degenerates to a nested loop (cf.
    ``temporal.asof_join_last_click``).  Tie discipline (r2 advisor
    finding): the left row is tagged ``__side=0`` and right ``1``, so
    on equal timestamps the left row sorts FIRST and the
    frame-ending-at-(-1) window cannot carry a simultaneous right row
    — exactly the documented strictly-before contract.  (For
    at-or-before ties, see ``asof_join_next_click``'s convention.)
    Right columns arrive as ``asof_<name>``; left rows with no prior
    right row get nulls."""
    lt = left.withColumn("__side", F.lit(0))
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in right_cols],
    )
    lt = lt.withColumn("__ts", F.col(left_ts))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = unioned.select(
        "*",
        F.max(
            F.when(F.col("__side") == 1, F.col("__ts"))
        ).over(w).alias("asof_ts"),
        *[
            F.last(
                F.when(F.col("__side") == 1, F.col(c)), ignorenulls=True
            ).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    drop = ["__side", "__ts", *right_cols]
    return carried.filter(F.col("__side") == 0).drop(*drop)


def windowed_pair_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    window: str = "30 minutes",
) -> DataFrame:
    """All (left, right) pairs sharing ``on`` with ``right_ts`` in
    ``[left_ts - window, left_ts]`` — the safe shape for
    pair-GENERATING trailing-window joins (attribution touchpoints,
    co-session pairs, fraud lookbacks).

    Joining on ``on`` alone with the time window as a residual filter
    is quadratic WITHIN the key: one whale user makes purchases x
    clicks explode before the filter runs (measured 78s -> 10s on the
    r5 hot-key stress replica, `attribution_linear_split`).  Here the
    equi-key is ``(on, time_bucket)`` with bucket width = the window,
    so a qualifying right row sits in the left row's bucket or the
    one before it: the left side explodes to exactly TWO bucket
    probes, each pair matches exactly one arm (no dedup needed), and
    the pair space is bounded by CO-TEMPORAL rows at any per-key
    volume.  Contrast :func:`asof_join` (latest-one-only → union +
    window, no pair generation at all).

    ``window`` must be a fixed interval (the bucket width); both ts
    columns must be timestamps.  Output: all left columns + the
    right columns (caller projects/renames beforehand to avoid
    collisions) — one row per qualifying pair.
    """
    span = F.expr(f"INTERVAL {window}")
    # bucket width in microseconds, derived from the SAME interval
    # expression so the two can never drift apart
    width_us = F.unix_micros(F.to_timestamp(F.lit("1970-01-01")) + span)
    lb = F.floor(F.unix_micros(F.col(left_ts)) / width_us).cast("long")
    lt = left.withColumn("__bkt", F.explode(F.array(lb, lb - 1)))
    rt = right.withColumn(
        "__bkt",
        F.floor(F.unix_micros(F.col(right_ts)) / width_us).cast("long"),
    )
    return (
        lt.join(
            rt,
            (lt[on] == rt[on])
            & (lt["__bkt"] == rt["__bkt"])
            & (F.col(right_ts) >= F.col(left_ts) - span)
            & (F.col(right_ts) <= F.col(left_ts)),
        )
        .drop(rt[on])
        .drop("__bkt")
    )


def quality_signals(df: DataFrame, text_col: str) -> DataFrame:
    """Attach the document-quality signal battery: token count, mean
    token length, punctuation ratio, digit ratio, uppercase ratio —
    all single-pass narrow expressions (cf. ``text.text_quality_score``)."""
    t = F.col(text_col)
    toks = F.split(t, " ")
    n_chars = F.length(t).cast("double")
    return df.select(
        "*",
        F.size(toks).cast("long").alias("q_tokens"),
        F.round(n_chars / F.size(toks), 4).alias("q_mean_tok_len"),
        F.round(
            F.length(F.regexp_replace(t, r"[^\p{Punct}]", "")) / n_chars, 6
        ).alias("q_punct_ratio"),
        F.round(
            F.length(F.regexp_replace(t, r"[^0-9]", "")) / n_chars, 6
        ).alias("q_digit_ratio"),
        F.round(
            F.length(F.regexp_replace(t, r"[^A-Z]", "")) / n_chars, 6
        ).alias("q_upper_ratio"),
    )


def top_k_per_group(
    df: DataFrame,
    *,
    group_cols: tuple[str, ...],
    order_cols: tuple[Column, ...],
    k: int,
) -> DataFrame:
    """Totally-ordered top-k per group (window row_number; callers
    must include a unique tie-break in ``order_cols``)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    )


def shard_assign(
    df: DataFrame, id_col: str, *, n_shards: int = 16, salt: str = "shard"
) -> DataFrame:
    """Deterministic md5 shard id + dense position within the shard —
    a global random permutation with every shard's ordering computed
    in parallel (cf. ``curation.training_shard_assignment``)."""
    from scache_spark.functions import hash64

    keyed = df.withColumn(
        "__k",
        hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
    )
    w = Window.partitionBy("shard").orderBy("__k", id_col)
    return (
        keyed.withColumn(
            "shard", F.pmod(F.col("__k"), F.lit(n_shards)).cast("int")
        )
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .drop("__k")
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str,
    *,
    val_pct: int = 10,
    test_pct: int = 10,
    group_col: str | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic hash split into train/val/test.  With
    ``group_col`` (e.g. a duplicate-cluster id) the WHOLE group moves
    as a unit — the leakage-safe posture (cf. ``leakage_safe_split``):
    near-duplicates can never straddle the train/eval boundary."""
    from scache_spark.functions import hash64

    key = F.col(group_col) if group_col else F.col(id_col)
    pct = F.pmod(
        hash64(F.concat(F.lit(f"{salt}:"), key.cast("string"))), F.lit(100)
    )
    split = (
        F.when(pct < test_pct, F.lit("test"))
        .when(pct < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def bm25_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k retrieval for one query over an arbitrary corpus.

    Returns ``(id_col, bm25)`` for the k best documents.  Plan shape:
    text tokenizes map-side to (id, tok, tf); corpus stats (N, avgdl)
    are a broadcast 1-row aggregate; the term join broadcasts the
    literal query frame; top-k is TakeOrderedAndProject on the
    ROUNDED score (total order, ties by id).
    """
    spark = df.sparkSession
    tf = (
        df.select(F.col(id_col), F.explode(F.split(F.lower(text_col), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dlen = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dlen.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    q = spark.createDataFrame([(t.lower(),) for t in query_terms], ["tok"]).join(
        dfreq, "tok"
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    sat = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(q), "tok")
        .join(dlen, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * sat), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: DataFrame,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup-style near-duplicate detection blocked by nearest
    centroid (``centroids``: (cell, centroid) — e.g. k-means output).

    Each duplicate maps to the MIN surviving id among its >=threshold
    within-cell partners.  Assignment is a broadcast-K min-struct
    aggregate (the corpus never shuffles for it); norms precompute
    before the pair join so each pair costs one dot product.
    """
    from scache_spark.functions import vec_dot, vec_norm

    diffs = F.zip_with(
        F.col(vec_col),
        F.col("centroid"),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    d2 = F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
    scored = df.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col), F.col(vec_col), F.col("cell"), d2.alias("d2")
    )
    assigned = (
        scored.groupBy(id_col, vec_col)
        .agg(F.min(F.struct("d2", "cell")).alias("best"))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("best.cell").alias("cell"),
            vec_norm(F.col(vec_col)).alias("nrm"),
        )
    )
    a = assigned.select(
        F.col("cell"),
        F.col(id_col).alias("keep_id"),
        F.col(vec_col).alias("_va"),
        F.col("nrm").alias("_na"),
    )
    bb = assigned.select(
        F.col("cell").alias("_cb"),
        F.col(id_col).alias("dup_id"),
        F.col(vec_col).alias("_vb"),
        F.col("nrm").alias("_nb"),
    )
    pairs = (
        a.join(bb, (F.col("cell") == F.col("_cb")) & (F.col("keep_id") < F.col("dup_id")))
        .select(
            "dup_id",
            "cell",
            "keep_id",
            (vec_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= threshold)
    )
    return pairs.groupBy("dup_id", "cell").agg(
        F.min("keep_id").alias("canonical_id"), F.round(F.max("cos"), 6).alias("max_cosine")
    )


def span_dedup_rewrite(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    span_tokens: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """C4-style corpus REWRITE: remove every ``span_tokens``-token
    span that occurs in >= ``min_docs`` distinct documents from all
    but the lowest-id occurrence, and return (id_col, text_col) with
    the rewritten text (surviving spans rejoined in order).

    Scale shape (cf. the oracle-checked ``corpus.dedup_span_rewrite``,
    which reports the same pass as per-doc accounting): one explode,
    one span-frequency aggregate whose state is distinct spans (never
    pairs), one shuffle join back on span, one per-doc ordered
    reassembly — no pair space, no window over the corpus.
    """
    toks = F.split(F.lower(F.col(text_col)), " ")
    segs = F.transform(
        F.sequence(F.lit(1), F.size(toks), F.lit(span_tokens)),
        lambda s: F.concat_ws(" ", F.slice(toks, s, span_tokens)),
    )
    seg = df.select(
        F.col(id_col), F.posexplode(segs).alias("__idx", "__seg")
    )
    freq = seg.groupBy("__seg").agg(
        F.countDistinct(id_col).alias("__nd"),
        F.min(id_col).alias("__keeper"),
    )
    kept = seg.join(freq, "__seg").filter(
        (F.col("__nd") < min_docs) | (F.col(id_col) == F.col("__keeper"))
    )
    rewritten = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__seg"))),
                lambda s: s["__seg"],
            ),
        ).alias(text_col)
    )
    # A document whose EVERY span was removed has no surviving rows in
    # kept — left-join the rewrite back onto the input ids so such docs
    # come back with empty text instead of silently vanishing from
    # downstream inner joins.
    return (
        df.select(id_col)
        .distinct()
        .join(rewritten, id_col, "left")
        .select(id_col, F.coalesce(F.col(text_col), F.lit("")).alias(text_col))
    )


def dsir_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    is_target: Column,
    *,
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR importance weight (Xie et al. 2023) of every document
    against the target subset selected by ``is_target``: hashed-unigram
    bucket counts, add-one smoothed, per-doc sum of ln(p_t/p_r).
    Returns (id_col, log_weight); rank descending and keep the head to
    importance-resample.  Model state is one ``n_buckets``-row
    broadcast; everything else partial-aggregates (cf. the
    oracle-checked ``corpus.dsir_importance_weights``)."""
    from scache_spark.functions import hash64

    feat = df.select(
        F.col(id_col),
        is_target.alias("__t"),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("__w"),
    ).select(id_col, "__t", (hash64("__w") % n_buckets).alias("__b"))
    counts = feat.groupBy("__b").agg(
        F.sum(F.when(F.col("__t"), 1).otherwise(0)).alias("__ct"),
        F.count(F.lit(1)).alias("__cr"),
    )
    totals = counts.agg(F.sum("__ct").alias("__nt"), F.sum("__cr").alias("__nr"))
    ratios = counts.crossJoin(F.broadcast(totals)).select(
        "__b",
        (
            F.log((F.col("__ct") + 1.0) / (F.col("__nt") + n_buckets))
            - F.log((F.col("__cr") + 1.0) / (F.col("__nr") + n_buckets))
        ).alias("__lr"),
    )
    return (
        feat.join(F.broadcast(ratios), "__b")
        .groupBy(id_col)
        .agg(F.round(F.sum("__lr"), 6).alias("log_weight"))
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    fine_bins: int = 512,
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): score each
    document's unigram-LM surprisal against the corpus itself and
    assign it to the 'head' / 'middle' / 'tail' third of the
    distribution.  Returns (id_col, surprisal, bucket).

    The tertile boundaries need NO global sort: surprisals land in
    ``fine_bins`` equal-width bins (broadcast min/max), the tiny
    cumulative histogram maps bins to tertiles with integer
    arithmetic, and docs join the bin->bucket map broadcast (cf. the
    oracle-checked ``corpus.ccnet_perplexity_buckets``)."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("__w")
    )
    vocab = toks.groupBy("__w").agg(F.count(F.lit(1)).alias("__n"))
    total = toks.agg(F.count(F.lit(1)).alias("__nt"))
    perdoc = (
        toks.join(F.broadcast(vocab), "__w")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.round(F.avg(-F.log(F.col("__n") * 1.0 / F.col("__nt"))), 6).alias(
                "surprisal"
            )
        )
        # materialized once: four downstream branches would otherwise
        # recompute the tokenize+vocab-join subtree (cf. the registry
        # twin ccnet_perplexity_buckets)
        .localCheckpoint(eager=True)
    )
    rng = perdoc.agg(F.min("surprisal").alias("__mn"), F.max("surprisal").alias("__mx"))
    # degenerate distribution guard: with mn == mx a zero bin width
    # divides 0/0 (non-ANSI NULL, collapsed to the last bin => every
    # doc silently 'tail'); the epsilon floor keeps the arithmetic
    # finite, and the __deg flag short-circuits the single-value case
    # to 'head' (a corpus with one quality level IS its own head)
    width = F.greatest(
        (F.col("__mx") - F.col("__mn")), F.lit(1e-12)
    ) / float(fine_bins)
    binned = perdoc.crossJoin(F.broadcast(rng)).select(
        id_col,
        "surprisal",
        F.least(
            F.floor((F.col("surprisal") - F.col("__mn")) / width),
            F.lit(fine_bins - 1),
        )
        .cast("int")
        .alias("__bin"),
        (F.col("__mx") == F.col("__mn")).alias("__deg"),
    )
    hist = binned.groupBy("__bin").agg(F.count(F.lit(1)).alias("__c"))
    from scache_spark.functions import bounded_window

    cum = hist.select(
        "__bin",
        F.sum("__c")
        .over(
            bounded_window("__bin", "__bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("__cum"),
    )
    tot = hist.agg(F.sum("__c").alias("__n"))
    tert = F.expr("CAST((3 * __cum + __n - 1) div __n AS INT)")
    bmap = cum.crossJoin(F.broadcast(tot)).select(
        "__bin",
        F.when(tert == 1, "head").when(tert == 2, "middle").otherwise("tail").alias(
            "bucket"
        ),
    )
    return binned.join(F.broadcast(bmap), "__bin").select(
        id_col,
        "surprisal",
        F.when(F.col("__deg"), "head").otherwise(F.col("bucket")).alias("bucket"),
    )


def _cms_cell(col: Column, row: int, width: int) -> Column:
    """md5-derived counter index for one sketch row (the same hash
    family the registry's ``heavy_hitters_cms`` oracle replicates)."""
    h = F.conv(
        F.substring(salted_md5(col.cast("string"), row), 1, 15), 16, 10
    ).cast("long")
    return (h % width).cast("int")


def cms_sketch(
    df: DataFrame, key_col: str, rows: int = 3, width: int = 256
) -> DataFrame:
    """Count-Min sketch of a key stream: ``(r, cell, cnt)``.

    Scale shape: the ``rows`` increments per occurrence explode
    in-map and the aggregate map-side-combines down to at most
    ``rows * width`` partials per partition — the shuffle ships KB
    regardless of stream size, and two sketches built with the same
    (rows, width) MERGE by summing matching cells (so shards sign
    independently, cf. ``minhash_merge_property``).  Worst-case
    overcount is ~e/width of the stream length at confidence
    1 - e^-rows (Cormode-Muthukrishnan 2005).
    """
    incs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_cell(F.col(key_col), r, width).alias("cell"),
                    )
                    for r in range(rows)
                ]
            )
        ).alias("rc")
    )
    return incs.groupBy(
        F.col("rc.r").alias("r"), F.col("rc.cell").alias("cell")
    ).agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    rows: int = 3,
    width: int = 256,
) -> DataFrame:
    """Frequency estimates (``est_cnt`` column appended to ``keys``)
    from a ``cms_sketch`` built with the same (rows, width).

    The sketch is at most ``rows * width`` cells → BROADCAST; the
    probe is a map-side join + min-over-rows aggregate grouped by
    the key frame's columns.  Estimates are one-sided:
    est_cnt >= true count, always.  Keys absent from the stream may
    still read > 0 (hash collisions) — the CMS contract.

    ``keys`` rows are expected DISTINCT over its columns (the final
    groupBy collapses duplicates); the sketch's columns are aliased to
    reserved ``__cms_*`` names before the join, so a keys frame may
    freely carry columns named r / cell / cnt.
    """
    probe_cols = keys.columns
    probes = keys.select(
        *probe_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        _cms_cell(F.col(key_col), r, width).alias("cell"),
                    )
                    for r in range(rows)
                ]
            )
        ).alias("__cms_rc"),
    )
    sk = sketch.select(
        F.col("r").alias("__cms_r"),
        F.col("cell").alias("__cms_cell"),
        F.col("cnt").alias("__cms_cnt"),
    )
    return (
        probes.join(
            F.broadcast(sk),
            (F.col("__cms_rc.r") == F.col("__cms_r"))
            & (F.col("__cms_rc.cell") == F.col("__cms_cell")),
            "left",
        )
        .groupBy(*probe_cols)
        .agg(F.min(F.coalesce(F.col("__cms_cnt"), F.lit(0))).alias("est_cnt"))
    )


def edit_distance_pairs(
    df: DataFrame, id_col: str, text_col: str, *, max_dist: int = 1
) -> DataFrame:
    """All pairs within ``max_dist`` Levenshtein edits, without a
    blocking key and without the O(n²) pair space (FastSS deletion
    neighborhoods; cf. registry ``fastss_edit1_pairs``).

    Candidate generation is EXACT for distance <= 1: two strings are
    within one edit iff their {self} ∪ {single-character deletions}
    variant sets intersect, so candidates come from an equi-join on
    O(n·L) variant keys (codegen substr/transform — no UDF) and a
    levenshtein verify touches only survivors.  Verify cost scales
    with true-near-match density, not corpus size².  Only
    ``max_dist=1`` is supported: k-deletion neighborhoods grow
    O(L^k) per string, a different cost regime the caller should opt
    into via repeated application or LSH instead.

    Edit distance is defined over UTF-8 BYTES (SCALE.md §16): the
    verify runs on a byte-faithful latin-1 decode of the UTF-8
    encoding, so ASCII pairs behave as expected and an é-for-e
    substitution costs 2 — the locale-free definition engines agree
    on (DuckDB's levenshtein is byte-based; Spark's is code-point-
    based).  Char-deletion candidates remain complete for byte
    distance <= 1: between valid UTF-8 strings, a single-byte edit
    is always a single-ASCII-char edit.

    Returns (id_a, id_b, edit_dist) with id_a < id_b, duplicates
    collapsed.  NULL text never joins (variant key of NULL is NULL).
    """
    if max_dist != 1:
        raise ValueError(
            f"edit_distance_pairs supports max_dist=1 only, got {max_dist}"
            " — deletion neighborhoods grow O(L^k); use minhash_pairs"
            " for looser similarity"
        )
    s = F.col(text_col)
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            s.substr(F.lit(1), i - F.lit(1)),
            s.substr(i + F.lit(1), F.length(s)),
        ),
    )
    variants = df.select(
        F.col(id_col).alias("__k"),
        s.alias("__nm"),
        F.explode(F.array_distinct(F.array_append(dels, s))).alias("__v"),
    )
    other = variants.select(
        F.col("__k").alias("__k2"), F.col("__nm").alias("__nm2"), F.col("__v")
    )
    byte_dist = F.levenshtein(
        F.decode(F.encode(F.col("__nm"), "UTF-8"), "ISO-8859-1"),
        F.decode(F.encode(F.col("__nm2"), "UTF-8"), "ISO-8859-1"),
    )
    return (
        variants.join(other, "__v")
        .where(F.col("__k") < F.col("__k2"))
        .select("__k", "__k2", "__nm", "__nm2")
        .distinct()
        .where(byte_dist <= max_dist)
        .select(
            F.col("__k").alias("id_a"),
            F.col("__k2").alias("id_b"),
            byte_dist.cast("int").alias("edit_dist"),
        )
    )


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows not strictly dominated when MAXIMIZING both ``x_col`` and
    ``y_col`` — the 2-D Pareto frontier (cf. registry
    ``pareto_frontier_docs``).

    O(n log n), never a self-join: fold to one (x, max y) row per
    distinct x, then one ROWS window ordered by x DESC — the running
    max over the 1-PRECEDING frame is the best y among STRICTLY
    larger x (each row is a distinct x, so a ROWS offset is exact for
    any orderable metric type, where a RANGE -1 frame would be wrong
    for non-integer x).  A row is on the frontier iff its y equals
    its x-group's max and beats every larger-x max.  Ties share the
    frontier (equal-metric rows do not dominate each other).  The
    per-x frame is metric-resolution-bounded, far below row count at
    scale; rows with NULL in either metric are excluded (dominance
    is undefined on NULL).
    """
    m = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    per_x = m.groupBy(x_col).agg(F.max(y_col).alias("__ymax"))
    w_gt = (
        Window.partitionBy(F.pmod(F.hash(x_col), F.lit(1)))
        .orderBy(F.col(x_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_x.select(
            x_col,
            "__ymax",
            F.max("__ymax").over(w_gt).alias("__best_gt"),
        )
        .where(
            F.col("__best_gt").isNull() | (F.col("__best_gt") < F.col("__ymax"))
        )
        .select(x_col, F.col("__ymax").alias(y_col))
    )
    return m.join(frontier, [x_col, y_col])


def auc_rank(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """Exact tie-corrected Mann-Whitney ROC-AUC of ``score_col``
    against binary ``label_col`` — one row ``(auc, gini, np, nn)``
    (cf. registry ``classifier_auc_rank``, which adds the decile ROC
    operating points over the fixture's quality score).

    The frame folds map-side to one (score, n, n_pos) row per
    DISTINCT score; average ranks come from a DISTRIBUTED midrank
    prefix sum (r9 — distinct-score cardinality is caller-controlled
    and may be SF-proportional, so no global window): scores bucket
    by a sign-aware log-scale key (monotone in the score because
    ``java.lang.Math.log`` is semi-monotonic; ~1.57% relative width,
    hard-capped at ~382k possible buckets independent of data),
    cumsums run within each bucket in parallel, and a broadcast
    bucket-total prefix table supplies cross-bucket offsets — the
    same integers as a naive global cumulative, since the bucket
    never splits a tie and never reorders the total order.  Ties get
    the midrank and AUC = (R+ - np(np+1)/2) / (np*nn).  Single-class
    input (np or nn zero) returns NULL auc/gini rather than dividing
    by zero; rows with NULL score, NaN score, or NULL label are
    excluded (rank is undefined on NULL, and NaN has no place on a
    score axis).
    """
    qc = F.col(score_col).cast("double")
    m = df.where(
        F.col(score_col).isNotNull()
        & ~F.isnan(qc)
        & F.col(label_col).isNotNull()
    )
    by_q = (
        m.groupBy(qc.alias("__q"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.col(label_col).cast("long")).cast("long").alias("__np"),
        )
        # feeds two branches (within-bucket cumsums + bucket totals);
        # truncate lineage so the caller's input plan runs once
        .localCheckpoint(eager=False)
    )
    # Order-preserving bucket of an arbitrary double: floor(256*ln|q|)
    # per sign half, clamped so +/-Infinity land in the extreme normal
    # buckets (merging values into one bucket is always safe — the
    # within-bucket window still orders by exact q; only monotonicity
    # and same-q-same-bucket matter).  Offsets: ln|q| spans [-745, 710]
    # over all finite doubles, so |floor(256*ln|q|)| <= 192000 and a
    # +/-400000 shift keeps neg < 0-bucket < pos strictly ordered.
    lnb = F.floor(
        F.greatest(
            F.least(
                F.lit(256.0) * F.log(F.abs(F.col("__q"))),
                F.lit(192000.0),
            ),
            F.lit(-192000.0),
        )
    ).cast("long")
    b = by_q.withColumn(
        "__bkt",
        F.when(F.col("__q") > 0, lnb + F.lit(400000))
        .when(F.col("__q") < 0, -lnb - F.lit(400000))
        .otherwise(F.lit(0))
        .cast("long"),
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy("__q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = b.withColumn(
        "__cum_in", F.coalesce(F.sum("__n").over(w_in), F.lit(0)).cast("long")
    )
    btot = b.groupBy("__bkt").agg(F.sum("__n").cast("long").alias("__btot"))
    w_off = bounded_window("__bkt", "__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        "__bkt",
        F.coalesce(F.sum("__btot").over(w_off), F.lit(0))
        .cast("long")
        .alias("__off"),
    )
    ranked = within.join(F.broadcast(offsets), "__bkt").select(
        "__n",
        "__np",
        (F.col("__off") + F.col("__cum_in")).cast("long").alias("__cum"),
    )
    tot = ranked.agg(
        F.sum(
            F.col("__np").cast("double")
            * (F.col("__cum") + (F.col("__n") + 1) / 2.0)
        ).alias("__rpos"),
        F.sum("__np").cast("long").alias("np"),
        (F.sum("__n") - F.sum("__np")).cast("long").alias("nn"),
    )
    auc = F.when((F.col("np") == 0) | (F.col("nn") == 0), F.lit(None)).otherwise(
        (F.col("__rpos") - F.col("np").cast("double") * (F.col("np") + 1) / 2.0)
        / (F.col("np").cast("double") * F.col("nn"))
    )
    return tot.select(
        auc.alias("auc"),
        (2.0 * auc - 1.0).alias("gini"),
        "np",
        "nn",
    )
