"""Text analysis for LLM data pipelines (SURVEY.md §2 B24,
north-star): token statistics, language-ID heuristic, quality scoring,
document fingerprinting, regex token counting.

All pure built-in expressions (split/regexp/higher-order functions) —
the whole module is one narrow projection per query, no shuffle except
final aggregates, no UDFs.  Reference grounding: log-parsing regexes
(sim/train.py:64-90) and block-id string parsing
(storage/BlockId.scala:98-131) are the reference's only text ops;
these queries generalize that surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scache_spark.catalog import load_table
from scache_spark.registry import register

# Tiny function-word lists per language for the n-gram/stopword
# heuristic.  (Fixture text is synthetic word salad, so the heuristic's
# *accuracy* is meaningless — its mechanics are what's under test.)
_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "et", "de", "un"],
}


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


@register(
    "text_token_stats",
    oracle="""
    WITH toks AS (SELECT doc_id, lang, n_chars,
                         string_split(lower(text), ' ') AS t
                  FROM documents)
    SELECT doc_id, lang,
           CAST(len(t) AS INT) AS n_tokens,
           CAST(len(list_distinct(t)) AS INT) AS n_unique,
           CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
           list_aggregate([CAST(length(w) AS DOUBLE) for w in t], 'sum') / len(t)
               AS avg_token_len,
           n_chars
    FROM toks
    """,
    tags=("B24", "B14"),
    doc="Per-doc token statistics: count, unique, type-token ratio, "
    "mean token length.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower("text"), " ")
    d = d.select("doc_id", "lang", "n_chars", t.alias("t"))
    return d.select(
        "doc_id",
        "lang",
        F.size("t").cast("int").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("int").alias("n_unique"),
        (F.size(F.array_distinct("t")).cast("double") / F.size("t")).alias("ttr"),
        (
            F.aggregate(
                F.transform(F.col("t"), lambda w: F.length(w).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.size("t")
        ).alias("avg_token_len"),
        "n_chars",
    )


@register(
    "text_langid",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang,
                         string_split(lower(text), ' ') AS t
                  FROM documents),
    scored AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(t, w -> list_contains({_sql_list(_STOPWORDS["en"])}, w))) AS DOUBLE) / len(t) AS score_en,
             CAST(len(list_filter(t, w -> list_contains({_sql_list(_STOPWORDS["es"])}, w))) AS DOUBLE) / len(t) AS score_es,
             CAST(len(list_filter(t, w -> list_contains({_sql_list(_STOPWORDS["fr"])}, w))) AS DOUBLE) / len(t) AS score_fr
      FROM toks)
    SELECT doc_id, lang, score_en, score_es, score_fr,
           CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en > 0
                  THEN 'en'
                WHEN score_es >= score_fr AND score_es > 0 THEN 'es'
                WHEN score_fr > 0 THEN 'fr'
                ELSE 'und' END AS predicted
    FROM scored
    """,
    tags=("B24",),
    doc="Stopword-ratio language-ID heuristic with deterministic "
    "argmax tie-break (en > es > fr > und).",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.lower("text"), " ")

    def score(lang: str):
        wl = [F.lit(w) for w in _STOPWORDS[lang]]
        return F.size(
            F.filter(F.col("t"), lambda w: w.isin([x for x in _STOPWORDS[lang]]))
        ).cast("double") / F.size("t")

    scored = d.select("doc_id", "lang", t.alias("t")).select(
        "doc_id",
        "lang",
        score("en").alias("score_en"),
        score("es").alias("score_es"),
        score("fr").alias("score_fr"),
    )
    return scored.select(
        "doc_id",
        "lang",
        "score_en",
        "score_es",
        "score_fr",
        F.when(
            (F.col("score_en") >= F.col("score_es"))
            & (F.col("score_en") >= F.col("score_fr"))
            & (F.col("score_en") > 0),
            "en",
        )
        .when((F.col("score_es") >= F.col("score_fr")) & (F.col("score_es") > 0), "es")
        .when(F.col("score_fr") > 0, "fr")
        .otherwise("und")
        .alias("predicted"),
    )


def _quality_feats(d: DataFrame) -> DataFrame:
    """(n_len, n_tok, n_nonalpha, n_stop) over null-safe text — the
    shared feature block of the quality family.  coalesce(text, '')
    makes NULL text behave as empty (n_len 0), which the guarded
    score maps to quality 0.0 / 'drop'."""
    t = F.coalesce(F.col("text"), F.lit(""))
    lower_t = F.split(F.lower(t), " ")
    return d.select(
        "*",
        F.coalesce(F.length("text"), F.lit(0)).cast("int").alias("n_len"),
        F.size(F.split(t, " ")).cast("int").alias("n_tok"),
        F.size(F.regexp_extract_all(t, F.lit("[^a-z ]"), 0))
        .cast("int")
        .alias("n_nonalpha"),
        F.size(
            F.filter(lower_t, lambda w: w.isin(["the", "a", "of", "and", "to"]))
        )
        .cast("int")
        .alias("n_stop"),
    )


def _quality_expr():
    """Guarded score: 0.0 for empty/null docs (ANSI-safe — the raw
    formula divides by n_len)."""
    raw = (
        0.4 * F.least(F.col("n_tok").cast("double") / 100.0, F.lit(1.0))
        + 0.4 * (F.col("n_stop").cast("double") / F.col("n_tok"))
        + 0.2 * (1.0 - F.col("n_nonalpha").cast("double") / F.col("n_len"))
    )
    return F.when(F.col("n_len") == 0, F.lit(0.0)).otherwise(raw)


@register(
    "text_quality_score",
    oracle="""
    WITH feats AS (
      SELECT doc_id, source,
             CAST(coalesce(length(text), 0) AS INT) AS n_len,
             CAST(len(string_split(coalesce(text, ''), ' ')) AS INT) AS n_tok,
             CAST(len(regexp_extract_all(coalesce(text, ''), '[^a-z ]')) AS INT)
                 AS n_nonalpha,
             CAST(len(list_filter(string_split(lower(coalesce(text, '')), ' '),
                  w -> list_contains(['the','a','of','and','to'], w))) AS INT)
                 AS n_stop
      FROM documents),
    scored AS (
      SELECT *,
             CASE WHEN n_len = 0 THEN 0.0
                  ELSE CAST(n_nonalpha AS DOUBLE) / n_len END AS punct_ratio,
             CASE WHEN n_len = 0 THEN 0.0
                  ELSE CAST(n_stop AS DOUBLE) / n_tok END AS stop_ratio,
             CASE WHEN n_len = 0 THEN 0.0
                  ELSE (0.4 * least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
                        + 0.4 * (CAST(n_stop AS DOUBLE) / n_tok)
                        + 0.2 * (1.0 - CAST(n_nonalpha AS DOUBLE) / n_len))
             END AS quality
      FROM feats)
    SELECT doc_id, source, n_len, n_tok, punct_ratio, stop_ratio, quality,
           CASE WHEN quality >= 0.5 THEN 'keep' ELSE 'drop' END AS tier
    FROM scored
    """,
    tags=("B24",),
    doc="Heuristic quality score: length + stopword-density + "
    "punctuation terms, with a keep/drop gate — the C4-style filter "
    "shape.  Dirty-input contract (r6, SCALE_STRESS_dirty.json): "
    "null/empty text scores 0.0 and tiers 'drop' — a quality FILTER "
    "must gate garbage, not crash on it (the unguarded ratio divided "
    "by zero under ANSI mode).",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _quality_feats(
        load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    )
    zero_safe = lambda num, den: F.when(  # noqa: E731
        F.col("n_len") == 0, F.lit(0.0)
    ).otherwise(F.col(num).cast("double") / F.col(den))
    quality = _quality_expr()
    return feats.select(
        "doc_id",
        "source",
        "n_len",
        "n_tok",
        zero_safe("n_nonalpha", "n_len").alias("punct_ratio"),
        zero_safe("n_stop", "n_tok").alias("stop_ratio"),
        quality.alias("quality"),
        F.when(quality >= 0.5, "keep").otherwise("drop").alias("tier"),
    )


_ECE_FEATS_SQL = """
    feats AS (
      SELECT doc_id,
             CAST(coalesce(length(text), 0) AS INT) AS n_len,
             CAST(len(string_split(coalesce(text, ''), ' ')) AS INT) AS n_tok,
             CAST(len(regexp_extract_all(coalesce(text, ''), '[^a-z ]')) AS INT)
                 AS n_nonalpha,
             CAST(len(list_filter(string_split(lower(coalesce(text, '')), ' '),
                  w -> list_contains(['the','a','of','and','to'], w))) AS INT)
                 AS n_stop
      FROM documents),
    scored AS (
      SELECT doc_id,
             CASE WHEN n_len = 0 THEN 0.0
                  ELSE (0.4 * least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
                        + 0.4 * (CAST(n_stop AS DOUBLE) / n_tok)
                        + 0.2 * (1.0 - CAST(n_nonalpha AS DOUBLE) / n_len))
             END AS q,
             CASE WHEN n_tok >= 60 AND n_len > 0 THEN 1 ELSE 0 END AS label
      FROM feats),
    bucketed AS (
      SELECT CAST(least(CAST(floor(q * 10) AS INT), 9) AS INT)
                 AS bucket, q, label
      FROM scored),
    bstats AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS n_docs,
             avg(q) AS conf_raw,
             avg(CAST(label AS DOUBLE)) AS acc_raw
      FROM bucketed GROUP BY bucket)
"""


@register(
    "quality_calibration_ece",
    oracle=f"""
    WITH {_ECE_FEATS_SQL}
    SELECT b.bucket, b.n_docs,
           round(b.conf_raw, 6) AS conf,
           round(b.acc_raw, 6) AS acc,
           round(abs(b.acc_raw - b.conf_raw), 6) AS gap,
           round(e.ece_raw, 6) AS ece
    FROM bstats b
    CROSS JOIN (
      SELECT sum(CAST(n_docs AS DOUBLE) * abs(acc_raw - conf_raw))
             / sum(n_docs) AS ece_raw
      FROM bstats) e
    """,
    tags=("B24", "B20", "B19"),
    doc="Quality-classifier CALIBRATION audit — the gate check before "
    "classifier-based corpus filtering (the FineWeb-Edu / CCNet-LM "
    "pattern: a scored corpus is cut at a threshold, so a score that "
    "is not calibrated silently biases the cut).  The heuristic "
    "quality score is read as a keep-probability, reliability is "
    "measured against a deterministic proxy target (n_tok >= 60), "
    "and the standard reliability diagram drops out: per score "
    "decile, count / mean confidence / empirical accuracy / |gap|, "
    "plus the Expected Calibration Error (bucket-weighted mean gap) "
    "broadcast-crossed onto every row.  Scale: one scan folds to 10 "
    "bucket rows map-side; ECE is an aggregate OF the bucket frame — "
    "the 100 TB corpus contributes exactly 10 rows past the first "
    "shuffle, and the 1-row ECE side is a broadcast.",
)
def quality_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _quality_feats(
        load_table(spark, sf_dir, "documents").select("text")
    )
    scored = feats.select(
        _quality_expr().alias("q"),
        F.when((F.col("n_tok") >= 60) & (F.col("n_len") > 0), 1)
        .otherwise(0)
        .alias("label"),
    )
    bstats = (
        scored.select(
            F.least(F.floor(F.col("q") * 10).cast("int"), F.lit(9)).alias("bucket"),
            "q",
            "label",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.avg("q").alias("conf_raw"),
            F.avg(F.col("label").cast("double")).alias("acc_raw"),
        )
        # two consumers (the rows + the ECE aggregate) would re-scan
        # the corpus subtree twice; materialize the 10-row frame once
        .localCheckpoint(eager=True)
    )
    ece = bstats.agg(
        (
            F.sum(
                F.col("n_docs").cast("double")
                * F.abs(F.col("acc_raw") - F.col("conf_raw"))
            )
            / F.sum("n_docs")
        ).alias("ece_raw")
    )
    return bstats.crossJoin(F.broadcast(ece)).select(
        "bucket",
        "n_docs",
        F.round("conf_raw", 6).alias("conf"),
        F.round("acc_raw", 6).alias("acc"),
        F.round(F.abs(F.col("acc_raw") - F.col("conf_raw")), 6).alias("gap"),
        F.round("ece_raw", 6).alias("ece"),
    )


@register(
    "classifier_auc_rank",
    oracle="""
    WITH feats AS (
      SELECT CAST(coalesce(length(text), 0) AS INT) AS n_len,
             CAST(len(string_split(coalesce(text, ''), ' ')) AS INT) AS n_tok,
             CAST(len(regexp_extract_all(coalesce(text, ''), '[^a-z ]')) AS INT)
                 AS n_nonalpha,
             CAST(len(list_filter(string_split(lower(coalesce(text, '')), ' '),
                  w -> list_contains(['the','a','of','and','to'], w))) AS INT)
                 AS n_stop
      FROM documents),
    scored AS (
      SELECT CASE WHEN n_len = 0 THEN 0.0
                  ELSE (0.4 * least(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
                        + 0.4 * (CAST(n_stop AS DOUBLE) / n_tok)
                        + 0.2 * (1.0 - CAST(n_nonalpha AS DOUBLE) / n_len))
             END AS q,
             CASE WHEN n_tok >= 60 AND n_len > 0 THEN 1 ELSE 0 END AS label
      FROM feats),
    by_q AS (
      SELECT q, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(label) AS BIGINT) AS n_pos
      FROM scored GROUP BY q),
    ranked AS (
      SELECT q, n, n_pos,
             CAST(coalesce(sum(n) OVER (ORDER BY q
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
      FROM by_q),
    tot AS (
      SELECT sum(CAST(n_pos AS DOUBLE) * (cum_before + (n + 1) / 2.0))
                 AS r_pos,
             CAST(sum(n_pos) AS BIGINT) AS np,
             CAST(sum(n) - sum(n_pos) AS BIGINT) AS nn
      FROM ranked),
    auc AS (
      SELECT CASE WHEN np = 0 OR nn = 0 THEN NULL
                  ELSE (r_pos - CAST(np AS DOUBLE) * (np + 1) / 2.0)
                       / (CAST(np AS DOUBLE) * nn) END AS auc_raw,
             np, nn
      FROM tot),
    dec AS (
      SELECT CAST(least(CAST(floor(q * 10) AS INT), 9) AS INT) AS bucket,
             CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(n_pos) AS BIGINT) AS n_pos
      FROM by_q GROUP BY bucket),
    roc AS (
      SELECT bucket,
             CAST(sum(n) OVER (ORDER BY bucket DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_ge,
             CAST(sum(n_pos) OVER (ORDER BY bucket DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS pos_ge
      FROM dec)
    SELECT r.bucket,
           round(r.bucket / 10.0, 1) AS cutoff,
           r.n_ge,
           CASE WHEN a.np = 0 THEN NULL
                ELSE round(CAST(r.pos_ge AS DOUBLE) / a.np, 6) END AS tpr,
           CASE WHEN a.nn = 0 THEN NULL
                ELSE round(CAST(r.n_ge - r.pos_ge AS DOUBLE) / a.nn, 6)
                END AS fpr,
           CASE WHEN r.n_ge = 0 THEN NULL
                ELSE round(CAST(r.pos_ge AS DOUBLE) / r.n_ge, 6)
                END AS prec,
           round(a.auc_raw, 6) AS auc,
           round(2.0 * a.auc_raw - 1.0, 6) AS gini
    FROM roc r CROSS JOIN auc a
    """,
    tags=("B24", "B20", "B11"),
    doc="Classifier RANKING audit — exact tie-corrected Mann-Whitney "
    "ROC-AUC plus the decile ROC operating points, the discrimination "
    "companion to quality_calibration_ece's calibration check (a "
    "corpus-filter classifier needs BOTH before its threshold is "
    "trusted).  The quality score is ranked against the same "
    "deterministic proxy target (n_tok >= 60): scores collapse to a "
    "(q, n, n_pos) distinct-score frame, average ranks come from one "
    "cumulative window over that frame (ties get the midrank, the "
    "textbook correction), and AUC = (R+ - np(np+1)/2) / (np*nn).  "
    "Per decile cutoff the suffix-cumulative counts give TPR / FPR / "
    "precision; AUC and Gini broadcast onto every row.  Degenerate "
    "corpora guard: single-class input yields NULL AUC, empty "
    "shortlists yield NULL precision — no division by zero in either "
    "engine.  Scale: one corpus scan folds map-side to the distinct-"
    "score frame, but that frame is NOT hard-bounded (the score is a "
    "continuous double over unbounded integer-ratio features — "
    "distinct-q grows with distinct feature tuples), so the midrank "
    "cumulative is a DISTRIBUTED prefix sum (r9): the score buckets "
    "into 4096 fixed [0,1) ranges (bucket is monotone in q, so the "
    "total order is unchanged), cumsums run WITHIN each bucket in "
    "parallel, and a broadcast 4096-row bucket-total prefix table "
    "supplies the cross-bucket offsets — same integers as the naive "
    "global window the oracle uses, but no unpartitioned window over "
    "an SF-proportional frame anywhere in the plan.  The 10-row "
    "decile window stays global by contract (bounded frame).",
)
def classifier_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from scache_spark.functions import bounded_window

    feats = _quality_feats(
        load_table(spark, sf_dir, "documents").select("text")
    )
    scored = feats.select(
        _quality_expr().alias("q"),
        F.when((F.col("n_tok") >= 60) & (F.col("n_len") > 0), 1)
        .otherwise(0)
        .alias("label"),
    )
    # distinct-score frame: the only pass over the corpus; both the
    # rank-sum AUC and the decile ROC derive from this frame (it is
    # far smaller than the corpus but still grows with distinct
    # feature tuples — treat it as SF-proportional below).  The
    # bucket id is computed once, inside the checkpoint (r10 plan
    # shrink: it previously re-derived per consumer).
    by_q = (
        scored.groupBy("q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("label").cast("long").alias("n_pos"),
        )
        .withColumn(
            "bkt",
            F.least(F.floor(F.col("q") * 4096).cast("int"), F.lit(4095)),
        )
        .localCheckpoint(eager=True)
    )
    # Distributed midrank prefix sum: q is contractually in [0, 1]
    # (weighted sum of capped ratios), so 4096 fixed-width buckets
    # are monotone in q and same-q rows share a bucket; the
    # per-bucket window runs in parallel and only the 4096-row
    # bucket-partial table crosses a bounded single-partition window.
    # r10 plan shrink (§1.2 step 2 / r9-verdict item 5: 78% of this
    # query's local cost was driver plan construction): the rank-sum
    # distributes over the bucket offset —
    #   sum n_pos*(offset_b + cum_in + (n+1)/2)
    #     = offset_b * sum(n_pos) + sum(n_pos*(cum_in + (n+1)/2))
    # so the per-bucket PARTIALS (ra, np_b, n_b) fold map-side in the
    # same pass as the within-bucket window, and the cross-bucket
    # offset attaches to the 4096-row partial table instead of
    # broadcast-joining back onto the full distinct-score frame.  One
    # branch (btot), one join (offsets->ranked) and two projections
    # drop out of the plan; every addend is an exactly-representable
    # half-integer at any fixture SF, so the reassociation is
    # bit-exact against the oracle's row-level sum.
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pb = (
        by_q.withColumn(
            "cum_in", F.coalesce(F.sum("n").over(w_in), F.lit(0)).cast("long")
        )
        .groupBy("bkt")
        .agg(
            F.sum(
                F.col("n_pos").cast("double")
                * (F.col("cum_in") + (F.col("n") + 1) / 2.0)
            ).alias("ra"),
            F.sum("n_pos").cast("long").alias("np_b"),
            F.sum("n").cast("long").alias("n_b"),
        )
    )
    w_off = bounded_window("bkt", "bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = pb.withColumn(
        "offset",
        F.coalesce(F.sum("n_b").over(w_off), F.lit(0)).cast("long"),
    ).agg(
        F.sum(
            F.col("ra") + F.col("offset").cast("double") * F.col("np_b")
        ).alias("r_pos"),
        F.sum("np_b").cast("long").alias("np"),
        (F.sum("n_b") - F.sum("np_b")).cast("long").alias("nn"),
    )
    auc = tot.select(
        F.when(
            (F.col("np") == 0) | (F.col("nn") == 0), F.lit(None)
        )
        .otherwise(
            (
                F.col("r_pos")
                - F.col("np").cast("double") * (F.col("np") + 1) / 2.0
            )
            / (F.col("np").cast("double") * F.col("nn"))
        )
        .alias("auc_raw"),
        "np",
        "nn",
    )
    dec = (
        by_q.groupBy(
            F.least(F.floor(F.col("q") * 10).cast("int"), F.lit(9)).alias(
                "bucket"
            )
        )
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("n_pos").cast("long").alias("n_pos"),
        )
    )
    w_ge = bounded_window("bucket", F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    roc = dec.select(
        "bucket",
        F.sum("n").over(w_ge).cast("long").alias("n_ge"),
        F.sum("n_pos").over(w_ge).cast("long").alias("pos_ge"),
    )
    return roc.crossJoin(F.broadcast(auc)).select(
        "bucket",
        F.round(F.col("bucket") / 10.0, 1).alias("cutoff"),
        "n_ge",
        F.when(F.col("np") == 0, F.lit(None))
        .otherwise(F.round(F.col("pos_ge").cast("double") / F.col("np"), 6))
        .alias("tpr"),
        F.when(F.col("nn") == 0, F.lit(None))
        .otherwise(
            F.round(
                (F.col("n_ge") - F.col("pos_ge")).cast("double")
                / F.col("nn"),
                6,
            )
        )
        .alias("fpr"),
        F.when(F.col("n_ge") == 0, F.lit(None))
        .otherwise(F.round(F.col("pos_ge").cast("double") / F.col("n_ge"), 6))
        .alias("prec"),
        F.round("auc_raw", 6).alias("auc"),
        F.round(2.0 * F.col("auc_raw") - 1.0, 6).alias("gini"),
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(
                 string_split(lower(coalesce(text, '')), ' '))), ' '))
                 AS fingerprint
      FROM documents)
    SELECT fingerprint,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS keep_id
    FROM fp GROUP BY fingerprint
    """,
    tags=("B24",),
    doc="Order-insensitive document fingerprint (md5 of sorted distinct "
    "vocabulary): catches permuted/reshuffled duplicates exact "
    "hashing misses.  Null-safe (r6): NULL and whitespace-only docs "
    "share the empty fingerprint in BOTH engines (Spark's concat_ws "
    "silently maps a null array to '' while SQL || propagates NULL — "
    "the divergence the dirty-corpus stress caught).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(
                    F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), " ")
                )
            ),
        )
    )
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
    )


@register(
    "text_token_count_regex",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT)
               AS n_bpe_ish,
           CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS INT) AS n_len_est,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws
    FROM documents
    """,
    tags=("B24", "B14"),
    doc="Token counting three ways: BPE-ish regex segmentation, "
    "chars/4 estimate, whitespace split.",
)
def text_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast("int")
        .alias("n_bpe_ish"),
        F.ceil(F.length("text").cast("double") / 4.0).cast("int").alias("n_len_est"),
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_ws"),
    )


@register(
    "text_top_tokens",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                  FROM documents),
    counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS n,
                      CAST(count(DISTINCT doc_id) AS BIGINT) AS df
               FROM toks GROUP BY tok)
    SELECT * FROM (
      SELECT tok, n, df,
             CAST(row_number() OVER (ORDER BY n DESC, tok ASC) AS INT) AS rk
      FROM counts
    ) WHERE rk <= 20
    """,
    tags=("B24", "B10"),
    doc="Corpus heavy-hitters: top-20 tokens by frequency with document "
    "frequency — the vocabulary-stats pass of a data pipeline.  "
    "Explode → count is fully map-side-combined; the top-k is a real "
    "TakeOrderedAndProject (per-partition heaps — the vocabulary is "
    "never globally sorted or single-partition-windowed); the rank "
    "then numbers only the 20 survivors.",
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.functions import bounded_window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    top = counts.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(20)
    w = bounded_window("tok", F.col("n").desc(), F.col("tok").asc())
    return top.select(
        "tok", "n", "df", F.row_number().over(w).cast("int").alias("rk")
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
                  FROM documents),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY doc_id, tok),
    df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM toks GROUP BY tok),
    n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
    scored AS (
      SELECT tf.doc_id, tf.tok,
             tf.tf * ln(CAST(n_docs.n AS DOUBLE) / df.df) AS tfidf
      FROM tf JOIN df ON tf.tok = df.tok, n_docs
    )
    SELECT doc_id, tok, round(tfidf, 6) AS tfidf, rk FROM (
      SELECT doc_id, tok, tfidf,
             CAST(row_number() OVER (PARTITION BY doc_id
                  ORDER BY tfidf DESC, tok ASC) AS INT) AS rk
      FROM scored
    ) WHERE rk <= 3
    """,
    tags=("B24", "B11"),
    doc="TF-IDF with top-3 distinctive terms per document.  IDF is a "
    "broadcast-joined dictionary (vocabulary-sized, never the corpus); "
    "tie-broken per-doc top-k via window.  The corpus cardinality is a "
    "broadcast 1-row aggregate inside the SAME job — a driver-side "
    ".count() would be a second full corpus scan per run.  tfidf is "
    "rounded on both sides: ln() is not correctly rounded, so engines "
    "can differ in the last ulp per row.",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
    # Everything below derives from tf, so the corpus is scanned and
    # tokenized exactly ONCE (r3 judge measured 3 FileScans here before
    # this materialization): df is a row-count per token over tf —
    # (doc_id, tok) is unique post-groupBy, so count(*) == distinct
    # docs — and n_docs is a distinct-doc count over tf, mirrored
    # EXACTLY in the oracle (count over tf, not over documents): the
    # idf universe is "documents that tokenized" by definition, so a
    # NULL-text or duplicate-id row can never diverge the two engines.
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=True)
    )
    n_docs = tf.agg(F.countDistinct("doc_id").cast("double").alias("n_docs"))
    df = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok").asc())
    return scored.select(
        "doc_id", "tok", "tfidf", F.row_number().over(w).cast("int").alias("rk")
    ).filter(F.col("rk") <= 3).withColumn("tfidf", F.round("tfidf", 6))


# ---------------------------------------------------------------------------
# benchmark decontamination + unigram-LM quality scoring
# ---------------------------------------------------------------------------

from scache_spark.functions import sql_tokens, sql_word_shingles  # noqa: E402

_CONTAM_N = 5  # shingle width for contamination checks


@register(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_tokens("text")} AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, unnest({sql_word_shingles("t", _CONTAM_N)}) AS s
      FROM toks
    ),
    bench AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, s FROM sh),
    hits AS (
      SELECT b.bench_id, c.doc_id, b.s
      FROM bench b JOIN corpus c ON b.s = c.s AND c.doc_id <> b.bench_id
    )
    SELECT bench_id,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_contaminated_docs,
           CAST(count(DISTINCT s) AS BIGINT) AS n_leaked_shingles
    FROM hits GROUP BY bench_id
    """,
    tags=("B24", "B6"),
    doc=f"Benchmark decontamination: for every held-out 'benchmark' doc "
    "(doc_id ≡ 0 mod 97), find corpus documents sharing at least one "
    f"{_CONTAM_N}-gram — the contamination scan every training "
    "pipeline runs before a data release.  At 100 TB the benchmark "
    "shingle set is small → broadcast; the corpus side is an exploded "
    "shingle stream joined on the shingle hash, so the full-text "
    "corpus never shuffles.",
)
def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.functions import word_shingles

    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(
            word_shingles(F.split(F.lower("text"), " "), _CONTAM_N)
        ).alias("s"),
    )
    bench = sh.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "s"
    )
    hits = sh.join(F.broadcast(bench), "s").filter(
        F.col("doc_id") != F.col("bench_id")
    )
    return hits.groupBy("bench_id").agg(
        F.countDistinct("doc_id").cast("long").alias("n_contaminated_docs"),
        F.countDistinct("s").cast("long").alias("n_leaked_shingles"),
    )


@register(
    "unigram_lm_surprisal",
    oracle="""
    WITH tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents)
      GROUP BY doc_id, tok
    ),
    vocab AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS n_tok
              FROM tf GROUP BY tok),
    total AS (SELECT CAST(sum(n_tok) AS BIGINT) AS n_total FROM vocab)
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           round(sum(tf * -ln(v.n_tok * 1.0 / total.n_total))
                 / sum(tf), 6) AS avg_surprisal
    FROM tf JOIN vocab v USING (tok), total
    GROUP BY doc_id
    """,
    tags=("B24", "B16"),
    doc="Unigram-LM quality score: per-document mean token surprisal "
    "−ln p(tok) with probabilities from the corpus itself — the "
    "cheapest 'does this text look like the corpus' signal (gibberish "
    "and boilerplate both stand out).  The vocabulary is a broadcast "
    "dictionary and the corpus total a broadcast 1-row aggregate; "
    "rounded on both sides because ln() differs in the last ulp "
    "across engines.",
)
def unigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    # Aggregate to (doc_id, tok, tf) FIRST and checkpoint: vocabulary,
    # corpus total, and the weighted per-doc mean all derive from tf,
    # so the corpus tokenizes once (was 3 FileScans) and the surprisal
    # join touches tf-sized rows, not one row per token occurrence —
    # a corpus-length-to-postings-size shrink of the scored join at
    # 100 TB.  The mean is the tf-weighted form (identical arithmetic
    # to the oracle's).
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=True)
    )
    vocab = tf.groupBy("tok").agg(F.sum("tf").cast("long").alias("n_tok"))
    total = vocab.agg(F.sum("n_tok").cast("long").alias("n_total"))
    surprisal = -F.log(F.col("n_tok") * 1.0 / F.col("n_total"))
    return (
        tf.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf") * surprisal) / F.sum("tf"), 6
            ).alias("avg_surprisal"),
        )
    )


@register(
    "text_repetition_ratio",
    oracle="""
    WITH g AS (
      SELECT doc_id, source,
             [array_to_string(t[i:i+2], ' ')
              for i in range(1, len(t) - 1)] AS g3
      FROM (SELECT doc_id, source,
                   string_split(lower(coalesce(text, '')), ' ') AS t
            FROM documents))
    SELECT doc_id, source,
           CAST(len(g3) AS INT) AS n_grams,
           CAST(len(list_distinct(g3)) AS INT) AS n_unique,
           CASE WHEN len(g3) > 0
                THEN round(1.0 - len(list_distinct(g3))
                           / CAST(len(g3) AS DOUBLE), 6)
                ELSE 0.0 END AS rep_ratio
    FROM g
    """,
    tags=("B14", "B17"),
    doc="Repetition-ratio quality filter (the Gopher/C4-style "
    "duplicate-n-gram test): per document, the fraction of word "
    "3-grams that are repeats of an earlier 3-gram in the SAME "
    "document.  Built entirely with higher-order array functions "
    "(sequence→transform→slice, array_distinct) — the n-grams are "
    "never exploded, so this is a single narrow projection with ZERO "
    "shuffles: at 100 TB it is exactly one scan, and the per-row "
    "state is bounded by document length, not corpus size.",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.split(F.lower("text"), " ")
    g3 = F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 2),
            lambda i: F.concat_ws(" ", F.slice(t, i, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", g3.alias("g3")
    )
    n_grams = F.size("g3")
    n_unique = F.size(F.array_distinct("g3"))
    return d.select(
        "doc_id",
        "source",
        n_grams.cast("int").alias("n_grams"),
        n_unique.cast("int").alias("n_unique"),
        F.when(
            n_grams > 0,
            F.round(1.0 - n_unique / n_grams.cast("double"), 6),
        )
        .otherwise(0.0)
        .alias("rep_ratio"),
    )


@register(
    "inverted_index_postings",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS tok
            FROM documents)
      WHERE tok <> '')
    SELECT tok,
           CAST(count(*) AS BIGINT) AS doc_freq,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
             AS postings
    FROM pairs
    GROUP BY tok
    HAVING count(*) >= 2
    """,
    tags=("B7", "B14", "B17"),
    doc="Inverted-index build: token -> (document frequency, sorted "
    "posting list).  The full text NEVER shuffles — documents are "
    "tokenized and deduplicated to (token, doc_id) pairs map-side, so "
    "the exchange carries two integers-worth per pair; the posting "
    "list is sort_array(collect_set(...)) serialized to a string at "
    "the boundary (array outputs are forbidden cross-engine).  "
    "Singleton tokens are dropped (df >= 2).  At 100 TB the known "
    "hazard is posting-list skew on stopword-grade tokens; the "
    "production mitigation is a df cap / slice() on the sorted list, "
    "which composes directly with this plan.",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    return (
        pairs.groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_freq"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_set("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("doc_freq") >= 2)
    )


# ---------------------------------------------------------------------------
# per-source token-distribution divergence (corpus drift diagnostic)
# ---------------------------------------------------------------------------

_KL_VOCAB = 200  # restricted comparison vocabulary (global top tokens)


@register(
    "source_token_kl",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS t
      FROM documents
    ),
    top AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c_all
      FROM toks GROUP BY t
      ORDER BY count(*) DESC, t ASC LIMIT {_KL_VOCAB}
    ),
    tot_all AS (SELECT CAST(sum(c_all) AS BIGINT) AS n_all FROM top),
    src_counts AS (
      SELECT source, toks.t, CAST(count(*) AS BIGINT) AS c
      FROM toks JOIN top ON toks.t = top.t GROUP BY source, toks.t
    ),
    grid AS (
      SELECT s.source, top.t, top.c_all, coalesce(sc.c, 0) AS c
      FROM (SELECT DISTINCT source FROM toks) s
      CROSS JOIN top
      LEFT JOIN src_counts sc ON sc.source = s.source AND sc.t = top.t
    ),
    src_tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_src
                FROM grid GROUP BY source)
    SELECT g.source,
           st.n_src AS n_tokens_top,
           round(sum(
             ((g.c + 1.0) / (st.n_src + {_KL_VOCAB}.0))
             * ln(((g.c + 1.0) / (st.n_src + {_KL_VOCAB}.0))
                  / ((g.c_all + 1.0) / (ta.n_all + {_KL_VOCAB}.0)))
           ), 6) AS kl
    FROM grid g
    JOIN src_tot st ON g.source = st.source
    CROSS JOIN tot_all ta
    GROUP BY g.source, st.n_src
    """,
    tags=("B24", "B16"),
    doc="Distribution-shift diagnostic: add-1-smoothed KL divergence "
    f"of each source's token distribution from the corpus-wide one, "
    f"over the global top-{_KL_VOCAB} vocabulary — the drift check a "
    "corpus-mixing pipeline runs before reweighting sources.  At "
    "100 TB: token counting is a map-side-combined aggregate, the "
    f"top-{_KL_VOCAB} vocabulary is TakeOrdered + broadcast, and the "
    f"per-source grid is |sources|x{_KL_VOCAB} rows of state.  The "
    "absent-token cells are completed with a cross join so smoothing "
    "sees true zeros.",
)
def source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), " ")).alias("t")
    )
    # top is a TakeOrdered vocab head (_KL_VOCAB rows) feeding FOUR
    # consumers (tot_all, the src_counts probe, the grid cross, the
    # final p_all term) — checkpoint it so the corpus-wide token count
    # runs once.  src_counts (sources x vocab, bounded) likewise feeds
    # the grid and the per-source totals.
    top = (
        toks.groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("c_all"))
        .orderBy(F.col("c_all").desc(), F.col("t").asc())
        .limit(_KL_VOCAB)
        .localCheckpoint(eager=True)
    )
    tot_all = top.agg(F.sum("c_all").cast("long").alias("n_all"))
    src_counts = (
        toks.join(F.broadcast(top.select("t")), "t")
        .groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    # per-source totals from the PRESENT cells only (absent grid cells
    # contribute 0) — computing this from the completed grid instead
    # would duplicate the whole grid subtree in the static plan (the
    # r2 lint's 9-exchange shape); sources come from the documents
    # scan directly (no tokenizer re-run)
    src_tot = src_counts.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_src")
    )
    grid = (
        docs.select("source")
        .distinct()
        .crossJoin(F.broadcast(top))
        .join(src_counts, ["source", "t"], "left")
        .select(
            "source", "t", "c_all", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    v = float(_KL_VOCAB)
    p_src = (F.col("c") + 1.0) / (F.col("n_src") + v)
    p_all = (F.col("c_all") + 1.0) / (F.col("n_all") + v)
    return (
        grid.join(src_tot, "source")
        .crossJoin(F.broadcast(tot_all))
        .groupBy("source", F.col("n_src").alias("n_tokens_top"))
        .agg(F.round(F.sum(p_src * F.log(p_src / p_all)), 6).alias("kl"))
    )


@register(
    "source_lang_chisq",
    oracle="""
    WITH cells AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS obs
      FROM documents GROUP BY source, lang
    ),
    margins AS (
      SELECT c.source, c.lang, c.obs,
             rs.row_tot, cs.col_tot, t.n
      FROM cells c
      JOIN (SELECT source, CAST(sum(obs) AS BIGINT) AS row_tot
            FROM cells GROUP BY source) rs ON c.source = rs.source
      JOIN (SELECT lang, CAST(sum(obs) AS BIGINT) AS col_tot
            FROM cells GROUP BY lang) cs ON c.lang = cs.lang
      CROSS JOIN (SELECT CAST(sum(obs) AS BIGINT) AS n FROM cells) t
    )
    SELECT CAST(max(n) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST((count(DISTINCT source) - 1) * (count(DISTINCT lang) - 1)
                AS BIGINT) AS dof,
           round(sum(
             (obs - CAST(row_tot AS DOUBLE) * col_tot / n)
             * (obs - CAST(row_tot AS DOUBLE) * col_tot / n)
             / (CAST(row_tot AS DOUBLE) * col_tot / n)
           ), 4) AS chi2
    FROM margins
    """,
    tags=("B20", "B7", "B16"),
    doc="Chi-square independence test between document source and "
    "language over the observed contingency table — the screen for "
    "'is language mix drifting by source?' before corpus mixing.  "
    "Expected cell counts derive from integer margins, so the "
    "statistic is deterministic up to one rounded summation; at "
    "100 TB the contingency table is |sources|x|langs| rows from one "
    "map-side-combined count.  Margins come from windows OVER that "
    "bounded table (row/column/global sums + first-in-margin flags "
    "for the dof counts) rather than three re-aggregations plus a "
    "distinct Expand — the cells subplan appears once and the whole "
    "query is 5 shuffles, not the r2 lint's 9.",
)
def source_lang_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cells = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("obs"))
    )
    # windows over the bounded contingency table — |sources|x|langs|
    # rows, so single-partition margins are deliberate bounded-frame
    # state (the global one on a column-derived constant, cf.
    # functions.bounded_window)
    w_src = Window.partitionBy("source")
    w_lang = Window.partitionBy("lang")
    w_all = Window.partitionBy(F.pmod(F.hash("source"), F.lit(1)))
    m = cells.select(
        "source",
        "lang",
        "obs",
        F.sum("obs").over(w_src).cast("long").alias("row_tot"),
        F.sum("obs").over(w_lang).cast("long").alias("col_tot"),
        F.sum("obs").over(w_all).cast("long").alias("n"),
        (F.row_number().over(w_src.orderBy("lang")) == 1)
        .cast("long")
        .alias("first_in_source"),
        (F.row_number().over(w_lang.orderBy("source")) == 1)
        .cast("long")
        .alias("first_in_lang"),
    )
    exp = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    return m.agg(
        F.max("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        ((F.sum("first_in_source") - 1) * (F.sum("first_in_lang") - 1))
        .cast("long")
        .alias("dof"),
        F.round(
            F.sum((F.col("obs") - exp) * (F.col("obs") - exp) / exp), 4
        ).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (full-text search scoring over the corpus)
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "text_bm25_topk",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
      FROM toks WHERE tok <> '' GROUP BY doc_id, tok
    ), dlen AS (
      SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dlen
    ), dfreq AS (
      SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY tok
    ), top7 AS (
      SELECT tok, df FROM dfreq ORDER BY df DESC, tok ASC LIMIT 7
    ), qterms AS (
      SELECT tok, df FROM (
        SELECT tok, df,
               row_number() OVER (ORDER BY df DESC, tok ASC) AS rk
        FROM top7)
      WHERE rk BETWEEN 3 AND 7
    )
    SELECT doc_id,
           round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                     * (tf * 2.2)
                     / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6)
             AS bm25
    FROM tf
    JOIN qterms USING (tok)
    JOIN dlen USING (doc_id)
    CROSS JOIN stats
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 20
    """,
    tags=("B24", "B7", "B10"),
    doc="BM25 ranked retrieval: top-20 documents for a 5-term query "
    "(k1=1.2, b=0.75, Lucene's +1 idf floor so weights stay "
    "positive).  The query terms are derived deterministically from "
    "the corpus itself (df-ranks 3-7) purely to keep the fixture "
    "query self-contained; in production the term set is user input "
    "and simply replaces the qterms branch as a broadcast literal "
    "frame.  Plan shape at 100 TB: the corpus tokenizes exactly once "
    "into a flat (doc_id, tok, tf, dl) term-frequency table whose "
    "rows are individually metadata-weight (never a per-doc array — "
    "a single large-vocabulary document cannot materialize an "
    "unbounded row); corpus N/avgdl are a broadcast 1-row aggregate "
    "(no driver-side count); the tf x qterms join is a broadcast of "
    "<=5 rows, so scoring touches only postings of query terms and "
    "every post-tokenize shuffle carries partial aggregates or "
    "query-term hits, not the token stream; the final top-20 is "
    "TakeOrderedAndProject (BoundedPriorityQueue analog, reference "
    "util/BoundedPriorityQueue.scala:27-60).  Ordering uses the "
    "ROUNDED score in both engines so the limit boundary is "
    "cross-engine deterministic (ties broken by doc_id).",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from scache_spark.catalog import widen_scan

    d = load_table(spark, sf_dir, "documents")
    # r10 restructure (ADVICE r9, §2.3/§5): the r9 shape checkpointed
    # per-doc POSTINGS ARRAYS (collect_list over every distinct token
    # of the doc) and scored by scanning each doc's whole array — one
    # large-vocabulary document materialized an unbounded single row,
    # and scoring cost grew with doc vocabulary, not query size.  Now
    # the checkpoint is the FLAT (doc_id, tok, tf, dl) table (dl
    # attached via a doc-partitioned window on the same exchange, so
    # document length still needs no separate shuffle of the token
    # stream), and scoring prunes tf with the <=5-row broadcast qterms
    # BEFORE any further shuffle — per-doc cost is bounded by the
    # query term count and every post-checkpoint exchange carries
    # metadata-weight rows (vocab partials / query-term hits), never
    # raw tokens.  widen_scan keys the tokenize on doc_id (§2.5 local
    # no-op-at-scale fan-out), and hash(doc_id) satisfies both the
    # (doc_id, tok) grouping and the dl window by the subset rule, so
    # the whole checkpoint materializes off ONE exchange.
    toks = widen_scan(d.select("doc_id", "text"), "doc_id").select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    wdl = Window.partitionBy("doc_id")
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
        .withColumn("dl", F.sum("tf").over(wdl))
        .localCheckpoint(eager=True)
    )
    stats = (
        tf.groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    )
    dfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    # limit(7) is TakeOrdered over the vocab; the rank-window then runs
    # on 7 rows only (never the full vocabulary).
    from scache_spark.functions import bounded_window

    top7 = dfreq.orderBy(F.desc("df"), F.asc("tok")).limit(7)
    qterms = (
        top7.withColumn(
            "rk", F.row_number().over(bounded_window("tok", F.desc("df"), F.asc("tok")))
        )
        .filter((F.col("rk") >= 3) & (F.col("rk") <= 7))
        .select("tok", "df")
    )
    # Broadcast the <=5 query terms and drop every non-matching tf row
    # map-side: only query-term hits (<=5 rows per doc, dl attached)
    # reach the scoring aggregate — the documented production shape.
    hits = tf.join(F.broadcast(qterms), "tok")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    sat = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        hits.crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * sat), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


@register(
    "text_token_entropy",
    oracle="""
    WITH tf AS (
      SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id,
                   unnest(string_split(lower(text), ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
      GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_unique,
           round(ln(sum(tf)) - sum(tf * ln(tf)) / sum(tf), 6) AS entropy
    FROM tf
    GROUP BY doc_id
    """,
    tags=("B24", "B16", "B7"),
    doc="Shannon token-entropy quality signal per document (low "
    "entropy = repetitive/templated text, a standard pre-training "
    "corpus filter alongside the duplicate-n-gram ratio).  Uses the "
    "algebraic identity H = ln(L) - (1/L)*sum(tf*ln(tf)) so the whole "
    "computation is TWO partial-aggregatable groupBys — (doc_id, tok) "
    "then doc_id — with no per-token probability materialization and "
    "no window.  Both shuffles carry integer-sized rows; the text "
    "itself never moves.  Rounded to 6 dp on both engines "
    "(summation-order ulp noise).",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    return tf.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.round(
            F.log(F.sum("tf")) - F.sum(F.col("tf") * F.log("tf")) / F.sum("tf"), 6
        ).alias("entropy"),
    )


_ZIPF_TOP = 500


@register(
    "zipf_slope_fit",
    oracle=f"""
    WITH freq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS f
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
            FROM documents)
      WHERE tok <> '' GROUP BY tok
    ),
    top AS (
      SELECT tok, f FROM freq ORDER BY f DESC, tok ASC LIMIT {_ZIPF_TOP}
    ),
    ranked AS (
      SELECT f, CAST(row_number() OVER (ORDER BY f DESC, tok ASC) AS INT)
                  AS rk
      FROM top
    )
    SELECT CAST(count(*) AS BIGINT) AS n_tokens,
           round(regr_slope(ln(CAST(f AS DOUBLE)), ln(CAST(rk AS DOUBLE))), 4)
             AS zipf_slope,
           round(regr_intercept(ln(CAST(f AS DOUBLE)),
                                ln(CAST(rk AS DOUBLE))), 4) AS zipf_intercept
    FROM ranked
    """,
    tags=("B24", "B26", "B16"),
    doc=f"Zipf's-law fit over the top-{_ZIPF_TOP} token frequencies: "
    "OLS slope/intercept of ln(freq) on ln(rank) via the built-in "
    "regr_slope/regr_intercept aggregates — natural text sits near "
    "slope -1, so the fitted slope is a one-number corpus-health "
    "signal (templated/synthetic text flattens it; the fixtures' "
    "word salad reads shallow, which is itself the diagnostic).  "
    "Token counting collapses map-side; the rank window runs on the "
    f"TakeOrdered {_ZIPF_TOP}-row frame, never the vocabulary; the "
    "regression is one algebraic aggregate (the same distributed-OLS "
    "machinery as size_regression_fit, reference sim/train.py:11-29).",
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.functions import bounded_window

    freq = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    top = freq.orderBy(F.desc("f"), F.asc("tok")).limit(_ZIPF_TOP)
    ranked = top.withColumn(
        "rk",
        F.row_number().over(bounded_window("tok", F.desc("f"), F.asc("tok"))).cast("int"),
    )
    lf = F.log(F.col("f").cast("double"))
    lr = F.log(F.col("rk").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.round(F.regr_slope(lf, lr), 4).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 4).alias("zipf_intercept"),
    )


_HEAPS_CUTS = [50, 100, 150, 200, 250, 300, 350, 400, 450, 500]


@register(
    "heaps_law_fit",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents
    ),
    clean AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    pts AS (
      {" UNION ALL ".join(
        f"SELECT CAST(count(*) AS DOUBLE) AS n_tok, "
        f"CAST(count(DISTINCT tok) AS DOUBLE) AS vocab "
        f"FROM clean WHERE doc_id < {c}" for c in _HEAPS_CUTS)}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           round(regr_slope(ln(vocab), ln(n_tok)), 4) AS heaps_beta,
           round(regr_intercept(ln(vocab), ln(n_tok)), 4) AS heaps_lnk
    FROM pts
    """,
    tags=("B24", "B26", "B20"),
    doc="Heaps'-law vocabulary-growth fit, Zipf's companion: V(N) = "
    "K*N^beta estimated as the ln-ln OLS over 10 corpus prefixes "
    "(docs < 50, 100, ... 500) — the signal that says whether new "
    "data still brings new vocabulary (beta ~ 0.5 natural text) or "
    "the corpus has saturated (template churn).  The 10 prefix "
    "points come from ONE pass with conditional distinct aggregates; "
    "at 100 TB each prefix's exact distinct becomes a per-prefix HLL "
    "sketch (hll_rolling_distinct's pattern) with identical plan "
    "shape.  Fit is the same distributed-OLS aggregate as "
    "zipf_slope_fit.",
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    clean = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    agg = clean.agg(
        *[
            F.count(F.when(F.col("doc_id") < c, 1)).cast("double").alias(f"n_{c}")
            for c in _HEAPS_CUTS
        ],
        *[
            F.countDistinct(F.when(F.col("doc_id") < c, F.col("tok")))
            .cast("double")
            .alias(f"v_{c}")
            for c in _HEAPS_CUTS
        ],
    )
    stacked = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col(f"n_{c}").alias("n_tok"), F.col(f"v_{c}").alias("vocab")
                    )
                    for c in _HEAPS_CUTS
                ]
            )
        ).alias("p")
    ).select("p.n_tok", "p.vocab")
    return stacked.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(F.regr_slope(F.log("vocab"), F.log("n_tok")), 4).alias("heaps_beta"),
        F.round(F.regr_intercept(F.log("vocab"), F.log("n_tok")), 4).alias(
            "heaps_lnk"
        ),
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filters + corpus novelty decay
# ---------------------------------------------------------------------------

_REP_THRESH = {"uni": 0.30, "bi": 0.18, "tri": 0.30}


@register(
    "text_repetition_signals",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, n,
             unnest([array_to_string(t[i:i+n-1], ' ')
                     for i in range(1, len(t) - n + 2)]) AS g
      FROM toks, unnest([1, 2, 3]) AS u(n)
    ),
    counts AS (
      SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS c
      FROM grams GROUP BY doc_id, n, g
    ),
    per AS (
      SELECT doc_id, n, max(c) AS top_c, CAST(sum(c) AS BIGINT) AS tot,
             CAST(count(*) AS BIGINT) AS nd
      FROM counts GROUP BY doc_id, n
    ),
    wide AS (
      SELECT doc_id,
             CAST(max(CASE WHEN n = 1 THEN top_c END) AS DOUBLE)
               / max(CASE WHEN n = 1 THEN tot END) AS top_unigram_frac,
             CAST(max(CASE WHEN n = 2 THEN top_c END) AS DOUBLE)
               / max(CASE WHEN n = 2 THEN tot END) AS top_bigram_frac,
             CAST(max(CASE WHEN n = 3 THEN tot END)
                  - max(CASE WHEN n = 3 THEN nd END) AS DOUBLE)
               / max(CASE WHEN n = 3 THEN tot END) AS dup_trigram_frac
      FROM per GROUP BY doc_id
    )
    SELECT doc_id, top_unigram_frac, top_bigram_frac, dup_trigram_frac,
           (top_unigram_frac > {_REP_THRESH["uni"]}
            OR top_bigram_frac > {_REP_THRESH["bi"]}
            OR dup_trigram_frac > {_REP_THRESH["tri"]}) AS repetitive
    FROM wide
    """,
    tags=("B24", "B7"),
    doc="Gopher-style repetition filters: per document, the mass of "
    "the single most frequent unigram and bigram, and the fraction "
    "of trigram occurrences that are repeats — the standard screens "
    "for degenerate/templated text in a pretraining pipeline "
    "(adapted to newline-free fixture text; the line-dedup variants "
    "reduce to the same explode-count shape).  Completes "
    "text_repetition_ratio: that sibling computes ONLY the "
    "duplicate-trigram fraction zero-shuffle in-array; the top-gram "
    "MASS signals here need true per-gram counts, hence the "
    "explode+groupBy shape — the two trigram columns must agree "
    "exactly (pytest cross-check).  ONE tokenizer pass "
    "feeds all three n-gram sizes (a 3-element posexplode tags n "
    "map-side — no per-n re-scan of the text), counts partial-"
    "aggregate on (doc, n, gram), and the doc verdict is a "
    "conditional pivot.  Every ratio is an exact small-integer "
    "division, so the threshold flags agree bit-for-bit across "
    "engines.",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")

    def grams(n: int):
        sh = F.transform(
            F.sequence(F.lit(1), F.size("t") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, n)),
        )
        return F.when(F.size("t") >= n, sh).otherwise(
            F.array().cast("array<string>")
        )

    tagged = (
        d.select("doc_id", toks.alias("t"))
        .select(
            "doc_id",
            F.posexplode(F.array(grams(1), grams(2), grams(3))).alias(
                "n0", "garr"
            ),
        )
        .select(
            "doc_id", (F.col("n0") + 1).alias("n"), F.explode("garr").alias("g")
        )
    )
    counts = tagged.groupBy("doc_id", "n", "g").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per = counts.groupBy("doc_id", "n").agg(
        F.max("c").alias("top_c"),
        F.sum("c").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("nd"),
    )

    def pick(n: int, col: str):
        return F.max(F.when(F.col("n") == n, F.col(col)))

    wide = per.groupBy("doc_id").agg(
        (pick(1, "top_c").cast("double") / pick(1, "tot")).alias(
            "top_unigram_frac"
        ),
        (pick(2, "top_c").cast("double") / pick(2, "tot")).alias(
            "top_bigram_frac"
        ),
        (
            (pick(3, "tot") - pick(3, "nd")).cast("double") / pick(3, "tot")
        ).alias("dup_trigram_frac"),
    )
    return wide.select(
        "doc_id",
        "top_unigram_frac",
        "top_bigram_frac",
        "dup_trigram_frac",
        (
            (F.col("top_unigram_frac") > _REP_THRESH["uni"])
            | (F.col("top_bigram_frac") > _REP_THRESH["bi"])
            | (F.col("dup_trigram_frac") > _REP_THRESH["tri"])
        ).alias("repetitive"),
    )


_NOV_BUCKET = 50  # docs per novelty-curve bucket


@register(
    "corpus_ngram_novelty",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {sql_tokens("text")} AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, unnest({sql_word_shingles("t", 3)}) AS s FROM toks
    ),
    first_seen AS (
      SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s
    ),
    per_doc AS (
      SELECT sh.doc_id,
             CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS novel,
             CAST(count(*) AS BIGINT) AS total
      FROM sh JOIN first_seen f ON sh.s = f.s
      GROUP BY sh.doc_id
    )
    SELECT CAST(doc_id // {_NOV_BUCKET} AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(CAST(novel AS DOUBLE) / total), 6) AS avg_novelty
    FROM per_doc
    GROUP BY 1
    """,
    tags=("B24", "B7", "mining"),
    doc="Corpus-growth novelty decay: for each document (in doc_id "
    "ingestion order) the fraction of its distinct trigrams never "
    "seen in any earlier document, averaged per "
    f"{_NOV_BUCKET}-document bucket — the 'is new data still adding "
    "information?' curve a collection pipeline watches to decide "
    "when a source is mined out.  First-occurrence is one "
    "min-aggregate over the exploded shingle stream (map-side "
    "combinable), membership is a shingle-key equi join of that "
    "dictionary back to the stream — at 100 TB both shuffles key on "
    "the shingle hash, uniformly distributed by construction, and "
    "the curve output is |corpus|/bucket rows.  Per-doc ratios are "
    "exact integer divisions; only the bucket AVERAGE (an "
    "order-dependent float sum) is rounded.",
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from scache_spark.functions import tokens, word_shingles

    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(word_shingles(tokens("text"), 3)).alias("s")
    )
    first_seen = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first_seen, "s")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("novel"),
            F.count(F.lit(1)).cast("long").alias("total"),
        )
    )
    return (
        per_doc.groupBy(
            (F.col("doc_id") / _NOV_BUCKET)
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.avg(F.col("novel").cast("double") / F.col("total")), 6
            ).alias("avg_novelty"),
        )
    )


# ---------------------------------------------------------------------------
# source reweighting for corpus mixing
# ---------------------------------------------------------------------------

_MIX_CAP = 5.0  # max upsampling epochs before a source is flagged


@register(
    "source_mixing_weights",
    oracle=f"""
    WITH per AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT CAST(sum(tokens) AS BIGINT) AS all_tokens,
             CAST(count(*) AS BIGINT) AS n_sources
      FROM per
    )
    SELECT source, tokens, n_docs,
           round(CAST(tokens AS DOUBLE) / all_tokens, 6) AS share,
           round((1.0 / n_sources)
                 / (CAST(tokens AS DOUBLE) / all_tokens), 6) AS weight,
           ((1.0 / n_sources) / (CAST(tokens AS DOUBLE) / all_tokens)
            > {_MIX_CAP}) AS needs_cap
    FROM per, tot
    """,
    tags=("B24", "B7", "mining"),
    doc="Source reweighting for corpus mixing: per-source token mass, "
    "its share of the corpus, and the upsampling weight that moves "
    "the mix to a UNIFORM target distribution (weight = target_share "
    f"/ current_share), flagging sources needing > {_MIX_CAP} epochs "
    "— the static form of the mixture-tuning step (DoReMi-style "
    "methods learn the target; the plumbing is identical).  The "
    "UP-sampling dual of mixture_sampling_weights, which "
    "down-samples every source to the smallest one; a real mix uses "
    "both (cap the upsampled tail, downsample the giants).  One "
    "map-side-combinable aggregate per source + a broadcast 1-row "
    "total: per-source state regardless of corpus size.  share and "
    "weight are rounded (float division chains); the cap flag "
    "compares the UNROUNDED ratio identically in both engines.",
)
def source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("tokens"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    tot = per.agg(
        F.sum("tokens").cast("long").alias("all_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    share = F.col("tokens").cast("double") / F.col("all_tokens")
    weight = (1.0 / F.col("n_sources")) / share
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        "n_docs",
        F.round(share, 6).alias("share"),
        F.round(weight, 6).alias("weight"),
        (weight > _MIX_CAP).alias("needs_cap"),
    )


@register(
    "sentiment_lexicon_score",
    oracle="""
    WITH scored AS (
      SELECT source,
             list_aggregate([CASE WHEN w IN ('fast', 'big') THEN 1
                                  WHEN w IN ('slow', 'small') THEN -1
                                  ELSE 0 END
                             for w in string_split(lower(text), ' ')],
                            'sum') AS polarity,
             len(string_split(lower(text), ' ')) AS n_tok
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(polarity * 1.0 / n_tok), 6) AS mean_sentiment,
           round(sum(CASE WHEN polarity > 0 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS pos_frac
    FROM scored GROUP BY source
    """,
    tags=("B24", "B14"),
    doc="Lexicon-based sentiment at corpus scale (the EDBT-2016 "
    "'Large Scale Sentiment Analysis with Spark' shape): each doc's "
    "polarity is the sum of +1/-1 lexicon hits over its tokens, "
    "normalized by length; per-source mean sentiment and "
    "positive-doc fraction.  The lexicon folds INSIDE the token "
    "array as literal IN-sets (constant-size, no lookup-table join "
    "needed at this lexicon size; a broadcast join replaces the "
    "literals when the lexicon outgrows the plan) — one narrow "
    "projection, one |sources|-row aggregate, zero token shuffle.",
)
def sentiment_lexicon_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), " ")
    polarity = F.aggregate(
        F.transform(
            toks,
            lambda w: F.when(w.isin("fast", "big"), 1)
            .when(w.isin("slow", "small"), -1)
            .otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    scored = d.select(
        "source",
        polarity.alias("polarity"),
        F.size(toks).alias("n_tok"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg(F.col("polarity") * 1.0 / F.col("n_tok")), 6).alias(
            "mean_sentiment"
        ),
        F.round(
            F.sum(F.when(F.col("polarity") > 0, 1).otherwise(0)) * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("pos_frac"),
    )
