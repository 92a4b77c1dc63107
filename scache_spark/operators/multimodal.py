"""Multimodal column plumbing (north-star): opaque binary payloads +
typed metadata, with decode/feature-extraction as Arrow-batched
pandas stages.

This mirrors the reference's own data model most directly: SCache's
unit of data IS an opaque byte blob with metadata
(`io/ChunkedByteBuffer.scala`, `storage/BlockId.scala:79-81`) — here
the blob is a column (`BinaryType`) inside a schema-first DataFrame.

The container has no image/audio codecs, so the decode step is a
clearly marked deterministic stand-in (byte-level statistics standing
in for pixel decoding); the Spark-side plumbing — schema, Arrow batch
shape, mapInPandas signature, partition behavior — is real and tested.
Swapping `_fake_decode` for a PIL/libav call changes nothing upstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scache_spark.catalog import load_table
from scache_spark.registry import register


def binary_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a (asset_id, blob: binary, mime, n_bytes) table from
    documents — the opaque-payload-with-metadata shape."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("asset_id"),
        # null-safe (r6 dirty contract): a NULL payload is the empty
        # blob — decoders downstream must never see None
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("blob"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte
    FROM documents
    """,
    tags=("north-star",),
    doc="Typed metadata over opaque binary payloads: size, content "
    "hash, magic-byte peek — computed without ever decoding.",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.md5(F.col("text")).alias("content_hash"),
        F.ascii(F.substring(F.col("text"), 1, 1)).cast("int").alias("first_byte"),
    )


# ---------------------------------------------------------------------------
# decode / feature-extract via mapInPandas
# ---------------------------------------------------------------------------

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_std", T.DoubleType()),
        # serialized at the query boundary: the driver's canonicalizer
        # cannot hash array cells — internal logic stays array-typed,
        # the exposed column is a ','-joined string
        T.StructField("feat_head", T.StringType()),
    ]
)


def _fake_decode(blob: bytes) -> "pd.Series":
    """STUB for the real decoder (PIL.Image.open / librosa.load /
    av.open).  The container ships no media codecs, so we 'decode' the
    blob into its raw byte values — deterministic, so tests are exact.
    Replace this function (only) to plug a real codec in.  A None/
    empty payload decodes to an empty sample array (r6 dirty
    contract) — a decoder must degrade, not crash, on a bad asset."""
    import numpy as np

    arr = np.frombuffer(blob or b"", dtype=np.uint8).astype("float64")
    return arr


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction: one pandas frame per batch in,
    one out.  This is the 100 TB pattern for media: partition-parallel,
    vectorized inside the batch, constant memory (batch-bounded)."""
    for pdf in batches:
        feats = []
        # zip over columns, not iterrows: no per-row Series allocation
        for asset_id, mime, blob in zip(
            pdf["asset_id"], pdf["mime"], pdf["blob"]
        ):
            arr = _fake_decode(blob)
            n = len(arr)
            feats.append(
                (
                    asset_id,
                    mime,
                    int(n),
                    # round(6): numpy's pairwise summation vs the
                    # oracle's sequential list_aggregate differ in ulps.
                    # An empty asset has NO moments — null, not 0.0
                    # (r6 dirty contract, matching SQL NULL semantics).
                    round(float(arr.mean()), 6) if n else None,
                    round(float(arr.std()), 6) if n else None,
                    ",".join(str(int(x)) for x in arr[:4]),
                )
            )
        yield pd.DataFrame(
            feats,
            columns=[
                "asset_id",
                "mime",
                "n_bytes",
                "feat_mean",
                "feat_std",
                "feat_head",
            ],
        )


@register(
    "multimodal_features",
    oracle="""
    WITH bytes AS (
      SELECT doc_id,
             [CAST(CAST(('0x' || substr(hex(encode(coalesce(text, ''))),
                                   2 * i + 1, 2)) AS INT) AS DOUBLE)
              for i in range(0, octet_length(encode(coalesce(text, ''))))] AS bv,
             octet_length(encode(coalesce(text, ''))) AS n
      FROM documents
    ),
    mom AS (
      SELECT doc_id, n,
             list_aggregate(bv, 'sum') / n AS mu,
             list_aggregate([x * x for x in bv], 'sum') / n AS m2,
             coalesce(array_to_string(
                 [CAST(x AS INT) for x in bv[1:least(n, 4)]], ','), '')
                 AS head
      FROM bytes
    )
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           CAST(n AS BIGINT) AS n_bytes,
           round(mu, 6) AS feat_mean,
           round(sqrt(m2 - mu * mu), 6) AS feat_std,
           head AS feat_head
    FROM mom
    """,
    tags=("north-star", "B23"),
    doc="mapInPandas decode+featurize pipeline over binary assets: "
    "Arrow batches in, typed features out.  Decode itself is stubbed "
    "(no codecs in container) but deterministic, and the oracle "
    "recomputes every feature in pure SQL over the TRUE UTF-8 bytes "
    "(hex(encode(text)) byte extraction — r6: the old "
    "ascii-codepoint shortcut diverged on non-ASCII payloads, caught "
    "by the dirty-corpus stress; population std via E[x²]−μ², "
    "rounded on both sides).",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = binary_assets(spark, sf_dir)
    return assets.mapInPandas(extract_features, FEATURE_SCHEMA)


@register(
    "multimodal_feature_agg",
    oracle="""
    WITH decoded AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS mime,
             round(list_aggregate(
                     [CAST(CAST(('0x' || substr(hex(encode(coalesce(text, ''))),
                                           2 * i + 1, 2)) AS INT) AS DOUBLE)
                      for i in range(0, octet_length(encode(coalesce(text, ''))))],
                     'sum')
                 / octet_length(encode(coalesce(text, ''))), 6) AS feat_mean
      FROM documents)
    SELECT mime,
           CAST(count(*) AS BIGINT) AS n_assets,
           round(avg(feat_mean), 6) AS mime_mean
    FROM decoded GROUP BY mime
    """,
    tags=("north-star",),
    doc="Cross-check of the pandas featurizer: byte-mean per asset "
    "recomputed in pure SQL over the true UTF-8 bytes (hex(encode) "
    "extraction, r6), aggregated per mime class.  Hash-matches the "
    "oracle, proving the UDF path and the declarative path agree.",
)
def multimodal_feature_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = multimodal_features(spark, sf_dir)
    return feats.groupBy("mime").agg(
        F.count(F.lit(1)).cast("long").alias("n_assets"),
        F.round(F.avg("feat_mean"), 6).alias("mime_mean"),
    )


_FRAME_SCHEMA = (
    "asset_id long, frame_no int, first_byte int, frame_sig string"
)


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched frame sampling: for each video blob, emit one row
    per sampled 64-byte 'frame' (stride sampling, capped at 8) — a
    CARDINALITY-CHANGING mapInPandas, the shape a real video decoder
    (absent from this container; see _fake_decode's contract) plugs
    into unchanged: same batch iteration, same fan-out schema."""
    import hashlib

    for pdf in batches:
        rows = []
        for aid, blob in zip(pdf["asset_id"], pdf["blob"]):
            b = bytes(blob) if blob is not None else b""
            for g in range(min(len(b) // 64, 8)):
                seg = b[g * 64 : (g + 1) * 64]
                # signature = md5 of the slice's UPPERCASE HEX: a
                # byte-exact canonical form both engines can compute
                # for ANY payload (r6 — md5 over raw bytes is not
                # SQL-expressible for non-UTF-8 slices)
                rows.append(
                    (
                        int(aid),
                        g,
                        seg[0],
                        hashlib.md5(seg.hex().upper().encode()).hexdigest(),
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=["asset_id", "frame_no", "first_byte", "frame_sig"],
        )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH hexed AS (
      SELECT doc_id, hex(encode(coalesce(text, ''))) AS h,
             octet_length(encode(coalesce(text, ''))) AS nb
      FROM documents)
    SELECT doc_id AS asset_id,
           CAST(g AS INT) AS frame_no,
           CAST(('0x' || substr(h, g * 128 + 1, 2)) AS INT) AS first_byte,
           md5(substr(h, g * 128 + 1, 128)) AS frame_sig
    FROM hexed, generate_series(0, 7) t(g)
    WHERE doc_id % 3 = 2 AND g < least(nb // 64, 8)
    """,
    tags=("north-star", "B23"),
    doc="Video frame sampling over opaque binary assets: mapInPandas "
    "fans each video blob out to up to 8 sampled frames (frame rows "
    "per input row — the cardinality-changing UDF shape a real "
    "decoder needs), with per-frame signatures computed from the "
    "bytes.  The decode itself is the documented deterministic fake "
    "(64-byte strides of the payload; media codecs are absent from "
    "the container) but every piece of Spark plumbing — binary "
    "column through Arrow, batch iteration, fan-out schema, "
    "downstream aggregability — is real.  The oracle reproduces the "
    "stride arithmetic in pure SQL over the ASCII fixture.  At "
    "100 TB this is one scan, no shuffle, and the frame stream "
    "partitions exactly like its source assets.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = binary_assets(spark, sf_dir).filter(
        F.col("mime") == "video/mp4"
    ).select("asset_id", "blob")
    return assets.mapInPandas(sample_frames, _FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual-hash near-duplicate detection (image dedup plumbing)
# ---------------------------------------------------------------------------

_PHASH_BITS = 64
_PHASH_BANDS = 4  # 4 x 16-bit bands, same blocking shape as SimHash
_PHASH_MAX_HAMMING = 6


def _phash_bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode each blob (``_fake_decode`` stands in for the image
    codec) and compute an average-hash perceptual signature: sample 64
    byte positions (stride 7 mod n — the stub for resize-to-8x8),
    threshold each against the sample mean, pack the bitstring into
    4 x 16-bit band integers.  Arrow-batched; constant memory."""
    for pdf in batches:
        rows = []
        for asset_id, blob in zip(pdf["asset_id"], pdf["blob"]):
            arr = _fake_decode(blob)
            n = len(arr)
            if n == 0:
                # an empty asset has no perceptual signature (r6 dirty
                # contract) — it cannot participate in near-dup pairing
                continue
            codes = [int(arr[(i * 7) % n]) for i in range(_PHASH_BITS)]
            mean = sum(codes) / 64.0
            bands = []
            for j in range(_PHASH_BANDS):
                b = 0
                for k in range(16):
                    if codes[j * 16 + k] > mean:
                        b |= 1 << k
                bands.append(b)
            rows.append((int(asset_id), *bands))
        yield pd.DataFrame(rows, columns=["asset_id", "b0", "b1", "b2", "b3"])


@register(
    "multimodal_phash_neardup",
    oracle=f"""
    WITH codes AS (
      SELECT doc_id,
             [CAST(('0x' || substr(hex(encode(text)),
                                   2 * ((i * 7) % octet_length(encode(text))) + 1,
                                   2)) AS INT)
              for i in range(0, {_PHASH_BITS})] AS c
      FROM documents
      WHERE octet_length(encode(coalesce(text, ''))) > 0
    ),
    hashed AS (
      SELECT doc_id, c, list_aggregate(c, 'sum') / 64.0 AS m FROM codes
    ),
    bands AS (
      SELECT doc_id,
             list_aggregate([CASE WHEN c[0*16 + k + 1] > m
               THEN (CAST(1 AS BIGINT) << k) ELSE 0 END
               for k in range(0, 16)], 'sum') AS b0,
             list_aggregate([CASE WHEN c[1*16 + k + 1] > m
               THEN (CAST(1 AS BIGINT) << k) ELSE 0 END
               for k in range(0, 16)], 'sum') AS b1,
             list_aggregate([CASE WHEN c[2*16 + k + 1] > m
               THEN (CAST(1 AS BIGINT) << k) ELSE 0 END
               for k in range(0, 16)], 'sum') AS b2,
             list_aggregate([CASE WHEN c[3*16 + k + 1] > m
               THEN (CAST(1 AS BIGINT) << k) ELSE 0 END
               for k in range(0, 16)], 'sum') AS b3
      FROM hashed
    ),
    melted AS (
      SELECT doc_id, b0, b1, b2, b3, band_id,
             CASE band_id WHEN 0 THEN b0 WHEN 1 THEN b1
                          WHEN 2 THEN b2 ELSE b3 END AS band_val
      FROM bands, (SELECT unnest(generate_series(0, 3)) AS band_id)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS asset_a, b.doc_id AS asset_b,
             a.b0 AS a0, a.b1 AS a1, a.b2 AS a2, a.b3 AS a3,
             b.b0 AS c0, b.b1 AS c1, b.b2 AS c2, b.b3 AS c3
      FROM melted a JOIN melted b
        ON a.band_id = b.band_id AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id
    )
    SELECT asset_a, asset_b,
           CAST(bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
              + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3)) AS INT)
             AS hamming
    FROM cand
    WHERE bit_count(xor(a0, c0)) + bit_count(xor(a1, c1))
        + bit_count(xor(a2, c2)) + bit_count(xor(a3, c3))
        <= {_PHASH_MAX_HAMMING}
    """,
    tags=("north-star", "B23", "B24"),
    doc="Image near-duplicate detection over opaque binary assets: "
    "decode (stubbed codec) -> 64-bit average-hash perceptual "
    "signature in mapInPandas -> 4x16-bit band blocking -> exact "
    "Hamming verify (<=6) on candidates only — the multimodal "
    "sibling of dedup_simhash_pairs, completing the decode->hash->"
    "dedup chain a vision-training pipeline runs.  The blobs never "
    "shuffle: signatures (4 ints) move, 2 KB payloads stay at the "
    "scan.  The oracle reproduces the full signature arithmetic from "
    "the text bytes (the fake decode is byte-identity), so the "
    "Arrow plumbing is verified end-to-end, not just shaped.",
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = binary_assets(spark, sf_dir).select("asset_id", "blob")
    sig = assets.mapInPandas(
        _phash_bands, "asset_id long, b0 long, b1 long, b2 long, b3 long"
    )
    melted = sig.select(
        "asset_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_id"), F.col(f"b{j}").alias("band_val")
                    )
                    for j in range(_PHASH_BANDS)
                ]
            )
        ).alias("bd"),
    ).select("asset_id", "b0", "b1", "b2", "b3", "bd.band_id", "bd.band_val")
    a, b = melted.alias("a"), melted.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            *[F.col(f"a.b{j}").alias(f"a{j}") for j in range(4)],
            *[F.col(f"b.b{j}").alias(f"c{j}") for j in range(4)],
        )
        .distinct()
    )
    hamming = sum(
        F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"c{j}"))) for j in range(4)
    )
    return cand.select(
        "asset_a", "asset_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= _PHASH_MAX_HAMMING)


# ---------------------------------------------------------------------------
# audio windowed energy (the audio leg of the decode pipeline)
# ---------------------------------------------------------------------------

_AUDIO_WIN = 64
_AUDIO_MAX_WIN = 8


def _audio_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Windowed RMS energy per audio asset: decode (stub codec), slice
    into fixed 64-sample windows (up to 8), sqrt(mean(x^2)) each —
    the framing every audio featurizer (VAD, loudness normalization,
    silence trimming) starts from.  Integer byte values keep the
    squared sums exactly representable, so only the final sqrt needs
    the 6-dp transcendental rounding."""
    for pdf in batches:
        rows = []
        for asset_id, blob in zip(pdf["asset_id"], pdf["blob"]):
            arr = _fake_decode(blob)
            n_win = min(_AUDIO_MAX_WIN, len(arr) // _AUDIO_WIN)
            for g in range(n_win):
                w = arr[g * _AUDIO_WIN : (g + 1) * _AUDIO_WIN]
                sum_sq = float((w * w).sum())
                rows.append(
                    (int(asset_id), g, round((sum_sq / 64.0) ** 0.5, 6))
                )
        yield pd.DataFrame(rows, columns=["asset_id", "win_no", "rms"])


@register(
    "multimodal_audio_energy",
    oracle=f"""
    SELECT doc_id AS asset_id,
           CAST(g AS INT) AS win_no,
           round(sqrt(list_aggregate(
             [CAST(ascii(substr(text, g*{_AUDIO_WIN} + i, 1)) AS DOUBLE)
              * ascii(substr(text, g*{_AUDIO_WIN} + i, 1))
              for i in range(1, {_AUDIO_WIN} + 1)], 'sum') / 64.0), 6) AS rms
    FROM documents,
         (SELECT unnest(range(0, {_AUDIO_MAX_WIN})) AS g)
    WHERE doc_id % 3 = 1 AND g < floor(length(text) / {_AUDIO_WIN})
    """,
    tags=("north-star", "B23", "B16"),
    doc="Audio windowed-energy extraction over opaque binary assets: "
    "mime-filtered audio blobs decode in mapInPandas (stub codec = "
    "byte identity) and emit RMS per fixed 64-sample window (max 8) "
    "— the framing pass VAD / loudness normalization / silence "
    "trimming build on, completing the multimodal legs (image "
    "pHash, video frame sampling, audio energy).  One scan, no "
    "shuffle, window rows fan out inside the Arrow batch; the "
    "oracle recomputes every window from the text bytes, verifying "
    "the decode-window-reduce chain exactly.",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    audio = binary_assets(spark, sf_dir).filter(
        F.col("mime") == "audio/wav"
    ).select("asset_id", "blob")
    return audio.mapInPandas(
        _audio_energy, "asset_id long, win_no int, rms double"
    )
