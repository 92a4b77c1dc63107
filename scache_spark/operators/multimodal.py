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

import re
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
        # NULL text stays a NULL blob (r9 dirty-binary contract): the
        # decode layer owns degradation now — a missing payload is a
        # per-record 'null_payload' status, never a task crash and
        # never silently conflated with a present-but-empty asset
        F.encode(F.col("text"), "UTF-8").alias("blob"),
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
        # r9 dirty-binary audit column: per-record decode outcome
        # (see _safe_decode) — a degraded asset keeps its row with
        # NULL features instead of killing the task or vanishing
        T.StructField("decode_status", T.StringType()),
    ]
)


def _fake_decode(blob: bytes) -> "pd.Series":
    """STUB for the real decoder (PIL.Image.open / librosa.load /
    av.open).  The container ships no media codecs, so we 'decode' the
    blob into its raw byte values — deterministic, so tests are exact.
    Replace this function (only) to plug a real codec in.  Validation
    and degradation live one layer up in ``_safe_decode``."""
    import numpy as np

    arr = np.frombuffer(blob or b"", dtype=np.uint8).astype("float64")
    return arr


# Dirty-binary decode contract (r9 VERDICT item 3 — the binary twin of
# the r8 trace contract: one bad record must degrade, never kill the
# task).  The stub codec sniffs a framed container the way a real
# pipeline sniffs file magic: a payload starting with b'SCB' claims the
# stub container format 'SCB1:<decimal-byte-length>:<payload>' (ASCII
# header so the whole frame can ride a parquet string column in
# fixtures; the mapInPandas boundary always sees true bytes).  Any
# violation yields a per-record STATUS instead of an exception:
#   null_payload  blob is NULL (missing asset)
#   bad_magic     'SCB' prefix but not a well-formed SCB1 header
#   oversize      declared (framed) or actual (raw) length exceeds the
#                 decode budget — the bound that keeps one hostile
#                 record from OOMing an executor at 100 TB
#   truncated     framed payload shorter/longer than its declared length
#   empty         zero decodable bytes (present but empty asset)
#   ok            decoded; samples returned
# Precedence is exactly this order and the SQL oracles mirror it
# (_SQL_DECODE below).  Raw (unframed) payloads skip the header checks:
# null -> empty -> oversize -> ok.
_MAX_DECODE_BYTES = 1_000_000
_SCB_HEADER = re.compile(rb"^SCB1:([0-9]+):")


def _safe_decode(blob) -> "tuple":
    """Validate + decode one payload: returns (samples | None, status).
    NEVER raises on payload content — the per-record degradation the
    dirty-binary stress (tools/scale_stress.py --dirty-binary) pins."""
    if blob is None:
        return None, "null_payload"
    b = bytes(blob)
    if b[:3] == b"SCB":
        m = _SCB_HEADER.match(b)
        if not m:
            return None, "bad_magic"
        declared = int(m.group(1))
        if declared > _MAX_DECODE_BYTES:
            return None, "oversize"
        body = b[m.end() :]
        if declared != len(body):
            return None, "truncated"
        if not body:
            return None, "empty"
        return _fake_decode(body), "ok"
    if not b:
        return None, "empty"
    if len(b) > _MAX_DECODE_BYTES:
        return None, "oversize"
    return _fake_decode(b), "ok"


# DuckDB mirror of _safe_decode, shared by every multimodal oracle:
# (doc_id, status, body) per document, same precedence as the Python.
_SQL_STATUS = f"""CASE
      WHEN text IS NULL THEN 'null_payload'
      WHEN text LIKE 'SCB%' THEN CASE
        WHEN NOT regexp_matches(text, '^SCB1:[0-9]+:') THEN 'bad_magic'
        WHEN coalesce(TRY_CAST(regexp_extract(text, '^SCB1:([0-9]+):', 1)
                               AS BIGINT), {_MAX_DECODE_BYTES + 1})
             > {_MAX_DECODE_BYTES} THEN 'oversize'
        WHEN TRY_CAST(regexp_extract(text, '^SCB1:([0-9]+):', 1) AS BIGINT)
             != octet_length(encode(regexp_replace(text, '^SCB1:[0-9]+:', '')))
             THEN 'truncated'
        WHEN octet_length(encode(regexp_replace(text, '^SCB1:[0-9]+:', ''))) = 0
             THEN 'empty'
        ELSE 'ok' END
      WHEN octet_length(encode(text)) = 0 THEN 'empty'
      WHEN octet_length(encode(text)) > {_MAX_DECODE_BYTES} THEN 'oversize'
      ELSE 'ok' END"""

_SQL_DECODE = f"""
      SELECT doc_id,
             {_SQL_STATUS} AS status,
             CASE WHEN ({_SQL_STATUS}) = 'ok'
                  THEN CASE WHEN text LIKE 'SCB%'
                            THEN regexp_replace(text, '^SCB1:[0-9]+:', '')
                            ELSE text END
             END AS body
      FROM documents"""


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
            arr, status = _safe_decode(blob)
            if status == "ok":
                n = len(arr)
                feats.append(
                    (
                        asset_id,
                        mime,
                        int(n),
                        # round(6): numpy's pairwise summation vs the
                        # oracle's sequential list_aggregate differ in
                        # ulps.
                        round(float(arr.mean()), 6),
                        round(float(arr.std()), 6),
                        ",".join(str(int(x)) for x in arr[:4]),
                        status,
                    )
                )
            elif status == "empty":
                # present-but-empty asset: size 0 is KNOWN, but it has
                # no moments — null, not 0.0 (r6 dirty contract,
                # matching SQL NULL semantics)
                feats.append((asset_id, mime, 0, None, None, "", status))
            else:
                # degraded record (null/bad_magic/truncated/oversize):
                # the row survives with NULL features and the status
                # in the audit column — never a task crash (r9
                # dirty-binary contract)
                feats.append((asset_id, mime, None, None, None, None, status))
        yield pd.DataFrame(
            feats,
            columns=[
                "asset_id",
                "mime",
                "n_bytes",
                "feat_mean",
                "feat_std",
                "feat_head",
                "decode_status",
            ],
        )


@register(
    "multimodal_features",
    oracle=f"""
    WITH decoded AS ({_SQL_DECODE}),
    bytes AS (
      SELECT doc_id, status,
             [CAST(CAST(('0x' || substr(hex(encode(coalesce(body, ''))),
                                   2 * i + 1, 2)) AS INT) AS DOUBLE)
              for i in range(0, octet_length(encode(coalesce(body, ''))))] AS bv,
             octet_length(encode(coalesce(body, ''))) AS n
      FROM decoded
    ),
    mom AS (
      SELECT doc_id, status, n,
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
           CAST(CASE WHEN status = 'ok' THEN n
                     WHEN status = 'empty' THEN 0 END AS BIGINT) AS n_bytes,
           CASE WHEN status = 'ok' THEN round(mu, 6) END AS feat_mean,
           CASE WHEN status = 'ok' THEN round(sqrt(m2 - mu * mu), 6)
                END AS feat_std,
           CASE WHEN status = 'ok' THEN head
                WHEN status = 'empty' THEN '' END AS feat_head,
           status AS decode_status
    FROM mom
    """,
    tags=("north-star", "B23"),
    doc="mapInPandas decode+featurize pipeline over binary assets: "
    "Arrow batches in, typed features out.  Decode itself is stubbed "
    "(no codecs in container) but deterministic, and the oracle "
    "recomputes every feature in pure SQL over the TRUE UTF-8 bytes "
    "(hex(encode(body)) byte extraction — r6: the old "
    "ascii-codepoint shortcut diverged on non-ASCII payloads, caught "
    "by the dirty-corpus stress; population std via E[x²]−μ², "
    "rounded on both sides).  r9 dirty-binary: every asset keeps a "
    "row; a payload that fails the _safe_decode contract (missing, "
    "bad magic, truncated frame, over the decode budget) carries its "
    "status in decode_status with NULL features — degradation is "
    "per-record and auditable, never a task crash.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = binary_assets(spark, sf_dir)
    return assets.mapInPandas(extract_features, FEATURE_SCHEMA)


@register(
    "multimodal_feature_agg",
    oracle=f"""
    WITH decoded AS ({_SQL_DECODE}),
    means AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                  WHEN doc_id % 3 = 1 THEN 'audio/wav'
                  ELSE 'video/mp4' END AS mime,
             CASE WHEN status = 'ok' THEN
               round(list_aggregate(
                     [CAST(CAST(('0x' || substr(hex(encode(body)),
                                           2 * i + 1, 2)) AS INT) AS DOUBLE)
                      for i in range(0, octet_length(encode(body)))],
                     'sum')
                 / octet_length(encode(body)), 6) END AS feat_mean
      FROM decoded)
    SELECT mime,
           CAST(count(*) AS BIGINT) AS n_assets,
           round(avg(feat_mean), 6) AS mime_mean
    FROM means GROUP BY mime
    """,
    tags=("north-star",),
    doc="Cross-check of the pandas featurizer: byte-mean per asset "
    "recomputed in pure SQL over the true UTF-8 bytes (hex(encode) "
    "extraction, r6), aggregated per mime class.  Hash-matches the "
    "oracle, proving the UDF path and the declarative path agree.  "
    "Degraded assets (r9 dirty-binary) count toward n_assets but "
    "contribute no mean — avg() ignores NULL in both engines.",
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
            arr, status = _safe_decode(blob)
            if status != "ok":
                # degraded asset: zero frames, never a crash (r9
                # dirty-binary contract; multimodal_decode_audit is
                # the audit surface for the skip counts)
                continue
            b = arr.astype("uint8").tobytes()
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
    oracle=f"""
    WITH decoded AS ({_SQL_DECODE}),
    hexed AS (
      SELECT doc_id, hex(encode(body)) AS h,
             octet_length(encode(body)) AS nb
      FROM decoded WHERE status = 'ok')
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
            arr, status = _safe_decode(blob)
            if status != "ok":
                # an empty/degraded asset has no perceptual signature
                # (r6 dirty contract, widened by the r9 dirty-binary
                # statuses) — it cannot participate in near-dup pairing
                continue
            n = len(arr)
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
    WITH decoded AS ({_SQL_DECODE}),
    codes AS (
      SELECT doc_id,
             [CAST(('0x' || substr(hex(encode(body)),
                                   2 * ((i * 7) % octet_length(encode(body))) + 1,
                                   2)) AS INT)
              for i in range(0, {_PHASH_BITS})] AS c
      FROM decoded
      WHERE status = 'ok'
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
            arr, status = _safe_decode(blob)
            if status != "ok":
                continue  # degraded asset: zero windows, never a crash
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
    WITH decoded AS ({_SQL_DECODE}),
    hexed AS (
      SELECT doc_id, hex(encode(body)) AS h,
             octet_length(encode(body)) AS nb
      FROM decoded WHERE status = 'ok')
    SELECT doc_id AS asset_id,
           CAST(g AS INT) AS win_no,
           round(sqrt(CAST(list_aggregate(
             [CAST(('0x' || substr(h, (g*{_AUDIO_WIN} + i - 1) * 2 + 1, 2))
                   AS INT)
              * CAST(('0x' || substr(h, (g*{_AUDIO_WIN} + i - 1) * 2 + 1, 2))
                     AS INT)
              for i in range(1, {_AUDIO_WIN} + 1)], 'sum') AS DOUBLE)
             / 64.0), 6) AS rms
    FROM hexed,
         (SELECT unnest(range(0, {_AUDIO_MAX_WIN})) AS g)
    WHERE doc_id % 3 = 1
      AND g < nb // {_AUDIO_WIN}
    """,
    tags=("north-star", "B23", "B16"),
    doc="Audio windowed-energy extraction over opaque binary assets: "
    "mime-filtered audio blobs decode in mapInPandas (stub codec = "
    "byte identity) and emit RMS per fixed 64-sample window (max 8) "
    "— the framing pass VAD / loudness normalization / silence "
    "trimming build on, completing the multimodal legs (image "
    "pHash, video frame sampling, audio energy).  One scan, no "
    "shuffle, window rows fan out inside the Arrow batch; the "
    "oracle recomputes every window from the decoded UTF-8 BYTES "
    "via hex extraction (r9 code-review fix: the original "
    "length/ascii form counted CHARACTERS and squared CODEPOINTS, "
    "diverging from the byte-true Spark side on any multibyte 'ok' "
    "audio payload — the last decode leg still on the char "
    "shortcut the frame/pHash oracles dropped in r6), verifying "
    "the decode-window-reduce chain exactly.",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    audio = binary_assets(spark, sf_dir).filter(
        F.col("mime") == "audio/wav"
    ).select("asset_id", "blob")
    return audio.mapInPandas(
        _audio_energy, "asset_id long, win_no int, rms double"
    )


@register(
    "multimodal_decode_audit",
    oracle=f"""
    WITH decoded AS ({_SQL_DECODE})
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           status AS decode_status,
           CAST(count(*) AS BIGINT) AS n_assets,
           CAST(sum(CASE WHEN status = 'ok'
                         THEN octet_length(encode(body)) ELSE 0 END)
                AS BIGINT) AS decoded_bytes
    FROM decoded GROUP BY 1, 2
    """,
    tags=("north-star", "B23", "B7"),
    doc="The decode-health audit surface for the multimodal family "
    "(r9 VERDICT item 3): per (mime, decode_status) asset counts and "
    "total decoded bytes, computed from multimodal_features' "
    "per-record status column.  A corrupt-payload storm (bad magic, "
    "truncated frames, oversize bombs) shows up HERE as counted "
    "degradations — the fan-out operators (frames, audio windows, "
    "pHash) silently skip those records, so without this rollup a "
    "decode regression is invisible until coverage drops.  On clean "
    "fixtures every row is 'ok'/'empty'; the dirty-binary stress "
    "(tools/scale_stress.py --dirty-binary) plants one asset per "
    "failure class and pins the exact counts.  Scale: one scan, one "
    "map-side-combinable aggregate over a <=18-group frame (3 mimes "
    "x 6 statuses).",
)
def multimodal_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = multimodal_features(spark, sf_dir)
    return feats.groupBy("mime", "decode_status").agg(
        F.count(F.lit(1)).cast("long").alias("n_assets"),
        F.sum(
            F.when(F.col("decode_status") == "ok", F.col("n_bytes")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("decoded_bytes"),
    )
