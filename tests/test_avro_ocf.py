"""Unit tests for the from-spec Avro OCF codec + Python Data Source
(sources/avro_ocf.py) — the serialization-parity artifact for the
reference's GenericAvroSerializer.scala."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from scache_spark.sources import avro_ocf as A


def test_zigzag_varint_roundtrip():
    for n in (0, 1, -1, 63, 64, -64, -65, 2**31 - 1, -(2**31), 2**62, -(2**63), 2**63 - 1):
        buf = A.enc_long(n)
        back, pos = A.dec_long(buf, 0)
        assert back == n and pos == len(buf)


def test_ocf_file_roundtrip_with_nulls(tmp_path):
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "x", "type": ["null", "double"]},
            {"name": "b", "type": "boolean"},
            {"name": "d", "type": ["null", {"type": "int", "logicalType": "date"}]},
        ],
    }
    rows = [
        (0, "", 0.0, True, datetime.date(1970, 1, 1)),
        (-5, None, None, False, None),
        (2**40, "héllo ☃", -1.5e300, True, datetime.date(2031, 12, 31)),
    ]
    p = str(tmp_path / "t.avro")
    assert A.write_ocf(p, schema, rows, block_rows=2) == 3  # forces 2 blocks
    assert list(A.read_ocf(p)) == rows
    assert A.read_ocf_header(p) == schema


def test_unsupported_type_fails_loudly():
    st = T.StructType([T.StructField("a", T.DecimalType(10, 2))])
    with pytest.raises(ValueError, match="unsupported Spark type"):
        A.spark_to_avro_schema(st)
    # Avro maps have string keys by spec — anything else is loud
    intkey = T.StructType(
        [T.StructField("a", T.MapType(T.LongType(), T.LongType()))]
    )
    with pytest.raises(ValueError, match="map keys must be string"):
        A.spark_to_avro_schema(intkey)


def test_ocf_array_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "v", "type": {"type": "array", "items": ["null", "float"]}},
            {
                "name": "w",
                "type": ["null", {"type": "array", "items": "long"}],
            },
        ],
    }
    rows = [
        (1, [1.5, None, -2.25], [7, -8]),
        (2, [], None),
        (3, [0.0], []),
    ]
    p = str(tmp_path / "arr.avro")
    assert A.write_ocf(p, schema, rows, block_rows=2) == 3
    assert list(A.read_ocf(p)) == rows
    assert A.avro_to_spark_ddl(schema) == "`k` bigint, `v` array<float>, `w` array<bigint>"


def test_array_negative_count_block_read():
    """Spec: writers MAY frame an array block as (negative count,
    byte size, items); our reader must accept it even though our
    writer emits the positive form."""
    item_kind = A._type_kind("long")
    items = A.enc_long(10) + A.enc_long(20)
    buf = A.enc_long(-2) + A.enc_long(len(items)) + items + A.enc_long(0)
    vals, pos = A._dec_value("array", None, buf, 0, item_kind)
    assert vals == [10, 20] and pos == len(buf)


def test_uncommitted_dir_rejected(tmp_path):
    d = tmp_path / "dir"
    d.mkdir()
    (d / "part-zzz.avro").write_bytes(b"Obj\x01junk")
    with pytest.raises(FileNotFoundError, match="_SUCCESS"):
        A._committed_parts(str(d))


def test_spark_write_read_exact(spark, tmp_path):
    A.register_avro_ocf(spark)
    df = spark.createDataFrame(
        [
            Row(k=1, s="a", ts=datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)),
            Row(k=2, s=None, ts=None),
        ],
        "k bigint, s string, ts timestamp",
    )
    out = str(tmp_path / "avro_out")
    df.write.format("avro_ocf").option("path", out).mode("overwrite").save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    back = spark.read.format("avro_ocf").option("path", out).load()
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_spark_array_column_roundtrip(spark, tmp_path):
    """The r6 array leg end-to-end through the registered data source:
    array<float> (the embeddings shape) and a nullable array<bigint>
    survive the distributed write/read bit-exactly."""
    A.register_avro_ocf(spark)
    df = spark.createDataFrame(
        [
            Row(k=1, emb=[0.5, -1.25, 3.0], tags=[10, 20]),
            Row(k=2, emb=[], tags=None),
            Row(k=3, emb=[7.5], tags=[]),
        ],
        "k bigint, emb array<float>, tags array<bigint>",
    )
    out = str(tmp_path / "avro_arr")
    df.write.format("avro_ocf").option("path", out).mode("overwrite").save()
    back = spark.read.format("avro_ocf").option("path", out).load()
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_spark_dirty_vector_transport(spark, tmp_path):
    """SCALE.md §20 #6 (sources transport, operators validate): every
    dirty-embeddings corruption class — NULL vector, empty, wrong
    length, NULL element, NaN, ±Inf, -0.0, float32-edge magnitude —
    survives the distributed Avro write/read BIT-exactly.  The codec
    must not sanitize, drop, or reorder malformed vectors; that is
    vector_ready's job downstream."""
    import math
    import struct as _s

    A.register_avro_ocf(spark)
    rows = [
        Row(k=1, emb=None),
        Row(k=2, emb=[]),
        Row(k=3, emb=[0.5] * 32),
        Row(k=4, emb=[0.5] * 128),
        Row(k=5, emb=[1.0, None, 2.0]),
        Row(k=6, emb=[float("nan"), 1.0]),
        Row(k=7, emb=[float("inf"), float("-inf")]),
        Row(k=8, emb=[-0.0, 0.0]),
        Row(k=9, emb=[1.0e20, -1.0e20, 3.0e38]),
    ]
    df = spark.createDataFrame(rows, "k bigint, emb array<float>")
    out = str(tmp_path / "avro_dirty_vec")
    df.write.format("avro_ocf").option("path", out).mode("overwrite").save()
    back = spark.read.format("avro_ocf").option("path", out).load()
    assert back.schema == df.schema
    got = {r.k: r.emb for r in back.collect()}
    assert len(got) == len(rows)
    for r in rows:
        want, have = r.emb, got[r.k]
        if want is None:
            assert have is None
            continue
        assert len(have) == len(want)
        for w, h in zip(want, have):
            if w is None:
                assert h is None
            else:  # bit-exact float32: NaN payload, signed zero, Inf
                assert _s.pack("<f", h) == _s.pack("<f", w), (r.k, w, h)
    # explicit: NaN transported AS NaN (not None, not 0.0)
    assert math.isnan(got[6][0])


# ---------------------------------------------------------------------------
# property: arbitrary rows survive the full OCF round trip bit-exactly
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),   # long
        st.one_of(st.none(), st.text(max_size=40)),             # null|string
        st.one_of(
            st.none(),
            st.floats(allow_nan=False, width=64),               # null|double
        ),
        st.booleans(),
        st.binary(max_size=32),                                 # bytes
    ),
    min_size=1,
    max_size=50,
)

_PROP_SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "x", "type": ["null", "double"]},
        {"name": "b", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
    ],
}


@settings(max_examples=150, deadline=None)
@given(_ROWS, st.integers(min_value=1, max_value=7))
def test_ocf_roundtrip_property(tmp_path_factory, rows, block_rows):
    """Any mix of extreme longs, unicode, null unions, subnormal
    doubles, and raw bytes round-trips bit-exactly through the OCF
    writer/reader at any block framing."""
    p = str(tmp_path_factory.mktemp("avro_prop") / "t.avro")
    assert A.write_ocf(p, _PROP_SCHEMA, rows, block_rows=block_rows) == len(rows)
    back = list(A.read_ocf(p))
    assert len(back) == len(rows)
    for got, want in zip(back, rows):
        assert got[0] == want[0] and got[1] == want[1]
        if want[2] is None:
            assert got[2] is None
        else:  # bit-exact double (covers -0.0 and subnormals)
            import struct as _s
            assert _s.pack("<d", got[2]) == _s.pack("<d", want[2])
        assert got[3] == want[3] and got[4] == want[4]


# ---------------------------------------------------------------------------
# r7: NTZ wall-time semantics + instant correctness under a foreign
# session timezone (ADVICE r6: timestamp portability)
# ---------------------------------------------------------------------------


def test_ntz_local_timestamp_micros_roundtrip(spark, tmp_path):
    """TimestampNTZType maps to the spec's local-timestamp-micros (NOT
    timestamp-micros: NTZ is wall time, no instant semantics), and the
    wall time round-trips exactly with zero zone math."""
    wall = datetime.datetime(2024, 3, 10, 2, 30, 0, 123456)  # inside a
    # US DST gap — a wall time no zone-math path can round-trip
    A.register_avro_ocf(spark)
    df = spark.createDataFrame(
        [Row(k=1, t=wall), Row(k=2, t=None)],
        "k bigint, t timestamp_ntz",
    )
    out = str(tmp_path / "avro_ntz")
    df.write.format("avro_ocf").option("path", out).mode("overwrite").save()
    parts = [f for f in os.listdir(out) if f.endswith(".avro")]
    hdr = A.read_ocf_header(os.path.join(out, parts[0]))
    (tf,) = [f for f in hdr["fields"] if f["name"] == "t"]
    assert tf["type"][1]["logicalType"] == "local-timestamp-micros"
    back = spark.read.format("avro_ocf").option("path", out).load()
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # the stored long IS the naive wall micros — no host offset baked in
    rows = [
        r for p in parts for r in A.read_ocf(os.path.join(out, p))
    ]
    stored = {k: t for k, t in rows}
    assert stored[1] == wall and stored[2] is None


def test_timestamp_instant_true_utc_under_foreign_session_tz(spark, tmp_path):
    """The instant path stores TRUE UTC micros even when
    spark.sql.session.timeZone differs from the OS zone — measured
    via cast-to-epoch (zone-independent) across the round trip.  This
    pins the r6-probe finding: the classic pickled DataSource path
    converts with the OS zone in BOTH directions, so the codec's
    OS-zone attachment composes to the exact instant regardless of
    the session setting."""
    A.register_avro_ocf(spark)
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        df = spark.createDataFrame(
            [Row(k=1, ts=datetime.datetime(2024, 1, 2, 3, 4, 5, 123456))],
            "k bigint, ts timestamp",
        )
        (epoch_in,) = df.select(F.unix_micros("ts")).first()
        out = str(tmp_path / "avro_tz")
        df.write.format("avro_ocf").option("path", out).mode(
            "overwrite"
        ).save()
        back = spark.read.format("avro_ocf").option("path", out).load()
        (epoch_out,) = back.select(F.unix_micros("ts")).first()
        assert epoch_out == epoch_in
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


# ---------------------------------------------------------------------------
# r7: nested types — records, maps, arrays-of-records
# ---------------------------------------------------------------------------


def test_nested_types_spark_roundtrip(spark, tmp_path):
    """r7 datum-generic leg: struct, map<string,_>, array<struct>, and
    array<array<_>> columns round-trip through the registered data
    source exactly (GenericAvroSerializer.scala:36-71 serializes any
    GenericRecord; the relation-format twin must too)."""
    A.register_avro_ocf(spark)
    ddl = (
        "k bigint, "
        "pt struct<x: double, y: double>, "
        "attrs map<string, bigint>, "
        "hops array<struct<node: string, ms: bigint>>, "
        "grid array<array<bigint>>"
    )
    df = spark.createDataFrame(
        [
            (
                1,
                {"x": 1.5, "y": -2.5},
                {"a": 1, "b": None},
                [{"node": "n1", "ms": 10}, {"node": "n2", "ms": 20}],
                [[1, 2], [], [3]],
            ),
            (2, None, {}, [], None),
            (3, {"x": 0.0, "y": 0.0}, None, None, [[]]),
        ],
        ddl,
    )
    out = str(tmp_path / "avro_nested")
    df.write.format("avro_ocf").option("path", out).mode("overwrite").save()
    back = spark.read.format("avro_ocf").option("path", out).load()
    assert back.schema == df.schema
    a = sorted(back.collect(), key=lambda r: r.k)
    b = sorted(df.collect(), key=lambda r: r.k)
    assert a == b


def test_nested_ocf_file_roundtrip(tmp_path):
    """Codec-level nested round trip without Spark: record-in-record,
    map values of arrays, nullable inner unions."""
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "k", "type": "long"},
            {
                "name": "inner",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "inner_r",
                        "fields": [
                            {"name": "s", "type": ["null", "string"]},
                            {
                                "name": "vals",
                                "type": {"type": "array", "items": "long"},
                            },
                        ],
                    },
                ],
            },
            {
                "name": "m",
                "type": {
                    "type": "map",
                    "values": ["null", {"type": "array", "items": "double"}],
                },
            },
        ],
    }
    rows = [
        (1, ("héllo", [1, 2, 3]), {"a": [1.5], "b": None}),
        (2, None, {}),
        (3, (None, []), {"z": []}),
    ]
    p = str(tmp_path / "nested.avro")
    assert A.write_ocf(p, schema, rows, block_rows=2) == 3
    assert list(A.read_ocf(p)) == rows


# ---------------------------------------------------------------------------
# r8: OS-timezone portability across PROCESSES (VERDICT r7 item 5) —
# the r7 claim "stored micros are true UTC on any host" was asserted
# from one in-session measurement; this proves it with mismatched TZ
# env between writer and reader processes, both directions.
# ---------------------------------------------------------------------------

_TZ_INSTANT_EPOCH_S = 1_700_000_000  # an absolute instant (zone-free)
_TZ_WALL = "2024-03-01 12:34:56"  # an NTZ wall time (zone-free)

_TZ_WRITE_SRC = """
import sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = (SparkSession.builder.master("local[1]")
         .config("spark.sql.shuffle.partitions", "1")
         .config("spark.ui.enabled", "false").getOrCreate())
from scache_spark.sources.avro_ocf import register_avro_ocf
register_avro_ocf(spark)
df = spark.range(1).select(
    F.lit(1).cast("bigint").alias("k"),
    F.timestamp_seconds(F.lit(%d)).alias("ts"),
    F.lit("%s").cast("timestamp_ntz").alias("tw"),
)
df.write.format("avro_ocf").option("path", sys.argv[1]).mode(
    "overwrite").save()
spark.stop()
"""

_TZ_READ_SRC = """
import sys
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = (SparkSession.builder.master("local[1]")
         .config("spark.sql.shuffle.partitions", "1")
         .config("spark.ui.enabled", "false").getOrCreate())
from scache_spark.sources.avro_ocf import register_avro_ocf
register_avro_ocf(spark)
back = spark.read.format("avro_ocf").option("path", sys.argv[1]).load()
r = back.select(
    F.unix_micros("ts").alias("e"),
    F.col("tw").cast("string").alias("w"),
).first()
print("RESULT", r["e"], r["w"], flush=True)
if len(sys.argv) > 2:  # optionally re-publish under THIS zone
    back.write.format("avro_ocf").option("path", sys.argv[2]).mode(
        "overwrite").save()
spark.stop()
"""


def _tz_subprocess(src: str, tz: str, *paths: str) -> str:
    import subprocess
    import sys

    env = dict(os.environ, TZ=tz)
    out = subprocess.run(
        [sys.executable, "-c", src, *paths],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_timestamp_portability_across_os_timezones(tmp_path):
    """Writer and reader run in SEPARATE processes with mismatched TZ
    env (Asia/Kolkata vs UTC, then the reverse): timestamp-micros
    must round-trip the INSTANT exactly (unix_micros is
    zone-independent) and local-timestamp-micros must round-trip the
    WALL string exactly — on any pair of hosts, per the Avro spec
    (timestamp-micros is epoch-UTC; local-* carries no zone).  The
    UTC leg both reads the Kolkata file AND re-publishes it, covering
    the reverse direction with three JVM launches instead of four."""
    write_src = _TZ_WRITE_SRC % (_TZ_INSTANT_EPOCH_S, _TZ_WALL)
    want_e = _TZ_INSTANT_EPOCH_S * 1_000_000

    def _assert_result(out: str, leg: str) -> None:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        _, e, wall = line.split(" ", 2)
        assert int(e) == want_e, f"{leg} instant drifted: {e}"
        assert wall.startswith(_TZ_WALL), f"{leg} wall drifted: {wall}"

    p1 = str(tmp_path / "kolkata_written")
    p2 = str(tmp_path / "utc_written")
    _tz_subprocess(write_src, "Asia/Kolkata", p1)
    out = _tz_subprocess(_TZ_READ_SRC, "UTC", p1, p2)
    _assert_result(out, "Kolkata->UTC")
    out = _tz_subprocess(_TZ_READ_SRC, "Asia/Kolkata", p2)
    _assert_result(out, "UTC->Kolkata")
