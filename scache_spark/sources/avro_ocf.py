"""Avro Object Container File source + sink as a Spark 4 Python Data
Source — the engine-side artifact for the reference's Avro
serialization leg (serializer/GenericAvroSerializer.scala:36-71,
which ships datum-level Avro encode/decode over Kryo; here the same
wire format is a first-class *relation* format instead, because in a
DataFrame engine the serializer surface IS the source/sink surface).

The sandbox has no ``spark-avro`` datasource jar and no Python avro
package, so the codec is implemented here directly from the PUBLIC
Apache Avro 1.11 specification (binary encoding + object container
files).  Scope: null, boolean, int, long, float, double, bytes,
string, nullable unions ``["null", T]``, the date /
timestamp-micros / local-timestamp-micros logical types, arrays
(spec "Arrays": block-framed counts, negative-count byte-size form
accepted on read), and (r7, datum-generic parity with
GenericAvroSerializer.scala:36-71) string-keyed maps, nested
records, and any nesting of the three.  Decimals/fixed/enums fail
loudly at schema-mapping time.

Scale shape: one OCF part file per write task (temp-name + rename so
a crashed task never leaves a file that looks finished), one Spark
input partition per part file on read — the source parallelizes like
any file scan, and block-framed decode streams records without
materializing a file in memory.
"""

from __future__ import annotations

import datetime
import json
import os
import struct
import uuid
from collections.abc import Iterator
from hashlib import md5

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T
from pyspark.sql.types import StructType

MAGIC = b"Obj\x01"
_EPOCH = datetime.date(1970, 1, 1)
_EPOCH_TS_UTC = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
_EPOCH_TS_NAIVE = datetime.datetime(1970, 1, 1)

# ---------------------------------------------------------------------------
# primitive binary codec (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def enc_long(n: int) -> bytes:
    """Zigzag varint (spec: int and long are identical on the wire)."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def dec_long(buf: bytes, pos: int) -> tuple[int, int]:
    acc, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def enc_bytes(b: bytes) -> bytes:
    return enc_long(len(b)) + b


def dec_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = dec_long(buf, pos)
    return buf[pos : pos + n], pos + n


# ---------------------------------------------------------------------------
# schema mapping (Spark StructType <-> Avro record schema JSON)
# ---------------------------------------------------------------------------

_SPARK_TO_AVRO = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def _scalar_avro_type(dt_obj, where: str) -> object:
    dt = type(dt_obj)
    if dt in _SPARK_TO_AVRO:
        return _SPARK_TO_AVRO[dt]
    if dt is T.DateType:
        return {"type": "int", "logicalType": "date"}
    if dt is T.TimestampType:
        return {"type": "long", "logicalType": "timestamp-micros"}
    if dt is T.TimestampNTZType:
        # NTZ is WALL TIME, not an instant: the spec's
        # local-timestamp-micros logical type, encoded with zero zone
        # math (conflating it with timestamp-micros would bake the
        # writer host's offset into a value that has none).
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    raise ValueError(f"avro_ocf: unsupported Spark type {dt_obj} for {where}")


_NESTED_SEQ = [0]  # unique record names: the spec requires fullname
# uniqueness within a schema, and anonymous Spark structs have none


def _avro_type(dt, where: str, name_hint: str) -> object:
    """Recursive Spark type -> Avro type (r7: records, maps, and
    arbitrarily nested arrays — the datum-generic parity leg with the
    reference's GenericAvroSerializer.scala:36-71, which serializes
    any GenericRecord, not just flat ones)."""
    if isinstance(dt, T.ArrayType):
        item = _avro_type(dt.elementType, f"array element of {where}", name_hint)
        return {
            "type": "array",
            "items": ["null", item] if dt.containsNull else item,
        }
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError(
                f"avro_ocf: map keys must be string for {where} "
                "(Avro spec: maps have string keys)"
            )
        val = _avro_type(dt.valueType, f"map value of {where}", name_hint)
        return {
            "type": "map",
            "values": ["null", val] if dt.valueContainsNull else val,
        }
    if isinstance(dt, T.StructType):
        _NESTED_SEQ[0] += 1
        return {
            "type": "record",
            "name": f"{name_hint}_r{_NESTED_SEQ[0]}",
            "fields": [
                {
                    "name": f.name,
                    "type": ["null", _avro_type(f.dataType, f"field {f.name!r} of {where}", name_hint)]
                    if f.nullable
                    else _avro_type(f.dataType, f"field {f.name!r} of {where}", name_hint),
                }
                for f in dt.fields
            ],
        }
    return _scalar_avro_type(dt, where)


def spark_to_avro_schema(schema: StructType, name: str = "row") -> dict:
    _NESTED_SEQ[0] = 0
    fields = [
        {
            "name": f.name,
            "type": ["null", _avro_type(f.dataType, f"field {f.name!r}", name)]
            if f.nullable
            else _avro_type(f.dataType, f"field {f.name!r}", name),
        }
        for f in schema.fields
    ]
    return {"type": "record", "name": name, "fields": fields}


def _unwrap_union(at) -> tuple[bool, object]:
    nullable = isinstance(at, list)
    if nullable:
        nn = [t for t in at if t != "null"]
        if len(nn) != 1:
            raise ValueError(f"avro_ocf: only [null, T] unions supported: {at}")
        at = nn[0]
    return nullable, at


def _avro_type_ddl(at) -> str:
    _, at = _unwrap_union(at)
    if isinstance(at, dict) and at.get("type") == "array":
        return f"array<{_avro_type_ddl(at['items'])}>"
    if isinstance(at, dict) and at.get("type") == "map":
        return f"map<string, {_avro_type_ddl(at['values'])}>"
    if isinstance(at, dict) and at.get("type") == "record":
        inner = ", ".join(
            f"`{f['name']}`: {_avro_type_ddl(f['type'])}" for f in at["fields"]
        )
        return f"struct<{inner}>"
    logical = at.get("logicalType") if isinstance(at, dict) else None
    base = at["type"] if isinstance(at, dict) else at
    if logical == "date":
        return "date"
    if logical == "timestamp-micros":
        return "timestamp"
    if logical == "local-timestamp-micros":
        return "timestamp_ntz"
    return {
        "boolean": "boolean",
        "int": "int",
        "long": "bigint",
        "float": "float",
        "double": "double",
        "string": "string",
        "bytes": "binary",
    }[base]


def avro_to_spark_ddl(avro_schema: dict) -> str:
    return ", ".join(
        f"`{f['name']}` {_avro_type_ddl(f['type'])}"
        for f in avro_schema["fields"]
    )


def _type_kind(at) -> tuple:
    """(nullable, base_type, logical_type, extra) for one Avro type;
    ``extra`` is the element kind for arrays, the value kind for maps,
    and the ordered field-kind list for records (r7)."""
    nullable, at = _unwrap_union(at)
    if isinstance(at, dict) and at.get("type") == "array":
        return nullable, "array", None, _type_kind(at["items"])
    if isinstance(at, dict) and at.get("type") == "map":
        return nullable, "map", None, _type_kind(at["values"])
    if isinstance(at, dict) and at.get("type") == "record":
        return nullable, "record", None, [_field_kind(f) for f in at["fields"]]
    if isinstance(at, dict):
        return nullable, at["type"], at.get("logicalType"), None
    return nullable, at, None, None


def _field_kind(f: dict) -> tuple:
    return _type_kind(f["type"])


# ---------------------------------------------------------------------------
# datum codec against a parsed record schema
# ---------------------------------------------------------------------------


def _enc_value(base: str, logical: str | None, v, item_kind=None) -> bytes:
    if logical == "date":
        return enc_long((v - _EPOCH).days)
    if logical == "timestamp-micros":
        # Python workers surface TimestampType as NAIVE datetimes in
        # the OS-local zone — measured, not assumed: with
        # spark.sql.session.timeZone=Asia/Kolkata on a UTC host, the
        # classic (pickled) DataSource write path still hands workers
        # OS-local wall times and interprets reader output the same
        # way, so the OS zone is the ONE zone that round-trips the
        # instant exactly; attaching it makes the stored micros true
        # UTC on any host (Avro spec: timestamp-micros is an instant,
        # epoch-UTC), independent of the session timezone.
        # astimezone() on a naive datetime assumes the OS-local zone
        # and respects the fold attribute for DST-ambiguous times.
        if v.tzinfo is None:
            v = v.astimezone()
        return enc_long(
            (v - _EPOCH_TS_UTC) // datetime.timedelta(microseconds=1)
        )
    if logical == "local-timestamp-micros":
        # wall time with NO zone: micros since 1970-01-01T00:00 local,
        # zero zone math in either direction
        return enc_long(
            (v.replace(tzinfo=None) - _EPOCH_TS_NAIVE)
            // datetime.timedelta(microseconds=1)
        )
    if base == "array":
        # spec "Arrays": blocks of (count, items...), 0-terminated; a
        # single positive block is the simplest spec-valid writing.
        nullable_i, base_i, logical_i, inner = item_kind
        out = bytearray()
        if v is not None and len(v):
            out += enc_long(len(v))
            for x in v:
                if nullable_i:
                    if x is None:
                        out += enc_long(0)
                        continue
                    out += enc_long(1)
                elif x is None:
                    raise ValueError("avro_ocf: None in non-nullable array item")
                out += _enc_value(base_i, logical_i, x, inner)
        out += enc_long(0)
        return bytes(out)
    if base == "map":
        # spec "Maps": same block framing as arrays, entries are
        # (string key, value) pairs.  Spark hands maps as dicts.
        nullable_v, base_v, logical_v, inner = item_kind
        out = bytearray()
        if v:
            out += enc_long(len(v))
            for mk, mv in v.items():
                out += enc_bytes(str(mk).encode("utf-8"))
                if nullable_v:
                    if mv is None:
                        out += enc_long(0)
                        continue
                    out += enc_long(1)
                elif mv is None:
                    raise ValueError("avro_ocf: None in non-nullable map value")
                out += _enc_value(base_v, logical_v, mv, inner)
        out += enc_long(0)
        return bytes(out)
    if base == "record":
        # nested record: field-by-field concatenation (spec "Records")
        # — item_kind carries the ordered field kinds; Spark hands
        # nested structs as Row (tuple-like).
        return enc_record(item_kind, v)
    if base in ("long", "int"):
        return enc_long(int(v))
    if base == "double":
        return struct.pack("<d", float(v))
    if base == "float":
        return struct.pack("<f", float(v))
    if base == "string":
        return enc_bytes(str(v).encode("utf-8"))
    if base == "bytes":
        return enc_bytes(bytes(v))
    if base == "boolean":
        return b"\x01" if v else b"\x00"
    raise ValueError(f"avro_ocf: unsupported base type {base}")


def _dec_value(base: str, logical: str | None, buf: bytes, pos: int, item_kind=None):
    if base in ("long", "int"):
        n, pos = dec_long(buf, pos)
        if logical == "date":
            return _EPOCH + datetime.timedelta(days=n), pos
        if logical == "timestamp-micros":
            # inverse of the encode convention: UTC instant -> naive
            # local wall time, which is what Spark's Python row
            # converter expects for TimestampType.
            v = _EPOCH_TS_UTC + datetime.timedelta(microseconds=n)
            return v.astimezone().replace(tzinfo=None), pos
        if logical == "local-timestamp-micros":
            return _EPOCH_TS_NAIVE + datetime.timedelta(microseconds=n), pos
        return n, pos
    if base == "array":
        nullable_i, base_i, logical_i, inner = item_kind
        vals = []
        while True:
            cnt, pos = dec_long(buf, pos)
            if cnt == 0:
                return vals, pos
            if cnt < 0:  # spec: negative count block carries a byte size
                _, pos = dec_long(buf, pos)
                cnt = -cnt
            for _ in range(cnt):
                if nullable_i:
                    idx, pos = dec_long(buf, pos)
                    if idx == 0:
                        vals.append(None)
                        continue
                x, pos = _dec_value(base_i, logical_i, buf, pos, inner)
                vals.append(x)
    if base == "map":
        nullable_v, base_v, logical_v, inner = item_kind
        m = {}
        while True:
            cnt, pos = dec_long(buf, pos)
            if cnt == 0:
                return m, pos
            if cnt < 0:  # spec: negative count block carries a byte size
                _, pos = dec_long(buf, pos)
                cnt = -cnt
            for _ in range(cnt):
                kb, pos = dec_bytes(buf, pos)
                mk = kb.decode("utf-8")
                if nullable_v:
                    idx, pos = dec_long(buf, pos)
                    if idx == 0:
                        m[mk] = None
                        continue
                mv, pos = _dec_value(base_v, logical_v, buf, pos, inner)
                m[mk] = mv
    if base == "record":
        return dec_record(item_kind, buf, pos)
    if base == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if base == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if base == "string":
        b, pos = dec_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if base == "bytes":
        b, pos = dec_bytes(buf, pos)
        return b, pos
    if base == "boolean":
        return buf[pos] == 1, pos + 1
    raise ValueError(f"avro_ocf: unsupported base type {base}")


def enc_record(kinds: list[tuple], row) -> bytes:
    out = bytearray()
    for (nullable, base, logical, item_kind), v in zip(kinds, row):
        if nullable:
            if v is None:
                out += enc_long(0)  # union branch 0 = null
                continue
            out += enc_long(1)
        elif v is None:
            raise ValueError("avro_ocf: None in non-nullable field")
        out += _enc_value(base, logical, v, item_kind)
    return bytes(out)


def dec_record(
    kinds: list[tuple], buf: bytes, pos: int
) -> tuple[tuple, int]:
    vals = []
    for nullable, base, logical, item_kind in kinds:
        if nullable:
            idx, pos = dec_long(buf, pos)
            if idx == 0:
                vals.append(None)
                continue
        v, pos = _dec_value(base, logical, buf, pos, item_kind)
        vals.append(v)
    return tuple(vals), pos


# ---------------------------------------------------------------------------
# object container file framing
# ---------------------------------------------------------------------------


def write_ocf(path: str, avro_schema: dict, rows, block_rows: int = 4096) -> int:
    """Write one OCF file; returns the row count.  Blocks are framed
    every ``block_rows`` records so a reader never needs more than one
    block in memory (spec: 'Object Container Files')."""
    schema_json = json.dumps(avro_schema, sort_keys=True)
    sync = md5(schema_json.encode() + path.encode()).digest()  # any 16 bytes
    kinds = [_field_kind(f) for f in avro_schema["fields"]]
    n = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        # file metadata map: one block of entries, then the 0 terminator
        f.write(enc_long(2))
        f.write(enc_bytes(b"avro.schema") + enc_bytes(schema_json.encode()))
        f.write(enc_bytes(b"avro.codec") + enc_bytes(b"null"))
        f.write(enc_long(0))
        f.write(sync)
        buf, cnt = bytearray(), 0
        for row in rows:
            buf += enc_record(kinds, row)
            cnt += 1
            n += 1
            if cnt >= block_rows:
                f.write(enc_long(cnt) + enc_long(len(buf)) + bytes(buf) + sync)
                buf, cnt = bytearray(), 0
        if cnt:
            f.write(enc_long(cnt) + enc_long(len(buf)) + bytes(buf) + sync)
    return n


def _read_varint_f(f) -> int | None:
    """File-object zigzag varint; None at clean EOF."""
    acc, shift = 0, 0
    first = f.read(1)
    if not first:
        return None
    b = first[0]
    while True:
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
        nxt = f.read(1)
        if not nxt:
            raise ValueError("avro_ocf: truncated varint")
        b = nxt[0]
    return (acc >> 1) ^ -(acc & 1)


def _read_header_f(f) -> tuple[dict, bytes]:
    """Consume magic + metadata map + sync; returns (schema, sync)."""
    if f.read(4) != MAGIC:
        raise ValueError("avro_ocf: bad magic")
    meta: dict[bytes, bytes] = {}
    while True:
        cnt = _read_varint_f(f)
        if cnt == 0:
            break
        if cnt < 0:  # spec: negative count block carries a byte size
            _read_varint_f(f)
            cnt = -cnt
        for _ in range(cnt):
            k = f.read(_read_varint_f(f))
            v = f.read(_read_varint_f(f))
            meta[k] = v
    return json.loads(meta[b"avro.schema"].decode()), f.read(16)


def read_ocf_header(path: str) -> dict:
    """Parse just the header; returns the avro schema dict."""
    with open(path, "rb") as f:
        schema, _ = _read_header_f(f)
    return schema


def read_ocf(path: str) -> Iterator[tuple]:
    """Stream records block-by-block — peak memory is one block, not
    the file, so part-file size never bounds executor memory."""
    with open(path, "rb") as f:
        schema, sync = _read_header_f(f)
        kinds = [_field_kind(fd) for fd in schema["fields"]]
        while True:
            cnt = _read_varint_f(f)
            if cnt is None:
                return
            size = _read_varint_f(f)
            block = f.read(size)
            pos = 0
            for _ in range(cnt):
                rec, pos = dec_record(kinds, block, pos)
                yield rec
            if pos != size:
                raise ValueError(f"avro_ocf: block over/under-read in {path}")
            if f.read(16) != sync:
                raise ValueError(f"avro_ocf: sync marker mismatch in {path}")


# ---------------------------------------------------------------------------
# Spark Python Data Source
# ---------------------------------------------------------------------------


class _AvroFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _committed_parts(path: str) -> list[str]:
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise FileNotFoundError(
            f"avro_ocf: {path} has no _SUCCESS marker — uncommitted write"
        )
    return sorted(
        os.path.join(path, fn)
        for fn in os.listdir(path)
        if fn.endswith(".avro")
    )


class AvroOcfReader(DataSourceReader):
    def __init__(self, options: dict):
        self.files = _committed_parts(options["path"])

    def partitions(self) -> list[InputPartition]:
        return [_AvroFile(p) for p in self.files]

    def read(self, partition: _AvroFile) -> Iterator[tuple]:
        return read_ocf(partition.path)


class AvroPartCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class AvroOcfWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite
        self.avro_schema = spark_to_avro_schema(schema)

    def write(self, rows: Iterator) -> AvroPartCommit:
        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.avro")
        tmp = part + ".inprogress"
        n = write_ocf(tmp, self.avro_schema, (tuple(r) for r in rows))
        os.rename(tmp, part)
        return AvroPartCommit(part, n)

    def commit(self, messages: list[AvroPartCommit]) -> None:
        written = {m.path for m in messages if m is not None}
        if self.overwrite:
            for fn in os.listdir(self.path):
                full = os.path.join(self.path, fn)
                if fn.endswith(".avro") and full not in written:
                    os.remove(full)
        tmp = os.path.join(self.path, "_SUCCESS.tmp")
        with open(tmp, "w") as f:
            f.write(json.dumps({"rows": sum(m.rows for m in messages if m)}))
        os.rename(tmp, os.path.join(self.path, "_SUCCESS"))

    def abort(self, messages: list[AvroPartCommit]) -> None:
        # messages may arrive as nulls (PythonBatchWrite on 4.1);
        # in-progress temp files are always safe to drop.
        if os.path.isdir(self.path):
            for fn in os.listdir(self.path):
                if fn.endswith(".inprogress"):
                    os.remove(os.path.join(self.path, fn))


class AvroOcfDataSource(DataSource):
    """``spark.read.format("avro_ocf").option("path", d).load()`` /
    ``df.write.format("avro_ocf").option("path", d).save()`` after
    :func:`register_avro_ocf`."""

    @classmethod
    def name(cls) -> str:
        return "avro_ocf"

    def schema(self) -> str:
        files = _committed_parts(self.options["path"])
        if not files:
            raise ValueError(f"avro_ocf: no part files under {self.options['path']}")
        return avro_to_spark_ddl(read_ocf_header(files[0]))

    def reader(self, schema: StructType) -> DataSourceReader:
        return AvroOcfReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return AvroOcfWriter(self.options, schema, overwrite)


def register_avro_ocf(spark) -> None:
    from scache_spark.sources import pin_thread_active_session

    pin_thread_active_session(spark)
    spark.dataSource.register(AvroOcfDataSource)
