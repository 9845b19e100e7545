"""JVM-native protobuf path conformance (r4 verdict item 5).

`ProtobufMarshaler(native=True)` (`components/cqrs.py`) switches the codec
from the Python protowire UDF to Spark's `to_protobuf`/`from_protobuf`
against a descriptor set built by `protowire.build_descriptor_set`. Vanilla
pyspark ships the Python wrappers but NOT the spark-protobuf JVM artifact,
so the native path cannot execute in this container — these tests probe for
the artifact at session level and round-trip protowire's golden vectors
through the JVM when present, skipping with the exact reason otherwise
(the same gating pattern as the Kafka conformance rig,
`sources/kafka_testing.py`).

Also pins the proto2 boundary: group wire types (3/4 — proto2-only,
removed in proto3) are REJECTED at decode, while unknown field numbers
(how proto2 extensions appear on a proto3 wire) are PRESERVED verbatim —
dropped silently by neither path.

Reference parity: `components/cqrs/marshaler_protobuf.go:15-85` marshals
via the Go protobuf runtime; the protowire tests pin wire equivalence, and
this rig extends the same golden bytes to the JVM runtime when available.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from watermill_spark.components.protowire import (
    Field,
    build_descriptor_set,
    decode_message,
    encode_message,
)

# Golden vectors shared with test_cqrs.py (hand-computed from the public
# wire spec): (name, fields, value-dict, spark schema, spark row)
GOLDENS = [
    (
        "Scalars",
        [Field(1, "id", "string"), Field(2, "amount", "int64")],
        {"id": "hi", "amount": 150},
        StructType(
            [
                StructField("id", StringType()),
                StructField("amount", LongType()),
            ]
        ),
        Row(id="hi", amount=150),
    ),
    (
        "Packed",
        [Field(1, "xs", "int64", repeated=True)],
        {"xs": [3, 270]},
        StructType([StructField("xs", ArrayType(LongType()))]),
        Row(xs=[3, 270]),
    ),
    (
        "Nested",
        [Field(1, "inner", "message", message=(Field(1, "n", "int64"),))],
        {"inner": {"n": 5}},
        StructType(
            [
                StructField(
                    "inner", StructType([StructField("n", LongType())])
                )
            ]
        ),
        Row(inner=Row(n=5)),
    ),
]


def _native_probe(spark):
    """(available, reason). Executes a minimal to_protobuf to detect the
    spark-protobuf JVM artifact — the Python wrapper always imports."""
    try:
        from pyspark.sql.protobuf.functions import to_protobuf
    except ImportError as exc:  # pragma: no cover - wrapper ships w/ pyspark
        return False, f"pyspark.sql.protobuf missing: {exc}"
    try:
        ds = build_descriptor_set(
            "watermill", "Probe", [Field(1, "id", "string")]
        )
        (
            spark.range(1)
            .select(F.struct(F.lit("x").alias("id")).alias("s"))
            .select(
                to_protobuf("s", "watermill.Probe", binaryDescriptorSet=ds)
            )
            .collect()
        )
        return True, ""
    except Exception as exc:  # noqa: BLE001 - any JVM failure = unavailable
        return False, (
            "spark-protobuf JVM artifact not on the classpath "
            f"(expected in vanilla pyspark): {type(exc).__name__}"
        )


@pytest.fixture(scope="module")
def native(spark):
    ok, reason = _native_probe(spark)
    if not ok:
        pytest.skip(f"native protobuf path unavailable: {reason}")
    return True


@pytest.mark.parametrize("name,fields,value,schema,row", GOLDENS,
                         ids=[g[0] for g in GOLDENS])
def test_native_roundtrips_protowire_golden_vectors(
    spark, native, name, fields, value, schema, row
):
    """Cross-runtime conformance: protowire bytes must decode identically
    in the JVM (from_protobuf), and JVM bytes must decode identically in
    protowire (serialization is not canonical, so bytes are compared by
    decoded VALUE, not byte equality)."""
    from pyspark.sql.protobuf.functions import from_protobuf, to_protobuf

    ds = build_descriptor_set("watermill", name, fields)
    wire = encode_message(value, fields)

    # protowire -> JVM
    decoded = (
        spark.createDataFrame([(wire,)], "payload binary")
        .select(
            from_protobuf(
                "payload", f"watermill.{name}", binaryDescriptorSet=ds
            ).alias("s")
        )
        .select("s.*")
        .collect()
    )
    assert decoded == [row]

    # JVM -> protowire
    jvm_bytes = (
        spark.createDataFrame([row], schema)
        .select(
            to_protobuf(
                F.struct(*[F.col(f.name) for f in fields]),
                f"watermill.{name}",
                binaryDescriptorSet=ds,
            ).alias("p")
        )
        .collect()[0]["p"]
    )
    assert decode_message(bytes(jvm_bytes), fields) == value


def test_proto2_groups_rejected_extensions_preserved():
    """proto2 boundary (documented, runs everywhere):

    - GROUP wire types (3 start / 4 end) are proto2-only and were removed
      in proto3 — the decoder rejects them loudly instead of guessing a
      skip length, on known and unknown field numbers alike (a known
      field number with a mismatched wire type routes through the
      unknown-field path per the spec, and _skip has no group arm).
    - proto2 EXTENSIONS have no schema-side representation (Field cannot
      declare one), and extension data on the wire is just an unknown
      field number — preserved verbatim under _unknown_fields and
      re-emitted on encode, per the Go runtime's round-trip contract.
    """
    fields = [Field(1, "id", "string")]
    with pytest.raises(ValueError, match="unsupported wire type"):
        decode_message(b"\x0b", fields)  # field 1, wire type 3 (SGROUP)
    with pytest.raises(ValueError, match="unsupported wire type"):
        decode_message(b"\x0c", fields)  # field 1, wire type 4 (EGROUP)

    # extension-style unknown field (number 99, varint 7) survives decode
    # + re-encode byte-for-byte alongside the known field
    wire = b"\x0a\x02hi" + b"\x98\x06\x07"  # id="hi", field 99 varint 7
    got = decode_message(wire, fields)
    assert got["id"] == "hi"
    assert got["_unknown_fields"] == b"\x98\x06\x07"
    assert encode_message(got, fields) == wire
