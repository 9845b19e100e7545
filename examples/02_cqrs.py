"""Example 2 — CQRS command/event flow with the protobuf codec.

The port's answer to `_examples/basic/5-cqrs-protobuf`: a command
(BookRoom) is sent on the CommandBus, its CommandProcessor handler emits an
event (RoomBooked) on the EventBus, and an EventProcessor projection
aggregates revenue — payloads are real protobuf wire bytes, including a
nested `guest` struct and a repeated `nights` field (round-3 protowire).

Run:  python examples/02_cqrs.py
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from watermill_spark.components.cqrs import (
    CommandBus,
    CommandProcessor,
    EventBus,
    EventProcessor,
    ProtobufMarshaler,
)
from watermill_spark.sources import MemoryPubSub

BOOK_ROOM = StructType(
    [
        StructField("room_id", StringType()),
        StructField(
            "guest",
            StructType(
                [
                    StructField("name", StringType()),
                    StructField("loyalty_tier", LongType()),
                ]
            ),
        ),
        StructField("nights", ArrayType(LongType())),  # night rates
    ]
)

ROOM_BOOKED = StructType(
    [
        StructField("room_id", StringType()),
        StructField("guest_name", StringType()),
        StructField("total", LongType()),
    ]
)


def main(spark=None, base_dir: str | None = None) -> dict:
    if spark is None:
        from watermill_spark.session import get_spark

        spark = get_spark("example-cqrs")
    ps = MemoryPubSub(spark, persistent=True)
    marshaler = ProtobufMarshaler()
    command_bus = CommandBus(ps, marshaler=marshaler)
    event_bus = EventBus(ps, marshaler=marshaler)

    # 1. send BookRoom commands
    bookings = spark.createDataFrame(
        [
            ("101", ("alice", 2), [120, 120, 140]),
            ("102", ("bob", 0), [90]),
            ("103", ("carol", 1), [200, 180]),
        ],
        BOOK_ROOM,
    )
    command_bus.send(bookings, "BookRoom", ["room_id", "guest", "nights"])

    # 2. command handler: validate + emit RoomBooked events
    def handle_book_room(typed):
        booked = typed.select(
            "room_id",
            F.col("guest.name").alias("guest_name"),
            F.aggregate("nights", F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
                "total"
            ),
        )
        event_bus.publish(booked, "RoomBooked", ["room_id", "guest_name", "total"])

    cp = CommandProcessor(ps, marshaler=marshaler)
    cp.add_handler("BookRoom", BOOK_ROOM, handle_book_room)
    cp.process_once()

    # 3. event handler: revenue projection (the read model)
    revenue = {}

    def project_revenue(typed):
        row = typed.agg(
            F.sum("total").cast("bigint").alias("rev"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        ).head()
        revenue.update({"total_revenue": row["rev"], "bookings": row["n"]})

    ep = EventProcessor(ps, marshaler=marshaler)
    ep.add_handler("RoomBooked", ROOM_BOOKED, project_revenue)
    ep.process_once()

    print(f"CQRS example: {revenue}")
    assert revenue == {"total_revenue": 850, "bookings": 3}, revenue
    return revenue


if __name__ == "__main__":
    main()
