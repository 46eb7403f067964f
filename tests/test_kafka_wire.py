"""Kafka RecordBatch v2 wire codec + socket round-trip (SURVEY 2 A3).

The sandbox has no broker and no spark-sql-kafka jar, so A3's wire
leg runs here against the self-written codec + MiniBroker stub
(streaming/kafka_wire.py): the production ``to_json(struct(*))``
projection (shared with write_kafka_stream via kafka_payload)
executes in Spark, real RecordBatch v2 bytes cross a real TCP
socket, and the consumed frame must equal the file-analogue
pipeline bit-for-bit.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from click_streaming_data_pipeline_spark.streaming.kafka_wire import (
    MiniBroker,
    WireRecord,
    crc32c,
    decode_record_batch,
    decode_varint,
    encode_record_batch,
    encode_varint,
    fetch,
    kafka_payload,
    produce,
    read_kafka_wire,
    write_kafka_wire,
)


def test_crc32c_public_vectors():
    # the canonical check vector (RFC 3720 appendix / zlib docs)
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # 32 zero bytes — published iSCSI test vector
    assert crc32c(bytes(32)) == 0x8A9136AA
    # 32 0xFF bytes — published iSCSI test vector
    assert crc32c(b"\xff" * 32) == 0x62A8AB43


def test_zigzag_varint_round_trip():
    cases = [0, -1, 1, -2, 2, 63, -64, 64, 127, 128, -65, 300,
             2**31 - 1, -(2**31), 2**40, -(2**40)]
    for v in cases:
        enc = encode_varint(v)
        got, pos = decode_varint(enc, 0)
        assert got == v and pos == len(enc), v
    # spec zigzag examples: 0->0, -1->1, 1->2, -2->3, 2->4
    assert encode_varint(0) == b"\x00"
    assert encode_varint(-1) == b"\x01"
    assert encode_varint(1) == b"\x02"
    assert encode_varint(-2) == b"\x03"
    assert encode_varint(2) == b"\x04"


def test_record_batch_layout_field_by_field():
    """Pin the v2 layout offsets against the public spec: baseOffset
    int64 @0, batchLength int32 @8, partitionLeaderEpoch int32 @12,
    magic=2 int8 @16, crc uint32 @17, attributes int16 @21, ..."""
    recs = [WireRecord(b"k1", b"v1", 1_700_000_000_000, [("h", b"x")])]
    blob = encode_record_batch(recs, base_offset=7)
    assert struct.unpack_from(">q", blob, 0)[0] == 7
    assert struct.unpack_from(">i", blob, 8)[0] == len(blob) - 12
    assert struct.unpack_from(">i", blob, 12)[0] == 0
    assert blob[16] == 2  # magic
    crc = struct.unpack_from(">I", blob, 17)[0]
    assert crc == crc32c(blob[21:])
    attributes = struct.unpack_from(">h", blob, 21)[0]
    assert attributes == 0  # uncompressed, create-time
    assert struct.unpack_from(">i", blob, 23)[0] == 0  # lastOffsetDelta
    assert struct.unpack_from(">q", blob, 27)[0] == 1_700_000_000_000
    assert struct.unpack_from(">q", blob, 35)[0] == 1_700_000_000_000
    assert struct.unpack_from(">q", blob, 43)[0] == -1  # producerId
    assert struct.unpack_from(">h", blob, 51)[0] == -1  # producerEpoch
    assert struct.unpack_from(">i", blob, 53)[0] == -1  # baseSequence
    assert struct.unpack_from(">i", blob, 57)[0] == 1  # record count


def test_record_batch_round_trip_nulls_headers_multirecord():
    recs = [
        WireRecord(None, b'{"a": 1}', 1000, []),
        WireRecord(b"42", None, 1005, [("h1", b"x"), ("h2", None)]),
        WireRecord(b"", b"", 990, [("empty", b"")]),
        WireRecord(b"u\xc3\xa9", "café".encode(), 1010, []),
    ]
    blob = encode_record_batch(recs, base_offset=100)
    base, got = decode_record_batch(blob)
    assert base == 100
    assert [(r.key, r.value, r.timestamp_ms, r.headers) for r in got] == [
        (r.key, r.value, r.timestamp_ms, r.headers) for r in recs
    ]


def test_decode_rejects_corruption():
    blob = bytearray(
        encode_record_batch([WireRecord(b"k", b"v", 1)], 0)
    )
    flipped = bytearray(blob)
    flipped[-1] ^= 0x01  # payload bit flip -> crc must catch it
    with pytest.raises(ValueError, match="crc32c"):
        decode_record_batch(bytes(flipped))
    wrong_magic = bytearray(blob)
    wrong_magic[16] = 1
    with pytest.raises(ValueError, match="magic"):
        decode_record_batch(bytes(wrong_magic))
    truncated = bytes(blob[:-2])
    with pytest.raises(ValueError, match="batchLength"):
        decode_record_batch(truncated)


def test_broker_assigns_monotone_offsets():
    broker = MiniBroker().start()
    try:
        addr = broker.address
        b0 = produce(addr, "t", encode_record_batch(
            [WireRecord(b"a", b"1", 1), WireRecord(b"b", b"2", 2)]))
        b1 = produce(addr, "t", encode_record_batch(
            [WireRecord(b"c", b"3", 3)]))
        assert (b0, b1) == (0, 2)
        blobs = fetch(addr, "t")
        bases = [decode_record_batch(b)[0] for b in blobs]
        assert bases == [0, 2]
        assert fetch(addr, "elsewhere") == []
    finally:
        broker.stop()


def test_wire_producer_round_trip_matches_file_analogue(spark, tmp_path):
    """A3 end-to-end: the production kafka_payload projection runs in
    Spark (write_kafka_stream's leg), RecordBatch v2 bytes cross the
    socket, read_kafka_wire consumes them — and (key, value) must
    equal the file-analogue projection of the same frame exactly."""
    rows = spark.createDataFrame(
        [
            (1, "created", 0.5, None),
            (2, "updated", None, "x"),
            (3, None, 2.25, "café"),
        ],
        "event_id long, op string, score double, note string",
    )
    src = str(tmp_path / "in")
    rows.repartition(2).write.parquet(src)

    broker = MiniBroker().start()
    try:
        stream = (
            spark.readStream.schema(rows.schema)
            .option("maxFilesPerTrigger", 1)  # >1 micro-batch (I5)
            .parquet(src)
        )
        q = (
            write_kafka_wire(
                stream,
                broker.address,
                "quality.checks",
                checkpoint_dir=str(tmp_path / "ckpt"),
                key_col="event_id",
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        got = read_kafka_wire(spark, broker.address, "quality.checks")
        # consumer contract mirrors read_kafka_stream: value/key
        # strings + kafka_ts + headers
        assert [f.name for f in got.schema.fields] == [
            "value", "key", "kafka_ts", "headers",
        ]
        want = {
            (r["key"], r["value"])
            for r in kafka_payload(rows, "event_id").collect()
        }
        have = {(r["key"], r["value"]) for r in got.collect()}
        assert have == want
        # headers carried the producing batch id; >1 distinct batch
        # proves the micro-batched leg, not one bulk write
        hdr = {
            bytes(h["value"]).decode()
            for r in got.select("headers").collect()
            for h in r["headers"]
            if h["key"] == "batch_id"
        }
        assert len(hdr) >= 2
    finally:
        broker.stop()


def test_write_kafka_stream_uses_shared_projection(spark):
    """The connector sink's serialization must BE kafka_payload —
    guard against the projections drifting apart (the wire test's
    authority depends on it)."""
    import inspect

    from click_streaming_data_pipeline_spark.streaming import kafka

    src = inspect.getsource(kafka.write_kafka_stream)
    assert "kafka_payload" in src


def _batch(vals, pid=-1, epoch=-1, seq=-1):
    return encode_record_batch(
        [WireRecord(None, v, 1_700_000_000_000) for v in vals],
        producer_id=pid,
        producer_epoch=epoch,
        base_sequence=seq,
    )


def test_idempotent_produce_dedupes_replayed_sequence():
    """KIP-98: a retried batch (same pid/epoch/baseSequence) is acked
    with its ORIGINAL offset and never re-appended."""
    broker = MiniBroker().start()
    try:
        addr = broker.address
        b0 = _batch([b"a", b"b"], pid=9, epoch=0, seq=0)
        b1 = _batch([b"c"], pid=9, epoch=0, seq=1)
        assert produce(addr, "t", b0) == 0
        assert produce(addr, "t", b1) == 2
        # replay both, out of order — acks repeat the original offsets
        assert produce(addr, "t", b1) == 2
        assert produce(addr, "t", b0) == 0
        blobs = fetch(addr, "t")
        assert len(blobs) == 2
        vals = [
            r.value
            for blob in blobs
            for r in decode_record_batch(blob)[1]
        ]
        assert vals == [b"a", b"b", b"c"]
    finally:
        broker.stop()


def test_non_idempotent_produce_does_double():
    """Control: without producer identity (pid=-1) the broker has no
    dedupe handle — the same bytes append twice, as on real Kafka."""
    broker = MiniBroker().start()
    try:
        addr = broker.address
        blob = _batch([b"a"])
        assert produce(addr, "t", blob) == 0
        assert produce(addr, "t", blob) == 1
        assert len(fetch(addr, "t")) == 2
    finally:
        broker.stop()


def test_epoch_bump_resets_sequences_and_fences_zombie():
    broker = MiniBroker().start()
    try:
        addr = broker.address
        assert produce(addr, "t", _batch([b"a"], pid=3, epoch=0, seq=0)) == 0
        # epoch bump: same sequence number is a NEW batch again
        assert produce(addr, "t", _batch([b"b"], pid=3, epoch=1, seq=0)) == 1
        # the old-epoch producer is now a fenced zombie
        with pytest.raises(RuntimeError, match="fenced"):
            produce(addr, "t", _batch([b"c"], pid=3, epoch=0, seq=1))
        # dedupe still active within the new epoch
        assert produce(addr, "t", _batch([b"b"], pid=3, epoch=1, seq=0)) == 1
        assert len(fetch(addr, "t")) == 2
    finally:
        broker.stop()


def test_producer_meta_reads_spec_offsets():
    blob = _batch([b"x"], pid=123456789, epoch=7, seq=42)
    from click_streaming_data_pipeline_spark.streaming.kafka_wire import (
        producer_meta,
    )

    assert producer_meta(blob) == (123456789, 7, 42)
    assert producer_meta(_batch([b"x"])) == (-1, -1, -1)
    # identity is all-or-nothing per KIP-98
    with pytest.raises(ValueError, match="all-or-nothing"):
        _batch([b"x"], pid=5)


def test_wire_stream_source_offsets_and_backpressure(spark):
    """The kafka_wire Python streaming source must (a) advance
    latestOffset at most batchesPerTrigger RecordBatches per call,
    (b) map offset ranges to per-batch partitions, and (c) deliver
    every record exactly once with its broker-assigned log offset."""
    from click_streaming_data_pipeline_spark.sources.pyds_wire import (
        KafkaWireStreamReader,
        register,
    )

    broker = MiniBroker().start()
    try:
        addr = broker.address
        for ci, chunk in enumerate([[b"a", b"b"], [b"c"], [b"d", b"e"]]):
            produce(addr, "t", _batch(chunk, pid=1, epoch=0, seq=ci))
        rdr = KafkaWireStreamReader(
            {"addr": addr, "topic": "t", "batchesPerTrigger": "2"}
        )
        assert rdr.initialOffset() == {"offset": 0}
        o1 = rdr.latestOffset()
        assert o1 == {"offset": 3}  # two batches (2 + 1 records)
        o2 = rdr.latestOffset()
        assert o2 == {"offset": 5}  # the remaining batch
        parts = rdr.partitions({"offset": 0}, o1)
        assert [p.value[2] for p in parts] == [0, 2]
        rows = [r for p in parts for r in rdr.read(p)]
        assert [(r[0], r[3]) for r in rows] == [
            ("a", 0), ("b", 1), ("c", 2)]
        (p3,) = rdr.partitions(o1, o2)
        rows3 = list(rdr.read(p3))
        assert [(r[0], r[3]) for r in rows3] == [("d", 3), ("e", 4)]
        register(spark)  # registration is idempotent
        register(spark)
    finally:
        broker.stop()


def test_gzip_record_batch_round_trip_and_crc():
    """codec=gzip: records block compressed per the spec (attributes
    bit 0), CRC over the compressed bytes, decode inflates and walks
    the identical records; a flipped compressed byte must fail CRC,
    not inflate garbage."""
    recs = [
        WireRecord(b"k0", b"v" * 500, 1_700_000_000_000),
        WireRecord(None, b"w" * 500, 1_700_000_000_500, [("h", b"x")]),
    ]
    blob = encode_record_batch(recs, codec="gzip")
    plain = encode_record_batch(recs)
    assert len(blob) < len(plain) // 2  # it actually compressed
    (attrs,) = struct.unpack_from(">h", blob, 21)
    assert attrs & 0x07 == 1  # gzip codec bit
    base, got = decode_record_batch(blob)
    assert [(r.key, r.value, r.timestamp_ms, r.headers) for r in got] == [
        (r.key, r.value, r.timestamp_ms, r.headers) for r in recs
    ]
    corrupt = bytearray(blob)
    corrupt[-3] ^= 0x01
    with pytest.raises(ValueError, match="crc32c mismatch"):
        decode_record_batch(bytes(corrupt))
    # gzip batches flow through the broker + consumer unchanged
    broker = MiniBroker().start()
    try:
        produce(broker.address, "t", blob)
        [stored] = fetch(broker.address, "t")
        assert decode_record_batch(stored)[1][0].value == b"v" * 500
    finally:
        broker.stop()


def test_record_batch_property_round_trip():
    """Property sweep (hypothesis): ANY record list — arbitrary
    bytes/None keys, values, header sets, spread timestamps — must
    round-trip bit-exactly through encode/decode under both codecs,
    and the broker must store/serve it unchanged."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    opt_bytes = st.one_of(st.none(), st.binary(max_size=64))
    header = st.tuples(
        st.text(max_size=8).filter(lambda s: "\x00" not in s),
        opt_bytes,
    )
    record = st.builds(
        WireRecord,
        opt_bytes,
        opt_bytes,
        st.integers(0, 2**40),
        st.lists(header, max_size=3),
    )

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(record, min_size=1, max_size=12),
        st.sampled_from(["none", "gzip"]),
        st.integers(0, 2**31 - 1),
    )
    def prop(records, codec, base):
        blob = encode_record_batch(records, base, codec=codec)
        got_base, got = decode_record_batch(blob)
        assert got_base == base
        assert [
            (r.key, r.value, r.timestamp_ms, r.headers) for r in got
        ] == [(r.key, r.value, r.timestamp_ms, r.headers) for r in records]

    prop()


def test_wire_stream_source_restart_resyncs_cursor():
    """Driver-restart semantics: a FRESH reader's pacing cursor is 0,
    but Spark replays the pending batch with the CHECKPOINTED range
    first — partitions(start, end) must re-sync the cursor so the
    next latestOffset continues past the checkpoint instead of
    re-announcing already-committed batches."""
    from click_streaming_data_pipeline_spark.sources.pyds_wire import (
        KafkaWireStreamReader,
    )

    broker = MiniBroker().start()
    try:
        addr = broker.address
        for ci, chunk in enumerate([[b"a", b"b"], [b"c"], [b"d"]]):
            produce(addr, "t", _batch(chunk, pid=1, epoch=0, seq=ci))
        # restarted driver: fresh reader, checkpoint says batches up
        # to offset 3 were consumed, batch (2->3) is pending replay
        rdr = KafkaWireStreamReader({"addr": addr, "topic": "t"})
        parts = rdr.partitions({"offset": 2}, {"offset": 3})
        assert [p.value[2] for p in parts] == [2]
        # cursor re-synced: the next trigger announces ONLY batch 3
        assert rdr.latestOffset() == {"offset": 4}
        (p,) = rdr.partitions({"offset": 3}, {"offset": 4})
        assert [r[0] for r in rdr.read(p)] == ["d"]
        # committed positions also hold the cursor forward
        rdr2 = KafkaWireStreamReader({"addr": addr, "topic": "t"})
        rdr2.commit({"offset": 4})
        assert rdr2.latestOffset() == {"offset": 4}
        # missing-offset fetch surfaces the diagnostic, not a closed
        # socket
        from click_streaming_data_pipeline_spark.streaming.kafka_wire import (
            fetch_one,
        )

        with pytest.raises(ValueError, match="no batch at offset 99"):
            fetch_one(addr, "t", 99)
    finally:
        broker.stop()


def test_wire_stream_source_checkpoint_restart_end_to_end(spark, tmp_path):
    """REAL restart through Spark's offset log: a first query drains
    the current log to a parquet append sink and stops; more batches
    arrive; a SECOND query on the SAME checkpoint (fresh reader, so
    the in-memory pacing cursor starts at 0) must emit exactly the
    new records once — no re-delivery of committed offsets, no gap."""
    from click_streaming_data_pipeline_spark.sources.pyds_wire import (
        FORMAT_NAME,
        register,
    )

    broker = MiniBroker().start()
    try:
        addr = broker.address
        for ci, chunk in enumerate([[b"a", b"b"], [b"c"]]):
            produce(addr, "t", _batch(chunk, pid=1, epoch=0, seq=ci))
        register(spark)
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")

        def drain():
            q = (
                spark.readStream.format(FORMAT_NAME)
                .option("addr", addr)
                .option("topic", "t")
                .option("batchesPerTrigger", "1")
                .load()
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .start()
            )
            q.processAllAvailable()
            q.stop()

        drain()
        got1 = {
            (r["value"], r["offset"])
            for r in spark.read.parquet(sink).collect()
        }
        assert got1 == {("a", 0), ("b", 1), ("c", 2)}
        for ci, chunk in enumerate([[b"d"], [b"e", b"f"]], start=2):
            produce(addr, "t", _batch(chunk, pid=1, epoch=0, seq=ci))
        drain()  # fresh reader instance, same checkpoint
        got2 = {
            (r["value"], r["offset"])
            for r in spark.read.parquet(sink).collect()
        }
        assert got2 == {
            ("a", 0), ("b", 1), ("c", 2), ("d", 3), ("e", 4), ("f", 5),
        }
    finally:
        broker.stop()
