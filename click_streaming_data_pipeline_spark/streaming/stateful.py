"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY 2 I3: the reference keeps all per-key state in Redis; Spark
keeps it in the state store — this module is the escape hatch for
state shapes the built-in aggregations can't express).

Demo operator: per-user running analytics — total events, distinct
active days, and the latest event type (the `views:{id}` counter plus
"what did this user do last" shape a session service would keep in
Redis hashes). Built-ins cover each piece separately; the combined
state object updated per micro-batch is what needs the custom
operator.

Batch twin (``user_state_batch``) computes the same result with
window/group functions — the driver oracle and tests compare them, so
the stateful path is hash-gated too.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: persisted per-user state: scalar summary + the distinct day keys
#: (bounded: one long per active day; a production deployment with an
#: unbounded horizon would swap the exact set for an HLL sketch blob)
STATE_SCHEMA = StructType(
    [
        StructField("total_events", LongType()),
        StructField("day_keys", ArrayType(LongType())),
        StructField("last_event_type", StringType()),
        StructField("last_ts_micros", LongType()),
        StructField("last_event_id", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_events", LongType()),
        StructField("active_days", IntegerType()),
        StructField("last_event_type", StringType()),
    ]
)

_DAY_NS = 86_400_000_000_000


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        total, day_list, last_type, last_ts, last_eid = state.get
        days = set(day_list)
    else:
        total, days, last_type, last_ts, last_eid = 0, set(), None, -1, -1
    for pdf in pdfs:
        total += len(pdf)
        days.update((pdf["ts"].astype("int64") // _DAY_NS).tolist())
        # latest event wins, ties broken by event_id (like I4 LWW);
        # the (ts, event_id) tuple compare must also hold ACROSS
        # micro-batches — nanos→micros truncation makes ts ties real
        pdf = pdf.sort_values(["ts", "event_id"])
        tail = pdf.iloc[-1]
        ts_micros = int(tail["ts"].value // 1_000)
        if (ts_micros, int(tail["event_id"])) > (last_ts, last_eid):
            last_ts = ts_micros
            last_eid = int(tail["event_id"])
            last_type = tail["event_type"]
    state.update((total, sorted(days), last_type, last_ts, last_eid))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "total_events": [total],
            "active_days": [len(days)],
            "last_event_type": [last_type],
        }
    )


def user_state_stream(events_stream: DataFrame) -> DataFrame:
    """Stateful per-user summary over a stream. Update-mode output:
    one refreshed row per user per micro-batch; the final batch's rows
    carry the converged state."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def user_state_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the same summary via window/group functions."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", F.col("event_type").alias("last_event_type"))
    )
    aggs = events.groupBy("user_id").agg(
        F.count("*").alias("total_events"),
        F.countDistinct(F.date_trunc("day", "ts"))
        .cast("int")
        .alias("active_days"),
    )
    return aggs.join(latest, "user_id").select(
        "user_id", "total_events", "active_days", "last_event_type"
    )


# ---------------------------------------------------------------------------
# Spark 4 arbitrary-state API: transformWithStateInPandas

# The same per-user summary on the NEW stateful API (StatefulProcessor
# + typed state handles, RocksDB state store). applyInPandasWithState
# above is the stable v1 shape; this is the v2 API Spark 4 steers new
# stateful operators toward — richer state types (value/list/map),
# timers, and TTL. Same fold, same semantics, so both paths share the
# batch twin as oracle.
#
# Runtime gate: the TWS Python state server speaks protobuf to the
# JVM. Where the real ``google.protobuf`` is installed (every real
# Spark 4 deployment — pyspark[connect] depends on it) it is used
# as-is; where it is absent (this container, no pip), the vendored
# mini runtime (``vendor/miniproto`` — a self-written implementation
# of the proto3 wire-format subset StateMessage uses) is put on
# sys.path AND PYTHONPATH so both the driver and the spawned Python
# workers resolve it.

try:  # Spark >= 4.0
    from pyspark.sql.streaming import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TWS = False


def ensure_protobuf_runtime(spark=None) -> str:
    """Make ``google.protobuf`` importable, preferring the native
    runtime. Returns "native", "vendored", or "absent".

    The TWS state client executes inside the Python WORKER processes,
    and driver-side sys.path edits do not propagate there; when a
    live session is passed, the vendored tree is shipped to workers
    through ``SparkContext.addPyFile`` (a zip whose root holds the
    ``google`` package) — the runtime-mutable distribution channel
    Spark itself provides. ``PYTHONPATH`` is also set for child
    processes launched after this call."""
    import importlib
    import os
    import sys

    vendor = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "vendor",
        "miniproto",
    )
    try:
        mod = importlib.import_module("google.protobuf.descriptor")
        origin = os.path.abspath(getattr(mod, "__file__", "") or "")
        if not origin.startswith(os.path.abspath(vendor) + os.sep):
            return "native"
        # already importable but FROM the vendor tree (e.g. a test
        # inserted it driver-side): fall through so the worker-side
        # propagation below still happens — returning "native" here
        # would leave Python workers unable to import it
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(vendor, "google", "protobuf")):
        return "absent"
    if vendor not in sys.path:
        sys.path.insert(0, vendor)
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if vendor not in parts:
        os.environ["PYTHONPATH"] = (
            vendor + (os.pathsep + existing if existing else "")
        )
    if spark is not None:
        import tempfile
        import zipfile

        # per-uid private dir + unconditional atomic rebuild: a fixed
        # world-writable path could be pre-created by another local
        # user (addPyFile would ship foreign code to every worker)
        # and would also pin a stale shim across vendor upgrades
        zdir = os.path.join(
            tempfile.gettempdir(), f"csdp-miniproto-{os.getuid()}"
        )
        os.makedirs(zdir, mode=0o700, exist_ok=True)
        os.chmod(zdir, 0o700)
        zpath = os.path.join(zdir, "miniproto_shim.zip")
        fd, tmp = tempfile.mkstemp(dir=zdir, suffix=".zip")
        os.close(fd)
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _dirs, files in os.walk(vendor):
                for fn in sorted(files):
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, vendor))
        os.replace(tmp, zpath)
        sc = spark.sparkContext
        # normal partition workers pick the zip up through the
        # python-includes path...
        sc.addPyFile(zpath)
        # ...but the TWS schema-validation "driver worker"
        # (transform_with_state_driver_worker) skips includes
        # processing; it DOES receive the PythonFunction's env, which
        # is sc.environment — and it always runs on the driver node,
        # so the driver-local vendor path is valid for it.
        prev = sc.environment.get("PYTHONPATH", "")
        if vendor not in prev.split(os.pathsep):
            sc.environment["PYTHONPATH"] = (
                vendor + (os.pathsep + prev if prev else "")
            )
    # the vendored tree ships `google` WITHOUT an __init__.py — a
    # PEP-420 namespace PORTION — so environments that carry other
    # google.* namespace distributions (google-auth, google-cloud)
    # keep working: portions merge instead of one regular package
    # shadowing the rest, and an already-imported namespace `google`
    # recomputes its __path__ when sys.path grows, so no module-cache
    # surgery is needed.
    try:
        importlib.import_module("google.protobuf.descriptor")
        return "vendored"
    except ImportError:  # pragma: no cover - vendor tree damaged
        return "absent"


def tws_runtime_available() -> bool:
    """True when transformWithStateInPandas can actually run: the
    API exists AND a protobuf runtime its state server needs is
    importable (native, or the vendored mini runtime)."""
    if not HAS_TWS:
        return False
    return ensure_protobuf_runtime() != "absent"


class UserStateProcessor(StatefulProcessor):
    """Per-user running summary as a v2 StatefulProcessor: one typed
    value-state slot holding the same tuple applyInPandasWithState
    persists; the (ts_micros, event_id) LWW tie-break also holds
    across micro-batches."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState("user_state", STATE_SCHEMA)

    def handleInputRows(
        self,
        key: tuple,
        rows: Iterator[pd.DataFrame],
        timerValues: Any,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self._state.exists():
            total, day_list, last_type, last_ts, last_eid = self._state.get()
            days = set(day_list)
        else:
            total, days, last_type, last_ts, last_eid = 0, set(), None, -1, -1
        for pdf in rows:
            total += len(pdf)
            days.update((pdf["ts"].astype("int64") // _DAY_NS).tolist())
            pdf = pdf.sort_values(["ts", "event_id"])
            tail = pdf.iloc[-1]
            ts_micros = int(tail["ts"].value // 1_000)
            if (ts_micros, int(tail["event_id"])) > (last_ts, last_eid):
                last_ts = ts_micros
                last_eid = int(tail["event_id"])
                last_type = tail["event_type"]
        self._state.update(
            (total, sorted(days), last_type, last_ts, last_eid)
        )
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "total_events": [total],
                "active_days": [len(days)],
                "last_event_type": [last_type],
            }
        )

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass


#: transformWithStateInPandas requires the RocksDB state store.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def user_state_stream_tws(events_stream: DataFrame) -> DataFrame:
    """``user_state_stream`` on the Spark 4 v2 stateful API. The
    session must run the RocksDB state store provider
    (``ROCKSDB_PROVIDER``) — the caller sets
    ``spark.sql.streaming.stateStore.providerClass`` before starting
    the query."""
    ensure_protobuf_runtime(events_stream.sparkSession)
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStateProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Per-user rate/gap features (the streaming twin of suspect_bots)

BOT_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("first_ts_us", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("min_gap_us", LongType()),
    ]
)

BOT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("span_us", LongType()),
        StructField("min_gap_us", LongType()),
    ]
)


def _bot_update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running (count, first, last, min-gap) per user. Correct under
    IN-ORDER event-time arrival per user (what Kafka's per-key
    partition ordering gives a production stream; the test harness
    feeds time-ordered files): each batch's gaps are the within-batch
    consecutive diffs plus the bridge from the previous batch's last
    event — O(1) state, no timestamp log."""
    (user_id,) = key
    if state.exists:
        n, first_us, last_us, min_gap = state.get
    else:
        n, first_us, last_us, min_gap = 0, None, None, None
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        ts_us = (pdf["ts"].astype("int64") // 1_000).tolist()
        if last_us is not None:
            bridge = ts_us[0] - last_us
            min_gap = bridge if min_gap is None else min(min_gap, bridge)
        gaps = [b - a for a, b in zip(ts_us, ts_us[1:])]
        if gaps:
            batch_min = min(gaps)
            min_gap = batch_min if min_gap is None else min(min_gap, batch_min)
        n += len(pdf)
        first_us = ts_us[0] if first_us is None else first_us
        last_us = ts_us[-1]
    state.update((n, first_us, last_us, min_gap))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "span_us": [last_us - first_us],
            "min_gap_us": [min_gap if min_gap is not None else None],
        }
    )


def bot_features_stream(events_stream: DataFrame) -> DataFrame:
    """Stateful per-user rate/gap features over a stream (update
    mode; final batch rows carry the converged state)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _bot_update,
        outputStructType=BOT_OUTPUT_SCHEMA,
        stateStructType=BOT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# SCD2 dimension maintenance (the streaming twin of user_status_scd2)

SCD2_STATE_SCHEMA = StructType(
    [
        StructField("statuses", ArrayType(StringType())),
        StructField("froms_us", ArrayType(LongType())),
        StructField("tos_us", ArrayType(LongType())),  # -1 = open
        StructField("version", LongType()),
    ]
)

SCD2_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("status", StringType()),
        StructField("valid_from_us", LongType()),
        StructField("valid_to_us", LongType()),  # -1 = open
        StructField("version", LongType()),
    ]
)


def _scd2_update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold status-change events into validity intervals. In-order
    per-user arrival assumed (Kafka per-key ordering / time-ordered
    files). The full interval list rides in state and is re-emitted
    with a version per batch so the harness can select each user's
    converged history; a production deployment would keep ONLY the
    open interval in state and append closed rows straight to the
    sink (they never change once closed)."""
    (user_id,) = key
    if state.exists:
        statuses, froms, tos, version = state.get
        statuses, froms, tos = list(statuses), list(froms), list(tos)
    else:
        statuses, froms, tos, version = [], [], [], 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        version += len(pdf)
        for ts_val, etype in zip(
            (pdf["ts"].astype("int64") // 1_000).tolist(),
            pdf["event_type"].tolist(),
        ):
            if not statuses or statuses[-1] != etype:
                if statuses:
                    tos[-1] = ts_val
                statuses.append(etype)
                froms.append(ts_val)
                tos.append(-1)
    state.update((statuses, froms, tos, version))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(statuses),
            "status": statuses,
            "valid_from_us": froms,
            "valid_to_us": tos,
            "version": [version] * len(statuses),
        }
    )


def scd2_stream(events_stream: DataFrame) -> DataFrame:
    """Incrementally-maintained SCD2 history over a stream."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _scd2_update,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# CEP journey accumulation (the streaming twin of cep_funnel_regex)

CEP_STATE_SCHEMA = StructType(
    [
        StructField("journey", StringType()),
        StructField("n_events", LongType()),
    ]
)

CEP_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("journey", StringType()),
    ]
)

_CEP_SYMBOLS = {
    "view": "v",
    "click": "c",
    "purchase": "p",
    "signup": "s",
}


def _cep_update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Append each event's symbol to the user's journey string in
    (ts, event_id) order. Correct under IN-ORDER per-user arrival
    (Kafka per-key ordering / time-ordered files), the same contract
    as _bot_update. State grows with per-user activity — production
    bounds it with a max-journey cap or a session window; pattern
    counting happens downstream on the drained state, so the stream
    stage is pure accumulation."""
    (user_id,) = key
    journey, n = state.get if state.exists else ("", 0)
    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        journey += "".join(
            _CEP_SYMBOLS.get(t, "e") for t in pdf["event_type"].tolist()
        )
        n += len(pdf)
    state.update((journey, n))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "journey": [journey]}
    )


def cep_journey_stream(events_stream) -> "DataFrame":
    """Stateful per-user journey assembly (update mode; the final
    batch's rows carry each user's complete symbol string)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _cep_update,
        outputStructType=CEP_OUTPUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
