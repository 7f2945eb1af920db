"""Kafka-Streams-style fluent topology DSL, compiled to DataFrame plans.

The reference's developer surface IS this API (StreamsBuilder ->
stream -> mapValues -> filter -> branch -> peek -> to,
TransactionProcessor.java:26-55); a user porting their own topology
from the reference should be able to keep their program SHAPE and
swap the engine. The facade is Spark-first: every stage records a
COLUMN transformation (never a row-at-a-time Python lambda), so the
whole chained topology compiles to one narrow whole-stage-codegen
span — Catalyst sees straight through the DSL, exactly as if the
user had written raw DataFrame code. The STATELESS core (mapValues/
filter/selectKey/branch/peek) works identically over batch frames and
readStream frames — the column algebra is the same; only the terminal
sink differs (s79 drives it over a live stream). The STATEFUL surfaces
(to_table, join_table, join, group_by_key aggregates) are batch-replay
views of the changelog fixed point: under Structured Streaming they
need caller-supplied watermarks/output modes (to_table's max_by is an
unbounded-state complete-mode aggregate; join is a stream-stream join
that requires watermarks on both sides) — the s12 stream-static and
s41 view-maintenance postures are the streaming deployments of the
same plans.

Semantics pinned to Kafka Streams:
- ``branch(p1, p2, ...)`` is FIRST-MATCH-WINS: a record lands in the
  first branch whose predicate accepts it and in no later branch
  (KStream#branch javadoc); records matching NO predicate are
  DROPPED.
- ``map_values`` transforms only the value column; the key column
  rides along untouched (mapValues never triggers repartitioning in
  Kafka Streams — here, never a shuffle).
- ``peek`` is non-semantic observation: it records the label and
  returns the stream unchanged.

Reference parity: TransactionProcessor.java:26-55 (the topology),
FraudAlertConsumer.java (the downstream reader contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ValueFn = Callable[[Column], Column]
PredFn = Callable[[Column, Column], Column]


class KStream:
    """A (key, value) stream stage; immutable, each op returns a new one."""

    def __init__(
        self, df: DataFrame, key: str = "key", value: str = "value"
    ) -> None:
        self._df = df
        self._key = key
        self._value = value
        self.peeked: list[str] = []

    # -- stateless ops (all narrow: no shuffle, codegen-fusable) ----------

    def map_values(self, fn: ValueFn) -> "KStream":
        """KStream#mapValues: value -> fn(value), key untouched."""
        out = self._df.withColumn(self._value, fn(F.col(self._value)))
        s = KStream(out, self._key, self._value)
        s.peeked = list(self.peeked)
        return s

    def filter(self, fn: PredFn) -> "KStream":
        """KStream#filter((key, value) -> bool)."""
        out = self._df.where(fn(F.col(self._key), F.col(self._value)))
        s = KStream(out, self._key, self._value)
        s.peeked = list(self.peeked)
        return s

    def select_key(self, fn: ValueFn) -> "KStream":
        """KStream#selectKey: key <- fn(value)."""
        out = self._df.withColumn(self._key, fn(F.col(self._value)))
        s = KStream(out, self._key, self._value)
        s.peeked = list(self.peeked)
        return s

    def branch(self, *preds: PredFn) -> list["KStream"]:
        """KStream#branch: first-match-wins routing; no-match drops.

        Compiled as pred_i AND NOT (pred_1 OR ... OR pred_{i-1}) so each
        branch is an independent filter over the SAME upstream frame —
        Spark reuses the scan, and each branch stays a narrow plan.

        Each predicate is null-coalesced to FALSE before composing:
        Kafka Streams predicates are Java booleans, so a record whose
        predicate would NPE/evaluate-null simply doesn't match that
        branch and falls through to the next — under raw SQL
        three-valued logic ``p_i & ~p_j`` with a NULL ``p_j`` would
        instead drop the record from EVERY branch, including a
        lit(True) catch-all.
        """
        out: list[KStream] = []
        k, v = F.col(self._key), F.col(self._value)
        safe = [F.coalesce(p(k, v), F.lit(False)) for p in preds]
        for i in range(len(preds)):
            cond = safe[i]
            for j in range(i):
                cond = cond & ~safe[j]
            s = KStream(self._df.where(cond), self._key, self._value)
            s.peeked = list(self.peeked)
            out.append(s)
        return out

    def peek(self, label: str) -> "KStream":
        """KStream#peek: non-semantic observation marker."""
        s = KStream(self._df, self._key, self._value)
        s.peeked = list(self.peeked) + [label]
        return s

    def group_by_key(self) -> "KGroupedStream":
        """KStream#groupByKey: the handle stateful ops hang off."""
        return KGroupedStream(self)

    def to_table(self, order_cols: list[str]) -> "KTable":
        """KStream#toTable: latest value per key, 'latest' defined by
        the caller's deterministic order columns (e.g. [event_time,
        event_id] — the tie-break makes compaction reproducible, which
        wall-clock arrival order in Kafka is not). Compiled to ONE
        keyed max_by aggregation — never a corpus-wide row_number
        window. The order key is a zero-padded string composite so the
        same compaction is expressible in any engine (struct order
        keys are Spark-only).

        Encoding per order column: timestamps become epoch
        microseconds, dates epoch days, numerics a long cast (the
        fractional part of a float order column is truncated —
        pre-scale if sub-unit order matters); NULL sorts FIRST (it ties
        with the minimum encodable value); and every value is offset by
        +10**18 before zero-padding so negative values order correctly
        (lexicographic order over '-'-prefixed padded strings would be
        reversed). Domain: order values must lie in
        [-10**18, ~8.2*10**18] — epoch micros until year ~33658. The
        domain is ENFORCED map-side: a value outside it would silently
        wrap negative under non-ANSI addition and elect a wrong
        compaction winner, so the encoder raises instead.
        """
        from pyspark.sql import types as T

        offset = 10**18
        # Long.MaxValue - offset: largest value whose encoding cannot wrap.
        hi = 9223372036854775807 - offset
        parts = []
        for c in order_cols:
            dt = self._df.schema[c].dataType
            col = F.col(c)
            if isinstance(dt, T.TimestampNTZType):
                col = col.cast("timestamp")
                dt = T.TimestampType()
            if isinstance(dt, T.TimestampType):
                col = F.unix_micros(col)
            elif isinstance(dt, T.DateType):
                col = F.unix_date(col)
            else:
                col = col.cast("long")
            col = F.when(
                (col < F.lit(-offset)) | (col > F.lit(hi)),
                F.raise_error(
                    F.format_string(
                        "to_table order column '" + c
                        + "' outside encodable domain [-1e18, ~8.22e18]: %s",
                        col,
                    )
                ).cast("long"),
            ).otherwise(col)
            col = F.coalesce(col, F.lit(-offset)) + F.lit(offset)
            parts.append(F.format_string("%019d", col))
        ordk = F.concat_ws(":", *parts)
        out = self._df.groupBy(F.col(self._key)).agg(
            F.max_by(F.col(self._value), ordk).alias(self._value)
        )
        return KTable(out, self._key, self._value)

    def join_table(
        self,
        table: "KTable",
        joiner: Callable[[Column, Column], Column],
    ) -> "KStream":
        """KStream#join(KTable): per-record lookup enrichment. Inner
        semantics (records with no table row drop, per Kafka Streams);
        compiled to one key equi-join that Catalyst broadcasts when
        the table is small and shuffles when it is not — the adaptive
        call a hand-rolled enrichment cache gets wrong at scale."""
        l = self._df.withColumnRenamed(self._value, "_sv")
        r = table._df.select(
            F.col(table._key).alias(self._key),
            F.col(table._value).alias("_tv"),
        )
        out = (
            l.join(r, self._key)
            .withColumn(self._value, joiner(F.col("_sv"), F.col("_tv")))
            .drop("_sv", "_tv")
        )
        s = KStream(out, self._key, self._value)
        s.peeked = list(self.peeked)
        return s

    def join(
        self,
        other: "KStream",
        joiner: Callable[[Column, Column], Column],
        *,
        time_col: str,
        other_time_col: str | None = None,
        before: str = "0 seconds",
        after: str = "0 seconds",
    ) -> "KStream":
        """KStream#join(other, joiner, JoinWindows): key-equality plus
        the time constraint t2 in [t1 - before, t1 + after], both ends
        inclusive (JoinWindows.of/.before/.after semantics). Compiled
        to ONE key equi-join with a range residual — Spark plans the
        sort-merge join on the key and evaluates the interval as a
        join filter (the r27 range-join posture: never a cross
        product, co-partitioned by key at any scale).

        The joined value is joiner(left_value, right_value); the two
        event times survive as left_time/right_time columns.
        """
        ot = other_time_col or time_col
        l = self._df.select(
            F.col(self._key).alias("_jk"),
            F.col(self._value).alias("_v1"),
            F.col(time_col).alias("left_time"),
        )
        r = other._df.select(
            F.col(other._key).alias("_jk"),
            F.col(other._value).alias("_v2"),
            F.col(ot).alias("right_time"),
        )
        cond = (
            (F.col("right_time") >= F.col("left_time") - F.expr(f"INTERVAL {before}"))
            & (F.col("right_time") <= F.col("left_time") + F.expr(f"INTERVAL {after}"))
        )
        out = (
            l.join(r, "_jk")
            .where(cond)
            .select(
                F.col("_jk").alias(self._key),
                joiner(F.col("_v1"), F.col("_v2")).alias(self._value),
                "left_time",
                "right_time",
            )
        )
        s = KStream(out, self._key, self._value)
        s.peeked = list(self.peeked) + list(other.peeked)
        return s

    # -- terminals ---------------------------------------------------------

    def to_frame(self) -> DataFrame:
        """The compiled (key, value) DataFrame — hand to any sink
        (writeStream for streams, write for batch replays), the analog
        of KStream#to(topic)."""
        return self._df.select(self._key, self._value)

    @property
    def df(self) -> DataFrame:
        return self._df


class StreamsBuilder:
    """StreamsBuilder#stream: wrap a (key, value) wire frame."""

    def stream(
        self, wire: DataFrame, key: str = "key", value: str = "value"
    ) -> KStream:
        if key not in wire.columns:
            wire = wire.withColumn(key, F.lit(None).cast("string"))
        return KStream(wire, key, value)


class KGroupedStream:
    """KStream#groupByKey result: the handle stateful ops hang off."""

    def __init__(self, ks: KStream) -> None:
        self._ks = ks

    def windowed_by(self, duration: str, time_col: str) -> "TimeWindowedKStream":
        """TimeWindows.of(duration): epoch-aligned tumbling windows —
        Kafka Streams and Spark's window() share this alignment, so
        the two engines bucket identically."""
        return TimeWindowedKStream(self._ks, duration, time_col)

    def count(self, alias: str = "count") -> DataFrame:
        """KGroupedStream#count -> KTable (here: its changelog frame)."""
        ks = self._ks
        return ks.df.groupBy(F.col(ks._key)).agg(
            F.count("*").alias(alias)
        )

    def aggregate(self, *aggs: Column) -> DataFrame:
        """KGroupedStream#aggregate with explicit Column aggregators —
        Spark-first: the aggregator is declared algebra, not an opaque
        Java lambda, so Catalyst plans partial+final automatically."""
        ks = self._ks
        return ks.df.groupBy(F.col(ks._key)).agg(*aggs)


class TimeWindowedKStream:
    """windowedBy(TimeWindows) result: windowed count/aggregate."""

    def __init__(self, ks: KStream, duration: str, time_col: str) -> None:
        self._ks = ks
        self._duration = duration
        self._time_col = time_col

    def aggregate(self, *aggs: Column) -> DataFrame:
        ks = self._ks
        return (
            ks.df.groupBy(
                F.window(F.col(self._time_col), self._duration).alias("w"),
                F.col(ks._key),
            )
            .agg(*aggs)
            # '*' already carries the grouping key once — naming it
            # again would emit a duplicate key column that breaks
            # parquet/CSV writes (COLUMN_ALREADY_EXISTS) and makes
            # downstream key references ambiguous.
            .select(F.col("w.start").alias("window_start"), "*")
            .drop("w")
        )

    def count(self, alias: str = "count") -> DataFrame:
        return self.aggregate(F.count("*").alias(alias))


class KTable:
    """KTable: one row per key — the changelog-compacted view. In
    batch replays this is the table's FINAL state (the fixed point a
    caught-up Kafka Streams app converges to); the true streaming
    deployment maintains it with the s12 stream-static / s41
    view-maintenance postures."""

    def __init__(self, df: DataFrame, key: str = "key", value: str = "value"):
        self._df = df
        self._key = key
        self._value = value

    def filter(self, fn: PredFn) -> "KTable":
        return KTable(
            self._df.where(fn(F.col(self._key), F.col(self._value))),
            self._key,
            self._value,
        )

    def map_values(self, fn: ValueFn) -> "KTable":
        return KTable(
            self._df.withColumn(self._value, fn(F.col(self._value))),
            self._key,
            self._value,
        )

    def to_stream(self) -> KStream:
        return KStream(self._df, self._key, self._value)

    @property
    def df(self) -> DataFrame:
        return self._df
