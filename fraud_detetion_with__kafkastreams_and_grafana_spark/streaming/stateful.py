"""Custom stateful streaming operator via applyInPandasWithState: per-user
running fraud totals that survive across micro-batches.

The reference has no stateful ops (its topology is stateless,
TransactionProcessor.java:27-54); this is the engine's capability superset
for 'running aggregate per key, emitted every batch' semantics that plain
streaming groupBy can't express in append mode.

State scale: one (sum, count) pair per user in the state store —
constant per key, partitioned by the grouping key across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

OUTPUT_SCHEMA = "userId STRING, total_amount DOUBLE, n_tx LONG"
STATE_SCHEMA = "total DOUBLE, cnt LONG"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, cnt = state.get if state.exists else (0.0, 0)
    for pdf in pdfs:
        total += float(pdf["amount"].sum())
        cnt += int(len(pdf))
    state.update((total, cnt))
    yield pd.DataFrame(
        {"userId": [key[0]], "total_amount": [total], "n_tx": [cnt]}
    )


def running_user_totals(fraud: DataFrame) -> DataFrame:
    """Streaming per-user running totals, one updated row per user per
    micro-batch in which that user appears."""
    return fraud.groupBy("userId").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class RunningTotalsProcessor(StatefulProcessor):
    """transformWithStateInPandas form of the same running-totals operator —
    Spark 4's successor stateful API (SPARK-46815): named state variables
    on the RocksDB state store instead of a single opaque state tuple.
    State scale is identical to the applyInPandasWithState form (one
    (total, cnt) ValueState entry per user, hash-partitioned across
    executors), but the store is incremental-checkpoint RocksDB, which is
    the production choice once per-executor state exceeds heap."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        if self._totals.exists():
            total, cnt = self._totals.get()
        else:
            total, cnt = 0.0, 0
        for pdf in rows:
            total += float(pdf["amount"].sum())
            cnt += int(len(pdf))
        self._totals.update((total, cnt))
        yield pd.DataFrame(
            {"userId": [key[0]], "total_amount": [total], "n_tx": [cnt]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(fraud: DataFrame) -> DataFrame:
    """Streaming per-user running totals via transformWithStateInPandas.

    Requires (a) the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass) — transformWithState is
    only implemented on that provider — and (b) the `protobuf` package,
    which Spark's TransformWithStateInPySpark driver worker imports for
    its state-server protocol. This sandbox ships neither protobuf nor a
    way to install it, so the operator is exercised by a skip-gated test
    (tests/test_streaming.py) rather than a registered driver query; on
    any standard Spark 4 cluster image it runs as-is."""
    return fraud.groupBy("userId").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


CEP_OUTPUT_SCHEMA = (
    "userId STRING, probe1_id LONG, probe2_id LONG, fraud_id LONG, span_s LONG"
)
# last two events per user: (t, value, event_id) x 2; event_id -1 = empty slot
CEP_STATE_SCHEMA = "t1 LONG, v1 DOUBLE, e1 LONG, t2 LONG, v2 DOUBLE, e2 LONG"


def make_cep_card_testing(probe: float, fraud: float, span_s: int):
    """Stateful CEP operator factory: strict-contiguity PATTERN
    (probe probe fraud) per user, emitted the moment the third event
    arrives — state is exactly the last TWO events per key (the pattern
    length minus one), so state size is O(pattern) per user regardless
    of stream length, the canonical NFA-buffer bound for fixed-length
    contiguous patterns. Batch rows are walked in (event-time, event_id)
    order; cross-batch contiguity holds because the replay (like Kafka
    per-key order) delivers batches in event-time order and the previous
    two events ride the state store."""

    def cep(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            t1, v1, e1, t2, v2, e2 = state.get
        else:
            t1, v1, e1, t2, v2, e2 = -1, 0.0, -1, -1, 0.0, -1
        prev2, prev1 = (t1, v1, e1), (t2, v2, e2)
        matches: list[tuple] = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["timestamp", "event_id"])
        for t, v, e in zip(
            pdf["timestamp"].astype("int64"),
            pdf["amount"].astype("float64"),
            pdf["event_id"].astype("int64"),
        ):
            ta, va, ea = prev2
            tb, vb, eb = prev1
            if (
                ea >= 0
                and eb >= 0
                and va < probe
                and vb < probe
                and v > fraud
                and t - ta <= span_s
            ):
                matches.append((key[0], ea, eb, int(e), int(t - ta)))
            prev2, prev1 = prev1, (int(t), float(v), int(e))
        state.update(
            (prev2[0], prev2[1], prev2[2], prev1[0], prev1[1], prev1[2])
        )
        if matches:
            yield pd.DataFrame(
                matches,
                columns=["userId", "probe1_id", "probe2_id", "fraud_id", "span_s"],
            )

    return cep


KLEENE_OUTPUT_SCHEMA = (
    "userId STRING, first_probe_id LONG, last_probe_id LONG, "
    "n_probes LONG, fraud_id LONG, span_s LONG"
)
# running probe-run summary per user; first_id -1 = no active run
KLEENE_STATE_SCHEMA = "t_first LONG, first_id LONG, last_id LONG, n LONG"


def make_cep_kleene_probe_run(probe: float, fraud: float, span_s: int):
    """Stateful Kleene-CEP operator factory: PATTERN (probe+ fraud) with
    the greedy (maximal-munch) quantifier, per user. Unlike the
    fixed-length pattern (make_cep_card_testing, O(pattern) state = the
    last two events), the variable-length run needs only a CONSTANT-size
    run summary per key — (t_first, first_probe_id, last_probe_id,
    n_probes) — updated in place as probes arrive, emitted the moment a
    qualifying fraud event follows, and cleared by ANY non-probe event
    (which is what makes the munch maximal: a run can only end when a
    non-probe arrives, so every emitted run is the longest contiguous
    probe prefix). O(1) state per key regardless of run length — the
    run itself never buffers, which is the property that lets this scale
    past the NFA-buffer formulations. Matches emit exactly once, in the
    micro-batch where the fraud event arrives, including runs whose
    probes span many earlier micro-batches (the summary rides the state
    store; the replay delivers per-key batches in event order, Kafka's
    per-key guarantee). Snapshot equals the batch gaps-and-islands
    lowering (r83) row-for-row."""

    def cep(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            t_first, first_id, last_id, n = state.get
        else:
            t_first, first_id, last_id, n = -1, -1, -1, 0
        matches: list[tuple] = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["timestamp", "event_id"])
        for t, v, e in zip(
            pdf["timestamp"].astype("int64"),
            pdf["amount"].astype("float64"),
            pdf["event_id"].astype("int64"),
        ):
            if v < probe:
                if first_id < 0:
                    t_first, first_id = int(t), int(e)
                    last_id, n = int(e), 1
                else:
                    last_id, n = int(e), n + 1
            else:
                if first_id >= 0:
                    if v > fraud and t - t_first <= span_s:
                        matches.append(
                            (key[0], first_id, last_id, n, int(e),
                             int(t - t_first))
                        )
                    t_first, first_id, last_id, n = -1, -1, -1, 0
        state.update((t_first, first_id, last_id, n))
        if matches:
            yield pd.DataFrame(
                matches,
                columns=["userId", "first_probe_id", "last_probe_id",
                         "n_probes", "fraud_id", "span_s"],
            )

    return cep


def cep_kleene_matches(
    parsed: DataFrame, probe: float, fraud: float, span_s: int
) -> DataFrame:
    """Streaming Kleene CEP over a parsed wire stream (userId, amount,
    timestamp, event_id): one state-store shuffle on userId, O(1) state
    per key, matches emitted exactly once on the follower event."""
    return parsed.groupBy("userId").applyInPandasWithState(
        make_cep_kleene_probe_run(probe, fraud, span_s),
        outputStructType=KLEENE_OUTPUT_SCHEMA,
        stateStructType=KLEENE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cep_card_testing_matches(
    parsed: DataFrame, probe: float, fraud: float, span_s: int
) -> DataFrame:
    """Streaming CEP over a parsed wire stream (userId, amount,
    timestamp, event_id): one state-store shuffle on userId, O(pattern)
    state per key, matches emitted exactly once (a triple completes in
    exactly one micro-batch)."""
    return parsed.groupBy("userId").applyInPandasWithState(
        make_cep_card_testing(probe, fraud, span_s),
        outputStructType=CEP_OUTPUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_OUTPUT_SCHEMA = "user_id LONG, step LONG"
# conditional first-touch second per stage; -1 = stage not reached
FUNNEL_STATE_SCHEMA = "t1 LONG, t2 LONG, t3 LONG"

FUNNEL_STEPS = ("view", "click", "purchase")


def make_funnel_steps(steps: tuple[str, ...] = FUNNEL_STEPS):
    """Stateful ordered-funnel operator factory: per-user state is ONE
    int64 per funnel stage — the conditional first-touch times the batch
    formulation (r87) computes as chained window mins. A stage-k event
    completes stage k iff stage k is still open, stage k-1 is touched,
    and the event is STRICTLY after the stage-(k-1) touch (same-second
    events share a truncated t, so the strict `>` excludes them exactly
    like the batch windows). Each stage completes at most once per user,
    so emission is append-like (one (user, step) row per completion) and
    the post-stream count per step equals the batch funnel exactly.
    O(|steps|) int64 state per key regardless of stream length; events
    arrive per key in (t, event_id) order (the wire's range key), which
    is what makes in-order first-touch equal the window min."""

    def funnel(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        t = list(state.get) if state.exists else [-1] * len(steps)
        out: list[tuple] = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["timestamp", "event_id"])
        for ts, et in zip(
            pdf["timestamp"].astype("int64"), pdf["event_type"]
        ):
            for k, name in enumerate(steps):
                if et != name:
                    continue
                if t[k] < 0 and (
                    k == 0 or (t[k - 1] >= 0 and ts > t[k - 1])
                ):
                    t[k] = int(ts)
                    out.append((key[0], k + 1))
                break
        state.update(tuple(t))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "step"])

    return funnel


def funnel_step_completions(
    parsed: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Streaming ordered-funnel over a parsed wire stream (user_id,
    event_type, timestamp, event_id): one state-store shuffle on
    user_id, O(|steps|) state per key, one row per stage completion."""
    return parsed.groupBy("user_id").applyInPandasWithState(
        make_funnel_steps(steps),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
