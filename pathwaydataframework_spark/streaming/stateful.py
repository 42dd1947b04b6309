"""Streaming stateful operators on ``applyInPandasWithState``.

Reference analogues (SURVEY.md §2.9):

- ``Table.deduplicate(acceptor=...)`` on a stream
  (stdlib/stateful/deduplicate.py:9, engine graph.rs:895): keep the
  last-*accepted* value per instance, carrying the kept row across
  micro-batches in the state store.  Every micro-batch emits the current
  kept row for keys it touched — update-mode changelog semantics, the same
  contract as the reference's incremental output.
- ``pw.temporal.session(predicate=...)`` on a stream (_window.py:595):
  sessions merge while ``predicate(prev_time, next_time)`` holds; a closed
  session is emitted as soon as a later event breaks the predicate, and an
  optional processing-time timeout flushes sessions that stop receiving
  events (the reference closes them when the frontier passes; Spark's
  per-key timeout is the micro-batch analogue).

Scale notes: state is per-key in the state store (RocksDB on a real
cluster), partitioned by the instance key — no driver state, no collect.
The Python hook is Arrow-batched; the per-key scan is O(batch) with a
single shuffle on the grouping key.

Value serialization: kept state is stored as a JSON string, so instance /
value / aggregated columns must be JSON-native (int/float/str/bool/None);
event-time columns may additionally be timestamps (ISO-serialized in
state, restored on output).  That covers the reference's deduplicate
use (scalar values) without a per-type codec.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql.streaming.state import GroupStateTimeout

from pathwaydataframework_spark.internals.expression import ColumnRef
from pathwaydataframework_spark.internals.table import Table

_STATE_SCHEMA = "kept string"


def _name(col_or_name) -> str:
    return col_or_name.name if isinstance(col_or_name, ColumnRef) else col_or_name


def deduplicate_stream_acceptor(
    table: Table,
    *,
    value,
    instance,
    acceptor: Callable,
) -> Table:
    """Streaming acceptor dedup: per instance, a new value replaces the
    kept one only when ``acceptor(new, kept)`` is True; the kept row
    survives across micro-batches.  Rows within a batch are applied in
    value order (same convention as the batch operator)."""
    vname, iname = _name(value), _name(instance)
    df = table.df
    out_schema = df.schema

    def func(key, pdf_iter, state):
        import pandas as pd

        kept = json.loads(state.get[0]) if state.exists else None
        # collect ALL Arrow chunks, then one global sort: sorting each
        # chunk independently applies rows in chunk order, which differs
        # from the documented value order for multi-chunk batches and
        # makes non-monotonic acceptors nondeterministic
        frames = [pdf for pdf in pdf_iter if len(pdf) > 0]
        touched = bool(frames)
        if frames:
            pdf = pd.concat(frames, ignore_index=True).sort_values(
                vname, kind="mergesort"
            )
            for row in pdf.to_dict("records"):
                if kept is None or acceptor(row[vname], kept[vname]):
                    kept = row
        if touched and kept is not None:
            state.update((json.dumps(kept, default=str),))
            yield pd.DataFrame([kept])

    out = df.groupBy(iname).applyInPandasWithState(
        func, out_schema, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
    return Table(out)


def session_windows_stream_by_predicate(
    table: Table,
    time_col,
    predicate: Callable,
    *,
    instance,
    aggregations: dict[str, tuple[str, str]],
    timeout_ms: int | None = None,
) -> Table:
    """Streaming predicate sessions: consecutive (by event time) rows merge
    while ``predicate(prev_time, next_time)`` is True.  A session is
    emitted when broken by a later event; with ``timeout_ms`` set, idle
    sessions are also flushed after that much processing time with no
    events for the key.

    ``aggregations`` maps output name → (column, 'count'|'sum'|'min'|'max')
    — the same contract as the batch ``session_windows_by_predicate``.
    Output columns: instance, _pw_window_start, _pw_window_end, *aggs.
    """
    tname, iname = _name(time_col), _name(instance)
    agg_items = list(aggregations.items())
    dtypes = dict(table.df.dtypes)
    time_is_ts = dtypes[tname].startswith("timestamp")

    fields = []
    for out_name, (col, kind) in agg_items:
        dtype = "long" if kind == "count" else dtypes[col]
        fields.append(f"{out_name} {dtype}")
    out_schema = (
        f"{iname} {dtypes[iname]}, _pw_window_start {dtypes[tname]}, "
        f"_pw_window_end {dtypes[tname]}, " + ", ".join(fields)
    )

    def _t_out(t):
        return t.isoformat() if hasattr(t, "isoformat") else t

    def _mk_open(row):
        sess = {"start": _t_out(row[tname]), "end": _t_out(row[tname]), "aggs": {}}
        for out_name, (col, kind) in agg_items:
            sess["aggs"][out_name] = 1 if kind == "count" else row[col]
        return sess

    def _merge(sess, row):
        sess["end"] = _t_out(row[tname])
        for out_name, (col, kind) in agg_items:
            cur = sess["aggs"][out_name]
            if kind == "count":
                sess["aggs"][out_name] = cur + 1
            elif kind == "sum":
                sess["aggs"][out_name] = cur + row[col]
            elif kind == "min":
                sess["aggs"][out_name] = min(cur, row[col])
            elif kind == "max":
                sess["aggs"][out_name] = max(cur, row[col])

    def _emit(key_val, closed):
        import pandas as pd

        rows = []
        for sess in closed:
            row = {
                iname: key_val,
                "_pw_window_start": sess["start"],
                "_pw_window_end": sess["end"],
            }
            row.update(sess["aggs"])
            rows.append(row)
        pdf = pd.DataFrame(rows)
        if time_is_ts:
            for c in ("_pw_window_start", "_pw_window_end"):
                pdf[c] = pd.to_datetime(pdf[c])
        return pdf

    def func(key, pdf_iter, state):
        import pandas as pd

        key_val = key[0]
        open_sess = json.loads(state.get[0]) if state.exists else None

        if timeout_ms is not None and state.hasTimedOut:
            state.remove()
            if open_sess is not None:
                yield _emit(key_val, [open_sess])
            return

        frames = [pdf for pdf in pdf_iter if len(pdf)]
        closed = []
        if frames:
            pdf = pd.concat(frames).sort_values(tname, kind="mergesort")
            for row in pdf.to_dict("records"):
                if open_sess is None:
                    open_sess = _mk_open(row)
                    continue
                prev_end = open_sess["end"]
                if time_is_ts:
                    prev_end = pd.Timestamp(prev_end)
                if predicate(prev_end, row[tname]):
                    _merge(open_sess, row)
                else:
                    closed.append(open_sess)
                    open_sess = _mk_open(row)
        if open_sess is not None:
            state.update((json.dumps(open_sess, default=str),))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        if closed:
            yield _emit(key_val, closed)

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    out = table.df.groupBy(iname).applyInPandasWithState(
        func, out_schema, _STATE_SCHEMA, "append", timeout_conf
    )
    return Table(out)
