"""Reference top-level API parity (compat.py): the remaining __all__ names
behave, not just exist."""

from __future__ import annotations

import pytest

import pathwaydataframework_spark as pw


def test_join_accepts_joinmode_enum(spark):
    a = pw.Table.from_rows(spark, [(1, "x"), (2, "y")], "k long, v string")
    b = pw.Table.from_rows(spark, [(1, "X")], "k long, w string")
    out = a.join(b, pw.left.k == pw.right.k, how=pw.JoinMode.LEFT).select(
        k=pw.left.k, w=pw.right.w
    )
    rows = sorted((r["k"], r["w"]) for r in out.df.collect())
    assert rows == [(1, "X"), (2, None)]


def test_cast_to_types_accepts_type_enum(spark):
    t = pw.Table.from_rows(spark, [("7", "1.5")], "a string, b string")
    out = t.cast_to_types(a=pw.Type.INT, b=pw.Type.FLOAT)
    assert dict(out.df.dtypes) == {"a": "bigint", "b": "double"}
    assert pw.Type.array(None, pw.Type.FLOAT) == "array<double>"
    assert pw.Type.optional(pw.Type.INT) == "bigint"


def test_result_type_aliases_are_real_classes(spark):
    a = pw.Table.from_rows(spark, [(1, 2)], "k long, v long")
    g = a.groupby(pw.this.k)
    assert isinstance(g, pw.GroupedTable)
    j = a.join(a.copy(), pw.left.k == pw.right.k)
    assert isinstance(j, pw.JoinResult)
    assert isinstance(a, pw.TableLike) and isinstance(a, pw.Joinable)
    assert pw.AsofJoinResult is pw.JoinResult
    assert pw.iterate_universe is pw.iterate


def test_pandas_transformer_round_trip(spark):
    import pandas as pd

    t = pw.Table.from_rows(
        spark, [(10, 100), (20, 200), (30, 300)], "foo long, bar long"
    )

    @pw.pandas_transformer(output_schema=None)
    def sum_cols(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"sum": df["foo"] + df["bar"]})

    out = sum_cols(t)
    assert isinstance(out, pw.Table)
    assert sorted(r["sum"] for r in out.df.collect()) == [110, 220, 330]


def test_table_transformer_validates_annotations(spark):
    @pw.table_transformer
    def passthrough(t: pw.Table) -> pw.Table:
        return t

    tab = pw.Table.from_rows(spark, [(1,)], "x long")
    assert passthrough(tab) is tab
    with pytest.raises(TypeError, match="must be a Table"):
        passthrough("not a table")


def test_load_yaml():
    cfg = pw.load_yaml("a: 1\nb:\n  - x\n  - y\n")
    assert cfg == {"a": 1, "b": ["x", "y"]}


def test_error_logs_empty_under_null_channel_model(spark):
    log = pw.global_error_log(spark)
    assert log.df.columns == ["operator_id", "message", "trace"]
    assert log.df.count() == 0
    with pw.local_error_log(spark) as ll:
        assert ll.df.count() == 0


def test_monitoring_and_persistence_enums():
    pw.set_monitoring_config(level=pw.MonitoringLevel.NONE)
    from pathwaydataframework_spark.compat import _monitoring_config

    assert _monitoring_config["level"] is pw.MonitoringLevel.NONE
    assert pw.PersistenceMode.PERSISTING.value == "persisting"
    assert pw.SchemaProperties(append_only=True).append_only is True


def test_window_namespace_alias():
    assert pw.window.tumbling is pw.temporal.tumbling
    assert pw.window.sliding is pw.temporal.sliding


def test_asynchronous_forwards_with_deprecation():
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        strat = pw.asynchronous.FixedDelayRetryStrategy
    assert strat is pw.udfs.FixedDelayRetryStrategy
    assert any(issubclass(x.category, DeprecationWarning) for x in w)
