"""Schema declarations — reference ``pw.Schema`` (internals/schema.py:913,
metaclass :267) and ``pw.column_definition`` (:687).

A thin declarative layer: typed class attributes → Spark ``StructType``;
primary-key columns drive the row-id hash (``Table.with_id_from``).  Type
inference beyond this comes free from Catalyst (SURVEY.md §1.3).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field
from typing import Any, Optional, get_args, get_origin

from pyspark.sql import SparkSession
from pyspark.sql import types as T


@dataclass
class ColumnDefinition:
    primary_key: bool = False
    default_value: Any = None
    dtype: Any = None


def column_definition(
    *, primary_key: bool = False, default_value: Any = None, dtype: Any = None
) -> ColumnDefinition:
    """Reference schema.py:687."""
    return ColumnDefinition(primary_key, default_value, dtype)


# Reference dtype aliases for schema annotations (internals/dtype.py;
# SURVEY §1.2 mapping table).  Marker classes: users annotate with them,
# only the Spark mapping matters.
class DateTimeNaive:
    """Reference DATE_TIME_NAIVE (dtype.py:484) → TimestampNTZ."""


class DateTimeUtc:
    """Reference DATE_TIME_UTC (dtype.py:511) → Timestamp (UTC session tz)."""


class Duration:
    """Reference DURATION (dtype.py:538) → DayTimeInterval."""


class Json:
    """Reference Json (dtype.py:405) → StringType + json functions."""


class Pointer:
    """Reference Pointer row id (dtype.py:285) → LongType (xxhash64)."""


class PyObjectWrapper:
    """Reference PyObjectWrapper (dtype.py:541) → BinaryType (pickle)."""


_PY_TO_SPARK_TYPE = {
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bool: T.BooleanType(),
    bytes: T.BinaryType(),
    _dt.datetime: T.TimestampNTZType(),
    _dt.timedelta: T.DayTimeIntervalType(),
    DateTimeNaive: T.TimestampNTZType(),
    DateTimeUtc: T.TimestampType(),
    Duration: T.DayTimeIntervalType(),
    Json: T.StringType(),
    Pointer: T.LongType(),
    PyObjectWrapper: T.BinaryType(),
}


_ANNOTATION_NAMESPACE: dict[str, Any] = {
    "int": int,
    "float": float,
    "str": str,
    "bool": bool,
    "bytes": bytes,
    "datetime": _dt,
    "Optional": Optional,
    "list": list,
    "tuple": tuple,
    "DateTimeNaive": DateTimeNaive,
    "DateTimeUtc": DateTimeUtc,
    "Duration": Duration,
    "Json": Json,
    "Pointer": Pointer,
    "PyObjectWrapper": PyObjectWrapper,
}


def _annotation_to_spark(ann: Any, globalns: dict | None = None) -> tuple[T.DataType, bool]:
    """(spark type, nullable) from a Python annotation."""
    if isinstance(ann, str):
        # stringized annotations (from __future__ import annotations) —
        # resolve against the DEFINING module's globals (so `pw.Json` etc.
        # work), falling back to the builtin names
        ns = dict(_ANNOTATION_NAMESPACE)
        ns.update(globalns or {})
        ann = eval(ann, ns)  # noqa: S307 — annotation namespace
    origin = get_origin(ann)
    if origin is None:
        if ann in _PY_TO_SPARK_TYPE:
            return _PY_TO_SPARK_TYPE[ann], False
        raise TypeError(f"unsupported schema annotation {ann!r}")
    args = get_args(ann)
    if origin is list:
        inner, _ = _annotation_to_spark(args[0])
        return T.ArrayType(inner), False
    if origin is tuple:
        fields = [
            T.StructField(f"f{i}", _annotation_to_spark(a)[0]) for i, a in enumerate(args)
        ]
        return T.StructType(fields), False
    # Optional[X] == Union[X, None]
    non_none = [a for a in args if a is not type(None)]
    if len(non_none) == 1:
        inner, _ = _annotation_to_spark(non_none[0])
        return inner, True
    raise TypeError(f"unsupported schema annotation {ann!r}")


class SchemaMeta(type):
    def __new__(mcls, name, bases, ns):
        import sys

        cls = super().__new__(mcls, name, bases, ns)
        mod = sys.modules.get(ns.get("__module__", ""), None)
        globalns = vars(mod) if mod is not None else {}
        columns: dict[str, tuple[T.DataType, bool, ColumnDefinition]] = {}
        for base in reversed(bases):
            columns.update(getattr(base, "_columns", {}))
        for attr, ann in ns.get("__annotations__", {}).items():
            if attr.startswith("_"):
                continue
            spark_type, nullable = _annotation_to_spark(ann, globalns)
            cd = ns.get(attr)
            if not isinstance(cd, ColumnDefinition):
                cd = ColumnDefinition()
            if cd.dtype is not None:
                spark_type, nullable = _annotation_to_spark(cd.dtype, globalns)
            columns[attr] = (spark_type, nullable, cd)
        cls._columns = columns
        return cls


class Schema(metaclass=SchemaMeta):
    """Declare like the reference::

        class Order(pw.Schema):
            order_id: int = pw.column_definition(primary_key=True)
            amount: float
            note: Optional[str]
    """

    _columns: dict = {}

    @classmethod
    def to_spark(cls) -> T.StructType:
        return T.StructType(
            [
                T.StructField(name, dtype, nullable)
                for name, (dtype, nullable, _) in cls._columns.items()
            ]
        )

    @classmethod
    def primary_key_columns(cls) -> list[str]:
        return [name for name, (_, _, cd) in cls._columns.items() if cd.primary_key]

    @classmethod
    def column_names(cls) -> list[str]:
        return list(cls._columns)


def schema_from_types(**kwargs) -> type[Schema]:
    """Reference ``pw.schema_from_types(a=int, b=str)`` (schema.py)."""
    ns = {"__annotations__": dict(kwargs)}
    return SchemaMeta("AdHocSchema", (Schema,), ns)


def schema_from_dict(types: dict) -> type[Schema]:
    """Reference ``pw.schema_from_dict``; values are annotations or
    (annotation, ColumnDefinition) pairs."""
    anns, ns = {}, {}
    for name, spec in types.items():
        if isinstance(spec, tuple):
            anns[name] = spec[0]
            ns[name] = spec[1]
        else:
            anns[name] = spec
    ns["__annotations__"] = anns
    return SchemaMeta("AdHocSchema", (Schema,), ns)


def schema_builder(columns: dict) -> type[Schema]:
    """Reference ``pw.schema_builder({name: pw.column_definition(...)})`` —
    dtypes come from each ColumnDefinition."""
    anns = {
        name: (cd.dtype if isinstance(cd, ColumnDefinition) and cd.dtype is not None else Any)
        for name, cd in columns.items()
    }
    for name, ann in anns.items():
        if ann is Any:
            raise TypeError(f"column {name!r} needs dtype= in column_definition")
    ns = dict(columns)
    ns["__annotations__"] = anns
    return SchemaMeta("AdHocSchema", (Schema,), ns)


def schema_from_csv(
    path: str,
    *,
    name: str | None = None,
    delimiter: str = ",",
    quote: str = '"',
    comment_character: str | None = None,
    num_parsed_rows: int | None = None,
) -> type[Schema]:
    """Generate a Schema from a CSV header + value inference — reference
    ``pw.schema_from_csv`` (internals/schema.py:832).  Like the reference,
    only str/int/float are inferred (num_parsed_rows=0 → all str)."""
    import csv as _csv

    def parses(vals, cast) -> bool:
        for v in vals:
            try:
                cast(v)
            except ValueError:
                return False
        return True

    with open(path, newline="") as f:
        lines = (
            ln for ln in f
            if comment_character is None or not ln.lstrip().startswith(comment_character)
        )
        reader = _csv.reader(lines, delimiter=delimiter, quotechar=quote)
        header = next(reader)
        rows = []
        for i, row in enumerate(reader):
            if num_parsed_rows is not None and i >= num_parsed_rows:
                break
            rows.append(row)
    anns: dict[str, Any] = {}
    for idx, col in enumerate(header):
        vals = [r[idx] for r in rows if idx < len(r)]
        if vals and parses(vals, int):
            anns[col] = int
        elif vals and parses(vals, float):
            anns[col] = float
        else:
            anns[col] = str
    return SchemaMeta(name or "CsvSchema", (Schema,), {"__annotations__": anns})


def wrap_py_object(obj: Any, *, serializer=None) -> bytes:
    """Reference ``pw.wrap_py_object`` (internals/api.py:256): make an
    arbitrary python object storable in a ``PyObjectWrapper`` (BinaryType)
    column.  Default serializer is pickle."""
    import pickle

    return serializer.dumps(obj) if serializer is not None else pickle.dumps(obj)


def unwrap_py_object(data: bytes, *, serializer=None) -> Any:
    import pickle

    return serializer.loads(data) if serializer is not None else pickle.loads(data)


def assert_table_has_schema(table, schema: type[Schema]) -> None:
    """Reference ``pw.assert_table_has_schema`` — name + Spark-type check."""
    actual = {f.name: f.dataType for f in table.df.schema.fields if f.name != "_pw_id"}
    expected = {name: dtype for name, (dtype, _, _) in schema._columns.items()}
    if actual != expected:
        raise AssertionError(f"schema mismatch: {actual} != {expected}")


def schema_from_pandas(
    dframe,
    *,
    id_from=None,
    name: str | None = None,
    exclude_columns=frozenset(),
) -> type[Schema]:
    """Reference internals/schema.py:107 — infer a Schema from a pandas
    DataFrame's dtypes."""
    _PD2PY = {"int64": int, "int32": int, "float64": float, "float32": float,
              "bool": bool, "object": str, "string": str}
    types = {}
    for col in dframe.columns:
        if col in exclude_columns:
            continue
        types[col] = _PD2PY.get(str(dframe[col].dtype), str)
    cls = schema_from_dict(types)
    if name:
        cls.__name__ = name
    if id_from:
        cls._id_from = list(id_from)
    return cls
