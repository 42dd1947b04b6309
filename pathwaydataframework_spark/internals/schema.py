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


_PY_TO_SPARK_TYPE = {
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bool: T.BooleanType(),
    bytes: T.BinaryType(),
    _dt.datetime: T.TimestampNTZType(),
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
}


def _annotation_to_spark(ann: Any) -> tuple[T.DataType, bool]:
    """(spark type, nullable) from a Python annotation."""
    if isinstance(ann, str):
        # stringized annotations (from __future__ import annotations)
        ann = eval(ann, _ANNOTATION_NAMESPACE)  # noqa: S307 — controlled namespace
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
        cls = super().__new__(mcls, name, bases, ns)
        columns: dict[str, tuple[T.DataType, bool, ColumnDefinition]] = {}
        for base in reversed(bases):
            columns.update(getattr(base, "_columns", {}))
        for attr, ann in ns.get("__annotations__", {}).items():
            if attr.startswith("_"):
                continue
            spark_type, nullable = _annotation_to_spark(ann)
            cd = ns.get(attr)
            if not isinstance(cd, ColumnDefinition):
                cd = ColumnDefinition()
            if cd.dtype is not None:
                spark_type, nullable = _annotation_to_spark(cd.dtype)
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
