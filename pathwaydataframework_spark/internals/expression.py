"""Lazy column-expression AST that lowers to ``pyspark.sql.Column``.

Mirrors the reference's expression surface (reference
``python/pathway/internals/expression.py``: ColumnReference :566, BinaryOp
:664, UnaryOp :690, Apply :744, Cast :795, Coalesce :846, Require :874,
IfElse :891, IsNone :915, Pointer :945, MakeTuple :979, Get :994) but instead
of lowering to an interpreted row-at-a-time engine IR we emit Catalyst
``Column`` trees, so whole-stage codegen and predicate pushdown apply for
free (SURVEY.md §4).

Resolution model: an :class:`Expr` is a closure over a
:class:`ResolutionContext` that maps column references (possibly qualified by
a table / join side) to concrete Spark columns.  ``pw.this`` / ``pw.left`` /
``pw.right`` are sentinel owners resolved by the active context, like the
reference's ``internals/thisclass.py`` / ``internals/desugaring.py``.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Callable

import pyspark.sql.functions as F
from pyspark.sql import Column

# Sentinel owners for unqualified / join-side references.
THIS = object()
LEFT = object()
RIGHT = object()


class ResolutionContext:
    """Maps (owner, column-name) to a concrete Spark Column."""

    def resolve_ref(self, ref: "ColumnRef") -> Column:  # pragma: no cover
        raise NotImplementedError

    def id_column(self, owner: Any = THIS) -> Column:
        """Row-id column (``_pw_id``) for argmin/argmax-style reducers."""
        raise NotImplementedError("this context has no row-id column")

    def probe_df(self):
        """DataFrame against which expressions can be type-probed (None when
        the context has no single frame)."""
        return None

    def probe_dtype(self, col: Column) -> str | None:
        """simpleString dtype of ``col`` in this context — analysis only, no
        job.  Lets overloaded operators dispatch on operand type the way the
        reference's type_interpreter does (``&``/``|`` logical vs bitwise,
        ``+`` numeric vs string concat)."""
        df = self.probe_df()
        if df is None:
            return None
        try:
            return df.select(col).schema[0].dataType.simpleString()
        except Exception:  # noqa: BLE001 — unprobeable → caller falls back
            return None


class Expr:
    """Base lazy expression; subclasses implement ``_resolve(ctx)``."""

    def _resolve(self, ctx: ResolutionContext) -> Column:
        raise NotImplementedError

    # -- arithmetic ---------------------------------------------------------
    def __add__(self, o):
        return DispatchBinOp(self, lift(o), _add_dispatch)

    def __radd__(self, o):
        return DispatchBinOp(lift(o), self, _add_dispatch)

    def __sub__(self, o):
        return DispatchBinOp(self, lift(o), _sub_dispatch)

    def __rsub__(self, o):
        return DispatchBinOp(lift(o), self, _sub_dispatch)

    def __mul__(self, o):
        return DispatchBinOp(self, lift(o), _mul_dispatch)

    def __rmul__(self, o):
        return DispatchBinOp(lift(o), self, _mul_dispatch)

    def __truediv__(self, o):
        return DispatchBinOp(self, lift(o), _div_dispatch)

    def __rtruediv__(self, o):
        return DispatchBinOp(lift(o), self, _div_dispatch)

    def __floordiv__(self, o):
        return DispatchBinOp(self, lift(o), _floordiv_dispatch)

    def __rfloordiv__(self, o):
        return DispatchBinOp(lift(o), self, _floordiv_dispatch)

    def __mod__(self, o):
        # floor-mod (sign of divisor), matching Python and the reference's
        # Integer::mod_floor (expression.rs:851); Spark's native % truncates.
        # Zero divisor routes to the null error channel (ANSI % would abort
        # the job; the reference yields a recoverable Error value).
        return BinOp(
            self,
            lift(o),
            lambda a, b: F.when(b != 0, ((a % b) + b) % b),
        )

    def __pow__(self, o):
        return BinOp(self, lift(o), lambda a, b: F.pow(a, b))

    def __neg__(self):
        return UnaryOp(self, lambda a: -a)

    def __abs__(self):
        return UnaryOp(self, F.abs)

    # -- comparison ---------------------------------------------------------
    def __eq__(self, o):  # type: ignore[override]
        return BinOp(self, lift(o), lambda a, b: a == b)

    def __ne__(self, o):  # type: ignore[override]
        return BinOp(self, lift(o), lambda a, b: a != b)

    def __lt__(self, o):
        return BinOp(self, lift(o), lambda a, b: a < b)

    def __le__(self, o):
        return BinOp(self, lift(o), lambda a, b: a <= b)

    def __gt__(self, o):
        return BinOp(self, lift(o), lambda a, b: a > b)

    def __ge__(self, o):
        return BinOp(self, lift(o), lambda a, b: a >= b)

    # -- boolean / bitwise --------------------------------------------------
    def __and__(self, o):
        return DispatchBinOp(self, lift(o), _and_dispatch)

    def __rand__(self, o):
        return DispatchBinOp(lift(o), self, _and_dispatch)

    def __or__(self, o):
        return DispatchBinOp(self, lift(o), _or_dispatch)

    def __ror__(self, o):
        return DispatchBinOp(lift(o), self, _or_dispatch)

    def __xor__(self, o):
        return DispatchBinOp(self, lift(o), _xor_dispatch)

    def __invert__(self):
        return UnaryOp(self, lambda a: ~a)

    def __matmul__(self, o):
        # vector dot product over array columns (reference supports ndarray
        # @ via src/mat_mul.rs; 1-D case is the common one)
        return BinOp(
            self,
            lift(o),
            lambda a, b: F.aggregate(
                F.zip_with(a, b, lambda x, y: x * y),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            ),
        )

    def __lshift__(self, o):
        # call_function passes a Column shift amount through to Catalyst's
        # ShiftLeft (the F.shiftleft wrapper accepts only a literal int)
        return BinOp(self, lift(o), lambda a, b: F.call_function("shiftleft", a, b))

    def __rshift__(self, o):
        return BinOp(self, lift(o), lambda a, b: F.call_function("shiftright", a, b))

    # -- container access (reference expression.py:316 Get) ----------------
    def __getitem__(self, idx):
        if isinstance(idx, slice):
            raise TypeError("use .str.slice for string slicing")
        # Python semantics: 0-based from the front, negative from the back.
        # element_at is 1-based positive / -1-based negative, so only shift
        # non-negative indices.
        return BinOp(
            self,
            lift(idx),
            lambda a, b: F.when(
                b >= 0, F.try_element_at(a, b + F.lit(1))
            ).otherwise(F.try_element_at(a, b)),
        )

    def get(self, idx, default=None):
        idx_e = lift(idx)
        dflt = lift(default)
        return FuncExpr(
            lambda a, b, d: F.coalesce(
                F.when(b >= 0, F.try_element_at(a, b + F.lit(1))).otherwise(
                    F.try_element_at(a, b)
                ),
                d,
            ),
            self,
            idx_e,
            dflt,
        )

    # -- JSON access (reference Json dtype: expression.py:316 Get /
    #    JsonGetItem expression.rs:114; conversions expression.py:451-511) --
    def json_get(self, path: str):
        """Extract a JSON field as string (``expr["k"]`` on Json columns in
        the reference); chain ``.as_int()/.as_float()/.as_bool()`` to
        convert like the reference's ``JsonToOptional``."""
        return UnaryOp(self, lambda a: F.get_json_object(a, f"$.{path}"))

    # -- null handling ------------------------------------------------------
    def is_none(self):
        return UnaryOp(self, lambda a: a.isNull())

    def is_not_none(self):
        return UnaryOp(self, lambda a: a.isNotNull())

    # -- conversions --------------------------------------------------------
    # try_cast, not cast: a malformed value yields the null error channel
    # (the reference's conversion failures are recoverable Error values);
    # under ANSI a plain cast would abort the whole job on one bad cell
    def to_string(self):
        return UnaryOp(self, lambda a: a.try_cast("string"))

    def as_int(self):
        return UnaryOp(self, lambda a: a.try_cast("long"))

    def as_float(self):
        return UnaryOp(self, lambda a: a.try_cast("double"))

    def as_str(self):
        return UnaryOp(self, lambda a: a.try_cast("string"))

    def as_bool(self):
        return UnaryOp(self, lambda a: a.try_cast("boolean"))

    # -- namespaces (attached in functions/__init__.py) ---------------------
    @property
    def str(self):
        from pathwaydataframework_spark.functions import StringNamespace

        return StringNamespace(self)

    @property
    def dt(self):
        from pathwaydataframework_spark.functions import DateTimeNamespace

        return DateTimeNamespace(self)

    @property
    def num(self):
        from pathwaydataframework_spark.functions import NumericalNamespace

        return NumericalNamespace(self)

    # Expr objects are stored in dicts/sets during planning; identity hash is
    # fine because __eq__ builds an expression instead of comparing.
    __hash__ = object.__hash__


class ColumnRef(Expr):
    def __init__(self, owner: Any, name: str):
        self._owner = owner
        self._name = name

    @property
    def name(self) -> str:
        return self._name

    @property
    def owner(self) -> Any:
        return self._owner

    def _resolve(self, ctx: ResolutionContext) -> Column:
        return ctx.resolve_ref(self)

    def __repr__(self):
        return f"ColumnRef({self._name})"


class Literal(Expr):
    def __init__(self, value: Any):
        self._value = value

    def _resolve(self, ctx: ResolutionContext) -> Column:
        return F.lit(self._value)


class BinOp(Expr):
    def __init__(self, left: Expr, right: Expr, fn: Callable[[Column, Column], Column]):
        self._l, self._r, self._fn = left, right, fn

    def _resolve(self, ctx):
        return self._fn(self._l._resolve(ctx), self._r._resolve(ctx))


class DispatchBinOp(Expr):
    """Binary op whose Spark form depends on the operand dtype — the
    analogue of the reference's typing table (operator_mapping.py:76):
    ``&``/``|`` are logical on BOOL but bitwise on INT; ``+`` is concat on
    STR.  The dtype comes from an analysis-only context probe; unprobeable
    contexts fall back to the boolean/numeric form."""

    def __init__(self, left: Expr, right: Expr, fn):
        self._l, self._r, self._fn = left, right, fn

    def _resolve(self, ctx):
        a, b = self._l._resolve(ctx), self._r._resolve(ctx)
        return self._fn(ctx.probe_dtype(a), ctx.probe_dtype(b), a, b)


_INTISH = ("bigint", "int", "smallint", "tinyint")


def _add_dispatch(lt, rt, a, b):
    if lt == "string":
        return F.concat(a, b)
    # try_add: int64 overflow yields the null error channel (the
    # reference's checked arithmetic yields an Error value), instead of
    # aborting the job under ANSI
    return F.try_add(a, b)


def _and_dispatch(lt, rt, a, b):
    if lt in _INTISH:
        return a.bitwiseAND(b)
    return a & b


def _or_dispatch(lt, rt, a, b):
    if lt in _INTISH:
        return a.bitwiseOR(b)
    return a | b


def _xor_dispatch(lt, rt, a, b):
    if lt == "boolean":
        return a != b
    return a.bitwiseXOR(b)


_NUMERIC = ("bigint", "int", "smallint", "tinyint", "double", "float")


def _sub_dispatch(lt, rt, a, b):
    # numeric overflow → null error channel (see _add_dispatch); temporal
    # subtraction (timestamp - timestamp → interval, timestamp - interval)
    # and unprobeable contexts keep the native operator (try_subtract does
    # not accept a timestamp-timestamp pair)
    if lt in _NUMERIC and rt in _NUMERIC:
        return F.try_subtract(a, b)
    return a - b


def _mul_dispatch(lt, rt, a, b):
    # STR*INT / INT*STR → repetition (reference operator_mapping.py:125)
    if lt == "string":
        return F.call_function("repeat", a, b)
    if rt == "string":
        return F.call_function("repeat", b, a)
    # overflow → null error channel (see _add_dispatch)
    return F.try_multiply(a, b)


def _div_dispatch(lt, rt, a, b):
    # DURATION / DURATION → FLOAT ratio (reference DurationTrueDiv); Spark
    # has no interval division, so divide the micros.
    # try_divide, not `/`: the reference's x/0 yields an Error VALUE
    # (recoverable with fill_error, droppable with remove_errors); under
    # Spark 4's default ANSI mode a plain `/` would abort the whole job.
    # Our error channel is null (SURVEY §7), so try_divide IS the channel.
    if lt and rt and lt.startswith("interval") and rt.startswith("interval"):
        return F.try_divide(_dur_micros(a), _dur_micros(b))
    return F.try_divide(a, b)


def _floordiv_dispatch(lt, rt, a, b):
    if lt and rt and lt.startswith("interval") and rt.startswith("interval"):
        return F.floor(F.try_divide(_dur_micros(a), _dur_micros(b)))
    return F.floor(F.try_divide(a, b))


def _dur_micros(c: Column) -> Column:
    return c.cast("interval day to second").cast("bigint")


class UnaryOp(Expr):
    def __init__(self, operand: Expr, fn: Callable[[Column], Column]):
        self._o, self._fn = operand, fn

    def _resolve(self, ctx):
        return self._fn(self._o._resolve(ctx))


class FuncExpr(Expr):
    """Generic n-ary expression: fn(*resolved_children)."""

    def __init__(self, fn: Callable[..., Column], *children: Expr):
        self._fn = fn
        self._children = children

    def _resolve(self, ctx):
        return self._fn(*[c._resolve(ctx) for c in self._children])


class RawColumn(Expr):
    """Escape hatch wrapping a pre-built Spark Column."""

    def __init__(self, col: Column):
        self._col = col

    def _resolve(self, ctx):
        return self._col


def lift(x: Any) -> Expr:
    """Coerce a Python value / Column into an Expr."""
    if isinstance(x, Expr):
        return x
    if isinstance(x, Column):
        return RawColumn(x)
    if x is None or isinstance(
        x, (bool, int, float, str, bytes, _dt.datetime, _dt.date, _dt.timedelta)
    ):
        return Literal(x)
    if isinstance(x, (list, tuple)):
        return FuncExpr(lambda *cs: F.array(*cs), *[lift(v) for v in x])
    raise TypeError(f"cannot lift {type(x)!r} into an expression")


class _ThisLike:
    """``pw.this`` / ``pw.left`` / ``pw.right`` attribute factories.

    Reference: ``internals/thisclass.py:21`` (ThisMetaclass).
    """

    def __init__(self, owner):
        self._owner = owner

    def __getattr__(self, name: str) -> ColumnRef:
        # `_pw_*` names ARE data columns in the reference (windowby key
        # columns: pw.this._pw_instance/_pw_window_start/_pw_window_end)
        if name.startswith("_") and not name.startswith("_pw_"):
            raise AttributeError(name)
        return ColumnRef(self._owner, name)

    def __getitem__(self, name: str) -> ColumnRef:
        return ColumnRef(self._owner, name)


this = _ThisLike(THIS)
left = _ThisLike(LEFT)
right = _ThisLike(RIGHT)


# -- global helper functions (reference internals/common.py) ----------------


def if_else(cond, then, otherwise):
    """Reference ``pw.if_else`` (common.py:328)."""
    return FuncExpr(
        lambda c, t, o: F.when(c, t).otherwise(o), lift(cond), lift(then), lift(otherwise)
    )


def coalesce(*args):
    """Reference ``pw.coalesce`` (common.py:277)."""
    return FuncExpr(lambda *cs: F.coalesce(*cs), *[lift(a) for a in args])


def require(val, *conds):
    """Null-propagating guard — reference ``pw.require`` (common.py:302)."""
    val_e = lift(val)
    cond_es = [lift(c) for c in conds]

    def _fn(v, *cs):
        pred = cs[0]
        for c in cs[1:]:
            pred = pred & c
        return F.when(pred, v).otherwise(F.lit(None))

    return FuncExpr(_fn, val_e, *cond_es)


def cast(dtype, expr):
    """Reference ``pw.cast`` (common.py:242); dtype is a Spark type string.
    try_cast: a malformed value yields the null error channel (the
    reference's cast failure is a recoverable Error value) instead of
    aborting the job under ANSI."""
    spark_type = _dtype_to_spark(dtype)
    return UnaryOp(lift(expr), lambda a: a.try_cast(spark_type))


def declare_type(dtype, expr):
    """Type annotation only — no runtime effect (common.py:215)."""
    return lift(expr)


def unwrap(expr):
    """Assert non-null (common.py:399): nulls raise at execution time.

    ``raise_error`` has NullType, which coerces to the operand's own type in
    the casewhen — works for any column type (the earlier ``assert_true``
    variant cast the sentinel to boolean and failed analysis on non-boolean
    operands).
    """
    return UnaryOp(
        lift(expr),
        lambda a: F.when(a.isNotNull(), a).otherwise(
            F.raise_error(F.lit("unwrap() got None"))
        ),
    )


def fill_error(expr, default):
    """Per-cell Error recovery (common.py:438).

    Spark has no Error value; our error channel is null (SURVEY.md §7), so
    fill_error ≡ coalesce.
    """
    return coalesce(expr, default)


def hll_estimate(expr):
    """Distinct-count estimate from a BINARY HyperLogLog sketch column
    (``reducers.hll_sketch`` / ``reducers.hll_union``) — Spark
    ``hll_sketch_estimate``.  Extension over the reference's reducer set:
    stored sketches answer rollup distinct-counts without rescanning."""
    return UnaryOp(lift(expr), F.hll_sketch_estimate)


def make_tuple(*args):
    """Reference ``pw.make_tuple`` (common.py:361) → Spark array/struct."""
    return FuncExpr(lambda *cs: F.array(*cs), *[lift(a) for a in args])


def apply(fn, *args, result_type: str = "string"):
    """Row-wise Python function — reference ``pw.apply`` (common.py:96).

    The slow path: use built-in expressions wherever possible.  Lowered to an
    Arrow-optimized Python UDF.
    """
    spark_type = _dtype_to_spark(result_type)
    udf = F.udf(fn, spark_type, useArrow=True)
    return FuncExpr(lambda *cs: udf(*cs), *[lift(a) for a in args])


def apply_with_type(fn, result_type, *args):
    """Reference ``pw.apply_with_type`` (common.py:132)."""
    return apply(fn, *args, result_type=result_type)


_PY_TO_SPARK = {
    int: "long",
    float: "double",
    str: "string",
    bool: "boolean",
    bytes: "binary",
    _dt.datetime: "timestamp_ntz",
    _dt.timedelta: "interval day to second",
}


_PY_NAME_TO_SPARK = {
    "int": "long",
    "float": "double",
    "str": "string",
    "bool": "boolean",
    "bytes": "binary",
    "datetime": "timestamp_ntz",
    "datetime.datetime": "timestamp_ntz",
}


def _dtype_to_spark(dtype) -> str:
    """Map reference dtypes (python types / strings) to Spark type strings.

    Mirrors the dtype table in SURVEY.md §1.2 (reference internals/dtype.py).
    Accepts python type objects, python type NAMES (stringized annotations
    under ``from __future__ import annotations``), and Spark DDL strings.
    """
    if isinstance(dtype, str):
        return _PY_NAME_TO_SPARK.get(dtype, dtype)
    if dtype in _PY_TO_SPARK:
        return _PY_TO_SPARK[dtype]
    raise TypeError(f"unsupported dtype {dtype!r}")
