"""Scalar function namespaces: ``expr.str``, ``expr.dt``, ``expr.num``.

Parity targets (SURVEY.md §2.7):
- string: reference ``internals/expressions/string.py`` (lower:33 … parse_bool:872)
- datetime: reference ``internals/expressions/date_time.py`` (nanosecond:41 … weeks:1423)
- numeric: reference ``internals/expressions/numerical.py`` (abs:30, round:66, fill_na:144)

Everything lowers to JVM-side ``pyspark.sql.functions`` (whole-stage codegen);
the only non-native op (``swapcase``) uses character-translate built-ins, not a
Python UDF.
"""

from __future__ import annotations

import string as _string

import pyspark.sql.functions as F

from pathwaydataframework_spark.internals.expression import (
    Expr,
    FuncExpr,
    UnaryOp,
    lift,
)

_ASCII_LOWER = _string.ascii_lowercase
_ASCII_UPPER = _string.ascii_uppercase


class StringNamespace:
    def __init__(self, expr: Expr):
        self._e = expr

    def lower(self):
        return UnaryOp(self._e, F.lower)

    def upper(self):
        return UnaryOp(self._e, F.upper)

    def reversed(self):
        return UnaryOp(self._e, F.reverse)

    def len(self):
        return UnaryOp(self._e, lambda a: F.length(a).cast("long"))

    def replace(self, old, new):
        return FuncExpr(F.replace, self._e, lift(old), lift(new))

    def startswith(self, prefix):
        return FuncExpr(lambda a, p: a.startswith(p), self._e, lift(prefix))

    def endswith(self, suffix):
        return FuncExpr(lambda a, s: a.endswith(s), self._e, lift(suffix))

    def swapcase(self):
        # translate() is JVM-side; covers ASCII like the reference's tests.
        return UnaryOp(
            self._e, lambda a: F.translate(a, _ASCII_LOWER + _ASCII_UPPER, _ASCII_UPPER + _ASCII_LOWER)
        )

    def strip(self, chars=None):
        if chars is None:
            return UnaryOp(self._e, F.trim)
        return FuncExpr(lambda a, c: F.btrim(a, c), self._e, lift(chars))

    def title(self):
        return UnaryOp(self._e, F.initcap)

    @staticmethod
    def _py_bounds(a: Column, lo: Column, hi: Column) -> tuple[Column, Column]:
        """Normalize ``a[lo:hi]`` bounds with full Python slice semantics —
        negative bounds count from the end (length+bound, clamped to
        [0, length]) — matching the reference's delegation to
        str.count/str.find (string.py:473,526,580)."""
        length = F.length(a)
        lo_i = lo.cast("int")
        lo_c = F.least(
            F.greatest(F.when(lo_i < 0, length + lo_i).otherwise(lo_i), F.lit(0)),
            length,
        )
        hi_i = hi.cast("int")
        hi_c = F.when(hi.isNull(), length).otherwise(
            F.least(
                F.greatest(F.when(hi_i < 0, length + hi_i).otherwise(hi_i), F.lit(0)),
                length,
            )
        )
        return lo_c, hi_c

    @classmethod
    def _py_slice(cls, a: Column, lo: Column, hi: Column) -> Column:
        lo_c, hi_c = cls._py_bounds(a, lo, hi)
        return F.substring(a, lo_c + 1, F.greatest(hi_c - lo_c, F.lit(0)))

    def count(self, sub, start=None, end=None):
        # Non-overlapping occurrence count (Python str.count semantics) in
        # the [start, end) slice, computed JVM-side without regex escaping.
        def _fn(a, s, lo, hi):
            sliced = self._py_slice(a, lo, hi)
            return (
                F.when(F.length(s) == 0, F.lit(0))
                .otherwise(
                    (F.length(sliced) - F.length(F.replace(sliced, s, F.lit(""))))
                    / F.length(s)
                )
                .cast("long")
            )

        return FuncExpr(
            _fn, self._e, lift(sub), lift(0 if start is None else start), lift(end)
        )

    def find(self, sub, start=None, end=None):
        # Python semantics: lowest 0-based index of sub within a[start:end],
        # -1 if absent (instr is 1-based, 0 if absent).
        def _fn(a, s, lo, hi):
            sliced = self._py_slice(a, lo, hi)
            pos = F.instr(sliced, s)
            lo_c, _ = self._py_bounds(a, lo, hi)
            return (
                F.when(pos == 0, F.lit(-1)).otherwise(lo_c + pos - 1)
            ).cast("long")

        return FuncExpr(
            _fn, self._e, lift(sub), lift(0 if start is None else start), lift(end)
        )

    def rfind(self, sub, start=None, end=None):
        def _fn(a, s, lo, hi):
            sliced = self._py_slice(a, lo, hi)
            rev_pos = F.instr(F.reverse(sliced), F.reverse(s))
            lo_c, _ = self._py_bounds(a, lo, hi)
            rel = F.length(sliced) - rev_pos - F.length(s) + 1
            return F.when(rev_pos == 0, F.lit(-1)).otherwise(lo_c + rel).cast("long")

        return FuncExpr(
            _fn, self._e, lift(sub), lift(0 if start is None else start), lift(end)
        )

    def removeprefix(self, prefix):
        def _fn(a, p):
            return F.when(a.startswith(p), F.substring(a, F.length(p) + 1, F.length(a))).otherwise(a)

        return FuncExpr(_fn, self._e, lift(prefix))

    def removesuffix(self, suffix):
        def _fn(a, s):
            return F.when(a.endswith(s), F.substring(a, 1, F.length(a) - F.length(s))).otherwise(a)

        return FuncExpr(_fn, self._e, lift(suffix))

    def slice(self, start, stop):
        # Python-style [start:stop) on 0-based indices.
        return FuncExpr(
            lambda a, lo, hi: F.substring(a, lo + 1, hi - lo), self._e, lift(start), lift(stop)
        )

    def parse_int(self, optional: bool = False):
        # try_cast: malformed input yields NULL — the engine's error
        # channel stands in for the reference's per-cell Error value, so
        # optional=False and True coincide here (DEVIATIONS: null channel).
        # A plain cast under Spark 4's default ANSI mode would abort the
        # whole job with CAST_INVALID_INPUT.
        return UnaryOp(self._e, lambda a: a.try_cast("long"))

    def parse_float(self, optional: bool = False):
        return UnaryOp(self._e, lambda a: a.try_cast("double"))

    def parse_bool(
        self,
        true_values=("on", "true", "yes", "1"),
        false_values=("off", "false", "no", "0"),
        optional: bool = False,
    ):
        """Reference string.py:872 — case-insensitive membership in the
        true/false value sets; anything else is NULL (the null error
        channel, for optional=False too — DEVIATIONS)."""
        tv = [s.lower() for s in true_values]
        fv = [s.lower() for s in false_values]

        def _fn(a):
            low = F.lower(a)
            return (
                F.when(low.isin(*tv), F.lit(True))
                .when(low.isin(*fv), F.lit(False))
                .otherwise(F.lit(None).cast("boolean"))
            )

        return UnaryOp(self._e, _fn)

    # -- extensions beyond the reference (useful for text pipelines) --------
    def split(self, pattern):
        return FuncExpr(lambda a, p: F.split(a, p), self._e, lift(pattern))

    def contains(self, sub):
        return FuncExpr(lambda a, s: a.contains(s), self._e, lift(sub))


class DateTimeNamespace:
    def __init__(self, expr: Expr):
        self._e = expr

    def nanosecond(self):
        # Sub-second component in nanoseconds (reference date_time.py:41).
        return UnaryOp(
            self._e,
            lambda a: ((F.unix_micros(a.cast("timestamp")) % 1_000_000) * 1000).cast("long"),
        )

    def microsecond(self):
        return UnaryOp(
            self._e, lambda a: (F.unix_micros(a.cast("timestamp")) % 1_000_000).cast("long")
        )

    def millisecond(self):
        return UnaryOp(
            self._e, lambda a: ((F.unix_micros(a.cast("timestamp")) % 1_000_000) / 1000).cast("long")
        )

    def second(self):
        return UnaryOp(self._e, lambda a: F.second(a).cast("long"))

    def minute(self):
        return UnaryOp(self._e, lambda a: F.minute(a).cast("long"))

    def hour(self):
        return UnaryOp(self._e, lambda a: F.hour(a).cast("long"))

    def day(self):
        return UnaryOp(self._e, lambda a: F.dayofmonth(a).cast("long"))

    def month(self):
        return UnaryOp(self._e, lambda a: F.month(a).cast("long"))

    def year(self):
        return UnaryOp(self._e, lambda a: F.year(a).cast("long"))

    def quarter(self):
        return UnaryOp(self._e, lambda a: F.quarter(a).cast("long"))

    def weekday(self):
        # Monday=0 like the reference (date_time.py:1567); Spark dayofweek: Sun=1.
        return UnaryOp(self._e, lambda a: ((F.dayofweek(a) + 5) % 7).cast("long"))

    def timestamp(self, unit: str = "s"):
        divisors = {"ns": 1e-3, "us": 1, "ms": 1000, "s": 1_000_000}
        if unit not in divisors:
            raise ValueError(f"bad unit {unit}")
        d = divisors[unit]
        return UnaryOp(
            self._e, lambda a: (F.unix_micros(a.cast("timestamp")) / F.lit(d)).cast("long")
        )

    def strftime(self, fmt: str):
        # Accepts Java SimpleDateFormat-style patterns (documented deviation:
        # reference uses C strftime patterns).
        return UnaryOp(self._e, lambda a: F.date_format(a, fmt))

    def strptime(self, fmt: str):
        # try_to_timestamp: an unparseable string yields the null error
        # channel (reference strptime failure is a recoverable Error value)
        # instead of aborting the job under ANSI
        return UnaryOp(self._e, lambda a: F.try_to_timestamp(a, F.lit(fmt)))

    def to_utc(self, from_timezone: str):
        return FuncExpr(
            lambda a, tz: F.to_utc_timestamp(a, tz), self._e, lift(from_timezone)
        )

    def to_naive_in_timezone(self, timezone: str):
        return FuncExpr(
            lambda a, tz: F.from_utc_timestamp(a, tz), self._e, lift(timezone)
        )

    @staticmethod
    def _as_interval(duration):
        """timedelta / 'N unit' string / column → DayTimeInterval column."""
        import datetime as _dt

        if isinstance(duration, _dt.timedelta):
            return F.lit(duration)
        if isinstance(duration, str):
            return F.expr(f"INTERVAL {duration}")
        return lift(duration)._resolve  # resolved via FuncExpr below

    def add_duration_in_timezone(self, duration, timezone: str):
        """Reference date_time.py add_duration_in_timezone — DST-aware
        wall-clock arithmetic: interpret the naive timestamp in ``timezone``,
        add the duration in absolute time, come back to naive."""
        iv = self._as_interval(duration)
        if callable(iv):  # a column expression: resolve alongside
            return FuncExpr(
                lambda a, d, tz: F.from_utc_timestamp(
                    F.to_utc_timestamp(a, tz) + d, tz
                ),
                self._e, lift(duration), lift(timezone),
            )
        return FuncExpr(
            lambda a, tz: F.from_utc_timestamp(F.to_utc_timestamp(a, tz) + iv, tz),
            self._e, lift(timezone),
        )

    def subtract_duration_in_timezone(self, duration, timezone: str):
        """Reference date_time.py subtract_duration_in_timezone."""
        iv = self._as_interval(duration)
        if callable(iv):
            return FuncExpr(
                lambda a, d, tz: F.from_utc_timestamp(
                    F.to_utc_timestamp(a, tz) - d, tz
                ),
                self._e, lift(duration), lift(timezone),
            )
        return FuncExpr(
            lambda a, tz: F.from_utc_timestamp(F.to_utc_timestamp(a, tz) - iv, tz),
            self._e, lift(timezone),
        )

    def subtract_date_time_in_timezone(self, other, timezone: str):
        """Reference date_time.py subtract_date_time_in_timezone — the
        absolute-time difference between two naive timestamps interpreted
        in ``timezone`` (DST transitions included)."""
        return FuncExpr(
            lambda a, b, tz: F.to_utc_timestamp(a, tz) - F.to_utc_timestamp(b, tz),
            self._e, lift(other), lift(timezone),
        )

    def round(self, duration: str):
        unit = _duration_to_trunc_unit(duration)
        micros = max(int(round(_duration_to_seconds(duration) * 1_000_000)), 1)
        half = micros // 2
        return UnaryOp(
            self._e,
            lambda a: F.timestamp_micros(
                F.floor((F.unix_micros(a.cast("timestamp")) + F.lit(half)) / F.lit(micros)).cast("long")
                * F.lit(micros)
            )
            if unit is None
            else F.date_trunc(unit, F.timestamp_micros(F.unix_micros(a.cast("timestamp")) + F.lit(half))),
        )

    def floor(self, duration: str):
        # integer-microsecond arithmetic: int(secs) floored sub-second
        # durations to 0 and collapsed every timestamp to the epoch
        micros = max(int(round(_duration_to_seconds(duration) * 1_000_000)), 1)
        return UnaryOp(
            self._e,
            lambda a: F.timestamp_micros(
                F.floor(F.unix_micros(a.cast("timestamp")) / F.lit(micros)).cast("long")
                * F.lit(micros)
            ),
        )

    def from_timestamp(self, unit: str = "s"):
        mult = {"s": 1_000_000, "ms": 1000, "us": 1, "ns": 1e-3}[unit]
        return UnaryOp(
            self._e, lambda a: F.timestamp_micros((a * mult).cast("long")).cast("timestamp_ntz")
        )

    def utc_from_timestamp(self, unit: str = "s"):
        mult = {"s": 1_000_000, "ms": 1000, "us": 1, "ns": 1e-3}[unit]
        return UnaryOp(self._e, lambda a: F.timestamp_micros((a * mult).cast("long")))

    # duration accessors (operand is DayTimeInterval or microseconds long)
    def nanoseconds(self):
        return UnaryOp(self._e, lambda a: (_interval_micros(a) * 1000).cast("long"))

    def microseconds(self):
        return UnaryOp(self._e, lambda a: _interval_micros(a).cast("long"))

    def milliseconds(self):
        return UnaryOp(self._e, lambda a: (_interval_micros(a) / 1000).cast("long"))

    def seconds(self):
        return UnaryOp(self._e, lambda a: (_interval_micros(a) / 1_000_000).cast("long"))

    def minutes(self):
        return UnaryOp(self._e, lambda a: (_interval_micros(a) / 60_000_000).cast("long"))

    def hours(self):
        return UnaryOp(self._e, lambda a: (_interval_micros(a) / 3_600_000_000).cast("long"))

    def days(self):
        return UnaryOp(self._e, lambda a: (_interval_micros(a) / 86_400_000_000).cast("long"))

    def weeks(self):
        return UnaryOp(self._e, lambda a: (_interval_micros(a) / 604_800_000_000).cast("long"))


def _interval_micros(col):
    # DayTimeIntervalType casts to long as total microseconds in Spark.
    return col.cast("long")


_TRUNC_UNITS = {
    "1 day": "day",
    "1 hour": "hour",
    "1 minute": "minute",
    "1 second": "second",
}


def _duration_to_trunc_unit(duration: str):
    return _TRUNC_UNITS.get(duration)


def _duration_to_seconds(duration: str) -> float:
    import re

    m = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*(\w+)\s*", duration)
    if not m:
        raise ValueError(f"bad duration {duration!r}")
    n, unit = float(m.group(1)), m.group(2).rstrip("s")
    mult = {
        "week": 604800,
        "day": 86400,
        "hour": 3600,
        "minute": 60,
        "min": 60,
        "second": 1,
        "sec": 1,
        "millisecond": 1e-3,
        "microsecond": 1e-6,
    }[unit]
    return n * mult


class NumericalNamespace:
    def __init__(self, expr: Expr):
        self._e = expr

    def abs(self):
        return UnaryOp(self._e, F.abs)

    def round(self, decimals=0):
        if isinstance(decimals, int):
            return FuncExpr(lambda a, d: F.round(a, d), self._e, lift(decimals))
        # column-valued precision (reference numerical.py round accepts an
        # expression): shift-round-unshift, since F.round needs a foldable
        # scale
        return FuncExpr(
            lambda a, d: F.round(a * F.pow(F.lit(10.0), d)) / F.pow(F.lit(10.0), d),
            self._e,
            lift(decimals),
        )

    def fill_na(self, default):
        return FuncExpr(
            lambda a, d: F.coalesce(F.when(F.isnan(a.cast("double")), None).otherwise(a), d),
            self._e,
            lift(default),
        )
