"""Binary-op × dtype semantics matrix — mirror of the reference's
tests/test_operators.py against its typing table
(internals/operator_mapping.py:76) and Rust eval semantics
(src/engine/expression.rs:838 — div_floor / mod_floor on ints).
Expectations are computed by Python, the reference's ground truth.
"""

from __future__ import annotations

import datetime as dt

import pytest

import pathwaydataframework_spark as pw


@pytest.fixture(scope="module")
def t(spark):
    return pw.Table.from_rows(
        spark,
        [
            (
                7, -7, 2,
                7.5, -7.5, 2.0,
                True, False,
                "ab", "cd",
                dt.datetime(2024, 1, 2, 3, 4, 5),
                dt.datetime(2024, 1, 1, 0, 0, 0),
            )
        ],
        "i long, ni long, j long, f double, nf double, g double, "
        "p boolean, q boolean, s string, u string, d1 timestamp_ntz, d2 timestamp_ntz",
    )


def ev(t, expr):
    return t.select(out=expr).df.collect()[0][0]


D1 = dt.datetime(2024, 1, 2, 3, 4, 5)
D2 = dt.datetime(2024, 1, 1, 0, 0, 0)
TD = dt.timedelta(hours=2)

INT_CASES = [
    ("add", lambda T: T.i + T.j, 7 + 2),
    ("sub", lambda T: T.i - T.j, 7 - 2),
    ("mul", lambda T: T.i * T.j, 7 * 2),
    ("floordiv", lambda T: T.i // T.j, 7 // 2),
    ("floordiv_neg", lambda T: T.ni // T.j, -7 // 2),   # div_floor: -4
    ("truediv", lambda T: T.i / T.j, 7 / 2),
    ("mod", lambda T: T.i % T.j, 7 % 2),
    ("mod_neg", lambda T: T.ni % T.j, -7 % 2),          # mod_floor: 1
    ("pow", lambda T: T.i ** T.j, 49.0),
    ("lshift", lambda T: T.i << T.j, 7 << 2),
    ("rshift", lambda T: T.ni >> T.j, -7 >> 2),
    ("bitand", lambda T: T.i & T.j, 7 & 2),
    ("bitor", lambda T: T.i | T.j, 7 | 2),
    ("bitxor", lambda T: T.i ^ T.j, 7 ^ 2),
    ("eq", lambda T: T.i == T.j, False),
    ("ne", lambda T: T.i != T.j, True),
    ("lt", lambda T: T.i < T.j, False),
    ("le", lambda T: T.i <= T.i, True),
    ("gt", lambda T: T.i > T.j, True),
    ("ge", lambda T: T.j >= T.i, False),
    ("neg", lambda T: -T.i, -7),
    ("abs", lambda T: abs(T.ni), 7),
]

FLOAT_CASES = [
    ("add", lambda T: T.f + T.g, 7.5 + 2.0),
    ("sub", lambda T: T.f - T.g, 7.5 - 2.0),
    ("mul", lambda T: T.f * T.g, 7.5 * 2.0),
    ("floordiv", lambda T: T.nf // T.g, -7.5 // 2.0),   # -4.0
    ("truediv", lambda T: T.f / T.g, 7.5 / 2.0),
    ("mod", lambda T: T.nf % T.g, -7.5 % 2.0),          # 0.5
    ("pow", lambda T: T.f ** T.g, 7.5 ** 2.0),
    ("lt", lambda T: T.nf < T.g, True),
]

BOOL_CASES = [
    ("and", lambda T: T.p & T.q, False),
    ("or", lambda T: T.p | T.q, True),
    ("eq", lambda T: T.p == T.q, False),
    ("lt", lambda T: T.q < T.p, True),      # False < True
    ("inv", lambda T: ~T.q, True),
]

STR_CASES = [
    ("concat", lambda T: T.s + T.u, "abcd"),
    ("eq", lambda T: T.s == T.u, False),
    ("lt", lambda T: T.s < T.u, True),
    ("ge", lambda T: T.u >= T.s, True),
    ("mul_int", lambda T: T.s * T.j, "ab" * 2),
    ("int_mul", lambda T: T.j * T.s, 2 * "ab"),
]

DT_CASES = [
    ("lt", lambda T: T.d2 < T.d1, True),
    ("eq", lambda T: T.d1 == T.d1, True),
    ("sub", lambda T: T.d1 - T.d2, D1 - D2),            # → duration
    ("add_dur", lambda T: T.d2 + TD, D2 + TD),
    ("sub_dur", lambda T: T.d1 - TD, D1 - TD),
]

DUR_CASES = [
    ("dur_add", lambda T: (T.d1 - T.d2) + TD, (D1 - D2) + TD),
    ("dur_sub", lambda T: (T.d1 - T.d2) - TD, (D1 - D2) - TD),
    ("dur_neg", lambda T: -(T.d1 - T.d2), -(D1 - D2)),
    ("dur_mul_int", lambda T: (T.d1 - T.d2) * T.j, (D1 - D2) * 2),
    ("dur_cmp", lambda T: (T.d1 - T.d2) > TD, True),
    ("dur_truediv_dur", lambda T: (T.d1 - T.d2) / TD, (D1 - D2) / TD),
    ("dur_floordiv_dur", lambda T: (T.d1 - T.d2) // TD, (D1 - D2) // TD),
]

XOR_CASES = [
    ("bool_xor", lambda T: T.p ^ T.q, True),
    ("bool_xor_same", lambda T: T.p ^ T.p, False),
]


def _param(cases, prefix):
    return [pytest.param(fn, exp, id=f"{prefix}_{name}") for name, fn, exp in cases]


@pytest.mark.parametrize(
    "fn,expected",
    _param(INT_CASES, "int") + _param(FLOAT_CASES, "float")
    + _param(BOOL_CASES, "bool") + _param(STR_CASES, "str")
    + _param(DT_CASES, "dt") + _param(DUR_CASES, "dur")
    + _param(XOR_CASES, "xor"),
)
def test_operator_matrix(t, fn, expected):
    got = ev(t, fn(t))
    if isinstance(expected, float):
        assert got == pytest.approx(expected)
    else:
        assert got == expected
