"""`pw.sql` node-coverage matrix — one case per handler the reference's
sqlglot lowering registers (internals/sql.py, SURVEY §2.11), plus the
constructs the reference REJECTS but our Spark-SQL passthrough supports
(ORDER BY / LIMIT / DISTINCT / window functions / EXCEPT).
"""

from __future__ import annotations

import pytest

import pathwaydataframework_spark as pw


@pytest.fixture(scope="module")
def tabs(spark):
    t = pw.Table.from_rows(
        spark,
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, None, 40.0)],
        "k long, grp string, x double",
    )
    u = pw.Table.from_rows(spark, [(1, "one"), (3, "three")], "k long, label string")
    return t, u


def rows(table):
    return sorted((tuple(r) for r in table.df.collect()), key=repr)


# (name, sql, expected) — the reference-supported node list
CASES = [
    ("select_star", "SELECT * FROM t WHERE k = 1", [(1, "a", 10.0)]),
    ("alias_arith", "SELECT k + 1 AS k1, x * 2 AS x2 FROM t WHERE k <= 2", [(2, 20.0), (3, 40.0)]),
    ("intdiv_mod_neg", "SELECT k DIV 2 AS d, k % 2 AS m, -k AS n FROM t WHERE k = 3", [(1, 1, -3)]),
    ("bool_and_or_not", "SELECT k FROM t WHERE NOT (k < 2 OR k > 3) AND x > 0", [(2,), (3,)]),
    ("comparisons", "SELECT k FROM t WHERE x >= 20 AND x <= 30 AND k <> 1", [(2,), (3,)]),
    ("is_null", "SELECT k FROM t WHERE grp IS NULL", [(4,)]),
    ("between", "SELECT k FROM t WHERE x BETWEEN 15 AND 35", [(2,), (3,)]),
    ("case", "SELECT k, CASE WHEN x < 15 THEN 'lo' ELSE 'hi' END AS b FROM t WHERE k <= 2", [(1, "lo"), (2, "hi")]),
    ("if_fn", "SELECT if(x > 15, 1, 0) AS f FROM t WHERE k <= 2", [(0,), (1,)]),
    ("group_agg", "SELECT grp, count(*) AS n, sum(x) AS s, avg(x) AS a, min(k) AS mn, max(k) AS mx FROM t WHERE grp IS NOT NULL GROUP BY grp", [("a", 2, 40.0, 20.0, 1, 3), ("b", 1, 20.0, 20.0, 2, 2)]),
    ("having", "SELECT grp, sum(x) AS s FROM t GROUP BY grp HAVING sum(x) > 25", [(None, 40.0), ("a", 40.0)]),
    ("join", "SELECT t.k, u.label FROM t JOIN u ON t.k = u.k", [(1, "one"), (3, "three")]),
    ("left_join", "SELECT t.k, u.label FROM t LEFT JOIN u ON t.k = u.k WHERE t.k <= 2", [(1, "one"), (2, None)]),
    ("union", "SELECT k FROM t WHERE k = 1 UNION SELECT k FROM u", [(1,), (3,)]),
    ("union_all", "SELECT k FROM t WHERE k = 1 UNION ALL SELECT k FROM u WHERE k = 1", [(1,), (1,)]),
    ("intersect", "SELECT k FROM t INTERSECT SELECT k FROM u", [(1,), (3,)]),
    ("subquery", "SELECT k FROM (SELECT k, x FROM t WHERE x > 15) s WHERE s.k < 4", [(2,), (3,)]),
    ("cte", "WITH big AS (SELECT * FROM t WHERE x >= 30) SELECT k FROM big", [(3,), (4,)]),
    ("in_subquery", "SELECT k FROM t WHERE k IN (SELECT k FROM u)", [(1,), (3,)]),
    # constructs the reference rejects — strict-superset evidence
    ("order_limit", "SELECT k FROM t ORDER BY x DESC LIMIT 2", [(3,), (4,)]),
    ("distinct", "SELECT DISTINCT grp FROM t WHERE grp IS NOT NULL", [("a",), ("b",)]),
    ("window_fn", "SELECT k, row_number() OVER (PARTITION BY grp ORDER BY x) AS rn FROM t WHERE grp = 'a'", [(1, 1), (3, 2)]),
    ("except", "SELECT k FROM t EXCEPT SELECT k FROM u", [(2,), (4,)]),
]


@pytest.mark.parametrize("name,q,expected", CASES, ids=[c[0] for c in CASES])
def test_sql_node(tabs, name, q, expected):
    t, u = tabs
    out = pw.sql(q, t=t, u=u)
    assert rows(out) == sorted(expected, key=repr)
