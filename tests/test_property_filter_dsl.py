"""Differential test for the DocumentStore metadata-filter DSL.

Generates random filter ASTs (seeded, deterministic), renders each to the
JMESPath-subset grammar, translates with ``translate_metadata_filter`` and
evaluates ALL of them in ONE Spark select over a batch of metadata rows —
then compares against an independent Python evaluator implementing SQL's
three-valued logic (missing field → NULL, NULL-infected comparisons, Kleene
and/or/not).  Catches translator bugs the hand-picked matrix can't."""

from __future__ import annotations

import json
import random
import re

import pyspark.sql.functions as F

from pathwaydataframework_spark.xpacks.llm.document_store import (
    _glob_to_regex,
    translate_metadata_filter,
)

FIELDS = ["owner", "size", "path", "lang", "missing_always"]
STRINGS = ["alice", "bob", "x.txt", "en"]
INTS = [0, 3, 5, 100]
GLOBS = ["/a/*.txt", "/**/*.md", "/a/?.txt", "/corpus/**", "*.txt"]

ROWS = [
    {"owner": "alice", "size": 5, "path": "/a/x.txt", "lang": "en"},
    {"owner": "bob", "size": 100, "path": "/corpus/b/y.md"},
    {"owner": "carol", "path": "/a/z.txt", "lang": "de", "size": 0},
    {"size": 3, "path": "/corpus/deep/nest/q.txt"},
    {"owner": "alice"},  # no path/size
]


# -- AST: (kind, ...); render → DSL string; pyeval → True/False/None ---------


def gen(rng: random.Random, depth: int = 0):
    choices = ["cmp", "contains", "glob"]
    if depth < 3:
        choices += ["and", "or", "not", "paren"]
    kind = rng.choice(choices)
    if kind == "cmp":
        field = rng.choice(FIELDS)
        op = rng.choice(["==", "!=", "<", "<=", ">", ">="])
        lit = rng.choice(STRINGS) if rng.random() < 0.5 else rng.choice(INTS)
        return ("cmp", field, op, lit)
    if kind == "contains":
        return ("contains", rng.choice(FIELDS), rng.choice(STRINGS))
    if kind == "glob":
        return ("glob", rng.choice(GLOBS), rng.choice(["path", "owner"]))
    if kind == "not":
        return ("not", gen(rng, depth + 1))
    if kind == "paren":
        return ("paren", gen(rng, depth + 1))
    return (kind, gen(rng, depth + 1), gen(rng, depth + 1))


def render(ast) -> str:
    kind = ast[0]
    if kind == "cmp":
        _, field, op, lit = ast
        return f"{field} {op} `{lit}`"
    if kind == "contains":
        return f"contains({ast[1]}, '{ast[2]}')"
    if kind == "glob":
        return f"globmatch('{ast[1]}', {ast[2]})"
    if kind == "not":
        # parenthesize: `!` binds only the next unary in the grammar
        return f"!({render(ast[1])})"
    if kind == "paren":
        return f"({render(ast[1])})"
    joiner = " && " if kind == "and" else " || "
    # grammar precedence: parenthesize children to keep render unambiguous
    return f"({render(ast[1])}){joiner}({render(ast[2])})"


def pyeval(ast, row: dict):
    """Three-valued evaluation mirroring get_json_object + SQL nulls."""
    kind = ast[0]
    if kind == "cmp":
        _, field, op, lit = ast
        raw = row.get(field)
        val = None if raw is None else str(raw)
        if isinstance(lit, int):  # numeric literal → cast double
            try:
                val = None if val is None else float(val)
            except ValueError:
                val = None
            lit = float(lit)
        if val is None:
            return None
        return {
            "==": val == lit, "!=": val != lit, "<": val < lit,
            "<=": val <= lit, ">": val > lit, ">=": val >= lit,
        }[op]
    if kind == "contains":
        raw = row.get(ast[1])
        return None if raw is None else ast[2] in str(raw)
    if kind == "glob":
        raw = row.get(ast[2])
        if raw is None:
            return None
        return re.compile(_glob_to_regex(ast[1])).match(str(raw)) is not None
    if kind == "not":
        inner = pyeval(ast[1], row)
        return None if inner is None else not inner
    if kind == "paren":
        return pyeval(ast[1], row)
    a, b = pyeval(ast[1], row), pyeval(ast[2], row)
    if kind == "and":  # Kleene
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


def test_random_filters_match_three_valued_python_eval(spark):
    rng = random.Random(20260814)
    asts = [gen(rng) for _ in range(60)]
    d = spark.createDataFrame([(json.dumps(r),) for r in ROWS], "m string")
    cols = [
        translate_metadata_filter(render(ast), F.col("m")).alias(f"f{i}")
        for i, ast in enumerate(asts)
    ]
    got = d.select(*cols).collect()  # one job for all filters × rows
    for ri, row in enumerate(ROWS):
        for i, ast in enumerate(asts):
            expected = pyeval(ast, row)
            actual = got[ri][f"f{i}"]
            assert actual == expected or (actual is None and expected is None), (
                f"filter {render(ast)!r} on row {row}: "
                f"spark={actual} python={expected}"
            )
