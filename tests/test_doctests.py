"""Docstring examples as golden tests — the reference's CI runs
``pytest --doctest-modules`` over the whole package (SURVEY §5); we run the
same check with a live SparkSession injected into the doctest globals.
"""

from __future__ import annotations

import doctest

import pytest

from pathwaydataframework_spark.internals import table as table_mod
from pathwaydataframework_spark.operators import (
    clustering,
    dedup,
    embedders,
    graphs,
    packing,
    parsers,
    ranking,
    rerankers,
    sampling,
    similarity,
    splitters,
    text,
)

MODULES = [
    table_mod,
    clustering,
    dedup,
    embedders,
    graphs,
    packing,
    parsers,
    ranking,
    rerankers,
    sampling,
    similarity,
    splitters,
    text,
]


@pytest.mark.parametrize("mod", MODULES, ids=[m.__name__.split(".")[-1] for m in MODULES])
def test_doctests(spark, mod):
    results = doctest.testmod(
        mod, extraglobs={"spark": spark}, verbose=False, optionflags=doctest.ELLIPSIS
    )
    assert results.failed == 0
    assert results.attempted > 0, f"{mod.__name__} has no doctest examples"
