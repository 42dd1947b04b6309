"""SQL entry point — reference ``pw.sql`` (internals/sql.py:613, 726 LoC).

The reference parses with sqlglot and lowers onto its own Table ops,
supporting a restricted node list (no ORDER BY / LIMIT / DISTINCT / window
functions — SURVEY.md §2.11).  On Spark the entire surface is native: we
register the argument tables as temp views and hand the text to Catalyst,
which makes our ``sql()`` a strict superset of the reference's.
"""

from __future__ import annotations

import itertools

from pyspark.sql import SparkSession

from pathwaydataframework_spark.internals.table import Table

_view_counter = itertools.count()


def sql(query: str, **tables: Table) -> Table:
    """Run SQL over the given tables: ``sql("SELECT ... FROM t ...", t=tab)``."""
    if not tables:
        raise ValueError("pass the referenced tables as keyword arguments")
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("no active SparkSession")
    for name, t in tables.items():
        t.df.createOrReplaceTempView(name)
    return Table(spark.sql(query))
