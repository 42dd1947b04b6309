"""Reference stdlib/ml/smart_table_ops (_fuzzy_join.py) — fuzzy joining.

The scoring core lives in operators/ranking.py (idf-weighted shared-token
scores, one shuffle keyed on tokens); this module binds the reference's
entry-point names onto it.
"""

from __future__ import annotations

import enum

from pyspark.sql import DataFrame

from pathwaydataframework_spark.operators.ranking import fuzzy_match_tables


class FuzzyJoinFeatureGeneration(enum.IntEnum):
    """Reference _fuzzy_join.py:43."""

    AUTO = 0
    SINGLE_WORDS = 1
    LETTERS = 2
    TRIGRAMS = 3


class FuzzyJoinNormalization(enum.IntEnum):
    """Reference _fuzzy_join.py:78."""

    NONE = 0
    WEIGHT = 1
    LOG_WEIGHT = 2


def fuzzy_match(left: DataFrame, right: DataFrame, **kwargs) -> DataFrame:
    """Reference _fuzzy_join.py:265 — same contract as fuzzy_match_tables."""
    return fuzzy_match_tables(left, right, **kwargs)


def fuzzy_self_match(table: DataFrame, *, id_col: str = "id", text_col: str = "text",
                     **kwargs) -> DataFrame:
    """Reference _fuzzy_join.py:249 — match a table against itself,
    excluding the trivial identity pairs."""
    return fuzzy_match_tables(
        table, table, left_id=id_col, left_text=text_col,
        right_id=id_col, right_text=text_col, exclude_same_id=True, **kwargs
    )


def smart_fuzzy_match(left: DataFrame, right: DataFrame, **kwargs) -> DataFrame:
    """Reference _fuzzy_join.py:199 — the auto-tuned entry point; the
    idf-weighted scorer already normalizes by token frequency, which is the
    'smart' weighting."""
    return fuzzy_match_tables(left, right, **kwargs)


def fuzzy_match_with_hint(left: DataFrame, right: DataFrame, by_hand_match: DataFrame,
                          **kwargs) -> DataFrame:
    """Reference _fuzzy_join.py:282 — hand-matched pairs override scores."""
    import pyspark.sql.functions as F

    auto = fuzzy_match_tables(left, right, **kwargs)
    hint = by_hand_match.select(
        F.col("left_id"), F.col("right_id"), F.lit(float("inf")).alias("score")
    )
    overridden = auto.join(hint.select("left_id"), on="left_id", how="left_anti")
    return overridden.unionByName(hint)
