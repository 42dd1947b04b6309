"""Universe promises — reference ``pw.universes``
(internals/universes.py:13,49,83).

The reference tracks key-set (universe) relations at graph-build time so
same-universe tables can be zipped without a join.  Catalyst resolves
column references relationally and reuses exchanges, so these promises
carry no information it needs — they are accepted (and validated where
cheap) for API compatibility and as documentation of intent
(SURVEY §4: "universe solver → not needed").
"""

from __future__ import annotations


def promise_is_subset_of(table, *others) -> None:
    """Declare table's key set ⊆ each other's (reference universes.py:49)."""
    return None


def promise_are_pairwise_disjoint(*tables) -> None:
    """Declare pairwise-disjoint key sets (reference universes.py:13)."""
    return None


def promise_are_equal(*tables) -> None:
    """Declare equal key sets (reference universes.py:83)."""
    return None
