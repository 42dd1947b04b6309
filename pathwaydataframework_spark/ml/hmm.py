"""HMM decoding — reference stdlib/ml/hmm.py:11 (create_hmm_reducer).

The reference folds observations through a Viterbi beam-search accumulator
driven by a networkx DiGraph (node attr ``calc_emission_log_ppb``, edge
attr ``log_transition_ppb``, graph attr ``start_nodes``).  Here the graph
is a plain ``HmmGraph`` with the same semantics (a networkx DiGraph also
works — duck-typed), and decoding runs per key as a time-sorted
``applyInPandas`` fold: sequence decoding is inherently order-dependent
Python, the one place mapInPandas is the right tool (COVERAGE.md UDF
policy).
"""

from __future__ import annotations

import math
from typing import Any, Callable

from pyspark.sql import DataFrame


class HmmGraph:
    """Minimal state graph: states with emission log-prob callables, edges
    with transition log-probs, explicit start states."""

    def __init__(self):
        self.emission: dict[Any, Callable[[Any], float]] = {}
        self.transitions: dict[Any, list[tuple[Any, float]]] = {}
        self.start_nodes: list[Any] = []

    def add_state(self, name, emission_logp: Callable[[Any], float], *, start: bool = False):
        self.emission[name] = emission_logp
        self.transitions.setdefault(name, [])
        if start:
            self.start_nodes.append(name)
        return self

    def add_transition(self, u, v, log_ppb: float):
        self.transitions.setdefault(u, []).append((v, log_ppb))
        return self


def _as_hmm_graph(graph) -> HmmGraph:
    """Accept an HmmGraph or a networkx DiGraph in the reference's layout."""
    if isinstance(graph, HmmGraph):
        return graph
    g = HmmGraph()
    for node, attrs in graph.nodes(data=True):
        g.add_state(node, attrs["calc_emission_log_ppb"],
                    start=node in graph.graph.get("start_nodes", []))
    for u, v, attrs in graph.edges(data=True):
        g.add_transition(u, v, attrs["log_transition_ppb"])
    return g


def _viterbi(graph: HmmGraph, observations: list, beam_size: int | None = None) -> list:
    """Most likely state sequence for one observation list."""
    if not observations:
        return []
    scores: dict[Any, tuple[float, tuple]] = {}
    for s in graph.start_nodes or graph.emission:
        scores[s] = (graph.emission[s](observations[0]), (s,))
    for obs in observations[1:]:
        nxt: dict[Any, tuple[float, tuple]] = {}
        for state, (logp, path) in scores.items():
            for succ, tp in graph.transitions.get(state, []):
                cand = logp + tp + graph.emission[succ](obs)
                if succ not in nxt or cand > nxt[succ][0]:
                    nxt[succ] = (cand, path + (succ,))
        if not nxt:  # dead end (absorbing state): restart from emissions,
            # EXTENDING the best prior path so the state sequence keeps one
            # entry per observation (a reset-to-length-1 path would make
            # the decode shorter than the input and crash the reassembly)
            best_prev = max(scores.values(), key=lambda v: v[0])[1]
            nxt = {
                s: (graph.emission[s](obs), best_prev + (s,))
                for s in graph.emission
            }
        if beam_size is not None and len(nxt) > beam_size:
            nxt = dict(sorted(nxt.items(), key=lambda kv: -kv[1][0])[:beam_size])
        scores = nxt
    best = max(scores.values(), key=lambda v: v[0])
    return list(best[1])


def viterbi_decode(
    df: DataFrame,
    graph,
    *,
    group_col: str,
    time_col: str,
    obs_col: str,
    beam_size: int | None = None,
) -> DataFrame:
    """Per-key HMM decode: (group, time, observation, state) — rows sorted
    by ``time_col`` inside each group before folding, so arrival order in
    the shuffle does not matter."""
    g = _as_hmm_graph(graph)
    dtypes = dict(df.dtypes)
    schema = (
        f"{group_col} {dtypes[group_col]}, {time_col} {dtypes[time_col]}, "
        f"{obs_col} {dtypes[obs_col]}, state string"
    )

    def _apply(pdf):
        import pandas as pd

        pdf = pdf.sort_values(time_col)
        states = _viterbi(g, list(pdf[obs_col]), beam_size)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].values,
                time_col: pdf[time_col].values,
                obs_col: pdf[obs_col].values,
                "state": [str(s) for s in states],
            }
        )

    return df.groupBy(group_col).applyInPandas(_apply, schema)


def create_hmm_reducer(graph, beam_size: int | None = None,
                       num_results_kept: int | None = None):
    """Reference hmm.py:11 — returns a fold function compatible with
    ``custom_reducers.stateful_many`` (state = observation list folded in
    arrival order; result = decoded state path).  Pair with a time-sorted
    input, or use ``viterbi_decode`` which sorts per group itself."""
    g = _as_hmm_graph(graph)

    def combine(state, rows):
        if state is not None:
            # the fold's result is the decoded label, which cannot be
            # re-folded as observations (it would explode into characters)
            raise ValueError(
                "create_hmm_reducer supports single-shot batch folding "
                "only; for incremental / per-chunk decoding use "
                "viterbi_decode, which re-decodes the sorted sequence"
            )
        obs = []
        obs.extend(r[0] for r in rows)
        path = _viterbi(g, obs, beam_size)
        if num_results_kept is not None:
            path = path[-num_results_kept:]
        return str(path[-1]) if path else None

    return combine
