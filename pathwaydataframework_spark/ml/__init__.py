"""Reference ``pathway.stdlib.ml`` package parity (reference
stdlib/ml/__init__.py): classifiers / datasets / hmm / smart_table_ops /
utils submodules, plus the index API re-exported from operators.ml_index
(reference stdlib/ml/index.py)."""

from __future__ import annotations

from pathwaydataframework_spark.operators.ml_index import (  # noqa: F401
    BM25Index,
    BruteForceKnnFactory,
    DataIndex,
    HybridIndex,
    KNNIndex,
    LshKnnFactory,
    UsearchKnnFactory,
)

from . import classifiers, datasets, hmm, quality, smart_table_ops, utils  # noqa: F401,E402

__all__ = ["classifiers", "datasets", "hmm", "quality", "smart_table_ops", "utils"]
