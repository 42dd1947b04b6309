"""Reference stdlib/utils/async_transformer.py — module alias; the class
lives in operators/stateful.py (batched asyncio over mapInPandas)."""

from __future__ import annotations

from pathwaydataframework_spark.operators.stateful import AsyncTransformer  # noqa: F401
