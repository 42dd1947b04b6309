"""Parser class family — reference ``xpacks/llm/parsers.py`` (ParseUtf8
:53, ParseUnstructured :79, OpenParse :235, ImageParser :396, SlideParser
:569, PypdfParser :746).

Contract (reference): a parser is a callable over a binary ``contents``
column yielding ``list[(text, metadata)]`` chunks.  :class:`ParseUtf8` is
fully real (UTF-8 decode as a column expression path).  The library-backed
parsers (unstructured / openparse / pypdf) and the vision-LLM parsers take
an injectable ``parse_fn`` — the provider libraries are not in this
container; on a cluster the same wrapper calls them per Arrow batch
(the engine-wide injectable-client pattern).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column


def _as_udf(parse_fn: Callable) -> Callable[[Column], Column]:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _parse(contents):
        return pd.Series(
            [
                [
                    {"text": t, "metadata": {k: str(v) for k, v in (m or {}).items()}}
                    for t, m in parse_fn(bytes(c))
                ]
                for c in contents
            ]
        )

    _parse.__annotations__ = {"contents": pd.Series, "return": pd.Series}
    return pandas_udf(
        _parse, "array<struct<text:string, metadata:map<string,string>>>"
    )


class ParseUtf8:
    """Reference parsers.py:53 — decode the whole document as one UTF-8
    chunk with empty metadata."""

    def __call__(self, contents: Column, **kwargs: Any) -> Column:
        import pyspark.sql.functions as F

        return F.array(
            F.struct(
                F.decode(contents, "utf-8").alias("text"),
                F.map_from_arrays(
                    F.array().cast("array<string>"),
                    F.array().cast("array<string>"),
                ).alias("metadata"),
            )
        )


class _InjectableParser:
    """Common base: constructor kwargs stored for parity; ``parse_fn``
    drives the actual parsing per Arrow batch."""

    def __init__(self, *args: Any, parse_fn: Callable | None = None, **kwargs: Any):
        self._parse_fn = parse_fn
        self._kwargs = kwargs

    def __call__(self, contents: Column, **kwargs: Any) -> Column:
        if self._parse_fn is None:
            raise NotImplementedError(
                f"{type(self).__name__} needs its parsing library/service — "
                "inject parse_fn=callable(bytes) -> list[(text, metadata)] "
                "(the library is not baked into this container)"
            )
        return _as_udf(self._parse_fn)(contents)


class ParseUnstructured(_InjectableParser):
    """Reference parsers.py:79 — unstructured.io parsing (injectable)."""


class OpenParse(_InjectableParser):
    """Reference parsers.py:235 — table/layout-aware PDF parsing
    (injectable)."""


class ImageParser(_InjectableParser):
    """Reference parsers.py:396 — vision-LLM image description
    (injectable)."""


class SlideParser(_InjectableParser):
    """Reference parsers.py:569 — PPTX/PDF slide parsing (injectable)."""


class PypdfParser(_InjectableParser):
    """Reference parsers.py:746 — pypdf text extraction (injectable)."""
