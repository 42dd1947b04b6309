"""Reference ``pathway.xpacks`` namespace — the LLM xpack's operator-shaped
pieces live in the engine here (operators/splitters, embedders, parsers,
rerankers, ml_index); this package binds the reference's import paths onto
them so `from pathway.xpacks.llm import splitters`-style code ports by
renaming only the root package.  Service-layer pieces (servers, LLM chat
wrappers, document stores) stay out of engine scope — see COVERAGE.md."""

from . import llm  # noqa: F401

__all__ = ["llm"]
