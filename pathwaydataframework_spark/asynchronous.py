"""Deprecated forwarder kept for reference API parity — the reference's
``pathway.asynchronous`` module (reference python/pathway/asynchronous.py)
is itself a deprecated alias of ``pathway.udfs``; ours forwards to
``pathwaydataframework_spark.internals.udfs`` the same way."""

from __future__ import annotations

from warnings import warn

from pathwaydataframework_spark.internals import udfs as _udfs


def __getattr__(name):
    warn(
        "the asynchronous module is deprecated; use the udfs module "
        "(matching the reference's deprecation of pathway.asynchronous)",
        DeprecationWarning,
        stacklevel=2,
    )
    return getattr(_udfs, name)
