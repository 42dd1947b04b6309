"""Reference stdlib/utils/bucketing.py — datetime truncation helpers
(driver-side scalars there; the column-side analogue is ``F.date_trunc``)."""

from __future__ import annotations

import datetime


def truncate_to_minutes(time: datetime.datetime) -> datetime.datetime:
    return time - datetime.timedelta(
        seconds=time.second, microseconds=time.microsecond
    )
