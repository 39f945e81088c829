"""C4/C5 - Vietnamese relative-time parsing and date arithmetic.

Reference semantics (/root/reference/src/utils.py:43-71,
``caculate_dates`` [sic]): parse ``'Cập nhật 3 giờ trước'`` /
``'Còn 24 ngày để ứng tuyển'`` style text through the unit map
{ngày: 86400, giờ: 3600, phút: 60, giây: 1} with pattern
``(\\d+)\\s*<unit>``, trying units in that order and taking the first
hit; then ``posted_date = base_time - seconds`` and
``due_date = base_time + seconds``, anchored to Asia/Ho_Chi_Minh.

The injectable ``base_time`` (utils.py:45-46) is preserved as an
explicit parameter - the deterministic-testing hook; production callers
pass a batch timestamp captured once at ingest, never
``current_timestamp()`` per row.

Arithmetic is done in epoch microseconds (bigint) so results are
timezone-free and oracle-comparable; :func:`localize` renders an instant
in the reference's display timezone when needed (C5).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, functions as F

#: the reference's display timezone (docker-compose.yaml:10, utils.py:44).
LOCAL_TZ = "Asia/Ho_Chi_Minh"

#: unit map, reference order (utils.py:48-53) - order matters: the first
#: matching unit wins, so 'ngày' outranks 'giờ' in mixed text.
UNIT_SECONDS = (("ngày", 86_400), ("giờ", 3_600), ("phút", 60), ("giây", 1))


def parse_relative_seconds(text: Column) -> Column:
    """First ``(\\d+)\\s*<unit>`` hit -> seconds (bigint); NULL if none."""
    candidates = [
        F.nullif(F.regexp_extract(text, rf"(\d+)\s*{unit}", 1), F.lit("")).cast(
            "long"
        )
        * F.lit(seconds)
        for unit, seconds in UNIT_SECONDS
    ]
    return F.coalesce(*candidates)


def _to_us(base_time: dt.datetime | int) -> Column:
    if isinstance(base_time, dt.datetime):
        if base_time.tzinfo is not None:
            base_time = base_time.astimezone(dt.timezone.utc).replace(tzinfo=None)
        epoch = dt.datetime(1970, 1, 1)
        return F.lit(int((base_time - epoch).total_seconds() * 1_000_000))
    return F.lit(int(base_time))


def posted_date(update_text: Column, base_time: dt.datetime | int) -> Column:
    """``base_time - parsed(update_text)`` as epoch micros (bigint)."""
    return _to_us(base_time) - parse_relative_seconds(update_text) * F.lit(
        1_000_000
    )


def due_date(deadline_text: Column, base_time: dt.datetime | int) -> Column:
    """``base_time + parsed(deadline_text)`` as epoch micros (bigint)."""
    return _to_us(base_time) + parse_relative_seconds(deadline_text) * F.lit(
        1_000_000
    )


def localize(instant: Column, tz: str = LOCAL_TZ) -> Column:
    """C5: render a UTC instant as the reference's local wall clock."""
    return F.from_utc_timestamp(instant, tz)
