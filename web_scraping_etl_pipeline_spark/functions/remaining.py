"""C8 - remaining-application-time bucketing + localized string render.

The reference implements this as a stored procedure running one UPDATE
per row in a cursor loop (/root/reference/script.sql:13-49; the shipped
text does not compile - SURVEY.md section 8 B6 - so the documented intent at
README.md:246-283 is the spec):

    diff = due_date - now
    diff <= 0          -> 'Đã hết thời gian ứng tuyển'
    diff <  1 minute   -> 'Còn <seconds> giây để ứng tuyển'
    diff <  1 hour     -> 'Còn <minutes> phút để ứng tuyển'
    diff <  1 day      -> 'Còn <hours> giờ để ứng tuyển'
    else               -> 'Còn <days> ngày để ứng tuyển'

Within each bucket Postgres's EXTRACT(unit FROM interval) equals floor
division of the total seconds, so the whole O(N)-UPDATE loop collapses
to one vectorized when/otherwise expression over epoch-micros columns.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EXPIRED_TEXT = "Đã hết thời gian ứng tuyển"


def _render(quantity: Column, unit: str) -> Column:
    return F.concat(
        F.lit("Còn "), quantity.cast("string"), F.lit(f" {unit} để ứng tuyển")
    )


def render_remaining_time(due_us: Column, now_us: Column) -> Column:
    """Vectorized C8: both args epoch microseconds (bigint)."""
    diff_s = F.floor((due_us - now_us) / F.lit(1_000_000)).cast("long")
    return (
        F.when(diff_s <= 0, F.lit(EXPIRED_TEXT))
        .when(diff_s < 60, _render(diff_s, "giây"))
        .when(diff_s < 3_600, _render(F.floor(diff_s / 60).cast("long"), "phút"))
        .when(
            diff_s < 86_400, _render(F.floor(diff_s / 3_600).cast("long"), "giờ")
        )
        .otherwise(_render(F.floor(diff_s / 86_400).cast("long"), "ngày"))
    )
