"""S4/S5 - incremental high-watermark state.

Reference: ``tmp/last_processed_time.json`` read at
/root/reference/src/topcv_pipeline.py:20-26 (any error -> None -> full
load) and advanced to the batch max at :28-33,195-199. Two fixes over
the reference, per SURVEY.md section 8:

- B4: the reference commits the watermark *before* the sink runs
  (topcv_pipeline.py:199 vs topcv_flow.py:58-63), losing the batch on a
  mid-flight failure. Here :func:`advance_watermark` is only called by
  the pipeline *after* the silver write succeeds.
- The watermark is stored as a single-row JSON document
  (``{"last_processed": "<iso>"}``, same wire format as the reference)
  so it is human-inspectable and atomic to replace.

State is tiny driver-side metadata - plain file I/O, not a Spark job.
"""

from __future__ import annotations

import datetime as dt
import json
import os


def read_last_processed_time(state_path: str) -> dt.datetime | None:
    """None on missing/corrupt state = "first run -> full load"
    (reference error->None fallback, topcv_pipeline.py:24-26)."""
    try:
        with open(state_path, "r") as fh:
            return dt.datetime.fromisoformat(json.load(fh)["last_processed"])
    except Exception:
        return None


def write_last_processed_time(state_path: str, ts: dt.datetime) -> None:
    os.makedirs(os.path.dirname(state_path) or ".", exist_ok=True)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"last_processed": ts.isoformat()}, fh)
    os.replace(tmp, state_path)  # atomic on POSIX


def advance_watermark(
    state_path: str, batch_max: dt.datetime | None
) -> dt.datetime | None:
    """Advance monotonically; empty batch (None) leaves state untouched
    (F6: the reference's skip path never rewrites the file either)."""
    if batch_max is None:
        return read_last_processed_time(state_path)
    current = read_last_processed_time(state_path)
    if current is None or batch_max > current:
        write_last_processed_time(state_path, batch_max)
        return batch_max
    return current
