"""Structured Streaming flavor of the engine.

The reference's "streaming" is a daily Airflow micro-batch with a
zero-lateness high-watermark drop
(/root/reference/airflow/dags/topcv_flow.py:24-25,
/root/reference/src/topcv_pipeline.py:122-124,195-199). This package is
the contract SURVEY.md section 2.7 maps it to:

- :mod:`.jobs_stream` - the jobs pipeline as ``readStream`` +
  ``withWatermark("posted_date", "0 seconds")`` +
  ``trigger(availableNow=True)`` with a checkpointed append to silver.
- :mod:`.events_stream` - oracle-checked streaming queries over the
  ``events`` table (stateless pass-through and watermark-finalized
  tumbling windows).
"""

from .jobs_stream import run_stream  # noqa: F401
