"""PySpark-native analytics engine with the query and data-processing
capabilities of lnynhi02/web-scraping-etl-pipeline.

The reference is a row-at-a-time Python + Postgres ETL pipeline
(scrape -> staging -> clean -> transform -> jobs_table -> analytic SQL).
This package re-expresses every one of its operators (SURVEY.md section 2)
as declarative Spark DataFrame plans:

- ``functions``  : the reference's scalar vocabulary (clean_title,
  clean_salary, transform_salary, caculate_dates, remaining-time render,
  sentinel->NULL, cast+round) as native Column expressions - zero Python
  UDFs on the hot path, plus text-analysis / vector functions for
  large-scale training-data pipelines.
- ``sources``    : parquet star-schema loaders, watermark state table,
  batch ingestion, DDL.
- ``operators``  : incremental watermark filter, dedup family (exact,
  minhash-LSH, simhash, ngram-jaccard, embedding cosine), similarity
  top-k, top-k.
- ``plans``      : the query suite (reference script.sql queries recast
  on the star schema) and their DuckDB oracle twins.
- ``streaming``  : Structured Streaming flavor of the incremental
  pipeline (watermark + availableNow trigger).
- ``multimodal`` : binary-column plumbing (decode stubs, mapInPandas
  batch shape) for image/audio payloads.
"""

__version__ = "0.1.0"
