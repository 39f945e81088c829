"""S8 - create_tables bootstrap: idempotency and schema fidelity
(reference DDL semantics, /root/reference/src/create_table.py:50-79)."""

from web_scraping_etl_pipeline_spark.schemas import JOBS, JOBS_RAW
from web_scraping_etl_pipeline_spark.sources.ddl import create_tables


def test_create_tables_idempotent(spark, tmp_path):
    loc = str(tmp_path / "warehouse")
    create_tables(spark, "t_bronze", "t_silver", location=loc)
    create_tables(spark, "t_bronze", "t_silver", location=loc)  # IF NOT EXISTS

    bronze = spark.table("t_bronze")
    silver = spark.table("t_silver")
    # bronze = raw schema + the ingest_date partition column
    assert [f.name for f in bronze.schema.fields] == [
        f.name for f in JOBS_RAW.fields
    ] + ["ingest_date"]
    assert [(f.name, f.dataType) for f in silver.schema.fields] == [
        (f.name, f.dataType) for f in JOBS.fields
    ]

    # tables are writable/readable through the catalog
    spark.sql(
        "INSERT INTO t_silver VALUES "
        "('Dev', 'https://x/9', 12.5, 'Acme', TIMESTAMP '2025-06-20 05:00:00',"
        " 'Hà Nội', 'Còn 2 ngày để ứng tuyển', TIMESTAMP '2025-06-22 05:00:00')"
    )
    assert spark.table("t_silver").count() == 1
    # re-running DDL after data exists must not truncate
    create_tables(spark, "t_bronze", "t_silver", location=loc)
    assert spark.table("t_silver").count() == 1

    spark.sql("DROP TABLE t_bronze")
    spark.sql("DROP TABLE t_silver")
