"""S2/S9 JDBC flavor: real roundtrip against embedded Derby (bundled in
pyspark/jars), including partitioned parallel read and predicate
pushdown semantics."""

import pytest

from pyspark.sql import functions as F

from web_scraping_etl_pipeline_spark.sources.jdbc import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
URL = "jdbc:derby:memory:wsep_test;create=true"


@pytest.fixture(scope="module")
def jobs_jdbc(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("job_id"),
        F.concat(F.lit("job-"), F.col("id")).alias("job_name"),
        (F.col("id") % 37 + 1.0).alias("salary"),
    )
    write_jdbc(
        df, URL, "jobs_jdbc", mode="overwrite", driver=DRIVER,
        createTableColumnTypes="job_id BIGINT, job_name VARCHAR(64), salary DOUBLE",
    )
    return df


def test_jdbc_roundtrip(spark, jobs_jdbc):
    back = read_jdbc(spark, URL, "jobs_jdbc", driver=DRIVER)
    assert back.count() == 1000
    assert set(back.columns) == {"JOB_ID", "JOB_NAME", "SALARY"} or set(
        back.columns
    ) == {"job_id", "job_name", "salary"}
    total = back.agg(F.sum(back.columns[0])).first()[0]
    assert total == sum(range(1000))


def test_jdbc_partitioned_read(spark, jobs_jdbc):
    back = read_jdbc(
        spark, URL, "jobs_jdbc", driver=DRIVER,
        partition_column="job_id", lower_bound=0, upper_bound=1000,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000


def test_jdbc_append_and_filter(spark, jobs_jdbc):
    extra = spark.range(1000, 1010).select(
        F.col("id").alias("job_id"),
        F.lit("appended").alias("job_name"),
        F.lit(9.5).alias("salary"),
    )
    write_jdbc(extra, URL, "jobs_jdbc", mode="append", driver=DRIVER)
    back = read_jdbc(spark, URL, "jobs_jdbc", driver=DRIVER)
    id_col = back.columns[0]
    assert back.count() == 1010
    # filter travels to the remote scan (pushDownPredicate default-on)
    assert back.filter(F.col(id_col) >= 1000).count() == 10
