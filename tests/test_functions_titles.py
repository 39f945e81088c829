"""C1 clean_title golden tests.

Expected values produced by executing the reference implementation
(/root/reference/src/utils.py:8-16) on each input - exact behavioral
parity, including the surprising cases ('C++ Engineer ...' -> 'C').
"""

from pyspark.sql import functions as F

from web_scraping_etl_pipeline_spark.functions import clean_title

GOLDEN = [
    ("Senior Python Developer - Up to $2,000", "Senior Python Developer"),
    ("Data Engineer (ETL/Spark) - Hà Nội", "Data Engineer"),
    ("Kỹ Sư Phần Mềm Java", "Kỹ Sư Phần Mềm Java"),
    ("C++ Engineer - HCM - Thỏa Thuận", "C"),
    ("!!!@@@", "!!!@@@"),
    ("  Backend Dev / DevOps - 20 triệu  ", "Backend Dev / DevOps"),
    ("Chuyên Viên Kiểm Thử (Tester)", "Chuyên Viên Kiểm Thử"),
]


def test_clean_title_golden(spark):
    df = spark.createDataFrame([(t,) for t, _ in GOLDEN], ["title"])
    got = [r[0] for r in df.select(clean_title(F.col("title"))).collect()]
    assert got == [want for _, want in GOLDEN]
