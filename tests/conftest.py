from __future__ import annotations

import duckdb
import pytest

from my_mapreduce_spark.io import TABLES
from my_mapreduce_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", master="local[4]",
                      extra_confs={"spark.sql.shuffle.partitions": "8"})
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()
