import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pypiper_spark.catalog import TABLES  # noqa: E402
from pypiper_spark.session import get_spark  # noqa: E402

# sf0.001 keeps the suite fast; set PYPIPER_TEST_SF=/root/testdata/sf0.01
# before a driver round to rehearse at the driver's correctness scale.
SF_DIR = os.environ.get("PYPIPER_TEST_SF", "/root/testdata/sf0.001")

# Threshold-calibration tests (Gopher rules, shard balance, langid
# confusion) need the driver's sf0.01 corpus specifically — thresholds
# that discriminate at sf0.01 may trivially pass/fail at sf0.001.
# Derived from SF_DIR's parent so a relocated corpus needs only one
# env var (ADVICE r6: no literal /root/testdata paths in tests).
SF01_DIR = os.environ.get(
    "PYPIPER_TEST_SF01",
    os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01"),
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="pypiper-spark-tests",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the same views the driver pre-registers."""
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
