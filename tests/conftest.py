"""Shared fixtures: one SparkSession per test run, DuckDB connection
with the fixture tables pre-registered (mirroring the driver)."""

from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# transformWithStateInPandas needs google.protobuf in driver AND
# workers; when absent, activate the vendored-SDK shim (see
# tools/pb_shim/google/__init__.py) BEFORE the session fixture starts
# so worker processes inherit it via PYTHONPATH.
try:
    import google.protobuf  # noqa: F401
except ModuleNotFoundError:
    _PB_SHIM = os.path.join(REPO_ROOT, "tools", "pb_shim")
    if os.path.isdir(
        "/usr/lib/google-cloud-sdk/lib/third_party/cloudsdk/google/protobuf"
    ):
        sys.path.insert(0, _PB_SHIM)
        os.environ["PYTHONPATH"] = (
            _PB_SHIM + os.pathsep + os.environ.get("PYTHONPATH", "")
        )

SMOKE_SF = "/root/testdata/sf0.001"
CORRECTNESS_SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from pwir_zadanie_4_mapreduce_spark.session import build_session

    warehouse = tempfile.mkdtemp(prefix="pwir_warehouse_")
    spark = build_session(
        cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")),
        extra_conf={"spark.sql.warehouse.dir": warehouse},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SMOKE_SF}/{name}.parquet'"
        )
    yield con
    con.close()
