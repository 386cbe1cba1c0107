"""Hyper sink contract tests (reference app.py:98-131 parity).

tableauhyperapi is not installed in this container, so the sink is
gated. Two things are pinned anyway: (a) the gate raises the documented
NotImplementedError, and (b) with a faked tableauhyperapi module the
batching loop and the Spark→Hyper type map behave exactly like the
reference's Inserter pipeline (app.py:27-40, 128-131).
"""

from __future__ import annotations

import datetime
import sys
import types

import pytest

from parquet_to_hyper_app_spark.sources.convert import write_hyper


def test_hyper_sink_gate_message(spark):
    """Without the library, the gate must raise the documented error."""
    if "tableauhyperapi" in sys.modules:  # pragma: no cover
        pytest.skip("tableauhyperapi actually installed")
    df = spark.range(3)
    with pytest.raises(NotImplementedError, match="pip install tableauhyperapi"):
        write_hyper(df, "/tmp/never_written.hyper")


class _Recorder:
    def __init__(self):
        self.schemas: list[str] = []
        self.tables: list = []
        self.batches: list[list[list]] = []
        self.executed = False


def _fake_tableauhyperapi(rec: _Recorder) -> types.ModuleType:
    m = types.ModuleType("tableauhyperapi")

    class SqlType:
        @staticmethod
        def big_int():
            return "big_int"

        @staticmethod
        def double():
            return "double"

        @staticmethod
        def bool():
            return "bool"

        @staticmethod
        def date():
            return "date"

        @staticmethod
        def timestamp():
            return "timestamp"

        @staticmethod
        def text():
            return "text"

    class TableName:
        def __init__(self, *parts):
            self.parts = parts

    class _Column:
        def __init__(self, name, sqltype):
            self.name, self.sqltype = name, sqltype

    class TableDefinition:
        Column = _Column

        def __init__(self, table, cols):
            self.table, self.cols = table, cols

    class Telemetry:
        DO_NOT_SEND_USAGE_DATA_TO_TABLEAU = 0

    class CreateMode:
        CREATE_AND_REPLACE = 0

    class HyperProcess:
        def __init__(self, telemetry):
            self.endpoint = "fake-endpoint"

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _Catalog:
        def create_schema(self, name):
            rec.schemas.append(name)

        def create_table(self, tdef):
            rec.tables.append(tdef)

    class Connection:
        def __init__(self, endpoint, path, mode):
            self.catalog = _Catalog()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class Inserter:
        def __init__(self, conn, tdef):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def add_rows(self, rows):
            rec.batches.append([list(r) for r in rows])

        def execute(self):
            rec.executed = True

    for name, obj in [
        ("SqlType", SqlType),
        ("TableName", TableName),
        ("TableDefinition", TableDefinition),
        ("Telemetry", Telemetry),
        ("CreateMode", CreateMode),
        ("HyperProcess", HyperProcess),
        ("Connection", Connection),
        ("Inserter", Inserter),
    ]:
        setattr(m, name, obj)
    return m


def test_hyper_sink_batching_and_type_map(spark, monkeypatch):
    rec = _Recorder()
    monkeypatch.setitem(sys.modules, "tableauhyperapi", _fake_tableauhyperapi(rec))

    rows = [
        (i, float(i) / 2, f"name{i}", i % 2 == 0,
         datetime.datetime(2024, 1, 1, 0, 0, i), [1.0, 2.0])
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows,
        "id long, score double, name string, flag boolean, "
        "ts timestamp, vec array<double>",
    )
    written = write_hyper(df, "/tmp/fake.hyper", batch_rows=3)

    assert written == 8
    assert rec.executed
    assert rec.schemas == ["Extract"]
    # reference app.py streams fixed-size chunks; the last is a remainder
    assert [len(b) for b in rec.batches] == [3, 3, 2]
    # type map parity with app.py:27-40: numerics stay typed, unmapped
    # types (the array) degrade to text via an explicit string cast
    tdef = rec.tables[0]
    got = {c.name: c.sqltype for c in tdef.cols}
    assert got == {
        "id": "big_int",
        "score": "double",
        "name": "text",
        "flag": "bool",
        "ts": "timestamp",
        "vec": "text",
    }
    # the cast happened before insertion: array cells arrive as strings
    first_vec = rec.batches[0][0][5]
    assert isinstance(first_vec, str)


def test_jdbc_sink_roundtrip_embedded_derby(spark, tmp_path):
    """REAL database-table round trip for the reference's R9 'insert
    into a database file' step: write the cleaned lineitem slice to an
    embedded Derby database (the JDBC driver Spark itself bundles for
    its Hive metastore) and read it back — value-preserving end to end.
    This exercises write_jdbc's per-partition batched-insert path
    against an actual database, not a mock; Derby-embedded serves all
    local[n] executor threads from this one JVM, mirroring how the
    Hyper Inserter loop is a single-process sink in the reference."""
    from pyspark.sql import functions as F

    from parquet_to_hyper_app_spark.catalog import load_table
    from parquet_to_hyper_app_spark.operators.cleaning import (
        clean_numeric,
        normalize_schema,
    )
    from parquet_to_hyper_app_spark.sources.convert import write_jdbc
    from tests.conftest import SF_SMOKE

    url = f"jdbc:derby:{tmp_path}/convertdb;create=true"
    df = (
        normalize_schema(clean_numeric(load_table(spark, SF_SMOKE, "lineitem")))
        .filter(F.col("l_orderkey") <= 100)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
                "l_returnflag", "l_shipdate")
    )
    expected = sorted(map(tuple, df.collect()))
    assert expected, "smoke slice must be non-empty"
    write_jdbc(df, url, "converted_lineitem",
               driver="org.apache.derby.jdbc.EmbeddedDriver")
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "converted_lineitem")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
    )
    got = sorted(map(tuple, back.select(*df.columns).collect()))
    assert got == expected
