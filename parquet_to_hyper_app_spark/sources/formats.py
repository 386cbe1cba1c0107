"""File-format source/sink coverage beyond parquet: ORC, JSON, CSV.

Each query is a write→read round-trip whose oracle is simply the
original table — a strong end-to-end check that the writer+reader pair
is value-preserving for every column type involved (timestamps through
ISO strings for JSON/CSV, binary-columnar for ORC).

Delta/Iceberg/Hudi connectors need jars absent from this container;
`read_delta` documents the gap and raises cleanly (import-try gate).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.registry import query


def _roundtrip(df: DataFrame, fmt: str, name: str, **read_opts) -> DataFrame:
    path = os.path.join(tempfile.gettempdir(), "p2h_spark_fmt", fmt, name)
    df.write.format(fmt).mode("overwrite").options(**read_opts).save(path)
    return (
        df.sparkSession.read.format(fmt)
        .schema(df.schema)  # explicit schema: no inference drift
        .options(**read_opts)
        .load(path)
    )


@query("source_orc_roundtrip", oracle="SELECT * FROM orders")
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+source round-trip of `orders` (columnar binary format —
    exact for doubles and NTZ timestamps)."""
    return _roundtrip(load_table(spark, sf_dir, "orders"), "orc", "orders")


@query("source_json_roundtrip", oracle="SELECT * FROM events")
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink+source round-trip of `events`: µs timestamps via
    ISO strings (the default format truncates to milliseconds — pass an
    explicit µs pattern), doubles via shortest-round-trip repr."""
    return _roundtrip(
        load_table(spark, sf_dir, "events"),
        "json",
        "events",
        timestampNTZFormat="yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    )


@query("source_csv_roundtrip", oracle="SELECT * FROM supplier")
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+source round-trip of `supplier` (header + explicit
    schema on read; doubles survive via shortest-repr serialization)."""
    return _roundtrip(load_table(spark, sf_dir, "supplier"), "csv", "supplier", header="true")


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake source — gated: the delta-spark jars are not in this
    container. On a cluster with the package installed this is just
    spark.read.format('delta').load(path)."""
    try:
        import delta  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "delta-spark is not installed in this environment; "
            "install the delta-spark package + jars to enable"
        ) from e
    return spark.read.format("delta").load(path)  # pragma: no cover


@query(
    "source_merge_schema",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey,
           CAST(NULL AS VARCHAR) AS batch_tag
    FROM nation WHERE n_regionkey < 2
    UNION ALL
    SELECT n_nationkey, n_name, n_regionkey, 'v2' AS batch_tag
    FROM nation WHERE n_regionkey >= 2
    """,
)
def source_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet batches: a later batch adds a
    column (`batch_tag`); `mergeSchema=true` unions the file schemas so
    old files surface NULL for the new column. This is the standard
    append-only training-data layout where extraction versions add
    metadata columns over time. The merged read stays one distributed
    scan — schema reconciliation happens at planning, per file footer,
    not by rewriting old batches.
    """
    from pyspark.sql import functions as F

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    base = os.path.join(tempfile.gettempdir(), "p2h_spark_fmt", "merge_schema")
    v1 = nation.filter(F.col("n_regionkey") < 2)
    v2 = nation.filter(F.col("n_regionkey") >= 2).withColumn("batch_tag", F.lit("v2"))
    v1.write.mode("overwrite").parquet(os.path.join(base, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(base, "batch=2"))
    return (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(base)
        .select("n_nationkey", "n_name", "n_regionkey", "batch_tag")
    )


#: deterministic malformed-CSV fixture: 4 parseable rows, 2 corrupt
#: (non-numeric id; too few columns). PERMISSIVE mode must surface
#: the good rows typed and the bad rows captured, never throw.
_CORRUPT_CSV = """\
1,3.5,alpha
2,not_a_number,beta
3,7.25,gamma
oops,1.0
4,,delta
5,9.0,epsilon
"""


@query(
    "source_csv_permissive",
    oracle="""
    SELECT * FROM (VALUES
        (1, 3.5, 'alpha', FALSE),
        (2, CAST(NULL AS DOUBLE), 'beta', TRUE),
        (3, 7.25, 'gamma', FALSE),
        (CAST(NULL AS INT), 1.0, CAST(NULL AS VARCHAR), TRUE),
        (4, CAST(NULL AS DOUBLE), 'delta', FALSE),
        (5, 9.0, 'epsilon', FALSE)
    ) AS t(id, val, name, is_corrupt)
    """,
)
def source_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input robustness (reference parity R14: the reference's
    whole error taxonomy exists because user files are dirty): CSV read
    in PERMISSIVE mode with a corrupt-record column. Parseable rows
    come out typed; rows that fail the schema (bad numeric, wrong
    arity) keep whatever fields DID parse, null the rest, and set
    is_corrupt=TRUE — the job never throws, and the corrupt subset is
    queryable for quarantine (the raw line is in the capture column,
    dropped here for the cross-engine check).
    """
    from pyspark.sql import functions as F

    path = os.path.join(tempfile.gettempdir(), "p2h_spark_fmt", "corrupt.csv")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(_CORRUPT_CSV)
    df = (
        spark.read.schema("id int, val double, name string, __raw string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "__raw")
        .csv(path)
    )
    return df.select(
        "id", "val", "name", F.col("__raw").isNotNull().alias("is_corrupt")
    )
