"""Scalar function surface (SURVEY.md §2B S25–S29).

All expressions are built-in `pyspark.sql.functions` — JVM-side,
whole-stage-codegen'd, zero Python in the hot path. Each query pins the
Spark expression against the DuckDB dialect equivalent; dialect drift
(function return types, 1-based list slicing, regexp flavor) is
neutralized with explicit casts documented inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_to_hyper_app_spark.catalog import load_table
from parquet_to_hyper_app_spark.functions.crosshash import WS
from parquet_to_hyper_app_spark.registry import query

#: integer-literal gate for the cross-engine try_cast contract:
#: optional padding from the shared six-char ASCII WS class (which is
#: exactly the set DuckDB's TRY_CAST trims — probed on the pinned
#: version), a sign, digits. Spark's try_cast trims a WIDER Java
#: whitespace+ISO-control set (UTF8String.trimAll: U+2028, \x00-\x1F,
#: ...), so BOTH sides gate on this class: wider-Java-only padding
#: degrades to NULL on both engines instead of diverging (advice r6).
#: Anchored with \z, not $: Java's `$` (no MULTILINE) matches BEFORE a
#: final Unicode line terminator, so a '42' + U+2028 string passed the Spark gate
#: while RE2's end-of-text `$` failed it in the oracle (review r6,
#: verified on both engines); \z is end-of-input in both dialects.
_INT_LITERAL = rf"^{WS}*[+-]?\d+{WS}*\z"


@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_name, 1, 5) AS name_head,
           p_brand || ':' || p_type AS brand_type,
           regexp_extract(p_name, '([a-z]+)\z', 1) AS last_word,
           CAST(length(p_name) AS BIGINT) AS name_len,
           replace(p_name, ' ', '_') AS name_snake,
           split_part(p_name, ' ', 2) AS second_word
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S25: string library — upper/substr/concat/regexp/length/replace/
    split_part on part names (simple RE2-compatible pattern so the Java
    and DuckDB regexp engines agree)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_head"),
        # concat (NULL-propagating) matches the oracle's `||`;
        # concat_ws would silently skip NULL operands
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_name", r"([a-z]+)\z", 1).alias("last_word"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT)
               AS days_to_eoy,
           CAST(isodow(o_orderdate) - 1 AS BIGINT) AS weekday_mon0,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S26: date/time library — extract, truncate, day arithmetic.
    Weekday normalized to Monday=0 (Spark weekday == DuckDB isodow-1);
    extraction results cast to BIGINT to match DuckDB's return types."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).cast("long").alias("days_to_eoy"),
        F.weekday("o_orderdate").cast("long").alias("weekday_mon0"),
        F.last_day(d).cast("timestamp_ntz").alias("month_end"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 + l_tax) AS charge,
           round(abs(l_discount - 0.05), 6) AS disc_dev,
           CASE WHEN l_extendedprice > 0
                THEN round(ln(l_extendedprice), 6) END AS log_price,
           CASE WHEN l_quantity >= 0
                THEN round(sqrt(l_quantity), 6) END AS sqrt_qty,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           l_orderkey % 7 AS key_mod,
           greatest(l_discount, l_tax) AS max_rate
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S27: math library — round/abs/ln/sqrt/ceil/floor/mod/greatest.
    ceil/floor cast to BIGINT (Spark returns LONG, DuckDB DOUBLE).

    Out-of-domain inputs pin to NULL on BOTH sides (review r5): Spark
    degrades ln(0)/ln(neg) to NULL and sqrt(neg) to NaN per row, while
    DuckDB hard-errors the whole query — the explicit domain CASE/when
    makes "edge row degrades to NULL, never fails the query" the
    actual cross-engine contract, not an accident of clean data."""
    li = load_table(spark, sf_dir, "lineitem")
    price, qty = F.col("l_extendedprice"), F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # raw double product: same IEEE ops on same operands in both
        # engines → bitwise identical, no rounding needed (rounding a
        # 4-decimal-exact product at scale 2 would sit on .xx5 ties)
        (price * (1 + F.col("l_tax"))).alias("charge"),
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("disc_dev"),
        F.when(price > 0, F.round(F.log(price), 6)).alias("log_price"),
        F.when(qty >= 0, F.round(F.sqrt(qty), 6)).alias("sqrt_qty"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
    )


@query(
    "scalar_string_extra",
    oracle=r"""
    SELECT p_partkey,
           reverse(p_name) AS name_rev,
           lpad(p_brand, 12, '*') AS brand_pad,
           repeat(p_type, 2) AS type_twice,
           left(p_name, 4) AS name_left,
           CAST(strpos(p_name, ' ') AS BIGINT) AS space_pos,
           CAST(ascii(p_name) AS BIGINT) AS first_char,
           -- \z, not $: Java's $ matches before a trailing line
           -- terminator, RE2's does not (review r6)
           CASE WHEN regexp_matches(p_name, '^[\x00-\x7f]*\z')
                 AND regexp_matches(p_type, '^[\x00-\x7f]*\z')
                THEN CAST(levenshtein(p_name, p_type) AS BIGINT)
           END AS name_type_dist
    FROM part
    """,
)
def scalar_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S25b: extended string library — reverse/lpad/repeat/left/
    instr/ascii/levenshtein (edit distance is the workhorse for
    fuzzy matching in data cleaning)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.lpad(F.col("p_brand"), 12, "*").alias("brand_pad"),
        F.repeat(F.col("p_type"), 2).alias("type_twice"),
        F.substring("p_name", 1, 4).alias("name_left"),
        F.instr(F.col("p_name"), " ").cast("long").alias("space_pos"),
        F.ascii(F.col("p_name")).cast("long").alias("first_char"),
        # ASCII gate (review r5): Spark levenshtein counts CHARACTERS,
        # DuckDB 1.0 counts BYTES — they agree only on ASCII. The pinned
        # contract: edit distance for ASCII pairs, NULL otherwise (both
        # sides; verified divergence: levenshtein('中文ab','ab') = 2 vs 6)
        F.when(
            F.col("p_name").rlike(r"^[\x00-\x7f]*\z")
            & F.col("p_type").rlike(r"^[\x00-\x7f]*\z"),
            F.levenshtein(F.col("p_name"), F.col("p_type")),
        )
        .cast("long")
        .alias("name_type_dist"),
    )


@query(
    "scalar_trycast",
    oracle=rf"""
    SELECT p_partkey,
           CASE WHEN regexp_matches(p_name, '{_INT_LITERAL}')
                THEN TRY_CAST(p_name AS INTEGER) END AS name_as_int,
           TRY_CAST(CAST(p_size AS VARCHAR) AS INTEGER) AS size_roundtrip,
           p_retailprice / NULLIF(p_size - p_size, 0) AS div_by_zero
    FROM part
    """,
)
def scalar_trycast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S25c: error-safe casts — try_cast yields NULL instead of
    failing (ANSI-mode-safe pipelines), try_divide NULLs on zero.

    The pinned string→int contract: an integer literal padded only by
    the shared ASCII WS class (crosshash.WS), NULL for anything else.
    BOTH sides gate on _INT_LITERAL — the oracle because DuckDB's bare
    TRY_CAST additionally ROUNDS fractional strings ('1.5' → 2) where
    Spark yields NULL (review r5), the Spark side because its try_cast
    trims the wider Java whitespace+ISO-control set (\\x0B handled by
    RE2's \\s differently, U+2028, ...) where DuckDB's does not
    (advice r6; both behaviors verified on the pinned versions)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.when(
            F.col("p_name").rlike(_INT_LITERAL),
            F.col("p_name").try_cast("int"),
        ).alias("name_as_int"),
        # try_cast here too: the docstring advertises the error-safe
        # cast, and in the degraded no-ansi-conf mode a plain cast
        # could throw where the oracle's TRY_CAST NULLs (review r5)
        F.col("p_size").cast("string").try_cast("int").alias("size_roundtrip"),
        F.try_divide(F.col("p_retailprice"), F.col("p_size") - F.col("p_size")).alias(
            "div_by_zero"
        ),
    )


@query(
    "scalar_map",
    oracle=r"""
    SELECT event_id,
           map_keys(m)[1] AS first_key,
           CAST(map_values(m)[1] AS BIGINT) AS k_value,
           CAST(cardinality(m) AS BIGINT) AS n_keys
    FROM (
        -- json_valid gate: DuckDB json_extract_string ERRORS the whole
        -- query on one malformed props row where Spark's
        -- get_json_object per-row NULLs; the integer regexp gate pins
        -- Spark's truncating non-ANSI string->long cast out of the
        -- contract ('1.5' would cast to 1 in Spark, round to 2 in
        -- DuckDB — both now NULL). Review r5.
        SELECT event_id,
               map(['k'], [CASE WHEN json_valid(props)
                                 AND regexp_matches(json_extract_string(props, '$.k'),
                                                    '^[+-]?\d+\z')
                                THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                           END]) AS m
        FROM events
    )
    """,
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S29b: MapType surface — construct a map from the parsed JSON,
    read keys/values/cardinality (typed key-value columns are the
    natural shape for sparse per-row metadata at scale). The value
    contract is integer-literal-or-NULL on both engines (see oracle
    comment)."""
    ev = load_table(spark, sf_dir, "events")
    s = F.get_json_object("props", "$.k")
    k = F.when(s.rlike(r"^[+-]?\d+\z"), s.cast("long"))
    m = F.create_map(F.lit("k"), k)
    return ev.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(F.map_values(m), 1).alias("k_value"),
        F.size(m).cast("long").alias("n_keys"),
    )


@query(
    "scalar_json",
    oracle=r"""
    SELECT event_id,
           CASE WHEN json_valid(props)
                THEN json_extract_string(props, '$.k') END AS k_str,
           CASE WHEN json_valid(props)
                 AND regexp_matches(CAST(json_extract(props, '$.k') AS VARCHAR),
                                    '^[+-]?\d+\z')
                THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
           END AS k_int,
           CAST(length(props) AS BIGINT) AS props_len
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S28: JSON extraction from the events.props string column.
    `get_json_object` (Spark) ≙ `json_extract_string` (DuckDB), with a
    `json_valid` gate on the oracle side: DuckDB errors the WHOLE query
    on one malformed row where Spark per-row NULLs (review r5). A typed
    read via from_json yields the same k_int — from_json('k BIGINT')
    NULLs a fractional 1.5 AND a string-typed "12" (both verified),
    which the oracle mirrors by regexp-gating the RAW json_extract
    (quotes intact, so string-typed numbers fail the gate) where a
    bare CAST would round or coerce."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.length("props").cast("long").alias("props_len"),
    )


@query(
    "array_ops",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS n_dims,
           CAST(embedding[1] AS DOUBLE) AS first_dim,
           -- empty-vs-NULL pinned: DuckDB's array_to_string emits NULL
           -- for an EMPTY list where Spark's array_join emits '' — ''
           -- is the contract for a defined-but-empty vector, NULL for
           -- an undefined one (review r5)
           -- floor(x*1e6 + 0.5)/1e6 BEFORE the formatting cast: the
           -- pure-IEEE 6-dp round (see l2_norm) moves the value off
           -- any decimal tie, making the DECIMAL(18,6) format cast
           -- unambiguous in both engines (r6 fuzz, seed 23)
           CASE WHEN embedding IS NOT NULL THEN
               coalesce(array_to_string(list_transform(embedding[1:4],
                   x -> CASE WHEN abs(CAST(x AS DOUBLE)) < 1e12
                             THEN CAST(CAST(floor(CAST(x AS DOUBLE) * 1e6 + 0.5) / 1e6
                                       AS DECIMAL(18,6)) AS VARCHAR)
                             ELSE 'overflow' END), ','), '')
           END AS head4_csv,
           -- 6-dp rounding is floor(x*1e6 + 0.5)/1e6 in DOUBLE: every
           -- step is one correctly-rounded IEEE op both engines
           -- perform identically, so the result CANNOT diverge — no
           -- decimal-rounding rule is involved at all. (The previous
           -- DECIMAL(24,6) round-trip was NOT such a primitive: Spark
           -- rounds the double's SHORTEST REPR half-up while DuckDB
           -- rounds the EXACT BINARY value — seed-23 dirty fuzz landed
           -- the l2 norm on ...2285345, shortest-repr-above-half but
           -- binary-below, and a dyadic mean on an exact tie where
           -- DuckDB rounds half-even. Both split.) Domain gate 1e12
           -- matches head4 — Spark's floor returns BIGINT.
           -- NULL-COMPONENT guard (r9 fuzz plant): Spark's aggregate()
           -- is an ordered fold, so one NULL element NULL-poisons the
           -- whole sum — the operator's per-row NULL-propagation rule.
           -- DuckDB's list_sum SKIPS NULL elements like an aggregate
           -- and would emit a real number; gate it out explicitly.
           CASE WHEN len(embedding) > 0
                 AND len(list_filter(embedding, x -> x IS NULL)) = 0 THEN
               CASE WHEN sqrt(list_sum(list_transform(
                        embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) < 1e12
                    THEN floor(sqrt(list_sum(list_transform(
                        embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                        * 1e6 + 0.5) / 1e6
               END
           END AS l2_norm,
           CASE WHEN len(list_filter(embedding, x -> x IS NULL)) = 0
                 AND abs(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                     / len(embedding)) < 1e12
                THEN floor(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                     / len(embedding) * 1e6 + 0.5) / 1e6 + 0.0
           END AS mean_dim
    FROM embeddings
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S29: higher-order array functions over the embedding vectors —
    size/element_at/slice/transform/aggregate, all JVM-side (no UDF).
    Elements cast float→double before arithmetic so both engines
    accumulate in double; aggregate() is an ordered left fold matching
    DuckDB's list_sum order. The slice is serialized to a CSV string
    (`head4_csv`) because the driver's canonicalizer needs scalar cells."""
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))

    # |x| >= 1e12 exceeds DECIMAL(18,6): non-ANSI Spark silently cast
    # it to NULL and array_join then silently DROPPED the element (a
    # 3-value CSV with no marker) while DuckDB hard-errored — both
    # sides now emit an explicit 'overflow' marker (review r5). NaN
    # lands in the marker branch in both engines (NaN < 1e12 is false
    # under Spark's total order and DuckDB's comparison alike).
    def round6(d):
        # pure-IEEE 6-dp round: multiply, add, floor, divide — four
        # correctly-rounded double ops both engines execute
        # identically, so parity holds at ANY value including decimal
        # ties (r6 fuzz seed 23; see the oracle comment). floor()
        # returns BIGINT in Spark — the 1e12 domain gates keep it
        # exact and in-range on every call site.
        return F.floor(d * 1e6 + F.lit(0.5)).cast("double") / 1e6

    def fmt(x):
        d = x.cast("double")
        return F.when(
            F.abs(d) < 1e12, round6(d).cast("decimal(18,6)").cast("string")
        ).otherwise(F.lit("overflow"))

    return e.select(
        "vec_id",
        # guard: Spark's size(NULL) is -1 under the session's legacy
        # sizeOfNull while DuckDB len(NULL) is NULL — same class as the
        # r4 size(split(NULL)) fix (review r5)
        F.when(F.col("embedding").isNotNull(), F.size("embedding"))
        .cast("long")
        .alias("n_dims"),
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
        F.array_join(F.transform(F.slice("embedding", 1, 4), fmt), ",").alias(
            "head4_csv"
        ),
        # empty-array guard: Spark's fold of [] yields the 0.0 init
        # while DuckDB's list_sum([]) is NULL — pin NULL on both.
        # 6-dp rounding is the pure-IEEE floor primitive (round6 above;
        # history: round(x,6) split on shortest-repr-vs-binary at
        # 1e8-magnitude in r6 seed 11, its DECIMAL(24,6) replacement
        # split AGAIN on seed 23 — Spark decimal-casts the shortest
        # repr half-up, DuckDB the exact binary half-even; only
        # identical IEEE arithmetic is actually engine-proof). Domain:
        # |x| < 1e12 (same overflow line head4_csv draws) — beyond it
        # both sides emit NULL.
        F.when(
            (F.size("embedding") > 0)
            & (
                F.sqrt(F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x))
                < 1e12
            ),
            round6(
                F.sqrt(F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x))
            ),
        ).alias("l2_norm"),
        # `+ 0.0` collapses IEEE signed zero: a near-zero negative mean
        # (e.g. a denormal-scale vector) rounds to -0.0 in one engine
        # and +0.0 in the other; -0.0 + 0.0 = +0.0 in both (caught by
        # the adversarial-data sweep, tools/fuzz_data.py)
        F.when(
            F.abs(
                F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x)
                / F.size("embedding")
            )
            < 1e12,
            round6(
                F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x)
                / F.size("embedding")
            )
            + F.lit(0.0),
        ).alias("mean_dim"),
    )
