"""Scalar function surface (SURVEY.md §2 #45-52).

Reference provenance: the reference's transform/ stage
[REC src/etl/.DS_Store:5104] cleaned/derived columns row-wise; here every
transform is a built-in JVM expression inside whole-stage codegen — no
Python in the hot path (the deliberate UDF surface lives in udf.py).

Dialect traps handled per SURVEY §2.1: date_add via interval arithmetic
(Spark's date_add returns DATE, DuckDB's + INTERVAL returns TIMESTAMP);
datediff argument order; ceil/floor output types; posexplode ordinality
oracle via generate_series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polybot_data_etl_spark.catalog import table
from polybot_data_etl_spark.registry import register


@register(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substring(c_name, 1, 8) AS name_prefix,
           trim(concat('  ', c_name, '  ')) AS name_trim,
           lpad(cast(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           concat(c_name, '/', c_mktsegment) AS name_seg,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           length(c_name) AS name_len,
           string_split(c_name, '#')[2] AS key_part
    FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (upper/lower/substring/trim/lpad/concat/
    replace/length/split-part)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat(F.col("c_name"), F.lit("/"), F.col("c_mktsegment")).alias("name_seg"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_short"
        ),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.split(F.col("c_name"), "#").getItem(1).alias("key_part"),
    )


@register(
    "q_fn_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_replace(text, '[aeiou]', '', 'g') AS no_vowels,
           regexp_matches(text, 'join') AS has_join
    FROM documents
    WHERE doc_id < 200
    """,
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract/replace/match with dialect-portable patterns
    (POSIX-ish subset: classes, groups, +*? — SURVEY §2.1.12)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", "[aeiou]", "").alias("no_vowels"),
        F.col("text").rlike("join").alias("has_join"),
    )


@register(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           cast(year(o_orderdate) AS INTEGER) AS y,
           cast(month(o_orderdate) AS INTEGER) AS m,
           cast(day(o_orderdate) AS INTEGER) AS d,
           cast(quarter(o_orderdate) AS INTEGER) AS q,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_ts,
           last_day(cast(o_orderdate AS DATE))::TIMESTAMP AS month_end,
           cast(date_diff('day', cast(o_orderdate AS DATE), DATE '2002-01-01')
                AS BIGINT) AS days_to_2002
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery; handles the Spark↔DuckDB traps:
    datediff arg order flips, +INTERVAL keeps TIMESTAMP on both sides."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("y"),
        F.month("o_orderdate").cast("int").alias("m"),
        F.dayofmonth("o_orderdate").cast("int").alias("d"),
        F.quarter("o_orderdate").cast("int").alias("q"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias(
            "month_end"
        ),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_2002"),
    )


@register(
    "q_fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4) AS abs_disc,
           cast(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           cast(floor(l_quantity) AS BIGINT) AS qty_floor,
           round(ln(l_extendedprice), 4) AS ln_price,
           round(log10(l_extendedprice), 4) AS log10_price,
           round(exp(l_discount), 4) AS exp_disc,
           round(sqrt(l_quantity), 4) AS sqrt_qty,
           round(pow(l_quantity, 2), 2) AS qty_sq,
           l_orderkey % 7 AS key_mod,
           cast(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           round(greatest(l_quantity, l_discount * 100), 2) AS biggest,
           round(least(l_quantity, l_discount * 100), 2) AS smallest
    FROM lineitem
    WHERE l_orderkey < 500
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery (ceil/floor cast to BIGINT on both sides —
    DuckDB's ceil returns DOUBLE, Spark's returns LONG)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_disc"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.round(F.log(F.col("l_extendedprice")), 4).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 4).alias("log10_price"),
        F.round(F.exp("l_discount"), 4).alias("exp_disc"),
        F.round(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
        F.round(F.greatest(F.col("l_quantity"), F.col("l_discount") * 100), 2).alias(
            "biggest"
        ),
        F.round(F.least(F.col("l_quantity"), F.col("l_discount") * 100), 2).alias(
            "smallest"
        ),
    )


@register(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           cast(json_extract_string(props, '$.k') AS INTEGER) AS k,
           cast(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k2,
           cast(json_extract_string(props, '$.missing') AS INTEGER) AS missing
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the semi-structured props payload
    (events.props = '{"k": <int>}')."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k"),
        (k * 2).alias("k2"),
        F.get_json_object("props", "$.missing").cast("int").alias("missing"),
    )


@register(
    "q_fn_array",
    oracle="""
    SELECT vec_id,
           cast(len(embedding) AS INTEGER) AS dim,
           round((embedding::DOUBLE[])[1], 4) + 0.0 AS first_val,
           round(list_sum(list_transform(embedding::DOUBLE[], x -> x)), 4)
               + 0.0 AS total,
           round(list_sum(list_transform(list_filter(embedding::DOUBLE[], x -> x > 0),
                                         x -> x)), 4) + 0.0 AS pos_total,
           cast(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS INTEGER)
               AS n_pos,
           round(list_sort(embedding::DOUBLE[])[1], 4) + 0.0 AS min_val,
           round(list_slice(embedding::DOUBLE[], 1, 3)[3], 4) + 0.0 AS third_val
    FROM embeddings
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops incl. higher-order transform/filter/aggregate — all
    scalar-valued outputs (cross-engine hashes of list cells are
    implementation-defined, scalars are not)."""
    e = table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # `+ 0.0` on every rounded float: signed-zero normalization on both
    # engines (a component that rounds to -0.0 hashes differently
    # otherwise — the strict-hasher class found in round 8)
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        (F.round(F.element_at(dbl, 1), 4) + F.lit(0.0)).alias("first_val"),
        (
            F.round(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x), 4)
            + F.lit(0.0)
        ).alias("total"),
        (
            F.round(
                F.aggregate(
                    F.filter(dbl, lambda x: x > 0),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("pos_total"),
        F.size(F.filter(dbl, lambda x: x > 0)).cast("int").alias("n_pos"),
        (F.round(F.element_at(F.array_sort(dbl), 1), 4) + F.lit(0.0)).alias(
            "min_val"
        ),
        (F.round(F.element_at(F.slice(dbl, 1, 3), 3), 4) + F.lit(0.0)).alias(
            "third_val"
        ),
    )


@register(
    "q_fn_map",
    oracle="""
    SELECT event_id, event_type AS type_v, cast(user_id AS VARCHAR) AS user_v
    FROM events WHERE event_id < 3000
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + lookup on the Spark side (map_from_arrays +
    element_at); the oracle checks the scalar-equivalent output."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("user")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_v"),
        F.element_at(m, "user").alias("user_v"),
    )


@register(
    "q_explode",
    oracle="""
    SELECT vec_id,
           cast(i - 1 AS BIGINT) AS pos,
           round((embedding::DOUBLE[])[i], 4) AS val
    FROM (SELECT vec_id, embedding,
                 unnest(generate_series(1, len(embedding))) AS i
          FROM embeddings WHERE vec_id < 5)
    """,
)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array flatten with ordinality (bounded probe set).

    DuckDB 1.0 lacks UNNEST WITH ORDINALITY; the oracle uses a lateral
    generate_series (SURVEY §2.1.9).
    """
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    return e.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("pos", "v")
    ).select(
        "vec_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.round(F.col("v").cast("double"), 4).alias("val"),
    )


@register(
    "q_fn_bitwise",
    oracle="""
    SELECT l_orderkey,
           l_orderkey & 255 AS band,
           l_orderkey | 15 AS bor,
           xor(l_orderkey, l_partkey) AS bxor,
           l_linenumber << 3 AS shl,
           l_orderkey >> 2 AS shr,
           bit_count(l_orderkey) AS popcnt
    FROM lineitem
    WHERE l_orderkey <= 512
    """,
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function surface: AND/OR/XOR, shifts, popcount — the
    primitives hash-bucketing, bitmap indexes, bloom filters and
    feature hashing are built from.  Pure whole-stage-codegen
    projections; the key predicate is pushed to the parquet scan.
    """
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 512)
    return li.select(
        "l_orderkey",
        F.expr("l_orderkey & 255").alias("band"),
        F.expr("l_orderkey | 15").alias("bor"),
        F.expr("l_orderkey ^ l_partkey").alias("bxor"),
        F.expr("shiftleft(l_linenumber, 3)").cast("int").alias("shl"),
        F.expr("shiftright(l_orderkey, 2)").alias("shr"),
        F.expr("bit_count(l_orderkey)").alias("popcnt"),
    )


@register(
    "q_fn_struct",
    oracle="""
    SELECT c_custkey,
           (struct_pack(
               inner := struct_pack(nk := c_nationkey,
                                    bal := round(c_acctbal, 2)),
               seg := c_mktsegment
           )).inner.nk AS nk,
           (struct_pack(
               inner := struct_pack(nk := c_nationkey,
                                    bal := round(c_acctbal, 2)),
               seg := c_mktsegment
           )).inner.bal AS bal,
           (struct_pack(
               inner := struct_pack(nk := c_nationkey,
                                    bal := round(c_acctbal, 2)),
               seg := c_mktsegment
           )).seg AS seg
    FROM customer
    WHERE c_custkey <= 200
    """,
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct (nested record) construction and field access: build a
    two-level struct, then project scalar leaves back out (hash runs
    over scalars; nested *output* types are exercised by the multimodal
    family).  Structs are how a wide-event schema nests typed metadata
    without exploding the column count; Catalyst prunes unaccessed
    struct fields from parquet reads the same way it prunes columns.
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    nested = F.struct(
        F.struct(
            F.col("c_nationkey").alias("nk"),
            F.round("c_acctbal", 2).alias("bal"),
        ).alias("inner"),
        F.col("c_mktsegment").alias("seg"),
    )
    return c.select(
        "c_custkey",
        nested.getField("inner").getField("nk").alias("nk"),
        nested.getField("inner").getField("bal").alias("bal"),
        nested.getField("seg").alias("seg"),
    )


@register(
    "q_fn_hash",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           sha256(c_name || '|' || c_mktsegment) AS row_sha,
           substring(md5(c_name), 1, 8) AS short_key
    FROM customer
    WHERE c_custkey <= 300
    """,
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash surface: md5 / sha-256 hex digests — the
    portable content-address primitives (row fingerprints, change
    detection, PII-safe join keys).  Standardized algorithms hash-match
    across every engine, unlike engine-native hashes (xxhash64 etc.),
    which is why the dedup family's *portable* fingerprints are built
    from arithmetic instead.  Concatenation uses an explicit separator
    so (a, bc) never collides with (ab, c).
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.concat_ws("|", "c_name", "c_mktsegment"), 256).alias(
            "row_sha"
        ),
        F.substring(F.md5("c_name"), 1, 8).alias("short_key"),
    )


@register(
    "q_fn_url",
    oracle="""
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, 'lang=([^&]*)', 1) AS lang_param,
           regexp_extract(url, '\\?(.*)$', 1) AS query
    FROM (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || doc_id
                   || '?lang=' || lang || '&n=' || n_chars AS url
        FROM documents
    )
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface: synthesize a canonical URL per document
    (the fixtures ship no URL column), then split it back into host /
    path / query / single-param with Spark's JVM-side ``parse_url`` —
    the workhorse of web-corpus provenance dedup (URL-canonicalization
    dedup keys on exactly these pieces).  The oracle reproduces each
    component with regexes; outputs are plain strings so the comparison
    is exact.  Single-pass narrow projection, zero shuffles."""
    d = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
    )


@register(
    "q_fn_null",
    oracle="""
    SELECT o_orderkey,
           st,
           coalesce(st, o_orderpriority) AS st_or_prio,
           CASE WHEN st IS NOT NULL THEN 'has' ELSE 'none' END AS nvl2_tag,
           (st IS NOT DISTINCT FROM 'F') AS is_final_nullsafe,
           (st IS DISTINCT FROM 'F') AS not_final_nullsafe
    FROM (
        SELECT o_orderkey, o_orderpriority,
               nullif(o_orderstatus, 'O') AS st
        FROM orders
        WHERE o_orderkey < 5000
    )
    """,
)
def q_fn_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL NULL-semantics function surface: nullif / coalesce / nvl2 /
    null-safe equality (`<=>` ≡ IS NOT DISTINCT FROM) over a derived
    nullable column — the expression family every CDC merge and
    nullable-dimension lookup leans on (q_join_null_safe exercises the
    JOIN side; this pins the scalar side).

    Single-pass narrow projection with the key filter pushed into the
    scan; zero shuffles."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    st = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    d = o.select("o_orderkey", "o_orderpriority", st.alias("st"))
    return d.select(
        "o_orderkey",
        "st",
        F.coalesce(F.col("st"), F.col("o_orderpriority")).alias(
            "st_or_prio"
        ),
        F.nvl2(F.col("st"), F.lit("has"), F.lit("none")).alias("nvl2_tag"),
        F.col("st").eqNullSafe(F.lit("F")).alias("is_final_nullsafe"),
        (~F.col("st").eqNullSafe(F.lit("F"))).alias("not_final_nullsafe"),
    )


@register(
    "q_fn_binary",
    oracle="""
    SELECT c_custkey,
           base64(c_name::BLOB) AS name_b64,
           lower(hex(c_name)) AS name_hex,
           length(from_base64(base64(c_name::BLOB))::VARCHAR)
               AS b64_roundtrip_len,
           (from_base64(base64(c_name::BLOB))::VARCHAR = c_name)
               AS b64_roundtrip_ok
    FROM customer
    WHERE c_custkey <= 100
    """,
)
def q_fn_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-encoding scalar surface: base64 / hex encode plus decode
    round-trips — the wire-format primitives for shipping binary
    columns through text-only channels (JSON logs, CSV interchange,
    URL-safe ids).  RFC 4648 base64 and hex are engine-portable by
    definition; hex is lower()ed because engines disagree on digit
    case.  Narrow projection with a pushed key filter — zero shuffle,
    whole-stage codegen."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    b64 = F.base64(F.col("c_name").cast("binary"))
    return c.select(
        "c_custkey",
        b64.alias("name_b64"),
        F.lower(F.hex(F.col("c_name"))).alias("name_hex"),
        F.length(F.unbase64(b64)).alias("b64_roundtrip_len"),
        (F.unbase64(b64).cast("string") == F.col("c_name")).alias(
            "b64_roundtrip_ok"
        ),
    )


@register(
    "q_fn_decimal",
    oracle="""
    WITH d AS (
        SELECT l_returnflag,
               CAST(l_extendedprice AS DECIMAL(9,2)) AS price,
               CAST(l_discount AS DECIMAL(4,2)) AS disc,
               CAST(l_tax AS DECIMAL(4,2)) AS tax
        FROM lineitem
    ),
    c AS (
        SELECT l_returnflag, price,
               price * (1 - disc) AS dp,
               price * (1 - disc) * (1 + tax) AS ch
        FROM d
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(price) AS DECIMAL(20,2))::VARCHAR AS sum_price,
           CAST(sum(dp) AS DECIMAL(24,4))::VARCHAR AS sum_disc_price,
           CAST(sum(ch) AS DECIMAL(28,6))::VARCHAR AS sum_charge,
           CAST(max(price) AS DECIMAL(9,2))::VARCHAR AS max_price
    FROM c GROUP BY l_returnflag
    """,
)
def q_fn_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL money math (SURVEY §1.2's one unexercised type
    family, VERDICT r4 #5): cents-exact revenue accounting that a
    double-typed pipeline cannot guarantee (float sums drift in the
    last ulps; ledgers must reconcile to the cent).

    Determinism contract: NO intermediate rounding anywhere.  The
    doubles cast to DECIMAL(9,2)/(4,2) once (both engines round the
    cents-exact doubles to the same 2-dp values); products then carry
    their EXACT algebraic scale (price×(1−disc) → scale 4,
    ×(1+tax) → scale 6, all within precision 38 on both engines), and
    decimal sums are exact integers underneath — so the engines agree
    bit-for-bit with zero tolerance, unlike any float formulation.
    An intermediate CAST to scale 2 was measured to DIVERGE: Spark
    rounds ties HALF_UP where DuckDB's decimal cast rounds them
    half-to-even, and 4-dp products end in ...50 constantly.  Output
    money columns are fixed-scale decimals rendered as strings (both
    engines print trailing-zero-padded exact values; pandas would
    otherwise coerce them to float64 and re-introduce the drift).

    Shape: one map-side-combined hash agg over a narrow projection —
    decimal sums are 128-bit adds, codegen'd, shuffle state is one
    decimal per column per group."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(9,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    dp = price * (F.lit(1) - disc)          # decimal(15,4), exact
    ch = dp * (F.lit(1) + tax)              # decimal(21,6), exact
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(price).cast("decimal(20,2)").cast("string").alias("sum_price"),
        F.sum(dp).cast("decimal(24,4)").cast("string").alias("sum_disc_price"),
        F.sum(ch).cast("decimal(28,6)").cast("string").alias("sum_charge"),
        F.max(price).cast("string").alias("max_price"),
    )


@register(
    "q_fn_interval",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(avg(date_diff('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE))) + 1e-9, 4)
               AS avg_ship_days,
           CAST(max(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE))) AS BIGINT)
               AS max_ship_days,
           CAST(sum(CASE WHEN date_diff('day',
                                        CAST(o.o_orderdate AS DATE),
                                        CAST(l.l_shipdate AS DATE)) < 30
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within_30d,
           CAST(sum(CASE WHEN l.l_shipdate
                              < o.o_orderdate + INTERVAL 1 MONTH
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within_month
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q_fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL / date arithmetic surface (the other SURVEY §1.2 type
    family no query exercised): order-to-ship latency per priority
    class — day diffs, day-interval and calendar-month-interval
    comparisons.

    Cross-engine notes: datediff runs on DATE (both engines truncate
    the NTZ timestamp identically); `+ INTERVAL 1 MONTH` clamps to
    month-end the same way in Spark and DuckDB (Jan 31 + 1 month =
    Feb 28), so the calendar-interval predicate is portable.  Counts
    are exact ints; the single avg rounds at 4 dp with the +1e-9
    nudge.  TRAP (measured, DuckDB 1.0): INTERVAL 30 DAY and INTERVAL
    1 MONTH compare EQUAL under DuckDB's interval equality, so two
    such additions in one select get conflated by common-subexpression
    elimination (the month predicate silently becomes the 30-day one).
    The 30-day window is therefore an integer datediff comparison on
    both sides, leaving exactly one interval expression in the query.

    Shape: fact⋈fact equi-join on the orderkey (the bucketed-layout
    join of SCALE.md at 100 TB), then one map-side-combined agg to
    |priorities| rows."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    ship_days = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.avg(ship_days) + F.lit(1e-9), 4).alias("avg_ship_days"),
            F.max(ship_days).cast("bigint").alias("max_ship_days"),
            F.sum(F.when(ship_days < 30, 1).otherwise(0))
            .cast("bigint")
            .alias("n_within_30d"),
            F.sum(
                F.when(
                    F.col("l_shipdate")
                    < F.col("o_orderdate") + F.expr("INTERVAL 1 MONTH"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_within_month"),
        )
    )


@register(
    "q_fn_format",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate::TIMESTAMP, '%Y-%m') AS month_label,
           strftime(o_orderdate::TIMESTAMP, '%a') AS dow_abbrev,
           strftime(o_orderdate::TIMESTAMP, '%A') AS dow_name,
           printf('%.2f', round(o_totalprice, 2)) AS price_str,
           format('{:,}', CAST(round(o_totalprice * 100, 0) AS BIGINT))
               AS cents_grouped
    FROM orders WHERE o_orderkey <= 500
    """,
)
def q_fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presentation-formatting scalar surface: date labels (month
    bucket, weekday abbrev/name) and number rendering (fixed 2-dp
    string, thousands-grouped integer) — the report-layer functions
    whose cross-engine traps are all locale/rounding:

      * pattern syntaxes differ (JDK `yyyy-MM`/`E` vs strftime
        `%Y-%m`/`%a`) but the RENDERED values agree under the en
        default locale — asserted by the hash gate, not assumed;
      * `%.2f` printf rounding is HALF_UP in Java but HALF_EVEN in C —
        portable ONLY because the input is round()ed to 2 dp first
        (cents-exact doubles render without a tie to break);
      * thousands grouping on DOUBLES is unsupported in DuckDB, so the
        grouped form is an exact BIGINT (cents).

    Narrow pushed-filter projection — zero shuffle, codegen."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(od, "yyyy-MM").alias("month_label"),
        F.date_format(od, "E").alias("dow_abbrev"),
        F.date_format(od, "EEEE").alias("dow_name"),
        F.format_string(
            "%.2f", F.round("o_totalprice", 2).cast("double")
        ).alias("price_str"),
        F.format_number(
            F.round(F.col("o_totalprice") * 100, 0).try_cast("bigint"), 0
        ).alias("cents_grouped"),
    )


@register(
    "q_fn_rounding",
    oracle="""
    SELECT x,
           CAST(count(*) AS BIGINT) AS n,
           CAST(floor(x + 0.5) AS DOUBLE) AS half_up,
           CAST(round_even(x, 0) AS DOUBLE) AS bankers,
           CAST(floor(x) AS DOUBLE) AS floor_x,
           CAST(ceil(x) AS DOUBLE) AS ceil_x,
           CAST(trunc(x) AS DOUBLE) AS trunc_x
    FROM (SELECT (o_orderkey % 1000) / 4.0 AS x FROM orders)
    GROUP BY x
    """,
)
def q_fn_rounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-mode surface: HALF_UP vs banker's HALF_EVEN vs
    floor/ceil/trunc on an exact quarter-step grid (x = k/4 — .0 .25
    .5 .75 are exact binary doubles, so every tie is a TRUE tie and
    the modes genuinely diverge at .5 instead of depending on decimal
    representation error — the q_fn_format lesson applied to rounding).
    half_up is spelled floor(2x+0.5)/2-style portably because Spark's
    round() is HALF_UP on doubles while DuckDB's is half-away-from-zero
    (equal on the nonneg grid, but the explicit form documents the
    contract); banker's uses Spark bround ↔ DuckDB round_even.

    Shape: a pure scan-side projection + one map-side-combined agg on
    the ≤1000-value grid."""
    o = table(spark, sf_dir, "orders")
    x = (F.col("o_orderkey") % 1000) / 4.0
    return (
        o.select(x.alias("x"))
        .groupBy("x")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            "x",
            "n",
            F.floor(F.col("x") + 0.5).cast("double").alias("half_up"),
            F.bround(F.col("x"), 0).cast("double").alias("bankers"),
            F.floor("x").cast("double").alias("floor_x"),
            F.ceil("x").cast("double").alias("ceil_x"),
            F.col("x").cast("bigint").cast("double").alias("trunc_x"),
        )
    )


@register(
    "q_fn_isoweek",
    oracle="""
    SELECT isoyear(o_orderdate::DATE) AS iso_year,
           weekofyear(o_orderdate::DATE) AS iso_week,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(cast(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
               AS total
    FROM orders
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_fn_isoweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 week calendar surface: orders rolled up by
    (ISO week-year, ISO week) — the fiscal-reporting bucketing where
    the naive year() is WRONG at year boundaries (2024-01-01 is ISO
    week 1 of 2024, but 2023-01-01 is ISO week 52 of 2022): Spark's
    extract(YEAROFWEEK) ↔ DuckDB isoyear and weekofyear ↔ weekofyear
    are both ISO — hash-asserted here so the mapping stays honest.

    Exact-cents totals; one map-side-combined agg on the derived
    calendar key (a pure scan-side expression)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.expr("extract(YEAROFWEEK FROM o_orderdate)").alias("iso_year"),
            F.weekofyear("o_orderdate").alias("iso_week"),
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.round(
                F.sum(
                    F.round(F.col("o_totalprice") * 100).try_cast("long")
                )
                / 100.0,
                2,
            ).alias("total"),
        )
        .orderBy("iso_year", "iso_week")
    )


@register(
    "q_fn_try",
    oracle="""
    SELECT e.event_id,
           try_cast(json_extract_string(e.props, '$.k') AS INTEGER)
               AS k_parsed,
           try_cast(e.event_type AS INTEGER) AS type_as_int,
           e.value / nullif(cast(e.event_id % 5 AS DOUBLE), 0) AS safe_div,
           cast(try_cast(concat('2024-',
                               cast(e.event_id % 15 AS VARCHAR), '-01')
                         AS DATE) AS VARCHAR) AS maybe_date
    FROM events e WHERE e.event_id < 2000
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe TRY_* surface: under ANSI SQL mode (this engine's
    default, like the modern Spark default) a bad cast or division by
    zero is a runtime ERROR, so dirty-input expressions must opt into
    NULL-on-failure explicitly — try_cast for unparseable ints/dates,
    try_divide ↔ the portable x/nullif(y,0) for zero denominators.
    This query exercises each form on genuinely dirty derivations
    (non-numeric strings, invalid month-less dates, zero divisors) —
    the scan-side hygiene layer every ingestion projection needs.

    Zero shuffle: pure codegen'd projections."""
    e = table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k_parsed"),
        F.col("event_type").try_cast("int").alias("type_as_int"),
        F.try_divide(
            F.col("value"), (F.col("event_id") % 5).cast("double")
        ).alias("safe_div"),
        F.concat(
            F.lit("2024-"),
            (F.col("event_id") % 15).cast("string"),
            F.lit("-01"),
        )
        .try_cast("date")
        .cast("string")
        .alias("maybe_date"),
    )
