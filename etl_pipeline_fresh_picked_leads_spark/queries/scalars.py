"""§2B-H: scalar function surface (string / date / math / array / map
/ JSON / conditional).

Grounding: date parameterization mirrors the reference's
``get_custom_dates`` formats (%m%d / %d,
/root/reference/fresh_picked_leads.py:140-154), lower-casing mirrors
its table-name normalization (/root/reference/big_uery_handler.py:74),
DATE literals its UPDATE (:190).  Everything here is a built-in JVM
expression inside whole-stage codegen — no Python in the row path.

Cross-engine gotchas handled below: DuckDB ``dayofweek`` is 0=Sunday
vs Spark 1=Sunday; DuckDB ``ceil/floor`` return DOUBLE vs Spark LONG;
``%`` keeps the dividend sign vs Spark ``pmod``; ``round`` on DOUBLE
is binary-value-based in DuckDB but decimal-string-based in Spark, so
rounding goes through DECIMAL on both sides; Spark ``array_position``
returns 0 when absent vs DuckDB ``list_position`` NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from ..sources.readers import read_table
from .registry import query


@query(
    "q_str_basic",
    oracle="""
SELECT c_custkey,
       lower(c_name) AS name_lower,
       upper(c_mktsegment) AS seg_upper,
       trim(concat('  ', c_name, ' ')) AS name_trimmed,
       CAST(length(c_name) AS INT) AS name_len,
       substr(c_name, 1, 8) AS name_prefix,
       concat_ws('|', c_mktsegment, c_name) AS seg_name
FROM customer
""",
)
def q_str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/trim/length/substr/concat — the reference's name
    normalization surface (big_uery_handler.py:74)."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
    )


@query(
    "q_str_split",
    oracle="""
SELECT p_partkey,
       string_split(p_name, ' ')[1] AS first_word,
       string_split(p_name, ' ')[-1] AS last_word,
       CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
FROM part
""",
)
def q_str_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        toks.getItem(0).alias("first_word"),
        F.element_at(toks, -1).alias("last_word"),
        F.size(toks).alias("n_words"),
    )


@query(
    "q_str_fuzzy",
    oracle="""
SELECT c_custkey,
       CAST(levenshtein(lower(c_name), 'customer#000000042') AS INT)
         AS edit_dist,
       CAST(levenshtein(c_mktsegment, 'BUILDING') AS INT) AS seg_dist,
       -- DuckDB 1.0 has no initcap; segments are single words so
       -- first-upper-rest-lower is equivalent
       upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
         AS seg_title,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
       replace(translate(c_name, '#', '-'), 'Customer', 'Lead') AS renamed
FROM customer
""",
)
def q_str_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching + normalization — the lead-dedup
    primitives (edit distance against a canonical form, casing,
    padding, character translation) a leads pipeline applies before
    keyed dedup."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein(F.lower("c_name"), F.lit("customer#000000042")).alias(
            "edit_dist"
        ),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("seg_dist"),
        F.initcap(F.lower("c_mktsegment")).alias("seg_title"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.regexp_replace(
            F.translate("c_name", "#", "-"), "Customer", "Lead"
        ).alias("renamed"),
    )


@query(
    "q_str_regex",
    oracle="""
SELECT o_orderkey,
       regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_digit,
       regexp_replace(o_orderpriority, '[0-9]+-', '') AS prio_word,
       regexp_matches(o_orderpriority, 'URGENT|HIGH') AS is_hot
FROM orders
""",
)
def q_str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"([0-9]+)", 1).alias("prio_digit"),
        F.regexp_replace("o_orderpriority", r"[0-9]+-", "").alias("prio_word"),
        F.col("o_orderpriority").rlike("URGENT|HIGH").alias("is_hot"),
    )


@query(
    "q_date_fmt",
    oracle="""
SELECT o_orderkey,
       strftime(o_orderdate, '%m%d') AS mmdd,
       strftime(o_orderdate, '%d') AS dd,
       strftime(o_orderdate, '%Y-%m') AS year_month
FROM orders
""",
)
def q_date_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly the reference's %m%d / %d formats
    (fresh_picked_leads.py:140-154)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "MMdd").alias("mmdd"),
        F.date_format("o_orderdate", "dd").alias("dd"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
    )


@query(
    "q_date_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(l_shipdate AS DATE) - 1 AS day_before_ship,
       CAST(l_shipdate AS DATE) + 30 AS ship_plus_30,
       CAST(datediff('day', CAST(o.o_orderdate AS DATE), CAST(l_shipdate AS DATE))
            AS INT) AS order_to_ship_days
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""",
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_sub/date_add/datediff — yesterday-window arithmetic
    (fresh_picked_leads.py:140-154) generalized."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    ship = F.col("l_shipdate").cast("date")
    return l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.date_sub(ship, 1).alias("day_before_ship"),
        F.date_add(ship, 30).alias("ship_plus_30"),
        F.datediff(ship, F.col("o_orderdate").cast("date")).alias(
            "order_to_ship_days"
        ),
    )


@query(
    "q_date_parts",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(day(o_orderdate) AS INT) AS dom,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
       CAST(quarter(o_orderdate) AS INT) AS qtr
FROM orders
""",
)
def q_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # DuckDB dow is 0=Sunday; Spark dayofweek is 1=Sunday — oracle adds 1.
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
    )


@query(
    "q_date_trunc",
    oracle="""
SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
""",
)
def q_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F.date_trunc returns tz-aware TIMESTAMP even for NTZ input; cast
    # back (identity under the UTC session) for output-schema parity
    e = read_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("month", "ts").cast("timestamp_ntz").alias("month_start")
    ).agg(F.count(F.lit(1)).alias("n_events"))


@query(
    "q_math",
    oracle="""
SELECT o_orderkey,
       CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE)
         AS price_r1,
       abs(o_totalprice - 250000.0) AS dist_mid,
       CAST(ceil(o_totalprice / 1000.0) AS BIGINT) AS price_kilo_ceil,
       CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS price_kilo_floor,
       pow(o_custkey % 10, 2) AS cust_sq,
       ((o_orderkey % 7) + 7) % 7 AS key_mod7,
       CAST(sign(o_totalprice - 250000.0) AS DOUBLE) AS mid_sign,
       sqrt(o_totalprice) AS price_sqrt
FROM orders
""",
)
def q_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        # Round via DECIMAL on both sides: DuckDB rounds the binary
        # double, Spark rounds its shortest decimal repr — they
        # disagree on x.x5 boundaries unless the value is decimal first.
        F.round(price.cast("decimal(18,2)"), 1).cast("double").alias("price_r1"),
        F.abs(price - 250000.0).alias("dist_mid"),
        F.ceil(price / 1000.0).alias("price_kilo_ceil"),
        F.floor(price / 1000.0).alias("price_kilo_floor"),
        F.pow(F.col("o_custkey") % 10, 2).alias("cust_sq"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).alias("key_mod7"),
        F.signum(price - 250000.0).alias("mid_sign"),
        F.sqrt(price).alias("price_sqrt"),
    )


@query(
    "q_cond",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open?') AS status_or_default,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
FROM orders
""",
)
def q_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif — the Ingestion_date coalesce
    shape (big_uery_handler.py:183-194)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open?")).alias(
            "status_or_default"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias(
            "is_urgent"
        ),
    )


@query(
    "q_arr_basic",
    oracle="""
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens,
       list_contains(string_split(d.text, ' '), 'spark') AS has_spark,
       CAST(COALESCE(list_position(string_split(d.text, ' '), 'table'), 0)
            AS BIGINT) AS pos_table,
       (SELECT CAST(len(e.embedding) AS INT) FROM embeddings e
        WHERE e.vec_id = d.doc_id) AS emb_len
FROM documents d
""",
)
def q_arr_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    e = read_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id"), F.size("embedding").alias("emb_len")
    )
    toks = F.split(F.col("text"), " ")
    return (
        d.join(e, d.doc_id == e.vec_id, "left")
        .select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.array_contains(toks, "spark").alias("has_spark"),
            F.array_position(toks, "table").alias("pos_table"),
            "emb_len",
        )
    )


@query(
    "q_arr_explode",
    oracle="""
-- embeddings are fixed 64-dim; DuckDB 1.0 can't lateral-join
-- generate_series on a column, so the bound is a constant here
SELECT e.vec_id, CAST(i - 1 AS INT) AS pos, e.embedding[CAST(i AS INT)] AS val
FROM embeddings e CROSS JOIN generate_series(1, 64) t(i)
WHERE e.vec_id % 10 = 0 AND i <= len(e.embedding)
""",
)
def q_arr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))


@query(
    "q_arr_transform",
    oracle="""
SELECT vec_id,
       round(list_aggregate(
         list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 6)
         AS emb_sum,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
       round(list_aggregate(
         list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
         'sum'), 6) AS emb_sq_sum
FROM embeddings
""",
)
def q_arr_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform / filter / aggregate) —
    the JVM-side substrate the similarity operators build on."""
    e = read_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("emb_sum"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("emb_sq_sum"),
    )


@query(
    "q_map_json",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
       CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS absent
FROM events
""",
)
def q_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_num"),
        F.get_json_object("props", "$.missing").alias("absent"),
    )


@query(
    "q_map_json_struct",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
FROM events
""",
)
def q_map_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing via from_json(schema) — the schema-on-read
    path for semi-structured columns (vs get_json_object's per-path
    extraction in q_map_json).  One parse per row regardless of how
    many fields are read."""
    from pyspark.sql.types import LongType, StructField, StructType

    e = read_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_id",
        F.from_json(
            "props", StructType([StructField("k", LongType())])
        ).alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 10).alias("k_mod"),
    )


@query(
    "q_map_ops",
    oracle="""
SELECT event_id,
       value * 2 AS doubled,
       value + 1 AS plus_one,
       2 AS n_keys
FROM events
""",
)
def q_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map build/lookup/keys in Spark; the oracle checks the extracted
    scalar results (DuckDB's MAP surface differs shape-wise, per
    SURVEY §2B-H)."""
    e = read_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("doubled"), F.col("value") * 2, F.lit("plus_one"), F.col("value") + 1
    )
    return e.select(
        "event_id",
        F.element_at(m, "doubled").alias("doubled"),
        F.element_at(m, "plus_one").alias("plus_one"),
        F.size(F.map_keys(m)).cast("int").alias("n_keys"),
    )


@query(
    "q_time_strings",
    oracle="""
SELECT event_id,
       strftime(ts, '%H:%M:%S') AS time_str,
       CAST(CASE WHEN strftime(ts, '%H:%M:%S')
                      SIMILAR TO '([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9]'
                 THEN 1 ELSE 0 END AS BOOLEAN) AS is_valid,
       CAST(hour(ts) * 3600 + minute(ts) * 60 + second(ts) AS INT)
         AS sec_of_day
FROM events
""",
)
def q_time_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-as-string semantics (SURVEY §1.3: Spark has no TIME type,
    so the reference's BigQuery TIME columns land as 'HH:mm:ss'
    strings + an invariant check).  This is that contract in query
    form: format, validity regex, and seconds-of-day arithmetic that
    downstream range filters use."""
    e = read_table(spark, sf_dir, "events")
    t = F.date_format("ts", "HH:mm:ss")
    return e.select(
        "event_id",
        t.alias("time_str"),
        t.rlike(r"^([01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9]$").alias(
            "is_valid"
        ),
        (
            F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
        ).cast("int").alias("sec_of_day"),
    )


@query(
    "q_geo_wkt",
    oracle="""
WITH pts AS (
  SELECT c_custkey,
         'POINT(' || CAST(CAST(c_custkey % 360 AS BIGINT) - 180 AS VARCHAR)
                  || ' '
                  || CAST(CAST((c_custkey * 7) % 180 AS BIGINT) - 90 AS VARCHAR)
                  || ')' AS wkt
  FROM customer
),
parsed AS (
  SELECT c_custkey, wkt,
         CAST(regexp_extract(wkt, 'POINT\\(([-0-9.]+) ([-0-9.]+)\\)', 1)
              AS DOUBLE) AS lon,
         CAST(regexp_extract(wkt, 'POINT\\(([-0-9.]+) ([-0-9.]+)\\)', 2)
              AS DOUBLE) AS lat
  FROM pts
)
SELECT c_custkey, wkt, lon, lat,
       round(2 * 6371.0 * asin(sqrt(
         pow(sin(radians(lat - 0.0) / 2), 2)
         + cos(radians(0.0)) * cos(radians(lat))
           * pow(sin(radians(lon - 0.0) / 2), 2))), 6) AS km_from_origin
FROM parsed
WHERE (c_custkey % 360) - 180 BETWEEN -90 AND 90
  AND ((c_custkey * 7) % 180) - 90 BETWEEN -45 AND 45
""",
)
def q_geo_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOGRAPHY-as-WKT semantics (SURVEY §1.3: Spark has no geo type,
    so WKT strings + helper predicates).  Planted deterministic
    POINT(lon lat) strings per customer are regex-parsed back to
    coordinates, bbox-filtered, and scored with haversine distance
    from the origin — the parse/filter/distance trio a lead-routing
    query needs.  Identical expression structure both sides keeps the
    trig bit-identical; distance rounds to 6 dp."""
    c = read_table(spark, sf_dir, "customer")
    lon_i = F.pmod(F.col("c_custkey"), F.lit(360)) - 180
    lat_i = F.pmod(F.col("c_custkey") * 7, F.lit(180)) - 90
    pts = c.select(
        "c_custkey",
        F.concat(
            F.lit("POINT("), lon_i.cast("bigint").cast("string"),
            F.lit(" "), lat_i.cast("bigint").cast("string"), F.lit(")"),
        ).alias("wkt"),
    )
    pat = r"POINT\(([-0-9.]+) ([-0-9.]+)\)"
    parsed = pts.select(
        "c_custkey",
        "wkt",
        F.regexp_extract("wkt", pat, 1).cast("double").alias("lon"),
        F.regexp_extract("wkt", pat, 2).cast("double").alias("lat"),
    )
    lat, lon = F.col("lat"), F.col("lon")
    hav = 2 * 6371.0 * F.asin(F.sqrt(
        F.pow(F.sin(F.radians(lat - 0.0) / 2), 2)
        + F.cos(F.radians(F.lit(0.0))) * F.cos(F.radians(lat))
        * F.pow(F.sin(F.radians(lon - 0.0) / 2), 2)
    ))
    return parsed.filter(
        lon.between(-90, 90) & lat.between(-45, 45)
    ).select(
        "c_custkey", "wkt", "lon", "lat",
        F.round(hav, 6).alias("km_from_origin"),
    )


@query(
    "q_variant_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
       CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k_str,
       CAST(json_extract_string(props, '$.missing') AS BIGINT) AS absent
FROM events
""",
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured columns: parse_json
    once into the binary VARIANT encoding, then typed variant_get
    extractions — the engine-native successor to per-field
    get_json_object string re-parsing (one parse, many typed reads;
    at 100 TB the repeated JSON re-parse is the hot cost).  Output is
    extracted to typed columns because VARIANT itself has no
    cross-engine hash form."""
    e = read_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_num"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.variant_get(v, "$.missing", "bigint").alias("absent"),
    )


@query(
    "q_udtf_lateral",
    oracle="""
SELECT d.doc_id, u.word, u.idx
FROM documents d,
     (SELECT doc_id,
             unnest(t[1:5]) AS word,
             CAST(unnest(range(1, LEAST(len(t), 5) + 1)) - 1 AS INT) AS idx
      FROM (SELECT doc_id,
                   list_filter(string_split(lower(trim(text)), ' '),
                               x -> x <> '') AS t
            FROM documents)) u
WHERE d.doc_id = u.doc_id
""",
)
def q_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Python UDTF (Spark 3.5+/4 @udtf API, not the mapInPandas
    emulation): a table function yielding (word, idx) for each doc's
    first five tokens, applied with LATERAL join syntax.  Arrow-
    batched like any Python boundary; the declared-schema UDTF is the
    engine surface a user would extend for custom 1->N expansions."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="word: string, idx: int")
    class FirstTokens:
        def eval(self, doc_id, text: str):  # noqa: ANN001
            toks = [t for t in (text or "").lower().strip().split() if t]
            for i, w in enumerate(toks[:5]):
                yield w, i

    spark.udtf.register("fpl_first_tokens", FirstTokens)
    docs = read_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("fpl_docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.word, t.idx
        FROM fpl_docs_for_udtf d,
             LATERAL fpl_first_tokens(d.doc_id, d.text) t
        """
    )
