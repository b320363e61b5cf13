"""Scalar function families (SURVEY.md §2B "Scalar functions").

One query per family, each exercising >=5 functions. Everything stays
JVM-side inside whole-stage codegen — zero Python, zero UDFs — so these
scale exactly like the scans they project over.

Dialect notes (SURVEY §7): Spark `weekday()+1` == DuckDB `isodow`;
`datediff` argument order differs; integer-returning functions are cast
to BIGINT on both sides so schemas line up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from snapshot_s3_util_spark.io import load_embeddings, load_table
from snapshot_s3_util_spark.registry import register
from snapshot_s3_util_spark.sql_helpers import EVENTS_REL, ND_FIELD_SQL, nd_field_col


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_mktsegment)                          AS seg_upper,
           LOWER(c_name)                                AS name_lower,
           SUBSTR(c_name, 10, 9)                        AS key_digits,
           TRIM(CONCAT(' ', c_name, ' '))               AS name_trimmed,
           CONCAT_WS('|', c_mktsegment, c_name)         AS seg_name,
           REGEXP_EXTRACT(c_name, 'Customer#(\\d+)', 1) AS extracted_key,
           CAST(LENGTH(c_name) AS BIGINT)               AS name_len,
           REPLACE(c_name, 'Customer', 'Cust')          AS name_short
    FROM customer
    """,
    category="function",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/substr/trim/concat_ws/regexp/length/replace."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 10, 9).alias("key_digits"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("name_trimmed"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).alias("extracted_key"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(YEAR(o_orderdate) AS BIGINT)                   AS yr,
           CAST(MONTH(o_orderdate) AS BIGINT)                  AS mon,
           CAST(ISODOW(o_orderdate) AS BIGINT)                 AS iso_dow,
           CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT)
                                                               AS days_to_y2k,
           CAST(o_orderdate AS DATE) + 30                      AS due_date,
           o_orderdate + INTERVAL 12 HOUR                      AS noon_after
    FROM orders
    """,
    category="function",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: trunc, parts, diff, add, interval arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mon"),
        (F.weekday("o_orderdate") + 1).cast("bigint").alias("iso_dow"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_y2k"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        (F.col("o_orderdate") + F.expr("INTERVAL 12 HOURS")).alias("noon_after"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 2)                    AS price_2dp,
           ABS(l_discount - 0.05)                       AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT)             AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT)            AS qty_floor,
           ROUND(POW(l_quantity, 2), 6)                 AS qty_sq,
           -- positive-domain guard: Spark's ln/log10 return NULL on
           -- x <= 0 where DuckDB raises; NULL is the shared semantics.
           CASE WHEN l_extendedprice > 0
                THEN ROUND(LN(l_extendedprice), 6) END    AS ln_price,
           CASE WHEN l_extendedprice > 0
                THEN ROUND(LOG10(l_extendedprice), 6) END AS log10_price,
           CAST(l_linenumber % 3 AS BIGINT)             AS line_mod3,
           CAST(SIGN(l_quantity - 25) AS DOUBLE)        AS qty_sign
    FROM lineitem
    """,
    category="function",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/abs/ceil/floor/pow/ln/log10/mod/sign."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_2dp"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        (F.col("l_linenumber") % 3).cast("bigint").alias("line_mod3"),
        F.signum(F.col("l_quantity") - 25).cast("double").alias("qty_sign"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT doc_id,
           CAST(LEN(string_split(text, ' ')) AS BIGINT)          AS n_tokens,
           LIST_CONTAINS(string_split(text, ' '), 'spark')       AS has_spark,
           ARRAY_TO_STRING(LIST_SLICE(LIST_SORT(string_split(text, ' ')), 1, 3), ',')
                                                                 AS first3_sorted,
           string_split(text, ' ')[1]                            AS first_token,
           CAST(LEN(LIST_DISTINCT(string_split(text, ' '))) AS BIGINT) AS n_distinct
    FROM documents
    """,
    category="function",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: split, size, contains, sort+slice, index, distinct."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        # serialized with array_join: raw array columns are not hashable in
        # the driver's pandas-based canonicalizer (round-1 CORRECTNESS fail)
        F.array_join(F.slice(F.sort_array(toks), 1, 3), ",").alias("first3_sorted"),
        F.element_at(toks, 1).alias("first_token"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
    )


@register(
    "fn_array_dot",
    oracle="""
    SELECT vec_id,
           ROUND(LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])), 6) AS self_dot,
           ROUND(LIST_AGGREGATE(CAST(embedding AS DOUBLE[]), 'sum'), 6) AS elem_sum
    FROM embeddings WHERE embedding IS NOT NULL
    """,
    category="function",
)
def fn_array_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array math: zip_with + aggregate as a dot product.

    The float32 elements are cast to double BEFORE arithmetic on both
    engines so the products are bit-identical (SURVEY §7).
    """
    e = load_embeddings(spark, sf_dir)
    vec = F.expr("transform(embedding, x -> cast(x AS double))")
    dot = F.expr(
        "aggregate(zip_with(transform(embedding, x -> cast(x AS double)),"
        "                   transform(embedding, x -> cast(x AS double)),"
        "                   (a, b) -> a * b), 0D, (acc, v) -> acc + v)"
    )
    return e.select(
        "vec_id",
        F.round(dot, 6).alias("self_dot"),
        F.round(F.expr("aggregate(transform(embedding, x -> cast(x AS double)),"
                       " 0D, (acc, v) -> acc + v)"), 6).alias("elem_sum"),
    )


@register(
    "fn_json",
    oracle=f"""
    SELECT event_id,
           CASE WHEN JSON_VALID(props)
                THEN CAST(props->>'$.k' AS BIGINT) END AS k_long,
           CASE WHEN JSON_VALID(props) THEN props->>'$.k' END AS k_str,
           CASE WHEN JSON_VALID(props)
                THEN props->>'$.missing' END      AS missing_path,
           COALESCE(CAST(JSON_VALID(props) AS BOOLEAN), FALSE) AS is_valid
    FROM {EVENTS_REL} e
    """,
    category="function",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: from_json, get_json_object, missing paths, validity.

    `is_valid` is derived the same way on both engines (parse succeeds
    and input is non-NULL => true; malformed or NULL => false) —
    PERMISSIVE `from_json(...).isNotNull()` is NOT equivalent to
    JSON_VALID (it yields a null-fielded struct for malformed input).
    Caveat shared by both sides: a bare JSON `null` literal counts as
    valid in DuckDB but parses to NULL in Spark's get_json_object; the
    props corpus contains objects only.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k LONG").getField("k").alias("k_long"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.missing").alias("missing_path"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@register(
    "fn_hash",
    oracle=f"""
    SELECT doc_id,
           MD5(text)                 AS text_md5,
           SHA256(text)              AS text_sha256,
           -- NULL-distinct length-prefixed field encoding (ND_FIELD):
           -- NULL -> 'N', value -> 'V'||byte_len||':'||value.  Keeps
           -- NULL distinct from '' AND makes the two-field key
           -- prefix-free, so no pair of distinguishable rows can
           -- collide (CONCAT_WS's NULL-skipping and plain COALESCE('')
           -- both merge distinguishable rows).
           MD5(CONCAT({ND_FIELD_SQL.format(col='source')}, ':',
                      {ND_FIELD_SQL.format(col='text')}))
             AS salted_md5
    FROM documents
    """,
    category="function",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family: md5 / sha2-256 hex digests — the dedup-key and
    cell-value-verification primitive (reference workflow A7, SURVEY §2A).
    Both engines emit lowercase hex over UTF-8 bytes.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        # ND_FIELD encoding (sql_helpers): NULL stays distinct from ''
        # and the length prefix keeps field boundaries unambiguous
        F.md5(
            F.concat(
                nd_field_col("source"),
                F.lit(":"),
                nd_field_col("text"),
            )
        ).alias("salted_md5"),
    )


@register(
    "multimodal_bytes",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
           TO_BASE64(ENCODE(SUBSTR(text, 1, 24)))     AS head_b64,
           MD5(text)                                  AS content_digest
    FROM documents
    """,
    category="function",
)
def multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column class (SURVEY §1.1): the engine's carrier for
    multimodal payloads (image/audio/video bytes) is a plain
    `BinaryType` column + typed metadata. Exercised here by encoding
    text -> bytes, measuring, and base64-ing — the same plumbing a
    decoded-image column uses (see llm/multimodal.py for the mapInPandas
    side).
    """
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.length(blob).cast("bigint").alias("n_bytes"),
        F.base64(F.encode(F.substring("text", 1, 24), "UTF-8")).alias("head_b64"),
        F.md5("text").alias("content_digest"),
    )


@register(
    "fn_variant",
    oracle=f"""
    SELECT event_id,
           CASE WHEN JSON_VALID(props)
                THEN CAST(props->>'$.k' AS BIGINT) END     AS k_long,
           CASE WHEN JSON_VALID(props)
                THEN CAST(props->>'$.k' AS BIGINT) * 2 END AS k_doubled,
           CASE WHEN JSON_VALID(props)
                THEN CAST(props->>'$.missing' AS BIGINT) END
             AS missing_typed
    FROM {EVENTS_REL} e
    """,
    category="function",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT: parse the JSON blob ONCE into the binary
    variant encoding, then do typed `variant_get` accesses.

    At 100 TB this replaces per-access `get_json_object` re-parses —
    each string access re-runs Jackson over the blob, while variant
    parses once and every subsequent path access is an O(log fields)
    binary lookup; with Parquet variant shredding the scan itself
    prunes to the accessed paths. `try_variant_get` on a missing path
    yields typed NULL (the total version of a cast failure). DuckDB has
    no variant type; the oracle states the SEMANTICS via json
    extraction + cast, which the binary encoding must agree with.
    """
    ev = load_table(spark, sf_dir, "events")
    # try_parse_json: malformed/empty props become a NULL variant (every
    # variant_get on it yields NULL), mirroring the oracle's JSON_VALID
    # guard instead of FAILFAST-killing the job on one bad record.
    v = F.try_parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_long"),
        (F.variant_get(v, "$.k", "bigint") * 2).alias("k_doubled"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_typed"),
    )


_MAP_HOT_MIN = 3

_MAP_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(LEN(LIST_DISTINCT(toks)) AS BIGINT) AS n_keys,
       CAST(LEN(list_filter(LIST_DISTINCT(toks),
                x -> len(list_filter(toks, y -> y = x)) >= {_MAP_HOT_MIN}))
            AS BIGINT) AS n_hot,
       -- NULL text keeps its row with NULL map outputs (matching the
       -- Spark side); the '' fallback is only for real no-hot-token docs
       CASE WHEN toks IS NULL THEN NULL
            ELSE COALESCE(ARRAY_TO_STRING(
         list_transform(
           list_sort(list_filter(LIST_DISTINCT(toks),
                     x -> len(list_filter(toks, y -> y = x)) >= {_MAP_HOT_MIN})),
           x -> x || ':' || CAST(len(list_filter(toks, y -> y = x)) AS VARCHAR)),
         ','), '') END AS hot_serialized
FROM t
"""


@register("fn_map", oracle=_MAP_ORACLE, category="function")
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType family: build a token→count map per document with
    `map_from_entries`, prune it with `map_filter`, read it with
    `map_entries` — the wide-row / dynamic-qualifier access pattern
    (the reference's HBase rows are maps of qualifier→cell; SURVEY
    §1.1 maps that to MapType columns).

    Map iteration order is UNDEFINED in Spark, so any serialized
    output must sort `map_entries` first (the same determinism rule as
    `collect_list`).  DuckDB has no MapType twin for this shape; the
    oracle states identical semantics via list functions.  Entirely
    higher-order JVM codegen — narrow map, zero shuffles.
    """
    d = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    m = d.withColumn(
        "counts",
        F.expr(
            "map_from_entries(transform(array_distinct(toks),"
            " x -> struct(x AS key,"
            "             size(filter(toks, y -> y = x)) AS value)))"
        ),
    ).withColumn(
        "hot", F.expr(f"map_filter(counts, (k, v) -> v >= {_MAP_HOT_MIN})")
    )
    return m.select(
        "doc_id",
        F.size("counts").cast("bigint").alias("n_keys"),
        F.size("hot").cast("bigint").alias("n_hot"),
        F.array_join(
            F.expr(
                "transform(array_sort(map_entries(hot)),"
                " e -> concat(e.key, ':', cast(e.value AS string)))"
            ),
            ",",
        ).alias("hot_serialized"),
    )


_TRY_ORACLE = f"""
SELECT event_id,
       ROUND(value / NULLIF(CAST(user_id % 5 AS DOUBLE), 0.0), 6)
         AS safe_ratio,
       TRY_CAST(CASE WHEN JSON_VALID(props) THEN props->>'$.k' END
                AS BIGINT) AS k_typed,
       TRY_CAST(event_type AS BIGINT) AS bad_cast,
       (CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END
        + CASE WHEN TRY_CAST(event_type AS BIGINT) IS NULL THEN 1 ELSE 0 END)
         AS n_nulled
FROM {EVENTS_REL} e
"""


@register("fn_try", oracle=_TRY_ORACLE, category="function")
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic/casts: `try_divide` / `try_cast` turn
    divide-by-zero and malformed casts into typed NULLs instead of
    failed jobs.

    The scale rationale: under ANSI mode one bad row kills a 10-hour
    job at hour 9; the `try_*` family quarantines bad rows as NULLs
    you can count and route to a dead-letter sink (`n_nulled` is that
    audit column).  Division semantics pinned cross-engine via
    NULLIF-denominator in the oracle (DuckDB's `/` is always
    float-safe; Spark's ANSI `/` is not).
    """
    ev = load_table(spark, sf_dir, "events")
    denom = (F.col("user_id") % 5).cast("double")
    bad = F.expr("try_cast(event_type AS bigint)")
    return ev.select(
        "event_id",
        F.round(F.expr("try_divide(value, cast(user_id % 5 AS double))"), 6)
        .alias("safe_ratio"),
        F.expr("try_cast(get_json_object(props, '$.k') AS bigint)")
        .alias("k_typed"),
        bad.alias("bad_cast"),
        (
            F.when(denom == 0, 1).otherwise(0)
            + F.when(bad.isNull(), 1).otherwise(0)
        ).cast("bigint").alias("n_nulled"),
    )


_BITWISE_ORACLE = f"""
SELECT event_id,
       event_id & 255 AS low_byte,
       event_id | 4096 AS with_flag,
       xor(event_id, user_id) AS key_mix,
       ~event_id AS inverted,
       (event_id & 255) << 8 AS shifted_up,
       event_id >> 4 AS shifted_down,
       CAST(bit_count(user_id) AS BIGINT) AS key_popcount
FROM {EVENTS_REL} e
"""


@register("fn_bitwise", oracle=_BITWISE_ORACLE, category="function")
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family: AND/OR/XOR/NOT, shifts, popcount —
    the rowkey-engineering toolkit (HBase keys pack shard, salt and
    timestamp into int64 bit fields; SURVEY §1.1).

    All eight expressions are JVM-codegen'd single-row ops (narrow
    map, zero shuffles); `bit_count` is the same popcount the SimHash
    Hamming verify uses on 100 TB fingerprints.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("key_mix"),
        F.bitwise_not(F.col("event_id")).alias("inverted"),
        F.shiftleft(F.col("event_id").bitwiseAND(F.lit(255)), 8).alias(
            "shifted_up"
        ),
        F.shiftright(F.col("event_id"), 4).alias("shifted_down"),
        F.bit_count("user_id").cast("bigint").alias("key_popcount"),
    )


_URL_ORACLE = """
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/docs/'
           || CAST(doc_id AS VARCHAR) || '?lang=' || lang
           || '&n=' || CAST(n_chars AS VARCHAR) AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS q_lang,
       CAST(regexp_extract(url, '[?&]n=([^&#]*)', 1) AS BIGINT) AS q_n
FROM u
"""


@register("fn_url", oracle=_URL_ORACLE, category="function")
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (`parse_url`): host / path / individual query
    parameters — the per-document provenance parsing a web-crawl
    corpus runs on every record (dedup by canonical host, domain
    blocklists, per-site mixture weights all start here).

    URLs are synthesized deterministically from the corpus columns
    (the testdata has no URL column), then parsed with Spark's native
    `parse_url` — JVM-side, zero shuffles, codegen — while the oracle
    re-derives the same fields with anchored regexes: two independent
    parser implementations must agree on every row. QUERY extraction
    uses the keyed form `parse_url(url, 'QUERY', 'lang')`, not string
    slicing.
    """
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias(
            "q_lang"
        ),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("n"))
        .cast("bigint")
        .alias("q_n"),
    )


_HAV_LAT0, _HAV_LON0 = 40.7128, -74.0060  # reference point (NYC)
_HAV_R_KM = 6371.0088  # IUGG mean Earth radius


@register(
    "fn_geo_haversine",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey % 179 AS DOUBLE) - 89.0 + 0.25 AS lat,
             CAST((c_custkey * 7 + c_nationkey) % 359 AS DOUBLE)
               - 179.0 + 0.5 AS lon
      FROM customer
    )
    SELECT c_custkey, lat, lon,
           ROUND(2 * {_HAV_R_KM} * ASIN(SQRT(
             POW(SIN(RADIANS(lat - {_HAV_LAT0}) / 2), 2)
             + COS(RADIANS({_HAV_LAT0})) * COS(RADIANS(lat))
               * POW(SIN(RADIANS(lon - {_HAV_LON0}) / 2), 2)
           )), 4) AS dist_km
    FROM pts
    """,
    category="function",
)
def fn_geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle (haversine) distance from every synthesized point
    to a fixed reference — the geo primitive behind geofencing,
    nearest-warehouse assignment, and location dedup. Coordinates are
    derived deterministically from keys (the testdata has no geo
    columns).

    Entirely JVM trig in one narrow projection (zero shuffles); the
    oracle recomputes the identical formula, so radian conversion,
    argument order, and the asin/sqrt branch all have to agree to 4
    digits. For a radius JOIN at scale, this distance becomes the
    residual predicate on a grid-blocked equi join exactly like
    `join_spatial_grid` — never a cross join with a distance filter.
    """
    c = load_table(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 179).cast("double") - 89.0 + 0.25
    lon = (
        (F.col("c_custkey") * 7 + F.col("c_nationkey")) % 359
    ).cast("double") - 179.0 + 0.5
    pts = c.select("c_custkey", lat.alias("lat"), lon.alias("lon"))
    dlat = F.radians(F.col("lat") - F.lit(_HAV_LAT0)) / 2
    dlon = F.radians(F.col("lon") - F.lit(_HAV_LON0)) / 2
    a = (
        F.pow(F.sin(dlat), 2)
        + F.cos(F.radians(F.lit(_HAV_LAT0)))
        * F.cos(F.radians(F.col("lat")))
        * F.pow(F.sin(dlon), 2)
    )
    return pts.select(
        "c_custkey",
        "lat",
        "lon",
        F.round(2 * _HAV_R_KM * F.asin(F.sqrt(a)), 4).alias("dist_km"),
    )


# --- IPv4 / CIDR arithmetic -----------------------------------------
# The log-analytics address suite: synthesize a deterministic IPv4 per
# event (md5 of event_id -> uint32), format it dotted-quad, classify
# RFC-1918 private ranges, and test membership in a fixed /20 via mask
# arithmetic — all integer bit math, no string parsing in the hot
# path.  A real pipeline stores the uint32 and formats at the edge.
_CIDR_NET = "10.32.0.0"
_CIDR_BITS = 12
_CIDR_BASE = (10 << 24) | (32 << 16)               # 10.32.0.0 as uint32
_CIDR_MASK = ((1 << 32) - 1) ^ ((1 << (32 - _CIDR_BITS)) - 1)

# Bias ~1/4 of addresses into 10.0.0.0/8 so the private/cidr classes
# are populated: when event_id % 4 = 0 force the top octet to 10.
_IP_EXPR = (
    "CASE WHEN event_id % 4 = 0 "
    f" THEN (10 * 16777216) + (CAST(('0x' || SUBSTR(MD5('ip|' || CAST(event_id AS STRING)), 1, 8)) AS BIGINT) % 16777216) "
    f" ELSE CAST(('0x' || SUBSTR(MD5('ip|' || CAST(event_id AS STRING)), 1, 8)) AS BIGINT) END"
)

_IP_ORACLE = f"""
WITH ip AS (
  SELECT event_id, {_IP_EXPR} AS addr FROM events
),
c AS (
  SELECT event_id, addr,
         CAST(addr // 16777216 AS STRING) || '.'
         || CAST((addr // 65536) % 256 AS STRING) || '.'
         || CAST((addr // 256) % 256 AS STRING) || '.'
         || CAST(addr % 256 AS STRING) AS dotted,
         (addr // 16777216 = 10
          OR (addr // 16777216 = 172 AND (addr // 65536) % 256 BETWEEN 16 AND 31)
          OR (addr // 16777216 = 192 AND (addr // 65536) % 256 = 168))
           AS is_private,
         ((addr // {1 << (32 - _CIDR_BITS)}) * {1 << (32 - _CIDR_BITS)})
           = {_CIDR_BASE} AS in_cidr
  FROM ip
)
SELECT is_private, in_cidr,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(addr) AS BIGINT) AS min_addr,
       CAST(MAX(addr) AS BIGINT) AS max_addr,
       MIN(dotted) AS min_dotted
FROM c
GROUP BY is_private, in_cidr
"""


@register("fn_ip_cidr", oracle=_IP_ORACLE, category="function")
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4/CIDR suite: uint32 address synthesis, dotted-quad
    formatting, RFC-1918 private classification, and {_CIDR_NET}/{_CIDR_BITS}
    membership — integer div/mod bit math on both engines (DuckDB has
    no >> on the hashed BIGINT path, so the mask is `div` by 2^(32-n)`,
    which Spark reproduces exactly).

    Narrow codegen'd projection + one map-side-combined groupBy over
    4 boolean-pair groups; at 100 TB the classification is free inside
    the scan stage and the shuffle carries 4 rows per map partition.
    """
    e = load_table(spark, sf_dir, "events").select("event_id")
    ip = e.withColumn(
        "addr",
        F.expr(
            "CASE WHEN event_id % 4 = 0 "
            " THEN (10 * 16777216) + (conv(substr(md5(concat('ip|', CAST(event_id AS STRING))), 1, 8), 16, 10) % 16777216) "
            " ELSE conv(substr(md5(concat('ip|', CAST(event_id AS STRING))), 1, 8), 16, 10) END"
        ).cast("bigint"),
    )
    octet = lambda d, m: ((F.col("addr") / d).cast("bigint") % m)  # noqa: E731
    step = 1 << (32 - _CIDR_BITS)
    c = ip.select(
        "event_id",
        "addr",
        F.concat_ws(
            ".",
            (F.col("addr") / 16777216).cast("bigint").cast("string"),
            octet(65536, 256).cast("string"),
            octet(256, 256).cast("string"),
            (F.col("addr") % 256).cast("string"),
        ).alias("dotted"),
        (
            ((F.col("addr") / 16777216).cast("bigint") == 10)
            | (
                ((F.col("addr") / 16777216).cast("bigint") == 172)
                & octet(65536, 256).between(16, 31)
            )
            | (
                ((F.col("addr") / 16777216).cast("bigint") == 192)
                & (octet(65536, 256) == 168)
            )
        ).alias("is_private"),
        (
            ((F.col("addr") / step).cast("bigint") * step) == _CIDR_BASE
        ).alias("in_cidr"),
    )
    return c.groupBy("is_private", "in_cidr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("addr").cast("bigint").alias("min_addr"),
        F.max("addr").cast("bigint").alias("max_addr"),
        F.min("dotted").alias("min_dotted"),
    )


# --- user-agent parsing ---------------------------------------------
# Deterministic UA synthesis: five real-world template shapes
# including the classic pitfalls (Chrome UAs contain "Safari", bot
# UAs contain a URL), versions varying with event_id.
_UA_BUILD = """
  CASE event_id % 5
    WHEN 0 THEN 'Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/'
                || CAST(80 + event_id % 30 AS STRING) || '.0.0.0 Safari/537.36'
    WHEN 1 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/'
                || CAST(14 + event_id % 4 AS STRING) || '.0 Safari/605.1.15'
    WHEN 2 THEN 'Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Firefox/'
                || CAST(100 + event_id % 20 AS STRING) || '.0'
    WHEN 3 THEN 'Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X)'
                || ' AppleWebKit/605.1.15 Mobile/15E148 Safari/604.1'
    ELSE 'Googlebot/2.1 (+http://www.google.com/bot.html)'
  END
"""

_UA_ORACLE = f"""
WITH ua AS (SELECT event_id, {_UA_BUILD} AS s FROM events),
p AS (
  SELECT event_id, s,
         CASE
           WHEN LOWER(s) LIKE '%bot%' THEN 'bot'
           WHEN s LIKE '%Chrome/%' THEN 'chrome'
           WHEN s LIKE '%Firefox/%' THEN 'firefox'
           WHEN s LIKE '%Safari%' THEN 'safari'
           ELSE 'other'
         END AS browser,
         CASE
           WHEN s LIKE '%iPhone%' THEN 'ios'
           WHEN s LIKE '%Mac OS X%' THEN 'macos'
           WHEN s LIKE '%Windows%' THEN 'windows'
           WHEN s LIKE '%Linux%' THEN 'linux'
           ELSE 'other'
         END AS os,
         LOWER(s) LIKE '%bot%' AS is_bot,
         TRY_CAST(regexp_extract(s, '(Chrome|Firefox|Version)/([0-9]+)', 2)
                  AS BIGINT) AS major
  FROM ua
)
SELECT browser, os, is_bot,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(major) AS BIGINT) AS min_major,
       CAST(MAX(major) AS BIGINT) AS max_major
FROM p GROUP BY browser, os, is_bot
"""


@register("fn_useragent_parse", oracle=_UA_ORACLE, category="function")
def fn_useragent_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-agent parsing: browser family (with the Chrome-before-
    Safari precedence rule — every Chrome UA contains 'Safari'), OS
    family (iPhone before Mac OS X — iOS UAs claim 'like Mac OS X'),
    bot detection, and major-version extraction.  Synthesis and both
    parsers are deterministic; DuckDB re-parses with its own regex/
    LIKE engine, so precedence-rule or regex-semantics drift fails
    the hash.

    Narrow codegen'd string ops + one map-side-combined aggregate
    over a handful of (browser, os) groups — classification is free
    inside the scan stage at any scale.
    """
    e = load_table(spark, sf_dir, "events").select("event_id")
    ua = e.withColumn("s", F.expr(_UA_BUILD))
    sl = F.lower(F.col("s"))
    p = ua.select(
        F.when(sl.contains("bot"), "bot")
        .when(F.col("s").contains("Chrome/"), "chrome")
        .when(F.col("s").contains("Firefox/"), "firefox")
        .when(F.col("s").contains("Safari"), "safari")
        .otherwise("other")
        .alias("browser"),
        F.when(F.col("s").contains("iPhone"), "ios")
        .when(F.col("s").contains("Mac OS X"), "macos")
        .when(F.col("s").contains("Windows"), "windows")
        .when(F.col("s").contains("Linux"), "linux")
        .otherwise("other")
        .alias("os"),
        sl.contains("bot").alias("is_bot"),
        F.regexp_extract("s", r"(Chrome|Firefox|Version)/([0-9]+)", 2)
        .try_cast("bigint")
        .alias("major"),
    )
    return p.groupBy("browser", "os", "is_bot").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("major").cast("bigint").alias("min_major"),
        F.max("major").cast("bigint").alias("max_major"),
    )


_B64_ORACLE = """
SELECT doc_id,
       to_base64(ENCODE(text)) AS b64,
       LOWER(hex(ENCODE(SUBSTR(text, 1, 16)))) AS hex16,
       -- DECODE, not CAST: casting a BLOB to VARCHAR escapes non-ASCII
       -- bytes (\xC3...) instead of decoding UTF-8, silently failing
       -- the round-trip on any non-ASCII document.
       MD5(DECODE(from_base64(to_base64(ENCODE(text))))) AS roundtrip_md5,
       MD5(text) = MD5(DECODE(from_base64(to_base64(ENCODE(text)))))
         AS roundtrip_ok,
       CAST(LENGTH(to_base64(ENCODE(text))) AS BIGINT) AS b64_len
FROM documents
"""


@register("fn_binary_codec", oracle=_B64_ORACLE, category="function")
def fn_binary_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec suite: base64 and hex encode/decode round-trips
    over document payload bytes — the ser/de layer a bytes-columned
    pipeline leans on (HBase values, Parquet BINARY, wire formats).
    Both engines implement RFC-4648 base64 and plain hex
    independently (Spark's MIME 76-char chunking is normalized away);
    any padding or alphabet disagreement fails the hash, and
    `roundtrip_ok` must be TRUE row-for-row.

    Narrow codegen'd projection, zero shuffles; at scale this is
    free inside the scan stage.
    """
    d = load_table(spark, sf_dir, "documents")
    raw = F.col("text").cast("binary")
    # Spark's base64 is MIME-chunked (CRLF every 76 chars); canonical
    # RFC-4648 output strips the line breaks (DuckDB emits none).
    b64 = F.regexp_replace(F.base64(raw), r"[\r\n]", "")
    return d.select(
        "doc_id",
        b64.alias("b64"),
        F.lower(F.hex(F.substring("text", 1, 16).cast("binary"))).alias("hex16"),
        F.md5(F.unbase64(b64).cast("string")).alias("roundtrip_md5"),
        (F.md5("text") == F.md5(F.unbase64(b64).cast("string"))).alias(
            "roundtrip_ok"
        ),
        F.length(b64).cast("bigint").alias("b64_len"),
    )


# --- point-in-polygon -----------------------------------------------
# Convex test polygon (a hexagon on a 0.001-grid so every cross
# product is exactly representable); vertices counter-clockwise.
_PIP_POLY = (
    (0.0, -0.06),
    (0.05, -0.03),
    (0.05, 0.03),
    (0.0, 0.06),
    (-0.05, 0.03),
    (-0.05, -0.03),
)

_PIP_EDGE_SQL = " AND ".join(
    # CCW convex polygon: inside iff every cross product
    # (v2-v1) x (p-v1) >= 0
    f"(({x2} - {x1}) * (y - {y1}) - ({y2} - {y1}) * (x - {x1})) >= 0"
    for (x1, y1), (x2, y2) in zip(_PIP_POLY, _PIP_POLY[1:] + _PIP_POLY[:1])
)

_PIP_ORACLE = f"""
WITH p AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings WHERE embedding IS NOT NULL
)
SELECT CAST(SUM(CASE WHEN {_PIP_EDGE_SQL} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_inside,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MIN(CASE WHEN {_PIP_EDGE_SQL} THEN vec_id END) AS BIGINT)
         AS first_inside
FROM p
"""


@register("fn_geo_point_in_polygon", oracle=_PIP_ORACLE, category="function")
def fn_geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-convex-polygon containment via the half-plane
    (cross-product sign) test: a point is inside a CCW convex polygon
    iff it sits left-of-or-on every directed edge.  Polygon vertices
    live on a coarse grid so every cross product is exactly
    representable in doubles — both engines evaluate identical signs,
    no epsilon needed.  The geo-filter primitive behind geofencing
    and region assignment (the embeddings' first two dims stand in
    for coordinates, as in `join_spatial_grid`).

    Narrow codegen'd arithmetic + one single-row reduce; at 100 TB a
    polygon JOIN grid-blocks by polygon bounding box first (the
    `join_spatial_grid` pattern), then runs this residual test.
    """
    emb = load_embeddings(spark, sf_dir)
    p = emb.select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    )
    inside = F.expr(_PIP_EDGE_SQL)
    return p.agg(
        F.sum(F.when(inside, 1).otherwise(0)).cast("bigint").alias("n_inside"),
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.min(F.when(inside, F.col("vec_id"))).cast("bigint").alias(
            "first_inside"
        ),
    )


_TZ_ORACLE = f"""
WITH s AS (
  SELECT event_id,
         ts + (event_id % 180) * INTERVAL 1 DAY AS u
  FROM {EVENTS_REL} e
),
z AS (
  SELECT event_id, u,
         timezone('America/New_York', timezone('UTC', u)) AS ny,
         timezone('Asia/Tokyo', timezone('UTC', u)) AS tokyo,
         timezone('Asia/Kolkata', timezone('UTC', u)) AS kolkata
  FROM s
)
SELECT event_id,
       u AS utc_ts,
       ny AS ny_local,
       tokyo AS tokyo_local,
       kolkata AS kolkata_local,
       CAST((epoch_us(ny) - epoch_us(u)) / 60000000 AS BIGINT)
         AS ny_offset_min,
       CAST((epoch_us(ny) - epoch_us(u)) / 60000000 AS BIGINT) = -240
         AS ny_is_dst,
       CAST((epoch_us(kolkata) - epoch_us(u)) / 60000000 AS BIGINT)
         AS kolkata_offset_min
FROM z
"""


@register("fn_timezone", oracle=_TZ_ORACLE, category="function")
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IANA timezone conversion suite: UTC instants rendered as
    New York / Tokyo / Kolkata wall-clock time, with the realized
    UTC-offset (minutes) and a DST verdict — exercising a DST zone, a
    fixed-offset zone, and a half-hour-offset zone against DuckDB's
    independent tz database.  Event timestamps (one January) are
    deterministically spread over 180 days so both sides of the March
    DST transition genuinely occur.

    Offsets are computed from integer-µs epoch differences of the
    naive local rendering — never from zone-rule lookup tables — so
    the two engines must agree on the actual conversion, not on
    metadata.  (Oracle side uses the session-independent
    `timezone(zone, timezone('UTC', ts))` double-hop; relying on the
    connection's TimeZone setting would make the check
    environment-dependent.)  Narrow, zero shuffles, codegen.
    """
    ev = load_table(spark, sf_dir, "events")
    s = ev.select(
        "event_id",
        F.expr("timestampadd(DAY, int(event_id % 180), ts)").alias("u"),
    )
    def off(c):
        return ((F.unix_micros(c) - F.unix_micros(F.col("u"))) / 60000000).cast(
            "bigint"
        )

    ny = F.from_utc_timestamp("u", "America/New_York")
    return s.select(
        "event_id",
        F.col("u").alias("utc_ts"),
        ny.alias("ny_local"),
        F.from_utc_timestamp("u", "Asia/Tokyo").alias("tokyo_local"),
        F.from_utc_timestamp("u", "Asia/Kolkata").alias("kolkata_local"),
        off(ny).alias("ny_offset_min"),
        (off(ny) == -240).alias("ny_is_dst"),
        off(F.from_utc_timestamp("u", "Asia/Kolkata")).alias(
            "kolkata_offset_min"
        ),
    )


_BIZDAY_ORACLE = """
WITH d AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0,
         isodow(CAST(o_orderdate AS DATE)) - 1 AS wd
  FROM orders
),
n AS (
  SELECT o_orderkey, d0, wd,
         d0 + CASE WHEN wd = 5 THEN 2 WHEN wd = 6 THEN 1 ELSE 0 END
           AS next_bd,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM UNNEST(generate_series(0, 29)) t(k)
          WHERE isodow(d0 + CAST(k AS INTEGER)) - 1 < 5) AS bd_30
  FROM d
)
SELECT o_orderkey, d0 AS order_date,
       CAST(wd AS BIGINT) AS weekday,
       wd >= 5 AS is_weekend,
       next_bd AS next_business_day,
       bd_30 AS business_days_30
FROM n
"""


@register("fn_business_days", oracle=_BIZDAY_ORACLE, category="function")
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day calendar arithmetic per order: weekday index
    (Monday=0 — Spark `weekday()` and DuckDB `isodow()-1` agree on
    this convention; raw `dayofweek` does NOT and is avoided), weekend
    flag, next-business-day roll-forward, and the business-day count
    in the next 30 calendar days (SLA / settlement-date math).

    The 30-day count enumerates days with a higher-order filter over
    `sequence(0, 29)` — 30 integer ops per row inside codegen, the
    same answer as closed-form week arithmetic without its edge-case
    table.  Entirely narrow, zero shuffles.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("d0")
    )
    wd = F.weekday("d0")
    return o.select(
        "o_orderkey",
        F.col("d0").alias("order_date"),
        wd.cast("bigint").alias("weekday"),
        (wd >= 5).alias("is_weekend"),
        F.when(wd == 5, F.date_add("d0", 2))
        .when(wd == 6, F.date_add("d0", 1))
        .otherwise(F.col("d0"))
        .alias("next_business_day"),
        F.expr(
            "cast(size(filter(sequence(0, 29),"
            " k -> weekday(date_add(d0, k)) < 5)) AS bigint)"
        ).alias("business_days_30"),
    )


_SOUNDEX_ORACLE = """
WITH t AS (
  -- strip BEFORE uppercasing: UPPER('ß') is 'SS' in Spark (full
  -- Unicode case mapping) but 'ß' in DuckDB, so uppercase-then-strip
  -- diverges on non-ASCII names; ASCII-strip-first is engine-neutral.
  SELECT p_partkey,
         UPPER(regexp_replace(p_name, '[^A-Za-z]', '', 'g')) AS cleaned
  FROM part
),
prep AS (
  SELECT p_partkey, cleaned,
         list_transform(string_split(cleaned, ''), c ->
           translate(c, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                        '01230127022455012623017202')) AS codes,
         substr(cleaned, 1, 1) AS f
  FROM t
),
folded AS (
  SELECT p_partkey, cleaned,
         list_reduce(
           list_prepend(f || codes[1], codes[2:]),
           (acc, x) -> CASE
             WHEN x = '7' THEN acc
             WHEN x = '0' THEN substr(acc, 1, length(acc) - 1) || '0'
             WHEN substr(acc, length(acc), 1) = x THEN acc
             ELSE substr(acc, 1, length(acc) - 1) || x || x
           END) AS r
  FROM prep
),
coded AS (
  SELECT p_partkey, cleaned,
         substr(substr(r, 1, length(r) - 1) || '000', 1, 4) AS sdx
  FROM folded
)
SELECT p_partkey, cleaned, sdx,
       CAST(COUNT(*) OVER (PARTITION BY sdx) AS BIGINT) AS block_size
FROM coded
"""


@register("fn_soundex", oracle=_SOUNDEX_ORACLE, category="function")
def fn_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex phonetic encoding of part names plus the resulting
    entity-resolution block sizes — the classic cheap blocking key for
    fuzzy name matching (`join_fuzzy_levenshtein` verifies INSIDE such
    blocks; this op builds them).

    The check is a genuine dual implementation: Spark's built-in
    `soundex()` (JVM, H/W-transparent American Soundex — verified on
    the canonical ASHCRAFT→A261 / PFISTER→P236 / TYMCZAK→T522 edge
    cases) against a from-scratch DuckDB translate+list_reduce fold of
    the same published algorithm.  Names are pre-cleaned to pure
    uppercase letters so both engines start from identical input (the
    engines' non-letter handling is implementation-defined and NOT
    part of the algorithm).

    Plan: encoding is narrow codegen; the block-size window runs on
    the |soundex-code| ≤ 26·7³ bounded key space after a single
    exchange.
    """
    t = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        # strip-then-upper (not upper-then-strip): Spark's UPPER('ß')
        # is 'SS' while DuckDB's is 'ß' — see the oracle CTE comment.
        F.upper(F.regexp_replace("p_name", "[^A-Za-z]", "")).alias("cleaned"),
    )
    coded = t.select("p_partkey", "cleaned", F.soundex("cleaned").alias("sdx"))
    return coded.withColumn(
        "block_size",
        F.count(F.lit(1)).over(Window.partitionBy("sdx")).cast("bigint"),
    )


_UUID_ORACLE = """
WITH h AS (
  SELECT o_orderkey,
         MD5('s3u:order:' || CAST(o_orderkey AS STRING)) AS hx
  FROM orders
)
SELECT o_orderkey,
       SUBSTR(hx, 1, 8) || '-' || SUBSTR(hx, 9, 4) || '-'
       || '3' || SUBSTR(hx, 14, 3) || '-'
       || CASE CAST(('0x' || SUBSTR(hx, 17, 1)) AS BIGINT) % 4
            WHEN 0 THEN '8' WHEN 1 THEN '9' WHEN 2 THEN 'a' ELSE 'b' END
       || SUBSTR(hx, 18, 3) || '-' || SUBSTR(hx, 21, 12) AS uuid_v3,
       '3' AS version_nibble,
       SUBSTR(hx, 1, 8) AS hash_prefix
FROM h
"""


@register("fn_uuid_deterministic", oracle=_UUID_ORACLE, category="function")
def fn_uuid_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic namespace UUIDs (RFC 4122 version 3 shape): the
    md5 of a namespace-qualified key formatted as 8-4-4-4-12 with the
    version nibble forced to 3 and the variant nibble folded into
    10xx — the content-stable surrogate key every warehouse needs
    where `uuid()` (random, re-run unstable) silently breaks joins
    between reloads.

    Pure string/bit arithmetic inside codegen; the variant nibble is
    derived with integer mod on the hex digit (identical on both
    engines), never bitwise ops on strings.  Zero shuffles.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.md5(
            F.concat(F.lit("s3u:order:"), F.col("o_orderkey").cast("string"))
        ).alias("hx"),
    )
    variant = (
        F.expr("cast(conv(substring(hx, 17, 1), 16, 10) AS bigint) % 4")
    )
    return o.select(
        "o_orderkey",
        F.concat(
            F.substring("hx", 1, 8),
            F.lit("-"),
            F.substring("hx", 9, 4),
            F.lit("-3"),
            F.substring("hx", 14, 3),
            F.lit("-"),
            F.when(variant == 0, "8")
            .when(variant == 1, "9")
            .when(variant == 2, "a")
            .otherwise("b"),
            F.substring("hx", 18, 3),
            F.lit("-"),
            F.substring("hx", 21, 12),
        ).alias("uuid_v3"),
        F.lit("3").alias("version_nibble"),
        F.substring("hx", 1, 8).alias("hash_prefix"),
    )


_REXALL_ORACLE = """
SELECT p_partkey,
       COALESCE(ARRAY_TO_STRING(regexp_extract_all(p_name, '[a-z]*o[a-z]*'),
                       ','), '') AS o_words,
       CAST(LEN(regexp_extract_all(p_name, '[a-z]*o[a-z]*')) AS BIGINT)
         AS n_o_words,
       COALESCE(ARRAY_TO_STRING(regexp_extract_all(p_name, '([a-z]+)i', 1),
                       ','), '') AS i_stems,
       CASE WHEN LEN(regexp_extract_all(p_name, '\\b[a-z]{5}\\b')) > 0
            THEN regexp_extract_all(p_name, '\\b[a-z]{5}\\b')[1]
            ELSE '' END AS first_five_letter
FROM part
"""


@register("fn_regex_extract_all", oracle=_REXALL_ORACLE, category="function")
def fn_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regex extraction (`regexp_extract_all`) — the log /
    freetext mining surface beyond single-match `fn_string`: all
    matches of a pattern, capture-group extraction across matches,
    match counting, and a first-match-with-default.  Patterns stay in
    the lookaround-free common subset both regex engines (Java util
    vs RE2-family) interpret identically, per `llm_pii_redact`.

    Narrow codegen, zero shuffles.
    """
    p = load_table(spark, sf_dir, "part")
    o_words = F.expr("regexp_extract_all(p_name, '[a-z]*o[a-z]*', 0)")
    five = F.expr("regexp_extract_all(p_name, '\\\\b[a-z]{5}\\\\b', 0)")
    return p.select(
        "p_partkey",
        F.array_join(o_words, ",").alias("o_words"),
        F.size(o_words).cast("bigint").alias("n_o_words"),
        F.array_join(
            F.expr("regexp_extract_all(p_name, '([a-z]+)i', 1)"), ","
        ).alias("i_stems"),
        F.when(F.size(five) > 0, F.element_at(five, 1))
        .otherwise("")
        .alias("first_five_letter"),
    )


_ARR2_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id,
       LIST_HAS_ANY(toks, ['spark', 'table', 'query']) AS mentions_engine,
       CAST(CASE WHEN toks IS NULL THEN NULL
                 ELSE COALESCE(LIST_POSITION(toks, 'data'), 0) END AS BIGINT)
         AS first_data_pos,
       ARRAY_TO_STRING(FLATTEN([toks[1:2], toks[-2:]]), ',')
         AS head_tail,
       ARRAY_TO_STRING(list_transform(generate_series(1, 3),
                       i -> toks[1]), ',') AS first_repeated,
       CAST(LEN(list_filter(generate_series(1, CAST(LEN(toks) AS INTEGER)),
                            i -> i % 2 = 1)) AS BIGINT) AS n_odd_positions
FROM t
"""


@register("fn_array_advanced", oracle=_ARR2_ORACLE, category="function")
def fn_array_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array-function family beyond `fn_array`: membership
    against a set (`arrays_overlap`), first-position lookup
    (`array_position`), nested flatten of head/tail slices,
    `array_repeat`, and a filtered index sequence — the
    array-manipulation surface feature pipelines lean on.  Negative
    slice indexing (`toks[-2:]`) maps to Spark's
    `slice(toks, -2, 2)`.  Narrow, zero shuffles, codegen.
    """
    d = load_table(spark, sf_dir, "documents").withColumn(
        "toks", F.split("text", " ")
    )
    return d.select(
        "doc_id",
        F.arrays_overlap(
            "toks", F.array(F.lit("spark"), F.lit("table"), F.lit("query"))
        ).alias("mentions_engine"),
        F.array_position("toks", "data").cast("bigint").alias(
            "first_data_pos"
        ),
        F.array_join(
            F.flatten(
                F.array(
                    F.slice("toks", 1, 2),
                    # DuckDB toks[-2:] CLAMPS on short arrays; Spark
                    # slice(-2, 2) returns [] — guard the <2 case
                    F.expr(
                        "CASE WHEN size(toks) >= 2"
                        " THEN slice(toks, -2, 2) ELSE toks END"
                    ),
                )
            ),
            ",",
        ).alias("head_tail"),
        # NULL toks (NULL text) pins first_repeated to NULL in both
        # engines; array_join alone would skip the NULL elements -> ''.
        F.when(
            F.col("toks").isNotNull(),
            F.array_join(F.array_repeat(F.element_at("toks", 1), 3), ","),
        ).alias("first_repeated"),
        F.expr(
            "cast(size(filter(sequence(1, size(toks)), i -> i % 2 = 1))"
            " AS bigint)"
        ).alias("n_odd_positions"),
    )


_CSV_CODEC_ORACLE = """
WITH enc AS (
  SELECT c_custkey,
         CAST(c_custkey AS STRING) || ',"' || c_name || ', Esq.",'
           || c_mktsegment AS line
  FROM customer
)
, pos AS (
  SELECT c_custkey, line,
         POSITION('"' IN line) AS q1,
         LENGTH(line) - POSITION('"' IN REVERSE(line)) + 1 AS q2
  FROM enc
)
SELECT c_custkey, line,
       SUBSTR(line, q1, q2 - q1 + 1) AS name_field,
       SUBSTR(line, q1 + 1, q2 - q1 - 1) AS name_unquoted,
       SUBSTR(line, q2 + 2) AS segment
FROM pos
"""


@register("fn_csv_codec", oracle=_CSV_CODEC_ORACLE, category="function")
def fn_csv_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV line round-trip as FUNCTIONS: render a quoted CSV line
    (embedded comma inside the quoted name field), then parse it back
    with `from_csv` — Spark's real CSV parser as a scalar function —
    while the oracle re-parses the identical line with quote-position
    arithmetic (two independent parser implementations, the `fn_url`
    discipline; RE2 has no lookahead, so no regex-split tricks).  `source_csv_permissive` covers the
    file-level ingest path; this is the in-row codec surface
    (message queues and log fields carry embedded CSV far more often
    than files do).

    Narrow, zero shuffles; `from_csv` runs inside codegen (Jackson-
    style parser, JVM-side).
    """
    c = load_table(spark, sf_dir, "customer")
    enc = c.select(
        "c_custkey",
        F.concat(
            F.col("c_custkey").cast("string"),
            F.lit(',"'),
            F.col("c_name"),
            F.lit(', Esq.",'),
            F.col("c_mktsegment"),
        ).alias("line"),
    )
    parsed = enc.withColumn(
        "p",
        F.from_csv(
            "line", "k STRING, name STRING, seg STRING"
        ),
    )
    return parsed.select(
        "c_custkey",
        "line",
        F.concat(F.lit('"'), F.col("p.name"), F.lit('"')).alias(
            "name_field"
        ),
        F.col("p.name").alias("name_unquoted"),
        F.col("p.seg").alias("segment"),
    )


_LUHN_ORACLE = """
WITH acct AS (
  SELECT o_orderkey,
         LPAD(CAST(o_orderkey * 7919 % 100000000000 AS STRING), 11, '0')
           AS body
  FROM orders
),
digits AS (
  SELECT o_orderkey, body,
         CAST(list_aggregate(
           list_transform(generate_series(1, 11), i ->
             CASE WHEN i % 2 = 1
                  THEN CASE WHEN 2 * CAST(SUBSTR(REVERSE(body), i, 1)
                                         AS INTEGER) > 9
                            THEN 2 * CAST(SUBSTR(REVERSE(body), i, 1)
                                          AS INTEGER) - 9
                            ELSE 2 * CAST(SUBSTR(REVERSE(body), i, 1)
                                          AS INTEGER) END
                  ELSE CAST(SUBSTR(REVERSE(body), i, 1) AS INTEGER) END),
           'sum') AS BIGINT) AS s
  FROM acct
)
SELECT o_orderkey, body,
       CAST((10 - s % 10) % 10 AS BIGINT) AS check_digit,
       body || CAST((10 - s % 10) % 10 AS STRING) AS account_number,
       (s + (10 - s % 10) % 10) % 10 = 0 AS luhn_valid
FROM digits
"""


@register("fn_luhn_checksum", oracle=_LUHN_ORACLE, category="function")
def fn_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn check-digit generation (ISO/IEC 7812 — card/IMEI/account
    validation): for a deterministic 11-digit account body, double
    every second digit from the RIGHT (subtract 9 past 9), sum, and
    derive the check digit that makes the total ≡ 0 (mod 10); the
    appended number must self-validate (`luhn_valid` is asserted TRUE
    row-for-row by the oracle, proving generator and validator agree).

    Pure integer digit transforms over a higher-order sequence —
    both engines index the REVERSED body so odd positions are the
    doubled ones regardless of length parity.  Narrow, zero shuffles.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.lpad(
            ((F.col("o_orderkey") * 7919) % 100000000000).cast("string"),
            11,
            "0",
        ).alias("body"),
    )
    dsum = F.expr(
        "cast(aggregate(sequence(1, 11), 0L, (acc, i) -> acc +"
        " CASE WHEN i % 2 = 1 THEN"
        "   CASE WHEN 2 * int(substring(reverse(body), i, 1)) > 9"
        "        THEN 2 * int(substring(reverse(body), i, 1)) - 9"
        "        ELSE 2 * int(substring(reverse(body), i, 1)) END"
        " ELSE int(substring(reverse(body), i, 1)) END) AS bigint)"
    )
    d = o.withColumn("s", dsum)
    check = (10 - F.col("s") % 10) % 10
    return d.select(
        "o_orderkey",
        "body",
        check.cast("bigint").alias("check_digit"),
        F.concat(F.col("body"), check.cast("string")).alias(
            "account_number"
        ),
        ((F.col("s") + check) % 10 == 0).alias("luhn_valid"),
    )


_FMTBYTES_ORACLE = """
WITH b AS (
  SELECT o_orderkey,
         CAST((o_orderkey + 1) * 977 * (1 + o_orderkey % 1000) AS BIGINT)
           AS nbytes
  FROM orders
),
u AS (
  SELECT o_orderkey, nbytes,
         CASE WHEN nbytes >= 1073741824 THEN 3
              WHEN nbytes >= 1048576 THEN 2
              WHEN nbytes >= 1024 THEN 1
              ELSE 0 END AS mag
  FROM b
)
SELECT o_orderkey, nbytes,
       CASE mag WHEN 3 THEN 'GiB' WHEN 2 THEN 'MiB'
                WHEN 1 THEN 'KiB' ELSE 'B' END AS unit,
       ROUND(nbytes / POWER(1024, mag), 1) AS scaled,
       CAST(ROUND(nbytes / POWER(1024, mag), 1) AS STRING)
         || ' ' || CASE mag WHEN 3 THEN 'GiB' WHEN 2 THEN 'MiB'
                            WHEN 1 THEN 'KiB' ELSE 'B' END AS human
FROM u
"""


@register("fn_format_bytes", oracle=_FMTBYTES_ORACLE, category="function")
def fn_format_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Humanized byte formatting (B/KiB/MiB/GiB, one decimal) over a
    synthetic size column spanning four magnitudes — the display
    arithmetic every storage dashboard and `du`-style report needs,
    with the magnitude CASE ladder on exact integers and ONE float
    division per row (both engines then render the rounded double
    identically — the x.0/x.5 decimal forms are exact in binary).

    Narrow, zero shuffles.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        ((F.col("o_orderkey") + 1) * 977 * (1 + F.col("o_orderkey") % 1000))
        .cast("bigint")
        .alias("nbytes"),
    )
    mag = (
        F.when(F.col("nbytes") >= 1073741824, 3)
        .when(F.col("nbytes") >= 1048576, 2)
        .when(F.col("nbytes") >= 1024, 1)
        .otherwise(0)
    )
    unit = (
        F.when(F.col("mag") == 3, "GiB")
        .when(F.col("mag") == 2, "MiB")
        .when(F.col("mag") == 1, "KiB")
        .otherwise("B")
    )
    u = o.withColumn("mag", mag)
    scaled = F.round(F.col("nbytes") / F.pow(F.lit(1024.0), F.col("mag")), 1)
    return u.select(
        "o_orderkey",
        "nbytes",
        unit.alias("unit"),
        scaled.alias("scaled"),
        F.concat(scaled.cast("string"), F.lit(" "), unit).alias("human"),
    )


# Acklam's inverse-normal-CDF rational approximation (|rel err| < 1.15e-9)
_NI_A = (-39.69683028665376, 220.9460984245205, -275.9285104469687,
         138.3577518672690, -30.66479806614716, 2.506628277459239)
_NI_B = (-54.47609879822406, 161.5858368580409, -155.6989798598866,
         66.80131188771972, -13.28068155288572)
_NI_C = (-0.007784894002430293, -0.3223964580411365, -2.400758277161838,
         -2.549732539343734, 4.374664141464968, 2.938163982698783)
_NI_D = (0.007784695709041462, 0.3224671290700398, 2.445134137142996,
         3.754408661907416)


def _norminv_sql(p: str) -> str:
    a, b, c, d = _NI_A, _NI_B, _NI_C, _NI_D
    q_lo = f"SQRT(-2 * LN({p}))"
    q_hi = f"SQRT(-2 * LN(1 - ({p})))"
    r = f"(({p}) - 0.5)"
    r2 = f"({r} * {r})"
    central_num = (
        f"((((({a[0]} * {r2} + {a[1]}) * {r2} + {a[2]}) * {r2} + {a[3]})"
        f" * {r2} + {a[4]}) * {r2} + {a[5]}) * {r}"
    )
    central_den = (
        f"((((({b[0]} * {r2} + {b[1]}) * {r2} + {b[2]}) * {r2} + {b[3]})"
        f" * {r2} + {b[4]}) * {r2} + 1)"
    )
    def tail(q):
        num = (
            f"((((({c[0]} * {q} + {c[1]}) * {q} + {c[2]}) * {q} + {c[3]})"
            f" * {q} + {c[4]}) * {q} + {c[5]})"
        )
        den = (
            f"(((({d[0]} * {q} + {d[1]}) * {q} + {d[2]}) * {q} + {d[3]})"
            f" * {q} + 1)"
        )
        return num, den

    lo_n, lo_d = tail(q_lo)
    hi_n, hi_d = tail(q_hi)
    return (
        f"CASE WHEN {p} < 0.02425 THEN {lo_n} / {lo_d}"
        f" WHEN {p} > 0.97575 THEN -({hi_n}) / {hi_d}"
        f" ELSE {central_num} / {central_den} END"
    )


_NORMINV_ORACLE = f"""
WITH g AS (
  SELECT o_orderkey,
         (o_orderkey % 999 + 1) / 1000.0 AS p
  FROM orders
)
SELECT o_orderkey, p,
       ROUND({_norminv_sql("p")}, 8) AS z
FROM g
"""


@register("fn_norm_inv", oracle=_NORMINV_ORACLE, category="function")
def fn_norm_inv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse normal CDF Φ⁻¹(p) as a pure SQL expression (Acklam's
    rational approximation, |rel err| < 1.2e-9) — the quantile
    function the statistical shelf needs for in-engine p-value and
    critical-value work without hardcoded z tables (the 1.96s in
    `agg_power_analysis`/`agg_wilson_ci` come from exactly this
    function).  Central/tail branches at the canonical 0.02425 cut;
    the IDENTICAL polynomial string is compiled by both engines, so
    every coefficient multiply happens in the same order.

    Evaluated over a 999-point p grid; rounded at 1e-8 (inside the
    approximation's own error).  Narrow, zero shuffles, codegen.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        ((F.col("o_orderkey") % 999 + 1) / 1000.0).alias("p"),
    )
    return o.select(
        "o_orderkey",
        "p",
        F.round(F.expr(_norminv_sql("p")), 8).alias("z"),
    )


# ------------------------------------------------ geohash encoding
_GH_CHARS = "0123456789bcdefghjkmnpqrstuvwxyz"  # geohash base32
_GH_PRECISION = 5                               # chars -> 25 bits
_GH_LON_BITS = 13                               # ceil(25/2): lon leads
_GH_LAT_BITS = 12


def _gh_interleave_terms(lon_q: str, lat_q: str) -> str:
    """Integer arithmetic interleaving lon (13 bits, MSB first) and
    lat (12 bits) into the 25-bit geohash value — one generated
    formula string shared verbatim by both engines (the
    `sink_zorder_layout` dialect rule)."""
    terms = []
    for i in range(_GH_LON_BITS):  # lon bit (12-i) -> z bit (24-2i)
        terms.append(f"((({lon_q}) >> {_GH_LON_BITS - 1 - i}) & 1) * {1 << (24 - 2 * i)}")
    for i in range(_GH_LAT_BITS):  # lat bit (11-i) -> z bit (23-2i)
        terms.append(f"((({lat_q}) >> {_GH_LAT_BITS - 1 - i}) & 1) * {1 << (23 - 2 * i)}")
    return "(" + " + ".join(terms) + ")"


def _gh_sql(z: str) -> str:
    """Base32 rendering of the 25-bit value `z` (5 substr lookups)."""
    parts = [
        f"SUBSTR('{_GH_CHARS}', (({z}) >> {20 - 5 * g}) % 32 + 1, 1)"
        for g in range(_GH_PRECISION)
    ]
    return " || ".join(parts)


_GEOHASH_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey,
         CAST(c_custkey % 179 AS DOUBLE) - 89.0 + 0.25 AS lat,
         CAST((c_custkey * 7 + c_nationkey) % 359 AS DOUBLE)
           - 179.0 + 0.5 AS lon
  FROM customer
),
q AS (
  SELECT c_custkey, lat, lon,
         LEAST(GREATEST(
           CAST(FLOOR((lat + 90.0) / 180.0 * {1 << _GH_LAT_BITS}) AS BIGINT),
           0), {(1 << _GH_LAT_BITS) - 1}) AS lat_q,
         LEAST(GREATEST(
           CAST(FLOOR((lon + 180.0) / 360.0 * {1 << _GH_LON_BITS}) AS BIGINT),
           0), {(1 << _GH_LON_BITS) - 1}) AS lon_q
  FROM pts
),
z AS (
  SELECT c_custkey, lat, lon,
         {_gh_interleave_terms('lon_q', 'lat_q')} AS zv
  FROM q
)
SELECT c_custkey, lat, lon,
       {_gh_sql('zv')} AS geohash
FROM z
"""


@register("fn_geohash", oracle=_GEOHASH_ORACLE, category="function")
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-{_GH_PRECISION} encoding of the synthesized customer
    coordinates (same derivation as `fn_geo_haversine`): quantize lat
    to {_GH_LAT_BITS} bits / lon to {_GH_LON_BITS} bits, interleave
    lon-first into the 25-bit cell id, render base32 — the standard
    prefix-shardable spatial key (equal prefixes = nearby cells), the
    string-keyed sibling of `join_spatial_grid`'s integer grid and
    `sink_zorder_layout`'s Morton tiles.

    The quantize-and-interleave form is the classic bisection
    algorithm closed-form (floor((x - lo)/(hi - lo) * 2^bits) IS the
    bisection path), verified against a reference bisection encoder in
    tests — exactly, except when float rounding in (x + 90)/180 lands
    ON a cell boundary (e.g. lon = -1e-200 rounds to the +0 cell),
    where the encode may differ by one cell; the quantized indices are
    clamped to their bit range so such inputs still produce a VALID
    adjacent-cell geohash, never garbage bits.  Pure integer/bit JVM
    algebra in one narrow projection — zero shuffles, no UDF.
    """
    c = load_table(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 179).cast("double") - 89.0 + 0.25
    lon = (
        (F.col("c_custkey") * 7 + F.col("c_nationkey")) % 359
    ).cast("double") - 179.0 + 0.5
    q = c.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
    ).select(
        "c_custkey",
        "lat",
        "lon",
        F.least(
            F.greatest(
                F.floor(
                    (F.col("lat") + 90.0) / 180.0 * (1 << _GH_LAT_BITS)
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
            F.lit((1 << _GH_LAT_BITS) - 1).cast("bigint"),
        ).alias("lat_q"),
        F.least(
            F.greatest(
                F.floor(
                    (F.col("lon") + 180.0) / 360.0 * (1 << _GH_LON_BITS)
                ).cast("bigint"),
                F.lit(0).cast("bigint"),
            ),
            F.lit((1 << _GH_LON_BITS) - 1).cast("bigint"),
        ).alias("lon_q"),
    )
    z = q.select(
        "c_custkey",
        "lat",
        "lon",
        F.expr(_gh_interleave_terms("lon_q", "lat_q")).alias("zv"),
    )
    return z.select(
        "c_custkey",
        "lat",
        "lon",
        F.expr(_gh_sql("zv")).alias("geohash"),
    )


# ------------------------------------------------- semver comparison
_SEMVER_THRESH = (3, 5, 10)  # v3.5.10


_SEMVER_ORACLE = f"""
WITH v AS (
  SELECT p_partkey, p_brand,
         'v' || (p_partkey % 5) || '.' || (p_partkey % 10) || '.'
             || (p_partkey % 20) AS ver
  FROM part
),
parsed AS (
  SELECT p_partkey, p_brand, ver,
         CAST(string_split(SUBSTR(ver, 2), '.')[1] AS BIGINT) * 10000
         + CAST(string_split(SUBSTR(ver, 2), '.')[2] AS BIGINT) * 100
         + CAST(string_split(SUBSTR(ver, 2), '.')[3] AS BIGINT) AS vkey
  FROM v
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN vkey >= {_SEMVER_THRESH[0] * 10000 + _SEMVER_THRESH[1] * 100 + _SEMVER_THRESH[2]}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_threshold,
       'v' || (MAX(vkey) // 10000) || '.' || (MAX(vkey) // 100 % 100) || '.'
           || (MAX(vkey) % 100) AS max_version,
       'v' || (MIN(vkey) // 10000) || '.' || (MIN(vkey) // 100 % 100) || '.'
           || (MIN(vkey) % 100) AS min_version,
       CAST(COUNT(DISTINCT vkey) AS BIGINT) AS n_distinct_versions
FROM parsed GROUP BY p_brand ORDER BY p_brand
"""


@register("fn_semver_compare", oracle=_SEMVER_ORACLE, category="function")
def fn_semver_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-version parse/compare suite: derive a deterministic
    'vMAJOR.MINOR.PATCH' string per part, PARSE it back (split +
    casts — the exercise is the string round-trip), order by the
    numeric (major, minor, patch) key, and report per brand the
    count at-or-above v{_SEMVER_THRESH[0]}.{_SEMVER_THRESH[1]}.{_SEMVER_THRESH[2]},
    min/max version, and distinct versions. The point the op locks
    in: LEXICOGRAPHIC comparison is wrong for versions ('v3.5.9' >
    'v3.5.10' as strings) — comparisons must go through the parsed
    key, and the reported min/max strings are RECONSTRUCTED from the
    winning key so ties cannot smuggle order-dependence in.

    One narrow projection (no UDF — split/element_at/casts are
    codegen'd) + one |brands|-row groupBy.
    """
    thr = (
        _SEMVER_THRESH[0] * 10000 + _SEMVER_THRESH[1] * 100 + _SEMVER_THRESH[2]
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.concat(
            F.lit("v"),
            (F.col("p_partkey") % 5).cast("string"),
            F.lit("."),
            (F.col("p_partkey") % 10).cast("string"),
            F.lit("."),
            (F.col("p_partkey") % 20).cast("string"),
        ).alias("ver"),
    )
    parts = F.split(F.substring(F.col("ver"), 2, 2147483647), "\\.")
    parsed = p.select(
        "p_brand",
        (
            F.element_at(parts, 1).cast("bigint") * 10000
            + F.element_at(parts, 2).cast("bigint") * 100
            + F.element_at(parts, 3).cast("bigint")
        ).alias("vkey"),
    )

    def ver_str(key):
        return F.concat(
            F.lit("v"),
            (key / 10000).cast("bigint").cast("string"),
            F.lit("."),
            ((key / 100).cast("bigint") % 100).cast("string"),
            F.lit("."),
            (key % 100).cast("string"),
        )

    return (
        parsed.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum(F.when(F.col("vkey") >= thr, 1).otherwise(0))
            .cast("bigint")
            .alias("n_ge_threshold"),
            F.max("vkey").alias("maxk"),
            F.min("vkey").alias("mink"),
            F.countDistinct("vkey").cast("bigint").alias("n_distinct_versions"),
        )
        .select(
            "p_brand",
            "n_parts",
            "n_ge_threshold",
            ver_str(F.col("maxk")).alias("max_version"),
            ver_str(F.col("mink")).alias("min_version"),
            "n_distinct_versions",
        )
        .orderBy("p_brand")
    )


@register(
    "fn_sql_variables",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 4) AS sum_price
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
    """,
    category="fn",
)
def fn_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables + EXECUTE IMMEDIATE (Spark 4 SQL
    scripting surface, SPARK-42849/SPARK-44840): a threshold is
    computed once into a typed session variable (`DECLARE VARIABLE` +
    `SET VAR`), then consumed by a dynamically-composed statement via
    `EXECUTE IMMEDIATE ... USING` — the SQL-only analog of a driver
    program stitching scalar results into follow-up queries, without a
    client round-trip per stage.

    Scale note: the variable holds ONE scalar (never data), so this is
    plan-level plumbing — the aggregate subquery the oracle inlines
    and the variable read compile to the same two-job shape. Threshold
    comparisons against an ulp-sensitive double are safe here because
    o_totalprice is quantized at 0.01 (cross-engine AVG can differ by
    ~1e-10, far below the grid).
    """
    orders = load_table(spark, sf_dir, "orders")
    view = "s3u_sqlvar_orders"
    orders.createOrReplaceTempView(view)
    try:
        spark.sql("DECLARE OR REPLACE VARIABLE s3u_price_floor DOUBLE")
        spark.sql(
            f"SET VAR s3u_price_floor = "
            f"(SELECT AVG(o_totalprice) FROM {view})"
        )
        return spark.sql(
            """
            EXECUTE IMMEDIATE
              'SELECT o_orderstatus,
                      CAST(COUNT(*) AS BIGINT) AS n_orders,
                      ROUND(SUM(o_totalprice), 4) AS sum_price
               FROM s3u_sqlvar_orders
               WHERE o_totalprice > ?
               GROUP BY o_orderstatus'
              USING s3u_price_floor
            """
        ).localCheckpoint(eager=True)
    finally:
        spark.sql("DROP TEMPORARY VARIABLE IF EXISTS s3u_price_floor")
        spark.catalog.dropTempView(view)
