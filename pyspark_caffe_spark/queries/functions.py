"""Scalar function families — SURVEY.md §2.8.

Everything here is a built-in JVM expression (whole-stage codegen) —
no Python in the data path. Cross-engine parity traps handled in-query:
Spark's int-typed results are cast to BIGINT where DuckDB returns
BIGINT; day-of-week uses ISO numbering on both sides; double→int casts
go through FLOOR (DuckDB rounds on cast, Spark truncates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_caffe_spark.registry import query
from pyspark_caffe_spark.tables import load_table


@query(
    "fn_string",
    oracle=r"""
    SELECT p_partkey,
           UPPER(p_name)                              AS uname,
           SUBSTRING(p_name, 1, 4)                    AS pref,
           CAST(LENGTH(p_name) AS BIGINT)             AS name_len,
           TRIM(CONCAT('  ', p_name, '  '))           AS trimmed,
           REGEXP_EXTRACT(p_name, '^(\w+)', 1)        AS first_word,
           CAST(LEVENSHTEIN(p_name, 'red widget') AS BIGINT) AS lev,
           CONCAT(p_brand, ':', p_type)               AS brand_type,
           STRING_SPLIT(p_name, ' ')[2]               AS second_word
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case/substr/trim/concat/split/regexp/levenshtein."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.substring("p_name", 1, 4).alias("pref"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.levenshtein(F.col("p_name"), F.lit("red widget")).cast("long").alias("lev"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.split("p_name", " ").getItem(1).alias("second_word"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate)  AS BIGINT)             AS y,
           CAST(MONTH(o_orderdate) AS BIGINT)             AS m,
           CAST(ISODOW(o_orderdate) AS BIGINT)            AS iso_dow,
           CAST(DAYOFYEAR(o_orderdate) AS BIGINT)         AS doy,
           o_orderdate + INTERVAL 30 DAY                  AS plus30,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(DATEDIFF('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT) AS days_to_2002
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date family. ISO day-of-week (Mon=1..Sun=7) on both engines:
    Spark ``weekday()`` is Mon=0, DuckDB ``isodow`` Mon=1 — align with
    +1 (the classic ``dayofweek`` convention trap, SURVEY §2.8)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_2002"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)                        AS price_r1,
           ABS(l_discount - 0.05)                           AS disc_dev,
           CAST(CEIL(l_extendedprice)  AS BIGINT)           AS price_ceil,
           CAST(FLOOR(l_extendedprice) AS BIGINT)           AS price_floor,
           ROUND(LN(l_extendedprice), 6)                    AS price_ln,
           POWER(l_quantity, 2)                             AS qty_sq,
           ROUND(SQRT(l_extendedprice), 6)                  AS price_sqrt,
           CAST(l_quantity AS BIGINT) % 7                   AS qty_mod7
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. ln/sqrt rounded to 6 (libm vs JVM last-ulp); ceil/
    floor cast to BIGINT on the oracle side (DuckDB keeps DOUBLE)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
    )


@query(
    "fn_cond",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END                          AS tier,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status2,
           IF(o_orderpriority = '1-URGENT', 1, 0)       AS is_urgent
    FROM orders
    """,
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN tiering, COALESCE/NULLIF, IF."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias("status2"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS BIGINT)                          AS dim,
           CAST(embedding[1] AS DOUBLE)                            AS first_el,
           ROUND(LIST_MAX(CAST(embedding AS DOUBLE[])), 6)         AS max_el,
           ARRAY_TO_STRING(
             LIST_TRANSFORM(CAST(embedding[1:4] AS DOUBLE[]),
                            x -> CAST(CAST(ROUND(x * 2, 6) AS DECIMAL(18,6)) AS VARCHAR)),
             ',')                                                  AS head2x,
           ROUND(LIST_SUM(LIST_TRANSFORM(CAST(embedding AS DOUBLE[]), x -> x * x)), 6) AS sq_norm
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order family on the embedding column.

    array<float> is cast to array<double> before aggregation (Spark's
    ``aggregate`` rejects a double accumulator over float elements —
    SURVEY §1.3.2). sq_norm ≈ 1.0: fixtures are unit-normalized.
    head2x is serialized to a comma-joined string via DECIMAL(18,6)
    (identical text on both engines) — array-typed outputs crash the
    driver's canonicalizer.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    d = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at(d, 1).alias("first_el"),
        F.round(F.array_max(d), 6).alias("max_el"),
        F.array_join(
            F.transform(
                F.slice(d, 1, 4),
                lambda x: F.round(x * 2, 6).cast("decimal(18,6)").cast("string"),
            ),
            ",",
        ).alias("head2x"),
        F.round(
            F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x), 6
        ).alias("sq_norm"),
    )


@query(
    "fn_map_json",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           COUNT(*) AS n,
           ROUND(AVG(value), 6) AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: parse the props JSON string, extract k, aggregate.
    ``from_json`` with an explicit schema — never schema_of_json per
    row at scale."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.from_json("props", "k INT").getField("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255                      AS k_and,
           o_orderkey | 16                       AS k_or,
           XOR(o_orderkey, 42)                   AS k_xor,
           CAST(o_orderkey << 2 AS BIGINT)       AS k_shl,
           CAST(o_orderkey >> 3 AS BIGINT)       AS k_shr,
           CAST(BIT_COUNT(o_orderkey) AS BIGINT) AS k_bits
    FROM orders
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (the hash/partition-bucket arithmetic toolkit):
    and/or/xor/shifts/popcount, all codegen'd."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(16)).alias("k_or"),
        k.bitwiseXOR(F.lit(42)).alias("k_xor"),
        F.shiftleft(k, 2).alias("k_shl"),
        F.shiftright(k, 3).alias("k_shr"),
        F.bit_count(k).cast("long").alias("k_bits"),
    )


@query(
    "fn_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR)                 AS key_str,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(FLOOR(o_totalprice) AS BIGINT)         AS price_int,
           CAST(o_orderdate AS DATE)                   AS od,
           CAST('42' AS BIGINT) + o_orderkey           AS plus42
    FROM orders
    """,
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast family. double→int goes through FLOOR on both sides:
    DuckDB's CAST(double AS BIGINT) rounds, Spark's truncates — a
    silent cross-engine divergence otherwise."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.floor("o_totalprice").cast("long").alias("price_int"),
        F.col("o_orderdate").cast("date").alias("od"),
        (F.lit("42").cast("long") + F.col("o_orderkey")).alias("plus42"),
    )


@query(
    "fn_try",
    oracle="""
    SELECT event_id,
           TRY_CAST(CASE WHEN event_type = 'click' THEN '12'
                         ELSE event_type END AS BIGINT) AS maybe_num,
           CASE WHEN user_id % 3 = 0 THEN NULL
                ELSE ROUND(value / (user_id % 3), 6) END AS safe_div
    FROM events
    """,
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family: try_cast turns unparseable strings
    into NULL, try_divide turns /0 into NULL — instead of killing the
    stage under ANSI mode (Spark 4 default). At 100 TB this is the
    difference between one malformed row poisoning a 6-hour job and a
    NULL you can filter; the oracle spells out the equivalent
    TRY_CAST / CASE guards."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr(
            "try_cast(CASE WHEN event_type = 'click' THEN '12' ELSE event_type END AS BIGINT)"
        ).alias("maybe_num"),
        F.round(F.try_divide("value", F.col("user_id") % 3), 6).alias("safe_div"),
    )


@query(
    "fn_regexp",
    oracle=r"""
    SELECT doc_id,
           REGEXP_EXTRACT(text, '([a-z]+)ing', 1)                    AS first_ing_stem,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]+')) AS INT)      AS n_numbers,
           REGEXP_REPLACE(text[1:40], '[aeiou]', '_', 'g')           AS devoweled_head,
           (text LIKE '%data%')                                      AS has_data,
           REGEXP_MATCHES(text, '^[A-Z]')                            AS starts_upper
    FROM documents
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family over the corpus text: group extraction, global
    match count, global replace, substring LIKE, anchored search —
    all JVM codegen'd expressions (never a Python UDF for regex: at
    100 TB the regex pass is a pure map stage that must stay
    JVM-side). Patterns kept to the Java/RE2-common subset so the
    DuckDB twin matches byte-for-byte."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)ing", 1).alias("first_ing_stem"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).cast("int").alias("n_numbers"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias("devoweled_head"),
        F.col("text").contains("data").alias("has_data"),
        F.col("text").rlike("^[A-Z]").alias("starts_upper"),
    )


@query(
    "fn_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(LEN(LIST_FILTER(CAST(embedding AS DOUBLE[]), x -> x > 0.2)) > 0 AS BOOLEAN)
                                                                        AS has_large,
           CAST(LEN(LIST_FILTER(CAST(embedding AS DOUBLE[]), x -> ABS(x) >= 1)) = 0 AS BOOLEAN)
                                                                        AS all_small,
           CAST(LEN(LIST_FILTER(CAST(embedding AS DOUBLE[]), x -> x < 0)) AS INT)
                                                                        AS n_negative,
           ROUND(LIST_SUM(LIST_TRANSFORM(LIST_FILTER(CAST(embedding AS DOUBLE[]), x -> x > 0),
                                         x -> x)), 6)                   AS pos_mass
    FROM embeddings
    """,
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order-function family on array columns: exists /
    forall / filter+size / filter+aggregate — the declarative array
    analytics that replace per-row Python loops. All four stay inside
    whole-stage codegen (lambda expressions compile to JVM
    bytecode); at 100 TB this family is the difference between a map
    stage and a Python round-trip per row."""
    emb = load_table(spark, sf_dir, "embeddings")
    d = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.exists(d, lambda x: x > 0.2).alias("has_large"),
        F.forall(d, lambda x: F.abs(x) < 1).alias("all_small"),
        F.size(F.filter(d, lambda x: x < 0)).cast("int").alias("n_negative"),
        F.round(
            F.aggregate(
                F.filter(d, lambda x: x > 0), F.lit(0.0), lambda acc, x: acc + x
            ),
            6,
        ).alias("pos_mass"),
    )


@query(
    "fn_url",
    oracle="""
    SELECT doc_id,
           REGEXP_EXTRACT(url, '^[a-z]+://([^/?#]+)', 1)   AS host,
           REGEXP_EXTRACT(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           REGEXP_EXTRACT(url, '\\?([^#]*)', 1)            AS query,
           REGEXP_EXTRACT(url, '[?&]page=([^&#]*)', 1)     AS page
    FROM (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || lang || '/'
               || CAST(doc_id AS VARCHAR) || '?ref=corpus&page='
               || CAST(doc_id % 7 AS VARCHAR) || '#frag' AS url
      FROM documents
    )
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing with the JVM-side ``parse_url`` expression (host /
    path / query string / single query parameter) over a URL column
    synthesized from document metadata.  The oracle mirrors each
    component with plain REGEXP_EXTRACT — parse_url itself is
    Spark-only.  All codegen'd; no Python."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("lang"), F.lit("/"), F.col("doc_id").cast("string"),
        F.lit("?ref=corpus&page="), (F.col("doc_id") % 7).cast("string"),
        F.lit("#frag"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           CAST(NULL AS DOUBLE) AS missing_val
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS INTEGER) % 7 = 0
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via the Spark 4 VARIANT type:
    ``parse_json`` once, then typed ``variant_get`` path extraction and
    a predicate on the extracted field.  VARIANT's binary encoding
    (shredded, no re-parse per access) is the scale story vs re-running
    ``get_json_object`` string parsing per field; ``try_variant_get``
    on an absent path returns NULL instead of erroring.  The oracle
    mirrors with plain JSON extraction."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(
            "event_id",
            F.variant_get(v, "$.k", "int").alias("k"),
            F.try_variant_get(v, "$.missing", "double").alias("missing_val"),
        )
        .filter(F.col("k") % 7 == 0)
    )


@query(
    "fn_interval_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(DATE_TRUNC('quarter', o_orderdate) AS TIMESTAMP) AS q_start,
           MAKE_DATE(CAST(EXTRACT(year FROM o_orderdate) AS INTEGER), 12, 31)
             AS year_end
    FROM orders
    WHERE o_orderkey % 100 = 0
    """,
)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic: add_months (month-end clamping —
    verified identical across engines: Jan 31 + 1 month = Feb 29),
    last_day, quarter truncation, make_date.  All codegen'd JVM
    expressions; the filter keeps the oracle frame small."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        F.add_months(F.col("o_orderdate").cast("date"), 3).alias("plus_3m"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.date_trunc("quarter", "o_orderdate").alias("q_start"),
        F.make_date(F.year("o_orderdate"), F.lit(12), F.lit(31)).alias("year_end"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           MD5(text) AS md5_hex,
           SHA256(text) AS sha256_hex,
           SUBSTR(MD5(text), 1, 8) AS shard_prefix
    FROM documents WHERE doc_id < 200
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content hashing (md5 / sha2-256) — the
    cross-system content-address used for manifest diffing and media
    dedup (identical hex in every engine, unlike xxhash64 which is the
    in-engine shuffle key — see text_fingerprint for that tier).  The
    8-hex-char prefix is the standard shard-routing key."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.md5("text").alias("md5_hex"),
        F.sha2("text", 256).alias("sha256_hex"),
        F.substring(F.md5("text"), 1, 8).alias("shard_prefix"),
    )


@query(
    "fn_collation",
    oracle="""
    WITH mixed AS (
      SELECT p_name FROM part
      UNION ALL
      SELECT UPPER(p_name) AS p_name FROM part WHERE p_partkey < 100
    )
    SELECT COUNT(DISTINCT p_name) AS n_case_sensitive,
           COUNT(DISTINCT LOWER(p_name)) AS n_case_insensitive
    FROM mixed
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string collations: distinct counts under the binary
    (case-sensitive) collation vs UTF8_LCASE — the engine-level
    case-insensitive comparison that replaces LOWER()-wrapping every
    predicate (and keeps stats/pushdown usable on the original
    column).  The oracle mirrors UTF8_LCASE with LOWER(), exact for
    this ASCII fixture.  Uppercased duplicates are planted (fixtures
    are single-case)."""
    part = load_table(spark, sf_dir, "part")
    mixed = part.select("p_name").unionByName(
        part.filter(F.col("p_partkey") < 100).select(F.upper("p_name").alias("p_name"))
    )
    return mixed.agg(
        F.countDistinct("p_name").alias("n_case_sensitive"),
        F.countDistinct(F.collate("p_name", "UTF8_LCASE")).alias("n_case_insensitive"),
    )


@query(
    "fn_xml",
    oracle="""
    SELECT s_suppkey,
           s_name          AS name,
           s_nationkey     AS nk,
           2               AS n_parts
    FROM supplier
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML extraction family (xpath_string / xpath_int / xpath list):
    build a per-row XML document from supplier columns, then extract
    the fields back with XPath — the codegen'd JVM path for XML-bearing
    string columns (feed payloads, legacy exports) without a Python
    UDF.  Extraction inverts construction, so the oracle is the source
    columns; the xpath() list query counts the two planted <part>
    nodes per document."""
    sup = load_table(spark, sf_dir, "supplier")
    xml = F.concat(
        F.lit("<supp><name>"), F.col("s_name"), F.lit("</name><nk>"),
        F.col("s_nationkey").cast("string"),
        F.lit("</nk><parts><part>a</part><part>b</part></parts></supp>"),
    )
    return sup.select(
        "s_suppkey",
        F.xpath_string(xml, F.lit("/supp/name")).alias("name"),
        F.xpath_int(xml, F.lit("/supp/nk")).alias("nk"),
        F.size(F.xpath(xml, F.lit("/supp/parts/part/text()"))).alias("n_parts"),
    )


@query(
    "fn_aes",
    oracle="""
    SELECT c_custkey,
           c_name                              AS name_roundtrip,
           16 * (LEN(c_name) // 16 + 1)        AS cipher_len
    FROM customer
    """,
)
def fn_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption family (aes_encrypt / aes_decrypt) —
    PII-at-rest for training-data pipelines: encrypt the customer name,
    prove decryption inverts it, and expose the ciphertext size.  ECB
    mode here because the oracle needs determinism; production uses
    GCM (random IV) where only the roundtrip — not the ciphertext — is
    stable.  All JVM-side codegen; the oracle reproduces the roundtrip
    trivially and the PKCS#7 padded length arithmetically
    (16-byte blocks: 16*(len/16+1))."""
    cust = load_table(spark, sf_dir, "customer")
    # demo key inline; at scale the key comes from a KMS at session setup
    cipher = F.expr("aes_encrypt(c_name, '0123456789abcdef', 'ECB')")
    return cust.select(
        "c_custkey",
        F.expr(
            "cast(aes_decrypt(aes_encrypt(c_name, '0123456789abcdef', 'ECB'),"
            " '0123456789abcdef', 'ECB') as string)"
        ).alias("name_roundtrip"),
        F.octet_length(cipher).cast("long").alias("cipher_len"),
    )
