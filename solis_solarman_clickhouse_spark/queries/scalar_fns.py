"""Q-STR / Q-DATE / Q-ARR / Q-MAP / Q-JSON: scalar function families.

All built-in pyspark.sql.functions — JVM-side, inside whole-stage codegen.
Oracle strings use the DuckDB spelling of the same semantics; where return
types differ between dialects (dayofweek origin, floor type, map access)
the query output is normalized to a dialect-neutral scalar.

Mirrors: the reference's epoch-seconds timestamping (solarman.py:308) is
exercised by date_epoch_roundtrip.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import table
from .registry import query, r4


@query(
    "string_functions",
    category="scalar_fn",
    oracle="""
    SELECT p_partkey,
           CONCAT(p_brand, ':', p_name) AS branded,
           SUBSTR(p_name, 1, 5) AS name5,
           UPPER(p_name) AS name_up,
           LOWER(p_type) AS type_lo,
           TRIM(CONCAT(' ', p_name, ' ')) AS name_trim,
           REPLACE(p_name, ' ', '_') AS name_us,
           LENGTH(p_name) AS name_len,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           STRING_SPLIT(p_name, ' ')[1] AS first_word
    FROM part
    """,
)
def string_functions(spark, sf_dir):
    """Q-STR-1: concat/substr/case/trim/replace/length/lpad/split."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_name")).alias("branded"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.upper("p_name").alias("name_up"),
        F.lower("p_type").alias("type_lo"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
    )


@query(
    "string_regex",
    category="scalar_fn",
    oracle="""
    SELECT p_partkey, p_type,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           CAST(regexp_matches(p_type, '^(PROMO|ECONOMY)') AS BOOLEAN) AS is_promo_econ,
           LENGTH(regexp_replace(p_name, '[aeiou]', '', 'g')) AS novowel_len
    FROM part
    """,
)
def string_regex(spark, sf_dir):
    """Q-STR-2: regexp_extract / rlike / regexp_replace (patterns chosen to
    behave identically in Java regex and RE2)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_type",
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.col("p_type").rlike("^(PROMO|ECONOMY)").alias("is_promo_econ"),
        F.length(F.regexp_replace("p_name", "[aeiou]", "")).alias("novowel_len"),
    )


@query(
    "date_functions",
    category="scalar_fn",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(DATE_TRUNC('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start,
           YEAR(o_orderdate) AS yr,
           MONTH(o_orderdate) AS mo,
           DAY(o_orderdate) AS dy,
           HOUR(o_orderdate) AS hr,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           CAST(DAYOFWEEK(o_orderdate) AS INT) AS dow
    FROM orders
    """,
)
def date_functions(spark, sf_dir):
    """Q-DATE-1: date_trunc / parts / date_add / datediff / day-of-week.

    Day-of-week normalized to DuckDB's convention (0 = Sunday); Spark's
    dayofweek is 1 = Sunday, hence the -1. DATE-typed outputs are emitted
    as 'yyyy-MM-dd' strings on both engines: DuckDB DATE widens to
    datetime64 in pandas ('1995-01-31 00:00:00') while Spark yields
    datetime.date ('1995-01-31') — identical values, divergent hash.
    """
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dy"),
        F.hour(d).cast("bigint").alias("hr"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).cast("bigint").alias(
            "days_to_2002"
        ),
        (F.dayofweek(d) - 1).cast("int").alias("dow"),
    )


@query(
    "date_epoch_roundtrip",
    category="scalar_fn",
    oracle="""
    SELECT event_id,
           epoch_us(ts) AS epoch_micro,
           make_timestamp(epoch_us(ts)) AS ts_rebuilt,
           CAST(make_timestamp(epoch_us(ts)) = ts AS BOOLEAN) AS roundtrip_ok
    FROM events
    """,
)
def date_epoch_roundtrip(spark, sf_dir):
    """Q-DATE-2: epoch micros round-trip — the reference stamps rows with
    UTC epoch seconds (time.time(), solarman.py:308) and ClickHouse stores
    DateTime; here the conversion is exercised at microsecond precision."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("epoch_micro"),
        F.timestamp_micros(F.unix_micros(F.col("ts"))).alias("ts_rebuilt"),
        (F.timestamp_micros(F.unix_micros(F.col("ts"))) == F.col("ts")).alias("roundtrip_ok"),
    )


@query(
    "array_functions",
    category="scalar_fn",
    oracle="""
    WITH t AS (SELECT p_partkey, STRING_SPLIT(p_name, ' ') AS words FROM part)
    SELECT p_partkey,
           LEN(words) AS n_words,
           CAST(list_contains(words, 'widget') AS BOOLEAN) AS has_widget,
           ARRAY_TO_STRING(words[1:2], '|') AS first_two,
           LEN(list_distinct(words)) AS n_distinct_words,
           ARRAY_TO_STRING(list_sort(words), '|') AS sorted_words
    FROM t
    """,
)
def array_functions(spark, sf_dir):
    """Q-ARR-1: array construct / size / contains / slice / distinct / sort,
    emitted as scalars or joined strings for dialect-neutral hashing."""
    p = table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_contains(words, "widget").alias("has_widget"),
        F.array_join(F.slice(words, 1, 2), "|").alias("first_two"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.array_join(F.sort_array(words), "|").alias("sorted_words"),
    )


@query(
    "array_explode",
    category="scalar_fn",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT UNNEST(STRING_SPLIT(p_name, ' ')) AS word FROM part) t
    GROUP BY word
    """,
)
def array_explode(spark, sf_dir):
    """Q-ARR-2: explode (UNNEST) + re-aggregate — word frequency over p_name."""
    p = table(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "map_functions",
    category="scalar_fn",
    oracle="""
    SELECT p_partkey,
           p_size AS size_val,
           ROUND(p_retailprice, 4) AS price_val,
           2 AS n_keys
    FROM part
    """,
)
def map_functions(spark, sf_dir):
    """Q-MAP-1: map_from_arrays / map_keys / element_at. The oracle checks
    the extracted values (map internals are Spark-side; DuckDB map access
    semantics differ by version, so the oracle states the expected scalars
    directly)."""
    p = table(spark, sf_dir, "part")
    m = F.map_from_arrays(
        F.array(F.lit("size"), F.lit("price")),
        F.array(F.col("p_size").cast("double"), F.col("p_retailprice")),
    )
    return p.select(
        "p_partkey",
        F.element_at(m, "size").cast("int").alias("size_val"),
        r4(F.element_at(m, "price")).alias("price_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "json_extract",
    category="scalar_fn",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def json_extract(spark, sf_dir):
    """Q-JSON-1: typed field extraction from the events.props JSON string."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


@query(
    "array_higher_order_fns",
    category="scalar",
    oracle="""
    SELECT p_partkey,
           list_reduce(list_transform(string_split(p_name, ' '), x -> len(x)),
                       (a, b) -> a + b) AS total_len,
           -- COALESCE: DuckDB array_to_string(empty) is NULL, Spark
           -- array_join(empty) is ''
           COALESCE(array_to_string(
             list_filter(string_split(p_name, ' '), x -> len(x) > 4),
             ','), '') AS long_words,
           array_to_string(
             list_transform(list_zip(string_split(p_name, ' '),
                                     list_transform(string_split(p_name, ' '),
                                                    x -> len(x))),
                            t -> t[1] || ':' || CAST(t[2] AS VARCHAR)),
             ',') AS tagged
    FROM part
    """,
)
def array_higher_order_fns(spark, sf_dir):
    """Higher-order array functions — aggregate (fold), filter, zip_with —
    the lambda-expression surface ClickHouse exposes as arrayFold/
    arrayFilter/arrayZip. All three run as codegen'd JVM expressions per
    row (no explode, no shuffle, no Python): fold sums token lengths,
    filter keeps long words, zip_with tags each token with its length.
    DuckDB's list_reduce has no init accumulator, so the Spark fold seeds
    with the first element's length to match."""
    p = table(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    lens = F.transform(toks, F.length)
    total_len = F.aggregate(
        F.slice(lens, 2, F.greatest(F.size(lens) - 1, F.lit(0))),
        F.element_at(lens, 1),
        lambda acc, x: acc + x,
    )
    long_words = F.filter(toks, lambda x: F.length(x) > 4)
    tagged = F.zip_with(
        toks, lens, lambda t, n: F.concat_ws(":", t, n.cast("string"))
    )
    # comma-joined strings: raw array columns crash the driver's
    # pandas canonicalizer
    return p.select(
        "p_partkey",
        total_len.alias("total_len"),
        F.array_join(long_words, ",").alias("long_words"),
        F.array_join(tagged, ",").alias("tagged"),
    )


@query(
    "map_higher_order_fns",
    category="scalar",
    oracle="""
    WITH t AS (
      SELECT p_partkey,
             list_filter(list_sort(list_distinct(string_split(p_name, ' '))),
                         x -> 2 * len(x) > 8) AS ks
      FROM part
    )
    SELECT p_partkey,
           -- COALESCE: DuckDB array_to_string(empty) is NULL, Spark
           -- array_join(empty) is ''
           COALESCE(array_to_string(ks, ','), '') AS keys,
           COALESCE(array_to_string(list_transform(ks, x -> 2 * len(x)), ','),
                    '') AS vals
    FROM t
    """,
)
def map_higher_order_fns(spark, sf_dir):
    """Map higher-order functions — map_from_arrays, transform_values,
    map_filter — the MapType lambda surface (ClickHouse mapApply/
    mapFilter parity): token -> doubled-length map, filtered to values
    > 8, emitted as sorted parallel arrays (maps have no canonical order
    to hash). Pure row expressions in codegen; DuckDB mirrors with list
    lambdas since its map surface lacks filter/transform."""
    p = table(spark, sf_dir, "part")
    dtoks = F.array_distinct(F.split(F.col("p_name"), " "))
    m = F.map_from_arrays(dtoks, F.transform(dtoks, F.length))
    doubled = F.transform_values(m, lambda k, v: v * 2)
    kept = F.map_filter(doubled, lambda k, v: v > 8)
    entries = F.array_sort(F.map_entries(kept))
    # comma-joined strings: raw array columns crash the driver's
    # pandas canonicalizer
    return p.select(
        "p_partkey",
        F.array_join(
            F.transform(entries, lambda e: e["key"]), ","
        ).alias("keys"),
        F.array_join(
            F.transform(entries, lambda e: e["value"].cast("string")), ","
        ).alias("vals"),
    )


@query(
    "date_functions_extended",
    category="scalar",
    oracle="""
    SELECT o_orderkey,
           quarter(o_orderdate) AS q,
           CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
           dayofyear(o_orderdate) AS doy,
           strftime(CAST(last_day(o_orderdate) AS DATE), '%Y-%m-%d') AS month_end,
           strftime(CAST(date_trunc('quarter', o_orderdate) AS DATE), '%Y-%m-%d') AS quarter_start
    FROM orders WHERE o_orderkey < 1000
    """,
)
def date_functions_extended(spark, sf_dir):
    """Calendar function breadth beyond Q-DATE-1: quarter, ISO week,
    day-of-year, month-end, quarter-start — the Grafana/report bucket
    vocabulary. All pure row expressions; Spark's weekofyear and DuckDB's
    are both ISO-8601 so the year-boundary weeks agree. DATE outputs are
    string-serialized ('yyyy-MM-dd') on both engines — see date_functions."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter(d).alias("q"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofyear(d).alias("doy"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias("quarter_start"),
    )


@query(
    "string_regex_extended",
    category="scalar",
    oracle="""
    SELECT p_partkey,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words,
           len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
           regexp_replace(p_name, '([a-z]+) ([a-z]+)', '\\2 \\1') AS swapped
    FROM part WHERE p_partkey < 500
    """,
)
def string_regex_extended(spark, sf_dir):
    """Regex breadth beyond Q-STR-2: extract-all into an array, match
    counting, and group-backreference replace (Spark spells
    backreferences $1, DuckDB \\1 — same semantics, dialect-correct in
    each engine). Row expressions, codegen'd, no UDF."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.select(
        "p_partkey",
        F.array_join(
            F.regexp_extract_all(F.col("p_name"), F.lit("[a-z]+"), 0), ","
        ).alias("words"),
        F.size(F.regexp_extract_all(F.col("p_name"), F.lit("[aeiou]"), 0)).alias("n_vowels"),
        F.regexp_replace(
            F.col("p_name"), "([a-z]+) ([a-z]+)", "$2 $1"
        ).alias("swapped"),
    )


@query(
    "string_fuzzy_match",
    category="scalar_fn",
    oracle="""
    WITH b AS (SELECT DISTINCT p_brand FROM part)
    SELECT a.p_brand AS brand_a, c.p_brand AS brand_b,
           levenshtein(a.p_brand, c.p_brand) AS dist
    FROM b a JOIN b c ON a.p_brand < c.p_brand
    WHERE levenshtein(a.p_brand, c.p_brand) <= 2
    """,
)
def string_fuzzy_match(spark, sf_dir):
    """Fuzzy label matching: Levenshtein distance over the distinct brand
    vocabulary — the "are these two labels the same entity?" primitive of
    entity resolution / label-noise cleanup. The distinct-first shape makes
    the pair space |vocab|², not |table|² (25 brands → 300 pairs at any
    data scale); the self-join broadcasts. Both engines implement textbook
    unit-cost edit distance, so the filter and the output are exact."""
    b = table(spark, sf_dir, "part").select("p_brand").distinct()
    a = b.select(F.col("p_brand").alias("brand_a"))
    c = b.select(F.col("p_brand").alias("brand_b"))
    d = F.levenshtein(F.col("brand_a"), F.col("brand_b"))
    return (
        a.join(F.broadcast(c), F.col("brand_a") < F.col("brand_b"))
        .where(d <= 2)
        .select("brand_a", "brand_b", d.alias("dist"))
    )


@query(
    "array_posexplode_ordinality",
    category="scalar_fn",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    tok AS (
      SELECT doc_id, i AS pos, ws[i] AS w, len(ws) AS n
      FROM w, UNNEST(generate_series(1, len(ws))) AS t(i)
    )
    SELECT doc_id, pos, w,
           CAST(pos = 1 AS BOOLEAN) AS is_first,
           CAST(pos = n AS BOOLEAN) AS is_last
    FROM tok
    """,
)
def array_posexplode_ordinality(spark, sf_dir):
    """UNNEST WITH ORDINALITY (ClickHouse arrayJoin + arrayEnumerate):
    positional token explode with first/last flags — the shape every
    sequence-labeling feature pipeline needs (position embeddings, BOS/
    EOS marking). posexplode emits 0-based positions, the ANSI ordinal is
    1-based; the query pins 1-based on both engines. Pure generator +
    projection, no shuffle at all."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos0", "w"),
        F.size(F.split("text", " ")).alias("n"),
    )
    return toks.select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "w",
        (F.col("pos0") == 0).alias("is_first"),
        (F.col("pos0") + 1 == F.col("n")).alias("is_last"),
    )


@query(
    "string_collation_lcase",
    category="scalar_fn",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                  ELSE lower(p_type) END AS label,
             p_brand
      FROM part
    )
    SELECT lower(label) AS type_ci,
           COUNT(*) AS n_parts,
           COUNT(DISTINCT p_brand) AS n_brands
    FROM mixed GROUP BY 1
    """,
)
def string_collation_lcase(spark, sf_dir):
    """Spark 4 COLLATION surface: grouping under the UTF8_LCASE collation
    — comparison and hashing become case-insensitive at the ENGINE level,
    no lower() rewrite in every predicate (ClickHouse's *CaseInsensitive
    combinators). The fixture strings are single-case, so the query first
    manufactures mixed-case labels (upper for even keys, lower for odd);
    the collated groupBy must merge them exactly like the oracle's
    explicit lower() grouping. Output key lowercased for display parity
    only."""
    p = table(spark, sf_dir, "part")
    label = F.when(
        F.col("p_partkey") % 2 == 0, F.upper("p_type")
    ).otherwise(F.lower("p_type"))
    ci = F.collate(label, "UTF8_LCASE")
    return (
        p.groupBy(ci.alias("label_key"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.count_distinct("p_brand").alias("n_brands"),
        )
        .select(
            F.lower(F.col("label_key")).alias("type_ci"),
            "n_parts",
            "n_brands",
        )
    )


@query(
    "string_url_functions",
    category="scalar",
    oracle="""
    WITH u AS (
      SELECT p_partkey,
             'https://b' || replace(p_brand, 'Brand#', '')
               || '.parts.example.com/' || lower(p_type) || '/'
               || replace(p_name, ' ', '-')
               || '?size=' || p_size || '&key=' || p_partkey AS url
      FROM part WHERE p_partkey < 200
    )
    SELECT p_partkey,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '[?&]size=([^&#]*)', 1) AS size_param
    FROM u
    """,
)
def string_url_functions(spark, sf_dir):
    """ClickHouse URL-function parity (protocol() / domain() / path() /
    extractURLParameter()) via Spark's parse_url — the JVM-side URL
    decomposition the CH stack uses for access-log analytics. The URL is
    synthesized from part attributes (the fixtures carry no URL column) so
    the round-trip is self-checking: the oracle re-extracts the same
    components with anchored regexes. parse_url stays inside whole-stage
    codegen (no Python), and as a pure per-row projection it is
    scan-parallel at any scale."""
    part = table(spark, sf_dir, "part").where(F.col("p_partkey") < 200)
    url = F.concat(
        F.lit("https://b"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("")),
        F.lit(".parts.example.com/"),
        F.lower("p_type"),
        F.lit("/"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("-")),
        F.lit("?size="),
        F.col("p_size").cast("string"),
        F.lit("&key="),
        F.col("p_partkey").cast("string"),
    )
    u = part.select("p_partkey", url.alias("url"))
    return u.select(
        "p_partkey",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("size")).alias("size_param"),
    )


@query(
    "ch_ipv4_functions",
    category="scalar",
    oracle="""
    WITH n AS (
      SELECT o_orderkey,
             (o_orderkey * 2654435761) % 4294967296 AS ipnum
      FROM orders WHERE o_orderkey < 500
    )
    SELECT o_orderkey, ipnum,
           CAST(ipnum // 16777216 AS VARCHAR) || '.'
             || CAST((ipnum // 65536) % 256 AS VARCHAR) || '.'
             || CAST((ipnum // 256) % 256 AS VARCHAR) || '.'
             || CAST(ipnum % 256 AS VARCHAR) AS ipstr,
           CASE WHEN ipnum >= 167772160 AND ipnum < 184549376 THEN 1
                WHEN ipnum >= 2886729728 AND ipnum < 2887778304 THEN 1
                WHEN ipnum >= 3232235520 AND ipnum < 3232301056 THEN 1
                ELSE 0 END AS is_private
    FROM n
    """,
)
def ch_ipv4_functions(spark, sf_dir):
    """ClickHouse IPv4 function parity (IPv4NumToString /
    IPv4StringToNum / isIPAddressInRange for RFC-1918 ranges): a
    deterministic Knuth-hash IP is synthesized per order (the fixtures
    carry no IP column), rendered dotted-quad by exact integer
    octet extraction, and classified against the three private CIDR
    blocks (10/8, 172.16/12, 192.168/16) as pure integer range checks.
    All-integer projection — codegen'd scan-side at any scale, the same
    shape an access-log enrichment stage runs over trillions of rows."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    ipnum = (F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296)
    n = o.select("o_orderkey", ipnum.alias("ipnum"))
    ipstr = F.concat_ws(
        ".",
        F.floor(F.col("ipnum") / 16777216).cast("long").cast("string"),
        (F.floor(F.col("ipnum") / 65536).cast("long") % 256).cast("string"),
        (F.floor(F.col("ipnum") / 256).cast("long") % 256).cast("string"),
        (F.col("ipnum") % 256).cast("string"),
    )
    private = (
        F.when((F.col("ipnum") >= 167772160) & (F.col("ipnum") < 184549376), 1)
        .when((F.col("ipnum") >= 2886729728) & (F.col("ipnum") < 2887778304), 1)
        .when((F.col("ipnum") >= 3232235520) & (F.col("ipnum") < 3232301056), 1)
        .otherwise(0)
    )
    return n.select(
        "o_orderkey", "ipnum", ipstr.alias("ipstr"), private.alias("is_private")
    )


@query(
    "json_variant_extract",
    category="scalar_fn",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY 1 ORDER BY k_bucket
    """,
)
def json_variant_extract(spark, sf_dir):
    """Spark 4 VARIANT path for semi-structured data: ``parse_json``
    turns the ``events.props`` JSON string into a binary VARIANT value
    ONCE at the scan, and ``variant_get`` extracts typed fields from the
    parsed tree — unlike ``get_json_object`` (json_extract twin), which
    re-tokenizes the JSON text on every extraction expression. On a
    100 TB semi-structured corpus that one-parse-many-reads difference is
    the whole game (and VARIANT columns persisted to Parquet keep the
    shredded binary form, skipping the parse entirely on re-read). The
    aggregation rolls extracted ints into deciles so the VARIANT values
    flow through partial+final hash aggregation, not just a projection.
    Oracle: DuckDB json_extract — both engines produce identical BIGINTs,
    integer div for the bucket."""
    ev = table(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "bigint")
    return (
        v.select(k.alias("k"))
        .groupBy(F.expr("k div 10").alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("k_bucket")
    )


def _geohash_oracle() -> str:
    chars = "0123456789bcdefghjkmnpqrstuvwxyz"
    return f"""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey * 73) % 18000 AS lat_e2,
             (c_custkey * 151) % 36000 AS lon_e2
      FROM customer),
    grid AS (
      SELECT c_custkey, lat_e2, lon_e2,
             (lat_e2 * 32768) // 18000 AS ilat,
             (lon_e2 * 32768) // 36000 AS ilon
      FROM pts),
    z AS (
      SELECT c_custkey, lat_e2, lon_e2,
             (SELECT SUM(((ilon >> i) & 1) * (1::BIGINT << (2 * i + 1))
                         + ((ilat >> i) & 1) * (1::BIGINT << (2 * i)))
              FROM UNNEST(generate_series(0, 14)) AS t(i)) AS zv
      FROM grid),
    gh AS (
      SELECT c_custkey, lat_e2, lon_e2,
             (SELECT string_agg(substr('{chars}',
                     CAST(((zv >> (25 - 5 * k)) & 31) + 1 AS INT), 1), ''
                     ORDER BY k)
              FROM UNNEST(generate_series(0, 5)) AS t(k)) AS geohash
      FROM z)
    SELECT c_custkey,
           ROUND(lat_e2 / 100.0 - 90.0, 2) AS lat,
           ROUND(lon_e2 / 100.0 - 180.0, 2) AS lon,
           geohash,
           substr(geohash, 1, 4) AS cell4,
           COUNT(*) OVER (PARTITION BY substr(geohash, 1, 4)) AS n_in_cell4
    FROM gh
    """


@query("ch_geohash_encode", category="scalar_fn", oracle=_geohash_oracle())
def ch_geohash_encode(spark, sf_dir):
    """ClickHouse ``geohashEncode(lon, lat, 6)`` parity — the geo-family
    representative: 6-character base32 geohash per point plus a
    prefix-cell occupancy count (the groupBy-cell spatial bucketing a
    geo dashboard runs). Points derive deterministically from
    c_custkey (the fixtures carry no geo columns), carried at integer
    1e2 scale so the whole computation is BIGINT-exact end to end: grid
    cell = lat_e2*2^15 // 18000 (never a double), Morton interleave of
    the 15+15 bit cells via shift/mask — the sink_zorder_layout idiom —
    and base32 chars picked by substr on 5-bit groups. Zero libm calls,
    zero float comparisons ⇒ bit-identical across engines. Pure
    map-side until the single window over the 4-char prefix cell (the
    spatial aggregation); at 100 TB that exchange IS the geo
    partitioning — a geohash prefix is the standard spatial shard key
    (points near each other share prefixes), which is the reason
    geohashes beat raw (lat, lon) pairs for distributed joins."""
    chars = "0123456789bcdefghjkmnpqrstuvwxyz"
    from pyspark.sql import Window as W

    c = table(spark, sf_dir, "customer")
    g = c.select(
        "c_custkey",
        ((F.col("c_custkey") * 73) % 18000).alias("lat_e2"),
        ((F.col("c_custkey") * 151) % 36000).alias("lon_e2"),
    ).select(
        "c_custkey",
        "lat_e2",
        "lon_e2",
        F.expr("(lat_e2 * 32768) div 18000").alias("ilat"),
        F.expr("(lon_e2 * 32768) div 36000").alias("ilon"),
    )
    z = F.lit(0).cast("long")
    for i in range(15):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(F.col("ilon"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(F.col("ilat"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    g = g.withColumn("zv", z)
    gh = F.concat(
        *[
            F.substring(
                F.lit(chars),
                F.shiftright(F.col("zv"), 25 - 5 * k).bitwiseAND(F.lit(31)).cast("int")
                + F.lit(1),
                1,
            )
            for k in range(6)
        ]
    )
    g = g.withColumn("geohash", gh)
    return g.select(
        "c_custkey",
        F.round(F.col("lat_e2") / 100.0 - 90.0, 2).alias("lat"),
        F.round(F.col("lon_e2") / 100.0 - 180.0, 2).alias("lon"),
        "geohash",
        F.substring("geohash", 1, 4).alias("cell4"),
        F.count(F.lit(1))
        .over(W.partitionBy(F.substring("geohash", 1, 4)))
        .alias("n_in_cell4"),
    )


_CRC16_ORACLE = """
WITH frames AS (
  SELECT event_id,
         CAST(ROUND(value * 10) AS BIGINT) % 65536 AS v,
         (CAST(ROUND(value * 10) AS BIGINT)
          + CASE WHEN event_id % 100 = 0 THEN 1 ELSE 0 END) % 65536 AS rv
  FROM events
),
crcs AS (
  SELECT event_id,
         list_reduce(
           list_prepend(65535::BIGINT, [1::BIGINT, 4::BIGINT, 2::BIGINT,
                                        v // 256, v % 256]),
           (crc, b) -> list_reduce(
             list_prepend(xor(crc, b),
                          [0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT,
                           0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT]),
             (c, i) -> CASE WHEN c % 2 = 1 THEN xor(c // 2, 40961)
                            ELSE c // 2 END)) AS crc_expected,
         list_reduce(
           list_prepend(65535::BIGINT, [1::BIGINT, 4::BIGINT, 2::BIGINT,
                                        rv // 256, rv % 256]),
           (crc, b) -> list_reduce(
             list_prepend(xor(crc, b),
                          [0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT,
                           0::BIGINT, 0::BIGINT, 0::BIGINT, 0::BIGINT]),
             (c, i) -> CASE WHEN c % 2 = 1 THEN xor(c // 2, 40961)
                            ELSE c // 2 END)) AS crc_received
  FROM frames
)
SELECT event_id, crc_expected, crc_received,
       CASE WHEN crc_expected = crc_received THEN 1 ELSE 0 END AS crc_ok
FROM crcs ORDER BY event_id
"""


@query("ingest_crc16_modbus", category="ingest", oracle=_CRC16_ORACLE)
def ingest_crc16_modbus(spark, sf_dir):
    """Modbus-RTU CRC16 frame-integrity check as a pure Catalyst fold —
    the byte-level validation tier beneath the reference's register
    reads (solarman.py:340-361 trusts pysolarmanv5's CRC; here the
    polynomial itself runs in the engine so a corrupted frame is caught
    IN the pipeline, the validation-report discipline of
    scan_validation_report applied to the wire format). Each event
    synthesizes its 5-byte read-response frame [addr=01, fn=04, len=02,
    hi, lo]; 1% of frames (event_id % 100 = 0) arrive with a flipped
    value bit. The CRC is the classic reflected-0xA001 fold: OUTER
    aggregate over frame bytes, INNER 8-step aggregate for the bit
    loop — nested HOFs, zero UDFs, zero joins, and DuckDB replays the
    identical nesting via list_reduce with list_prepend seeding (the
    fold-seed idiom this repo's verify notes document), so every CRC
    value hash-matches. Map-only plan: at 100 TB this validates at scan
    speed with no exchange at all."""
    ev = table(spark, sf_dir, "events")
    frames = ev.select(
        "event_id",
        (F.round(F.col("value") * 10).cast("long") % 65536).alias("v"),
        (
            (
                F.round(F.col("value") * 10).cast("long")
                + F.when(F.col("event_id") % 100 == 0, 1).otherwise(0)
            )
            % 65536
        ).alias("rv"),
    )

    def crc_expr(vcol: str) -> F.Column:
        return F.expr(
            f"""
            aggregate(
              array(CAST(1 AS BIGINT), CAST(4 AS BIGINT), CAST(2 AS BIGINT),
                    {vcol} div 256, {vcol} % 256),
              CAST(65535 AS BIGINT),
              (crc, b) -> aggregate(
                sequence(1, 8),
                crc ^ b,
                (c, i) -> IF(c % 2 = 1, (c div 2) ^ CAST(40961 AS BIGINT),
                             c div 2)))
            """
        )

    crcs = frames.select(
        "event_id",
        crc_expr("v").alias("crc_expected"),
        crc_expr("rv").alias("crc_received"),
    )
    return crcs.select(
        "event_id",
        "crc_expected",
        "crc_received",
        F.when(F.col("crc_expected") == F.col("crc_received"), 1)
        .otherwise(0)
        .alias("crc_ok"),
    ).orderBy("event_id")
