"""Q-UDF: the Python-extension surface (SURVEY.md §2-C Q-UDF-1..3).

UDFs are the slow path; everything here exists to prove the plumbing and
to document when each tier is appropriate:
- pandas_udf (Arrow-vectorized scalar)    — numeric kernels Spark lacks;
- pandas_udf GROUPED_AGG                  — custom aggregates;
- mapInPandas                             — table-in/table-out decode (the
  register decode of /root/reference/solarman.py:340-361 re-done in numpy).
Each result is checked EXACT against a pure-SQL oracle computing the same
math, demonstrating UDF == built-in equivalence (IEEE doubles both sides).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from ..tables import table
from .registry import query


@query(
    "udf_scalar_clamp", python_boundary=True,
    category="udf",
    oracle="""
    SELECT event_id,
           CASE WHEN user_id % 7 = 0 THEN CAST(NULL AS DOUBLE)
                ELSE ROUND(LEAST(100.0, value / (user_id % 7) * 100), 4)
           END AS clamped_pct
    FROM events
    """,
)
def udf_scalar_clamp(spark, sf_dir):
    """Q-UDF-1: Arrow-vectorized pandas UDF computing the reference's
    efficiency clamp (solarman.py:285); equals the built-in expression."""

    @F.pandas_udf("double")
    def clamp(value: pd.Series, denom: pd.Series) -> pd.Series:
        out = (value / denom * 100).clip(upper=100.0).round(4)
        # nullable Float64 so zero-denominator rows become SQL NULL (a bare
        # float NaN would stay NaN through Arrow, which is not NULL)
        out = out.astype("Float64")
        out[denom == 0] = pd.NA
        return out

    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        clamp(F.col("value"), (F.col("user_id") % 7).cast("double")).alias("clamped_pct"),
    )


@query(
    "udf_grouped_agg_mean", python_boundary=True,
    category="udf",
    oracle="""
    SELECT event_type,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value), 4)
             AS mean_value
    FROM events GROUP BY event_type
    """,
)
def udf_grouped_agg_mean(spark, sf_dir):
    """Q-UDF-2: grouped-agg pandas UDF == built-in avg. The UDF sums with
    math.fsum (exact) to match the decimal-accumulated oracle regardless of
    batch order."""
    import math

    @F.pandas_udf("double")
    def fsum_mean(v: pd.Series) -> float:
        return round(math.fsum(v) / len(v), 4)

    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(fsum_mean(F.col("value")).alias("mean_value"))


@query(
    "udf_map_in_pandas_decode", python_boundary=True,
    category="udf",
    oracle="""
    SELECT event_id,
           (event_id % 65536) * 65536 + ((event_id * 7) % 65536) AS combined_u32
    FROM events
    """,
)
def udf_map_in_pandas_decode(spark, sf_dir):
    """Q-UDF-3: mapInPandas two-u16 → one-u32 big-endian combine — the
    reference's quantity=2 register reads (solarman.py:278,280,299,305-307)
    as a table UDF over Arrow batches."""
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("event_id") % 65536).alias("hi"),
        ((F.col("event_id") * 7) % 65536).alias("lo"),
    )

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hi = pdf["hi"].to_numpy(dtype="int64")
            lo = pdf["lo"].to_numpy(dtype="int64")
            yield pd.DataFrame(
                {"event_id": pdf["event_id"], "combined_u32": (hi << 16) | lo}
            )

    return ev.mapInPandas(combine, schema="event_id bigint, combined_u32 bigint")


@query(
    "udtf_split_tokens", python_boundary=True,
    category="udf",
    oracle="""
    SELECT doc_id, g.i - 1 AS pos, string_split(text, ' ')[g.i] AS tok
    FROM documents,
         LATERAL (SELECT UNNEST(generate_series(1, len(string_split(text, ' ')))) AS i) g
    WHERE doc_id < 50
    """,
)
def udtf_split_tokens(spark, sf_dir):
    """Python UDTF (Spark 4 user-defined TABLE function): tokenize with
    positions via a lateral join — the UDTF form of A1's row-expanding
    decode. Row-at-a-time Python is the slow path (the suite's built-in
    posexplode does this JVM-side); registered here to cover the UDTF
    API surface itself, on a bounded 50-doc slice."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class SplitTokens:
        def eval(self, text: str):
            for i, t in enumerate(text.split(" ")):
                yield i, t

    spark.udtf.register("split_tokens", SplitTokens)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.pos, s.tok FROM _udtf_docs, LATERAL split_tokens(text) s"
    )


@query(
    "udf_arrow_python", python_boundary=True,
    category="udf",
    oracle="""
    SELECT event_id,
           CASE WHEN user_id % 7 = 0 THEN CAST(NULL AS DOUBLE)
                ELSE ROUND(LEAST(100.0, value / (user_id % 7) * 100), 4)
           END AS clamped_pct
    FROM events
    """,
)
def udf_arrow_python(spark, sf_dir):
    """Spark 4 ARROW-OPTIMIZED row Python UDF (``useArrow=True``) — the
    third UDF tier between classic pickled row UDFs and pandas_udf:
    row-at-a-time Python semantics (plain scalars in, scalar out — no
    pandas API surface) but Arrow-batch serialization, removing the
    pickle round trip that makes classic UDFs the slowest path. Same
    clamp math and the same oracle as udf_scalar_clamp, so the three
    tiers (built-in expr via proj_clamp_nullsafe, pandas_udf via
    udf_scalar_clamp, arrow-Python here) are provably value-identical —
    the benchmark-visible difference is purely the boundary. Still a
    declared Python boundary: never in an unlisted hot path."""

    @F.udf("double", useArrow=True)
    def clamp(value, denom):
        if denom == 0:
            return None
        return round(min(100.0, value / denom * 100), 4)

    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        clamp(F.col("value"), (F.col("user_id") % 7).cast("double")).alias("clamped_pct"),
    )


@query(
    "udtf_analyze_polymorphic", python_boundary=True,
    category="udf",
    oracle="""
    SELECT doc_id,
           string_split(text, ' ')[1] AS col_0,
           string_split(text, ' ')[2] AS col_1,
           string_split(text, ' ')[3] AS col_2
    FROM documents WHERE doc_id < 50
    """,
)
def udtf_analyze_polymorphic(spark, sf_dir):
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output
    schema is computed at PLAN time from the call's literal arguments —
    here first_k(text, 3) decides at analysis that it returns columns
    col_0..col_2 — the mechanism behind schema-flexible table functions
    (read_files-style sources, unpivot-by-name helpers) that a static
    returnType cannot express. The eval body pads/truncates to the
    analyzed width so the runtime schema always matches the planned
    one. Bounded 50-doc slice like udtf_split_tokens: this covers the
    API surface; the JVM-side equivalent of THIS call shape is a plain
    split+getItem projection, which the oracle uses."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult
    from pyspark.sql.types import StringType, StructType

    @udtf
    class FirstK:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            n = int(k.value)
            st = StructType()
            for i in range(n):
                st = st.add(f"col_{i}", StringType())
            return AnalyzeResult(schema=st)

        def eval(self, text: str, k: int):
            toks = text.split(" ")[:k]
            toks += [None] * (k - len(toks))
            yield tuple(toks)

    spark.udtf.register("first_k", FirstK)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_poly_docs")
    return spark.sql(
        "SELECT doc_id, s.* FROM _udtf_poly_docs, LATERAL first_k(text, 3) s"
    )
