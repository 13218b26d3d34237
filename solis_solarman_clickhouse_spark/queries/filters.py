"""Q-FILT: compound predicates.

Declarative filters so Catalyst pushes every conjunct that Parquet can
evaluate into the scan (verify: PushedFilters in .explain). The reference's
analogous logic is config validation skip-on-invalid (solarman.py:82-125).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..tables import table
from .registry import query

_FILT_ORACLE = """
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE (p_type LIKE 'PROMO%' OR p_type IN ('ECONOMY', 'STANDARD'))
  AND p_size BETWEEN 5 AND 30
  AND p_name LIKE '%widget%'
  AND p_brand IS NOT NULL
"""


@query("filter_compound", category="filter", oracle=_FILT_ORACLE)
def filter_compound(spark, sf_dir):
    """Q-FILT-1: AND/OR, BETWEEN, IN, LIKE, IS NULL on part."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        (F.col("p_type").like("PROMO%") | F.col("p_type").isin("ECONOMY", "STANDARD"))
        & F.col("p_size").between(5, 30)
        & F.col("p_name").like("%widget%")
        & F.col("p_brand").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
