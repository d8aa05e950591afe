"""U3/U4/U5 — money handling as native expressions.

Reference:
- U3 string-preserving extract  text_lob_llm_extractor.py:391-398
- U4 coerce to number           streamlit_e2e_app.py:379-397 (_coerce_money)
- U5 compare normalization      src/claim_extractor/compare_models.py:24-31

U4 returns DECIMAL(18,2) rather than double so cluster-scale aggregation is
exact and order-independent (a 100 TB sum of doubles is not reproducible
across shuffle orders; decimal is).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# U3 (text_lob_llm_extractor.py:396): first money-looking token, kept as str.
MONEY_PAT = r"([-$]?\d{1,3}(?:,\d{3})*(?:\.\d+)?|[-$]?\d+(?:\.\d+)?)"


def money_extract_col(col: Column) -> Column:
    """U3 — first money token as-written; falls back to trimmed input."""
    m = F.nullif(F.regexp_extract(col, MONEY_PAT, 1), F.lit(""))
    return F.coalesce(m, F.trim(col))


def money_coerce_col(col: Column) -> Column:
    """U4 — strip '$ , space'; '(x)' → -x; ''/'-' → 0.0; junk → 0.0.

    DECIMAL(18,2) output (see module docstring).
    """
    zero = F.lit(0).cast("decimal(18,2)")
    s = F.trim(col.cast("string"))
    is_paren = s.startswith("(") & s.endswith(")")
    inner = F.when(is_paren, F.regexp_replace(s, r"^\((.*)\)$", "$1")).otherwise(s)
    cleaned = F.regexp_replace(inner, r"[$, ]", "")
    # try_cast, not cast: under Spark 4's default ANSI mode a plain cast
    # THROWS on junk ("12.3.4") instead of yielding NULL — latent until a
    # fixture produced a merged two-number cell (q46)
    num = cleaned.try_cast("decimal(18,2)")  # junk → NULL
    signed = F.when(is_paren, -num).otherwise(num)
    return F.when(col.isNull() | cleaned.isin("", "-"), zero).otherwise(F.coalesce(signed, zero))


def money_compare_norm_col(col: Column) -> Column:
    """U5 — ensure leading '$', drop 'USD' and spaces (compare_models.py:24-31)."""
    s = F.regexp_replace(F.trim(F.regexp_replace(col.cast("string"), "USD", "")), " ", "")
    return F.when(s.startswith("$"), s).otherwise(F.concat(F.lit("$"), s))
