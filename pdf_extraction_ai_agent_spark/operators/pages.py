"""X2 — page split on '--- PAGE n ---' markers.

Reference: pagewise_llm_runner.py:120-133 (regex split keeping captured page
numbers). Spark shape: regexp_extract_all for the numbers + split for the
bodies, arrays_zip + posexplode — document order preserved, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MARKER_SPLIT = r"(?m)^--- PAGE\s+\d+\s+---\n?"
_MARKER_NUM = r"(?m)^--- PAGE\s+(\d+)\s+---$"


def split_pages(df: DataFrame, text_col: str = "extracted_text",
                keep_cols: list[str] | None = None) -> DataFrame:
    """One row per page: (*keep_cols, page_no int, page_text string).
    Documents without markers yield a single page_no=1 row."""
    keep_cols = keep_cols if keep_cols is not None else ["conv_id", "turn_idx"]
    text = F.col(text_col)
    nums = F.regexp_extract_all(text, F.lit(_MARKER_NUM), 1)
    bodies_all = F.split(text, _MARKER_SPLIT)
    # when markers exist the first split element is the pre-marker prefix
    # (empty for our extractor) — drop it; otherwise keep the single body
    has_pages = F.size(nums) > 0
    bodies = F.when(has_pages, F.slice(bodies_all, 2, F.size(bodies_all) - 1)).otherwise(bodies_all)
    page_nos = F.when(has_pages, F.transform(nums, lambda n: n.cast("int"))).otherwise(
        F.array(F.lit(1))
    )
    zipped = F.arrays_zip(page_nos.alias("page_no"), bodies.alias("body"))
    out = df.select(*keep_cols, F.posexplode(zipped).alias("page_pos", "p"))
    return out.select(
        *keep_cols,
        F.col("p.page_no").alias("page_no"),
        # Spark trim() strips spaces only — strip all whitespace like
        # python .strip()
        F.regexp_replace(F.col("p.body"), r"^\s+|\s+$", "").alias("page_text"),
    )
