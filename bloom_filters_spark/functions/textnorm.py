"""Deterministic HTML text extraction (the per-row invariant).

north_rule input_hint: "per-row invariant vs the reference:
byte-identical extracted text per url". The synthetic pages table
(sources/pages.py) builds html FROM text with a fixed template, so
``extract_text(html) == text`` is exactly testable byte-for-byte.

Two implementations with identical semantics:
- ``extract_text_scalar``  — the reference scalar implementation
  (driver-side truth for the invariant test);
- ``with_extracted_text`` — the pipeline version: vectorized pandas UDF
  over the binary html column (Arrow batches; bytes ops only).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_OPEN = b"<p>"
_CLOSE = b"</p>"


def extract_text_scalar(html: bytes) -> str:
    """Scalar reference: text = utf-8 of the first <p>...</p> span."""
    if html is None:
        return None
    i = html.find(_OPEN)
    if i < 0:
        return ""
    j = html.find(_CLOSE, i + len(_OPEN))
    if j < 0:
        j = len(html)
    return html[i + len(_OPEN):j].decode("utf-8", errors="replace")


def with_extracted_text(df: DataFrame, html_col: str = "html",
                        out_col: str = "extracted_text") -> DataFrame:
    # UDF created lazily: pandas_udf type resolution needs a live session
    @F.pandas_udf("string")
    def extract_udf(html: pd.Series) -> pd.Series:
        return html.map(lambda b: extract_text_scalar(bytes(b))
                        if b is not None else None)

    return df.withColumn(out_col, extract_udf(F.col(html_col)))
