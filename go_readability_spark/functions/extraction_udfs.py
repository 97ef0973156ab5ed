"""SQL-callable extraction functions: register the readability engine as
Arrow-batched pandas UDFs so users can call it from Spark SQL directly:

    SELECT url, readability_text(html) FROM pages WHERE readerable(html)

The heavy pipeline entry point remains plans.extract_pages (mapInPandas
with lineage); these UDFs are the ad-hoc query surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T


@F.pandas_udf(T.BooleanType())
def readerable(html: pd.Series) -> pd.Series:
    """CheckDocument as a SQL boolean (parser-check.go:25-80)."""
    from ..dom import parse_html
    from ..readability import check_document

    def one(h):
        try:
            return bool(check_document(parse_html(h if h is not None else b"")))
        except Exception:
            return False

    return html.map(one)


@F.pandas_udf(T.StringType())
def readability_text(html: pd.Series) -> pd.Series:
    """Extracted main text as a SQL string (Article.TextContent)."""
    from ..readability import Parser

    def one(h):
        try:
            return Parser().parse(h if h is not None else b"").text_content
        except Exception:
            return ""

    return html.map(one)


@F.pandas_udf(T.StringType())
def readability_title(html: pd.Series) -> pd.Series:
    from ..readability import Parser

    def one(h):
        try:
            return Parser().parse(h if h is not None else b"").title
        except Exception:
            return ""

    return html.map(one)


def register_all(spark) -> None:
    """Make the functions available to spark.sql queries."""
    spark.udf.register("readerable", readerable)
    spark.udf.register("readability_text", readability_text)
    spark.udf.register("readability_title", readability_title)
