"""Arrow-batched vectorized UDFs (no per-row Python at the Spark level).

Only operations with no native Spark expression live here: Unicode NFKC and
category tables, RFC-3986 relative-URL resolution, charset sniffing, Chinese
numerals. Each wraps a pure function from ``pure.py``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType

from . import pure


@F.pandas_udf(StringType())
def nfkc(s: pd.Series) -> pd.Series:
    return s.fillna("").str.normalize("NFKC")


@F.pandas_udf(StringType())
def norm_text(s: pd.Series) -> pd.Series:
    return s.map(pure.norm_text, na_action="ignore")


@F.pandas_udf(StringType())
def safe_filename(s: pd.Series) -> pd.Series:
    return s.map(pure.safe_filename, na_action="ignore")


@F.pandas_udf(StringType())
def structured_filename(url: pd.Series, doc_type: pd.Series) -> pd.Series:
    return pd.Series(
        [pure.structured_filename(u, t) if u is not None else None
         for u, t in zip(url, doc_type)]
    )


@F.pandas_udf(StringType())
def urljoin_resolve(base: pd.Series, href: pd.Series) -> pd.Series:
    return pd.Series([pure.urljoin_resolve(b, h) for b, h in zip(base, href)])


@F.pandas_udf(StringType())
def decode_bytes(data: pd.Series) -> pd.Series:
    return data.map(pure.decode_bytes, na_action="ignore")


@F.pandas_udf(IntegerType())
def chinese_to_int(s: pd.Series) -> pd.Series:
    return s.map(pure.chinese_to_int, na_action="ignore").astype("Int32")


@F.pandas_udf(StringType())
def int_to_chinese(n: pd.Series) -> pd.Series:
    return n.map(lambda v: pure.int_to_chinese(int(v)), na_action="ignore")
