"""Vietnamese text normalization for the listing domain (SURVEY.md
§2.8 'diacritic folding', §2.10 'price-text parsing', §7d).

The corpus is Vietnamese housing ads: district names like "Quận Ba
Đình", free-text prices like "5,6 tỷ" (5.6 billion VND) or "8 triệu/
tháng" (8M/month). These are the domain-specific scalar functions the
analytics layer needs.

Diacritic folding is a pure `translate` — JVM-side, codegen-friendly.
Price parsing needs real tokenization -> Arrow-vectorized pandas_udf.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# every precomposed Vietnamese vowel/consonant -> ASCII base letter
_VI = "àáảãạăằắẳẵặâầấẩẫậèéẻẽẹêềếểễệìíỉĩịòóỏõọôồốổỗộơờớởỡợùúủũụưừứửữựỳýỷỹỵđ"
_ASCII = "a" * 17 + "e" * 11 + "i" * 5 + "o" * 17 + "u" * 11 + "y" * 5 + "d"
_VI_FULL = _VI + _VI.upper()
_ASCII_FULL = _ASCII + _ASCII.upper()
assert len(_VI_FULL) == len(_ASCII_FULL)

# administrative prefixes (SURVEY §1.2 rows 7-10): "Quận X" -> "X"
_ADMIN_PREFIX = r"^(Quận|Huyện|Thị xã|Thành phố|Phường|Xã|Thị trấn|Đường)\s+"


def fold_diacritics(col: Column) -> Column:
    """'Quận Ba Đình' -> 'Quan Ba Dinh' — one translate() call,
    whole-stage-codegen'd; the normalization key for joins/grouping
    over free-text Vietnamese names."""
    return F.translate(col, _VI_FULL, _ASCII_FULL)


def strip_admin_prefix(col: Column) -> Column:
    """'Quận Ba Đình' -> 'Ba Đình', 'Phường Cống Vị' -> 'Cống Vị'."""
    return F.regexp_replace(col, _ADMIN_PREFIX, "")


def norm_admin_key(col: Column) -> Column:
    """Canonical join key for admin names: strip prefix, fold, lower."""
    return F.lower(fold_diacritics(strip_admin_prefix(col)))


@F.pandas_udf(T.LongType())
def parse_price_vnd(text: pd.Series) -> pd.Series:
    """Vietnamese price text -> VND (vectorized, Arrow-batched).

    '5,6 tỷ' -> 5_600_000_000; '850 triệu' -> 850_000_000;
    '8 triệu/tháng' -> 8_000_000 (per-period suffix ignored);
    'Thỏa thuận' (negotiable) / unparseable -> null.
    """
    extracted = text.str.extract(r"(?i)([\d.,]+)\s*(tỷ|ty|triệu|trieu|nghìn|nghin|k\b)?", expand=True)
    num = (
        extracted[0]
        .str.replace(".", "", regex=False)  # thousands separator
        .str.replace(",", ".", regex=False)  # decimal comma
        .astype("float64", errors="ignore")
    )
    num = pd.to_numeric(num, errors="coerce")
    unit = extracted[1].str.lower().map(
        {"tỷ": 1e9, "ty": 1e9, "triệu": 1e6, "trieu": 1e6, "nghìn": 1e3, "nghin": 1e3, "k": 1e3}
    )
    vnd = num * unit.fillna(1.0)
    return vnd.round().astype("Int64")


# The pandas UDF above is module-level; the driver may import this repo
# from a non-repo cwd where Python workers cannot re-import it, so the
# module is registered for by-value pickling (the UDF's code ships
# inside the serialized task, no import needed worker-side).
import sys as _sys  # noqa: E402

from pyspark import cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
