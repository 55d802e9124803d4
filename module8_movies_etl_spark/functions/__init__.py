"""Scalar column-expression library (SURVEY.md §2.6-2.7).

Everything the reference implements as row-wise Python (regex
extraction of currency / dates / durations, lenient casts, conditional
fills) is re-expressed here as native Catalyst column expressions —
JVM-side, codegen'd, no UDFs. Each builder takes and returns
``pyspark.sql.Column`` so they compose inside any plan.
"""

from .casts import (  # noqa: F401
    coerce_bool,
    fill_nulls_zero,
    fill_zero_with,
    lenient_double,
    lenient_long,
    strict_cast_audit,
)
from .cleaning import (  # noqa: F401
    coalesce_first,
    consolidate_alt_titles,
    normalize_text,
    text_or_joined_array,
)
from .currency import (  # noqa: F401
    FORM_ONE,
    FORM_TWO,
    collapse_money_range,
    extract_currency,
    parse_dollars,
    strip_citations,
)
from .dates import (  # noqa: F401
    DATE_FORMS,
    extract_date_text,
    parse_multiformat_date,
    unix_seconds_to_timestamp,
)
from .durations import parse_running_time  # noqa: F401
