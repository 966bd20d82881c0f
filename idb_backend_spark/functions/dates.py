"""F8 — permissive date parsing (reference conversions.py:567-629).

The reference's observable semantics come from dateutil's leniency:
input uppercased, missing components filled from a default of
0001-01-01, result coerced to UTC. ``to_timestamp`` cannot reproduce
this, so the parse is an Arrow-batched pandas UDF — the one genuinely
Python step on the enrichment hot path (it also dominated the
reference's profile at 0.398 ms/record, conversions.py:922).

Scale note: the UDF runs once per row over Arrow batches; everything
around it (fallback assembly, bounds flags, startdayofyear) is native
expression code in enrichment.py.
"""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

_DEFAULT = datetime.datetime(1, 1, 1)

#: Spark TimestampType bottoms out at 0001-01-01T00:00:00Z; dateutil can
#: emit year-1 dates from junk input, which round-trip fine through Arrow.


def parse_date_py(value) -> datetime.datetime | None:
    """The reference parse (conversions.py:585-598): uppercase, permissive
    dateutil parse with 0001-01-01 default, force UTC, None on failure."""
    if value is None:
        return None
    import dateutil.parser

    try:
        x = dateutil.parser.parse(str(value).strip().upper(), default=_DEFAULT)
        if x.tzinfo is None:
            x = x.replace(tzinfo=datetime.timezone.utc)
        # astimezone stays INSIDE the try: a bare time with a positive
        # offset ('00:30+01:00') parses onto the 0001-01-01 default and
        # the UTC conversion then underflows year 1 -> OverflowError;
        # one such record must yield null, not kill the batch
        return x.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    except (ValueError, OverflowError, TypeError):
        return None


@F.pandas_udf(TimestampType())
def date_parse_udf(s: pd.Series) -> pd.Series:
    return s.map(parse_date_py)


def parsed_date(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return date_parse_udf(c)
