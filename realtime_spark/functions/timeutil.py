"""Timestamp-to-epoch helpers that are safe for TIMESTAMP_NTZ columns.

The driver's testdata parquet carries `timestamp[us]` without a timezone,
which Spark 4 reads as TIMESTAMP_NTZ (spark.sql.parquet.inferTimestampNTZ
defaults on). TIMESTAMP_NTZ cannot be CAST to numeric types
(DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION), so every `ts.cast("long")`
shortcut breaks on real source data. These helpers work for both TIMESTAMP
and TIMESTAMP_NTZ inputs:

- `epoch_seconds` uses `unix_timestamp`, which accepts both types and
  interprets NTZ wall time as UTC *independently of the session timezone*
  (verified against DuckDB's `epoch()` on naive timestamps).
- `epoch_micros` routes through a `timestamp_ltz` cast; for NTZ input the
  session timezone is applied, so engine sessions pin UTC (session.py /
  tune_session) to match the oracle. Preferred for sub-second math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def epoch_seconds(c: Column | str) -> Column:
    """Whole epoch seconds (floor), NTZ-safe and timezone-stable.

    Matches DuckDB `CAST(floor(epoch(ts)) AS BIGINT)` for naive timestamps.
    """
    return F.unix_timestamp(_col(c))


def epoch_micros(c: Column | str) -> Column:
    """Epoch microseconds as BIGINT, NTZ-safe (UTC session assumed for NTZ)."""
    return F.unix_micros(_col(c).cast("timestamp_ltz"))


def epoch_fraction(c: Column | str) -> Column:
    """Fractional epoch seconds as DOUBLE — the NTZ-safe replacement for
    `ts.cast("double")`. Matches DuckDB `epoch(ts)`."""
    return epoch_micros(c) / F.lit(1000000.0)
