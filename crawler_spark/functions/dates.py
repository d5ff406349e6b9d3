"""Release-date parsing (lib/utils.js:70-97 `extractDate`): a coalesce
chain over the formats the reference tries in order — ISO 8601, RFC
2822, HTTP-date, SQL timestamp, then the pom-properties custom format —
followed by the sanity window (1950-01-01, now + 30 days]; anything
unparseable or out of window is null.

Pure `try_to_timestamp` coalesce — every branch is JVM-side, no UDFs,
and `try_` variants never throw under ANSI mode. `now` is an explicit
parameter (the reference uses wall-clock; a deterministic engine stamps
the epoch time once and passes it in, which also keeps the DuckDB oracle
exact).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_VALID_START = "1950-01-01"


def extract_date(raw: Column, now: Column | str) -> Column:
    """Timestamp or null, per the reference's parse-then-window rule.
    `now` bounds the future window at now + 30 days (utils.js:94-96).

    The weekday-named formats (RFC 2822 / HTTP-date / pom properties)
    can't use 'EEE' — Spark ≥3.0 allows 'E' for formatting only — so the
    weekday prefix is regex-stripped first; luxon's parsers don't
    validate the weekday against the date either, so semantics match.
    """
    now_ts = F.to_timestamp(F.lit(now)) if isinstance(now, str) else now
    # 'Tue, 01 Nov …' / 'Sun, 06 Nov …' → '01 Nov …'
    no_dow_comma = F.regexp_replace(raw, r"^[A-Za-z]{3},\s*", "")
    # 'Mon Mar 2 …' → 'Mar 2 …' (pom properties form)
    no_dow_space = F.regexp_replace(raw, r"^[A-Za-z]{3}\s+(?=[A-Za-z])", "")
    parsed = F.coalesce(
        F.try_to_timestamp(raw),  # ISO / SQL / date-only via the default cast
        F.try_to_timestamp(no_dow_comma, F.lit("d MMM yyyy HH:mm:ss Z")),       # RFC 2822
        F.try_to_timestamp(no_dow_comma, F.lit("dd MMM yyyy HH:mm:ss 'GMT'")),  # HTTP-date
        F.try_to_timestamp(no_dow_space, F.lit("MMM d HH:mm:ss 'GMT'XXX yyyy")),  # pom
    )
    # START boundary is EXCLUSIVE: the reference wraps the parsed date in
    # a zero-length luxon Interval and tests interval.isBefore(validStart)
    # = `end <= validStart` (half-open intervals), so a date of exactly
    # 1950-01-01T00:00:00 is rejected. The END boundary is inclusive
    # (isAfter = `start > validEnd`).
    in_window = (parsed > F.to_timestamp(F.lit(_VALID_START))) & (
        parsed <= now_ts + F.expr("INTERVAL 30 DAYS")
    )
    return F.when(in_window, parsed)


def extract_date_py(raw: str | None, now: "datetime.datetime") -> "datetime.datetime | None":
    """Pure-Python twin of `extract_date` for the parity simulator: same
    parse order, same fixups, same window; returns a naive UTC datetime.
    The engine parity tests assert the Spark chain and this one agree on
    every generated registry date."""
    import datetime as dt
    import email.utils

    if not raw:
        return None

    def norm(d: dt.datetime) -> dt.datetime:
        if d.tzinfo is not None:
            d = d.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return d

    import re as _re

    # Spark's RFC-2822 branch only sees 'd MMM yyyy …' after the comma-form
    # weekday strip, so an asctime/pom-shaped 'Mon Mar 2 …' can never land
    # there; Python's email.utils is leniently asctime-tolerant (it would
    # swallow the pom string and drop its GMT+hh:mm offset), so gate it off
    # that shape to keep the twins aligned.
    asctime_shape = bool(_re.match(r"^[A-Za-z]{3}\s+[A-Za-z]", raw))
    parsed: dt.datetime | None = None
    for attempt in (
        lambda: dt.datetime.fromisoformat(raw.replace("Z", "+00:00")),
        lambda: (None if asctime_shape else email.utils.parsedate_to_datetime(raw)),  # RFC 2822
        lambda: dt.datetime.strptime(raw, "%a, %d %b %Y %H:%M:%S GMT"),  # HTTP
        lambda: dt.datetime.strptime(raw, "%Y-%m-%d %H:%M:%S"),  # SQL
        # pom properties: 'Mon Mar 2 20:46:54 GMT+01:00 2015'
        lambda: dt.datetime.strptime(raw.replace("GMT", ""), "%a %b %d %H:%M:%S %z %Y"),
    ):
        try:
            parsed = norm(attempt())
            break
        except (ValueError, TypeError, IndexError, AttributeError):
            continue
    if parsed is None:
        return None
    if parsed <= dt.datetime(1950, 1, 1) or parsed > now + dt.timedelta(days=30):
        return None  # start exclusive, end inclusive — see extract_date
    return parsed
