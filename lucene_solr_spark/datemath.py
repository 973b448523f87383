"""Solr date math — ``NOW/DAY+6MONTHS+3DAYS/DAY``.

Reimplements ``solr/core/src/java/org/apache/solr/util/DateMathParser.java``
(from scratch, semantics only): an optional absolute ISO-8601 anchor
(``2011-05-12T10:30:00Z``, else NOW), then a chain of ``+N UNIT`` /
``-N UNIT`` adds and ``/UNIT`` roundings (truncation toward the epoch
floor), evaluated LEFT TO RIGHT (the reference walks the string once).

Units per ``DateMathParser.CALENDAR_UNITS``: YEAR(S), MONTH(S), DAY(S)/
DATE, HOUR(S), MINUTE(S), SECOND(S), MILLI(S)/MILLISECOND(S). Month adds
clamp the day-of-month like ``Calendar.add`` (Jan 31 + 1MONTH = Feb 28/29).

Solr freezes NOW once per request, so the parsed result is a concrete
timestamp — in a query plan it enters as a literal (the same way the
reference's parsed Date does), keeping range predicates pushdown-able.
"""

from __future__ import annotations

import calendar
import re
from datetime import datetime, timedelta, timezone

_UNITS = {
    "YEAR": "year", "YEARS": "year",
    "MONTH": "month", "MONTHS": "month",
    "DAY": "day", "DAYS": "day", "DATE": "day",
    "HOUR": "hour", "HOURS": "hour",
    "MINUTE": "minute", "MINUTES": "minute",
    "SECOND": "second", "SECONDS": "second",
    "MILLI": "milli", "MILLIS": "milli",
    "MILLISECOND": "milli", "MILLISECONDS": "milli",
}

_OP_RE = re.compile(r"([+\-/])(\d*)([A-Z]+)?")


def _add_months(dt: datetime, n: int) -> datetime:
    """Calendar.add(MONTH, n) with day-of-month clamping."""
    m = dt.month - 1 + n
    year = dt.year + m // 12
    month = m % 12 + 1
    day = min(dt.day, calendar.monthrange(year, month)[1])
    return dt.replace(year=year, month=month, day=day)


def _add(dt: datetime, unit: str, n: int) -> datetime:
    if unit == "year":
        return _add_months(dt, 12 * n)
    if unit == "month":
        return _add_months(dt, n)
    if unit == "day":
        return dt + timedelta(days=n)
    if unit == "hour":
        return dt + timedelta(hours=n)
    if unit == "minute":
        return dt + timedelta(minutes=n)
    if unit == "second":
        return dt + timedelta(seconds=n)
    return dt + timedelta(milliseconds=n)


def _round(dt: datetime, unit: str) -> datetime:
    """Truncate to the start of ``unit`` (DateMathParser.round)."""
    if unit == "year":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "month":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "day":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "hour":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "minute":
        return dt.replace(second=0, microsecond=0)
    if unit == "second":
        return dt.replace(microsecond=0)
    # milli: drop sub-millisecond
    return dt.replace(microsecond=dt.microsecond // 1000 * 1000)


def parse_datemath(expr: str, now: datetime | None = None) -> datetime:
    """Evaluate a Solr date-math expression to a UTC datetime.

    ``expr``: ``NOW``-anchored math (``NOW/DAY-7DAYS``) or an absolute
    ISO-8601 anchor followed by math (``2024-02-29T00:00:00Z+1YEAR``).
    ``now``: the frozen request time (UTC assumed if naive); required when
    the expression uses NOW."""
    s = expr.strip()
    if s.startswith("NOW"):
        if now is None:
            raise ValueError("expression anchored at NOW needs a `now`")
        anchor, rest = now, s[3:]
    else:
        # absolute anchor runs until the first math operator AFTER the 'Z'
        # (a '-' inside the ISO date must not split); sentinel-mark Z+ / Z-
        # / Z/ so the anchor is everything before the first marker
        marked = s.replace("Z+", "Z\x00").replace("Z-", "Z\x01").replace("Z/", "Z\x02")
        if "\x00" in marked or "\x01" in marked or "\x02" in marked:
            iso = marked.split("\x00")[0].split("\x01")[0].split("\x02")[0]
            rest = s[len(iso):]
        elif s.endswith("Z"):
            iso, rest = s, ""
        else:
            raise ValueError(f"bad date math anchor: {expr!r}")
        anchor = datetime.fromisoformat(iso.replace("Z", "+00:00"))
    if anchor.tzinfo is None:
        anchor = anchor.replace(tzinfo=timezone.utc)
    dt = anchor.astimezone(timezone.utc)

    pos = 0
    while pos < len(rest):
        m = _OP_RE.match(rest, pos)
        if not m or m.end() == pos:
            raise ValueError(f"bad date math at {rest[pos:]!r} in {expr!r}")
        op, num, unit_s = m.group(1), m.group(2), m.group(3)
        if unit_s not in _UNITS:
            raise ValueError(f"unknown unit {unit_s!r} in {expr!r}")
        unit = _UNITS[unit_s]
        if op == "/":
            if num:
                raise ValueError(f"rounding takes no number: {expr!r}")
            dt = _round(dt, unit)
        else:
            n = int(num) if num else 1
            dt = _add(dt, unit, n if op == "+" else -n)
        pos = m.end()
    return dt
