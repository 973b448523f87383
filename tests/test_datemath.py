"""Solr DateMathParser (datemath.py): NOW anchoring, left-to-right add and
round chains, month clamping, absolute ISO anchors, error cases."""

from datetime import datetime, timezone

import pytest

from lucene_solr_spark.datemath import parse_datemath

NOW = datetime(2024, 5, 17, 14, 35, 42, 123456, tzinfo=timezone.utc)


def dt(*a):
    return datetime(*a, tzinfo=timezone.utc)


def test_now_and_rounding():
    assert parse_datemath("NOW", NOW) == NOW
    assert parse_datemath("NOW/DAY", NOW) == dt(2024, 5, 17)
    assert parse_datemath("NOW/HOUR", NOW) == dt(2024, 5, 17, 14)
    assert parse_datemath("NOW/MONTH", NOW) == dt(2024, 5, 1)
    assert parse_datemath("NOW/YEAR", NOW) == dt(2024, 1, 1)
    assert parse_datemath("NOW/MINUTE", NOW) == dt(2024, 5, 17, 14, 35)
    assert parse_datemath("NOW/SECOND", NOW) == dt(2024, 5, 17, 14, 35, 42)
    assert parse_datemath("NOW/MILLI", NOW) == dt(2024, 5, 17, 14, 35, 42, 123000)


def test_adds_and_chains():
    assert parse_datemath("NOW+2HOURS", NOW) == NOW.replace(hour=16)
    assert parse_datemath("NOW-1DAY", NOW) == NOW.replace(day=16)
    assert parse_datemath("NOW+HOUR", NOW) == NOW.replace(hour=15)  # implicit 1
    # left-to-right: round THEN add THEN round again
    assert parse_datemath("NOW/DAY+6MONTHS+3DAYS/DAY", NOW) == dt(2024, 11, 20)
    assert parse_datemath("NOW/DAY-7DAYS", NOW) == dt(2024, 5, 10)
    assert parse_datemath("NOW+90MINUTES/HOUR", NOW) == dt(2024, 5, 17, 16)


def test_month_clamping():
    assert parse_datemath("2024-01-31T00:00:00Z+1MONTH") == dt(2024, 2, 29)
    assert parse_datemath("2023-01-31T00:00:00Z+1MONTH") == dt(2023, 2, 28)
    assert parse_datemath("2024-02-29T00:00:00Z+1YEAR") == dt(2025, 2, 28)
    assert parse_datemath("2024-01-31T00:00:00Z-1MONTH") == dt(2023, 12, 31)


def test_absolute_anchor_with_math():
    assert parse_datemath("2011-05-12T10:30:00Z/DAY") == dt(2011, 5, 12)
    assert parse_datemath("2011-05-12T10:30:00Z+2DAYS/DAY") == dt(2011, 5, 14)
    assert parse_datemath("2011-05-12T10:30:00Z") == dt(2011, 5, 12, 10, 30)


def test_errors():
    with pytest.raises(ValueError, match="needs a `now`"):
        parse_datemath("NOW/DAY")
    with pytest.raises(ValueError, match="unknown unit"):
        parse_datemath("NOW+2FORTNIGHTS", NOW)
    with pytest.raises(ValueError, match="rounding takes no number"):
        parse_datemath("NOW/2DAY", NOW)
    with pytest.raises(ValueError):
        parse_datemath("gibberish", NOW)
