"""araddon/dateparse.ParseAny parity table (the reference's date parser,
/root/reference/parser-parse.go:149-156), ported from the library's public
README format list. Semantics pinned here:

* ambiguous a/b/yyyy is MONTH-first (US) — both engines agree
* two-digit years follow Go's century rule (69-99 -> 19xx), NOT dateutil's
  sliding window ('71 must be 1971, not 2071)
* an explicit numeric offset beats a zone abbreviation (PST-08 -> -08:00)
* unknown zone abbreviations mean offset ZERO (Go time.Parse attaches a
  zero-offset FixedZone; the reference compares instants)
* all-digit strings: yyyymmdd / yyyymmddhhmmss calendars, then unix
  epochs by length (sec/ms/us/ns)
"""

from datetime import datetime, timedelta

import pytest

from go_readability_spark.readability.metadata import parse_date

# (input, expected naive wall-clock fields, expected utcoffset minutes —
#  None = naive result expected)
TABLE = [
    ("May 8, 2009 5:57:51 PM", (2009, 5, 8, 17, 57, 51), None),
    ("oct 7, 1970", (1970, 10, 7), None),
    ("oct. 7, 1970", (1970, 10, 7), None),
    ("September 17, 2012 10:09am", (2012, 9, 17, 10, 9), None),
    ("September 17, 2012, 10:10:09", (2012, 9, 17, 10, 10, 9), None),
    ("October 7th, 1970", (1970, 10, 7), None),
    ("12 Feb 2006, 19:17", (2006, 2, 12, 19, 17), None),
    ("7 oct 1970", (1970, 10, 7), None),
    ("03 February 2013", (2013, 2, 3), None),
    ("1 July 2013", (2013, 7, 1), None),
    ("2013-Feb-03", (2013, 2, 3), None),
    # US-order slashes, incl. Go's two-digit-year century rule
    ("3/31/2014", (2014, 3, 31), None),
    ("03/31/2014", (2014, 3, 31), None),
    ("08/21/71", (1971, 8, 21), None),
    ("4/8/2014 22:05", (2014, 4, 8, 22, 5), None),
    ("04/08/2014 22:05", (2014, 4, 8, 22, 5), None),
    ("8/8/1965 12:00:00 AM", (1965, 8, 8, 0, 0, 0), None),
    ("8/8/1965 01:00 PM", (1965, 8, 8, 13, 0), None),
    ("2014/3/31", (2014, 3, 31), None),
    ("2014/03/31", (2014, 3, 31), None),
    # dotted dates
    ("3.31.2014", (2014, 3, 31), None),
    ("03.31.2014", (2014, 3, 31), None),
    ("2014.03.30", (2014, 3, 30), None),
    # yyyy-mm-dd family
    ("2014-04-26 05:24:37 PM", (2014, 4, 26, 17, 24, 37), None),
    ("2013-04-01 22:43", (2013, 4, 1, 22, 43), None),
    ("2013-04-01 22:43:22", (2013, 4, 1, 22, 43, 22), None),
    ("2014-05-11 08:20:13,787", (2014, 5, 11, 8, 20, 13, 787000), None),
    ("2014-12-16 06:20:00 UTC", (2014, 12, 16, 6, 20, 0), 0),
    ("2014-12-16 06:20:00 GMT", (2014, 12, 16, 6, 20, 0), 0),
    ("2014-04-26 13:13:43 +0800", (2014, 4, 26, 13, 13, 43), 480),
    ("2014-04-26 13:13:44 +09:00", (2014, 4, 26, 13, 13, 44), 540),
    # Go time.String() forms: explicit offset then zone name
    ("2012-08-03 18:31:59.257000000 +0000 UTC", (2012, 8, 3, 18, 31, 59, 257000), 0),
    ("2015-02-18 00:12:00 +0000 GMT", (2015, 2, 18, 0, 12, 0), 0),
    # CJK dates
    ("2014年04月08日", (2014, 4, 8), None),
    ("2014年4月8日", (2014, 4, 8), None),
    # ANSIC / RFC822 / RFC1123 variants
    ("Mon Jan  2 15:04:05 2006", (2006, 1, 2, 15, 4, 5), None),
    ("Mon Jan 02 15:04:05 -0700 2006", (2006, 1, 2, 15, 4, 5), -420),
    ("Thu, 4 Jan 2018 17:53:36 +0000", (2018, 1, 4, 17, 53, 36), 0),
    ("Tue, 11 Jul 2017 16:28:13 +0200 (CEST)", (2017, 7, 11, 16, 28, 13), 120),
    # abbreviation glued to explicit offset: offset wins, sign preserved
    ("September 17, 2012 at 10:09am PST-08", (2012, 9, 17, 10, 9), -480),
    # digit-only calendars and epochs
    ("20140601", (2014, 6, 1), None),
    ("20140722105203", (2014, 7, 22, 10, 52, 3), None),
    ("1332151919", (2012, 3, 19, 10, 11, 59), 0),
    ("1384216367189", (2013, 11, 12, 0, 32, 47, 189000), 0),
    # fractional seconds without tz
    ("14 May 2019 19:11:40.164", (2019, 5, 14, 19, 11, 40, 164000), None),
]


@pytest.mark.parametrize("raw,parts,off_min", TABLE, ids=[t[0] for t in TABLE])
def test_dateparse_table(raw, parts, off_min):
    got = parse_date(raw)
    assert got is not None, raw
    assert got.replace(tzinfo=None) == datetime(*parts), raw
    if off_min is None:
        assert got.utcoffset() is None, f"{raw}: expected naive, got {got.utcoffset()}"
    else:
        assert got.utcoffset() == timedelta(minutes=off_min), raw


def test_unknown_zone_abbreviation_is_offset_zero():
    """Go time.Parse can't load 'MST' without a zone db and attaches a
    zero-offset zone; instants must compare equal to the reference's."""
    got = parse_date("Mon, 02 Jan 2006 15:04:05 MST")
    assert got is not None
    assert got.replace(tzinfo=None) == datetime(2006, 1, 2, 15, 4, 5)
    assert got.utcoffset() == timedelta(0)


def test_garbage_returns_none():
    assert parse_date("") is None
    assert parse_date(None) is None
    assert parse_date("not a date at all") is None
    assert parse_date("99999999") is None  # invalid yyyymmdd


def test_nanosecond_epoch_keeps_fraction():
    """Review finding (round 2): the us/ns epoch microsecond conversion
    multiplied by a floored 10**6//scale (0 for ns), silently dropping the
    fractional second."""
    got = parse_date("1384216367189000000")  # ns
    assert got.replace(tzinfo=None) == datetime(2013, 11, 12, 0, 32, 47, 189000)
    got = parse_date("1384216367189123")  # us
    assert got.replace(tzinfo=None) == datetime(2013, 11, 12, 0, 32, 47, 189123)
