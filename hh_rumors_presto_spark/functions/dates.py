"""Date scalar functions (SURVEY.md §2.A rows 8 and 19)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's nonstandard month abbreviations (fetchRumors.js:157):
# bare "May", "Jun." / "Jul." / "Sep." — NOT what any locale's MMM gives,
# so date_format(c, 'MMM. d, yyyy') would be wrong for 4 of 12 months.
MONTH_ABBREV = (
    "Jan.", "Feb.", "Mar.", "Apr.", "May", "Jun.",
    "Jul.", "Aug.", "Sep.", "Oct.", "Nov.", "Dec.",
)

_DATE_IN_TEXT = r"([A-Za-z]+\s+\d{1,2},\s+\d{4})"


def extract_iso_date(c: Column) -> Column:
    """Find a "Month D, YYYY" phrase anywhere in the text -> DateType.

    Mirrors ``extractISODate`` (fetchRumors.js:41-50) but returns a proper
    DATE (null on no-match) instead of a "YYYY-MM-DD"-or-'' string; Spark's
    month-name parser replaces the hand-rolled MONTHS map.
    """
    phrase = F.regexp_extract(F.coalesce(c, F.lit("")), _DATE_IN_TEXT, 1)
    normalized = F.regexp_replace(phrase, r"\s+", " ")
    # try_to_date: the regex admits non-dates ("Boston 12, 2024"); ANSI
    # to_date would throw where the reference returns '' — null instead.
    return F.try_to_date(F.nullif(normalized, F.lit("")), "MMMM d, yyyy")


def fmt_month_abbrev(c: Column) -> Column:
    """Format a date as e.g. "Oct. 15, 2025" per fetchRumors.js:153-159.

    Uses an element_at over the literal abbreviation table; day is NOT
    zero-padded. Null/invalid input -> '' (the reference returns ''):
    try_cast, because Spark 4 ANSI mode makes plain cast throw on malformed
    strings.
    """
    d = c.try_cast("date")
    pretty = F.concat(
        F.element_at(F.array(*[F.lit(m) for m in MONTH_ABBREV]), F.month(d)),
        F.lit(" "),
        F.dayofmonth(d).cast("string"),
        F.lit(", "),
        F.year(d).cast("string"),
    )
    return F.coalesce(pretty, F.lit(""))
