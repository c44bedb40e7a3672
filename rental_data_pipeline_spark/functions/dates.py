"""Russian relative-date parsing (SURVEY §2.7 X2) as a native
expression cascade with an injectable ``now``.

The reference (``data_process/normalize.py:26-91``) calls
``datetime.now()`` per record — nondeterministic. Here ``now`` is an
explicit parameter (SURVEY §7.4#2), so the whole cascade is a pure,
codegen-able column expression.

Semantics reproduced exactly:

- null/empty → null
- no ``HH:MM`` in the label → label passes through unchanged
- ``сегодня`` → today's date at HH:MM:00
- ``вчера``  → yesterday at HH:MM:00
- else ``"DD <word>"`` where <word> must *exactly* equal one of the 13
  month keys (янв фев мар апр май мая июн июл авг сен окт ноя дек) —
  otherwise the label passes through
- constructed date in the future → roll back one year
- impossible dates (Feb 30; Feb 29 after rollback) → null (the
  reference raises → returns NaT)
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact-match month keys → month number (ref normalize.py:60-74). The
# reference does a dict lookup on the full captured word, so genitive
# forms like "января" do NOT match — only these exact strings do.
RU_MONTHS: dict[str, int] = {
    "янв": 1,
    "фев": 2,
    "мар": 3,
    "апр": 4,
    "май": 5,
    "мая": 5,
    "июн": 6,
    "июл": 7,
    "авг": 8,
    "сен": 9,
    "окт": 10,
    "ноя": 11,
    "дек": 12,
}

_TIME_RE = r"(\d{1,2}):(\d{2})"
_DAY_MONTH_RE = r"(\d{1,2})\s+([а-яА-Я]+)"


def _now_col(now: _dt.datetime | str | Column | None) -> Column:
    if now is None:
        return F.current_timestamp()
    if isinstance(now, Column):
        return now
    if isinstance(now, _dt.datetime):
        now = now.strftime("%Y-%m-%d %H:%M:%S")
    return F.to_timestamp(F.lit(now))


def parse_russian_date(
    col: Column | str, now: _dt.datetime | str | Column | None = None
) -> Column:
    """X2, typed variant: label → TimestampType (null when the
    reference would pass the label through unparsed, unless the
    passthrough itself is an ISO timestamp string)."""
    c = F.col(col) if isinstance(col, str) else col
    ts = _parse_russian_date_ts(c, now)
    # Passthrough labels that are already "YYYY-MM-DD HH:MM:SS" (or ISO)
    # coerce via try_to_timestamp; genuinely unparseable → null. The
    # try_ form is load-bearing under ANSI (the Spark 4 default): a
    # plain to_timestamp on a passthrough label like 'поднято в топ'
    # THROWS CAST_INVALID_INPUT and kills the whole normalize/merge
    # job instead of nulling the field (ref: exception → NaT).
    return F.coalesce(ts, F.try_to_timestamp(c))


def parse_russian_date_label(
    col: Column | str, now: _dt.datetime | str | Column | None = None
) -> Column:
    """X2, string variant with the reference's exact passthrough rule:
    parseable → ``"%Y-%m-%d %H:%M:%S"``; no time / unknown month →
    original label; impossible date → null."""
    c = F.col(col) if isinstance(col, str) else col
    nowc = _now_col(now)

    hour = F.regexp_extract(c, _TIME_RE, 1)
    word = F.regexp_extract(c, _DAY_MONTH_RE, 2)

    has_time = hour != ""
    is_today = c.contains("сегодня")
    is_yesterday = c.contains("вчера")
    month = _month_from_word(F.lower(word))
    has_day_month = word != ""

    ts = _parse_russian_date_ts(c, nowc)
    formatted = F.date_format(ts, "yyyy-MM-dd HH:mm:ss")

    return (
        F.when(c.isNull() | (c == ""), F.lit(None).cast("string"))
        .when(~has_time, c)
        .when(is_today | is_yesterday, formatted)
        .when(~has_day_month, c)
        .when(month.isNull(), c)
        .otherwise(formatted)  # null here = impossible date = ref's NaT
    )


def _month_from_word(word: Column) -> Column:
    # One map literal instead of a 13-deep when/otherwise chain: the
    # chain costs ~26 py4j round-trips to BUILD and a 13-branch CASE to
    # analyze, per call site (this helper is instantiated twice per
    # parse). try_element_at on a map literal is one expression and
    # returns null on a missing key — identical semantics (plain
    # element_at THROWS on a missing key under ANSI, Spark 4 default).
    entries: list[Column] = []
    for name, num in RU_MONTHS.items():
        entries.extend([F.lit(name), F.lit(num)])
    return F.try_element_at(F.create_map(*entries), word)


def _parse_russian_date_ts(c: Column, now) -> Column:
    nowc = _now_col(now)

    hour = F.regexp_extract(c, _TIME_RE, 1)
    minute = F.regexp_extract(c, _TIME_RE, 2)
    has_time = hour != ""
    h = hour.cast("int")
    m = minute.cast("int")

    today = F.to_date(nowc)
    # try_to_timestamp, matching the day-month branch's try_make_
    # timestamp: the hour regex happily captures '99' from a dirty
    # label ('сегодня, 99:30'), and the plain form THROWS under ANSI
    # where the reference catches and returns NaT
    today_ts = F.try_to_timestamp(
        F.concat(F.date_format(today, "yyyy-MM-dd"), F.lit(" "), _hm(h, m))
    )
    yesterday_ts = F.try_to_timestamp(
        F.concat(
            F.date_format(F.date_sub(today, 1), "yyyy-MM-dd"), F.lit(" "), _hm(h, m)
        )
    )

    day = F.regexp_extract(c, _DAY_MONTH_RE, 1).cast("int")
    word = F.lower(F.regexp_extract(c, _DAY_MONTH_RE, 2))
    month = _month_from_word(word)
    year = F.year(nowc)

    # try_make_timestamp yields null on impossible dates (ref:
    # exception→NaT); plain make_timestamp THROWS under ANSI mode
    # (Spark 4 default) — caught by the reference differential test on
    # "31 фев"
    this_year = F.try_make_timestamp(year, month, day, h, m, F.lit(0))
    rolled = F.try_make_timestamp(year - 1, month, day, h, m, F.lit(0))
    day_month_ts = F.when(this_year > nowc, rolled).otherwise(this_year)

    return (
        F.when(c.isNull() | (c == "") | ~has_time, F.lit(None).cast("timestamp"))
        .when(c.contains("сегодня"), today_ts)
        .when(c.contains("вчера"), yesterday_ts)
        .when(month.isNotNull() & day.isNotNull(), day_month_ts)
        .otherwise(F.lit(None).cast("timestamp"))
    )


def _hm(h: Column, m: Column) -> Column:
    return F.concat(
        F.lpad(h.cast("string"), 2, "0"), F.lit(":"), F.lpad(m.cast("string"), 2, "0"), F.lit(":00")
    )
