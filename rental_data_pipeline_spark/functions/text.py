"""Text/string scalar functions (SURVEY §2.7 X5–X15, X19, X21; §2.2 E6).

All native Column expressions — regex work stays inside whole-stage
codegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_STREET_REPLACEMENTS = (
    ("улица", "ул."),
    ("шоссе", "ш."),
    ("проспект", "просп."),
    ("переулок", "пер."),
    ("бульвар", "бул."),
    ("набережная", "наб."),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def derive_status(is_unpublished: Column | str) -> Column:
    """X5: 'active' unless is_unpublished truthy → 'non active'
    (ref normalize.py:101-104)."""
    return F.when(
        F.coalesce(_c(is_unpublished), F.lit(False)), F.lit("non active")
    ).otherwise(F.lit("active"))


def normalize_street_names(col: Column | str) -> Column:
    """X6: word-boundary abbreviation of six street-type words
    (ref html_parser.py:9-28)."""
    out = _c(col)
    for long_form, short_form in _STREET_REPLACEMENTS:
        # (?U): Java \b is ASCII-only by default; the reference's Python
        # \b is Unicode-aware, so Cyrillic words need UNICODE_CHARACTER_CLASS.
        out = F.regexp_replace(out, rf"(?U)\b{long_form}\b", short_form)
    return out


def build_address(city: Column | str, street: Column | str, building: Column | str) -> Column:
    """X7: "city, street, building"; empty string if any part missing
    (ref html_parser.py:31-35; falsy check → null or '')."""
    ci, st, bu = _c(city), _c(street), _c(building)
    all_present = (
        ci.isNotNull() & (ci != "") & st.isNotNull() & (st != "")
        & bu.isNotNull() & (bu != "")
    )
    return F.when(all_present, F.concat_ws(", ", ci, st, bu)).otherwise(F.lit(""))


def parse_floor_info(col: Column | str) -> tuple[Column, Column]:
    """X8: "3 из 9" → (floor, total_floors) ints, nulls if no match
    (ref html_parser.py:38-49)."""
    c = _c(col)
    floor = F.regexp_extract(c, r"(\d+)\s*из\s*(\d+)", 1)
    total = F.regexp_extract(c, r"(\d+)\s*из\s*(\d+)", 2)
    return (
        F.when(floor != "", floor.cast("long")),
        F.when(total != "", total.cast("long")),
    )


def parse_title(col: Column | str) -> dict[str, Column]:
    """X9: title decomposition (ref html_parser.py:274-284).

    "2-комн. кв., 54,2 м², 3/9 этаж": replace "d/d" with "d d", find
    all numbers (``\\d+[.,]\\d+|\\d+``); with >=3 matches emit
    room_count (first if >3 matches else 0), total_area (3rd from end,
    ","→"."), floor (2nd from end), total_floors (last).
    """
    c = F.regexp_replace(_c(col), r"(\d+)/(\d+)", r"$1 $2")
    nums = F.regexp_extract_all(c, F.lit(r"(\d+[.,]\d+|\d+)"), 1)
    n = F.size(nums)
    ok = n >= 3
    # integer positions go through a decimal-tolerant try_cast chain:
    # the number regex deliberately matches "1,5", and a plain
    # cast('long') on it THROWS under ANSI (the reference keeps the
    # raw token and parses it numerically later — int() truncation);
    # try_cast also nulls instead of crashing on overflow-scale junk
    def _as_long(tok):
        return (
            F.regexp_replace(tok, ",", ".")
            .try_cast("double")
            .try_cast("long")
        )

    return {
        "room_count": F.when(
            ok, F.when(n > 3, _as_long(F.element_at(nums, 1))).otherwise(F.lit(0))
        ),
        "total_area": F.when(
            ok, F.regexp_replace(F.element_at(nums, -3), ",", ".").cast("double")
        ),
        "floor": F.when(ok, _as_long(F.element_at(nums, -2))),
        "total_floors": F.when(ok, _as_long(F.element_at(nums, -1))),
    }


def parse_offer_stats(col: Column | str) -> dict[str, Column]:
    """X10: text with exactly 3 numbers → total/today/unique views
    (ref html_parser.py:286-294)."""
    nums = F.regexp_extract_all(_c(col), F.lit(r"(\d+)"), 1)
    ok = F.size(nums) == 3
    return {
        "total_views": F.when(ok, F.element_at(nums, 1).cast("long")),
        "today_views": F.when(ok, F.element_at(nums, 2).cast("long")),
        "unique_views": F.when(ok, F.element_at(nums, 3).cast("long")),
    }


def parse_price_info(col: Column | str) -> dict[str, Column]:
    """X11: split on first 3 commas → rental_period, utilities_payment,
    commission, security_deposit (ref html_parser.py:296-307; positional,
    missing parts → null instead of the reference's IndexError)."""
    parts = F.split(_c(col), ",", 4)
    ok = F.size(parts) >= 4
    return {
        "rental_period": F.element_at(parts, 1),
        "utilities_payment": F.when(ok | (F.size(parts) >= 2), F.element_at(parts, 2)),
        "commission": F.when(F.size(parts) >= 3, F.element_at(parts, 3)),
        "security_deposit": F.when(ok, F.element_at(parts, 4)),
    }


def extract_offer_id(url: Column | str) -> Column:
    """X12: offer id from "/rent/flat/<digits>" (ref html_parser.py:240-244)."""
    extracted = F.regexp_extract(_c(url), r"/rent/flat/(\d+)", 1)
    return F.when(extracted != "", extracted)


def strip_updated_label(col: Column | str) -> Column:
    """X13: "Обновлено: X" → "X" (ref html_parser.py:77-78)."""
    return F.regexp_replace(_c(col), r"^Обновлено: ", "")


def strip_metro_prefix(col: Column | str) -> Column:
    """X14: "м. Арбатская" → "Арбатская" (ref html_parser.py:137-139)."""
    return F.regexp_replace(_c(col), r"м\. ", "")


def rewrite_image_urls(col: Column | str) -> Column:
    """X15: keep cdn-cian.ru urls, rewrite trailing -4.jpg → -1.jpg for
    quality (ref html_parser.py:371-382)."""
    c = _c(col)
    return F.transform(
        F.filter(c, lambda u: u.contains("cdn-cian.ru")),
        lambda u: F.regexp_replace(u, r"-4\.jpg$", "-1.jpg"),
    )


def extract_summary_count(col: Column | str) -> Column:
    """E6: "Найдено 1 062 объявления" → 1062; NBSP-thousands aware
    (ref html_parser.py:185-194)."""
    # (?U): unicode \s so U+202F narrow-NBSP thousands groups match
    # (the reference's Python \s does) — "1\u202f062" parsed as 1
    grp = F.regexp_extract(_c(col), r"(?U)(\d+(?:\s\d{3})*)", 1)
    digits = F.regexp_replace(grp, r"\D", "")
    return F.when(digits != "", digits.cast("long"))


def extract_walking_minutes(col: Column | str) -> Column:
    """X19: "<n> мин." from metro transport text
    (ref scraper/js/parse_listing_page.js:297-303)."""
    extracted = F.regexp_extract(_c(col), r"(\d+)\s*мин", 1)
    return F.when(extracted != "", extracted.cast("long"))


def smart_title_split(col: Column | str) -> Column:
    """X21: split on commas not followed by a digit — keeps "54,2" intact
    (ref scraper/js/parse_search_page.js:255-268)."""
    return F.split(_c(col), r",(?!\d)")
