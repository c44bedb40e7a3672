"""Extraction layer (E1-E8): mini-DOM parser semantics + operator
plumbing over rendered fixtures."""

from rental_data_pipeline_spark.operators import extract as X


def test_parse_listing_first_match_priority():
    # MainPrice is the LAST selector in priority order; a page with
    # both price-amount and MainPrice must pick price-amount first
    html = (
        '<html><body><div data-testid="price-amount"><span>50 000 ₽</span></div>'
        '<span data-mark="MainPrice">99 999 ₽</span></body></html>'
    )
    rec = X._parse_listing(html, "https://x/rent/flat/123/")
    assert rec["price_value"] == "50 000 ₽"
    assert rec["offer_id"] == "123"
    assert rec["error"] is None
    assert rec["is_unpublished"] is False


def test_parse_listing_error_page_short_circuits():
    html = '<html><body><h5 class="error-code">404</h5></body></html>'
    rec = X._parse_listing(html, "https://x/rent/flat/77/")
    assert rec["error"] == "404"
    assert rec["offer_id"] == "77"


def test_label_value_pairs_skip_equal_label_value():
    html = (
        '<html><body><div data-name="OfferFactItem"><span>Этаж</span>'
        "<span>3 из 9</span></div>"
        '<div data-name="OfferFactItem"><span>same</span><span>same</span></div>'
        "</body></html>"
    )
    rec = X._parse_listing(html, "")
    assert rec["facts"] == {"Этаж": "3 из 9"}


def test_unclosed_tags_tolerated():
    html = '<div data-name="Description"><span>text<p>more</div>'
    rec = X._parse_listing("<html><body>" + html + "</body></html>", "")
    assert rec["description"] == "textmore"


def test_split_cards_multi_row_emit(spark):
    page = (
        "<html><body>"
        '<article data-name="CardComponent"><div data-name="LinkArea">'
        '<a href="/rent/flat/1/">c</a></div>'
        '<span data-mark="MainPrice">10 ₽</span></article>'
        '<article data-name="CardComponent"><div data-name="LinkArea">'
        '<a href="/rent/flat/2/">c</a></div>'
        '<span data-mark="MainPrice">20 ₽</span></article>'
        "</body></html>"
    )
    df = spark.createDataFrame([(0, page)], "page_id long, html string")
    rows = X.split_cards(df).orderBy("offer_id").collect()
    assert [(r.offer_id, r.price_value) for r in rows] == [("1", "10 ₽"), ("2", "20 ₽")]


def test_render_parse_roundtrip(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"doc text {i}") for i in range(1, 30)], "doc_id long, text string"
    )
    rendered = docs.select(
        "doc_id",
        X.listing_page_html(F.col("doc_id"), F.col("text")).alias("html"),
        X.listing_url(F.col("doc_id")).alias("url"),
    )
    parsed = X.parse_listing_pages(rendered)
    clean, bad = X.quarantine_split(parsed)
    out = {r.offer_id: r for r in clean.collect()}
    assert bad.count() == 0  # no doc_id % 50 == 0 in range(1,30)
    assert len(out) == 29
    r7 = out["100007"]  # doc_id 7: unpublished (7 % 7 == 0)
    assert r7.is_unpublished is True
    assert r7.facts["Этаж"] == "8 из 15"  # floor = 7%15+1 = 8, total = 8 + 7%10 = 15


def test_strained_parse_equals_full_dom_parse():
    """The string-level strainer must be semantics-neutral: parsing the
    strained page gives the exact record the full-DOM parse gives, for
    normal / unpublished / error / feature-bearing pages, including a
    page with an unclosed tag (tolerant overshoot)."""
    from rental_data_pipeline_spark.operators.extract import (
        _FILLER_BLOCK,
        _LISTING_STRAINER,
        _parse_dom,
        _parse_listing,
        _strain,
    )

    def full_parse(html, url):
        # bypass the strainer by pre-straining with a pass-through
        import rental_data_pipeline_spark.operators.extract as X

        orig = X._strain
        X._strain = lambda h, w: h
        try:
            return _parse_listing(html, url)
        finally:
            X._strain = orig

    filler = _FILLER_BLOCK * 20
    pages = [
        # normal page with every component
        "<html><body>" + filler
        + '<div data-name="OfferUnpublished"><span>Снято</span></div>'
        + '<h1 data-mark="OfferTitle">2-комн. кв., 54 м², 3/9 этаж</h1>'
        + '<span data-mark="MainPrice">45 000 ₽/мес.</span>'
        + '<div data-name="OfferMetaData"><div data-testid="metadata-updated-date">'
        + "<span>Обновлено: 12 мая, 14:30</span></div>"
        + '<div data-name="OfferStats">99 просмотров, 3 за сегодня, 42 уникальных</div></div>'
        + '<div data-name="Geo"><div itemprop="name" content="Москва, ул. Тестовая, 7"></div>'
        + '<ul><li data-name="UndergroundItem"><a>м. Станция3</a></li></ul></div>'
        + '<div data-name="OfferFactItem"><span>Этаж</span><span>3 из 9</span></div>'
        + '<div data-name="FeaturesItem">Холодильник</div>'
        + '<div data-name="Description"><span>текст описания</span></div>'
        + filler + "</body></html>",
        # error page
        '<html><body><h5 class="error-code">404 Страница не найдена</h5></body></html>',
        # unclosed tag inside a watched region (tolerant overshoot)
        "<html><body>" + filler
        + '<div data-name="Description"><span>no close'
        + "</body></html>",
        # page with none of the selectors
        "<html><body>" + filler + "</body></html>",
    ]
    url = "https://example.test/rent/flat/100042/"
    for html in pages:
        assert _parse_listing(html, url) == full_parse(html, url)
    # the strainer really prunes: strained normal page is tiny
    assert len(_strain(pages[0], _LISTING_STRAINER)) < len(pages[0]) / 5


def test_sniff_error_pages_nested_and_textless_markers(spark):
    """The native sniff must mirror the DOM path's PRESENCE semantics:
    nested markup inside the marker still quarantines (with its leading
    text), and a text-less marker still quarantines (empty error), as
    _parse_listing does via _text()."""
    from rental_data_pipeline_spark.operators.extract import sniff_error_pages

    rows = [
        ('<html><body><h5 class="error-code">404 nf</h5></body></html>', "u/rent/flat/1/"),
        ('<html><body><div class="error-code"><span>410 gone</span></div></body></html>', "u/rent/flat/2/"),
        ('<html><body><div class="error-code"></div><div>nav</div></body></html>', "u/rent/flat/3/"),
        ("<html><body>no error here</body></html>", "u/rent/flat/4/"),
    ]
    df = spark.createDataFrame(rows, "html string, url string")
    got = {r.offer_id: r.error for r in sniff_error_pages(df).collect()}
    assert got == {"1": "404 nf", "2": "410 gone", "3": ""}


def test_sniff_error_pages_ignores_literal_in_text(spark):
    """The marker literal in TEXT content (or a comment) must not
    quarantine a page the DOM path would keep: presence is anchored
    inside a tag."""
    from rental_data_pipeline_spark.operators.extract import sniff_error_pages

    rows = [
        # literal appears only as text / in a comment: NOT an error page
        ('<html><body><p>docs about class="error-code" handling</p></body></html>',
         "u/rent/flat/10/"),
        ('<html><body><!-- class="error-code" --><p>ok</p></body></html>',
         "u/rent/flat/11/"),
        # text literal first, REAL marker later: still quarantined, with
        # the real marker's text (not the text-literal's surroundings)
        ('<html><body><p>see class="error-code"</p>'
         '<h5 class="error-code">404</h5></body></html>',
         "u/rent/flat/12/"),
    ]
    df = spark.createDataFrame(rows, "html string, url string")
    got = {r.offer_id: r.error for r in sniff_error_pages(df).collect()}
    assert got == {"12": "404"}


def test_strain_survives_literal_lt_before_watched_attr():
    """A literal '<' inside an earlier attribute value (or text) in the
    same tag region must not make the watched element disappear from
    the strained output — over-include, never exclude."""
    from rental_data_pipeline_spark.operators.extract import (
        _compile_strainer,
        _strain,
    )

    watch = _compile_strainer([("data-name", "Description")])
    # title attribute carries a literal '<' BEFORE the watched attr in
    # the same tag: rfind('<') lands mid-attribute, where no tag name
    # parses — the walk-back must recover the real tag open
    html = (
        "<html><body>"
        '<div title="a < b" data-name="Description"><span>text</span></div>'
        "</body></html>"
    )
    out = _strain(html, watch)
    assert 'data-name="Description"' in out
    assert "<span>text</span>" in out
