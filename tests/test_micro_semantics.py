"""Targeted micro-fixtures for algorithm branches the reference corpus
exercises thinly. Expected values derived by hand from the Go source
(cited per test); these guard refactors between rounds."""

from go_readability_spark.dom import parse_html
from go_readability_spark.readability import Parser
from go_readability_spark.readability.metadata import get_article_title

BODY = (
    "<div class='article-content'>"
    + "".join(
        f"<p>Paragraph {i} contains, some, commas, and plenty of readable text "
        f"to pass every scoring threshold easily in the algorithm.</p>"
        for i in range(12)
    )
    + "</div>"
)


def _art(html, **opts):
    return Parser(**opts).parse(html.encode() if isinstance(html, str) else html,
                                "http://fakehost/test/page.html")


# ---- getArticleTitle branches (parser.go:352-424)

def _title(title_html, extra=""):
    return get_article_title(parse_html(f"<head><title>{title_html}</title></head><body>{extra}</body>"))


def test_title_separator_drops_final_part():
    # result must be >4 words or it reverts to the original (parser.go:417-421)
    assert _title("A Much Longer Story About Events - Example Site") == \
        "A Much Longer Story About Events"


def test_title_short_result_reverts_to_original():
    # 3-word result <= 4 words and '-' is not hierarchical -> original kept
    assert _title("The Big Story - Example Site") == "The Big Story - Example Site"


def test_title_short_first_part_takes_tail():
    # fewer than 3 words before separator -> take part after the first sep
    assert _title("News - A Very Long Story About Things") == "A Very Long Story About Things"


def test_title_colon_logic_last_colon():
    assert _title("Site Name: The Real Article Title Here") == "The Real Article Title Here"


def test_title_colon_with_matching_heading_kept():
    t = _title("Site: The Title", "<h1>Site: The Title</h1>")
    assert t == "Site: The Title"


def test_title_too_long_uses_single_h1():
    long_title = "word " * 40
    t = _title(long_title, "<h1>Actual Headline For The Page</h1>")
    assert t == "Actual Headline For The Page"


def test_title_four_words_or_fewer_reverts_to_original():
    # result "Short Title" (2 words), no hierarchical sep -> original returned
    assert _title("Short Title - On Site") == "Short Title - On Site"


# ---- byline capture (parser.go:710-727)

def test_byline_rel_author():
    art = _art(f"<body><div><span rel='author'>Jane Q. Author</span>{BODY}</div></body>")
    assert art.byline == "Jane Q. Author"


def test_byline_itemprop():
    art = _art(f"<body><div><span itemprop='author-name'>John Writer</span>{BODY}</div></body>")
    assert art.byline == "John Writer"


def test_byline_class_dfa_and_length_gate():
    art = _art(f"<body><div><div class='byline'>{'x' * 150}</div>{BODY}</div></body>")
    assert art.byline == ""  # >=100 chars -> not a valid byline
    art2 = _art(f"<body><div><div class='byline'>By  Someone\nFamous</div>{BODY}</div></body>")
    assert art2.byline == "By Someone Famous"  # whitespace-joined


def test_byline_meta_takes_precedence():
    art = _art(
        "<head><meta name='author' content='Meta Author'/></head>"
        f"<body><div><div class='byline'>Dom Author</div>{BODY}</div></body>"
    )
    assert art.byline == "Meta Author"


# ---- favicon selection (parser.go:2172-2209)

def test_favicon_largest_square_png():
    art = _art(
        "<head>"
        "<link rel='icon' type='image/png' href='/i16.png' sizes='16x16'/>"
        "<link rel='shortcut icon' href='/i64.png' sizes='64x64'/>"
        "<link rel='icon' href='/i128.ico' sizes='128x128'/>"  # not png -> skipped
        "<link rel='icon' type='image/png' href='/rect.png' sizes='32x16'/>"  # not square
        f"</head><body>{BODY}</body>"
    )
    assert art.favicon == "http://fakehost/i64.png"


# ---- video whitelist inside cleanConditionally (parser.go:2057-2069)

def test_video_iframe_spares_container():
    inner = BODY.replace(
        "</div>",
        "<div class='xrandomx'><iframe src='https://www.youtube.com/embed/abc'>"
        "</iframe></div></div>",
    )
    art = _art(f"<body>{inner}</body>")
    assert "youtube.com/embed/abc" in art.content


# ---- lazy image fixes (parser.go:1911-1991)

def test_lazy_image_data_src_promoted():
    inner = BODY.replace(
        "</div>", "<p><img class='lazyload' data-src='/images/real.jpg'/></p></div>"
    )
    art = _art(f"<body>{inner}</body>")
    assert 'src="http://fakehost/images/real.jpg"' in art.content


def test_tiny_base64_placeholder_dropped():
    tiny = "data:image/gif;base64,R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    inner = BODY.replace(
        "</div>", f"<p><img src='{tiny}' data-src='/img/big.jpg'/></p></div>"
    )
    art = _art(f"<body>{inner}</body>")
    assert "base64" not in art.content
    assert 'src="http://fakehost/img/big.jpg"' in art.content


# ---- share-element cleanup respects CharThresholds (parser.go:558-564)

def test_share_element_removed_under_threshold():
    html = (
        f"<body><div>{BODY}"
        "<div class='share-buttons'>tweet like pin</div>"
        "</div></body>"
    )
    art = _art(html)
    assert "tweet like pin" not in art.text_content


def test_share_element_kept_over_threshold():
    long_share = "real content " * 60  # > 500 chars
    html = f"<body><div>{BODY}<div class='share-thing'><p>{long_share}</p></div></div></body>"
    art = _art(html)
    assert "real content" in art.text_content


# ---- replaceBrs (parser.go:465-524)

def test_replace_brs_collapses_chains():
    html = "<body><div class='article-content'>" + (
        "first line of prose with enough text to matter<br/> <br/><br/>"
        "second chunk of prose, also long enough to be scored properly here"
    ) * 8 + "</div></body>"
    art = _art(html)
    assert art.content.count("<br/>") == 0  # all chains became <p>s
    assert "second chunk of prose" in art.text_content


# ---- language from <html lang>

def test_language_attr():
    art = _art(f"<html lang='fr-CA'><body>{BODY}</body></html>")
    assert art.language == "fr-CA"
