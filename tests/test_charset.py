"""Statistical charset fallback (r2 VERDICT #6): undeclared legacy-encoding
pages decode to the right script instead of mojibake. The reference stack
gets this via go-shiori/dom's chardet dependency; builder._statistical_decode
is the from-scratch equivalent (strict-decode gate + script-block scoring)."""

from go_readability_spark.dom import parse_html
from go_readability_spark.dom.node import text_content
from go_readability_spark.dom.builder import _sniff_decode, _statistical_decode


def _page(body_text: str) -> str:
    return f"<html><head><title>t</title></head><body><p>{body_text}</p></body></html>"


CASES = [
    ("gb18030", "今天的新闻内容非常丰富，记者在现场进行了详细报道。中文网页很多仍然使用传统编码。"),
    ("shift_jis", "本日のニュースをお伝えします。記者が現場から詳しく報告しました。日本語のページです。"),
    ("euc-kr", "오늘의 뉴스를 전해 드립니다. 기자가 현장에서 자세히 보도했습니다."),
    ("cp1251", "Сегодняшние новости: корреспондент подробно рассказал обо всех событиях дня."),
    ("big5", "今天的新聞內容非常豐富，記者在現場進行了詳細報導。繁體中文網頁,這是傳統編碼的頁面。"),
    ("cp1252", "Voilà un café très agréable, naïveté and mostly ASCII prose with quelques accents européens here."),
    ("euc-jp", "本日のニュースをお伝えします。記者が現場から詳しく報告しました。"),
]


def test_undeclared_legacy_encodings_decode():
    for codec, text in CASES:
        raw = _page(text).encode(codec)  # NO meta charset, invalid UTF-8
        assert raw.decode("utf-8", errors="ignore") != _page(text)  # sanity: not utf-8
        doc = parse_html(raw)
        extracted = text_content(doc)
        assert text in extracted, codec


def test_declared_charset_still_wins():
    text = "本日のニュースをお伝えします。"
    raw = f"<html><head><meta charset=shift_jis></head><body><p>{text}</p></body></html>".encode("shift_jis")
    assert text in text_content(parse_html(raw))


def test_utf8_fast_path_untouched():
    text = "plain utf-8 with accents: café, naïve, 中文"
    assert text in _sniff_decode(_page(text).encode("utf-8"))


def test_garbage_stays_replace_decoded():
    # random high bytes that no candidate decodes convincingly: fall back
    # to utf-8-replace rather than inventing a script
    import random

    rng = random.Random(7)
    raw = bytes(rng.randrange(0x80, 0x100) for _ in range(4000))
    out = _statistical_decode(b"<p>" + raw + b"</p>")
    if out is not None:
        # if a codec survived, it must at least have produced real letters
        assert sum(1 for c in out if ord(c) >= 0x80) > 0


def test_sample_boundary_split_char():
    text = "中文" * 40000  # > 64 KiB encoded; boundary lands mid-char
    raw = _page(text).encode("gb18030")
    out = _sniff_decode(raw)
    assert "中文中文" in out
