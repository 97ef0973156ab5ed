"""strings.TrimSpace / strings.Fields parity: Go's unicode.IsSpace is the
Unicode White_Space property; Python's str methods additionally treat the
ASCII separator controls \\x1c-\\x1f as whitespace."""

from go_readability_spark.readability.utils import go_fields, go_trim_space, trim, word_count


def test_separator_controls_are_not_go_whitespace():
    assert go_trim_space("\x1cx\x1d") == "\x1cx\x1d"
    assert "\x1cx\x1d".strip() == "x"  # the Python behavior we must avoid
    assert go_fields("a\x1cb c") == ["a\x1cb", "c"]
    assert word_count("a\x1cb c") == 2  # Go strings.Fields sees two words
    assert trim("  a\x1cb   c ") == "a\x1cb c"


def test_unicode_white_space_still_trims():
    # NBSP, NEL, ideographic space, em-space ARE White_Space in Go
    assert go_trim_space("\xa0\x85 x 　 ") == "x"
    assert go_fields("a\xa0b c") == ["a", "b", "c"]


def test_inner_text_keeps_separator_controls():
    from go_readability_spark.dom.builder import parse_html
    from go_readability_spark.dom import body_element
    from go_readability_spark.readability.metadata import get_inner_text

    doc = parse_html("<body><p>x\x1c</p></body>")
    assert get_inner_text(body_element(doc), True) == "x\x1c"
