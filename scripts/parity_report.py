#!/usr/bin/env python
"""Run the pure-Python extraction over every reference fixture and report
byte-identity of text_content vs the golden expected.html (parsed with the
same DOM, per /root/reference/parser_test.go harness semantics)."""

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_readability_spark.dom import parse_html, text_content, body_element
from go_readability_spark.readability import Parser, check_document

PAGES = "/root/reference/test-pages"
BASE_URL = "http://fakehost/test/page.html"


def expected_text(case):
    raw = open(os.path.join(PAGES, case, "expected.html"), "rb").read()
    doc = parse_html(raw)
    return text_content(body_element(doc)).strip()


def norm(s):
    return " ".join(s.replace("\xad", "").split())


def main():
    cases = sorted(
        c for c in os.listdir(PAGES)
        if os.path.isfile(os.path.join(PAGES, c, "source.html"))
    )
    only = sys.argv[1:] or cases
    ok, ok_norm, fail, err = [], [], [], []
    meta_fail = []
    for case in only:
        src = open(os.path.join(PAGES, case, "source.html"), "rb").read()
        meta = json.load(open(os.path.join(PAGES, case, "expected-metadata.json")))
        try:
            doc = parse_html(src)
            readerable = check_document(doc)
            art = Parser().parse_document(doc, BASE_URL)
            exp = expected_text(case)
            got = art.text_content
            if got == exp:
                ok.append(case)
            elif norm(got) == norm(exp):
                # goldens imported from mozilla/readability are js-beautified
                # (whitespace collapsed, soft hyphens stripped); the reference
                # harness also only compares whitespace-normalized text
                # (parser_test.go:175-256)
                ok_norm.append(case)
            else:
                fail.append(case)
                if len(sys.argv) > 1:
                    # detailed diff for targeted runs
                    print(f"--- {case}: got {len(got)} chars, want {len(exp)}")
                    for i, (a, b) in enumerate(zip(got, exp)):
                        if a != b:
                            print(f"  first diff at {i}: got {got[max(0,i-40):i+40]!r}")
                            print(f"                     want {exp[max(0,i-40):i+40]!r}")
                            break
                    else:
                        print(f"  prefix match; got tail {got[len(exp):][:80]!r} want tail {exp[len(got):][:80]!r}")
            mf = []
            if art.title != meta.get("title", ""):
                mf.append(f"title: got {art.title!r} want {meta.get('title')!r}")
            if art.byline != (meta.get("byline") or ""):
                mf.append(f"byline: got {art.byline!r} want {meta.get('byline')!r}")
            if art.excerpt != (meta.get("excerpt") or ""):
                mf.append(f"excerpt: got {art.excerpt!r} want {meta.get('excerpt')!r}")
            if art.site_name != (meta.get("siteName") or ""):
                mf.append(f"siteName: got {art.site_name!r} want {meta.get('siteName')!r}")
            if art.language != (meta.get("language") or ""):
                mf.append(f"language: got {art.language!r} want {meta.get('language')!r}")
            if readerable != meta.get("readerable", False):
                mf.append(f"readerable: got {readerable} want {meta.get('readerable')}")
            if mf:
                meta_fail.append((case, mf))
                if len(sys.argv) > 1:
                    print(f"--- {case} metadata:"); [print("   ", m) for m in mf]
        except Exception:
            err.append(case)
            if len(sys.argv) > 1:
                traceback.print_exc()

    print(f"\nTEXT  byte-identical={len(ok)} normalized-identical={len(ok_norm)} fail={len(fail)} err={len(err)} / {len(only)}")
    if ok_norm:
        print("normalized-only:", " ".join(ok_norm))
    print(f"META  ok={len(only)-len(meta_fail)-len(err)} fail={len(meta_fail)}")
    if fail:
        print("text-fail:", " ".join(fail))
    if err:
        print("errors:", " ".join(err))
    if meta_fail and not sys.argv[1:]:
        print("meta-fail:", " ".join(c for c, _ in meta_fail))


if __name__ == "__main__":
    main()
