#!/usr/bin/env python
"""API-parity example mirroring the reference's examples/main.go: parse one
document and print the Article fields. Works on a local file (pass a path)
or a URL (requires network)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from go_readability_spark.readability import from_reader, from_url

target = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/test-pages/001/source.html"

if target.startswith(("http://", "https://")):
    article = from_url(target, timeout=30)
else:
    article = from_reader(open(target, "rb").read(), "http://fakehost/test/page.html")

print(f"Source  : {target}")
print(f"Title   : {article.title}")
print(f"Author  : {article.byline}")
print(f"Length  : {article.length}")
print(f"Excerpt : {article.excerpt}")
print(f"SiteName: {article.site_name}")
print(f"Image   : {article.image}")
print(f"Favicon : {article.favicon}")
print()
print(article.text_content[:500])
