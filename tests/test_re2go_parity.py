"""The reference's own DFA matcher test table, ported verbatim
(/root/reference/internal/re2go/re2go_test.go) against our compiled-regex
replacements in rb/regexps.py — the direct semantic check for the layer
where the reference uses ~4,600 lines of generated Go."""

import pytest

from go_readability_spark.readability import regexps as rx

BYLINE_TRUE = [
    '<h4 class="article-byline">',
    '<meta name="author" content="Die Tagespost" />',
    '<span class="dateline">CAIRO — Agustine Myer</span>',
    '<h3 class="writtenbynames">ΣΥΝΤΑΚΤΙΚΗ ΟΜΑΔΑ</h3>',
    '<span class="meta-prep-author">Publiziert am</span>',
]
BYLINE_FALSE = [
    '<h4 class="article-line">',
    '<meta name="autor" content="Die Tagespost" />',
    '<span class="date">CAIRO — Agustine Myer</span>',
    '<h3 class="bynames">ΣΥΝΤΑΚΤΙΚΗ ΟΜΑΔΑ</h3>',
    '<span class="meta-autor">Publiziert am</span>',
]

POSITIVE_TRUE = [
    '<section class="article">Random content here</section>',
    '<body class="body">Some body content</body>',
    '<div class="content">This is content inside a div</div>',
    '<article class="entry">An entry in the article</article>',
    '<span class="hentry">Highlight this entry</span>',
    '<header class="h-entry">Header for h-entry</header>',
    '<main class="main">Main section content</main>',
    '<nav class="page">Page navigation content</nav>',
    '<ul class="pagination">Pagination list</ul>',
    '<aside class="post">This is a post</aside>',
    '<p class="text">Some paragraph text</p>',
    '<article class="blog">Blog article content</article>',
    '<section class="story">A story section</section>',
]
POSITIVE_FALSE = [
    '<header class="header">Header here</header>',
    '<footer class="footer">Footer section</footer>',
    '<div class="container">This inside a container</div>',
    '<section class="sidebar">This is a sidebar</section>',
    '<nav class="navigation">Navigation links</nav>',
    '<p class="description">Paragraph description</p>',
    '<div class="news">Latest news</div>',
    '<aside class="widget">A widget section</aside>',
    '<div class="layout">Side layout</div>',
    '<section class="gallery">Gallery of images</section>',
]

NEGATIVE_TRUE = [
    '<div class="ad-banner">Advertisement banner content</div>',
    '<section class="hidden">Hidden section</section>',
    '<div class="-ad-">Ad content here</div>',
    'hid',
    'hid class',
    'class hid',
    'class hid good',
    '<section class="hid">Again, hid match</section>',
    '<div class="banner">Banner content</div>',
    '<aside class="combx">Comb box content</aside>',
    '<section class="comment">User comments here</section>',
    '<div class="com-">Com- prefix example</div>',
    '<section class="contact">Contact information</section>',
    '<footer class="foot">Footer section</footer>',
    '<section class="footer">Footer content</section>',
    '<footer class="footnote">Footnote details</footer>',
    '<div class="gdpr">GDPR compliance text</div>',
    '<header class="masthead">Masthead content</header>',
    '<div class="media">Media gallery</div>',
    '<section class="meta">Meta information</section>',
    '<div class="outbrain">Outbrain recommendations</div>',
    '<section class="promo">Promotional content</section>',
    '<div class="related">Related articles</div>',
    '<section class="scroll">Scrolling section</section>',
    '<div class="share">Sharing tools</div>',
    '<aside class="shoutbox">Shoutbox chat</aside>',
    '<nav class="sidebar">Sidebar links</nav>',
    '<section class="skyscraper">Skyscraper ad</section>',
    '<div class="sponsor">Sponsored content</div>',
    '<section class="shopping">Shopping cart</section>',
    '<div class="tags">Tag list</div>',
    '<div class="tool">Tools and settings</div>',
    '<aside class="widget">Widget features</aside>',
]
NEGATIVE_FALSE = [
    '<header class="navbar">Navigation bar</header>',
    '<section class="overview">Overview section content</section>',
    '<div class="gallery">Gallery of images</div>',
    '<aside class="support">Support section</aside>',
    '<div class="catalog">Product catalog</div>',
    '<nav class="user-menu">User menu links</nav>',
    '<article class="news-feed">Latest news</article>',
    '<section class="details">Detailed section content</section>',
    '<div class="profile">User profile content</div>',
]

UNLIKELY_TRUE = [
    '<div class="ad-banner">Ad banner content</div>',
    '<section class="-ad-">Ad-related content</section>',
    '<article class="ai2html">AI to HTML conversion content</article>',
    '<nav class="banner">Banner navigation</nav>',
    '<section class="breadcrumbs">Breadcrumbs navigation</section>',
    '<aside class="combx">Comb box content</aside>',
    '<section class="comment">Comment section</section>',
    '<div class="community">Community forum</div>',
    '<div class="cover-wrap">Cover wrap for article</div>',
    '<section class="disqus">Disqus comment section</section>',
    '<aside class="extra">Extra content</aside>',
    '<footer class="footer">Footer section</footer>',
    '<div class="gdpr">GDPR compliance</div>',
    '<header class="header">Header content</header>',
    '<aside class="legends">Legends and explanations</aside>',
    '<nav class="menu">Menu navigation</nav>',
    '<section class="related">Related articles</section>',
    '<div class="remark">Remark section</div>',
    '<section class="replies">Replies to comments</section>',
    '<div class="rss">RSS feed</div>',
    '<aside class="shoutbox">Shoutbox chat</aside>',
    '<nav class="sidebar">Sidebar content</nav>',
    '<section class="skyscraper">Skyscraper ad</section>',
    '<div class="social">Social media links</div>',
    '<section class="sponsor">Sponsored content</section>',
    '<div class="supplemental">Supplemental information</div>',
    '<div class="ad-break">Ad break content</div>',
    '<div class="agegate">Age verification</div>',
    '<nav class="pagination">Pagination links</nav>',
    '<div class="pager">Pager navigation</div>',
    '<section class="popup">Popup content</section>',
    '<div class="yom-remote">Yom remote content</div>',
]
UNLIKELY_FALSE = [
    '<div class="container">Main container</div>',
    '<section class="overview">Overview section</section>',
    '<article class="newsfeed">Newsfeed content</article>',
    '<section class="gallery">Image gallery</section>',
    '<div class="catalog">Product catalog</div>',
    '<section class="summary">Summary content</section>',
]

MAYBE_TRUE = [
    '<section class="and">Logical and condition</section>',
    '<article class="article">Article content</article>',
    '<body class="body">Body of the document</body>',
    '<div class="column">Column layout</div>',
    '<section class="content">Main content here</section>',
    '<main class="main">Main section</main>',
    '<div class="shadow">Shadow effect</div>',
]
MAYBE_FALSE = [
    '<header class="header">Header section</header>',
    '<div class="navbar">Navigation bar</div>',
    '<section class="footer">Footer section</section>',
    '<nav class="menu">Menu navigation</nav>',
    '<section class="gallery">Photo gallery</section>',
    '<p class="text">Paragraph text</p>',
]


@pytest.mark.parametrize("s", BYLINE_TRUE)
def test_byline_true(s):
    assert rx.RX_BYLINE.search(s)


@pytest.mark.parametrize("s", BYLINE_FALSE)
def test_byline_false(s):
    assert not rx.RX_BYLINE.search(s)


@pytest.mark.parametrize("s", POSITIVE_TRUE)
def test_positive_true(s):
    assert rx.RX_POSITIVE_CLASS.search(s)


@pytest.mark.parametrize("s", POSITIVE_FALSE)
def test_positive_false(s):
    assert not rx.RX_POSITIVE_CLASS.search(s)


@pytest.mark.parametrize("s", NEGATIVE_TRUE)
def test_negative_true(s):
    assert rx.RX_NEGATIVE_CLASS.search(s)


@pytest.mark.parametrize("s", NEGATIVE_FALSE)
def test_negative_false(s):
    assert not rx.RX_NEGATIVE_CLASS.search(s)


@pytest.mark.parametrize("s", UNLIKELY_TRUE)
def test_unlikely_true(s):
    assert rx.RX_UNLIKELY_CANDIDATES.search(s)


@pytest.mark.parametrize("s", UNLIKELY_FALSE)
def test_unlikely_false(s):
    assert not rx.RX_UNLIKELY_CANDIDATES.search(s)


@pytest.mark.parametrize("s", MAYBE_TRUE)
def test_maybe_true(s):
    assert rx.RX_MAYBE_CANDIDATE.search(s)


@pytest.mark.parametrize("s", MAYBE_FALSE)
def test_maybe_false(s):
    assert not rx.RX_MAYBE_CANDIDATE.search(s)


def test_count_commas():
    assert rx.count_commas("my,name,is,john") == 3
    assert rx.count_commas("now,its،a mixed﹐commas︐from︑various⹁place⸴and⸲country，") == 9


def test_normalize_spaces():
    assert rx.normalize_spaces("some   sentence") == "some sentence"
    assert rx.normalize_spaces("with \t \ttabs") == "with tabs"
    assert rx.normalize_spaces(" single space is ok ") == " single space is ok "
    assert rx.normalize_spaces("   multi   space   removed   ") == " multi space removed "
