from effocr_spark.functions.domstrip import strip_html
from effocr_spark.synth.pages import generate_page


def test_basic_main_content():
    html = b"""<html><head><script>x=1</script></head><body>
    <nav><a href="/a">aaaa</a><a href="/b">bbbb</a></nav>
    <div><p>The main story text lives here in a paragraph.</p>
    <p>And a second paragraph of body copy.</p></div>
    <footer><a href="/c">contact us now</a></footer>
    </body></html>"""
    out = strip_html(html)
    assert out == ("The main story text lives here in a paragraph.\n"
                   "And a second paragraph of body copy.")


def test_boilerplate_dropped():
    html = b"<body><nav>MENU MENU MENU MENU</nav><div><p>real text body</p></div></body>"
    assert "MENU" not in strip_html(html)


def test_link_density_penalty():
    html = (b'<body><div><a href="/1">linky linky linky linky linky</a></div>'
            b"<div><p>plain body prose of similar length here</p></div></body>")
    assert strip_html(html) == "plain body prose of similar length here"


def test_whitespace_normalized():
    html = b"<body><div><p>a   b\n\t c</p></div></body>"
    assert strip_html(html) == "a b c"


def test_malformed_html_tolerated():
    html = b"<body><div><p>unclosed paragraph<div><p>another</body>"
    out = strip_html(html)
    assert "unclosed paragraph" in out


def test_empty_and_garbage():
    assert strip_html(b"") == ""
    assert strip_html(b"\x00\x01\x02") == ""
    assert strip_html(b"no tags at all") == ""


def test_entity_references_decoded():
    html = b"<body><div><p>salt &amp; pepper &lt;tags&gt; &#65;BC</p></div></body>"
    assert strip_html(html) == "salt & pepper <tags> ABC"


def test_table_layout_page():
    html = (b"<body><table><tr><td><a href='/x'>nav nav nav nav</a></td>"
            b"<td><p>the real article body sits in this cell with plenty of prose "
            b"to win on text density over the nav cell</p></td></tr></table></body>")
    out = strip_html(html)
    assert "real article body" in out
    assert "nav nav" not in out


def test_nested_article_with_comments():
    html = (b"<body><article><h1>Title Here</h1><p>First paragraph of the story "
            b"with enough words to dominate scoring.</p><p>Second paragraph also "
            b"quite long with many words in it.</p></article>"
            b"<div id='comments'><a href='/u/1'>user1</a> short comment "
            b"<a href='/u/2'>user2</a> another comment reply here</div></body>")
    out = strip_html(html)
    assert out.startswith("Title Here")
    assert "First paragraph" in out and "Second paragraph" in out
    assert "user1" not in out


def test_unicode_content_preserved():
    html = "<body><div><p>naïve café — résumé 日本語テキスト</p></div></body>".encode("utf-8")
    assert strip_html(html) == "naïve café — résumé 日本語テキスト"


def test_br_splits_paragraphs():
    html = b"<body><div><p>line one<br>line two</p></div></body>"
    assert strip_html(html) == "line one\nline two"


def test_generated_pages_match_golden():
    checked = 0
    for i in range(300):
        p = generate_page(i, seed=42)
        if p["branch"] == "dom":
            assert strip_html(p["html"]) == p["true_text"], p["url"]
            checked += 1
    assert checked > 100


# ---- web-corpus stress fixtures (ROADMAP item 4): each golden hand-
# checked — layout tables, nested articles, link-heavy comment sections,
# entity references, malformed nesting, comments/script content ----

def test_table_as_layout_picks_article_cell():
    html = (b"<html><body><table><tr>"
            b"<td><a href='/'>nav one</a> <a href='/'>nav two</a></td>"
            b"<td><p>The actual article body sits inside a layout table "
            b"cell with plenty of text to win.</p>"
            b"<p>Second paragraph of the piece continues here with more "
            b"words.</p></td></tr></table></body></html>")
    assert strip_html(html) == (
        "The actual article body sits inside a layout table cell with "
        "plenty of text to win.\n"
        "Second paragraph of the piece continues here with more words.")


def test_nested_articles_outer_wins_without_duplicating_inner():
    html = (b"<html><body><article><h1>Outer story</h1>"
            b"<p>Outer lead paragraph with enough text to matter.</p>"
            b"<article><p>Inner quoted mini-article, short.</p></article>"
            b"<p>Outer conclusion paragraph, also long enough to count.</p>"
            b"</article></body></html>")
    out = strip_html(html)
    assert out == ("Outer story\n"
                   "Outer lead paragraph with enough text to matter.\n"
                   "Outer conclusion paragraph, also long enough to count.")
    assert "Inner quoted" not in out  # inner paras belong to inner only


def test_link_heavy_comment_section_loses_to_story():
    html = (b"<html><body><div id='main'>"
            b"<p>Story text one with a reasonable amount of words in it.</p>"
            b"<p>Story text two, still the main content of this page.</p>"
            b"</div><div class='comments'>"
            b"<p><a href='/u/1'>user1</a> says: short hot take</p>"
            b"<p><a href='/u/2'>user2</a> says: another take</p>"
            b"</div></body></html>")
    out = strip_html(html)
    assert "Story text one" in out and "hot take" not in out


def test_entity_references_decode():
    html = (b"<html><body><div><p>Fish &amp; Chips cost &pound;5 "
            b"&mdash; &quot;bargain&quot; &lt;really&gt;.</p></div>"
            b"</body></html>")
    assert strip_html(html) == 'Fish & Chips cost £5 — "bargain" <really>.'


def test_malformed_nesting_tolerated():
    html = (b"<html><body><div><p>Unclosed paragraph one"
            b"<p>Second paragraph <b>bold never closed"
            b"<div><p>Nested div paragraph with the most text of all of "
            b"them here.</div></body>")
    assert strip_html(html) == (
        "Nested div paragraph with the most text of all of them here.")


def test_html_comments_and_script_bodies_invisible():
    html = (b"<html><body><!-- <p>commented out</p> --><div>"
            b"<p>Visible text only.</p>"
            b"<script>var x = \"<p>not text</p>\";</script></div>"
            b"</body></html>")
    assert strip_html(html) == "Visible text only."


def test_all_links_page_yields_empty():
    assert strip_html(b"<html><body><nav><a href='/'>only links</a>"
                      b"</nav></body></html>") == ""


def test_transport_encodings_and_legacy_charsets():
    """WARC-derived corpora carry gzip/deflate bodies verbatim and
    legacy-charset pages: gzip and zlib transport decompress, declared
    charsets honor, undeclared non-UTF-8 falls back to cp1252 (the
    browser behavior) instead of garbling with replacement chars."""
    import gzip
    import zlib

    from effocr_spark.functions.domstrip import strip_html

    doc = ("<html><body><main><p>Real content paragraph here with "
           "words.</p></main></body></html>")
    want = "Real content paragraph here with words."
    assert strip_html(gzip.compress(doc.encode())) == want
    assert strip_html(zlib.compress(doc.encode())) == want
    legacy = ('<html><head><meta charset="windows-1252"></head><body>'
              "<main><p>Café déjà vu – naïve</p></main></body></html>"
              ).encode("cp1252")
    assert strip_html(legacy) == "Café déjà vu – naïve"
    legacy2 = ("<html><body><main><p>Smart “quotes” and — dashes</p>"
               "</main></body></html>").encode("cp1252")
    assert strip_html(legacy2) == "Smart “quotes” and — dashes"
    # truncated gzip quarantines to empty, never raises
    assert strip_html(gzip.compress(doc.encode())[:10]) == ""
