"""Main-content extraction from HTML (DOM-heuristic branch).

The north rule's born-digital twin of the OCR branch: strip boilerplate,
pick the highest-text-density / lowest-link-density container, emit
whitespace-normalized paragraphs. No reference analog exists (the
reference is OCR-only); semantics are pinned by this kernel, which is
shared between the Spark pandas UDF and the test oracle so byte-parity
is by construction (SURVEY.md §7.1 item 3).

Pure stdlib (html.parser), deterministic, no I/O.
"""

from __future__ import annotations

from html.parser import HTMLParser

# subtrees dropped entirely
_SKIP_TAGS = {
    "script", "style", "noscript", "template", "svg", "head",
    "nav", "header", "footer", "aside", "form", "iframe", "button",
}
# elements that can be the main-content container
_CONTAINER_TAGS = {"main", "article", "body", "div", "section", "td"}
# elements that begin a new paragraph inside a container
_PARA_TAGS = {
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "pre",
    "blockquote", "br", "tr", "dt", "dd", "div", "section", "article",
    "main", "td", "table", "ul", "ol",
}
_VOID_TAGS = {"br", "hr", "img", "meta", "link", "input", "area", "base",
              "col", "embed", "source", "track", "wbr"}


class _Container:
    __slots__ = ("order", "paras", "textlen", "linklen")

    def __init__(self, order: int):
        self.order = order
        self.paras: list[list[str]] = [[]]
        self.textlen = 0
        self.linklen = 0


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.skip_depth = 0
        self.link_depth = 0
        self.containers: list[_Container] = []
        self.container_stack: list[_Container] = []
        self.tag_stack: list[str] = []
        self._order = 0

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            if tag == "br" and self.container_stack and not self.skip_depth:
                self.container_stack[-1].paras.append([])
            return
        self.tag_stack.append(tag)
        if self.skip_depth or tag in _SKIP_TAGS:
            self.skip_depth += 1
            return
        if tag == "a":
            self.link_depth += 1
        if tag in _CONTAINER_TAGS:
            c = _Container(self._order)
            self._order += 1
            self.containers.append(c)
            self.container_stack.append(c)
        elif tag in _PARA_TAGS and self.container_stack:
            self.container_stack[-1].paras.append([])

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        # pop until the matching open tag (tolerates malformed nesting)
        while self.tag_stack:
            top = self.tag_stack.pop()
            self._close_one(top)
            if top == tag:
                break

    def _close_one(self, tag):
        if self.skip_depth:
            self.skip_depth -= 1
            return
        if tag == "a" and self.link_depth:
            self.link_depth -= 1
        if tag in _CONTAINER_TAGS and self.container_stack:
            self.container_stack.pop()
        elif tag in _PARA_TAGS and self.container_stack:
            self.container_stack[-1].paras.append([])

    def handle_data(self, data):
        if self.skip_depth or not self.container_stack:
            return
        if not data.strip():
            return
        n = len(data.strip())
        # text accrues to every enclosing container; paragraphs only to
        # the innermost (so an outer div doesn't duplicate inner text in
        # its own paragraph list — but still competes on total text)
        self.container_stack[-1].paras[-1].append(data)
        for c in self.container_stack:
            c.textlen += n
            if self.link_depth:
                c.linklen += n

    def close(self):
        super().close()
        while self.tag_stack:
            self._close_one(self.tag_stack.pop())


def _normalize_ws(s: str) -> str:
    return " ".join(s.split())


def strip_html(html: bytes | str) -> str:
    """HTML bytes/str → extracted main-content text.

    Paragraphs of the best-scoring container, whitespace-normalized,
    joined by '\\n'. Score = own-paragraph text × (1 − link density);
    ties go to earliest document order. Undecodable or empty input → "".
    """
    if isinstance(html, bytes):
        # transport encodings a WARC-derived corpus carries verbatim.
        # Decompression is CAPPED (a crafted gzip bomb in one page
        # must quarantine that page, never OOM the executor task).
        max_html = 256 << 20
        if html[:2] == b"\x1f\x8b":  # gzip body (Content-Encoding)
            import zlib as _zlib
            try:
                d = _zlib.decompressobj(wbits=31)
                html = d.decompress(html, max_html)
                if d.unconsumed_tail:
                    return ""  # expansion cap: quarantine-to-empty
            except Exception:
                return ""
        elif html[:1] == b"\x78" and html[1:2] in (b"\x01", b"\x9c",
                                                   b"\xda"):
            import zlib as _zlib
            try:
                d = _zlib.decompressobj()
                html = d.decompress(html, max_html)
                if d.unconsumed_tail:
                    return ""
            except Exception:
                return ""
        # charset: strict UTF-8 first; else an explicit charset=
        # declaration in the head; else cp1252 (the browser fallback
        # for legacy pages — utf-8-replace would garble them)
        try:
            html = html.decode("utf-8")
        except UnicodeDecodeError:
            import re as _re
            m = _re.search(rb"charset\s*=\s*[\"']?([A-Za-z0-9_-]+)",
                           html[:2048])
            enc = (m.group(1).decode("ascii", "ignore")
                   if m else "cp1252")
            try:
                html = html.decode(enc, errors="replace")
            except (LookupError, UnicodeDecodeError):
                html = html.decode("cp1252", errors="replace")
        except Exception:
            return ""
    parser = _Extractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        return ""
    best = None
    best_score = -1.0
    for c in parser.containers:
        own = sum(len(_normalize_ws(" ".join(p))) for p in c.paras if p)
        if own == 0 or c.textlen == 0:
            continue
        link_density = c.linklen / c.textlen
        score = own * (1.0 - link_density)
        if score > best_score:
            best_score = score
            best = c
    if best is None:
        return ""
    paras = [_normalize_ws(" ".join(p)) for p in best.paras]
    return "\n".join(p for p in paras if p)
