"""Deterministic synthetic `pages` table generator (FIXTURES.md §1).

Schema = BASELINE.json input_hint exactly:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string
plus a sidecar `golden` table (url, true_text, branch) carrying the
ground truth each row was generated from.

Every row is a pure function of (seed, row_index): host drawn with a
Zipf-ish skew (a few image-heavy hosts dominate → exercises salted
repartitioning), content either a rendered PNG text line (OCR branch)
or boilerplate-laden HTML with a known main-content block (DOM branch).

Generation itself runs as a Spark job (mapInPandas over spark.range) so
fixture/bench tables scale without a driver bottleneck.
"""

from __future__ import annotations

import datetime as dt

import numpy as np

from .font import (
    EN_CHARSET,
    JP_CHARSET,
    render_line,
    render_page,
    render_page_vertical,
)
from .imgcodec import encode_png

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

_VOCAB = (
    "the quick brown fox jumps over lazy dog and cat runs far away "
    "news print daily herald tribune press gazette section column "
    "market price stock rose fell index trade corn wheat cotton "
    "county state nation city town village mayor council meeting "
    "report year month week day notice sale land farm house barn"
).split()

_JP_VOCAB = list(JP_CHARSET)

N_HOSTS = 50
IMAGE_HOSTS = 3  # hosts 0..2 serve image pages (the skew-heavy hosts)


def _rng(seed: int, i: int) -> np.random.RandomState:
    return np.random.RandomState((seed * 1_000_003 + i * 7_919) % (2**31 - 1))


def _en_sentence(rng: np.random.RandomState, n_words: int) -> str:
    words = [str(_VOCAB[rng.randint(len(_VOCAB))]) for _ in range(n_words)]
    # occasional capitalized word / digits / punctuation, charset-safe
    if rng.random_sample() < 0.4:
        words[0] = words[0].capitalize()
    if rng.random_sample() < 0.3:
        words.append(str(rng.randint(1800, 1999)))
    if rng.random_sample() < 0.3:
        words[-1] = words[-1] + "."
    text = " ".join(words)
    assert all(c in EN_CHARSET or c == " " for c in text), text
    return text


_DESC_WORDS = [w for w in _VOCAB if any(c in "gjpqy" for c in w)]


def _en_ocr_line(rng: np.random.RandomState, n_words: int) -> str:
    """Rendered-line text with full typographic coverage: a capital
    (ascender) and a descender per line, so every line's ink band spans
    the full font cell and line strips match the prototype geometry
    exactly (functions/lineseg.py strip contract)."""
    words = [str(_VOCAB[rng.randint(len(_VOCAB))]) for _ in range(n_words)]
    words[0] = words[0].capitalize()
    if not any(c in "gjpqy" for w in words for c in w):
        words.append(str(_DESC_WORDS[rng.randint(len(_DESC_WORDS))]))
    if rng.random_sample() < 0.3:
        words.append(str(rng.randint(1800, 1999)))
    if rng.random_sample() < 0.3:
        words[-1] = words[-1] + "."
    return " ".join(words)


def _jp_sequence(rng: np.random.RandomState, n_chars: int) -> str:
    return "".join(str(_JP_VOCAB[rng.randint(len(_JP_VOCAB))]) for _ in range(n_chars))


def _html_page(rng: np.random.RandomState, url: str) -> tuple[bytes, str, str]:
    """→ (html bytes, sidecar raw text, golden main-content text)."""
    n_paras = 1 + int(rng.randint(3))
    paras = [_en_sentence(rng, 6 + int(rng.randint(10))) for _ in range(n_paras)]
    golden = "\n".join(paras)
    nav_links = "".join(
        f'<li><a href="/{w}">{w}</a></li>'
        for w in (str(_VOCAB[rng.randint(len(_VOCAB))]) for _ in range(6))
    )
    body_paras = "".join(f"<p>{p}</p>" for p in paras)
    sidebar = f'<a href="/more">{_en_sentence(rng, 3)}</a>'
    html = (
        "<html><head><title>page</title>"
        "<style>body{color:#000}</style>"
        "<script>var x=1;</script></head>"
        f"<body><nav><ul>{nav_links}</ul></nav>"
        f"<header><h1>{_en_sentence(rng, 3)}</h1></header>"
        f'<div id="main">{body_paras}</div>'
        f"<aside>{sidebar}</aside>"
        f"<footer><a href=\"/about\">about</a> <a href=\"/contact\">contact</a></footer>"
        "</body></html>"
    )
    raw_text = " ".join(paras)
    return html.encode("utf-8"), raw_text, golden


def generate_page(i: int, seed: int = 42) -> dict:
    """One deterministic page row (pure function of (seed, i))."""
    rng = _rng(seed, i)
    host = int(N_HOSTS * (rng.random_sample() ** 3))  # Zipf-ish skew to low ids
    url = f"https://host{host:03d}.example/{i % 97:02d}/{i:08d}"
    ts = EPOCH + dt.timedelta(seconds=int(i) * 17 % (86400 * 30))

    if host < IMAGE_HOSTS:
        # OCR branch page: rendered PNG in `html` — a vertical jp line,
        # a single en line, or a multi-line en page (line segmentation)
        if rng.random_sample() < 0.15:
            lang = "jp"
            n_cols = 1 if rng.random_sample() < 0.5 else 2 + int(rng.randint(2))
            cols = [_jp_sequence(rng, 4 + int(rng.randint(7)))
                    for _ in range(n_cols)]
            true_text = "\n".join(cols)
            img = (render_line(cols[0], vertical=True)[0] if n_cols == 1
                   else render_page_vertical(cols))
        else:
            lang = "en"
            n_lines = 1 if rng.random_sample() < 0.4 else 2 + int(rng.randint(4))
            lines = [_en_ocr_line(rng, 3 + int(rng.randint(6)))
                     for _ in range(n_lines)]
            true_text = "\n".join(lines)
            img = render_page(lines)
        return {
            "url": url, "warc_ts": ts, "html": encode_png(img),
            "text": "", "lang": lang,
            "true_text": true_text, "branch": "ocr",
        }

    html, raw_text, golden = _html_page(rng, url)
    return {
        "url": url, "warc_ts": ts, "html": html,
        "text": raw_text, "lang": "en",
        "true_text": golden, "branch": "dom",
    }


PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]
GOLDEN_COLUMNS = ["url", "true_text", "branch"]


def generate_rows(indices, seed: int = 42):
    """Batch generation → list[dict] (for mapInPandas / driver use)."""
    return [generate_page(int(i), seed) for i in indices]


def pages_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: → (pages DF, golden DF), both deterministic.

    Uses mapInPandas over spark.range so a bench-scale table is generated
    in parallel; every row depends only on (seed, id).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    if partitions is None:
        partitions = max(8, spark.sparkContext.defaultParallelism)

    full_schema = (
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, true_text string, branch string"
    )

    def gen(batches):
        for pdf in batches:
            rows = generate_rows(pdf["id"].tolist(), seed)
            yield pd.DataFrame(rows)

    base = spark.range(0, n, 1, partitions)
    both = base.mapInPandas(gen, schema=full_schema)
    pages = both.select(*PAGES_COLUMNS)
    golden = both.select(*GOLDEN_COLUMNS)
    return pages, golden


def write_fixture(spark, out_dir: str, n: int, seed: int = 42):
    """Materialize pages + golden parquet under out_dir."""
    pages, golden = pages_df(spark, n, seed)
    pages.write.mode("overwrite").parquet(f"{out_dir}/pages.parquet")
    golden.write.mode("overwrite").parquet(f"{out_dir}/golden.parquet")
