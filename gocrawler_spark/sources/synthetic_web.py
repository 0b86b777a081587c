"""Deterministic synthetic web — the test/bench stand-in for HTTP.

A page is a PURE FUNCTION of (url, seed): both the Python oracle and
the Spark fetch stage (pandas UDF batches) call :func:`fetch_page` and
get byte-identical content — no network, no lookup table, no state
(FIXTURES.md §2; replaces reference crawler.go:153-247).

The generated graph exercises every frontier/curation code path:
same-SLD links (intra-site drop crawler.go:1068), banned domains/tokens
(crawler.yaml:1,3), query-string URLs (validator reject crawler.go:354),
always-failing hosts (politeness crawler.go:503-518), mixed-quality
paragraphs (ratio gates crawler.go:1181-1211), duplicated paragraphs
(signature dedup crawler.go:1241-1255), and varying topical keyword
density (ranking crawler.go:547-581).
"""

from __future__ import annotations

import hashlib
import struct


def h64(*parts: object, seed: int = 42) -> int:
    """Stable 64-bit hash (blake2b) of the given parts + seed."""
    b = hashlib.blake2b(
        ("|".join(str(p) for p in parts)).encode(), digest_size=8,
        key=struct.pack("<q", seed),
    )
    return int.from_bytes(b.digest(), "little")


# Vocabulary pools (disjoint from the reference stopword/low-relevancy
# lists so filter behavior is controlled, not accidental).
_STOPWORDS = ["the", "a", "and", "of", "to", "in", "that", "is", "on", "for"]
_TOPIC = ["covid", "virus", "vaccine", "pandemic", "outbreak",
          "testing", "quarantine", "transmission", "spread", "clinical"]
_CONTENT = [f"zword{i:03d}" for i in range(120)]

_HOSTS_OK = [f"site{i}.example" for i in range(12)] + [
    "alpha.example", "beta.example", "news.gamma.example",
]
_HOSTS_FAIL = ["flaky0.example", "flaky1.example"]
_HOSTS_BANNED = ["facebook.com", "github.com", "en.wikipedia.org"]
_PATH_KINDS = ["topic", "article", "story", "misc", "junk"]


def _mk_url(hv: int) -> str:
    """Derive a link target from a hash value."""
    kind = hv % 100
    if kind < 6:  # banned domain
        host = _HOSTS_BANNED[hv % len(_HOSTS_BANNED)]
        return f"https://{host}/{_PATH_KINDS[hv % 3]}-{(hv >> 8) % 50}"
    if kind < 12:  # banned token (binary ext)
        host = _HOSTS_OK[hv % len(_HOSTS_OK)]
        return f"https://{host}/report-{(hv >> 8) % 50}.pdf"
    if kind < 18:  # query string → validator reject
        host = _HOSTS_OK[hv % len(_HOSTS_OK)]
        return f"https://{host}/page?id={(hv >> 8) % 50}"
    if kind < 24:  # failing host
        host = _HOSTS_FAIL[hv % len(_HOSTS_FAIL)]
        return f"https://{host}/{_PATH_KINDS[hv % 4]}-{(hv >> 8) % 30}"
    if kind < 30:  # invalid (uppercase path chars are fine; use '#')
        host = _HOSTS_OK[hv % len(_HOSTS_OK)]
        return f"https://{host}/frag-{(hv >> 8) % 50}#sec"
    host = _HOSTS_OK[hv % len(_HOSTS_OK)]
    path = _PATH_KINDS[(hv >> 4) % len(_PATH_KINDS)]
    return f"https://{host}/{path}-{(hv >> 8) % 200}"


def _sentence(hv: int, n_tokens: int, topic_every: int, stop_every: int) -> str:
    words = []
    for i in range(n_tokens):
        wv = h64(hv, i)
        if topic_every and i % topic_every == 1:
            words.append(_TOPIC[wv % len(_TOPIC)])
        elif stop_every and i % stop_every == 0:
            words.append(_STOPWORDS[wv % len(_STOPWORDS)])
        else:
            words.append(_CONTENT[wv % len(_CONTENT)])
    return " ".join(words)


# A small shared pool of paragraphs reused verbatim across pages to
# drive near-duplicate detection.
def _common_paragraph(idx: int, seed: int) -> str:
    return _sentence(h64("commonpara", idx, seed=seed), 60, 7, 3)


def _paragraph(url: str, i: int, seed: int) -> str:
    hv = h64(url, "para", i, seed=seed)
    kind = hv % 10
    if kind == 0:  # nav junk: no stopwords → ratio < 0.1 → dropped
        return _sentence(hv, 40, 0, 0)
    if kind == 1:  # html attr junk → P1 drop
        return _sentence(hv, 30, 5, 3) + ' <span class="nav-menu"> end'
    if kind == 2:  # foreign → language gate
        return "zzforeignzz " + _sentence(hv, 40, 5, 3)
    if kind == 3:  # short (< 200 chars) → curation length gate
        return _sentence(hv, 12, 5, 3)
    if kind == 4:  # duplicated across pages → signature dedup pressure
        return _common_paragraph(hv % 4, seed)
    if kind == 5:  # slash tokens + a very long word → scrubs
        return (
            _sentence(hv, 30, 5, 3)
            + " see http://x.example/path/deep "
            + "x" * 85
            + " " + _sentence(h64(hv, "b"), 30, 5, 3)
        )
    # good prose, topical density varies with the hash
    topic_every = 4 + (hv >> 8) % 9
    return _sentence(hv, 45 + (hv >> 16) % 40, topic_every, 3)


def page_text(url: str, seed: int = 42) -> str:
    n_paras = 6 + h64(url, "nparas", seed=seed) % 8
    return "\n".join(_paragraph(url, i, seed) for i in range(n_paras))


def page_links(url: str, seed: int = 42) -> list[str]:
    hv = h64(url, "links", seed=seed)
    fanout = 8 + hv % 12
    links = []
    for j in range(fanout):
        lv = h64(url, "link", j, seed=seed)
        if lv % 5 == 0:
            # same-SLD child → intra-site drop (crawler.go:1068)
            links.append(f"https://{_host_of(url)}/topic-{(lv >> 8) % 200}")
        else:
            links.append(_mk_url(lv))
    return links


def _host_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    return rest.split("/", 1)[0]


def fetch_ok(url: str, seed: int = 42) -> bool:
    return _host_of(url) not in _HOSTS_FAIL


def fetch_page(url: str, seed: int = 42) -> tuple[str, list[str], bool]:
    """The deterministic 'HTTP GET': (plain_text, out_links, ok)."""
    if not fetch_ok(url, seed):
        return "", [], False
    return page_text(url, seed), page_links(url, seed), True


def seed_urls() -> list[str]:
    """Bootstrap URLs whose pages fan out into the synthetic web."""
    return ["https://seed.example/start"]


# ---------------------------------------------------------------------------
# Raw-HTML emission: the same pages as real markup, so the S2 parser
# (functions/html.py) can be exercised end-to-end. render_html is built
# to be exactly inverted by html_to_text/extract_links:
#   html_to_text(render_html(text, links)) == text
#   extract_links(render_html(text, links)) == links
# (text lines become escaped <p> blocks; links become empty anchors that
# contribute no text; head/script content must be dropped by the parser.)


def render_html(
    text: str,
    links: list[str],
    title: str = "page",
    anchor_texts: list[str] | None = None,
) -> str:
    from html import escape

    paras = "\n".join(f"<p>{escape(p)}</p>" for p in text.split("\n"))
    inner = (
        [""] * len(links)
        if anchor_texts is None
        else [escape(t) for t in anchor_texts]
    )
    anchors = "".join(
        f'<a href="{escape(l, quote=True)}">{t}</a>'
        for l, t in zip(links, inner)
    )
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{escape(title)}</title>"
        "<style>p { margin: 0 }</style>"
        f"<script>var nLinks = {len(links)};</script>"
        "</head>\n<body>\n"
        f"{paras}\n<nav>{anchors}</nav>\n"
        "<!-- generated -->\n</body></html>"
    )


def fetch_html(url: str, seed: int = 42) -> tuple[str, bool]:
    """The deterministic 'HTTP GET' returning raw body markup."""
    if not fetch_ok(url, seed):
        return "", False
    return render_html(page_text(url, seed), page_links(url, seed), title=url), True
