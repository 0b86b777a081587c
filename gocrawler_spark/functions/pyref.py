"""Pure-Python reference semantics (single source of truth for the
Python side: the wave=1 oracle and pandas-UDF corners).

Each function documents the reference behavior it reproduces
(file:line into /root/reference). Regexes are compiled with
``re.ASCII`` so ``\\W``/``\\w`` are ASCII classes exactly like Go RE2
and Java regex defaults; tokenization uses the ``regex`` module's
Unicode categories to match Go's ``unicode.IsLetter/IsNumber``
(crawler.go:528-533).

These run on the driver (oracle) or inside Arrow-batched UDFs — never
per-row over big data; the scale path is the column-expression layer in
``gocrawler_spark.functions.text`` / ``urls``.
"""

from __future__ import annotations

import math
import re
from functools import lru_cache
from urllib.parse import urlparse

import regex as uregex  # Unicode-category regex (public PyPI `regex`)

from gocrawler_spark.config import REGEX_URL_VALID, CrawlConfig

# Go tokenize splits on any rune that is NOT unicode letter/number
# (crawler.go:528-533). \p{L}\p{N} are the same categories.
_TOKEN_SPLIT = uregex.compile(r"[^\p{L}\p{N}]+")


@lru_cache(maxsize=512)
def _rx(pattern: str) -> re.Pattern:
    return re.compile(pattern, re.ASCII)


def tokenize(text: str) -> list[str]:
    """crawler.go:528-533 (strings.FieldsFunc drops empty fields)."""
    return [t for t in _TOKEN_SPLIT.split(text) if t]


def tokens_count(text: str) -> int:
    """crawler.go:535-537."""
    return len(tokenize(text))


def split_paragraphs(text: str) -> list[str]:
    """crawler.go:539-545 — split on `[\\r\\n]+` (keeps empty edges)."""
    return re.split(r"[\r\n]+", text)


def stopword_filter_tokens(tokens: list[str], cfg: CrawlConfig) -> list[str]:
    """Per-token equivalent of stopwordFilter (crawler.go:646-662).

    The reference doubles separators then deletes `\\W(alt)\\W` matches;
    on space-joined tokens that is exactly "drop token iff a stopword
    alternative spans it" (see CrawlConfig.stop_token_fullmatch).
    """
    rx = _rx(cfg.stop_token_fullmatch)
    return [t for t in tokens if not rx.match(t)]


def analyze(text: str, cfg: CrawlConfig) -> list[str]:
    r"""crawler.go:672-687: tokenize → lowercase → stopword-filter.

    stopwordFilter's separator doubling uses RE2's ASCII-only `\W`
    (crawler.go:651), so a non-ASCII rune inside a token splits it
    into ASCII fragments BEFORE the stop deletion — 'café' → 'caf'
    (+ a length-gated tail), 'résumé' → 'r', 'sum'. Mirrored by the
    fragment split below; the final re-tokenize of the reference is
    then a no-op (fragments are pure ASCII alnum; stemming is
    disabled in the reference)."""
    tokens = [t.lower() for t in tokenize(text)]
    frags = [
        f for t in tokens for f in re.split(r"[^0-9a-z_]+", t) if f
    ]
    return stopword_filter_tokens(frags, cfg)


def term_freq(text: str, cfg: CrawlConfig) -> dict[str, int]:
    """freq.add — crawler.go:689-698."""
    f: dict[str, int] = {}
    for t in analyze(text, cfg):
        f[t] = f.get(t, 0) + 1
    return f


def rsort_freq(f: dict[str, int]) -> list[tuple[str, int]]:
    """rSortFreq — crawler.go:705-718: desc count, ties desc token."""
    return sorted(f.items(), key=lambda kv: (kv[1], kv[0]), reverse=True)


def signature_of(freqs: dict[str, int], k: int = 7) -> str:
    """Top-k signature string — crawler.go:1241-1246 / 853-859.

    Reference renders `getKVkeys(sorted[:7])` with Go's `%v` on a
    []string → `[tok1 tok2 ...]`.
    """
    top = [t for t, _ in rsort_freq(freqs)[:k]]
    return "[" + " ".join(top) + "]"


def stopwords_count(text: str, cfg: CrawlConfig) -> int:
    """stopWordsCount — crawler.go:609-619.

    Non-overlapping scan of `(?i)\\W(stop)\\W` over " "+text+" ";
    adjacent stopwords are NOT doubled here, so consecutive hits can
    shadow each other — load-bearing for the ratio filters P2/P3.
    """
    rx = _rx(cfg.regex_stopwords_count)
    return len(rx.findall(" " + text + " "))


def low_relevancy_on_border_count(text: str, cfg: CrawlConfig) -> int:
    """lowRelevancyWordsOnBorderCount — crawler.go:633-643.

    Left border matches stop+lowrel words, right border only stopwords
    (the asymmetry is intentional in the reference).
    """
    left = _rx(r"(?i)^(" + cfg.border_left_lowrel + r")\W")
    right = _rx(r"(?i)\W(" + cfg.border_right_stop + r")$")
    return len(left.findall(text)) + len(right.findall(text))


def ranking_by_keywords(text: str, cfg: CrawlConfig) -> float:
    """rankingByKeywords — crawler.go:547-581.

    Count DISTINCT lowercased keyword matches (group len >= 3), scale by
    100/sqrt(1+numTokens). NB Go's FindAllStringSubmatch is a
    non-overlapping scan: the trailing `\\W` consumes the separator, so
    immediately adjacent keywords can shadow each other — reproduced
    here by using the same scan (finditer on the full pattern).
    """
    rx = _rx(cfg.regex_ranking_keywords)
    uniq = set()
    for m in rx.finditer(text):
        g = m.group(1)
        if len(g) >= 3:
            uniq.add(g.lower())
    return 100.0 * len(uniq) / math.sqrt(1 + tokens_count(text))


def best_paragraph(paragraphs: list[str], cfg: CrawlConfig) -> str:
    """bestParagraph — crawler.go:583-599 (strict >, first wins ties;
    truncate to 1996 BYTES + ' ...' — Go len()/slicing count bytes)."""
    best, best_score = "", 0.0
    for p in paragraphs:
        s = ranking_by_keywords(p, cfg)
        if s > best_score:
            best_score = s
            best = p
    b = best.encode("utf-8")
    if len(b) > 2000:
        # byte slice like Go best[:1996]; surrogateescape round-trips a
        # mid-rune cut byte-exactly
        best = b[:1996].decode("utf-8", "surrogateescape") + " ..."
    return best


# --------------------------- URL toolkit ----------------------------------

_URL_VALID = _rx(REGEX_URL_VALID)
_WWW = re.compile(r"^www\.(.*)$")  # case-sensitive like crawler.go:294
_SLD = re.compile(r"^.*?([^.]+\.[^.]+)$")


def _hostname(link: str) -> str:
    """Go ``url.Hostname()``: CASE-PRESERVED — ``urlparse().hostname``
    lowercases, so the host is carved out of the case-preserving
    ``netloc`` instead (strip userinfo, strip port)."""
    try:
        netloc = urlparse(link).netloc
    except ValueError:
        return ""
    host = netloc.rsplit("@", 1)[-1]
    if host.startswith("["):  # [v6]:port
        host = host[1:].split("]", 1)[0]
    else:
        host = host.split(":", 1)[0]
    return host


def get_domain(link: str) -> str:
    """getDomain — crawler.go:283-297: ``url.Hostname()`` minus one
    leading (case-sensitive) 'www.'. Go does NOT lowercase the host."""
    host = _hostname(link)
    m = _WWW.match(host)
    return m.group(1) if m else host


def get_second_level_domain(link: str) -> str:
    """getSecondLevelDomain — crawler.go:299-313 (no-match → unchanged;
    case-preserved like every Go host)."""
    host = _hostname(link)
    m = _SLD.match(host)
    return m.group(1) if m else host


def is_banned(link: str, domain: str, cfg: CrawlConfig) -> bool:
    """isBanned — crawler.go:319-331 (unanchored search)."""
    return bool(
        _rx(cfg.regex_banned_domains).search(domain)
        or _rx(cfg.regex_link_banned_tokens).search(link)
    )


_BAD_PCT = re.compile(r"%(?![0-9A-Fa-f]{2})")


def link_seems_ok(link: str, avoid_custom_check: bool, cfg: CrawlConfig) -> bool:
    """linkSeemsOk — crawler.go:333-382.

    Gates: length 13..256; url.ParseRequestURI (crawler.go:343 — the
    structural regex charset covers every reject EXCEPT an invalid
    percent-escape, stated explicitly); structural regex
    (crawler.go:354); optional topical regexLinkOk.
    """
    if len(link) < 13 or len(link) > 256:
        return False
    if not _URL_VALID.search(link):
        return False
    if _BAD_PCT.search(link):
        return False
    if not avoid_custom_check:
        return bool(_rx(cfg.regex_link_ok).search(link))
    return True
