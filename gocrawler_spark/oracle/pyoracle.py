"""Pure-Python transliteration of the reference crawler's SEMANTICS
(the wave=1 correctness oracle — SURVEY.md §5.2).

This is NOT part of the Spark engine; it exists so tests can assert
that the distributed engine reproduces the reference's crawl order,
URL-seen set, curated docs, and corpus frequencies exactly. Every
method cites the reference behavior it mirrors (/root/reference).

Quirks intentionally reproduced:
- getNextLink increments the WINNER's domain counter at selection time,
  and increments pool[0]'s domain even when nothing is eligible
  (crawler.go:386,420).
- bootstrap rows (status 4) win unconditionally, first-in-pool-order
  (crawler.go:395-402); ties on priority keep the earliest row
  (strict '>', crawler.go:407).
- normal pages expand links ONLY when the doc passes every gate —
  the early returns skip addLinksOf (crawler.go:1214-1279,1401-1404);
  bootstrap pages expand immediately after download (crawler.go:1110-1113).
- CSV/ranking row is emitted BEFORE the burstiness gate
  (crawler.go:1269-1279).
- the frontier dedup key is the raw URL string; the reference's CGI
  canonicalization is dead code (validator rejects '?') and is NOT
  applied here.

Deviation (documented): domainHadFailed compiles the domain string as a
regex over the failure log (crawler.go:507-518) — dots match any char
and malformed domains can panic Go. Here (and in the engine) it is an
exact per-domain counter with the same `> 6` threshold.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from gocrawler_spark.config import CrawlConfig
from gocrawler_spark.functions import pyref

# fetcher: url -> (content, links, ok)
Fetcher = Callable[[str], tuple[str, list[str], bool]]


@dataclass
class PoolEntry:
    url: str
    domain: str
    count: int
    status: int  # 0 pending, 1 crawling, 2 downloaded, 3 failed, 4 bootstrap


@dataclass
class OracleResult:
    crawl_order: list[str] = field(default_factory=list)
    accepted_docs: list[dict] = field(default_factory=list)  # url, curated, ...
    ranking_rows: list[dict] = field(default_factory=list)  # CSV analog (S6)
    corpus_freqs: dict[str, int] = field(default_factory=dict)
    pool: list[PoolEntry] = field(default_factory=list)
    domain_counter: dict[str, int] = field(default_factory=dict)
    seen_urls: set[str] = field(default_factory=set)  # fetched (cache keys)


class ReferenceOracle:
    def __init__(self, cfg: CrawlConfig, fetcher: Fetcher, is_english=None):
        self.cfg = cfg
        self.fetch = fetcher
        # deterministic stand-in for whatlanggo (crawler.go:1144-1149)
        self.is_english = is_english or (lambda p: "zzforeignzz" not in p)
        self.pool: list[PoolEntry] = []
        self.domain_counter: dict[str, int] = {}
        self.fail_log: dict[str, int] = {}
        self.cache: dict[str, tuple[str, list[str], bool]] = {}
        self.unique_signature: dict[str, str] = {}
        self.res = OracleResult(
            pool=self.pool, domain_counter=self.domain_counter
        )

    # ---- frontier ---------------------------------------------------------

    def add_link(self, link: str, avoid_filters: bool) -> bool:
        """addLink — crawler.go:425-470."""
        cfg = self.cfg
        domain = pyref.get_domain(link)
        if not pyref.link_seems_ok(link, avoid_filters, cfg):
            return False
        if not avoid_filters:
            if domain == "":
                return False
            if pyref.is_banned(link, domain, cfg):
                return False
            # CGI strip (crawler.go:444-451) is dead code: the validator
            # already rejected any '?'-bearing URL.
        for entry in self.pool:
            if entry.url == link:
                entry.count += 1
                return True
        self.pool.append(
            PoolEntry(link, domain, 1, 4 if avoid_filters else 0)
        )
        return True

    def bootstrap(self):
        """linkBootstraping — crawler.go:472-478."""
        for l in self.cfg.bootstrapping_links:
            self.add_link(l, True)

    def get_next_link(self) -> tuple[int, str]:
        """getNextLink — crawler.go:384-423."""
        cfg = self.cfg
        maxi, max_url, max_priority = 0, "", 0.0
        if not self.pool:
            return 0, ""
        for i, e in enumerate(self.pool):
            if e.status == 4:
                maxi, max_url = i, e.url
                break
            priority = (e.count * e.count) / (
                self.domain_counter.get(e.domain, 0) + 1.0
            )
            if (
                e.status == 0
                and priority > max_priority
                and not pyref.is_banned(e.url, e.domain, cfg)
                and pyref.link_seems_ok(e.url, True, cfg)
            ):
                maxi, max_url, max_priority = i, e.url, priority
        winner_domain = self.pool[maxi].domain
        self.domain_counter[winner_domain] = (
            self.domain_counter.get(winner_domain, 0) + 1
        )
        return maxi, max_url

    def add_links_of(self, next_link: str, links: list[str]):
        """addLinksOf — crawler.go:1063-1080 (intra-site drop)."""
        parent_sld = pyref.get_second_level_domain(next_link)
        for link in links:
            if parent_sld in pyref.get_domain(link):
                continue
            self.add_link(link, False)

    # ---- fetch ------------------------------------------------------------

    def download_cached(self, url: str) -> tuple[str, list[str], bool]:
        """downloadCached — crawler.go:249-281 + failure politeness
        (crawler.go:192-198, 503-518)."""
        if url in self.cache:
            return self.cache[url]
        domain = pyref.get_domain(url)
        if self.fail_log.get(domain, 0) > self.cfg.max_domain_failures:
            return "", [], False  # refused — NOT recorded as new failure
        content, links, ok = self.fetch(url)
        if not ok:
            self.fail_log[domain] = self.fail_log.get(domain, 0) + 1
            return "", [], False
        self.cache[url] = (content, links, True)
        self.res.seen_urls.add(url)
        return content, links, True

    # ---- document pipeline (doNextLink crawler.go:1082-1406) --------------

    def curate(self, content: str) -> tuple[list[str], str]:
        """Paragraph pipeline (crawler.go:1121-1211): language gate,
        scrubs, html-attr drop (tested against the ORIGINAL paragraph),
        stopword-ratio floor; returns (kept paragraphs, best paragraph
        input list is the post-scrub array)."""
        cfg = self.cfg
        paragraphs = pyref.split_paragraphs(content)
        out = []
        for p in paragraphs:
            if not self.is_english(p):
                out.append("")
                continue
            p5 = pyref._rx(r"(?i)\W([^ \t]*/[^ \t]*)\W").sub(" ", p)
            p5 = pyref._rx(r"(?i)(<(p|img|div)[^>]*>)").sub(" ", p5)
            p5 = pyref._rx(r"(?i)\W([^ \t\n]{80,})\W").sub(" ", p5)
            # NB: attr-drop regex runs against the ORIGINAL p (crawler.go:1172)
            if pyref._rx(
                r'(?i)\W(div|img|nofollow|javascript:|'
                r'(alt|class|style|width|height|onclick)="[^"]*")\W'
            ).search(p):
                out.append("")
                continue
            num_stop = pyref.stopwords_count(p5, cfg)
            num_tok = pyref.tokens_count(p5)
            if num_stop / (num_tok + 1) < 0.1:
                out.append("")
            else:
                out.append(p5)
        return out, pyref.best_paragraph(out, cfg)

    def do_next_link(self) -> bool:
        """One reference loop iteration — crawler.go:1082-1406."""
        cfg = self.cfg
        maxi, next_link = self.get_next_link()
        if next_link == "":
            return False
        prev_state = self.pool[maxi].status
        self.pool[maxi].status = 1
        self.res.crawl_order.append(next_link)

        content, links, ok = self.download_cached(next_link)
        self.pool[maxi].status = 2 if ok else 3

        if prev_state == 4 and self.pool[maxi].status == 2:
            self.add_links_of(next_link, links)

        paragraphs, best_p = self.curate(content)

        curated = ""
        for p in paragraphs:
            if len(p.encode("utf-8")) < 200:  # BYTE length (Go len, crawler.go:1195)
                continue
            ratio = pyref.stopwords_count(p, cfg) / (pyref.tokens_count(p) + 1)
            if ratio < 0.1 or ratio > 0.38:
                continue
            curated = curated + "\n" + p

        doc_len = pyref.tokens_count(curated)
        if doc_len > cfg.max_doc_len or doc_len < cfg.min_doc_len:
            return True  # no link expansion (early return)

        f_doc = pyref.term_freq(curated, cfg)
        f_doc["the"] = 0  # crawler.go:1231
        g_doc = pyref.rsort_freq(f_doc)
        signature = pyref.signature_of(f_doc)

        if self.unique_signature.get(signature, "") == "":
            self.unique_signature[signature] = next_link
        else:
            return True  # near-duplicate (crawler.go:1248-1255)

        score = pyref.ranking_by_keywords(curated, cfg)
        if score < cfg.score_threshold:
            return True

        self.res.ranking_rows.append(
            {
                "score": round(score, 2),
                "doc_len": doc_len,
                "signature": signature,
                "url": next_link,
                "best_paragraph": best_p,
            }
        )

        max_ratio = g_doc[0][1] / (1 + doc_len) if g_doc else 0.0
        if max_ratio > 0.1 or max_ratio < 0.002:
            return True  # burstiness gate (crawler.go:1276-1279)

        # corpusFreqs.add re-analyzes curated content from scratch, so
        # "the" IS counted here (crawler.go:1282) even though f_doc had
        # it zeroed — that's what makes the A6 "the"-anchor check work.
        for tok, n in pyref.term_freq(curated, cfg).items():
            self.res.corpus_freqs[tok] = self.res.corpus_freqs.get(tok, 0) + n
        self.res.accepted_docs.append(
            {"url": next_link, "curated": curated, "doc_len": doc_len,
             "signature": signature, "score": score}
        )

        if prev_state == 0 and self.pool[maxi].status == 2:
            self.add_links_of(next_link, links)
        return True

    def run(self, max_iters: int = 10_000) -> OracleResult:
        """main loop — crawler.go:1536-1540."""
        self.bootstrap()
        for _ in range(max_iters):
            if not self.do_next_link():
                break
        return self.res


class PoliteOracle(ReferenceOracle):
    """ReferenceOracle + the engine's politeness semantics (robots
    gate) at wave_size=1 — the independent twin behind the
    `crawl_polite_5waves` driver-gate fixture.

    Semantics mirrored (independently re-implemented, not imported
    from the engine — plans/crawl.py:417-441, operators/politeness.py):
    - robots rules are fetched once per domain at selection time and
      cached for the whole crawl;
    - a selected URL whose path starts with any disallowed prefix is
      REFUSED: never fetched, never served from the page cache, no
      transport-failure count (refusals don't re-report), status -> 3,
      no link expansion, no document pipeline;
    - the domain counter still increments at selection (the reference's
      getNextLink quirk fires before any politeness decision);
    - the crawl-delay token budget is a per-wave cap and is a no-op at
      wave_size=1 (cap >= 1 and each wave holds one URL) — exercised
      separately in tests/test_politeness.py.

    The robots CONTENT comes from the same deterministic generator the
    engine's synthetic fetcher uses (synthetic_robots — it is the
    web's data, like fetch_page); only the gating logic is at stake
    here and is written from scratch.
    """

    def __init__(self, cfg: CrawlConfig, fetcher: Fetcher, is_english=None,
                 robots_fn=None, seed: int | None = None):
        super().__init__(cfg, fetcher, is_english)
        if robots_fn is None:
            from gocrawler_spark.operators.politeness import synthetic_robots

            # default to cfg.seed, matching the engine's
            # fetch_missing_robots(..., seed=cfg.seed) — a hard-coded
            # seed here would silently desync the twins whenever a
            # fixture is generated with cfg.seed != 42
            rseed = cfg.seed if seed is None else seed
            robots_fn = lambda d: synthetic_robots(d, rseed)  # noqa: E731
        self.robots_fn = robots_fn
        self.robots_cache: dict[str, tuple[list[str], int]] = {}

    @staticmethod
    def _path(url: str) -> str:
        """Path component incl. leading slash ('' when absent)."""
        rest = url.split("://", 1)[-1]
        i = rest.find("/")
        return rest[i:] if i >= 0 else ""

    # NOTE (deliberate deviation, shared with the engine): the
    # reference's failure-refusal check re-scans an append-only log
    # with a non-overlapping `\W(domain)\W` regex
    # (crawler.go:507-518); because consecutive same-domain lines
    # share one separator, the scan counts only ~half of an unbroken
    # failure run, so Go's effective threshold drifts between 7 and 13
    # consecutive failures depending on log adjacency. Both this
    # oracle and the engine implement the EVIDENT INTENT — refuse
    # after max_domain_failures(=6) actual failures — rather than
    # emulating the regex undercount, which would require replaying
    # global log order.
    def _robots_disallowed(self, url: str) -> bool:
        domain = pyref.get_domain(url)
        rules = self.robots_cache.get(domain)
        if rules is None:
            rules = self.robots_fn(domain)
            self.robots_cache[domain] = rules
        prefixes, _delay = rules
        path = self._path(url)
        return any(path.startswith(p) for p in prefixes)

    def download_cached(self, url: str) -> tuple[str, list[str], bool]:
        if self._robots_disallowed(url):
            return "", [], False  # refused: no fetch, no cache, no count
        return super().download_cached(url)


class WaveOracle(ReferenceOracle):
    """Epoch-mode oracle for the engine's SCALE MODE (wave_size > 1).

    SURVEY.md §7.3: exact reference-order parity is only defined at
    wave_size=1 (the reference is sequential; its selection-time
    counter quirk makes order depend on per-URL increments). Scale
    mode relaxes the contract to per-epoch semantics: each wave
    selects from a SNAPSHOT of (frontier, domain_counter), fetches the
    whole wave, then applies counter/failure/signature/frontier deltas
    at the wave barrier. This class is the independent plain-Python
    twin of those epoch semantics — list/dict state, no Spark — used
    to generate the `crawl_scale_*` driver-gate fixtures.

    Epoch semantics mirrored (independently, from the documented
    contract — plans/crawl.py step(), operators/frontier.py):
    - selection: pending (status 0) and bootstrap (status 4) rows
      scored from the WAVE-START counter snapshot; order = bootstrap
      first, then priority desc, insertion seq asc; per-host cap
      `per_host_budget`, then global top `wave_size`;
    - every selected URL increments its domain counter by 1 (the
      reference's selection-time increment, batched per wave);
    - failure refusal tests the WAVE-START fail counts; transport
      failures accumulate and commit at the wave barrier;
    - signature first-wins: cross-wave against the wave-start
      signature table, intra-wave by selection rank; ALL new
      signatures commit (even when the doc later fails score/burst);
    - link expansion: bootstrap parents expand when fetched OK,
      normal parents only when fully accepted; candidate occurrences
      aggregate per URL with first-occurrence = min(parent_seq, pos);
      existing URLs take count += delta, new URLs append in first_at
      order (dense insertion seq);
    - terminal quirk: an empty selection still increments the min-seq
      row's domain (crawler.go:386,420).

    The doc pipeline itself (curate, gates, term_freq, signature,
    ranking, burstiness) is byte-identical to ReferenceOracle — wave
    mode changes WHEN state commits, never per-document semantics.
    """

    def __init__(self, cfg: CrawlConfig, fetcher: Fetcher, is_english=None):
        super().__init__(cfg, fetcher, is_english)
        self.index: dict[str, PoolEntry] = {}
        self.wave = 0
        # (wave, url, status_after) — the per-epoch visited relation
        self.visited: list[tuple[int, str, int]] = []

    # pool index == insertion seq (the engine's dense seq assignment)
    def _add_pool(self, url: str, domain: str, count: int, status: int):
        e = PoolEntry(url, domain, count, status)
        self.pool.append(e)
        self.index[url] = e

    def bootstrap(self):
        for l in self.cfg.bootstrapping_links:
            if pyref.link_seems_ok(l, True, self.cfg):
                if l in self.index:
                    # add_link's merge on re-sight (crawler.go:455-459):
                    # a duplicate seed raises count, never duplicates
                    # the pool — same semantics as ReferenceOracle's
                    # bootstrap-through-add_link
                    self.index[l].count += 1
                else:
                    self._add_pool(l, pyref.get_domain(l), 1, 4)

    def _select_epoch(self) -> list[tuple[int, PoolEntry]]:
        cfg = self.cfg
        scored = []
        for seq, e in enumerate(self.pool):
            if e.status == 4:
                scored.append((1, 0.0, seq, e))
            elif e.status == 0:
                pr = (e.count * e.count) / (
                    self.domain_counter.get(e.domain, 0) + 1.0
                )
                scored.append((0, pr, seq, e))
        scored.sort(key=lambda t: (-t[0], -t[1], t[2]))
        if cfg.per_host_budget > 0 and cfg.wave_size > 1:
            taken: dict[str, int] = {}
            capped = []
            for t in scored:
                n = taken.get(t[3].domain, 0)
                if n < cfg.per_host_budget:
                    taken[t[3].domain] = n + 1
                    capped.append(t)
            scored = capped
        return [(seq, e) for _, _, seq, e in scored[: cfg.wave_size]]

    def step_wave(self) -> bool:
        cfg = self.cfg
        sel = self._select_epoch()
        if not sel:
            if self.pool:
                d = self.pool[0].domain
                self.domain_counter[d] = self.domain_counter.get(d, 0) + 1
            return False
        self.wave += 1

        # selection-time counter delta (batched at the epoch barrier)
        for _, e in sel:
            self.domain_counter[e.domain] = (
                self.domain_counter.get(e.domain, 0) + 1
            )

        fail_snapshot = dict(self.fail_log)
        sig_seen = set(self.unique_signature)
        pending_fail: dict[str, int] = {}
        results = []
        for seq, e in sel:
            prev_status = e.status
            if e.url in self.cache:
                content, links, ok = self.cache[e.url]
            elif fail_snapshot.get(e.domain, 0) > cfg.max_domain_failures:
                content, links, ok = "", [], False  # refused, no count
            else:
                content, links, ok = self.fetch(e.url)
                if ok:
                    self.cache[e.url] = (content, links, True)
                    self.res.seen_urls.add(e.url)
                else:
                    pending_fail[e.domain] = (
                        pending_fail.get(e.domain, 0) + 1
                    )
            e.status = 2 if ok else 3
            self.res.crawl_order.append(e.url)
            self.visited.append((self.wave, e.url, e.status))
            results.append((seq, e, prev_status, content, links, ok))
        for d, n in pending_fail.items():
            self.fail_log[d] = self.fail_log.get(d, 0) + n

        # doc pipeline in selection-rank order; parents for expansion
        new_sigs: dict[str, str] = {}
        parents: list[tuple[int, str, list[str]]] = []
        for seq, e, prev_status, content, links, ok in results:
            if prev_status == 4 and ok:
                parents.append((seq, e.url, links))
            if not ok:
                continue
            paragraphs, best_p = self.curate(content)
            curated = ""
            for p in paragraphs:
                if len(p.encode("utf-8")) < 200:
                    continue
                ratio = pyref.stopwords_count(p, cfg) / (
                    pyref.tokens_count(p) + 1
                )
                if ratio < 0.1 or ratio > 0.38:
                    continue
                curated = curated + "\n" + p
            doc_len = pyref.tokens_count(curated)
            if doc_len > cfg.max_doc_len or doc_len < cfg.min_doc_len:
                continue
            f_doc = pyref.term_freq(curated, cfg)
            f_doc["the"] = 0
            g_doc = pyref.rsort_freq(f_doc)
            signature = pyref.signature_of(f_doc)
            if signature in sig_seen or signature in new_sigs:
                continue
            new_sigs[signature] = e.url
            score = pyref.ranking_by_keywords(curated, cfg)
            if score < cfg.score_threshold:
                continue
            self.res.ranking_rows.append(
                {
                    "score": round(score, 2),
                    "doc_len": doc_len,
                    "signature": signature,
                    "url": e.url,
                    "best_paragraph": best_p,
                }
            )
            max_ratio = g_doc[0][1] / (1 + doc_len) if g_doc else 0.0
            if max_ratio > 0.1 or max_ratio < 0.002:
                continue
            for tok, n in pyref.term_freq(curated, cfg).items():
                self.res.corpus_freqs[tok] = (
                    self.res.corpus_freqs.get(tok, 0) + n
                )
            self.res.accepted_docs.append(
                {"url": e.url, "curated": curated, "doc_len": doc_len,
                 "signature": signature, "score": score}
            )
            if prev_status == 0:
                parents.append((seq, e.url, links))
        self.unique_signature.update(new_sigs)

        # link expansion: per-URL aggregation with first-occurrence order
        agg: dict[str, list] = {}
        for parent_seq, parent_url, links in parents:
            parent_sld = pyref.get_second_level_domain(parent_url)
            for pos, link in enumerate(links):
                dom = pyref.get_domain(link)
                if parent_sld in dom:
                    continue
                if not pyref.link_seems_ok(link, False, cfg):
                    continue
                if dom == "" or pyref.is_banned(link, dom, cfg):
                    continue
                a = agg.get(link)
                if a is None:
                    agg[link] = [dom, 1, (parent_seq, pos)]
                else:
                    a[1] += 1
                    if (parent_seq, pos) < a[2]:
                        a[2] = (parent_seq, pos)
        fresh = []
        for url, (dom, delta, first_at) in agg.items():
            ex = self.index.get(url)
            if ex is not None:
                ex.count += delta
            else:
                fresh.append((first_at, url, dom, delta))
        for _, url, dom, delta in sorted(fresh):
            self._add_pool(url, dom, delta, 0)
        return True

    def run(self, max_iters: int = 10_000) -> OracleResult:
        self.bootstrap()
        for _ in range(max_iters):
            if not self.step_wave():
                break
        return self.res

    # ---- retirement (the recrawl wave's enabler) ----------------------
    def retire(self, urls) -> list[str]:
        """Model CrawlEngine.retire (plans/crawl.py): per retired URL —
        page cache evicted (so the next selection re-fetches), its P5
        signature row dropped (else the refreshed content would be
        rejected as a near-dup of itself), pool status 2/3 -> 0 with
        count and seq preserved. Append-only history (visited log,
        domain/fail counters, corpus freqs) is deliberately untouched:
        a recrawl is a new observation, not a retraction."""
        retired = sorted(set(urls))
        for u in retired:
            self.cache.pop(u, None)
            self.res.seen_urls.discard(u)  # the cuckoo-delete analog
            e = self.index.get(u)
            if e is not None and e.status in (2, 3):
                e.status = 0
        drop = {s for s, u in self.unique_signature.items() if u in retired}
        for s in drop:
            del self.unique_signature[s]
        return retired

    def retire_stalest(self, k: int) -> list[str]:
        """Model CrawlEngine.retire_stalest: the k cached pages whose
        most RECENT successful fetch is oldest (max visited wave with
        status 2, url tiebreak)."""
        last: dict[str, int] = {}
        for wave, url, st in self.visited:
            if st == 2 and url in self.cache:
                last[url] = max(last.get(url, 0), wave)
        stale = sorted(last.items(), key=lambda t: (t[1], t[0]))[:k]
        return self.retire([u for u, _ in stale])
