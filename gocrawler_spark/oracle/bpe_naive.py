"""Naive reference BPE — the independent oracle for operators/bpe.py.

Same contract as the engine's tokenizer (word regex, END marker, type
cap by (count desc, word asc), merge pick by (pair count desc, pair
lex asc), greedy encode merging the lowest-rank pair with leftmost
tie-break), implemented the OBVIOUS way: training recounts every
adjacent pair across all word types from scratch on every merge step,
and encoding rescans the symbol list per merge. O(merges * corpus
types) training and O(len^2) encode — deliberately unoptimized so it
shares no code or algorithmic shortcut with the engine's
incremental-pair-count implementation (operators/bpe.py). Used by
scripts/regen_bpe_fixtures.py to pin the `bpe_token_stats` oracle
fixtures and by tests/test_bpe.py as a drift guard.
"""

from __future__ import annotations

import re
from collections import Counter

END = "</w>"
WORD_RE = re.compile(r"[a-z]+|[0-9]+")


def naive_train(
    texts: list[str],
    n_merges: int,
    max_types: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    wc: Counter = Counter()
    for t in texts:
        wc.update(WORD_RE.findall(t.lower()))
    types = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_types]

    words = {w: tuple(w) + (END,) for w, _ in types}
    counts = dict(types)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # full recount every step — no incremental maintenance
        pc: Counter = Counter()
        for w, syms in words.items():
            c = counts[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        pair = best[0]
        merges.append(pair)
        for w, syms in words.items():
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == pair:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[w] = tuple(out)
    return merges


def naive_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + [END]
    ranks = {p: i for i, p in enumerate(merges)}
    while True:
        best_rank = None
        best_j = None
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_j is None:
            return syms
        syms = syms[:best_j] + [syms[best_j] + syms[best_j + 1]] + syms[best_j + 2 :]


def naive_doc_stats(
    doc_ids: list[int], texts: list[str], merges: list[tuple[str, str]]
) -> list[tuple[int, int, int, int]]:
    """(doc_id, n_words, n_bpe_tokens, n_chars_in_words) per doc."""
    rows = []
    for did, t in zip(doc_ids, texts):
        ws = WORD_RE.findall(str(t).lower())
        n_bpe = sum(len(naive_encode(w, merges)) for w in ws)
        rows.append((did, len(ws), n_bpe, sum(len(w) for w in ws)))
    return rows
