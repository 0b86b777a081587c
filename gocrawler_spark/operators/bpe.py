"""Byte-pair-encoding tokenizer: corpus-trained merges + distributed
encode — real BPE token accounting for LLM-corpus work (the regex
pre-tokenizer in queries/text_q.py:token_count_bpe approximates this;
this operator runs the actual algorithm).

Shape (the standard practical split, same as HF tokenizers):

- **word counting is distributed**: one explode → groupBy(word) pass
  with map-side combine; the TYPE vocabulary (distinct words) is then
  orders of magnitude smaller than the corpus, capped top-V
  deterministically (count desc, word asc);
- **merge training is driver-side over the word-count table** —
  classic incremental-pair-count BPE over ≤V word types. This is not a
  driver bottleneck at any corpus size: the input is the capped type
  table, not the corpus (100 TB of text still trains on V=30k types);
- **encoding is distributed**: merge ranks broadcast to executors, one
  Arrow-batched pandas pass; each distinct word in a batch is encoded
  once and fanned out by count.

Determinism: merge selection is (pair count desc, pair lexicographic
asc); the type cap is (count desc, word asc); greedy encode always
merges the lowest-rank pair (leftmost on rank ties). Training twice on
the same corpus gives byte-identical merge tables.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"
WORD_RE = r"[a-z]+|[0-9]+"  # letter runs / digit runs over lowercased text


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the lowercased corpus — one shuffle."""
    w = F.explode(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0)
        )
    ).alias("word")
    return docs.select(w).groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))


def top_types(wc: DataFrame, max_types: int) -> list[tuple[str, int]]:
    """Deterministic type cap: count desc, word asc."""
    rows = wc.orderBy(F.desc("cnt"), F.asc("word")).limit(max_types).collect()
    return [(r["word"], r["cnt"]) for r in rows]


def train_bpe_from_counts(
    types: list[tuple[str, int]],
    n_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Classic BPE training with incremental pair-count maintenance:
    each merge updates only the words that contain the merged pair.
    Returns the ordered merge list."""
    words = [tuple(w) + (END,) for w, _ in types]
    counts = [c for _, c in types]
    pair_counts: Counter = Counter()
    pair_index: defaultdict = defaultdict(set)
    for i, ws in enumerate(words):
        for p in zip(ws, ws[1:]):
            pair_counts[p] += counts[i]
            pair_index[p].add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best, best_cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_cnt < min_pair_count:
            break
        merges.append(best)
        for i in list(pair_index[best]):
            ws, c = words[i], counts[i]
            for p in zip(ws, ws[1:]):
                pair_counts[p] -= c
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_index[p].discard(i)
            new = []
            j = 0
            while j < len(ws):
                if j + 1 < len(ws) and (ws[j], ws[j + 1]) == best:
                    new.append(ws[j] + ws[j + 1])
                    j += 2
                else:
                    new.append(ws[j])
                    j += 1
            words[i] = tuple(new)
            for p in zip(words[i], words[i][1:]):
                pair_counts[p] += c
                pair_index[p].add(i)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode of one word: repeatedly merge the
    lowest-rank adjacent pair (leftmost wins rank ties)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_j = None, None
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_j is None:
            break
        syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
    return syms


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_types: int = 30_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge training."""
    return train_bpe_from_counts(
        top_types(word_counts(docs, text_col), max_types),
        n_merges,
        min_pair_count,
    )


def bpe_doc_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens, n_chars_in_words): distributed
    encode — merge ranks are broadcast (a list of string pairs, tiny),
    each DISTINCT word in an Arrow batch is encoded once and fanned
    out by its count. No shuffle; one scan."""
    import pandas as pd

    ranks = {p: i for i, p in enumerate(merges)}
    import re

    word_re = re.compile(WORD_RE)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}
        for pdf in batches:
            out = {"doc_id": [], "n_words": [], "n_bpe_tokens": [],
                   "n_chars_in_words": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                ws = word_re.findall(str(text).lower())
                n_bpe = 0
                n_chars = 0
                for w in ws:
                    n = cache.get(w)
                    if n is None:
                        n = len(encode_word(w, ranks))
                        cache[w] = n
                    n_bpe += n
                    n_chars += len(w)
                out["doc_id"].append(did)
                out["n_words"].append(len(ws))
                out["n_bpe_tokens"].append(n_bpe)
                out["n_chars_in_words"].append(n_chars)
            yield pd.DataFrame(out)

    return docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).mapInPandas(
        enc, "doc_id long, n_words long, n_bpe_tokens long, n_chars_in_words long"
    )
