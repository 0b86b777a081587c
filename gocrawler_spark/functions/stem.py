"""T6: Snowball English (Porter2) stemmer.

The reference imports github.com/kljensen/snowball/english and calls
``snowballeng.Stem(token, false)`` in ``stemmerFilter``
(crawler.go:664-670) — but the call site is commented out of the
analyzer (crawler.go:682-686), so stemming ships DISABLED. This module
implements the same published algorithm (the Porter2 / "english"
Snowball stemmer, https://snowballstem.org/algorithms/english/stemmer.html)
from the public spec so the engine can offer the same opt-in:

- ``stem(word)``: Porter2 over a single lowercase word;
- ``stem_or_stop(word)``: kljensen's ``Stem(w, stemStopWords=false)``
  contract — English stopwords (the classic Snowball stop list) pass
  through unchanged;
- ``stem_vocab(df, col)``: the SPARK path. Stemming is a pure
  per-token function, so the scale-correct shape is to apply it to the
  DISTINCT vocabulary (thousands-millions of rows) — one Arrow-batched
  pandas UDF over the vocab table — and broadcast/hash-join the map
  back onto token-frequency aggregates, never running Python per
  corpus row.

Off by default for parity with the reference; ``CrawlConfig`` keeps
the analyzer chain stemmer-free exactly like ``analyze`` does.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VOWELS = set("aeiouy")
DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
LI_ENDING = set("cdeghkmnrt")

# words the algorithm stems irregularly (spec: exception list 1)
_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariants
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
# left unchanged after step 1a (spec: exception list 2)
_EXC2 = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}

# the classic Snowball English stop list (snowballstem.org english/stop.txt),
# the same list kljensen/snowball consults for Stem(w, stemStopWords=false)
STOPWORDS = frozenset("""
i me my myself we our ours ourselves you your yours yourself yourselves he
him his himself she her hers herself it its itself they them their theirs
themselves what which who whom this that these those am is are was were be
been being have has had having do does did doing would should could ought
i'm you're he's she's it's we're they're i've you've we've they've i'd
you'd he'd she'd we'd they'd i'll you'll he'll she'll we'll they'll isn't
aren't wasn't weren't hasn't haven't hadn't doesn't don't didn't won't
wouldn't shan't shouldn't can't cannot couldn't mustn't let's that's who's
what's here's there's when's where's why's how's a an the and but if or
because as until while of at by for with about against between into
through during before after above below to from up down in out on off
over under again further then once here there when where why how all any
both each few more most other some such no nor not only own same so than
too very
""".split())


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in VOWELS


def _regions(word: str) -> tuple[int, int]:
    """(r1, r2) start indices per the spec, with the gener-/commun-/
    arsen- prefix special case for R1."""
    n = len(word)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if word.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """(a) non-vowel, vowel, non-vowel(≠ w/x/Y) at the end, or
    (b) the word is exactly vowel + non-vowel."""
    n = len(word)
    if n == 2:
        return _is_vowel(word, 0) and not _is_vowel(word, 1)
    if n >= 3:
        return (
            not _is_vowel(word, n - 3)
            and _is_vowel(word, n - 2)
            and not _is_vowel(word, n - 1)
            and word[n - 1] not in "wxY"
        )
    return False


def _is_short(word: str) -> bool:
    r1, _ = _regions(word)
    return r1 >= len(word) and _ends_short_syllable(word)


def _has_vowel(s: str) -> bool:
    return any(c in VOWELS for c in s)


def stem(word: str) -> str:
    """Porter2 stem of a single word (caller lowercases; tokens from
    the analyzer already are)."""
    w = word
    if len(w) <= 2:
        return w
    if w[0] == "'":
        w = w[1:]
    if w in _EXC1:
        return _EXC1[w]

    # mark consonant-y: initial y, or y after a vowel. Sequential scan
    # over the MARKED string — a just-marked Y is a consonant, so in
    # "...ayy" only the first y becomes Y (spec: "set initial y, or y
    # after a vowel, to Y").
    if "y" in w:
        chars = list(w)
        if chars[0] == "y":
            chars[0] = "Y"
        for i in range(1, len(chars)):
            if chars[i] == "y" and chars[i - 1] in VOWELS:
                chars[i] = "Y"
        w = "".join(chars)

    # step 0: 's'  's  '
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s") and _has_vowel(w[:-2]):
        w = w[:-1]

    if w in _EXC2:
        return w

    r1, r2 = _regions(w)

    # step 1b
    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    if w.endswith(("eedly", "eed")):
        suf = "eedly" if w.endswith("eedly") else "eed"
        if in_r1(suf):
            w = w[: -len(suf)] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stemp = w[: -len(suf)]
                if _has_vowel(stemp):
                    w = stemp
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(DOUBLES):
                        w = w[:-1]
                    elif _is_short(w):
                        w += "e"
                break

    r1, r2 = _regions(w)

    # step 1c: y/Y -> i after a non-vowel that isn't the first letter
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2] not in VOWELS
    ):
        w = w[:-1] + "i"

    # step 2 (suffix must lie in R1); longest match first
    STEP2 = (
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", "og"), ("li", ""),
    )
    for suf, rep in STEP2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if len(w) > 3 and w[-4] == "l":
                        w = w[:-3] + rep
                elif suf == "li":
                    if len(w) > 2 and w[-3] in LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    r1, r2 = _regions(w)

    # step 3 (in R1; 'ative' needs R2)
    STEP3 = (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    )
    for suf, rep in STEP3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    r1, r2 = _regions(w)

    # step 4 (in R2)
    STEP4 = (
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "al", "er", "ic",
    )
    for suf in STEP4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    r1, r2 = _regions(w)

    # step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2 or (
            len(w) - 1 >= r1 and not _ends_short_syllable(w[:-1])
        ):
            w = w[:-1]
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) > 1 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")


def stem_or_stop(word: str) -> str:
    """kljensen Stem(w, stemStopWords=false): stopwords unchanged."""
    if word in STOPWORDS:
        return word
    return stem(word)


def stem_vocab(
    vocab: DataFrame, col: str = "token", stop_through: bool = True
) -> DataFrame:
    """token -> (token, stem) over a DISTINCT-vocabulary table. This is
    the only place Python touches tokens, and it runs once per vocab
    row, not once per corpus occurrence — join the result back onto
    per-token aggregates (vocab is orders of magnitude smaller than
    the corpus at any scale). mapInPandas (Arrow-batched), defined
    inside the call so importing this module never needs a session.

    ``stop_through=True`` is the kljensen ``Stem(w, false)`` contract
    (stopwords unchanged); ``False`` is the bare Porter2 algorithm
    (what the published spec vocabulary exercises)."""
    fn = stem_or_stop if stop_through else stem

    def batches(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    col: pdf[col],
                    "stem": pdf[col].map(
                        lambda t: fn(t) if t is not None else None
                    ),
                }
            )

    return vocab.select(col).mapInPandas(batches, f"{col} string, stem string")


def stemmed_corpus_freq(corpus_freq: DataFrame) -> DataFrame:
    """A2's corpus frequency table re-aggregated onto Porter2 stems:
    stem the vocab, then one groupBy(stem) — the opt-in the reference
    left commented out, expressed as vocab-sized work only."""
    stems = stem_vocab(corpus_freq.select("token"))
    return (
        corpus_freq.join(stems, "token")
        .groupBy("stem")
        .agg(F.sum("count").alias("count"))
    )
