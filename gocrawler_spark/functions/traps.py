r"""Crawl-trap detection features — pure column expressions.

The reference's only URL hygiene is the regex valid/ban gate
(``regexLinkOk`` / ``regexLinkBannedTokens``, crawler.go:146-183 via
config assembly): it never looks at URL *shape*, so a calendar
pagination loop, a session-id mint, or a self-similar path tree
(`/p/p/p/p/...`) would feed its frontier forever — the single-process
design just dies slowly. At 1e10 URLs a frontier MUST score trap
likelihood before admission; these are the standard lexical features
(Heydon & Najork, "Mercator: a scalable, extensible web crawler",
WWW 1999 §4; every production crawler since):

- ``depth``        — path-segment count,
- ``n_repeats``    — depth minus distinct segments (self-similar
  trees score high; adjacency-free so it survives interleaving),
- ``n_params``     — query-parameter count (faceted/param explosion),
- ``has_session``  — a session/sid token in the query string,
- ``has_calendar`` — a year segment in the path (calendar pagination).

``trap_score`` is a small integer vote; ``score >= 3`` marks the URL
for demotion (not a hard ban — the frontier's priority function
divides by it, mirroring how fetch-failure politeness already demotes
hosts, operators/frontier.py).

Everything is a built-in column expression (regexp_extract / split /
array_distinct) — whole-stage codegen, no Python in the path, and each
feature has an exact DuckDB twin stated in queries/trap_q.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HOST_RX = "^https?://([^/]+)"
PATH_RX = "^https?://[^/]+([^?]*)"
QUERY_RX = r"\?(.*)$"
CAL_RX = "/(19|20)[0-9]{2}(/|$)"  # RE2-safe: no backreferences
SESSION_RX = "(^|&)(sessionid|sid|phpsessid|jsessionid)="

DEPTH_TRAP = 8
REPEAT_TRAP = 3
PARAM_TRAP = 5


def url_parts(url: Column) -> dict[str, Column]:
    """host / path-segment array / query string of a URL column."""
    path = F.regexp_extract(url, PATH_RX, 1)
    return {
        "host": F.regexp_extract(url, HOST_RX, 1),
        "segs": F.filter(F.split(path, "/"), lambda s: s != ""),
        "query": F.regexp_extract(url, QUERY_RX, 1),
    }


def trap_features(url: Column) -> dict[str, Column]:
    p = url_parts(url)
    depth = F.size(p["segs"]).cast("long")
    n_repeats = (depth - F.size(F.array_distinct(p["segs"]))).cast("long")
    n_params = (
        F.when(p["query"] == "", F.lit(0))
        .otherwise(F.size(F.split(p["query"], "&")))
        .cast("long")
    )
    has_session = (
        F.when(F.regexp_extract(p["query"], SESSION_RX, 0) != "", 1)
        .otherwise(0)
        .cast("long")
    )
    path_str = F.concat(F.lit("/"), F.array_join(p["segs"], "/"))
    has_calendar = (
        F.when(F.regexp_extract(path_str, CAL_RX, 0) != "", 1)
        .otherwise(0)
        .cast("long")
    )
    score = (
        F.when(depth >= DEPTH_TRAP, 2).otherwise(0)
        + F.when(n_repeats >= REPEAT_TRAP, 3).otherwise(0)
        + F.when(n_params >= PARAM_TRAP, 1).otherwise(0)
        + has_session * 3
        + has_calendar * 3
    ).cast("long")
    return {
        "host": p["host"],
        "depth": depth,
        "n_repeats": n_repeats,
        "n_params": n_params,
        "has_session": has_session,
        "has_calendar": has_calendar,
        "trap_score": score,
        "is_trap": (score >= 3).cast("long"),
    }
