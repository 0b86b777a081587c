"""Regression tests for bench.py's BENCH/BASELINE.md results splice.

The RESULTS block is machine-rewritten between markers on every
`--scaling` run; a historical bug let a duplicated END marker inside
the block survive every subsequent splice (first-BEGIN..first-END kept
the stray marker forever). The splice now keeps first-BEGIN..last-END
so duplicates collapse. No Spark needed — pure string surgery.
"""

B = "<!-- RESULTS:BEGIN -->"
E = "<!-- RESULTS:END -->"


def splice(doc: str, block: str) -> str:
    # mirror of bench.py main_scaling's splice expression
    return doc[: doc.index(B) + len(B)] + "\n" + block + doc[doc.rindex(E):]


def test_splice_replaces_block_and_keeps_prose():
    doc = f"# header\nprose before\n{B}\nold table\n{E}\nprose after\n"
    out = splice(doc, "new table\n")
    assert "old table" not in out
    assert "new table" in out
    assert out.startswith("# header\nprose before\n")
    assert out.endswith("\nprose after\n")
    assert out.count(B) == 1 and out.count(E) == 1


def test_splice_collapses_historical_duplicate_markers():
    doc = f"# h\n{B}\n{B}\nold\n{E}\n{E}\ntail\n"
    out = splice(doc, "new\n")
    assert out.count(B) == 1 and out.count(E) == 1
    assert "old" not in out and "new" in out and out.endswith("tail\n")
    # and a second splice is a fixed point marker-wise
    out2 = splice(out, "newer\n")
    assert out2.count(B) == 1 and out2.count(E) == 1
    assert "newer" in out2 and "new\n" not in out2
