"""S8 file sinks: corpus-frequency snapshot files in the reference's
two line formats (crawler.go:1296-1300,1338-1341).

The reference writes, at every 50-doc checkpoint:

- ``output/corpusFrequencies.txt`` — ALL corpus tokens in W1 total
  order (count desc, token desc), one line per token in the BNC
  ``all.num`` format ``"%d %s %s %d"`` with pos="none", numDocs=0
  (``fmt.Sprintf`` at crawler.go:1298).
- ``output/corpusNoEngFrequencies.txt`` — the background-subtracted
  ("w/o English", A6) frequencies in the basic format ``"%d %s"``
  (crawler.go:1339).

Both are single ordered text files by the reference's contract, so the
sink is a single-file sink by design: the frame is repartition(1) +
sortWithinPartitions (NOT orderBy + coalesce, whose merge order is not
guaranteed), written by an executor task, then the lone part file is
promoted to the target filename with an atomic rename (same commit
pattern as plans/store.py). Nothing routes through the driver: the
total order costs one shuffle to a single task, which is exactly what
"one sorted file" means physically. At 100 TB vocabulary you would
keep the corpus_freq TABLE as the state of record (the engine already
does) and emit only the top-k slice to a file — pass ``limit_k`` for
that mode; the reference's own console view is the top-100 slice.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _write_single_text(lines: DataFrame, line_col: str, path: str) -> None:
    """Write a one-column frame as ONE ordered text file at `path`
    (atomic: temp dir -> rename of the single part file)."""
    tmp = tempfile.mkdtemp(
        prefix=".snapshot_", dir=os.path.dirname(os.path.abspath(path)) or "."
    )
    out_dir = os.path.join(tmp, "out")
    try:
        lines.select(F.col(line_col).alias("value")).write.mode(
            "overwrite"
        ).text(out_dir)
        parts = sorted(
            f for f in os.listdir(out_dir) if f.startswith("part-")
        )
        assert len(parts) == 1, f"expected 1 part file, got {parts}"
        os.replace(os.path.join(out_dir, parts[0]), path)  # commit point
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _ordered_one_partition(freq: DataFrame, limit_k: int | None) -> DataFrame:
    """W1 total order (count desc, token desc; crawler.go:705-718)
    into a single partition. With limit_k the sort is a
    TakeOrderedAndProject (top-k, no full sort)."""
    if limit_k is not None:
        return (
            freq.orderBy(F.desc("count"), F.desc("token"))
            .limit(limit_k)
            .repartition(1)
            .sortWithinPartitions(F.desc("count"), F.desc("token"))
        )
    return freq.repartition(1).sortWithinPartitions(
        F.desc("count"), F.desc("token")
    )


def write_freq_allnum(
    freq: DataFrame, path: str, limit_k: int | None = None
) -> None:
    """corpusFrequencies.txt: ``"{count} {token} none 0"`` per line
    (crawler.go:1296-1300). Round-trips through the S9 loader
    (operators/corpus.py:load_corpus_file)."""
    line = F.concat_ws(
        " ",
        F.col("count").cast("string"),
        F.col("token"),
        F.lit("none"),
        F.lit("0"),
    )
    _write_single_text(
        _ordered_one_partition(freq, limit_k).select(line.alias("value")),
        "value",
        path,
    )


def write_freq_basic(
    freq: DataFrame, path: str, limit_k: int | None = None
) -> None:
    """corpusNoEngFrequencies.txt: ``"{count} {token}"`` per line
    (crawler.go:1337-1341)."""
    line = F.concat_ws(" ", F.col("count").cast("string"), F.col("token"))
    _write_single_text(
        _ordered_one_partition(freq, limit_k).select(line.alias("value")),
        "value",
        path,
    )


def snapshot_corpus_files(
    corpus_freq: DataFrame,
    baseline: DataFrame,
    out_dir: str,
    limit_k: int | None = None,
) -> dict[str, str]:
    """The reference's full checkpoint file emission
    (crawler.go:1294-1341): the raw corpus freqs in all.num format plus
    the A6 background-subtracted freqs in basic format. Returns the
    written paths."""
    from gocrawler_spark.operators.corpus import background_subtract

    os.makedirs(out_dir, exist_ok=True)
    freq_path = os.path.join(out_dir, "corpusFrequencies.txt")
    noeng_path = os.path.join(out_dir, "corpusNoEngFrequencies.txt")
    write_freq_allnum(corpus_freq, freq_path, limit_k=limit_k)
    write_freq_basic(
        background_subtract(corpus_freq, baseline), noeng_path, limit_k=limit_k
    )
    return {"corpusFrequencies": freq_path, "corpusNoEngFrequencies": noeng_path}
