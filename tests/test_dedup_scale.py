"""Scale-shape guarantees of the dedup family: the exact block-pair
grid (dedup_q._block_paired_pairs) distributes in-bucket all-pairs
cosine work without changing a single output value."""

def test_block_pair_grid_is_output_invariant(spark):
    """The exact block-pair grid must produce IDENTICAL pairs for any
    block count — B only redistributes the work. B=1 is the old
    one-task-per-bucket shape; B=5 splits each bucket over 15 tasks."""
    import numpy as np

    from pyspark.sql import functions as F
    from gocrawler_spark.queries.dedup_q import (
        _COS_THRESHOLD_MICRO,
        _block_paired_pairs,
        _round_half_away,
        ann_lsh_buckets,
    )
    from gocrawler_spark.queries import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    joined = emb.join(
        ann_lsh_buckets(spark, "/root/testdata/sf0.001"), "vec_id"
    )

    def nrm_fn(X):
        return _round_half_away(X * X * 1e12).astype(np.int64).sum(axis=1)

    def dot_fn(Xs, x):
        return _round_half_away(Xs * x * 1e12).astype(np.int64).sum(axis=1)

    def run(b):
        return sorted(
            tuple(r)
            for r in _block_paired_pairs(
                joined, "vec_id", "embedding", nrm_fn, dot_fn,
                _COS_THRESHOLD_MICRO, "vec_a", "vec_b", blocks=b,
            ).collect()
        )

    one = run(1)
    five = run(5)
    assert len(one) > 0
    assert one == five
