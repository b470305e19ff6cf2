"""ANN quality: LSH search must find planted near-duplicates (the workload
ANN exists for) and actually prune the candidate space.

Uniform-random vectors have no meaningful neighbors — recall on them is
chance by construction — so the benchmark plants jittered twins: each query's
true nearest neighbor is its slightly-perturbed copy.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from open_thoughts_spark.operators import similarity


def _planted(spark, n=300, dim=32, n_queries=40, seed=11):
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n, dim))
    rows = [(i, base[i].tolist()) for i in range(n)]
    # twins: id 10000+i is a small perturbation of vector i
    for i in range(n_queries):
        twin = base[i] + 0.05 * rng.standard_normal(dim)
        rows.append((10000 + i, twin.tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ann_lsh_finds_planted_twins(spark):
    df = _planted(spark)
    queries = df.filter(F.col("vec_id") < 40)
    exact = similarity.knn_bruteforce(df, queries, k=1)
    top_exact = {r["query_id"]: r["neighbor_id"] for r in exact.collect()}
    assert all(top_exact[i] == 10000 + i for i in range(40))  # sanity

    approx = similarity.ann_lsh_topk(df, queries, k=1, n_planes=8, multiprobe=1)
    top_approx = {r["query_id"]: r["neighbor_id"] for r in approx.collect()}
    hits = sum(1 for i in range(40) if top_approx.get(i) == 10000 + i)
    assert hits / 40 >= 0.8, f"planted-twin recall {hits/40:.2f}"


def test_lsh_buckets_prune_pair_space(spark):
    df = _planted(spark)
    cand = (
        similarity.with_lsh_bucket(df, n_planes=8)
        .groupBy("lsh_bucket")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    )
    n = df.count()
    assert cand < 0.1 * n * n, "LSH buckets do not prune the pair space"


def test_greedy_online_filter_order_exact(spark):
    """The single-node reference-parity mode matches a pure-python replay."""
    import numpy as np
    import pytest
    from open_thoughts_spark.operators.similarity import greedy_online_filter

    rng = np.random.RandomState(5)
    vecs = rng.standard_normal((60, 8))
    vecs[10] = vecs[3] * 1.5          # same direction as 3 → filtered
    vecs[20] = vecs[7] + 0.01 * rng.standard_normal(8)  # near-dup of 7
    rows = [(i, vecs[i].tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(5)
    got = sorted(
        r["vec_id"]
        for r in greedy_online_filter(
            df, "vec_id", "embedding", ["vec_id"], max_similarity=0.9
        ).collect()
    )

    # python replay of the reference algorithm (arrival order = vec_id)
    kept, kept_ids = [], []
    for i in range(60):
        v = vecs[i] / np.linalg.norm(vecs[i])
        if kept and max(np.stack(kept) @ v) > 0.9:
            continue
        kept.append(v)
        kept_ids.append(i)
    assert got == kept_ids
    assert 10 not in got and 20 not in got

    with pytest.raises(ValueError, match="at scale"):
        greedy_online_filter(df, "vec_id", "embedding", ["vec_id"], 0.9, max_rows=10)


def test_ann_ivf_finds_planted_twins(spark):
    df = _planted(spark)
    queries = df.filter(F.col("vec_id") < 40)
    approx = similarity.ann_ivf_topk(df, queries, k=1, n_centroids=16, n_probe=4)
    top = {r["query_id"]: r["neighbor_id"] for r in approx.collect()}
    hits = sum(1 for i in range(40) if top.get(i) == 10000 + i)
    assert hits / 40 >= 0.8, f"IVF planted-twin recall {hits/40:.2f}"


def test_ivf_cells_prune_pair_space(spark):
    df = _planted(spark)
    cand = (
        similarity.with_ivf_cells(df, n_centroids=16, n_probe=1)
        .groupBy("ivf_cell")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    )
    n = df.count()
    assert cand < 0.35 * n * n, "IVF cells do not prune the pair space"


def test_banded_cosine_recall_at_two_plane_counts(spark):
    """VERDICT r5 #6: banded-LSH recall holds when bands widen for larger
    corpora — exact-cosine verify keeps precision exact at ANY width, and
    the measured recall at two plane counts brackets the sizing trade."""
    df = _planted(spark, n=250, n_queries=40)
    truth = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_pairs(df, "vec_id", "embedding", 0.9).collect()
    }
    assert len(truth) >= 40  # the planted twins qualify
    for n_planes in (48, 96):  # 6-bit and 12-bit bands at 8 bands
        got = {
            (r["id_a"], r["id_b"])
            for r in similarity.cosine_pairs_banded(
                df, "vec_id", "embedding", 0.9, n_planes=n_planes
            ).collect()
        }
        assert got <= truth  # exact verify: no false positives ever
        recall = len(got & truth) / len(truth)
        assert recall >= 0.9, f"recall {recall:.2f} at n_planes={n_planes}"


def test_banded_lsh_sizing_occupancy_math():
    from open_thoughts_spark.operators.similarity import banded_lsh_sizing

    # small corpora keep the floor width
    assert banded_lsh_sizing(1_000) == 8 * 6
    assert banded_lsh_sizing(0) == 8 * 6
    # 10^9 rows / 1024-target -> 20-bit bands
    assert banded_lsh_sizing(1 << 30) == 8 * 20
    # bands scale the total plane count
    assert banded_lsh_sizing(1 << 30, bands=16) == 16 * 20
    # tighter occupancy target widens bands
    assert banded_lsh_sizing(1 << 30, target_bucket=64) == 8 * 24


def test_banded_cosine_auto_sizing(spark):
    """n_planes='auto' derives band width from the corpus count; at bench
    N it resolves to the 6-bit floor and finds the planted twins."""
    df = _planted(spark, n=150, n_queries=25)
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_pairs_banded(
            df, "vec_id", "embedding", 0.9, n_planes="auto"
        ).collect()
    }
    twins = {(i, 10000 + i) for i in range(25)}
    assert len(got & twins) / 25 >= 0.9
