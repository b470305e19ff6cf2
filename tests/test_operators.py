"""Unit tests: relational building blocks, dedup, similarity, sources,
classifier, embedding, multimodal plumbing."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from open_thoughts_spark.operators import dedup, relational, similarity
from open_thoughts_spark.operators.embedding import embed_texts
from open_thoughts_spark.functions.classifier import (
    classifier_filter,
    train_text_classifier,
)


# --- relational ---

def test_dedup_on_columns_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "z"), (4, "b", "w")],
        "id int, k string, v string",
    )
    out = relational.dedup_on_columns(df, ["k"], ["id"])
    got = sorted((r["id"], r["k"]) for r in out.collect())
    assert got == [(1, "a"), (3, "b")]


def test_merge_left_enrich_null_fill(spark):
    base = spark.createDataFrame(
        [(1, None, "keep"), (2, "have", None)], "k int, a string, b string"
    )
    other = spark.createDataFrame(
        [(1, "filled", "new1"), (2, "clobber?", "new2")], "k int, a string, c string"
    )
    out = relational.merge_left_enrich(base, other, "k")
    rows = {r["k"]: (r["a"], r["b"], r["c"]) for r in out.collect()}
    # null a filled from other; existing a NOT clobbered; new col c added
    assert rows[1] == ("filled", "keep", "new1")
    assert rows[2] == ("have", None, "new2")


def test_uniform_sample_deterministic(spark):
    df = spark.range(1000).withColumn("k", F.col("id").cast("string"))
    a = sorted(r["id"] for r in relational.uniform_sample_fixed(df, 50, ["k"]).collect())
    b = sorted(r["id"] for r in relational.uniform_sample_fixed(df.repartition(7), 50, ["k"]).collect())
    assert len(a) == 50
    assert a == b  # partition-layout independent


def test_stratified_sample(spark):
    df = spark.range(300).withColumn("s", (F.col("id") % 3).cast("string"))
    out = relational.stratified_sample(df, "s", 10, ["id"])
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts == {"0": 10, "1": 10, "2": 10}


def test_repeat_and_truncate(spark):
    df = spark.range(10)
    assert relational.repeat_dataset(df, 3).count() == 30
    assert relational.truncate(df, 4).count() == 4


def test_filter_rank(spark):
    df = spark.range(100).withColumn("score", F.col("id").cast("double"))
    out = relational.filter_rank(df, "score", 0.1)
    got = sorted(r["id"] for r in out.collect())
    # percent_rank = (rank-1)/(n-1); rank 11 → 10/99 > 0.1, so exactly top 10
    assert got == list(range(90, 100))


def test_mix_and_concatenate(spark):
    a = spark.range(5).withColumn("src", F.lit("a"))
    b = spark.range(5, 9).withColumn("src", F.lit("b"))
    u = relational.concatenate([a, b], shard_ids=["s1", "s2"])
    assert u.count() == 9
    assert set(r["shard_id"] for r in u.collect()) == {"s1", "s2"}
    m = relational.mix([a, b], key_cols=["id"])
    assert sorted(r["id"] for r in m.collect()) == list(range(9))


# --- dedup ---

def test_exact_dedup_normalized(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different text")],
        "id int, text string",
    )
    out = dedup.exact_dedup_normalized(df, "id", "text")
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_minhash_dedup_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base),
        (2, base.replace("today", "tonight")),  # near-dup of 1
        (3, "completely unrelated content about distributed query engines and joins"),
        (4, base),  # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = dedup.minhash_dedup(df, "id", "text", min_jaccard=0.5)
    kept = sorted(r["id"] for r in out.collect())
    assert kept == [1, 3]  # 2 and 4 deduped against 1


def test_simhash_near_for_near_texts(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "totally different words entirely unrelated content here now"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    fp = {r["id"]: r["simhash"] for r in dedup.simhash32(df, "id", "text").collect()}
    d12 = bin(fp[1] ^ fp[2]).count("1")
    d13 = bin(fp[1] ^ fp[3]).count("1")
    assert d12 < d13


# --- similarity ---

def test_knn_and_lsh(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.standard_normal((40, 16)).astype(float)
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(16)  # near-dup pair
    rows = [(i, vecs[i].tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.knn_bruteforce(df, df.filter(F.col("vec_id") == 0), k=3)
    top = {r["rank"]: r["neighbor_id"] for r in out.collect()}
    assert top[1] == 1  # nearest neighbor of 0 is its perturbed copy

    nd = similarity.embedding_near_dup(df, min_cosine=0.99)
    assert sorted(r["vec_id"] for r in nd.collect()) == [0] + list(range(2, 40))


# --- sources ---

def test_json_source_and_shard_sampling(spark, tmp_path):
    from open_thoughts_spark.sources import read_jsonl_sharded, sample_shards

    for i in range(6):
        with open(tmp_path / f"part-{i}.jsonl", "w") as f:
            for j in range(10):
                f.write(json.dumps({"id": i * 10 + j, "text": f"doc {i}-{j}"}) + "\n")
    picked = sample_shards(str(tmp_path), "*.jsonl", num_shards=3, seed=314)
    assert len(picked) == 3
    assert picked == sample_shards(str(tmp_path), "*.jsonl", num_shards=3, seed=314)
    df = read_jsonl_sharded(
        spark, str(tmp_path), "*.jsonl", num_shards=3, seed=314,
        schema="id long, text string", source_column=("src", "jsonl"),
    )
    assert df.count() == 30
    assert df.columns == ["id", "text", "src"]


def test_sink_metadata(spark, tmp_path):
    from open_thoughts_spark.sources import upload_metadata, write_table

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    write_table(df, str(tmp_path / "out"))
    meta = upload_metadata(spark, df, "catalog.db.t", ["id", "v"]).collect()[0]
    assert meta["length"] == 100
    meta2 = upload_metadata(spark, df.repartition(7), "catalog.db.t", ["id", "v"]).collect()[0]
    assert meta["fingerprint"] == meta2["fingerprint"]  # order-insensitive


# --- classifier ---

def test_classifier_train_score_filter(spark):
    pos = [(f"p{i}", "excellent great wonderful amazing quality content", "good") for i in range(30)]
    neg = [(f"n{i}", "terrible awful spam junk garbage noise", "bad") for i in range(30)]
    df = spark.createDataFrame(pos + neg, "id string, text string, label string")
    model = train_text_classifier(df, "text", "label", dim=2**12)
    scored = classifier_filter(
        spark, df, model, "text", "good", just_add_scores=True
    )
    rows = {r["id"]: r["_clf_score"] for r in scored.collect()}
    assert rows["p0"] > 0.9 and rows["n0"] < 0.1

    kept = classifier_filter(spark, df, model, "text", "good", filter_threshold=0.5)
    assert sorted(r["id"] for r in kept.collect()) == sorted(p[0] for p in pos)

    top = classifier_filter(spark, df, model, "text", "good", top_percentage=50.0)
    assert top.count() == 30


# --- embedding ---

def test_embed_texts_deterministic_and_normalized(spark):
    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, "x " * 600)], "id int, text string"
    )
    out = {r["id"]: r["embedding"] for r in embed_texts(df, dim=32).collect()}
    import numpy as np

    assert abs(np.linalg.norm(out[1]) - 1.0) < 1e-9
    assert abs(np.linalg.norm(out[2]) - 1.0) < 1e-9  # chunked + pooled path
    out2 = {r["id"]: r["embedding"] for r in embed_texts(df.repartition(3), dim=32).collect()}
    assert out == out2


# --- multimodal ---

def test_multimodal_plumbing(spark):
    from open_thoughts_spark.multimodal import (
        attach_media_metadata,
        decode_and_featurize,
        make_synthetic_media,
        sample_frames,
    )
    from open_thoughts_spark.multimodal.media import FEATURE_DIM, decode_kernel

    media = make_synthetic_media(spark, n=30)
    assert media.count() == 30
    withmeta = attach_media_metadata(media)
    assert withmeta.filter(F.col("payload_bytes") != 64).count() == 0  # sha2-512 = 64B

    feats = decode_and_featurize(media).collect()
    assert len(feats) == 30
    assert all(len(r["feature"]) == FEATURE_DIM for r in feats)
    # deterministic across invocations
    feats2 = {r["media_id"]: r["feature"] for r in decode_and_featurize(media).collect()}
    assert all(feats2[r["media_id"]] == r["feature"] for r in feats)

    frames = sample_frames(media, every_ms=5000)
    vids = media.filter(F.col("kind") == "video").count()
    assert frames.count() >= vids  # >=1 frame per video
    assert frames.filter(F.col("kind") != "video").count() == 0

    with pytest.raises(NotImplementedError):
        decode_kernel(b"abc", "image", deterministic_fake=False)


# --- connected components / transitive closure ---

def test_connected_components_bridge_and_chain(spark):
    # bridge: 1-3, 2-3 near-dup pairs; 1 and 2 not directly similar.
    # pairwise keep-min drops only 3; union-find closure groups {1,2,3}.
    pairs = spark.createDataFrame([(1, 3), (2, 3)], "id_a long, id_b long")
    cc = {(r["node"], r["comp"]) for r in dedup.connected_components(pairs).collect()}
    assert cc == {(1, 1), (2, 1), (3, 1)}

    # long chain exercises pointer doubling: 0-1-2-...-9
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    cc2 = dedup.connected_components(chain, max_iter=6)
    assert all(r["comp"] == 0 for r in cc2.collect())


def test_minhash_dedup_transitive_vs_pairwise(spark):
    # doc 2 = full text, docs 0/1 = disjoint halves: halves pair with the
    # full text but not with each other (the 3-chain where answers differ)
    left = "alpha beta gamma delta epsilon zeta"
    right = "eta theta iota kappa lam mu"
    rows = [(0, left), (1, right), (2, left + " " + right)]
    df = spark.createDataFrame(rows, "id long, text string")
    pairs = dedup.jaccard_pairs(df, "id", "text", shingle_n=2, min_jaccard=0.3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.select("id_a", "id_b").collect()}
    assert got == {(0, 2), (1, 2)}

    cc = dedup.connected_components(pairs)
    losers_closure = {r["node"] for r in cc.filter("comp != node").collect()}
    losers_pairwise = {r["id_b"] for r in pairs.select("id_b").distinct().collect()}
    assert losers_pairwise == {2}
    assert losers_closure == {1, 2}  # closure also drops the second half


def test_simhash64_bandblock_lossless(spark):
    """The 4x16-bit band join must find exactly the unblocked all-pairs
    hamming<=3 truth (pigeonhole: 3 differing bits can't touch all 4 bands),
    and near texts must sit closer than unrelated ones."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, base.replace("river", w)) for i, w in
            enumerate(["river", "creek", "stream", "river"])]
    rows += [(10 + i, f"totally unrelated content number {i} about engines "
              f"joins shuffles and partitions") for i in range(6)]
    df = spark.createDataFrame(rows, "id int, text string")
    fp = dedup.simhash64(df, "id", "text").cache()
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash64_neardup_pairs(fp, "id", max_hamming=3).collect()
    )
    # unblocked truth computed driver-side from the fingerprints
    rowsfp = {r["id"]: (r["simhash_hi"], r["simhash_lo"]) for r in fp.collect()}
    ids = sorted(rowsfp)
    truth = sorted(
        (a, b, bin(rowsfp[a][0] ^ rowsfp[b][0]).count("1")
         + bin(rowsfp[a][1] ^ rowsfp[b][1]).count("1"))
        for i, a in enumerate(ids) for b in ids[i + 1:]
        if bin(rowsfp[a][0] ^ rowsfp[b][0]).count("1")
        + bin(rowsfp[a][1] ^ rowsfp[b][1]).count("1") <= 3
    )
    assert got == truth
    assert (0, 3, 0) in got  # exact dup pair at hamming 0
    # both halves are within 32-bit range (portable bigint packing)
    for hi, lo in rowsfp.values():
        assert 0 <= hi < 2**32 and 0 <= lo < 2**32


def test_banded_lsh_recall_beats_single_bucket(spark):
    """Banded OR candidates must recover (here: all of) the true pairs that
    the old all-bits-agree single bucket missed (ADVICE r2 recall fix)."""
    import numpy as np

    rng = np.random.RandomState(11)
    base = rng.standard_normal((25, 16))
    # 25 true near-dup pairs: each vector and a tiny perturbation of it
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, v.tolist()))
        rows.append((2 * i + 1, (v + 0.02 * rng.standard_normal(16)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    truth = similarity.cosine_pairs(
        df.withColumn("one", F.lit(1)), "vec_id", "embedding", 0.95, "one"
    )
    true_pairs = {(r["id_a"], r["id_b"]) for r in truth.collect()}
    banded = similarity.cosine_pairs_banded(
        df, "vec_id", "embedding", 0.95, n_planes=48, bands=8
    )
    got = {(r["id_a"], r["id_b"]) for r in banded.collect()}
    assert got <= true_pairs  # exact verify: no false positives
    assert len(true_pairs) >= 20
    assert len(got) / len(true_pairs) >= 0.95  # ~0.997 expected recall


def test_weighted_jaccard_multiplicity_sensitive(spark):
    """Weighted Jaccard must separate texts the set-based score calls
    identical: repetition changes tf but not the shingle set."""
    rows = [
        (1, "the cat sat on the mat today okay"),
        (2, "the cat sat on the mat today okay "
            "the cat sat on the mat today okay "
            "the cat sat on the mat today okay"),
        (3, "the cat sat on the mat today okay"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    out = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.weighted_jaccard_pairs(
            df, "id", "text", shingle_n=2
        ).collect()
    }
    # identical texts: weighted jaccard exactly 1
    assert out[(1, 3)]["jaccard_w"] == 1.0
    # set-based jaccard of (1,2) is ~1 (near-same shingle set), weighted is
    # pulled down by the tripled multiplicities
    setj = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(df, "id", "text", shingle_n=2).collect()
    }
    assert setj[(1, 2)] > 0.85
    assert out[(1, 2)]["jaccard_w"] < 0.45
    # identity: sum(max) = size_a + size_b - sum(min)
    r = out[(1, 2)]
    assert 0 < r["common_w"] <= min(r["size_a"], r["size_b"])


def test_resize_images_plumbing(spark):
    """Distributed resize: image payloads re-encode at target dims with
    meta updated; non-image rows pass through byte-identical; the whole
    path is deterministic (fake codec kernel)."""
    from open_thoughts_spark.multimodal.media import (
        make_synthetic_media,
        resize_images,
    )

    media = make_synthetic_media(spark, n=12)
    out = resize_images(media, width=8, height=6).collect()
    src = {r["media_id"]: r for r in media.collect()}
    assert len(out) == 12
    for r in out:
        if r["kind"] == "image":
            assert len(r["payload"]) == 8 * 6 * 3
            assert r["meta"]["width"] == 8 and r["meta"]["height"] == 6
        else:
            assert bytes(r["payload"]) == bytes(src[r["media_id"]]["payload"])
    # deterministic across runs
    again = {r["media_id"]: bytes(r["payload"])
             for r in resize_images(media, width=8, height=6).collect()}
    assert all(bytes(r["payload"]) == again[r["media_id"]] for r in out)


def _py_scrub_frequent(rows, n=3, min_docs=2):
    """Pure-python oracle for scrub_frequent_ngrams (same tokenization:
    lowercase, split on whitespace runs; doc-frequency over distinct
    per-doc grams; union of covered 1-based positions; rebuild)."""
    import re

    toks = {i: re.split(r"[ \t\n\x0b\f\r]+", t.strip().lower()) for i, t in rows}
    grams = {
        i: [" ".join(w[p : p + n]) for p in range(len(w) - n + 1)]
        for i, w in toks.items()
    }
    df_count = {}
    for i, gs in grams.items():
        for g in set(gs):
            df_count[g] = df_count.get(g, 0) + 1
    frequent = {g for g, c in df_count.items() if c >= min_docs}
    out = {}
    for i, w in toks.items():
        cov = set()
        for p0, g in enumerate(grams[i]):
            if g in frequent:
                cov.update(range(p0 + 1, p0 + n + 1))
        kept = [wd for j, wd in enumerate(w, start=1) if j not in cov]
        out[i] = (" ".join(kept), len(w) - len(kept))
    return out, frequent


def test_scrub_frequent_ngrams_known(spark):
    rows = [
        (1, "a b c d e"),
        (2, "x a b c y"),
        (3, "p q r s t"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {
        r["id"]: r
        for r in dedup.scrub_frequent_ngrams(
            df, "id", "text", n=3, min_docs=2
        ).collect()
    }
    # "a b c" is in docs 1 and 2 -> scrubbed everywhere; doc 3 untouched
    assert out[1]["scrubbed_text"] == "d e" and out[1]["n_removed"] == 3
    assert out[2]["scrubbed_text"] == "x y" and out[2]["n_removed"] == 3
    assert out[3]["scrubbed_text"] == "p q r s t" and out[3]["n_removed"] == 0
    # original columns survive
    assert out[1]["text"] == "a b c d e"


def test_scrub_frequent_ngrams_overlapping_coverage(spark):
    # overlapping frequent grams union their covered positions (no
    # double-count, no gap): "a b c" and "b c d" both frequent
    rows = [(1, "z a b c d z"), (2, "a b c d"), (3, "q a b c d")]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {
        r["id"]: r
        for r in dedup.scrub_frequent_ngrams(
            df, "id", "text", n=3, min_docs=3
        ).collect()
    }
    py, _ = _py_scrub_frequent(rows, n=3, min_docs=3)
    for i, (txt, nrm) in py.items():
        assert out[i]["scrubbed_text"] == txt
        assert out[i]["n_removed"] == nrm
    assert out[1]["scrubbed_text"] == "z z"


def test_scrub_frequent_ngrams_matches_python_oracle(spark):
    import random

    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 18))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    for n, min_docs in ((2, 5), (3, 4), (1, 12)):
        out = {
            r["id"]: (r["scrubbed_text"], r["n_removed"])
            for r in dedup.scrub_frequent_ngrams(
                df, "id", "text", n=n, min_docs=min_docs
            ).collect()
        }
        py, frequent = _py_scrub_frequent(rows, n=n, min_docs=min_docs)
        assert out == py
        got_grams = {
            r["gram"]: r["doc_freq"]
            for r in dedup.frequent_ngrams(
                df, "id", "text", n=n, min_docs=min_docs
            ).collect()
        }
        assert set(got_grams) == frequent


# --- LSH degenerate-bucket skew guard ---

def test_cap_band_buckets_drops_only_oversize(spark):
    """The window-count guard keeps every bucket at or under the cap intact
    and removes over-cap buckets whole; the audit frame reports exactly the
    dropped buckets with their sizes."""
    bands = spark.createDataFrame(
        [(i, 0, "hot") for i in range(4)]
        + [(10, 0, "warm"), (11, 0, "warm"), (12, 1, "solo")],
        "doc_id int, band_idx int, band_key string",
    )
    kept = dedup.cap_band_buckets(bands, 2)
    got = sorted((r["band_idx"], r["band_key"], r["doc_id"]) for r in kept.collect())
    assert got == [(0, "warm", 10), (0, "warm", 11), (1, "solo", 12)]
    audit = dedup.oversize_band_buckets(bands, 2).collect()
    assert [(r["band_idx"], r["band_key"], r["bucket_n"]) for r in audit] == [
        (0, "hot", 4)
    ]
    # cap above the max bucket: nothing dropped, audit empty
    assert dedup.cap_band_buckets(bands, 4).count() == bands.count()
    assert dedup.oversize_band_buckets(bands, 4).count() == 0


def test_candidate_pairs_cap_keeps_other_band_collisions(spark):
    """A pair colliding in BOTH a dropped hot bucket and a surviving small
    bucket must still surface (the OR-over-bands semantics are preserved);
    pairs whose only collision is the hot bucket vanish."""
    rows = [
        (1, 0, "hot"), (2, 0, "hot"), (3, 0, "hot"), (4, 0, "hot"),
        (1, 1, "ab"), (2, 1, "ab"),
    ]
    bands = spark.createDataFrame(rows, "doc_id int, band_idx int, band_key string")
    uncapped = sorted(
        (r["id_a"], r["id_b"]) for r in dedup.candidate_pairs(bands, "doc_id").collect()
    )
    assert (1, 3) in uncapped and (3, 4) in uncapped
    capped = sorted(
        (r["id_a"], r["id_b"])
        for r in dedup.candidate_pairs(bands, "doc_id", max_bucket_size=3).collect()
    )
    assert capped == [(1, 2)]


def test_simhash64_bucket_cap_bounds(spark):
    """cap=1 kills every pair (a collision needs a bucket of >= 2); a cap
    above the largest bucket reproduces the uncapped result exactly."""
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, base.replace("river", w)) for i, w in
            enumerate(["river", "creek", "stream", "river"])]
    df = spark.createDataFrame(rows, "id int, text string")
    fp = dedup.simhash64(df, "id", "text").cache()
    uncapped = sorted(
        (r["id_a"], r["id_b"])
        for r in dedup.simhash64_neardup_pairs(fp, "id").collect()
    )
    assert uncapped  # fixture really produces near-dup pairs
    assert dedup.simhash64_neardup_pairs(fp, "id", max_bucket_size=1).count() == 0
    big = sorted(
        (r["id_a"], r["id_b"])
        for r in dedup.simhash64_neardup_pairs(
            fp, "id", max_bucket_size=1000
        ).collect()
    )
    assert big == uncapped
    fp32 = dedup.simhash32(df, "id", "text").cache()
    assert dedup.simhash_neardup_pairs(fp32, "id", max_bucket_size=1).count() == 0


def test_cosine_banded_bucket_cap(spark):
    """Identical vectors pair up uncapped; cap=1 suppresses the pair."""
    v = [1.0, 0.0, 2.0, -1.0]
    df = spark.createDataFrame(
        [(1, v), (2, v)], "vec_id long, embedding array<double>"
    )
    assert (
        similarity.cosine_pairs_banded(df, "vec_id", "embedding", 0.9).count() == 1
    )
    assert (
        similarity.cosine_pairs_banded(
            df, "vec_id", "embedding", 0.9, max_bucket_size=1
        ).count()
        == 0
    )


def test_frequent_ngrams_fractional_threshold(spark):
    """min_doc_frac resolves to ceil(frac * n_docs), floored at 2, and must
    match the absolute form exactly."""
    rows = [
        (i, "the common header line plus unique tail %d" % i) for i in range(10)
    ] + [(100 + i, "entirely different words here %d" % i) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, text string")
    # 20 docs: frac 0.3 -> ceil(6) = 6; absolute 6 must agree
    frac = {
        (r["gram"], r["doc_freq"])
        for r in dedup.frequent_ngrams(
            df, "id", "text", n=3, min_doc_frac=0.3
        ).collect()
    }
    absolute = {
        (r["gram"], r["doc_freq"])
        for r in dedup.frequent_ngrams(df, "id", "text", n=3, min_docs=6).collect()
    }
    assert frac == absolute and frac  # non-empty: the shared header qualifies
    # tiny fraction floors at 2 (df=1 grams never count as "frequent")
    tiny = dedup.frequent_ngrams(df, "id", "text", n=3, min_doc_frac=1e-9)
    assert tiny.agg(F.min("doc_freq")).collect()[0][0] >= 2
