"""Pluggable real-model dispatch (VERDICT r4 next #8): a model_path=
argument routes scoring/embedding through a loader from
models.REAL_LOADERS without touching call sites; the hermetic kernels
(and their oracles) stay the default. Loaders are faked here — the real
packages aren't in this environment, which is exactly the situation the
registry indirection exists for. Fakes are defined INSIDE each test so
cloudpickle ships them by value (a module-level fake pickles as a
reference to the test module, which Spark workers can't import)."""

from __future__ import annotations

import pandas as pd

from open_thoughts_spark import models


def test_classifier_filter_real_model_dispatch(spark, monkeypatch):
    from open_thoughts_spark.functions import classifier

    def fake_scorer_loader(model_path, target_label):
        assert model_path == "/models/fake.bin"
        assert target_label == "good"

        def score(texts):
            import pandas as pd

            return pd.Series(
                [len(t or "") / 100.0 for t in texts],
                index=texts.index,
                dtype="float64",
            )

        return score

    monkeypatch.setitem(models.REAL_LOADERS, "fasttext", fake_scorer_loader)
    df = spark.createDataFrame(
        [(1, "a" * 80), (2, "bb")], "id long, text string"
    )
    out = classifier.classifier_filter(
        spark,
        df,
        model=None,  # hermetic model not needed on the real path
        text_col="text",
        target_label="good",
        filter_threshold=0.5,
        model_path="/models/fake.bin",
    )
    assert [r["id"] for r in out.collect()] == [1]

    scored = classifier.classifier_filter(
        spark, df, None, "text", "good",
        just_add_scores=True, model_path="/models/fake.bin",
    )
    got = {r["id"]: r["_clf_score"] for r in scored.collect()}
    assert got == {1: 0.8, 2: 0.02}


def test_embed_texts_real_model_dispatch(spark, monkeypatch):
    from open_thoughts_spark.operators import embedding

    def fake_encoder_loader(model_path, max_chars, normalize):
        assert model_path == "/models/st"

        def encode(texts):
            import pandas as pd

            return pd.Series(
                [[1.0, float(len(t or ""))] for t in texts], index=texts.index
            )

        return encode

    monkeypatch.setitem(
        models.REAL_LOADERS, "sentence_transformer", fake_encoder_loader
    )
    df = spark.createDataFrame([(1, "abc"), (2, "hello")], "id long, text string")
    out = embedding.embed_texts(df, "text", model_path="/models/st")
    got = {r["id"]: r["embedding"] for r in out.collect()}
    assert got == {1: [1.0, 3.0], 2: [1.0, 5.0]}


def test_embed_texts_hermetic_path_unchanged(spark):
    """No model_path -> the md5 kernel runs exactly as before (oracle
    compatibility)."""
    from open_thoughts_spark.operators import embedding

    df = spark.createDataFrame([(1, "alpha beta")], "id long, text string")
    vec = embedding.embed_texts(df, "text", dim=8).collect()[0]["embedding"]
    expected = embedding.embed_kernel("alpha beta", 8, 512, True).tolist()
    assert vec == expected


def test_cached_model_loads_once():
    calls = []

    def loader(path):
        calls.append(path)
        return object()

    models._MODEL_CACHE.clear()
    a = models.cached_model(loader, "/m1")
    b = models.cached_model(loader, "/m1")
    c = models.cached_model(loader, "/m2")
    assert a is b and a is not c
    assert calls == ["/m1", "/m2"]


def test_unknown_backend_raises(spark):
    from open_thoughts_spark.functions import classifier

    df = spark.createDataFrame([(1, "x")], "id long, text string")
    try:
        classifier.classifier_filter(
            spark, df, None, "text", "good", model_path="/m", backend="nope"
        )
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_fake_series_index_preserved():
    """The loader contract: output Series must carry the input index (Arrow
    batches slice arbitrary index ranges)."""
    s = pd.Series(["a", "bb"], index=[7, 9])
    out = pd.Series([len(t) / 100.0 for t in s], index=s.index)
    assert list(out.index) == [7, 9]


def test_train_fasttext_real_writes_corpus_and_saves(spark, monkeypatch, tmp_path):
    """Real-training plug: labeled rows become a __label__X corpus file,
    train_supervised runs on it, the model saves to model_path (fasttext
    faked — absent here, which is what the plug exists for)."""
    import sys
    import types

    seen = {}

    class FakeModel:
        def save_model(self, path):
            seen["saved"] = path

    def fake_train(input, **kw):
        seen["corpus"] = open(input, encoding="utf-8").read()
        seen["kwargs"] = kw
        return FakeModel()

    fake_ft = types.ModuleType("fasttext")
    fake_ft.train_supervised = fake_train
    monkeypatch.setitem(sys.modules, "fasttext", fake_ft)

    from open_thoughts_spark.functions.classifier import train_fasttext_real

    df = spark.createDataFrame(
        [("good doc\nwith newline", "pos"), ("bad doc", "neg")],
        "text string, label string",
    )
    out = train_fasttext_real(
        df, "text", "label", str(tmp_path / "m.bin"), epoch=5
    )
    assert out == str(tmp_path / "m.bin") == seen["saved"]
    lines = sorted(seen["corpus"].strip().split("\n"))
    assert lines == ["__label__neg bad doc", "__label__pos good doc with newline"]
    assert seen["kwargs"] == {"epoch": 5}
