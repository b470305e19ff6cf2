"""Pluggable real-model backends for the hermetic model stand-ins.

The sandbox has no fastText / SentenceTransformer, so scoring and
embedding run on deterministic md5-kernel stand-ins (classifier.py,
embedding.py) that the DuckDB oracle replays exactly. In production the
same call sites take a ``model_path=``: the operator resolves a loader
from :data:`REAL_LOADERS` at plan-construction time (driver side — the
resolved callable travels to executors inside the UDF closure) and each
executor materializes the model once via :func:`cached_model`.

Loaders import their package lazily, so the registry is importable in
environments without the model libraries; a missing package surfaces as
ImportError only when a real model path is actually used. Model files
must be visible to every executor (shared filesystem / distributed cache
— the same contract the reference's fastText operator has,
fasttext_operator.py:100-158).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd

#: (loader-qualname, args) -> materialized model callable, one per worker
#: process — a pandas UDF task re-resolving the same path must not reload
#: a multi-hundred-MB model per task.
_MODEL_CACHE: dict[tuple, object] = {}


def cached_model(loader: Callable, *args) -> object:
    key = (getattr(loader, "__qualname__", repr(loader)), *args)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = loader(*args)
    return _MODEL_CACHE[key]


def load_fasttext_scorer(model_path: str, target_label: str):
    """Real fastText ``.bin`` scorer: batch predict, probability of the
    target label (the reference's batched-predict harness). Returns
    ``pd.Series -> pd.Series`` of P(target_label)."""
    import fasttext

    mdl = fasttext.load_model(model_path)
    label = (
        target_label
        if target_label.startswith("__label__")
        else f"__label__{target_label}"
    )

    def score(texts: pd.Series) -> pd.Series:
        clean = [
            str(t).replace("\n", " ") if t is not None else "" for t in texts
        ]
        labels, probs = mdl.predict(clean, k=-1)
        out = [
            dict(zip(ls, ps)).get(label, 0.0) for ls, ps in zip(labels, probs)
        ]
        return pd.Series(out, index=texts.index, dtype="float64")

    return score


def load_sentence_transformer_encoder(
    model_path: str, max_chars: int = 512, normalize: bool = True
):
    """Real SentenceTransformer encoder with the reference's chunk →
    length-weighted pool → L2-normalize semantics
    (embedding_operator.py:60-93). Returns ``pd.Series -> pd.Series`` of
    ``list[float]`` vectors."""
    from sentence_transformers import SentenceTransformer

    mdl = SentenceTransformer(model_path)
    dim = mdl.get_sentence_embedding_dimension()

    def encode(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            t = t or ""
            if not t:
                out.append([0.0] * dim)
                continue
            frags = [t[i : i + max_chars] for i in range(0, len(t), max_chars)]
            mat = np.asarray(mdl.encode(frags), dtype=np.float64)
            w = np.array([len(f) for f in frags], dtype=np.float64)
            pooled = (mat * w[:, None]).sum(axis=0) / w.sum()
            if normalize:
                n = np.linalg.norm(pooled)
                if n > 0:
                    pooled = pooled / n
            out.append(pooled.tolist())
        return pd.Series(out, index=texts.index)

    return encode


#: backend name -> loader. Monkeypatch-friendly: operators resolve from
#: this dict at construction time, so tests (and deployments with custom
#: model formats) swap entries without touching call sites.
REAL_LOADERS: dict[str, Callable] = {
    "fasttext": load_fasttext_scorer,
    "sentence_transformer": load_sentence_transformer_encoder,
}
