"""LLM completions operator — the inference harness, with a hermetic mock.

Reference: the ``completions`` operator runs prompt/parse "map" classes over
rows through bespokelabs-curator with a shared rate-limit actor and optional
shard merging (/root/reference/open_thoughts_3/engine/operators/
completions_operator.py:25-300); ~60 prompt/parse maps live in engine/maps/
(map_registry.py:1-112). Tests swap the LLM for deterministic mocks
(MOCK_VERIFY, open_thoughts/math/judge.py:46-49; mocked_reasoner,
open_thoughts/reason.py:1-9).

Spark-first shape: a CompletionMap (prompt builder + response parser) runs
inside ``mapInPandas``; the completion backend is a pluggable batch callable.
The default backend is the deterministic mock (this environment has no LLM);
a real backend would issue async HTTP inside the same batch callable —
per-executor concurrency IS the rate-limit unit, so cluster-wide QPS =
executors × per-batch concurrency, tuned via repartition count.

``n_repeat`` row duplication (completions_operator.py:61-65) maps to
``relational.repeat_dataset``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame


@dataclass
class CompletionMap:
    """prompt/parse pair (the engine/maps contract)."""

    name: str
    build_prompt: Callable[[pd.Series], pd.Series]  # row fields -> prompt text
    parse_response: Callable[[pd.Series], pd.Series]  # raw completion -> parsed


def mock_backend(prompts: pd.Series) -> pd.Series:
    """Deterministic stand-in: completion = tagged digest of the prompt.
    Stable across runs/partitions — the MOCK_VERIFY posture."""
    return prompts.fillna("").map(
        lambda p: f"[mock:{hashlib.sha256(p.encode()).hexdigest()[:12]}]"
    )


def completions(
    df: DataFrame,
    cmap: CompletionMap,
    prompt_col: str = "text",
    out_col: str = "completion",
    backend: Callable[[pd.Series], pd.Series] = mock_backend,
    batch_size: int = 256,
    n_repeat: int = 1,
    merge_shards: int | None = None,
) -> DataFrame:
    """Annotate each row with a parsed completion.

    The whole row batch flows through build_prompt → backend → parse; keep
    ``batch_size`` aligned with the backend's concurrency budget.
    ``n_repeat`` duplicates rows before prompting (narrow explode —
    completions_operator.py:53,61-65); ``merge_shards`` coalesces the
    output to that many partitions (:64 merge_shards, int-generalized).
    """
    if n_repeat < 1:
        raise ValueError(f"n_repeat must be >= 1, got {n_repeat}")
    if n_repeat > 1:
        from open_thoughts_spark.operators.relational import repeat_dataset

        df = repeat_dataset(df, n_repeat)
    in_cols = df.columns
    schema = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in in_cols)
    schema += f", `{out_col}` string"

    def _runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[i : i + batch_size].copy()
                prompts = cmap.build_prompt(chunk[prompt_col])
                chunk[out_col] = cmap.parse_response(backend(prompts))
                yield chunk

    out = df.mapInPandas(_runner, schema=schema)
    if merge_shards:
        out = out.coalesce(merge_shards)
    return out


IDENTITY_MAP = CompletionMap(
    name="identity",
    build_prompt=lambda s: s,
    parse_response=lambda s: s,
)


class RateLimitedBackend:
    """Token-bucket pacing around any batch backend — the Spark analog of
    the reference's shared curator rate-limit actor
    (completions_operator.py).

    Scope honesty: Spark has no cluster-wide singleton, so the bucket is
    PER PYTHON WORKER PROCESS — state lives in a module-global keyed by
    this limiter's identity, so every task deserialized into the same
    worker shares one bucket (a fresh per-task copy would grant a free
    burst per task). Cluster-wide QPS ≈ concurrent workers × ``qps``;
    size ``qps = total_qps / (executors × cores_per_executor)``.
    True cross-process coordination needs an external limiter service,
    which is exactly what the reference's Ray actor is.

    The clock is read lazily ON the worker (never pickled from the
    driver — monotonic clocks are not comparable across hosts). The
    bucket refills at ``qps`` prompts/sec up to ``burst``; a batch larger
    than the available tokens sleeps for exactly the deficit. Clock/sleep
    hooks are injectable so tests run instantly and deterministically.
    """

    def __init__(
        self,
        backend: Callable[[pd.Series], pd.Series],
        qps: float,
        burst: float | None = None,
        clock: Callable[[], float] | None = None,
        sleep: Callable[[float], None] | None = None,
        key: str | None = None,
    ):
        import uuid

        if qps <= 0:
            raise ValueError("qps must be positive")
        self.backend = backend
        self.qps = float(qps)
        self.burst = float(burst if burst is not None else qps)
        self._clock = clock
        self._sleep = sleep
        self.key = key or uuid.uuid4().hex

    def __call__(self, prompts: pd.Series) -> pd.Series:
        import time as _time

        clock = self._clock or _time.monotonic
        sleep = self._sleep or _time.sleep
        state = _WORKER_BUCKETS.get(self.key)
        if state is None:
            # first touch in THIS worker process: full burst, local clock
            state = _WORKER_BUCKETS[self.key] = [self.burst, clock()]
        now = clock()
        tokens = min(self.burst, state[0] + (now - state[1]) * self.qps)
        need = float(len(prompts))
        if need > tokens:
            sleep((need - tokens) / self.qps)
            state[0] = 0.0
            state[1] = clock()
        else:
            state[0] = tokens - need
            state[1] = now
        return self.backend(prompts)


# per-worker-process bucket state: {limiter key: [tokens, last_clock]}
_WORKER_BUCKETS: dict[str, list] = {}


def openai_compatible_backend(
    base_url: str,
    model: str,
    api_key_env: str = "OPENAI_API_KEY",
    max_tokens: int = 1024,
    temperature: float = 0.0,
    timeout_s: float = 120.0,
    max_retries: int = 3,
    concurrency: int = 8,
    transport: Callable[[str, bytes, dict], str] | None = None,
) -> Callable[[pd.Series], pd.Series]:
    """Production batch backend over any OpenAI-compatible
    ``/chat/completions`` HTTP endpoint (vLLM, llama.cpp server, hosted
    APIs) — the real-LLM counterpart of ``mock_backend``, stdlib-only
    (urllib + threads) so it adds no dependencies. Wrap with
    ``RateLimitedBackend`` for pacing; cluster-wide concurrency =
    executors × ``concurrency`` (module docstring).

    Each prompt posts as a single user message; the completion is
    ``choices[0].message.content``. Transient failures retry with
    exponential backoff; exhaustion raises, failing the Spark task (task
    retry is the right semantic — a silently empty completion would
    poison downstream parses). ``transport(url, body, headers) -> str``
    injects the HTTP call for tests and custom auth/proxies; the API key
    is read from ``api_key_env`` on the WORKER at call time (ship secrets
    via executor env, not closures).
    """
    import json as _json

    def _default_transport(url: str, body: bytes, headers: dict) -> str:
        import urllib.request

        req = urllib.request.Request(url, data=body, headers=headers)
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.read().decode("utf-8")

    send = transport or _default_transport
    url = base_url.rstrip("/") + "/chat/completions"

    def _one(prompt: str) -> str:
        import os as _os
        import time as _time

        headers = {"Content-Type": "application/json"}
        key = _os.environ.get(api_key_env)
        if key:
            headers["Authorization"] = f"Bearer {key}"
        body = _json.dumps(
            {
                "model": model,
                "messages": [{"role": "user", "content": prompt}],
                "max_tokens": max_tokens,
                "temperature": temperature,
            }
        ).encode("utf-8")
        last_err: Exception | None = None
        for attempt in range(max_retries):
            try:
                raw = send(url, body, headers)
                return _json.loads(raw)["choices"][0]["message"]["content"]
            except Exception as e:  # noqa: BLE001 - retry any transport error
                last_err = e
                if attempt + 1 < max_retries:
                    _time.sleep(0.5 * (2**attempt))
        raise RuntimeError(
            f"completions backend failed after {max_retries} attempts: {last_err}"
        )

    def backend(prompts: pd.Series) -> pd.Series:
        from concurrent.futures import ThreadPoolExecutor

        vals = ["" if p is None else str(p) for p in prompts]
        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            out = list(pool.map(_one, vals))
        return pd.Series(out, index=prompts.index)

    return backend
