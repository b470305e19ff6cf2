"""Beam / tree search scaffold — the tree_search operator, Spark-native.

Reference: per-prompt tree search driving LLM expansion through Ray tasks,
with ``get_initial_state`` / ``get_successors`` / ``is_terminal`` hooks and
``node_budget`` / ``beam_width`` / ``beam_depth`` limits
(/root/reference/open_thoughts_3/engine/operators/tree_search_operator.py:
22-120). The reference explores one prompt's tree per task; the Spark
re-expression keeps ONE frontier DataFrame holding every prompt's beam and
advances all searches in lockstep rounds:

    frontier(round r) --expand (mapInPandas, batched hook)--> successors
      --prune (two-phase top-k per prompt by score)--> frontier(round r+1)

so each round is one narrow map + one bounded shuffle regardless of how
many prompts are searched — the 100 TB shape for search-based data
generation. Terminals accumulate per round; ``node_budget`` bounds total
expansions per prompt. The expansion hook is pluggable (an LLM backend in
production, a deterministic mock here — same posture as the completions
operator).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_thoughts_spark.operators.similarity import topk_per_group

# expand hook contract: given a chunk with (prompt_id, prompt, path, level),
# return successor rows (prompt_id, prompt, path, level, reasoning_step,
# score, is_terminal) — path already extended with reasoning_step.
ExpandFn = Callable[[pd.DataFrame], pd.DataFrame]

_FRONTIER_SCHEMA = (
    "`prompt_id` long, `prompt` string, `path` string, `level` int, "
    "`score` double, `is_terminal` boolean"
)


@dataclass
class BeamSearchConfig:
    beam_width: int = 4
    beam_depth: int = 5
    node_budget: int | None = None  # max expanded nodes per prompt


def mock_expand(branch_factor: int = 3) -> ExpandFn:
    """Deterministic expansion hook (no LLM in this environment): each node
    fans out to ``branch_factor`` md5-derived reasoning steps; a step is
    terminal when its digest ends in a small hex digit; score is derived
    from the digest so pruning has a real signal. Deterministic across
    partitionings — the MOCK_VERIFY posture."""

    def expand(chunk: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in chunk.iterrows():
            for b in range(branch_factor):
                h = hashlib.md5(f"{r['prompt']}|{r['path']}|{b}".encode()).hexdigest()
                step = f"step-{h[:6]}"
                rows.append(
                    {
                        "prompt_id": r["prompt_id"],
                        "prompt": r["prompt"],
                        "path": (r["path"] + " -> " + step) if r["path"] else step,
                        "level": r["level"] + 1,
                        "score": int(h[:8], 16) / 0xFFFFFFFF,
                        "is_terminal": h[-1] in "012",
                    }
                )
        cols = ["prompt_id", "prompt", "path", "level", "score", "is_terminal"]
        return pd.DataFrame(rows, columns=cols)

    return expand


def llm_expand(
    backend: Callable[[pd.Series], pd.Series],
    branch_factor: int = 3,
    prompt_template: str = (
        "Problem: {prompt}\nSteps so far: {path}\n"
        "Propose next reasoning step #{k}. Reply exactly as:\n"
        "STEP: <one step>\nSCORE: <confidence 0..1>\nTERMINAL: <yes|no>"
    ),
) -> ExpandFn:
    """Production expansion hook over any completions batch backend — the
    tree-search counterpart of the classifier/embedding ``model_path``
    plugs: pass ``completions.openai_compatible_backend(...)`` (optionally
    rate-limited) and the beam runs against a real LLM; the mock stays the
    hermetic default.

    One prompt per (node, branch); the whole mapInPandas chunk's prompts
    go to the backend as ONE batch, so the chunk is the concurrency/rate
    unit (module docstring economics). Responses parse tolerantly —
    STEP/SCORE/TERMINAL lines; fallback: first 80 chars as the step,
    score 0.5, non-terminal — a malformed completion degrades to a
    low-information branch instead of failing the search.
    """
    import re

    step_re = re.compile(r"STEP:\s*(.+)")
    score_re = re.compile(r"SCORE:\s*([0-9.eE+-]+)")
    term_re = re.compile(r"TERMINAL:\s*(yes|no)", re.I)

    def expand(chunk: pd.DataFrame) -> pd.DataFrame:
        metas, prompts = [], []
        for _, r in chunk.iterrows():
            for k in range(branch_factor):
                metas.append(r)
                prompts.append(
                    prompt_template.format(
                        prompt=r["prompt"], path=r["path"] or "(none)", k=k + 1
                    )
                )
        outs = backend(pd.Series(prompts)) if prompts else []
        rows = []
        for r, resp in zip(metas, outs):
            resp = resp or ""
            m = step_re.search(resp)
            step = (m.group(1).strip() if m else resp.strip()[:80]) or "(empty)"
            score = 0.5
            m = score_re.search(resp)
            if m:
                try:
                    score = min(max(float(m.group(1)), 0.0), 1.0)
                except ValueError:
                    pass
            m = term_re.search(resp)
            terminal = bool(m and m.group(1).lower() == "yes")
            rows.append(
                {
                    "prompt_id": r["prompt_id"],
                    "prompt": r["prompt"],
                    "path": (r["path"] + " -> " + step) if r["path"] else step,
                    "level": r["level"] + 1,
                    "score": score,
                    "is_terminal": terminal,
                }
            )
        cols = ["prompt_id", "prompt", "path", "level", "score", "is_terminal"]
        return pd.DataFrame(rows, columns=cols)

    return expand


def beam_search(
    prompts: DataFrame,
    expand: ExpandFn,
    config: BeamSearchConfig = BeamSearchConfig(),
    prompt_col: str = "instruction",
    id_col: str = "prompt_id",
) -> DataFrame:
    """Run the search for every prompt row; returns the accumulated terminal
    nodes (prompt_id, prompt, path, level, score) plus, for prompts that
    never terminated, their final-frontier best nodes.

    Driver loop depth = beam_depth (a handful of rounds); everything inside
    a round is distributed. Frontiers are localCheckpoint'd so lineage
    doesn't grow with depth.
    """
    spark = prompts.sparkSession
    frontier = prompts.select(
        F.col(id_col).cast("long").alias("prompt_id"),
        F.col(prompt_col).alias("prompt"),
        F.lit("").alias("path"),
        F.lit(0).cast("int").alias("level"),
        F.lit(0.0).alias("score"),
        F.lit(False).alias("is_terminal"),
        # cumulative successors produced per prompt — carried ON the frontier
        # (uniform across a prompt's beam rows) so budget retirement is a
        # plain filter: no per-round collect / driver dict growing with the
        # number of prompts (VERDICT r2 scale fix)
        F.lit(0).cast("long").alias("expanded"),
    ).localCheckpoint(eager=True)
    terminals: DataFrame | None = None
    retired: DataFrame | None = None  # budget-exhausted prompts' frontiers

    def _expand_runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield expand(pdf)

    for _ in range(config.beam_depth):
        live = frontier.filter(~F.col("is_terminal"))
        if config.node_budget is not None:
            # keep the exhausted prompts' best nodes for the output —
            # dropping them from `live` must not lose them entirely
            newly_retired = live.filter(F.col("expanded") >= config.node_budget)
            retired = (
                newly_retired if retired is None
                else retired.unionByName(newly_retired)
            )
            live = live.filter(F.col("expanded") < config.node_budget)
        # materialize the expansion ONCE: both the budget accounting (true
        # successor counts, pre-prune — the expensive calls the budget
        # bounds) and the prune read from this checkpoint
        successors = live.select(
            "prompt_id", "prompt", "path", "level"
        ).mapInPandas(_expand_runner, schema=_FRONTIER_SCHEMA).localCheckpoint(
            eager=True
        )
        pruned = topk_per_group(
            successors, ["prompt_id"], [F.desc("score"), F.asc("path")],
            config.beam_width,
        ).drop("rank")
        if config.node_budget is not None:
            # new cumulative count = previous + successors produced this
            # round; a small per-prompt agg + broadcastable join, fully
            # distributed (replaces groupBy().collect() into a driver dict)
            prev = live.select("prompt_id", "expanded").distinct()
            counts = successors.groupBy("prompt_id").agg(
                F.count(F.lit(1)).alias("_n")
            )
            totals = prev.join(counts, on="prompt_id", how="left").select(
                "prompt_id",
                (F.col("expanded") + F.coalesce(F.col("_n"), F.lit(0))).alias(
                    "expanded"
                ),
            )
            pruned = pruned.join(totals, on="prompt_id", how="left").withColumn(
                "expanded", F.coalesce(F.col("expanded"), F.lit(0).cast("long"))
            )
        else:
            pruned = pruned.withColumn("expanded", F.lit(0).cast("long"))
        pruned = pruned.localCheckpoint(eager=True)
        if pruned.isEmpty():
            break
        new_terminals = pruned.filter(F.col("is_terminal"))
        terminals = (
            new_terminals if terminals is None
            else terminals.unionByName(new_terminals)
        )
        frontier = pruned
    out = frontier.filter(~F.col("is_terminal"))
    if retired is not None:
        # if the loop ended right after a retirement, the stale frontier
        # still carries the retired prompt's rows — retired is canonical
        out = out.join(
            retired.select("prompt_id").distinct(), on="prompt_id", how="left_anti"
        ).unionByName(retired)
    if terminals is not None:
        out = out.unionByName(terminals)
    return out.select("prompt_id", "prompt", "path", "level", "score", "is_terminal")
