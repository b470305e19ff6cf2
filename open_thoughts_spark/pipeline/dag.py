"""Declarative pipeline config → operator DAG — the reference's defining UX.

Reference: YAML configs name operators with ``id`` + typed ``config``;
``input_ids`` default to the previous operator, ``output_ids`` default to
the last (engine/operators/operator.py:243-254, engine/dag.py:55-109,
validation behaviors pinned by engine/tests/test_parse.py:10-138). Here the
same contract parses to a stage DAG over Spark DataFrames; operator types
resolve through ``OPERATOR_REGISTRY`` (each entry builds
``(spark, config, inputs: list[DataFrame]) -> DataFrame``).

``run_dag`` executes topologically. Spark keeps everything lazy, so the
"DAG" costs nothing until an output is acted on; for durable stage caching
compose with pipeline/checkpoint.CheckpointedPipeline.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class OpSpec:
    id: str
    config: dict
    input_ids: list[str] = field(default_factory=list)


@dataclass
class PipelineDAG:
    name: str
    operators: list[OpSpec]
    output_ids: list[str]


class DAGParseError(ValueError):
    pass


# --- typed per-operator config validation (VERDICT r3 #4) ---
#
# The reference dispatches YAML `type:` through pydantic config classes that
# reject unknown/missing fields at parse time
# (engine/operators/operator.py:156-240 CONFIG_TYPE_MAP + parse_specific_
# config). Same contract here with a dependency-free dict-spec: every
# registry type declares required/optional keys with python types; a typo'd
# key or missing field fails in parse_dag, not minutes later inside the
# operator.

@dataclass(frozen=True)
class ConfigSpec:
    required: dict[str, type | tuple]
    optional: dict[str, type | tuple] = field(default_factory=dict)


_NUM = (int, float)

CONFIG_SPECS: dict[str, ConfigSpec] = {
    "parquet_source": ConfigSpec({"path": str}),
    "function": ConfigSpec(
        {"function": str}, {"kwargs": dict, "multi_input": bool}
    ),
    "filter": ConfigSpec({"condition": str}),
    "select": ConfigSpec({"columns": list}),
    # keys mirror pipeline.quality_filter's keyword surface
    "quality_filter": ConfigSpec(
        {},
        {
            "langid_mode": str,
            "with_turn_order": bool,
            "with_conv_stats": bool,
            "compute_ppl": bool,
            "role_col": (str, type(None)),
        },
    ),
    "mix": ConfigSpec({"key_cols": list}, {"shard_ids": list}),
    # downsample each domain to an expected token budget (mixture specs
    # are token budgets); token_count_col must already exist on the input
    "token_budget_sample": ConfigSpec(
        {
            "domain_col": str,
            "token_count_col": str,
            # int = one budget for every domain; dict = per-domain budgets
            "token_budget": (int, dict),
            "key_cols": list,
        },
        {"salt": str, "default_budget": int},
    ),
    "merge": ConfigSpec({"on": (str, list)}),
    "dedup_exact": ConfigSpec({"id_col": str, "text_col": str}),
    "minhash_dedup": ConfigSpec(
        {"id_col": str, "text_col": str},
        {
            "min_jaccard": _NUM,
            "transitive": bool,
            "num_perm": int,
            "shingle_n": int,
            "bands": int,
            "rows_per_band": int,
            "min_parallelism": int,
            # degenerate-bucket skew guard: drop LSH band buckets holding
            # more than this many ids before the candidate self-join
            "max_bucket_size": int,
        },
    ),
    # two inputs: (documents, eval set). mode 'ngram' = exact n-gram
    # broadcast anti-join; 'fuzzy' = MinHash-LSH near-dup channel
    "decontaminate": ConfigSpec(
        {"text_col": str},
        {
            "mode": str,
            "eval_text_col": str,
            "ngram_n": int,
            "id_col": str,
            "eval_id_col": str,
            "min_jaccard": _NUM,
        },
    ),
    "code_judge": ConfigSpec(
        {},
        {
            "response_col": str,
            "tests_col": str,
            "timeout_s": _NUM,
            "keep_correct_only": bool,
            "min_parallelism": int,
        },
    ),
    "truncate": ConfigSpec({"n": int}),
    "completions_map": ConfigSpec(
        {"map": str}, {"n_repeat": int, "merge_shards": int}
    ),
    "scrub": ConfigSpec({}, {"text_col": str}),
    # 'value' is required-but-any-typed (None is a legal constant; absence
    # was a run-time KeyError — code-review r4)
    "add_constant": ConfigSpec({"column": str, "value": object}),
    "load_preexisting": ConfigSpec({"framework_name": str}),
    # the reference's train_fasttext -> fasttext YAML pair
    # (train_fasttext_operator.py / fasttext_operator.py): the model
    # crosses operators as a PATH; train emits a one-row metadata dataset
    "train_classifier": ConfigSpec(
        {"text_col": str, "label_col": str, "model_out": str},
        {"dim": int, "max_rows": int, "seed": int},
    ),
    # model_path may come from config OR from a second input — the
    # train_classifier metadata dataset — which also gives the DAG the
    # train-before-score topological edge the reference relies on
    "classifier_filter": ConfigSpec(
        {"text_col": str, "target_label": str},
        {
            "model_path": str,
            "backend": str,  # 'hermetic' (npz) or a models.REAL_LOADERS key
            "filter_threshold": _NUM,
            "top_percentage": _NUM,
            "just_add_scores": bool,
            "score_col": str,
            "min_parallelism": int,
        },
    ),
    "embed_texts": ConfigSpec(
        {"text_col": str},
        {
            "out_col": str,
            "dim": int,
            "max_chars": int,
            "normalize": bool,
            "model_path": str,
            "backend": str,
        },
    ),
}

# keys the parser/runtime inject or consume itself
_META_KEYS = {"type", "_base"}


def validate_config(oid: str, cfg: dict) -> None:
    """Reject unknown and missing config keys for ``cfg['type']`` — the
    parse-time half of the reference's pydantic validation. Type errors
    name the operator, the key, and what was expected."""
    spec = CONFIG_SPECS.get(cfg["type"])
    if spec is None:
        # registry entries without a spec (user-registered operators) keep
        # the old pass-through behavior
        return
    keys = set(cfg) - _META_KEYS
    unknown = sorted(keys - set(spec.required) - set(spec.optional))
    if unknown:
        raise DAGParseError(
            f"operator {oid}: unknown config key(s) for type "
            f"'{cfg['type']}': {', '.join(unknown)}"
        )
    missing = sorted(set(spec.required) - keys)
    if missing:
        raise DAGParseError(
            f"operator {oid}: missing required config key(s) for type "
            f"'{cfg['type']}': {', '.join(missing)}"
        )
    for key, expected in {**spec.required, **spec.optional}.items():
        if key not in cfg or expected is object:
            continue
        val = cfg[key]
        if isinstance(expected, type):
            expected = (expected,)
        # bool is an int subclass — don't let true/false satisfy an int slot
        if isinstance(val, bool) and bool not in expected:
            pass
        elif isinstance(val, expected):
            continue
        names = "/".join(
            t.__name__ if t is not type(None) else "null" for t in expected
        )
        raise DAGParseError(
            f"operator {oid}: config key '{key}' for type '{cfg['type']}' "
            f"expects {names}, got {type(val).__name__}"
        )


def parse_dag(
    config: dict,
    frameworks: dict[str, dict] | None = None,
) -> PipelineDAG:
    """Validate + normalize a dict (or YAML-loaded) pipeline config.

    Reference-parity defaults: first operator gets no inputs; every later
    operator without explicit ``input_ids`` chains from the previous one;
    ``output_ids`` defaults to the final operator. Errors: missing/dup ids,
    unknown input references, unknown operator type, cycles.

    ``load_preexisting`` sub-DAG inlining (synthetic_data_manager.py:
    1228-1307): an operator with ``config.type: load_preexisting`` and
    ``config.framework_name: <name>`` splices the named child pipeline from
    the ``frameworks`` registry into this DAG. Child operator ids are
    namespaced ``<child-name>::<op-id>`` (the reference's ``::`` scheme);
    every reference to the load_preexisting op's id is rewritten — and
    FLATTENED, since a child can have several output_ids — to the child's
    namespaced outputs. Inlining the same framework twice adds its
    operators ONCE (the reference's deduped_sub_dags), with both
    references remapped to the shared outputs. Children may themselves
    load_preexisting (recursion), with framework cycles rejected.
    """
    if "name" not in config or "operators" not in config:
        raise DAGParseError("config requires 'name' and 'operators'")
    sink: list[OpSpec] = []
    output_ids = _parse_into(
        config, frameworks, None, {}, (), sink
    )
    ids = [o.id for o in sink]
    dupes = sorted({i for i in ids if ids.count(i) > 1})
    if dupes:
        # catches a parent op literally named 'child::x' colliding with an
        # inlined child op — the per-level checks see only a snapshot
        raise DAGParseError(f"duplicate operator id: {dupes[0]}")
    known = {o.id for o in sink}
    for op in sink:
        for ref in op.input_ids:
            if ref not in known:
                raise DAGParseError(
                    f"operator {op.id}: unknown input id: {ref}"
                )
    for ref in output_ids:
        if ref not in known:
            raise DAGParseError(f"unknown output id: {ref}")
    _toposort(sink)  # raises on cycles
    return PipelineDAG(
        name=config["name"], operators=sink, output_ids=output_ids
    )


def _parse_into(
    config: dict,
    frameworks: dict[str, dict] | None,
    namespace: str | None,
    inlined: dict[str, list[str]],
    stack: tuple[str, ...],
    sink: list[OpSpec],
) -> list[str]:
    """Parse one (sub-)pipeline, appending its renamed operators to the
    shared ``sink`` (the reference accumulates every inlined sub-DAG into
    ONE flat DAG); returns this pipeline's resolved output ids."""
    if "operators" not in config:
        raise DAGParseError("config requires 'operators'")
    prefix = f"{namespace}::" if namespace else ""
    taken = {o.id for o in sink}
    local: list[OpSpec] = []
    renaming: dict[str, list[str]] = {}
    seen: set[str] = set()
    prev: str | None = None
    for entry in config["operators"]:
        oid = entry.get("id")
        if not oid:
            raise DAGParseError("every operator needs an 'id'")
        oid = f"{prefix}{oid}"
        if oid in seen or oid in taken:
            raise DAGParseError(f"duplicate operator id: {oid}")
        seen.add(oid)
        cfg = entry.get("config") or {}
        if "type" not in cfg:
            raise DAGParseError(f"operator {oid}: config requires 'type'")
        if "input_ids" in entry:
            input_ids = [f"{prefix}{i}" for i in entry["input_ids"]]
        else:
            input_ids = [prev] if prev is not None else []
        if cfg["type"] == "load_preexisting":
            validate_config(oid, cfg)
            fname = cfg.get("framework_name")
            if not fname:
                raise DAGParseError(
                    f"operator {oid}: load_preexisting requires 'framework_name'"
                )
            if not frameworks or fname not in frameworks:
                raise DAGParseError(
                    f"operator {oid}: unknown framework: {fname}"
                )
            if fname in stack:
                raise DAGParseError(
                    f"framework cycle: {' -> '.join(stack + (fname,))}"
                )
            if fname not in inlined:
                # first inline adds the child's operators to the sink;
                # later inlines of the same framework only remap
                # (deduped_sub_dags semantics)
                inlined[fname] = _parse_into(
                    frameworks[fname], frameworks, fname,
                    inlined, stack + (fname,), sink,
                )
            renaming[oid] = list(inlined[fname])
            prev = oid
            continue
        if cfg["type"] not in OPERATOR_REGISTRY:
            raise DAGParseError(
                f"operator {oid}: unknown operator type: {cfg['type']}"
            )
        validate_config(oid, cfg)
        local.append(OpSpec(id=oid, config=cfg, input_ids=input_ids))
        prev = oid
    if renaming:
        local = [
            OpSpec(
                id=o.id,
                config=o.config,
                input_ids=[
                    rid for ref in o.input_ids
                    for rid in renaming.get(ref, [ref])
                ],
            )
            for o in local
        ]
    sink.extend(local)
    if "output_ids" in config and config["output_ids"]:
        outs = [f"{prefix}{i}" for i in config["output_ids"]]
        return [rid for ref in outs for rid in renaming.get(ref, [ref])]
    if config["operators"]:
        last = f"{prefix}{config['operators'][-1]['id']}"
        return renaming.get(last, [last])
    return []


def load_frameworks_dir(path: str) -> dict[str, dict]:
    """Scan a directory of pipeline YAMLs into a {name: config} registry —
    the ``frameworks`` argument of :func:`parse_dag` (the reference
    discovers its 3,100 YAMLs the same way, keyed by each config's name)."""
    import os

    registry: dict[str, dict] = {}
    for fn in sorted(os.listdir(path)):
        if not fn.endswith((".yaml", ".yml")):
            continue
        cfg = parse_yaml_config(os.path.join(path, fn))
        if isinstance(cfg, dict) and "name" in cfg:
            registry[cfg["name"]] = cfg
    return registry


def _toposort(ops: list[OpSpec]) -> list[OpSpec]:
    order: list[OpSpec] = []
    done: set[str] = set()
    visiting: set[str] = set()
    by_id = {o.id: o for o in ops}

    def visit(o: OpSpec) -> None:
        if o.id in done:
            return
        if o.id in visiting:
            raise DAGParseError(f"cycle involving operator: {o.id}")
        visiting.add(o.id)
        for ref in o.input_ids:
            visit(by_id[ref])
        visiting.discard(o.id)
        done.add(o.id)
        order.append(o)

    for o in ops:
        visit(o)
    return order


def parse_yaml_config(path: str) -> dict:
    """YAML file → dict (operator.py:243-254). PyYAML is optional in this
    environment; a YAML-subset fallback is NOT attempted — use dict configs
    if the import fails."""
    import yaml  # gated: baked into the pyspark image via its deps

    with open(path) as f:
        return yaml.safe_load(f)


def run_dag(
    spark: SparkSession, dag: PipelineDAG, base_path: str | None = None
) -> dict[str, DataFrame]:
    """Execute and return {output_id: DataFrame}. ``base_path`` resolves
    relative source paths."""
    results: dict[str, DataFrame] = {}
    for op in _toposort(dag.operators):
        inputs = [results[i] for i in op.input_ids]
        builder = OPERATOR_REGISTRY[op.config["type"]]
        results[op.id] = builder(spark, {**op.config, "_base": base_path}, inputs)
    return {oid: results[oid] for oid in dag.output_ids}


# --- operator registry (type string → builder) ---

def _one(inputs: list[DataFrame], typ: str) -> DataFrame:
    if len(inputs) != 1:
        raise DAGParseError(f"{typ} expects exactly one input")
    return inputs[0]


def _op_parquet_source(spark, cfg, inputs):
    path = cfg["path"]
    if cfg.get("_base") and not path.startswith("/"):
        path = f"{cfg['_base']}/{path}"
    return spark.read.parquet(path)


def _op_function(spark, cfg, inputs):
    """Dotted-path python function over the input DataFrame(s) — the
    reference 'function' operator (function_operator shape)."""
    mod, _, fn_name = cfg["function"].rpartition(".")
    fn: Callable[..., Any] = getattr(importlib.import_module(mod), fn_name)
    kwargs = cfg.get("kwargs") or {}
    if cfg.get("multi_input"):
        return fn(*inputs, **kwargs)
    return fn(_one(inputs, "function"), **kwargs)


def _op_filter(spark, cfg, inputs):
    return _one(inputs, "filter").filter(cfg["condition"])


def _op_select(spark, cfg, inputs):
    return _one(inputs, "select").select(*cfg["columns"])


def _op_quality_filter(spark, cfg, inputs):
    from open_thoughts_spark.pipeline import quality_filter

    kwargs = {k: v for k, v in cfg.items() if k not in ("type", "_base")}
    return quality_filter(_one(inputs, "quality_filter"), **kwargs)


def _op_mix(spark, cfg, inputs):
    from open_thoughts_spark.operators.relational import mix

    if len(inputs) < 2:
        raise DAGParseError("mix expects >= 2 inputs")
    return mix(inputs, key_cols=cfg["key_cols"], shard_ids=cfg.get("shard_ids"))


def _op_merge(spark, cfg, inputs):
    from open_thoughts_spark.operators.relational import merge_left_enrich

    if len(inputs) != 2:
        raise DAGParseError("merge expects exactly 2 inputs")
    return merge_left_enrich(inputs[0], inputs[1], cfg["on"])


def _op_dedup_exact(spark, cfg, inputs):
    from open_thoughts_spark.operators.dedup import exact_dedup_normalized

    return exact_dedup_normalized(
        _one(inputs, "dedup_exact"), cfg["id_col"], cfg["text_col"]
    )


def _op_minhash_dedup(spark, cfg, inputs):
    from open_thoughts_spark.operators.dedup import minhash_dedup

    kwargs = {
        k: cfg[k]
        for k in (
            "num_perm",
            "shingle_n",
            "bands",
            "rows_per_band",
            "min_parallelism",
            "max_bucket_size",
        )
        if k in cfg
    }
    return minhash_dedup(
        _one(inputs, "minhash_dedup"),
        cfg["id_col"],
        cfg["text_col"],
        min_jaccard=cfg.get("min_jaccard", 0.8),
        transitive=cfg.get("transitive", True),
        **kwargs,
    )


def _op_truncate(spark, cfg, inputs):
    from open_thoughts_spark.operators.relational import truncate

    return truncate(_one(inputs, "truncate"), cfg["n"])


def _op_completions_map(spark, cfg, inputs):
    from open_thoughts_spark.operators.maps import MAPS, apply_map

    name = cfg["map"]
    if name not in MAPS:
        raise DAGParseError(f"unknown completions map: {name}")
    return apply_map(
        _one(inputs, "completions_map"),
        MAPS[name],
        n_repeat=cfg.get("n_repeat", 1),
        merge_shards=cfg.get("merge_shards"),
    )


def _op_scrub(spark, cfg, inputs):
    from open_thoughts_spark.rules.scrub import with_scrubbed_text

    return with_scrubbed_text(
        _one(inputs, "scrub"), text_col=cfg.get("text_col", "text")
    )


def _op_add_constant(spark, cfg, inputs):
    return _one(inputs, "add_constant").withColumn(
        cfg["column"], F.lit(cfg["value"])
    )


def _op_decontaminate(spark, cfg, inputs):
    from open_thoughts_spark.operators import decontaminate as dc

    if len(inputs) != 2:
        raise DAGParseError(
            f"decontaminate expects 2 inputs (docs, eval), got {len(inputs)}"
        )
    df, eval_df = inputs
    mode = cfg.get("mode", "ngram")
    if mode == "ngram":
        return dc.ngram_decontaminate(
            df,
            eval_df,
            cfg["text_col"],
            eval_text_col=cfg.get("eval_text_col"),
            n=cfg.get("ngram_n", 8),
            id_col=cfg.get("id_col"),
        )
    if mode == "fuzzy":
        for k in ("id_col", "eval_id_col"):
            if k not in cfg:
                raise DAGParseError(f"decontaminate mode=fuzzy requires '{k}'")
        return dc.fuzzy_decontaminate(
            df,
            eval_df,
            cfg["id_col"],
            cfg["text_col"],
            cfg["eval_id_col"],
            eval_text_col=cfg.get("eval_text_col"),
            min_jaccard=cfg.get("min_jaccard", 0.5),
        )
    raise DAGParseError(f"decontaminate: unknown mode '{mode}'")


def _op_code_judge(spark, cfg, inputs):
    from open_thoughts_spark.operators.code_judge import (
        code_exec_judge,
        filter_correct_code,
    )

    df = _one(inputs, "code_judge")
    kwargs = dict(
        response_col=cfg.get("response_col", "response"),
        tests_col=cfg.get("tests_col", "tests"),
        timeout_s=cfg.get("timeout_s", 4.0),
        min_parallelism=cfg.get("min_parallelism"),
    )
    if cfg.get("keep_correct_only", False):
        return filter_correct_code(df, **kwargs)
    return code_exec_judge(df, **kwargs)


def _op_train_classifier(spark, cfg, inputs):
    """Train on the labeled input, save the model to ``model_out``, emit a
    one-row metadata dataset (the reference's train_fasttext output
    contract — the data plane carries metadata, the model rides a path)."""
    from open_thoughts_spark.functions.classifier import (
        save_nb_model,
        train_text_classifier,
    )

    df = _one(inputs, "train_classifier")
    model = train_text_classifier(
        df,
        cfg["text_col"],
        cfg["label_col"],
        dim=cfg.get("dim", 2**15),
        max_rows=cfg.get("max_rows", 200_000),
        seed=cfg.get("seed", 42),
    )
    path = save_nb_model(model, cfg["model_out"])
    return spark.createDataFrame(
        [(path, len(model.classes), ",".join(model.classes))],
        "model_path string, n_classes int, classes string",
    )


def _op_classifier_filter(spark, cfg, inputs):
    from open_thoughts_spark.functions.classifier import (
        classifier_filter,
        load_nb_model,
    )

    if len(inputs) not in (1, 2):
        raise DAGParseError(
            "classifier_filter expects 1 input (data) or 2 (data, "
            f"train_classifier metadata), got {len(inputs)}"
        )
    df = inputs[0]
    model_path = cfg.get("model_path")
    if len(inputs) == 2:
        # the trainer's metadata row carries the path (and the DAG edge)
        model_path = inputs[1].select("model_path").first()["model_path"]
    if model_path is None:
        raise DAGParseError(
            "classifier_filter needs 'model_path' in config or a "
            "train_classifier metadata input"
        )
    cfg = {**cfg, "model_path": model_path}
    backend = cfg.get("backend", "hermetic")
    common = dict(
        text_col=cfg["text_col"],
        target_label=cfg["target_label"],
        score_col=cfg.get("score_col", "_clf_score"),
        filter_threshold=cfg.get("filter_threshold", 0.5),
        top_percentage=cfg.get("top_percentage"),
        just_add_scores=cfg.get("just_add_scores", False),
        min_parallelism=cfg.get("min_parallelism"),
    )
    if backend == "hermetic":
        model = load_nb_model(cfg["model_path"])
        return classifier_filter(spark, df, model, **common)
    return classifier_filter(
        spark, df, None, model_path=cfg["model_path"], backend=backend, **common
    )


def _op_embed_texts(spark, cfg, inputs):
    from open_thoughts_spark.operators.embedding import embed_texts

    kwargs = {
        k: cfg[k]
        for k in ("out_col", "dim", "max_chars", "normalize", "model_path", "backend")
        if k in cfg
    }
    return embed_texts(_one(inputs, "embed_texts"), cfg["text_col"], **kwargs)


def _op_token_budget_sample(spark, cfg, inputs):
    from open_thoughts_spark.operators.relational import sample_to_token_budget

    return sample_to_token_budget(
        _one(inputs, "token_budget_sample"),
        cfg["domain_col"],
        cfg["token_count_col"],
        cfg["token_budget"],
        cfg["key_cols"],
        salt=cfg.get("salt", "tokbudget"),
        default_budget=cfg.get("default_budget"),
    )


OPERATOR_REGISTRY: dict[str, Callable] = {
    "parquet_source": _op_parquet_source,
    "function": _op_function,
    "filter": _op_filter,
    "select": _op_select,
    "quality_filter": _op_quality_filter,
    "mix": _op_mix,
    "merge": _op_merge,
    "dedup_exact": _op_dedup_exact,
    "minhash_dedup": _op_minhash_dedup,
    "truncate": _op_truncate,
    "completions_map": _op_completions_map,
    "scrub": _op_scrub,
    "add_constant": _op_add_constant,
    "decontaminate": _op_decontaminate,
    "code_judge": _op_code_judge,
    "train_classifier": _op_train_classifier,
    "classifier_filter": _op_classifier_filter,
    "embed_texts": _op_embed_texts,
    "token_budget_sample": _op_token_budget_sample,
}
