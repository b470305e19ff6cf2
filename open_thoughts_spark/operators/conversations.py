"""Conversation format converters — ShareGPT / OpenAI / instruction-response
/ long format.

Reference semantics (/root/reference/open_thoughts_3/dcft/data_strategies/
commons.py): ``openai_to_sharegpt`` (:23-55), ``convert_sharegpt_to_openai``
(:244-258), ``alpaca_to_sharegpt`` (:212-241), ``change_tags`` (:82-98),
``convert_instruction_response_to_sharegpt`` (:59-79, :101-128),
``convert_sharegpt_to_instruction_response`` (:145-166); the ShareGPT row
shape is ``conversations = [{"from": role, "value": text}]``.

Our engine's canonical shape is the exploded LONG format
``(conv_id, turn_idx, role, text)`` — the scalable representation (a 10^6-turn
conversation is rows, not one giant array cell). Converters here move between
long and the nested shapes losslessly and deterministically:

- nested → long: ``posexplode`` (order preserved from the array)
- long → nested: ``collect_list(struct(turn_idx, ...))`` + ``sort_array`` —
  NOT a window: one aggregation, and sort_array makes the result independent
  of shuffle arrival order (Spark gives no intra-group order guarantees).
- role-tag remapping is a broadcastable map expression on either shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ShareGPT tag ↔ OpenAI role (commons.py:24, :105)
SHAREGPT_TO_OPENAI_ROLES = {"human": "user", "gpt": "assistant", "system": "system", "tool": "tool"}
OPENAI_TO_SHAREGPT_ROLES = {"user": "human", "assistant": "gpt", "system": "system", "tool": "tool"}


def _map_expr(col: Column, mapping: dict[str, str]) -> Column:
    expr = None
    for src, dst in mapping.items():
        branch = F.when(col == src, F.lit(dst))
        expr = branch if expr is None else expr.when(col == src, F.lit(dst))
    return expr.otherwise(col)


def change_tags(df: DataFrame, role_col: str, mapping: dict[str, str]) -> DataFrame:
    """commons.py:82-98 — remap role tags (long-format form)."""
    return df.withColumn(role_col, _map_expr(F.col(role_col), mapping))


def sharegpt_to_long(
    df: DataFrame,
    conv_col: str = "conversations",
    id_col: str = "conv_id",
    role_field: str = "from",
    text_field: str = "value",
) -> DataFrame:
    """Nested ShareGPT → long: one row per turn, order from array position."""
    keep = [c for c in df.columns if c != conv_col]
    return df.select(
        *keep, F.posexplode(F.col(conv_col)).alias("turn_idx", "_turn")
    ).select(
        *keep,
        F.col("turn_idx").cast("int"),
        _map_expr(F.col(f"_turn.{role_field}"), SHAREGPT_TO_OPENAI_ROLES).alias("role"),
        F.col(f"_turn.{text_field}").alias("text"),
    )


def long_to_sharegpt(
    df: DataFrame,
    id_col: str = "conv_id",
    out_col: str = "conversations",
) -> DataFrame:
    """Long → nested ShareGPT. sort_array over (turn_idx, …) structs gives a
    deterministic order with a single aggregation (no window, one shuffle)."""
    packed = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("turn_idx").alias("idx"),
                _map_expr(F.col("role"), OPENAI_TO_SHAREGPT_ROLES).alias("from"),
                F.col("text").alias("value"),
            )
        )
    )
    turns = F.transform(
        packed, lambda t: F.struct(t["from"].alias("from"), t["value"].alias("value"))
    )
    return df.groupBy(id_col).agg(turns.alias(out_col))


def long_to_openai(
    df: DataFrame, id_col: str = "conv_id", out_col: str = "messages"
) -> DataFrame:
    """Long → OpenAI messages [{"role","content"}] (commons.py:244-258 shape)."""
    packed = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("turn_idx").alias("idx"),
                F.col("role").alias("role"),
                F.col("text").alias("content"),
            )
        )
    )
    msgs = F.transform(
        packed, lambda t: F.struct(t["role"].alias("role"), t["content"].alias("content"))
    )
    return df.groupBy(id_col).agg(msgs.alias(out_col))


def openai_to_long(
    df: DataFrame, messages_col: str = "messages", id_col: str = "conv_id"
) -> DataFrame:
    keep = [c for c in df.columns if c != messages_col]
    return df.select(
        *keep, F.posexplode(F.col(messages_col)).alias("turn_idx", "_m")
    ).select(
        *keep,
        F.col("turn_idx").cast("int"),
        F.col("_m.role").alias("role"),
        F.col("_m.content").alias("text"),
    )


def instruction_response_to_long(
    df: DataFrame,
    instruction_col: str,
    response_col: str,
    id_col: str,
    system_prompt: str | None = None,
) -> DataFrame:
    """(instruction, response) rows → 2-turn (or 3 with system) conversations
    (commons.py:59-79, :101-128)."""
    turns = []
    offset = 0
    if system_prompt is not None:
        turns.append(F.struct(F.lit("system").alias("role"), F.lit(system_prompt).alias("text")))
        offset = 1
    turns.append(F.struct(F.lit("user").alias("role"), F.col(instruction_col).alias("text")))
    turns.append(F.struct(F.lit("assistant").alias("role"), F.col(response_col).alias("text")))
    keep = [c for c in df.columns if c not in (instruction_col, response_col)]
    return df.select(
        *keep, F.posexplode(F.array(*turns)).alias("turn_idx", "_t")
    ).select(
        *keep,
        F.col("turn_idx").cast("int"),
        F.col("_t.role").alias("role"),
        F.col("_t.text").alias("text"),
    )


def long_to_instruction_response(
    df: DataFrame, id_col: str = "conv_id"
) -> DataFrame:
    """First user turn → instruction, first assistant turn after it →
    response (commons.py:145-166 takes conversation[0]/[1]). Single
    aggregation: min-by-turn_idx per role via sort_array + element_at."""
    by_role = lambda role: F.try_element_at(  # noqa: E731  (null when role absent)
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("role") == role,
                    F.struct(F.col("turn_idx").alias("idx"), F.col("text").alias("t")),
                )
            )
        ),
        F.lit(1),
    )["t"]
    return df.groupBy(id_col).agg(
        by_role("user").alias("instruction"),
        by_role("assistant").alias("response"),
    )


def concatenate_turns(
    df: DataFrame,
    id_col: str = "conv_id",
    out_col: str = "full_text",
    sep: str = "\n",
    with_role_prefix: bool = True,
) -> DataFrame:
    """Whole-conversation text (for conversation-level dedup/decontam):
    deterministic order via sort_array, one aggregation."""
    body = (
        F.concat(F.col("role"), F.lit(": "), F.col("text"))
        if with_role_prefix
        else F.col("text")
    )
    packed = F.sort_array(
        F.collect_list(F.struct(F.col("turn_idx").alias("idx"), body.alias("t")))
    )
    return df.groupBy(id_col).agg(
        F.array_join(F.transform(packed, lambda s: s["t"]), sep).alias(out_col)
    )
