"""md5-derived tokenization + hashing shared by the hermetic model kernels.

Round-1 verdict: the hermetic encoder (crc32 buckets) and the LSH planes
(numpy RandomState) were not expressible in DuckDB SQL, so the three
model-side driver queries could only get the weaker rows-only check. md5
hex is identical in Python (hashlib), Spark (F.md5) and DuckDB (md5()), so
deriving every model constant from md5 makes the full model pipeline —
embed → knn, LSH-ANN, NB classifier — value-checkable end to end.

Contract (each function documents its exact SQL equivalent):
- tokens: lowercase, split on ASCII whitespace runs, drop empties;
- bucket(token, dim) = int(md5(token)[:8 hex], 16) % dim;
- plane weight(p, i)  = int(md5(f"{p}|{i}")[:8 hex], 16) % 16 - 8  ∈ [-8, 7].

All arithmetic downstream of these stays in integer space (token counts,
quantized projections) so no float summation-order issue can desynchronize
the engines; only final similarity divisions are float (deterministic:
IEEE division/sqrt of identical operands).
"""

from __future__ import annotations

import hashlib
import re

_WS_RE = re.compile(r"[ \t\n\x0B\f\r]+")

# DuckDB fragment: the token array for a text expression (before the
# empty-string filter, which callers apply as ``where tok != ''``).
TOKENS_SQL = "string_split_regex(lower({text}), '[ \\t\\n\\x0B\\f\\r]+')"


def ascii_tokens(text: str) -> list[str]:
    """lower + ASCII-whitespace-run split + drop empties.

    SQL: ``unnest(string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'))
    ... where tok != ''``.
    """
    return [t for t in _WS_RE.split(text.lower()) if t]


def md5_bucket(token: str, dim: int) -> int:
    """SQL: ``('0x' || substr(md5(tok), 1, 8))::bigint % dim``."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:8], 16) % dim


def bucket_sql(tok_expr: str, dim: int) -> str:
    return f"(('0x' || substr(md5({tok_expr}), 1, 8))::bigint % {dim})"


def plane_weight(p: int, i: int) -> int:
    """Integer hyperplane weight in [-8, 7] for plane p, dimension i.

    SQL: ``('0x' || substr(md5(p || '|' || i), 1, 8))::bigint % 16 - 8``.
    """
    key = f"{p}|{i}".encode()
    return int(hashlib.md5(key).hexdigest()[:8], 16) % 16 - 8


def plane_weight_sql(p_expr: str, i_expr: str) -> str:
    return (
        f"(('0x' || substr(md5({p_expr} || '|' || {i_expr}), 1, 8))::bigint"
        " % 16 - 8)"
    )
