"""Math/proof domain filters — NuminaMath + MultipleSamples parity.

Reference semantics (reproduced exactly; all are case-insensitive substring
tests, so they are portable to every engine without regex dialect concerns):

- ``filter_problems`` (/root/reference/open_thoughts/math/filter.py:4-18):
  drop when the *problem* mentions a figure/diagram/image keyword or
  ``answer:``; drop multipart problems (lowercased problem starts with
  ``a)`` and contains ``b)``); drop when the *solution* is null/empty;
  drop proofs (``\\boxed{}`` — empty box is QED); drop when no ``\\boxed{``
  answer is present at all.
- ``filter_out_proofs`` (/root/reference/open_thoughts_3/dcft/
  data_strategies/MultipleSamples/utils.py:295-301): drop problems
  containing ``show ``, ``prove `` or ``proof``.

First-match-wins reason cascade like the main quality-filter rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# math/filter.py:5 — problem-side media/answer keywords
MATH_PROBLEM_KEYWORDS: list[str] = [
    "figure", "diagram", "jpeg", "png", "jpg", "svg", "answer:",
]

# MultipleSamples/utils.py:296-300 — proof markers
PROOF_MARKERS: list[str] = ["show ", "prove ", "proof"]

# cascade order (first match wins)
MATH_RULE_ORDER: list[str] = [
    "figure_keyword", "multipart", "missing_solution", "proof_qed",
    "no_boxed", "proof_problem",
]


def math_rule_flags(problem: Column, solution: Column) -> dict[str, Column]:
    lp = F.lower(problem)
    ls = F.lower(solution)
    kw = None
    for k in MATH_PROBLEM_KEYWORDS:
        c = lp.contains(k)
        kw = c if kw is None else (kw | c)
    proof = None
    for m in PROOF_MARKERS:
        c = lp.contains(m)
        proof = c if proof is None else (proof | c)
    return {
        "figure_keyword": kw,
        "multipart": lp.startswith("a)") & lp.contains("b)"),
        "missing_solution": solution.isNull() | (solution == ""),
        "proof_qed": ls.contains("\\boxed{}"),
        "no_boxed": ~ls.contains("\\boxed{"),
        "proof_problem": proof,
    }


def with_math_decision(
    df: DataFrame, problem_col: str = "problem", solution_col: str = "solution"
) -> DataFrame:
    """Attach ``math_drop_reason`` (null = keep) + ``keep_math``."""
    flags = math_rule_flags(F.col(problem_col), F.col(solution_col))
    whens = [
        F.when(F.coalesce(flags[name], F.lit(False)), F.lit(name))
        for name in MATH_RULE_ORDER
    ]
    reason = F.coalesce(*whens)
    return df.withColumn("math_drop_reason", reason).withColumn(
        "keep_math", reason.isNull()
    )


def filter_math_problems(
    df: DataFrame, problem_col: str = "problem", solution_col: str = "solution"
) -> DataFrame:
    """math/filter.py filter_problems parity (keeps rows passing all rules
    except proof_problem, which is the separate MultipleSamples filter)."""
    flags = math_rule_flags(F.col(problem_col), F.col(solution_col))
    keep = ~F.coalesce(
        flags["figure_keyword"] | flags["multipart"] | flags["missing_solution"]
        | flags["proof_qed"] | flags["no_boxed"],
        F.lit(True),
    )
    return df.filter(keep)


def filter_out_proofs(df: DataFrame, problem_col: str = "problem") -> DataFrame:
    """MultipleSamples/utils.py:295-301 parity."""
    lp = F.lower(F.col(problem_col))
    cond = F.lit(False)
    for m in PROOF_MARKERS:
        cond = cond | lp.contains(m)
    return df.filter(~F.coalesce(cond, F.lit(True)))


# --- code-domain filters (open_thoughts/code/filters.py:4-48) ---

CODE_RULE_ORDER: list[str] = [
    "url_in_description", "image_in_description", "description_too_short",
    "no_tests", "no_solutions",
]


def code_rule_flags(
    description: Column,
    tests_json: Column,
    solutions_json: Column,
    min_description_length: int = 200,
) -> dict[str, Column]:
    """filter_problem / filter_tests / filter_solutions as native exprs.

    tests arrive as a JSON document {"inputs": [...], "outputs": [...]};
    solutions as a JSON array — the reference's json.loads becomes
    json_array_length over get_json_object paths (no Python)."""
    ld = F.lower(description)
    n_inputs = F.coalesce(
        F.json_array_length(F.get_json_object(tests_json, "$.inputs")), F.lit(0)
    )
    n_outputs = F.coalesce(
        F.json_array_length(F.get_json_object(tests_json, "$.outputs")), F.lit(0)
    )
    n_solutions = F.coalesce(F.json_array_length(solutions_json), F.lit(0))
    return {
        "url_in_description": ld.contains("http://"),
        "image_in_description": ld.contains("[image]"),
        "description_too_short": description.isNull()
        | (F.length(description) < min_description_length),
        "no_tests": (n_inputs == 0) | (n_outputs == 0),
        "no_solutions": n_solutions == 0,
    }


def with_code_decision(
    df: DataFrame,
    description_col: str = "description",
    tests_col: str = "tests",
    solutions_col: str = "solutions",
    min_description_length: int = 200,
) -> DataFrame:
    """Attach ``code_drop_reason`` (null = keep) + ``keep_code`` — the code
    curation cascade (filters.py composed like the math one)."""
    flags = code_rule_flags(
        F.col(description_col), F.col(tests_col), F.col(solutions_col),
        min_description_length,
    )
    whens = [
        F.when(F.coalesce(flags[name], F.lit(False)), F.lit(name))
        for name in CODE_RULE_ORDER
    ]
    reason = F.coalesce(*whens)
    return df.withColumn("code_drop_reason", reason).withColumn(
        "keep_code", reason.isNull()
    )


def code_reason_sql(
    description_expr: str,
    tests_expr: str,
    solutions_expr: str,
    min_description_length: int = 200,
) -> str:
    ld = f"lower({description_expr})"
    flags = {
        "url_in_description": f"contains({ld}, 'http://')",
        "image_in_description": f"contains({ld}, '[image]')",
        "description_too_short": (
            f"({description_expr} is null"
            f" or length({description_expr}) < {min_description_length})"
        ),
        "no_tests": (
            f"(coalesce(json_array_length(json_extract({tests_expr}, '$.inputs')), 0) = 0"
            f" or coalesce(json_array_length(json_extract({tests_expr}, '$.outputs')), 0) = 0)"
        ),
        "no_solutions": f"(coalesce(json_array_length({solutions_expr}), 0) = 0)",
    }
    whens = " ".join(
        f"when coalesce({flags[name]}, false) then '{name}'"
        for name in CODE_RULE_ORDER
    )
    return f"(case {whens} else null end)"


# --- DuckDB oracle fragments built from the SAME constants ---

def _q(s: str) -> str:
    # single-quote doubling only: DuckDB standard string literals treat
    # backslashes literally, so no backslash escaping is needed
    return "'" + s.replace("'", "''") + "'"


def math_flags_sql(problem_expr: str, solution_expr: str) -> dict[str, str]:
    lp = f"lower({problem_expr})"
    ls = f"lower({solution_expr})"
    kw = " or ".join(f"contains({lp}, {_q(k)})" for k in MATH_PROBLEM_KEYWORDS)
    proof = " or ".join(f"contains({lp}, {_q(m)})" for m in PROOF_MARKERS)
    return {
        "figure_keyword": f"({kw})",
        "multipart": f"(starts_with({lp}, 'a)') and contains({lp}, 'b)'))",
        "missing_solution": f"({solution_expr} is null or {solution_expr} = '')",
        "proof_qed": f"contains({ls}, '\\boxed{{}}')",
        "no_boxed": f"(not contains({ls}, '\\boxed{{'))",
        "proof_problem": f"({proof})",
    }


def math_reason_sql(problem_expr: str, solution_expr: str) -> str:
    flags = math_flags_sql(problem_expr, solution_expr)
    whens = " ".join(
        f"when coalesce({flags[name]}, false) then '{name}'"
        for name in MATH_RULE_ORDER
    )
    return f"(case {whens} else null end)"
