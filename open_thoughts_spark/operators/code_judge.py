"""Sandboxed code-execution judge — run generated code against test cases.

Parity target: the reference's rejection-sampling code judge
(/root/reference/open_thoughts/code/judge.py) — ``has_code`` fenced-block
extraction (:720-730), ``run_test`` dual call-based / standard-input modes
(:73-172), per-test subprocess execution with timeout (:398-465
``execute_std_code``), the tolerant stdout comparison ladder (:484-617
``compare_std_results``) and per-row result assembly (:733-763
``process_single_row``). Test-case parsing mirrors
/root/reference/open_thoughts/code/filters.py:16-31 (``filter_tests``).

Spark-first shape: the judge is a ``mapInPandas`` batch map — each executor
task walks its Arrow batch and runs every (row, test) pair in a FRESH
subprocess (``python -I`` isolated mode, its own temp cwd, wall-clock
timeout, RLIMIT_AS/RLIMIT_CPU caps — the process-isolation posture of the
reference's ``reliability_guard`` judge.py:620-696, enforced by the kernel
instead of monkey-patching builtins). No driver-side loop: 10^6 rows judge
in parallel across however many cores the cluster has, and the per-row
output is a plain struct so downstream filters stay native DataFrame ops.

Determinism: for fixture code that is itself deterministic, verdicts are
exact integers/booleans — the ``code_exec_verify`` entry query value-oracles
pass/fail counts against DuckDB.

Deviation from the reference, documented: the synthesized prelude imports
only stdlib modules (the reference also injects ``numpy as np`` — a ~100 ms
import per spawned test process; solutions that need numpy can import it
themselves).
"""

from __future__ import annotations

import functools
import json
import math
import os
import re
import subprocess
import sys
import tempfile

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_thoughts_spark.spread import spread

# judge.py:720-730 has_code — last fenced block is the solution
_CODE_BLOCK_RE = re.compile(r"```(?:[a-zA-Z]*)\n(.*?)```", re.DOTALL)

# judge.py:243 synthesize_cb_code prelude (stdlib subset; see module note)
_PRELUDE = (
    "import sys\nimport itertools\n"
    "from itertools import accumulate, product, permutations, combinations\n"
    "import collections\n"
    "from collections import Counter, OrderedDict, deque, defaultdict\n"
    "from functools import lru_cache\nimport math\n"
    "from math import sqrt, sin, cos, tan, ceil, fabs, floor, gcd, exp, log\n"
    "import heapq\nfrom heapq import *\n"
)

# judge.py:64-71 EXECUTION_RESULTS vocabulary
PASSED = "passed"
FAILED = "false"
TIMEOUT = "timeout"
RUNTIME_ERROR = "runtime_error"
NO_CODE = "no_code"
BAD_TESTS = "bad_tests"

DEFAULT_TIMEOUT_S = 4.0  # judge.py:62 TIMEOUT = 4
_MEM_LIMIT_BYTES = 512 * 1024 * 1024


def extract_code_blocks(response: str) -> list[str]:
    """All fenced code blocks in a response (judge.py:720-730)."""
    return _CODE_BLOCK_RE.findall(response or "")


def parse_tests(raw) -> dict | None:
    """filters.py:16-31: JSON (fallback literal-eval) dict with non-empty
    inputs AND outputs; anything else is unjudgeable."""
    tests = raw
    if isinstance(tests, str):
        try:
            tests = json.loads(tests)
        except (json.JSONDecodeError, ValueError):
            try:
                import ast

                tests = ast.literal_eval(tests)
            except (ValueError, SyntaxError):
                tests = None
    if not isinstance(tests, dict):
        return None
    if not tests.get("inputs") or not tests.get("outputs"):
        return None
    return tests


def _set_limits(timeout_s: float = DEFAULT_TIMEOUT_S) -> None:  # pragma: no cover - runs in the child
    import resource

    resource.setrlimit(resource.RLIMIT_AS, (_MEM_LIMIT_BYTES, _MEM_LIMIT_BYTES))
    # CPU cap tracks the requested wall timeout (ADVICE r5: a fixed
    # DEFAULT-based cap SIGKILLed CPU-bound-but-correct solutions when the
    # caller passed timeout_s > default)
    cpu = int(math.ceil(timeout_s)) + 1
    resource.setrlimit(resource.RLIMIT_CPU, (cpu, cpu))


def _run_subprocess(
    program: str | None, stdin_text: str, timeout_s: float, workdir: str
) -> tuple[int, str]:
    """One sandboxed execution: fresh ``python -I`` (no site/user packages,
    no cwd on sys.path), temp cwd, kernel rlimits, wall timeout.
    Returns (exec_code, stdout): 999 = ran, -1 = timeout, -2 = spawn error
    (judge.py:426-440). ``program=None`` reuses the ``sol.py`` already in
    ``workdir`` (the per-row program is identical across its tests — r6
    dropped the redundant rewrite per test)."""
    path = os.path.join(workdir, "sol.py")
    if program is not None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(program)
    try:
        result = subprocess.run(
            [sys.executable, "-I", path],
            input=stdin_text,
            text=True,
            capture_output=True,
            timeout=timeout_s,
            cwd=workdir,
            preexec_fn=functools.partial(_set_limits, timeout_s),
        )
    except subprocess.TimeoutExpired:
        return -1, ""
    except Exception:
        return -2, ""
    if result.returncode != 0:
        return -(3000 + result.returncode), ""
    return 999, result.stdout


def _norm_lines(text: str) -> list[str]:
    """Split, strip, drop empties — the normalization the comparison ladder
    repeatedly applies (judge.py:517-531)."""
    return [ln.strip() for ln in (text or "").split("\n") if ln.strip()]


def compare_std_outputs(got: str, expected) -> bool:
    """Deterministic subset of judge.py:484-617 compare_std_results:
    1. stripped full-string equality;
    2. normalized line-list equality (strip each line, drop empties);
    3. whitespace-token float comparison at rel tol 1e-5 (np.allclose
       default, computed here without numpy);
    4. per-line unordered token-set equality (check4/5 ladder rungs).
    """
    if isinstance(expected, list):
        expected = "\n".join(str(e) for e in expected)
    expected = str(expected)
    if got.strip() == expected.strip():
        return True
    got_lines, exp_lines = _norm_lines(got), _norm_lines(expected)
    if got_lines == exp_lines:
        return True
    got_tok, exp_tok = got.split(), expected.split()
    if len(got_tok) == len(exp_tok) and got_tok:
        try:
            if all(
                math.isclose(float(g), float(e), rel_tol=1e-5, abs_tol=1e-8)
                for g, e in zip(got_tok, exp_tok)
            ):
                return True
        except ValueError:
            pass
    if len(got_lines) == len(exp_lines) and got_lines:
        if all(
            set(g.split()) == set(e.split())
            for g, e in zip(got_lines, exp_lines)
        ):
            return True
    return False


def _tuplify(v):
    if isinstance(v, tuple):
        return list(v)
    return v


def compare_cb_result(got_json: str, expected) -> bool:
    """Call-based comparison (judge.py:276-388 execute_cb_code ladder,
    deterministic subset): parsed-value equality with tuple->list
    normalization, singleton unwrap, and elementwise float tolerance."""
    try:
        got = json.loads(got_json)
    except (json.JSONDecodeError, ValueError):
        return False
    exp = _tuplify(expected)
    if got == exp or [got] == exp or got == [exp]:
        return True
    try:
        if (
            isinstance(got, list)
            and isinstance(exp, list)
            and len(got) == len(exp)
            and all(
                math.isclose(float(g), float(e), rel_tol=1e-5, abs_tol=1e-8)
                for g, e in zip(got, exp)
            )
        ):
            return True
    except (TypeError, ValueError):
        pass
    try:
        return math.isclose(float(got), float(exp), rel_tol=1e-5, abs_tol=1e-8)
    except (TypeError, ValueError):
        return False


def _synthesize_cb(code: str, fn_name: str) -> str:
    """Call-based harness: read JSON args from stdin, call fn (through
    Solution() when the code defines that class — judge.py:203-207), print
    the JSON result."""
    call = (
        f"Solution().{fn_name}" if "class Solution" in code else fn_name
    )
    return (
        _PRELUDE
        + code
        + "\n\nimport json as _json\n"
        + "_args = _json.loads(sys.stdin.read())\n"
        + f"_res = {call}(*_args)\n"
        + "if isinstance(_res, tuple): _res = list(_res)\n"
        + "print(_json.dumps(_res))\n"
    )


def judge_one(
    response: str,
    tests_raw,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    early_stop: bool = True,
) -> tuple[bool, str, int, int]:
    """Judge one row: (correct, reason, n_passed, n_tests).

    reason vocabulary: '' (correct), 'no_code', 'bad_tests', and the first
    failing test's execution result ('false' / 'timeout' /
    'returncode:<n>') — process_single_row's row assembly with the
    EXECUTION_RESULTS labels surfaced instead of the generic
    'Code is incorrect.'"""
    blocks = extract_code_blocks(response)
    if not blocks:
        return False, NO_CODE, 0, 0
    code = blocks[-1]
    tests = parse_tests(tests_raw)
    if tests is None:
        return False, BAD_TESTS, 0, 0
    inputs, outputs = tests["inputs"], tests["outputs"]
    n_tests = min(len(inputs), len(outputs))
    fn_name = tests.get("fn_name")
    if fn_name:
        program = _synthesize_cb(code, fn_name)
    else:
        program = _PRELUDE + code
    n_passed = 0
    first_fail = ""
    with tempfile.TemporaryDirectory(prefix="ots_judge_") as workdir:
        for i in range(n_tests):
            stdin_text = inputs[i]
            if isinstance(stdin_text, list):
                stdin_text = "\n".join(str(x) for x in stdin_text)
            if fn_name:
                # call-based: args travel as a JSON list on stdin
                args = inputs[i]
                if not isinstance(args, list):
                    args = [args]
                stdin_text = json.dumps(args)
            exec_code, stdout = _run_subprocess(
                program if i == 0 else None, str(stdin_text), timeout_s, workdir
            )
            if exec_code == 999:
                ok = (
                    compare_cb_result(stdout, outputs[i])
                    if fn_name
                    else compare_std_outputs(stdout, outputs[i])
                )
                if ok:
                    n_passed += 1
                    continue
                first_fail = first_fail or FAILED
            elif exec_code == -1:
                first_fail = first_fail or TIMEOUT
            elif exec_code == -2:
                first_fail = first_fail or RUNTIME_ERROR
            else:
                rc = -exec_code - 3000
                first_fail = first_fail or f"returncode:{rc}"
            if early_stop:  # judge.py:461-462
                break
    correct = n_tests > 0 and n_passed == n_tests
    return correct, "" if correct else first_fail, n_passed, n_tests


def code_exec_judge(
    df: DataFrame,
    response_col: str = "response",
    tests_col: str = "tests",
    timeout_s: float = DEFAULT_TIMEOUT_S,
    early_stop: bool = True,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Append (correct, judge_reason, n_passed, n_tests) to ``df``.

    Distributed judge: ``mapInPandas`` so each executor core runs its rows'
    subprocesses concurrently with every other core — the Spark equivalent
    of the reference's driver-bound multiprocessing Pool
    (judge.py:766-805), minus the collect-everything-to-one-node ceiling.
    ``min_parallelism`` spreads single-file scans (CLAUDE.md perf lore)
    so the subprocess work isn't serialized onto 1-2 tasks.
    """
    df = spread(df, min_parallelism)
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [
            "`correct` boolean",
            "`judge_reason` string",
            "`n_passed` int",
            "`n_tests` int",
        ]
    )

    def run(batches):
        for pdf in batches:
            verdicts = [
                judge_one(r, t, timeout_s=timeout_s, early_stop=early_stop)
                for r, t in zip(pdf[response_col], pdf[tests_col])
            ]
            pdf = pdf.copy()
            pdf["correct"] = [v[0] for v in verdicts]
            pdf["judge_reason"] = [v[1] for v in verdicts]
            pdf["n_passed"] = pd.Series(
                [v[2] for v in verdicts], dtype="int32", index=pdf.index
            )
            pdf["n_tests"] = pd.Series(
                [v[3] for v in verdicts], dtype="int32", index=pdf.index
            )
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def filter_correct_code(
    df: DataFrame,
    response_col: str = "response",
    tests_col: str = "tests",
    **kwargs,
) -> DataFrame:
    """Rejection sampling: keep only rows whose code passes every test
    (the code_judge -> filter composition the reference pipelines use)."""
    judged = code_exec_judge(df, response_col, tests_col, **kwargs)
    return judged.filter(F.col("correct"))
