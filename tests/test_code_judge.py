"""Sandboxed code-execution judge (operators/code_judge.py) — verdict
paths, comparison ladder, subprocess isolation, and the Spark map."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from open_thoughts_spark.operators.code_judge import (
    code_exec_judge,
    compare_cb_result,
    compare_std_outputs,
    extract_code_blocks,
    filter_correct_code,
    judge_one,
    parse_tests,
)

ECHO = "sol:\n```python\nimport sys\nprint(int(sys.stdin.read()) * 2)\n```"
T_OK = json.dumps({"inputs": ["21"], "outputs": ["42"]})


def test_extract_code_blocks_last_wins():
    resp = "```python\nfirst\n```\ntext\n```\nsecond\n```"
    assert extract_code_blocks(resp) == ["first\n", "second\n"]
    assert extract_code_blocks("no fences") == []
    assert extract_code_blocks(None) == []


def test_parse_tests_filters():
    # filters.py:16-31 semantics: dict with non-empty inputs AND outputs
    assert parse_tests('{"inputs": [], "outputs": []}') is None
    assert parse_tests('{"inputs": ["1"], "outputs": []}') is None
    assert parse_tests("not json {") is None
    assert parse_tests('["a", "list"]') is None
    assert parse_tests('{"inputs": ["1"], "outputs": ["2"]}') is not None
    # ast.literal_eval fallback (python-literal dicts with single quotes)
    assert parse_tests("{'inputs': ['1'], 'outputs': ['2']}") is not None


def test_judge_std_pass_fail():
    assert judge_one(ECHO, T_OK, timeout_s=5) == (True, "", 1, 1)
    t_bad = json.dumps({"inputs": ["21"], "outputs": ["43"]})
    assert judge_one(ECHO, t_bad, timeout_s=5) == (False, "false", 0, 1)


def test_judge_early_stop_counts():
    t3 = json.dumps({"inputs": ["1", "2", "3"], "outputs": ["2", "5", "6"]})
    # test 1 passes, test 2 fails -> stop; test 3 never runs
    assert judge_one(ECHO, t3, timeout_s=5) == (False, "false", 1, 3)
    # without early stop, test 3 passes too
    assert judge_one(ECHO, t3, timeout_s=5, early_stop=False) == (
        False, "false", 2, 3,
    )


def test_judge_compile_error_and_no_code():
    bad = "```python\ndef broken(:\n```"
    correct, reason, np_, nt = judge_one(bad, T_OK, timeout_s=5)
    assert (correct, np_, nt) == (False, 0, 1)
    assert reason.startswith("returncode:")
    assert judge_one("prose only", T_OK) == (False, "no_code", 0, 0)
    assert judge_one(ECHO, "junk {") == (False, "bad_tests", 0, 0)


def test_judge_timeout():
    spin = "```python\nwhile True:\n    pass\n```"
    assert judge_one(spin, T_OK, timeout_s=1.0) == (False, "timeout", 0, 1)


def test_judge_call_based_and_solution_class():
    t = json.dumps({"fn_name": "add3", "inputs": [[7], [0]], "outputs": [10, 3]})
    fn = "```python\ndef add3(x):\n    return x + 3\n```"
    assert judge_one(fn, t, timeout_s=5) == (True, "", 2, 2)
    cls = (
        "```python\nclass Solution:\n    def add3(self, x):\n"
        "        return x + 3\n```"
    )
    assert judge_one(cls, t, timeout_s=5) == (True, "", 2, 2)


def test_judge_sandbox_isolated_mode():
    # python -I: cwd/script dir not on sys.path, so a judged solution can't
    # import repo modules — the isolation posture, observable from outside
    sneaky = "```python\nimport open_thoughts_spark\nprint('in')\n```"
    correct, reason, *_ = judge_one(sneaky, T_OK, timeout_s=5)
    assert not correct and reason.startswith("returncode:")


def test_compare_std_outputs_ladder():
    assert compare_std_outputs(" 42 \n", "42")
    assert compare_std_outputs("1\n2\n\n", ["1", "2"])
    assert compare_std_outputs("a b\nc\n", "  a b \n\n c ")
    # float tolerance (np.allclose default rtol=1e-5)
    assert compare_std_outputs("0.3000001\n", "0.3")
    assert not compare_std_outputs("0.31\n", "0.3")
    # unordered tokens per line (check4/5 rungs)
    assert compare_std_outputs("b a\n", "a b")
    assert not compare_std_outputs("a b\n", "a c")


def test_compare_cb_result():
    assert compare_cb_result("[1, 2]", (1, 2))
    assert compare_cb_result("3", 3)
    assert compare_cb_result("3.0000001", 3.0)
    assert compare_cb_result("[3]", 3)
    assert not compare_cb_result("[1, 2]", [2, 1])
    assert not compare_cb_result("not json", 3)


def test_code_exec_judge_spark(spark):
    rows = [
        (0, ECHO, T_OK),
        (1, "no code", T_OK),
        (2, ECHO, json.dumps({"inputs": ["5"], "outputs": ["11"]})),
    ]
    df = spark.createDataFrame(rows, "id int, response string, tests string")
    out = code_exec_judge(df, timeout_s=5).orderBy("id").collect()
    assert [r["correct"] for r in out] == [True, False, False]
    assert [r["judge_reason"] for r in out] == ["", "no_code", "false"]
    assert [(r["n_passed"], r["n_tests"]) for r in out] == [(1, 1), (0, 0), (0, 1)]
    kept = filter_correct_code(df, timeout_s=5).collect()
    assert [r["id"] for r in kept] == [0]


def test_compare_ladder_reference_rung_cases():
    """Edge shapes hand-derived from the reference ladder
    (judge.py:484-617): list-valued ground truth joined by newline, the
    strip-per-line rung, whitespace-token sets per line, and float
    tolerance interaction with token counts. Documents exactly which
    rungs the deterministic subset keeps."""
    # list expected -> newline-joined (rung 1 pre-normalization)
    assert compare_std_outputs("1\n2\n", ["1", "2"])
    assert compare_std_outputs("  1  \n  2  \n", ["1", "2"])
    # int-vs-float textual mismatch still passes via float rung
    assert compare_std_outputs("1.0\n2.0\n", ["1", "2"])
    # token-count mismatch fails the float rung, line rung, set rung
    assert not compare_std_outputs("1 2 3\n", "1 2")
    # per-line unordered tokens pass, cross-line moves fail
    assert compare_std_outputs("b a\nd c\n", "a b\nc d")
    assert not compare_std_outputs("c a\nd b\n", "a b\nc d")
    # empty output only matches empty/whitespace expectation
    assert compare_std_outputs("", "")
    assert compare_std_outputs("\n", "  ")
    assert not compare_std_outputs("", "x")
    # exponent notation matches through float parsing
    assert compare_std_outputs("1e3\n", "1000")
    # nan never satisfies tolerance (isclose(nan, nan) is False)
    assert not compare_std_outputs("nan\n", "nan2x")


def test_judge_multi_solution_last_block_wins():
    # judge.py:753 uses code_blocks[-1]: an earlier broken block must not
    # poison a later correct one
    resp = (
        "first try:\n```python\ndef broken(:\n```\n"
        "fixed:\n```python\nimport sys\nprint(int(sys.stdin.read()) * 2)\n```"
    )
    assert judge_one(resp, T_OK, timeout_s=5) == (True, "", 1, 1)


def test_judge_stdin_list_inputs_joined():
    # judge.py:421-424: list-shaped inputs join with newlines before stdin
    code = (
        "```python\nimport sys\nlines = sys.stdin.read().split()\n"
        "print(int(lines[0]) + int(lines[1]))\n```"
    )
    t = json.dumps({"inputs": [["20", "22"]], "outputs": ["42"]})
    assert judge_one(code, t, timeout_s=5) == (True, "", 1, 1)


def test_cpu_rlimit_tracks_requested_timeout():
    """ADVICE r5: RLIMIT_CPU must scale with the caller's timeout_s, not
    the module default — a 5 s fixed cap SIGKILLs longer correct runs.
    Probe the limit in a child process (setting it in-process would cap
    the test runner itself)."""
    import subprocess
    import sys

    probe = (
        "from open_thoughts_spark.operators.code_judge import _set_limits\n"
        "import resource\n"
        "_set_limits(30.5)\n"
        "print(resource.getrlimit(resource.RLIMIT_CPU)[0])\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", probe], capture_output=True, text=True, cwd="."
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "32"  # ceil(30.5) + 1


# --- compare-ladder fuzz (VERDICT r5 #7) -----------------------------------
# Property tests over generated cases for the deterministic ladder subset
# (judge.py:484-617 / :276-388 semantics): float formats, blank-line noise,
# token reorder, tuple/list normalization, singleton unwrap.

from hypothesis import given, settings
from hypothesis import strategies as st

from open_thoughts_spark.operators.code_judge import (
    compare_cb_result,
    compare_std_outputs,
)

_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=6
)
_line = st.lists(_word, min_size=1, max_size=5).map(" ".join)
_lines = st.lists(_line, min_size=1, max_size=6)


@settings(max_examples=60, deadline=None)
@given(_lines, st.randoms(use_true_random=False))
def test_fuzz_std_blank_line_and_padding_noise_matches(lines, rnd):
    """Rung 2: per-line strip + blank-line drop — any padding/blank noise
    around the same lines must still compare equal."""
    expected = "\n".join(lines)
    noisy = []
    for ln in lines:
        if rnd.random() < 0.5:
            noisy.append("")
        noisy.append(" " * rnd.randint(0, 3) + ln + "\t" * rnd.randint(0, 2))
    noisy.append("\n" * rnd.randint(0, 2))
    assert compare_std_outputs("\n".join(noisy), expected)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=8,
    ),
    st.randoms(use_true_random=False),
)
def test_fuzz_std_float_formats_within_tolerance_match(vals, rnd):
    """Rung 3: same numbers, different renderings (precision, exponent
    notation, relative jitter inside 1e-5) compare equal."""
    expected = " ".join(repr(v) for v in vals)
    fmts = ["{:.9f}", "{:.7e}", "{:.10g}"]
    got = " ".join(
        fmts[rnd.randrange(len(fmts))].format(v * (1 + 1e-7)) for v in vals
    )
    assert compare_std_outputs(got, expected)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(min_value=1.0, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=0, max_value=5),
)
def test_fuzz_std_float_clearly_off_rejects(vals, idx):
    """A value off by 1% (far beyond rel 1e-5) must fail every rung —
    including the token-set rung, since the rendered text differs."""
    expected = " ".join(repr(v) for v in vals)
    bad = list(vals)
    i = idx % len(bad)
    bad[i] = bad[i] * 1.01 + 1.0
    got = " ".join(repr(v) for v in bad)
    assert not compare_std_outputs(got, expected)


@settings(max_examples=60, deadline=None)
@given(_lines, st.randoms(use_true_random=False))
def test_fuzz_std_per_line_token_reorder_matches(lines, rnd):
    """Rung 4/5: tokens shuffled WITHIN each line compare equal (unordered
    per-line set semantics)."""
    expected = "\n".join(lines)
    shuffled = []
    for ln in lines:
        toks = ln.split()
        rnd.shuffle(toks)
        shuffled.append(" ".join(toks))
    assert compare_std_outputs("\n".join(shuffled), expected)


@settings(max_examples=60, deadline=None)
@given(_lines, st.randoms(use_true_random=False))
def test_fuzz_std_novel_token_rejects(lines, rnd):
    """Injecting a token that appears nowhere in the expected line must
    fail: it changes the line's token set and every stricter rung."""
    expected = "\n".join(lines)
    i = rnd.randrange(len(lines))
    mutated = list(lines)
    mutated[i] = mutated[i] + " zzznovel"
    assert not compare_std_outputs("\n".join(mutated), expected)


@settings(max_examples=60, deadline=None)
@given(_lines)
def test_fuzz_std_list_expected_equivalent_to_joined(lines):
    """A list-typed expected value compares exactly like its newline-join
    (the reference feeds both shapes)."""
    got = "\n".join(lines)
    assert compare_std_outputs(got, lines)
    assert compare_std_outputs(got, "\n".join(lines))


_json_scalar = st.one_of(
    st.integers(min_value=-10**9, max_value=10**9),
    st.text(alphabet="abcxyz", max_size=5),
    st.booleans(),
)
_json_value = st.one_of(
    _json_scalar, st.lists(_json_scalar, max_size=5)
)


@settings(max_examples=80, deadline=None)
@given(_json_value)
def test_fuzz_cb_roundtrip_and_singleton_unwrap(v):
    """Parsed-value equality survives a JSON round trip, and a singleton
    wrapping on either side still matches (judge.py:360 outputs[0] rung)."""
    import json as _json

    assert compare_cb_result(_json.dumps(v), v)
    assert compare_cb_result(_json.dumps([v]), v)
    assert compare_cb_result(_json.dumps(v), [v])


@settings(max_examples=60, deadline=None)
@given(st.lists(_json_scalar, min_size=1, max_size=5))
def test_fuzz_cb_tuple_expected_normalized(items):
    """Ground-truth tuples compare as lists (judge.py:355-357)."""
    import json as _json

    assert compare_cb_result(_json.dumps(items), tuple(items))


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=6,
    )
)
def test_fuzz_cb_float_jitter_matches_and_offset_rejects(vals):
    import json as _json

    jittered = [v * (1 + 1e-7) for v in vals]
    assert compare_cb_result(_json.dumps(jittered), vals)
    off = [v * 1.01 + 1.0 for v in vals]
    assert not compare_cb_result(_json.dumps(off), vals)
