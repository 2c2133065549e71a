"""Unit tests for the mechanized rewrite detector (scripts/check_rewrites.py,
r9 VERDICT item 4): the per-query AST slice must flag real code changes on
the query's own dependency path and stay quiet on comments, docstrings,
formatting, and edits to unrelated queries in the same module.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from check_rewrites import query_slice  # noqa: E402

MOD_V1 = '''
"""module doc"""
LIMIT = 10

def _helper(x):
    return x + LIMIT

def query_a(spark, sf):
    """doc a"""
    return _helper(1)

def query_b(spark, sf):
    return 2
'''

# comment/docstring/formatting edits only — must NOT change any slice
MOD_V1_COSMETIC = '''
"""rewritten module doc"""
LIMIT = 10  # new comment

def _helper(x):
    # explain the add
    return x + LIMIT

def query_a(spark, sf):
    """totally new docstring"""
    return _helper(1)


def query_b(spark, sf):
    return 2
'''

# unrelated query_b changed — query_a's slice must be stable
MOD_V2_B_ONLY = MOD_V1.replace("return 2", "return 3")

# helper changed — query_a's slice must flag, query_b's must not
MOD_V3_HELPER = MOD_V1.replace("return x + LIMIT", "return x * LIMIT")

# module-level constant used by the helper changed — transitive closure
MOD_V4_CONST = MOD_V1.replace("LIMIT = 10", "LIMIT = 99")


def test_cosmetic_edits_do_not_change_slice():
    assert query_slice(MOD_V1, "query_a") == query_slice(MOD_V1_COSMETIC, "query_a")
    assert query_slice(MOD_V1, "query_b") == query_slice(MOD_V1_COSMETIC, "query_b")


def test_unrelated_query_edit_does_not_change_slice():
    assert query_slice(MOD_V1, "query_a") == query_slice(MOD_V2_B_ONLY, "query_a")
    assert query_slice(MOD_V1, "query_b") != query_slice(MOD_V2_B_ONLY, "query_b")


def test_helper_edit_changes_only_dependent_slice():
    assert query_slice(MOD_V1, "query_a") != query_slice(MOD_V3_HELPER, "query_a")
    assert query_slice(MOD_V1, "query_b") == query_slice(MOD_V3_HELPER, "query_b")


def test_transitive_constant_edit_changes_slice():
    assert query_slice(MOD_V1, "query_a") != query_slice(MOD_V4_CONST, "query_a")
    assert query_slice(MOD_V1, "query_b") == query_slice(MOD_V4_CONST, "query_b")


def test_decorator_oracle_helper_is_in_slice():
    base = '''
def _oracle():
    return "SELECT 1"

def query(name, oracle):
    def deco(fn):
        return fn
    return deco

@query("q", oracle=_oracle())
def query_c(spark, sf):
    return 1
'''
    changed = base.replace('return "SELECT 1"', 'return "SELECT 2"')
    assert query_slice(base, "query_c") != query_slice(changed, "query_c")


def test_missing_function_returns_none():
    assert query_slice(MOD_V1, "query_zzz") is None


def test_no_duplicate_rewrite_keys():
    """_REWRITTEN_IN_ROUND is a dict LITERAL: Python silently keeps the
    last of duplicate keys, so an early stale entry resurrects if a
    later block is removed (r10 ADVICE item 1). Parse the literal and
    assert every key appears exactly once."""
    import ast

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(
        root, "muurschilderingendatabase_etl_spark", "registry.py"
    )
    with open(path) as fh:
        tree = ast.parse(fh.read())
    for node in tree.body:
        targets = (
            node.targets
            if isinstance(node, ast.Assign)
            else [node.target] if isinstance(node, ast.AnnAssign) else []
        )
        if any(
            isinstance(t, ast.Name) and t.id == "_REWRITTEN_IN_ROUND"
            for t in targets
        ):
            literal = node.value
            break
    else:
        raise AssertionError("_REWRITTEN_IN_ROUND literal not found")
    keys = [k.value for k in literal.keys if isinstance(k, ast.Constant)]
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate _REWRITTEN_IN_ROUND keys: {dupes}"


# --- cross-module slicing (r10 VERDICT item 4 / ADVICE item 5) ---

HELPER_V1 = '''
def norm(x):
    return x + 1
'''
HELPER_V2 = HELPER_V1.replace("x + 1", "x + 2")
OTHER_MOD = '''
def norm(x):
    return x * 7
'''
PKGNAME = "muurschilderingendatabase_etl_spark"
ENTRY_TOPLEVEL = f'''
from {PKGNAME}.textutil_fake import norm

def query_x(spark, sf):
    return norm(1)
'''
ENTRY_LOCAL = f'''
def query_x(spark, sf):
    from {PKGNAME}.textutil_fake import norm
    return norm(1)
'''
ENTRY_REBOUND = ENTRY_TOPLEVEL.replace("textutil_fake", "othermod_fake")
ENTRY_MODULE_ATTR = f'''
from {PKGNAME} import textutil_fake as tu

def query_x(spark, sf):
    return tu.norm(1)
'''


def _provider(files):
    return lambda p: files.get(p)


def test_cross_module_helper_body_change_flags():
    """A body change in an imported helper (ANOTHER module) changes the
    importer's slice — the r10 memory-sink class of rewrite, for both
    top-level and function-local import styles."""
    entry = f"{PKGNAME}/queries/q.py"
    helper = f"{PKGNAME}/textutil_fake.py"
    for entry_src in (ENTRY_TOPLEVEL, ENTRY_LOCAL):
        s1 = query_slice(
            entry_src, "query_x", entry, _provider({helper: HELPER_V1})
        )
        s2 = query_slice(
            entry_src, "query_x", entry, _provider({helper: HELPER_V2})
        )
        assert s1 != s2


def test_import_rebinding_flags_even_with_same_symbol_name():
    """Swapping WHICH module a name is imported from changes the slice
    even if the call site and both bodies are untouched (r10 ADVICE)."""
    entry = f"{PKGNAME}/queries/q.py"
    files = {
        f"{PKGNAME}/textutil_fake.py": HELPER_V1,
        f"{PKGNAME}/othermod_fake.py": HELPER_V1,
    }
    s1 = query_slice(ENTRY_TOPLEVEL, "query_x", entry, _provider(files))
    s2 = query_slice(ENTRY_REBOUND, "query_x", entry, _provider(files))
    assert s1 != s2


def test_module_attr_access_follows_only_used_attrs():
    """`from pkg import mod` + `mod.norm(...)` follows norm's slice (a
    body change flags) but an UNRELATED symbol added to the same module
    does not flag — attribute-level precision, not whole-module."""
    entry = f"{PKGNAME}/queries/q.py"
    helper = f"{PKGNAME}/textutil_fake.py"
    s1 = query_slice(
        ENTRY_MODULE_ATTR, "query_x", entry, _provider({helper: HELPER_V1})
    )
    s2 = query_slice(
        ENTRY_MODULE_ATTR, "query_x", entry, _provider({helper: HELPER_V2})
    )
    assert s1 != s2
    unrelated = HELPER_V1 + "\ndef other():\n    return 9\n"
    s3 = query_slice(
        ENTRY_MODULE_ATTR, "query_x", entry, _provider({helper: unrelated})
    )
    assert s1 == s3


def test_relative_import_resolves_within_package():
    entry = f"{PKGNAME}/queries/q.py"
    helper = f"{PKGNAME}/textutil_fake.py"
    src = """
from ..textutil_fake import norm

def query_x(spark, sf):
    return norm(1)
"""
    s1 = query_slice(src, "query_x", entry, _provider({helper: HELPER_V1}))
    s2 = query_slice(src, "query_x", entry, _provider({helper: HELPER_V2}))
    assert s1 != s2


def test_r10_replay_rewrite_detected_retroactively():
    """The r10 memory-sink -> foreachBatch rewrite lived in
    streaming/replay.py, outside streaming_windows.py — the module-local
    slicer missed it and the 13 queries were listed by hand. The
    cross-module slicer must see it on the REAL r9 -> r10 history."""
    from check_rewrites import Slicer, commit_provider, record_commit

    c9, c10 = record_commit(9), record_commit(10)
    if c9 is None or c10 is None:
        import pytest

        pytest.skip("round artifacts not in git history")
    rel = "muurschilderingendatabase_etl_spark/queries/streaming_windows.py"
    s9 = Slicer(commit_provider(c9)).slice(rel, "stream_tumbling_window")
    s10 = Slicer(commit_provider(c10)).slice(rel, "stream_tumbling_window")
    assert s9 is not None and s10 is not None
    assert s9 != s10, (
        "cross-module slicer failed to detect the r10 replay.py rewrite"
    )


def test_repo_gate_is_green():
    """The committed registry list must cover every rewrite the detector
    finds — this is the round-close gate, run as a test so it can't be
    forgotten."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "check_rewrites.py")],
        cwd=root,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_r11_rewrite_recall_on_real_history():
    """r11 VERDICT item 6: the gate's recall, regression-tested against
    known history. The r10 -> r11 diff contained exactly three rewrite
    events touching verified queries: the idempotent replay-sink rewrite
    (streaming/replay.py — OUT-OF-MODULE for all 13 replay-backed
    streaming queries, the class the cross-module slicer exists for) and
    the two perf fixes (cohesion broadcast hint, bloom single-literal).
    The slicer must flag all 15 on the real commits AND stay quiet on
    untouched queries (precision controls)."""
    from check_rewrites import Slicer, commit_provider, record_commit

    c10, c11 = record_commit(10), record_commit(11)
    if c10 is None or c11 is None:
        import pytest

        pytest.skip("round artifacts not in git history")
    pkg = "muurschilderingendatabase_etl_spark/queries"
    streaming = [
        "stream_late_data_drop", "stream_foreach_batch_sink",
        "stream_tumbling_window", "stream_sliding_window",
        "stream_session_window", "stream_watermark_append",
        "stream_dedup_stateful", "stream_dedup_within_watermark",
        "stream_static_join", "stream_stateful_user_stats",
        "stream_stream_join", "stream_transform_with_state",
        "stream_stream_outer_join",
    ]
    rewritten = [(q, f"{pkg}/streaming_windows.py") for q in streaming] + [
        ("similarity_label_cohesion", f"{pkg}/similarity.py"),
        ("contamination_bloom_prefilter", f"{pkg}/quality.py"),
    ]
    controls = [
        ("agg_min_max", f"{pkg}/aggregation.py"),
        ("join_left_anti", f"{pkg}/joins.py"),
        ("dedup_exact_hash", f"{pkg}/dedup.py"),
    ]
    s10, s11 = Slicer(commit_provider(c10)), Slicer(commit_provider(c11))
    missed = [
        q for q, rel in rewritten if s10.slice(rel, q) == s11.slice(rel, q)
    ]
    false_flags = [
        q for q, rel in controls if s10.slice(rel, q) != s11.slice(rel, q)
    ]
    assert not missed, f"gate recall regression — missed r11 rewrites: {missed}"
    assert not false_flags, f"gate precision regression — false flags: {false_flags}"
