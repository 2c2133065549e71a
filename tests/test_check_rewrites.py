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
