#!/usr/bin/env python
"""Round-close gate: no query may be rewritten after its latest external
record without being listed in ``registry._REWRITTEN_IN_ROUND``.

The rewrite-recency tier (registry.py) demotes externally-verified
queries whose implementation changed after their last driver check, so
the next driver window re-verifies the NEW code first. That tier is
hand-curated, which is the same stale-risk class as the r5
``_DRIVER_CHECKED`` frozenset (r9 VERDICT item 4). This script is the
mechanization: for every query whose latest external record is a full
verified pass (tier 3), it

1. finds the commit that recorded that pass (last commit touching the
   round's ``CORRECTNESS_r*.json`` artifact),
2. extracts the query's defining module source at that commit,
3. compares the query's AST SLICE — the registered function plus the
   transitive closure of same-module top-level helpers and constants it
   references — docstring-stripped, so comments, formatting, prose, and
   edits to UNRELATED queries in the same module don't flag; any code
   change on the query's own dependency path does, and
4. FAILS (exit 1) if the slice changed but the query is not listed in
   ``_REWRITTEN_IN_ROUND`` with a round newer than the record.

Per-query slicing (not whole-module diff) is what makes this usable:
multi-query modules like dedup.py are edited most rounds, and a module-
level check would re-flag all ~10 resident queries on every edit — the
exact failure the hand-curated list was avoiding. Scope note
(documented limitation): the slice stops at the defining module's
boundary. A behavior change in a shared helper MODULE (textutil.py,
distributed.py, ...) will not flag the queries that import it — the
curator still owns those, as before.

Usage: python scripts/check_rewrites.py            # gate (exit 1 on miss)
       python scripts/check_rewrites.py --list     # show per-query status
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            body = getattr(node, "body", [])
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                node.body = body[1:] or [ast.Pass()]
    return tree


def query_slice(source: str, fn_name: str) -> str | None:
    """Docstring-stripped AST dump of ``fn_name`` plus every same-module
    top-level definition (helper function, class, constant) it references,
    transitively — the "did THIS query's code change" key.

    Returns None if the function doesn't exist in this version of the
    module (treated as changed by the caller). Decorators are part of the
    FunctionDef node, so an oracle-builder helper referenced from
    ``@query(..., oracle=_helper())`` is pulled into the slice too.
    """
    tree = _strip_docstrings(ast.parse(source))
    top: dict[str, ast.AST] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            top[node.name] = node
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    top[tgt.id] = node
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            top[node.target.id] = node
    if fn_name not in top:
        return None
    seen: set[str] = set()
    frontier = [fn_name]
    while frontier:
        name = frontier.pop()
        if name in seen:
            continue
        seen.add(name)
        for ref in ast.walk(top[name]):
            if isinstance(ref, ast.Name) and ref.id in top and ref.id not in seen:
                frontier.append(ref.id)
    return "\n".join(ast.dump(top[n]) for n in sorted(seen))


def record_commit(round_no: int) -> str | None:
    """Commit hash of the last change to the round's CORRECTNESS artifact."""
    pat = re.compile(rf"CORRECTNESS_r0*{round_no}\.json$")
    for fname in sorted(os.listdir(ROOT)):
        if pat.search(fname):
            out = subprocess.run(
                ["git", "log", "-n1", "--format=%H", "--", fname],
                cwd=ROOT,
                capture_output=True,
                text=True,
            )
            commit = out.stdout.strip()
            return commit or None
    return None


def module_source_at(commit: str, relpath: str) -> str | None:
    out = subprocess.run(
        ["git", "show", f"{commit}:{relpath}"],
        cwd=ROOT,
        capture_output=True,
        text=True,
    )
    return out.stdout if out.returncode == 0 else None


def scan() -> tuple[list[str], list[str]]:
    """Return (violations, report_lines)."""
    from muurschilderingendatabase_etl_spark import registry

    registry.load_all()
    last = registry._last_verified_round()
    queries = registry.all_queries()

    # Resolve each query's defining module to a repo-relative file path.
    import importlib

    mod_path: dict[str, str] = {}
    for name, fn in queries.items():
        mod = importlib.import_module(fn.__module__)
        mod_path[name] = os.path.relpath(mod.__file__, ROOT)

    # One git lookup per round / per (commit, module) pair, not per query.
    commit_cache: dict[int, str | None] = {}
    old_src_cache: dict[tuple[str, str], str | None] = {}
    new_src_cache: dict[str, str] = {}

    violations: list[str] = []
    lines: list[str] = []
    for name in sorted(queries):
        tier, rnd = last.get(name, (0, 0))
        if tier != 3:
            lines.append(f"  {name}: tier {tier} (already queued for re-check)")
            continue
        relpath = mod_path[name]
        commit = commit_cache.setdefault(rnd, record_commit(rnd))
        if commit is None:
            lines.append(f"  {name}: r{rnd} record commit not found — skipped")
            continue
        key = (commit, relpath)
        if key not in old_src_cache:
            old_src_cache[key] = module_source_at(commit, relpath)
        if relpath not in new_src_cache:
            with open(os.path.join(ROOT, relpath)) as fh:
                new_src_cache[relpath] = fh.read()
        fn_name = queries[name].__name__
        old_src = old_src_cache[key]
        try:
            old_slice = (
                query_slice(old_src, fn_name) if old_src is not None else None
            )
        except SyntaxError:
            old_slice = None
        new_slice = query_slice(new_src_cache[relpath], fn_name)
        changed = old_slice is None or old_slice != new_slice
        listed = registry._REWRITTEN_IN_ROUND.get(name, 0) > rnd
        if changed and not listed:
            violations.append(
                f"{name}: its code slice in {relpath} changed since its r{rnd} "
                f"external record (commit {commit[:9]}) but it is not listed "
                f"in _REWRITTEN_IN_ROUND"
            )
            lines.append(f"  {name}: VIOLATION (slice changed since r{rnd})")
        elif changed:
            lines.append(f"  {name}: rewritten after r{rnd}, listed — ok")
        else:
            lines.append(f"  {name}: unchanged since r{rnd} — ok")
    return violations, lines


def rewrite_round(name: str) -> int:
    """Earliest round R whose CORRECTNESS artifact commit already contains
    the query's CURRENT code slice — i.e. the round the last rewrite
    landed in (curation aid for ``_REWRITTEN_IN_ROUND``). Returns the
    current (yet-unrecorded) round number — max known round + 1 — if no
    committed round matches, i.e. the rewrite is uncommitted/new."""
    from muurschilderingendatabase_etl_spark import registry

    registry.load_all()
    import importlib

    fn = registry.all_queries()[name]
    mod = importlib.import_module(fn.__module__)
    relpath = os.path.relpath(mod.__file__, ROOT)
    with open(os.path.join(ROOT, relpath)) as fh:
        current = query_slice(fh.read(), fn.__name__)
    rounds = sorted(
        int(m.group(1))
        for f in os.listdir(ROOT)
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
    )
    for rnd in rounds:
        commit = record_commit(rnd)
        if commit is None:
            continue
        src = module_source_at(commit, relpath)
        if src is None:
            continue
        try:
            if query_slice(src, fn.__name__) == current:
                return rnd
        except SyntaxError:
            continue
    return (rounds[-1] if rounds else 0) + 1


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--when":
        for name in argv[1:]:
            print(f"{name}: current slice first present in round {rewrite_round(name)}")
        return
    violations, lines = scan()
    if "--list" in argv:
        print("\n".join(lines))
    if violations:
        print("UNLISTED REWRITES (add to registry._REWRITTEN_IN_ROUND):")
        for v in violations:
            print(f"  {v}")
        sys.exit(1)
    print(f"check_rewrites: OK ({len(lines)} queries scanned, 0 unlisted rewrites)")


if __name__ == "__main__":
    main()
