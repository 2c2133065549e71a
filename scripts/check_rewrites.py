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
2. extracts the query's module sources at that commit,
3. compares the query's AST SLICE — the registered function plus the
   transitive closure of the top-level helpers, constants, and
   PACKAGE-INTERNAL imports it references — docstring-stripped, so
   comments, formatting, prose, and edits to UNRELATED queries don't
   flag; any code change on the query's own dependency path does, and
4. FAILS (exit 1) if the slice changed but the query is not listed in
   ``_REWRITTEN_IN_ROUND`` with a round newer than the record.

Cross-module scope (r10 VERDICT item 4 / ADVICE): the slice FOLLOWS
package-internal imports — ``from pkg.tables import t`` pulls ``t``'s
slice from tables.py; a module imported and used via attribute access
(``money.price_cents(...)``) pulls exactly the accessed attributes; a
module used any other way is included whole (conservative). The r10
memory-sink rewrite lived in streaming/replay.py — OUTSIDE the 13
affected queries' defining modules — and the r10 slicer couldn't see
it; this one does (tests/test_check_rewrites.py re-detects it on the
real r9→r10 history). Import STATEMENTS are part of the slice too, so
rebinding a name to a different module (``from textutil import norm``
→ another module's ``norm``) flags even when the call site is
unchanged (r10 ADVICE item 5).

Exclusion: registry.py is bookkeeping (query ordering, rewrite
metadata), not execution semantics — following the ``@query`` decorator
into it would flag all ~186 queries every time the round list updates,
destroying the gate's signal. Its import statement still contributes to
each slice; its body does not.

Usage: python scripts/check_rewrites.py            # gate (exit 1 on miss)
       python scripts/check_rewrites.py --list     # show per-query status
       python scripts/check_rewrites.py --when Q.. # date a rewrite
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PKG = "muurschilderingendatabase_etl_spark"
# Bookkeeping modules whose bodies are excluded from slice recursion
# (their import statements still appear in slices — see module doc).
EXCLUDE_MODULES = {f"{PKG}/registry.py"}


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


def _pkg_of(relpath: str) -> str:
    """Dotted package containing the module at ``relpath``
    (``pkg/queries/x.py`` -> ``pkg.queries``; an ``__init__.py`` IS its
    package)."""
    parts = relpath[:-3].split("/")  # drop .py
    # __init__.py and plain modules resolve identically: dropping the
    # final segment yields the package for an __init__ (its package IS
    # the directory) and the containing package for a plain module.
    return ".".join(parts[:-1])


def _module_relpaths(dotted: str) -> list[str]:
    p = dotted.replace(".", "/")
    return [p + ".py", p + "/__init__.py"]


class _Mod:
    """Parsed module: top-level definitions and import bindings."""

    def __init__(self, relpath: str, source: str):
        self.relpath = relpath
        self.tree = _strip_docstrings(ast.parse(source))
        self.top: dict[str, ast.AST] = {}
        # bound name -> (stmt_dump, dotted_module|None, original_name|None)
        # dotted_module None => external/unresolvable; original_name None
        # with a dotted_module => the binding IS that module object.
        self.imp: dict[str, tuple[str, str | None, str | None]] = {}
        for node in self.tree.body:
            self._bind(node)

    def _bind(self, node: ast.AST) -> None:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            self.top[node.name] = node
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    self.top[tgt.id] = node
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            self.top[node.target.id] = node
        elif isinstance(node, (ast.Import, ast.ImportFrom)):
            for name, binding in _import_bindings(node, self.relpath).items():
                self.imp[name] = binding


def _import_bindings(
    node: ast.Import | ast.ImportFrom, relpath: str
) -> dict[str, tuple[str, str | None, str | None]]:
    """Map of names bound by an import statement to
    ``(stmt_dump, dotted_target_module | None, original_name | None)``."""
    dump = ast.dump(node)
    out: dict[str, tuple[str, str | None, str | None]] = {}
    if isinstance(node, ast.Import):
        for a in node.names:
            if a.asname:
                dotted = a.name if a.name.startswith(PKG) else None
                out[a.asname] = (dump, dotted, None)
            else:
                # `import a.b` binds only `a`; a bare internal package
                # object is too broad to follow — keep the stmt dump.
                out[a.name.split(".")[0]] = (dump, None, None)
        return out
    # ImportFrom: resolve relative levels against this module's package.
    if node.level:
        base = _pkg_of(relpath).split(".")
        # level=1 -> current package, each extra level -> one parent up
        if node.level - 1 > 0:
            base = base[: -(node.level - 1)] or [""]
        dotted_base = ".".join(base)
        dotted = f"{dotted_base}.{node.module}" if node.module else dotted_base
    else:
        dotted = node.module or ""
    internal = dotted.startswith(PKG)
    for a in node.names:
        bound = a.asname or a.name
        out[bound] = (dump, dotted if internal else None, a.name)
    return out


class Slicer:
    """Cross-module AST slicer over a source provider (working tree or a
    git commit), so old and new slices are computed identically."""

    def __init__(self, get_source):
        self._get_source = get_source
        self._mods: dict[str, _Mod | None] = {}

    def module(self, relpath: str) -> _Mod | None:
        if relpath not in self._mods:
            src = self._get_source(relpath)
            if src is None:
                self._mods[relpath] = None
            else:
                try:
                    self._mods[relpath] = _Mod(relpath, src)
                except SyntaxError:
                    self._mods[relpath] = None
        return self._mods[relpath]

    def _resolve_module(self, dotted: str) -> str | None:
        for cand in _module_relpaths(dotted):
            if self.module(cand) is not None:
                return cand
        return None

    def _resolve_from(
        self, dotted: str, name: str | None
    ) -> tuple[str, str | None] | None:
        """Resolve ``from <dotted> import <name>`` to a frontier item
        ``(relpath, symbol|None)``; None => not package-internal."""
        if not dotted.startswith(PKG):
            return None
        if name is None:  # the module object itself
            rel = self._resolve_module(dotted)
            return (rel, None) if rel else None
        rel = self._resolve_module(dotted)
        if rel is not None:
            mod = self.module(rel)
            if mod is not None and (name in mod.top or name in mod.imp):
                return (rel, name)
        # not a symbol of the module: maybe a submodule
        sub = self._resolve_module(f"{dotted}.{name}")
        if sub is not None:
            return (sub, None)
        return (rel, name) if rel else None

    def slice(self, entry_relpath: str, fn_name: str) -> str | None:
        entry = self.module(entry_relpath)
        if entry is None or fn_name not in entry.top:
            return None
        parts: set[str] = set()
        seen: set[tuple[str, str | None]] = set()
        frontier: list[tuple[str, str | None]] = [(entry_relpath, fn_name)]
        while frontier:
            relpath, name = frontier.pop()
            if (relpath, name) in seen or relpath in EXCLUDE_MODULES:
                continue
            seen.add((relpath, name))
            mod = self.module(relpath)
            if mod is None:
                parts.add(f"{relpath}§{name}§<missing-module>")
                continue
            if name is None:
                # whole module (conservative: imported as an object and
                # used beyond attribute access) — body only, no recursion
                parts.add(
                    f"{relpath}§<module>§"
                    + "\n".join(ast.dump(n) for n in mod.tree.body)
                )
                continue
            if name in mod.top:
                node = mod.top[name]
                parts.add(f"{relpath}§{name}§{ast.dump(node)}")
                self._walk(node, mod, parts, frontier)
            elif name in mod.imp:
                self._follow_import(mod.imp[name], relpath, name, parts, frontier)
            else:
                parts.add(f"{relpath}§{name}§<unresolved>")
        return "\n".join(sorted(parts))

    def _follow_import(
        self,
        binding: tuple[str, str | None, str | None],
        relpath: str,
        name: str,
        parts: set[str],
        frontier: list[tuple[str, str | None]],
    ) -> None:
        dump, dotted, orig = binding
        # the import STATEMENT is part of the slice: rebinding a name to
        # a different source module flags even with unchanged call sites
        parts.add(f"{relpath}§import:{name}§{dump}")
        if dotted is None:
            return
        target = self._resolve_from(dotted, orig)
        if target is not None:
            frontier.append(target)

    def _walk(
        self,
        node: ast.AST,
        mod: _Mod,
        parts: set[str],
        frontier: list[tuple[str, str | None]],
    ) -> None:
        # local (function-body) import bindings shadow module top-level
        local_imp: dict[str, tuple[str, str | None, str | None]] = {}
        for sub in ast.walk(node):
            if isinstance(sub, (ast.Import, ast.ImportFrom)):
                local_imp.update(_import_bindings(sub, mod.relpath))
        # attribute-usage census: a module-alias used ONLY as `alias.attr`
        # pulls just those attrs; any other use pulls the whole module
        attr_uses: dict[str, set[str]] = {}
        attr_counts: dict[str, int] = {}
        name_counts: dict[str, int] = {}
        for sub in ast.walk(node):
            if isinstance(sub, ast.Attribute) and isinstance(sub.value, ast.Name):
                attr_uses.setdefault(sub.value.id, set()).add(sub.attr)
                attr_counts[sub.value.id] = attr_counts.get(sub.value.id, 0) + 1
            if isinstance(sub, ast.Name):
                name_counts[sub.id] = name_counts.get(sub.id, 0) + 1
        for nm in sorted(name_counts):
            binding = local_imp.get(nm) or mod.imp.get(nm)
            if binding is None:
                if nm in mod.top:
                    frontier.append((mod.relpath, nm))
                continue
            # name also defined at top level AND imported locally: the
            # local import wins inside this node (checked first above)
            dump, dotted, orig = binding
            if dotted is not None and orig is None:
                # binding IS an internal module object
                if name_counts[nm] == attr_counts.get(nm, 0):
                    rel = self._resolve_module(dotted)
                    parts.add(f"{mod.relpath}§import:{nm}§{dump}")
                    if rel is None:
                        continue
                    for attr in sorted(attr_uses.get(nm, ())):
                        frontier.append((rel, attr))
                else:
                    parts.add(f"{mod.relpath}§import:{nm}§{dump}")
                    rel = self._resolve_module(dotted)
                    if rel is not None:
                        frontier.append((rel, None))
            elif dotted is not None and orig is not None:
                maybe_mod = self._resolve_from(dotted, orig)
                if (
                    maybe_mod is not None
                    and maybe_mod[1] is None
                    and name_counts[nm] == attr_counts.get(nm, 0)
                ):
                    # `from pkg.queries import money` style submodule
                    # import, used only via attributes
                    parts.add(f"{mod.relpath}§import:{nm}§{dump}")
                    for attr in sorted(attr_uses.get(nm, ())):
                        frontier.append((maybe_mod[0], attr))
                else:
                    self._follow_import(binding, mod.relpath, nm, parts, frontier)
            else:
                # external import: the statement dump alone
                parts.add(f"{mod.relpath}§import:{nm}§{dump}")


def repo_provider():
    def get_source(relpath: str) -> str | None:
        path = os.path.join(ROOT, relpath)
        if not os.path.isfile(path):
            return None
        with open(path) as fh:
            return fh.read()

    return get_source


def commit_provider(commit: str):
    cache: dict[str, str | None] = {}

    def get_source(relpath: str) -> str | None:
        if relpath not in cache:
            cache[relpath] = module_source_at(commit, relpath)
        return cache[relpath]

    return get_source


def query_slice(
    source: str,
    fn_name: str,
    relpath: str = "<module>.py",
    get_source=None,
) -> str | None:
    """Slice of ``fn_name`` in a module given as a source string —
    single-module entry point kept for tests; cross-module resolution
    uses ``get_source`` when provided (defaults to nothing-else-exists,
    which reproduces the module-local r10 behavior plus import-statement
    capture)."""
    provider = get_source or (lambda _p: None)

    def combined(p: str) -> str | None:
        if p == relpath:
            return source
        return provider(p)

    return Slicer(combined).slice(relpath, fn_name)


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

    commit_cache: dict[int, str | None] = {}
    old_slicers: dict[str, Slicer] = {}
    new_slicer = Slicer(repo_provider())

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
        if commit not in old_slicers:
            old_slicers[commit] = Slicer(commit_provider(commit))
        fn_name = queries[name].__name__
        old_slice = old_slicers[commit].slice(relpath, fn_name)
        new_slice = new_slicer.slice(relpath, fn_name)
        changed = old_slice is None or old_slice != new_slice
        listed = registry._REWRITTEN_IN_ROUND.get(name, 0) > rnd
        if changed and not listed:
            violations.append(
                f"{name}: its code slice (root {relpath}) changed since its "
                f"r{rnd} external record (commit {commit[:9]}) but it is not "
                f"listed in _REWRITTEN_IN_ROUND"
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
    current = Slicer(repo_provider()).slice(relpath, fn.__name__)
    rounds = sorted(
        int(m.group(1))
        for f in os.listdir(ROOT)
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))
    )
    for rnd in rounds:
        commit = record_commit(rnd)
        if commit is None:
            continue
        if Slicer(commit_provider(commit)).slice(relpath, fn.__name__) == current:
            return rnd
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
