"""Source-hash fingerprints for registered queries (verification freshness).

The driver's per-round correctness sample is capped, so the registry sorts
never-verified queries first (``registry._driver_verified_names``). Round 7
exposed a hole: a query whose *definition changed* kept its stale green row
from an earlier round and sorted last, so the driver never re-checked the
new semantics (VERDICT r7 "What's wrong" #1 — ``dedup_simhash``).

Fix: a green row in round N only counts as "verified" if the query's source
fingerprint TODAY equals its fingerprint at round N (recorded in
``tools/verified_query_hashes.json`` by ``tools/update_verified_hashes.py``,
which reconstructs each round's code state from git history). An edited
query's fingerprint drifts, its old green rows stop counting, and it
re-sorts first for the next driver sample.

The fingerprint of a query covers the TRANSITIVE closure of its
package-internal call graph, resolved statically:

- the decorated function's own source, INCLUDING the ``@query(...)``
  decorator call (so oracle-SQL edits also invalidate);
- every top-level function/class/assignment it references — in its own
  module or imported from another module of this package — and,
  recursively, everything THOSE reference (cycle-guarded): the r7
  ``max_hamming`` default change (one level down) and a drifted helper
  two levels down (``_shingle_table`` under ``minhash_lsh_pairs``) both
  invalidate their callers;
- ``from ..x import mod``-style module references fall back to a hash of
  the whole module text (rare; symbol imports dominate).

Everything here is pure-static (``ast`` over file text, no imports
executed) so the exact same extraction runs against the current tree and
against ``git show <rev>:<path>`` snapshots of past rounds.
"""

from __future__ import annotations

import ast
import hashlib
from pathlib import Path

PACKAGE = "data_pipeline_challenge_spark"
# plans/registry.py is deliberately NOT a dependency: every query references
# the ``query`` decorator, so including it would invalidate the whole
# inventory on any registry plumbing change (e.g. this very feature).
_EXCLUDED_DEPS = {"plans/registry.py"}


def _segment(lines: list[str], node: ast.AST) -> str:
    """Source segment for a top-level node, including its decorators."""
    start = node.lineno
    for deco in getattr(node, "decorator_list", []):
        start = min(start, deco.lineno)
    return "\n".join(lines[start - 1 : node.end_lineno])


class _Module:
    """Parsed view of one package module: top-level definitions (name →
    (node, source)) and the import map (local name → (dep_module_path,
    symbol-or-None))."""

    def __init__(self, relpath: str, text: str) -> None:
        self.relpath = relpath
        self.ok = True
        try:
            self.tree = ast.parse(text)
        except SyntaxError:
            self.ok = False
            self.tree = None
        self.text = text
        self.defs: dict[str, tuple[ast.AST, str]] = {}
        self.imports: dict[str, tuple[str, str | None]] = {}
        if not self.ok:
            return
        lines = text.splitlines()
        for node in self.tree.body:
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
            ):
                self.defs[node.name] = (node, _segment(lines, node))
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                targets = (
                    node.targets if isinstance(node, ast.Assign) else [node.target]
                )
                for tgt in targets:
                    if isinstance(tgt, ast.Name):
                        self.defs[tgt.id] = (node, _segment(lines, node))
        for node in ast.walk(self.tree):
            if not isinstance(node, ast.ImportFrom):
                continue
            dep: str | None
            if node.level and node.level > 0:
                dep = _resolve_relative(relpath, node.level, node.module)
            elif node.module and node.module.split(".")[0] == PACKAGE:
                dep = "/".join(node.module.split(".")[1:])
            else:
                continue
            if dep is None:
                continue
            for alias in node.names:
                local = alias.asname or alias.name
                self.imports[local] = (dep, alias.name)


def _resolve_relative(module_relpath: str, level: int, module: str | None) -> str | None:
    """Resolve a relative import to a package-relative module path (no
    extension), e.g. ``operators/dedup``; None for out-of-package."""
    parts = module_relpath.split("/")[:-1]  # containing package, e.g. ['plans']
    up = level - 1
    if up > len(parts):
        return None
    base = parts[: len(parts) - up]
    mod_parts = (module or "").split(".") if module else []
    return "/".join(base + mod_parts)


def _referenced_names(node: ast.AST) -> tuple[set[str], set[tuple[str, str]]]:
    """Names and (module_alias, attr) pairs referenced inside a node."""
    plain: set[str] = set()
    attrs: set[tuple[str, str]] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load):
            plain.add(n.id)
        elif isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            attrs.add((n.value.id, n.attr))
    return plain, attrs


def _is_query_decorator(deco: ast.expr) -> str | None:
    """Return the query name if ``deco`` is ``query("name", ...)``."""
    if not isinstance(deco, ast.Call):
        return None
    func = deco.func
    fname = func.id if isinstance(func, ast.Name) else (
        func.attr if isinstance(func, ast.Attribute) else None
    )
    if fname != "query" or not deco.args:
        return None
    first = deco.args[0]
    if isinstance(first, ast.Constant) and isinstance(first.value, str):
        return first.value
    return None


class _Resolver:
    """Transitive source collector over the parsed-module cache."""

    def __init__(self, files: dict[str, str]) -> None:
        self.files = files
        self._modules: dict[str, _Module | None] = {}

    def module(self, dep_path: str) -> _Module | None:
        """Module for a package-relative path WITHOUT extension."""
        for candidate in (f"{dep_path}.py", f"{dep_path}/__init__.py"):
            if candidate in _EXCLUDED_DEPS:
                return None
            if candidate not in self._modules:
                text = self.files.get(candidate)
                self._modules[candidate] = (
                    _Module(candidate, text) if text is not None else None
                )
            mod = self._modules[candidate]
            if mod is not None:
                return mod
        return None

    def collect(self, mod: _Module, symbol: str, out: set[str], seen: set) -> None:
        """Add ``symbol``'s source from ``mod`` plus everything it
        transitively references inside the package."""
        key = (mod.relpath, symbol)
        if key in seen:
            return
        seen.add(key)
        entry = mod.defs.get(symbol)
        if entry is None:
            # Re-exported or module-level-unresolvable symbol: module it
            # may live in as a submodule, else whole-module hash.
            base = mod.relpath[: -len("/__init__.py")] if mod.relpath.endswith(
                "/__init__.py"
            ) else mod.relpath[: -len(".py")]
            sub = self.module(f"{base}/{symbol}")
            if sub is not None:
                out.add(
                    f"# {sub.relpath} (module)\nsha256:"
                    + hashlib.sha256(sub.text.encode()).hexdigest()
                )
            else:
                out.add(
                    f"# {mod.relpath}:{symbol} (unresolved)\nsha256:"
                    + hashlib.sha256(mod.text.encode()).hexdigest()
                )
            return
        node, src = entry
        out.add(f"# {mod.relpath}:{symbol}\n{src}")
        self._collect_refs(mod, node, out, seen, skip_self=symbol)

    def _collect_refs(
        self, mod: _Module, node: ast.AST, out: set[str], seen: set, skip_self: str
    ) -> None:
        plain, attrs = _referenced_names(node)
        for name in plain:
            if name == skip_self:
                continue
            if name in mod.imports:
                dep_path, dep_symbol = mod.imports[name]
                dep_mod = self.module(dep_path)
                if dep_mod is None:
                    # Could be ``from ..pkg.sub import x`` where pkg/sub.py
                    # resolves; module() already tried .py and __init__.
                    continue
                if dep_symbol is None:
                    out.add(
                        f"# {dep_mod.relpath} (module)\nsha256:"
                        + hashlib.sha256(dep_mod.text.encode()).hexdigest()
                    )
                else:
                    self.collect(dep_mod, dep_symbol, out, seen)
            elif name in mod.defs:
                self.collect(mod, name, out, seen)
        for alias, attr in attrs:
            if alias in mod.imports:
                dep_path, dep_symbol = mod.imports[alias]
                # ``from ..operators import dedup`` → alias IS a module:
                # resolve attr inside it.
                target = (
                    f"{dep_path}/{dep_symbol}" if dep_symbol is not None else dep_path
                )
                sub = self.module(target)
                if sub is not None and attr in sub.defs:
                    self.collect(sub, attr, out, seen)


def query_hashes(files: dict[str, str]) -> dict[str, str]:
    """query name -> sha256 fingerprint, from package-relative file texts.

    ``files`` maps package-relative paths (``plans/text.py``,
    ``operators/dedup.py``) to their source text. Only ``plans/*.py``
    modules are scanned for ``@query`` registrations; everything else is
    dependency material for the transitive closure."""
    out: dict[str, str] = {}
    resolver = _Resolver(files)
    for relpath in sorted(files):
        if not relpath.startswith("plans/") or relpath.count("/") != 1:
            continue
        if relpath in _EXCLUDED_DEPS or relpath.endswith("__init__.py"):
            continue
        mod = resolver.module(relpath[: -len(".py")])
        if mod is None or not mod.ok:
            continue
        lines = mod.text.splitlines()
        for node in mod.tree.body:
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            qname = None
            for deco in node.decorator_list:
                qname = _is_query_decorator(deco)
                if qname:
                    break
            if not qname:
                continue
            fn_src = _segment(lines, node)
            dep_srcs: set[str] = set()
            seen: set = {(mod.relpath, node.name)}
            resolver._collect_refs(mod, node, dep_srcs, seen, skip_self=node.name)
            payload = "\n@@\n".join([fn_src] + sorted(dep_srcs))
            out[qname] = hashlib.sha256(payload.encode()).hexdigest()
    return out


def read_package_files(package_dir: str | Path | None = None) -> dict[str, str]:
    """Package-relative path -> text for every .py in the current tree."""
    root = Path(package_dir) if package_dir else Path(__file__).resolve().parents[1]
    files: dict[str, str] = {}
    for p in root.rglob("*.py"):
        try:
            files[str(p.relative_to(root))] = p.read_text()
        except OSError:
            continue
    return files


def current_query_hashes() -> dict[str, str]:
    return query_hashes(read_package_files())
