#!/usr/bin/env python
"""Per-query implementation fingerprints (VERDICT r5 #1 — the
change-aware driver-check rotation).

For every registered query, compute a content fingerprint over
EVERYTHING its result can depend on, at SYMBOL granularity:

- the query function's own source, INCLUDING its ``@query`` decorator
  (the oracle SQL lives there);
- every module-level name the function or its decorator references,
  resolved through imports to its defining module and hashed by its
  OWN source segment — then recursively every name THOSE segments
  reference, across modules (a query calling operators.rollup's
  exact_kth depends on prefixsum helpers only if exact_kth actually
  references them);
- the registry plumbing (plans/registry.py), shared by every query.

Symbol granularity is the point: appending a NEW function to a shared
module must not flag every query that imports the module — only queries
whose actual call graph reaches changed code change fingerprint. When a
name cannot be resolved statically (a module alias passed around as a
value, ``getattr``, star imports), the tool falls back to hashing that
module file whole plus its transitive imports — conservative, never
unsound.

The analysis is PURE AST + file reads — no engine import — so it runs
identically against the working tree and against historical round
snapshots (git worktrees), which is what lets tools/update_driver_state.py
record "the fingerprint of query q as of the round the driver last
verified it". tests/test_registry_order.py then goes red if a query's
current fingerprint differs from its recorded one and the query is not
in the 50-slot checked prefix.

Deliberately NOT hashed: plans/__init__.py (prefix-rotation order — a
rotation must not flag every query) and test files.
"""

from __future__ import annotations

import ast
import hashlib
import os
from functools import lru_cache

PKG = "census_data_pipeline_spark"


def _module_file(repo_root: str, module: str) -> str | None:
    """Dotted module -> file path under repo_root, or None if external."""
    if not module.startswith(PKG):
        return None
    rel = module.replace(".", os.sep)
    for cand in (rel + ".py", os.path.join(rel, "__init__.py")):
        p = os.path.join(repo_root, cand)
        if os.path.isfile(p):
            return p
    return None


@lru_cache(maxsize=None)
def _read(path: str) -> str:
    with open(path, encoding="utf-8") as f:
        return f.read()


@lru_cache(maxsize=None)
def _file_sha(path: str) -> str:
    return hashlib.sha256(_read(path).encode()).hexdigest()


def _imports_of(nodes) -> dict[str, str]:
    """Import bindings among ``nodes``: bound name -> dotted target
    (package-internal only). ``from pkg.functions import text`` binds
    text -> pkg.functions.text (a module); ``from pkg.x.y import fn``
    binds fn -> pkg.x.y.fn (a symbol)."""
    out: dict[str, str] = {}
    for node in nodes:
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    out[(a.asname or a.name.split(".")[0])] = a.name
        elif isinstance(node, ast.ImportFrom) and node.module and \
                node.module.startswith(PKG):
            for a in node.names:
                out[(a.asname or a.name)] = f"{node.module}.{a.name}"
    return out


def _segment_with_decorators(src: str, node) -> str:
    lines = src.split("\n")
    start = node.lineno
    if getattr(node, "decorator_list", None):
        start = min([start] + [d.lineno for d in node.decorator_list])
    return "\n".join(lines[start - 1:node.end_lineno])


class _ModuleCtx:
    def __init__(self, repo_root: str, module: str, path: str):
        self.module = module
        self.path = path
        self.src = _read(path)
        self.tree = ast.parse(self.src, filename=path)
        self.imports = _imports_of(self.tree.body)
        self.defs: dict[str, str] = {}
        for node in self.tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                self.defs[node.name] = _segment_with_decorators(self.src, node)
            elif isinstance(node, ast.Assign):
                seg = ast.get_source_segment(self.src, node)
                for t in node.targets:
                    if isinstance(t, ast.Name) and seg is not None:
                        self.defs[t.id] = seg
            elif isinstance(node, ast.AnnAssign) and \
                    isinstance(node.target, ast.Name):
                seg = ast.get_source_segment(self.src, node)
                if seg is not None:
                    self.defs[node.target.id] = seg


@lru_cache(maxsize=None)
def _module_ctx(repo_root: str, module: str) -> _ModuleCtx | None:
    path = _module_file(repo_root, module)
    return _ModuleCtx(repo_root, module, path) if path else None


def _resolve_module(repo_root: str, dotted: str) -> str | None:
    parts = dotted.split(".")
    while parts:
        if _module_file(repo_root, ".".join(parts)):
            return ".".join(parts)
        parts = parts[:-1]
    return None


def _scan_segment(seg_src: str):
    """(plain names, module-alias attribute pairs, local import bindings)
    used by a source segment. Attribute bases are EXCLUDED from the
    plain-name set so ``text.pmi_topk`` resolves the symbol, not the
    whole module."""
    tree = ast.parse(seg_src)
    attr_pairs: set[tuple[str, str]] = set()
    attr_base_ids: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Attribute) and isinstance(node.value,
                                                          ast.Name):
            attr_pairs.add((node.value.id, node.attr))
            attr_base_ids.add(id(node.value))
    names = {
        n.id for n in ast.walk(tree)
        if isinstance(n, ast.Name) and isinstance(n.ctx, ast.Load)
        and id(n) not in attr_base_ids
    }
    local_imports = _imports_of(ast.walk(tree))
    return names, attr_pairs, local_imports


class _Closure:
    """Worklist symbol closure across modules."""

    def __init__(self, repo_root: str):
        self.repo_root = repo_root
        self.segments: dict[tuple[str, str], str] = {}
        self.fallback_modules: set[str] = set()
        self._done: set[tuple[str, str]] = set()

    def _fallback(self, module: str) -> None:
        """Whole-module (plus transitive imports) hash — for names the
        static analysis cannot pin to a segment."""
        stack = [module]
        while stack:
            m = stack.pop()
            if m in self.fallback_modules:
                continue
            ctx = _module_ctx(self.repo_root, m)
            if ctx is None:
                continue
            self.fallback_modules.add(m)
            for dotted in ctx.imports.values():
                r = _resolve_module(self.repo_root, dotted)
                if r:
                    stack.append(r)

    def add_symbol(self, module: str, name: str) -> None:
        key = (module, name)
        if key in self._done:
            return
        self._done.add(key)
        ctx = _module_ctx(self.repo_root, module)
        if ctx is None:
            return
        if name in ctx.defs:
            seg = ctx.defs[name]
            self.segments[key] = seg
            names, attrs, local_imports = _scan_segment(seg)
            imports = dict(ctx.imports)
            imports.update(local_imports)
            self._follow(module, imports, ctx, names, attrs)
        elif name in ctx.imports:
            self._follow_dotted(ctx.imports[name], bare_use=True)
        # else: builtin / external / dynamic — nothing internal to hash

    def _follow(self, module, imports, ctx, names, attrs) -> None:
        for alias, attr in sorted(attrs):
            if alias in imports:
                dotted = imports[alias]
                target = _resolve_module(self.repo_root, dotted)
                if target == dotted:
                    # module alias attribute -> symbol in that module
                    self.add_symbol(dotted, attr)
                elif target:
                    # "from pkg.mod import fn" then fn.attr — hash fn
                    self.add_symbol(target, dotted.rsplit(".", 1)[-1])
            elif alias in ctx.defs:
                self.add_symbol(module, alias)
        for nm in sorted(names):
            if nm in imports:
                self._follow_dotted(imports[nm], bare_use=True)
            elif nm in ctx.defs:
                self.add_symbol(module, nm)

    def _follow_dotted(self, dotted: str, bare_use: bool) -> None:
        target = _resolve_module(self.repo_root, dotted)
        if target is None:
            return
        if target == dotted:
            # a module referenced as a bare value — cannot tell which
            # attrs are reached; be conservative
            if bare_use:
                self._fallback(target)
        else:
            self.add_symbol(target, dotted[len(target) + 1:])

    def digest(self, extra_segments: dict[str, str], registry_sha: str) -> str:
        h = hashlib.sha256()
        h.update(registry_sha.encode())
        for name in sorted(extra_segments):
            h.update(b"\x00qseg\x00" + extra_segments[name].encode())
        for (m, n) in sorted(self.segments):
            h.update(f"\x00sym\x00{m}.{n}\x00".encode())
            h.update(self.segments[(m, n)].encode())
        for m in sorted(self.fallback_modules):
            f = _module_file(self.repo_root, m)
            h.update(f"\x00mod\x00{m}:{_file_sha(f)}".encode())
        return h.hexdigest()


def _fingerprint_query(
    repo_root: str,
    registry_sha: str,
    plans_module: str,
    plans_ctx: _ModuleCtx,
    query_segments: dict[str, str],
) -> str:
    """Fingerprint one query given its plans-module source segments
    (function + call-site / factory, decorators included)."""
    clo = _Closure(repo_root)
    local_segments: dict[str, str] = dict(query_segments)
    imports = dict(plans_ctx.imports)
    pending_names: set[str] = set()
    pending_attrs: set[tuple[str, str]] = set()
    done_local: set[str] = set(local_segments)
    frontier = list(local_segments.values())
    while frontier:
        seg = frontier.pop()
        names, attrs, local_imports = _scan_segment(seg)
        imports.update(local_imports)
        pending_attrs |= attrs
        for nm in names:
            if nm in done_local:
                continue
            if nm in plans_ctx.defs and nm not in imports:
                done_local.add(nm)
                local_segments[nm] = plans_ctx.defs[nm]
                frontier.append(plans_ctx.defs[nm])
            else:
                pending_names.add(nm)
    clo._follow(plans_module, imports, plans_ctx, pending_names,
                pending_attrs)
    return clo.digest(local_segments, registry_sha)


def compute_fingerprints(repo_root: str) -> dict[str, str]:
    """query name -> sha256 fingerprint for every @query-registered
    function found under plans/queries_*.py of ``repo_root``."""
    import glob

    repo_root = os.path.abspath(repo_root)
    plans_glob = os.path.join(repo_root, PKG, "plans", "queries_*.py")
    registry = _module_file(repo_root, f"{PKG}.plans.registry")
    registry_sha = _file_sha(registry) if registry else ""
    out: dict[str, str] = {}
    for path in sorted(glob.glob(plans_glob)):
        module = f"{PKG}.plans.{os.path.splitext(os.path.basename(path))[0]}"
        ctx = _module_ctx(repo_root, module)
        tree, src = ctx.tree, ctx.src

        # --- plain @query("name") functions --------------------------
        for node in tree.body:
            if not isinstance(node, ast.FunctionDef):
                continue
            qname = None
            for dec in node.decorator_list:
                if (isinstance(dec, ast.Call)
                        and getattr(dec.func, "id", None) == "query"
                        and dec.args
                        and isinstance(dec.args[0], ast.Constant)):
                    qname = dec.args[0].value
            if qname is None:
                continue
            seg = _segment_with_decorators(src, node)
            out[qname] = _fingerprint_query(
                repo_root, registry_sha, module, ctx,
                {f"__q_{qname}": seg},
            )

        # --- factory pattern: nested @query(f"...{param}...") --------
        factories: dict[str, ast.FunctionDef] = {}
        for node in tree.body:
            if isinstance(node, ast.FunctionDef) and any(
                isinstance(inner, ast.FunctionDef) and any(
                    isinstance(d, ast.Call)
                    and getattr(d.func, "id", None) == "query"
                    and d.args and isinstance(d.args[0], ast.JoinedStr)
                    for d in inner.decorator_list
                )
                for inner in ast.walk(node)
            ):
                factories[node.name] = node
        for node in tree.body:
            call = node.value if isinstance(node, ast.Expr) else None
            if not (isinstance(call, ast.Call)
                    and getattr(call.func, "id", None) in factories):
                continue
            fac = factories[call.func.id]
            params = [a.arg for a in fac.args.args]
            bound: dict[str, object] = {}
            for i, a in enumerate(call.args):
                if isinstance(a, ast.Constant):
                    bound[params[i]] = a.value
            for kw in call.keywords:
                if isinstance(kw.value, ast.Constant):
                    bound[kw.arg] = kw.value.value
            inner = next(
                n for n in ast.walk(fac)
                if isinstance(n, ast.FunctionDef) and n is not fac
                and any(isinstance(d, ast.Call)
                        and getattr(d.func, "id", None) == "query"
                        for d in n.decorator_list)
            )
            joined = next(
                d.args[0] for d in inner.decorator_list
                if isinstance(d, ast.Call)
                and getattr(d.func, "id", None) == "query"
            )
            parts, ok = [], True
            for v in joined.values:
                if isinstance(v, ast.Constant):
                    parts.append(str(v.value))
                elif (isinstance(v, ast.FormattedValue)
                      and isinstance(v.value, ast.Name)
                      and v.value.id in bound):
                    parts.append(str(bound[v.value.id]))
                else:
                    ok = False
            if not ok:
                continue
            qname = "".join(parts)
            seg = (_segment_with_decorators(src, fac) + "\n"
                   + (ast.get_source_segment(src, node) or ""))
            out[qname] = _fingerprint_query(
                repo_root, registry_sha, module, ctx,
                {f"__q_{qname}": seg},
            )
    return out


if __name__ == "__main__":
    import json
    import sys

    root = sys.argv[1] if len(sys.argv) > 1 else "."
    print(json.dumps(compute_fingerprints(os.path.abspath(root)),
                     indent=1, sort_keys=True))
