"""Effective-code hash per suite entry — the helper-transitive
stale-grading guard (VERDICT r7 #2).

The driver grades a 50-entry prefix of the suite registry per round;
the standing invariant is that any entry whose COMPUTATION changed
since its last driver-green row must sit inside the graded prefix.
Round 7 proved that comparing registered function bodies alone has a
blind spot: commit fc3b048 changed the shared ``SPARK_DOT`` /
``SQL_DOT`` helpers, silently changing the effective computation of
``ext_hybrid_search`` while its registered body stayed byte-identical.

This tool closes the gap by hashing each entry's EFFECTIVE source:
the registered function's own source text plus, transitively, the
source of every in-package function/class it references and the repr
of every module-level constant it reads (so a change to a shared SQL
fragment string, a threshold constant, or a helper function anywhere
in the closure changes the entry's hash). The oracle SQL is included
too — an oracle edit also re-defines what the driver grades.

Usage:
  python tools/effhash.py                 # print {entry: hash} JSON
  python tools/effhash.py --update [ref]  # rewrite tests/effective_hashes.json
  python tools/effhash.py --check         # exit 1 if any changed-hash entry
                                          # sits OUTSIDE the graded 50-prefix

The snapshot (tests/effective_hashes.json) is regenerated at round
start from the tree the driver last graded (its ``ref`` field records
that commit); tests/test_effective_hash_lint.py enforces --check in
every pytest run.
"""

from __future__ import annotations

import ast
import importlib
import hashlib
import inspect
import json
import re
import sys
import textwrap
from pathlib import Path

_ADDR_RE = re.compile(r" at 0x[0-9a-f]+", re.IGNORECASE)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PKG = "marketing_etl_analytics_spark"
SNAPSHOT = Path(__file__).resolve().parent.parent / "tests" / "effective_hashes.json"


def _window() -> int:
    """Driver-graded prefix length — imported from the suite package
    (ADVICE r8 #3: a duplicated constant here would silently lint the
    wrong prefix if a rotation ever resized or moved the window)."""
    from marketing_etl_analytics_spark.suite import GRADED_WINDOW

    return GRADED_WINDOW

# Scalar constant types whose repr is stable and meaningful to
# include; containers go through _is_const_container below.
_CONST_TYPES = (str, int, float, bool, bytes)


_ASSIGN_CACHE: dict[str, dict[str, str]] = {}


def _module_assigns(modname: str) -> dict[str, str]:
    """{name: source text} of top-level assignments in module
    ``modname`` (parsed statically, cached). Containers are hashed via
    this STATIC text, never their runtime value: module-level dicts /
    lists in this codebase are mostly memo caches (_TABLE_CACHE,
    _TERM_INDEX) whose runtime contents depend on what ran earlier in
    the process — hashing values made the lint order-dependent."""
    if modname in _ASSIGN_CACHE:
        return _ASSIGN_CACHE[modname]
    _ASSIGN_CACHE[modname] = {}  # cycle guard (import cycles return {})
    out: dict[str, str] = {}
    mod = sys.modules.get(modname)
    src_file = getattr(mod, "__file__", None)
    if src_file:
        try:
            src = Path(src_file).read_text()
            tree = ast.parse(src)
            for node in tree.body:
                targets = []
                if isinstance(node, ast.Assign):
                    targets = [
                        t.id for t in node.targets if isinstance(t, ast.Name)
                    ]
                elif isinstance(node, ast.AnnAssign) and isinstance(
                    node.target, ast.Name
                ):
                    targets = [node.target.id]
                if targets:
                    seg = ast.get_source_segment(src, node) or ""
                    for name in targets:
                        out[name] = seg
                elif isinstance(node, ast.ImportFrom) and node.module:
                    # `from pkg.mod import NAME` at module top level:
                    # resolve NAME's assignment in the origin module
                    origin = node.module
                    if origin.startswith("."):
                        origin = modname.rsplit(".", 1)[0] + origin.rstrip(".")
                    if origin.split(".")[0] == PKG:
                        for alias in node.names:
                            local = alias.asname or alias.name
                            seg2 = _module_assigns(origin).get(alias.name)
                            if seg2 and local not in out:
                                out[local] = seg2
        except (OSError, SyntaxError):
            pass
    _ASSIGN_CACHE[modname] = out
    return out


def _referenced(
    src: str,
) -> tuple[set[str], set[tuple[str, str]], set[tuple[str, str]], dict[str, str]]:
    """(bare names, (root, attr) pairs, (module, name) from-imports,
    {alias: module} imports) referenced by ``src``. From-imports cover
    the function-LOCAL ``from pkg.mod import HELPER`` pattern — those
    names never appear in ``fn.__globals__`` (the exact way
    ext_hybrid_search reaches SPARK_DOT)."""
    tree = ast.parse(textwrap.dedent(src))
    names: set[str] = set()
    attrs: set[tuple[str, str]] = set()
    from_imports: set[tuple[str, str]] = set()
    mod_aliases: dict[str, str] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            attrs.add((node.value.id, node.attr))
        elif isinstance(node, ast.ImportFrom) and node.module:
            for alias in node.names:
                from_imports.add((node.module, alias.name))
        elif isinstance(node, ast.Import):
            for alias in node.names:
                mod_aliases[alias.asname or alias.name.split(".")[0]] = alias.name
    return names, attrs, from_imports, mod_aliases


def _in_pkg(obj) -> bool:
    mod = getattr(obj, "__module__", None)
    return isinstance(mod, str) and mod.split(".")[0] == PKG


def effective_pieces(
    fn,
    oracle: str | None = None,
    override_source: dict[str, str] | None = None,
) -> dict[str, str]:
    """{qualified name: source-or-repr} for ``fn``'s transitive
    in-package closure. ``override_source`` (tests only) substitutes
    the source text recorded for a qualified name — used to prove the
    hash is helper-sensitive without editing files on disk."""
    override_source = override_source or {}
    pieces: dict[str, str] = {}
    seen: set[int] = set()
    work = [fn]
    if oracle is not None:
        pieces["__oracle__"] = oracle

    def record(key: str, text: str) -> None:
        pieces[key] = override_source.get(key, text)

    def push_value(key: str, v) -> None:
        if inspect.isfunction(v) or inspect.isclass(v):
            if _in_pkg(v) and id(v) not in seen:
                work.append(v)
        elif isinstance(v, _CONST_TYPES):
            record(key, repr(v))
        elif isinstance(v, (list, dict, set, tuple, frozenset)):
            # containers are hashed via the STATIC source text of
            # their module-level assignment (see _module_assigns) —
            # runtime values would make the hash order-dependent the
            # moment a memo cache (suite.common._TABLE_CACHE,
            # ext_pipeline._TERM_INDEX) fills up
            modname, _, name = key.rpartition(".")
            seg = _module_assigns(modname).get(name)
            if seg:
                record(key, seg)

    while work:
        obj = work.pop()
        if id(obj) in seen:
            continue
        seen.add(id(obj))
        try:
            src = inspect.getsource(obj)
        except (OSError, TypeError):
            continue
        key = f"{obj.__module__}.{getattr(obj, '__qualname__', obj.__name__)}"
        record(key, src)
        names, attrs, from_imports, mod_aliases = _referenced(src)
        g = getattr(obj, "__globals__", None)
        if g is None:  # class: resolve through its defining module
            mod = sys.modules.get(obj.__module__)
            g = vars(mod) if mod else {}
        for name in sorted(names):
            if name not in g:
                continue
            v = g[name]
            if inspect.ismodule(v):
                continue  # handled via (root, attr) below
            push_value(f"{obj.__module__}.{name}", v)
        # function-local `from pkg.mod import X` (absolute or relative)
        for modname, attr in sorted(from_imports):
            if modname.startswith("."):
                modname = obj.__module__.rsplit(".", 1)[0] + modname.rstrip(".")
            if modname.split(".")[0] != PKG:
                continue
            mod = sys.modules.get(modname) or importlib.import_module(modname)
            if hasattr(mod, attr):
                push_value(f"{modname}.{attr}", getattr(mod, attr))
        for root, attr in sorted(attrs):
            v = g.get(root)
            if v is None and root in mod_aliases:  # function-local import pkg.mod
                v = sys.modules.get(mod_aliases[root])
            if inspect.ismodule(v) and v.__name__.split(".")[0] == PKG:
                if hasattr(v, attr):
                    push_value(f"{v.__name__}.{attr}", getattr(v, attr))
    return pieces


def effective_hash(fn, oracle: str | None = None,
                   override_source: dict[str, str] | None = None) -> str:
    pieces = effective_pieces(fn, oracle, override_source)
    h = hashlib.sha256()
    for key in sorted(pieces):
        h.update(key.encode())
        h.update(b"\x00")
        h.update(pieces[key].encode())
        h.update(b"\x01")
    return h.hexdigest()


def suite_hashes() -> dict[str, str]:
    from marketing_etl_analytics_spark.suite import SUITE

    return {
        name: effective_hash(e.fn, e.oracle) for name, e in SUITE.items()
    }


def check(snapshot_path: Path = SNAPSHOT) -> list[str]:
    """Entries whose effective hash changed vs the snapshot (or are
    new) but sit OUTSIDE the graded window. Empty list = invariant
    holds.

    ``optimization_allow`` (r9): the optimization-round driver grades
    the FULL registry, not a 50-prefix, so a tail entry deliberately
    optimized this round still gets a driver row. Such entries are
    listed explicitly in the snapshot's ``optimization_allow`` key —
    each with its oracle-equivalence proof recorded in
    OPTIMIZATION_r09.md — and exempted here. Accidental drift of any
    OTHER tail entry still fails the lint."""
    from marketing_etl_analytics_spark.suite import SUITE

    doc = json.loads(snapshot_path.read_text())
    snap = doc["hashes"]
    allow = set(doc.get("optimization_allow", []))
    current = suite_hashes()
    names = list(SUITE)
    violations = []
    window = _window()
    for i, name in enumerate(names):
        if i < window or name in allow:
            continue  # in-window changes are exactly what the window is for
        if current[name] != snap.get(name):
            violations.append(name)
    return violations


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--update":
        ref = args[1] if len(args) > 1 else "WORKTREE"
        SNAPSHOT.write_text(
            json.dumps({"ref": ref, "hashes": suite_hashes()},
                       indent=0, sort_keys=True) + "\n"
        )
        print(f"wrote {SNAPSHOT} (ref={ref})")
        return 0
    if args and args[0] == "--check":
        bad = check()
        if bad:
            print("effective computation changed OUTSIDE the graded "
                  f"window: {bad}")
            return 1
        print("effective-hash invariant holds")
        return 0
    print(json.dumps(suite_hashes(), indent=0, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
