"""Implementation-provenance hashing for the correctness artifacts.

``scripts/full_correctness.py`` pins each green row to the oracle SQL
(``oracle_sha``) and the Spark implementation (``impl_sha``) it attests,
so ``--update`` can re-run exactly the rows whose evidence went stale.
Until round 12 ``impl_sha`` hashed ONLY the registered function's own
source (``inspect.getsource``), which left a hole (VERDICT r11 item 1):
an edit to a SHARED HELPER — ``extensions/similarity.py``, a module
constant like ``PQ_RERANK_R``, a CTE builder — changed real behavior
without touching any consumer's source, so every consumer's green row
silently kept attesting code that no longer exists. Round 11 papered
over it by hand (``_ROUND_CHANGED`` listing helper-refactor consumers
explicitly); this module closes it structurally.

``impl_sha(fn)`` now folds in a content hash of the function's
TRANSITIVE LOCAL-MODULE CLOSURE: the source of the module that defines
``fn`` plus every ``crypto_streaming_lakehouse_spark`` module reachable
from it through imports (module-level AND function-level — the registry
modules import helpers inside function bodies). Any edit anywhere in
that closure — helper functions, module constants, comments — changes
the sha and marks every consumer's artifact row stale.

Deliberately COARSE: a one-line edit to ``registry.py`` (imported by
everything) invalidates the whole surface. That trades re-sweep time for
a guarantee — no green row can ever attest behavior that a helper edit
changed — and ``--update`` re-runs only the flagged rows, so the cost is
bounded by the edit's actual blast radius through the import graph.
"""

from __future__ import annotations

import ast
import hashlib
import importlib.util
import inspect

_PKG = "crypto_streaming_lakehouse_spark"

# modname -> source text (None = no readable source). Tests may inject
# entries to simulate a helper edit; clear_caches() resets everything.
_SRC_CACHE: dict[str, str | None] = {}
_CLOSURE_CACHE: dict[str, tuple[str, ...]] = {}
_SHA_CACHE: dict[str, str] = {}


def clear_caches() -> None:
    _SRC_CACHE.clear()
    _CLOSURE_CACHE.clear()
    _SHA_CACHE.clear()


def _is_local(modname: str) -> bool:
    return modname == _PKG or modname.startswith(_PKG + ".")


def _module_source(modname: str) -> str | None:
    if modname in _SRC_CACHE:
        return _SRC_CACHE[modname]
    src: str | None = None
    try:
        spec = importlib.util.find_spec(modname)
        if spec is not None and spec.origin and spec.origin.endswith(".py"):
            with open(spec.origin, encoding="utf-8") as f:
                src = f.read()
    except (ImportError, ValueError, OSError):
        src = None
    _SRC_CACHE[modname] = src
    return src


def _module_exists(modname: str) -> bool:
    try:
        return importlib.util.find_spec(modname) is not None
    except (ImportError, ValueError):
        return False


def _direct_imports(modname: str) -> set[str]:
    """Local-package modules imported anywhere in ``modname`` — module
    level or inside function bodies (the registry modules do the latter
    pervasively), resolved through relative-import levels."""
    src = _module_source(modname)
    if src is None:
        return set()
    try:
        tree = ast.parse(src)
    except SyntaxError:  # pragma: no cover — unparseable source
        return set()
    # Anchor package for relative imports: the module's parent package
    # (none of the registered code lives in an __init__, but handle the
    # package case for completeness).
    if _module_exists(modname):
        spec = importlib.util.find_spec(modname)
        is_pkg = bool(spec is not None and spec.submodule_search_locations)
    else:  # pragma: no cover
        is_pkg = False
    parent = modname if is_pkg else modname.rsplit(".", 1)[0]
    out: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if _is_local(alias.name):
                    out.add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:
                try:
                    base = importlib.util.resolve_name(
                        "." * node.level + (node.module or ""), parent
                    )
                except (ImportError, ValueError):
                    continue
            else:
                base = node.module or ""
            if not _is_local(base):
                continue
            if _module_exists(base):
                out.add(base)
            # ``from .extensions import similarity`` — each alias may be
            # a submodule rather than an attribute.
            for alias in node.names:
                cand = f"{base}.{alias.name}"
                if _module_exists(cand):
                    out.add(cand)
    out.discard(modname)
    return out


def module_closure(modname: str) -> tuple[str, ...]:
    """Sorted transitive local-import closure of ``modname`` (inclusive)."""
    hit = _CLOSURE_CACHE.get(modname)
    if hit is not None:
        return hit
    seen: set[str] = set()
    frontier = [modname]
    while frontier:
        m = frontier.pop()
        if m in seen:
            continue
        seen.add(m)
        frontier.extend(_direct_imports(m) - seen)
    closure = tuple(sorted(seen))
    _CLOSURE_CACHE[modname] = closure
    return closure


def closure_sha(modname: str) -> str:
    """Content hash of every module source in the closure, in sorted
    module-name order (order-stable across runs)."""
    hit = _SHA_CACHE.get(modname)
    if hit is not None:
        return hit
    h = hashlib.sha256()
    for m in module_closure(modname):
        h.update(m.encode())
        h.update(b"\x00")
        h.update((_module_source(m) or "").encode())
        h.update(b"\x01")
    sha = h.hexdigest()[:16]
    _SHA_CACHE[modname] = sha
    return sha


def impl_sha(fn) -> str | None:
    """Provenance hash of a registered query implementation: the
    function's own source + the closure hash of its defining module.
    Returns None when no source is recoverable (the artifact row then
    carries impl_sha=null and is always considered re-runnable)."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return None
    mod = getattr(fn, "__module__", "") or ""
    payload = src
    if _is_local(mod):
        payload += "\n\x00closure:" + closure_sha(mod)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]
