"""Content fingerprints for the driver-gate rotation (VERDICT r12 item 2).

The driver's correctness gate records only the first 50 registry entries
per round, so __spark_entry__.queries() rotates by verification
staleness. Staleness used to be LAST-GATED-ROUND only — which let a
query edited AFTER its last gate keep wearing a stale driver green for
up to ceil(N/50) rounds (r12 left t104/d65/st92/t105/st93 gated on r11
code). The fix: fingerprint each query's implementation and compare
against the fingerprint it wore WHEN LAST GATED; a mismatch ranks the
query with the never-gated block.

The fingerprint is TRANSITIVE over the package: the registered
callable's source, its materialized oracle string, and — recursively —
the source of every pymongraph_spark function/class it references
(module globals AND function-local `from pymongraph_spark... import`
targets) plus the repr of referenced module-level constants. The r12
verdict's sketch (callable source + oracle only) misses exactly the
r12 staleness cases it names: d65's edit landed in bloom_m_bits_for
and st92's in _stream_neardup_run, both shared helpers. A transitive
walk flips every caller of an edited helper — the correct set to
re-gate, since the gated green certifies the whole code path.

The fingerprint-at-last-gate map lives in GATE_FPS.json at the repo
root: {"snapshots": {"<round>": {name: fp}}}, where snapshot <N> holds
the fingerprints of the tree the driver gates as round N (the round's
final committed code). scripts/snapshot_gate_fps.py writes the snapshot
at the end of each build round; rounds 1-12 were backfilled from their
artifact commits' trees by scripts/backfill_gate_fps.py (which injects
THIS file into each historical worktree so the algorithm is identical).
"""

from __future__ import annotations

import hashlib
import importlib
import inspect
import re
import types

_PKG = "pymongraph_spark"
# Two name-list shapes: parenthesized (may span lines — [^)]* crosses
# newlines) or single-line bare. The r13 lazy single-branch pattern
# captured only "(" for multiline paren imports (ADVICE r13 high), so
# helpers imported that way — the dominant style in queries/llm.py and
# queries/streaming.py — silently fell out of the transitive walk.
_IMPORT_RE = re.compile(
    rf"from\s+({_PKG}[.\w]*)\s+import\s+(?:\(([^)]*)\)|([^\n]+))"
)
# memory addresses in generic reprs (e.g. "<object at 0x7f...>") differ
# per process and would make fingerprints non-deterministic (VERDICT
# r13 What's wrong 1) — normalize them in the fallback repr path only
# (never for str/bytes, where a literal "0x..." is real content)
_ADDR_RE = re.compile(r" at 0x[0-9a-fA-F]+")


def _stable_repr(v: object) -> str:
    try:
        return _ADDR_RE.sub(" at 0xADDR", repr(v))
    except Exception:  # pragma: no cover — exotic constants
        return f"<unreprable {type(v).__name__}>"


def _callable_token(v: object) -> str:
    """Stable process-independent identity for a non-package callable."""
    return (
        f"<callable {getattr(v, '__module__', '?')}."
        f"{getattr(v, '__qualname__', getattr(v, '__name__', '?'))}>"
    )


def _sort_key(v: object) -> str:
    """Deterministic ordering key for set elements (may hold callables,
    whose raw repr embeds memory addresses)."""
    if isinstance(v, (types.FunctionType, type)):
        return _callable_token(v)
    return _stable_repr(v)


def _code_names(fn: types.FunctionType) -> set[str]:
    """All global names referenced by fn's code, including nested code
    objects (lambdas, comprehensions, inner defs)."""
    names: set[str] = set()
    stack = [fn.__code__]
    while stack:
        co = stack.pop()
        names.update(co.co_names)
        for c in co.co_consts:
            if isinstance(c, types.CodeType):
                stack.append(c)
    return names


def _collect(obj: object, seen: set, parts: list[str]) -> None:
    """Depth-first source walk over package-local callables/constants."""
    if id(obj) in seen:
        return
    seen.add(id(obj))
    if isinstance(obj, types.FunctionType):
        if not (obj.__module__ or "").startswith(_PKG):
            return
        try:
            src = inspect.getsource(obj)
        except (OSError, TypeError):  # pragma: no cover
            src = repr(obj)
        # Shared dispatch-shell functions contribute NOTHING — neither
        # their source NOR their globals: the registry decorator's
        # `wrapped` is the registered callable for EVERY query, so any
        # registry-module edit (the wrapper body, a helper it calls like
        # _maybe_gc, or a module constant) would flip all 226
        # fingerprints at once — the rotation degenerates to
        # alphabetical and the 50-slot gate window loses the staleness
        # signal entirely (observed twice in r14: the per-query
        # gc.collect landing in the wrapper, then the _maybe_gc helper
        # whose mutable _last_gc global would additionally have made
        # fingerprints time-dependent). The walk recurses ONLY through
        # the shell's closure — the real query fn — so per-query
        # implementation edits flip exactly their own callers;
        # registry/session-infrastructure edits are certified by the
        # test suite, not by burning every gate slot.
        if obj.__module__ == f"{_PKG}.queries.registry":
            for cell in obj.__closure__ or ():
                try:
                    _collect(cell.cell_contents, seen, parts)
                except ValueError:  # pragma: no cover — empty cell
                    pass
            return
        parts.append(src)
        for cell in obj.__closure__ or ():
            try:
                _collect(cell.cell_contents, seen, parts)
            except ValueError:  # pragma: no cover — empty cell
                pass
        g = obj.__globals__
        for n in sorted(_code_names(obj)):
            if n in g:
                _collect_value(g[n], seen, parts)
        # function-local `from pymongraph_spark... import name` targets
        # never hit __globals__ — resolve them from the source text
        for m in _IMPORT_RE.finditer(src):
            try:
                mod = importlib.import_module(m.group(1))
            except ImportError:  # pragma: no cover
                continue
            names_blob = m.group(2) if m.group(2) is not None else m.group(3)
            for item in names_blob.split(","):
                name = item.split(" as ")[0].split("#")[0].strip()
                if name and hasattr(mod, name):
                    _collect_value(getattr(mod, name), seen, parts)
    elif isinstance(obj, type):
        if (getattr(obj, "__module__", "") or "").startswith(_PKG):
            try:
                parts.append(inspect.getsource(obj))
            except (OSError, TypeError):  # pragma: no cover
                parts.append(repr(obj))


def _collect_value(v: object, seen: set, parts: list[str]) -> None:
    """Collect a referenced value. Containers recurse into ELEMENTS
    (VERDICT r13 What's wrong 1): repr-ing a container that holds
    callables — multimodal's _DECODERS dict of functions — embeds
    per-process memory addresses, which made m70/m74/m75 permanently
    rank as changed-since-gate. Package callables inside containers now
    contribute their SOURCE (also closing a staleness hole: editing a
    dispatch-table target flips every caller's fingerprint)."""
    if isinstance(v, (types.FunctionType, type)):
        if (getattr(v, "__module__", "") or "").startswith(_PKG):
            _collect(v, seen, parts)
        else:
            parts.append(_callable_token(v))
    elif isinstance(v, types.ModuleType):
        return  # whole-module refs are too broad — direct refs dominate
    elif isinstance(v, (tuple, list)):
        if id(v) not in seen:
            seen.add(id(v))
            parts.append(f"<{type(v).__name__}:{len(v)}>")
            for item in v:
                _collect_value(item, seen, parts)
    elif isinstance(v, dict):
        if id(v) not in seen:
            seen.add(id(v))
            parts.append(f"<dict:{len(v)}>")
            for k in v:  # insertion order == source order: deterministic
                _collect_value(k, seen, parts)
                _collect_value(v[k], seen, parts)
    elif isinstance(v, (set, frozenset)):
        if id(v) not in seen:
            seen.add(id(v))
            parts.append(f"<set:{len(v)}>")
            for item in sorted(v, key=_sort_key):
                _collect_value(item, seen, parts)
    elif isinstance(v, (str, bytes, int, float, bool, type(None))):
        # scalars are appended on every reference (no id() dedup: small
        # ints/strs are interned, and interning identity must not decide
        # what the fingerprint sees)
        parts.append(repr(v))
    else:
        parts.append(_stable_repr(v))


def current_fingerprints() -> dict[str, str]:
    """name -> 16-hex-digit fingerprint over (transitive sources, oracle)."""
    from pymongraph_spark.queries import ORACLES, QUERIES

    out: dict[str, str] = {}
    for name, fn in QUERIES.items():
        parts: list[str] = []
        _collect(fn, set(), parts)
        if not parts:  # pragma: no cover — non-function registrant
            parts = [repr(fn)]
        h = hashlib.sha256()
        for p in parts:
            h.update(p.encode("utf-8"))
            h.update(b"\0")
        h.update(b"\0oracle\0")
        h.update(ORACLES.get(name, "").encode("utf-8"))
        out[name] = h.hexdigest()[:16]
    return out
