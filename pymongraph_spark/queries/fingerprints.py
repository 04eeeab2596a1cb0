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
_IMPORT_RE = re.compile(
    rf"from\s+({_PKG}[.\w]*)\s+import\s+\(?([^)\n]+(?:\n[^)\n]+)*?)\)?\s*$",
    re.MULTILINE,
)


def _stable_repr(v: object) -> str:
    if isinstance(v, (set, frozenset)):
        try:
            return "set:" + repr(sorted(v))
        except TypeError:
            return "set:" + repr(sorted(v, key=repr))
    try:
        return repr(v)
    except Exception:  # pragma: no cover — exotic constants
        return f"<unreprable {type(v).__name__}>"


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
            for item in m.group(2).split(","):
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
    if isinstance(v, (types.FunctionType, type)):
        _collect(v, seen, parts)
    elif isinstance(v, types.ModuleType):
        return  # whole-module refs are too broad — direct refs dominate
    elif isinstance(
        v, (str, bytes, int, float, bool, tuple, list, dict, set, frozenset)
    ):
        if id(v) not in seen:
            seen.add(id(v))
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
