"""File-level predicate pruning over manifest footer stats.

The metadata half of Delta-style DML data skipping: a DELETE / UPDATE /
OPTIMIZE-WHERE condition given as a SQL string is parsed into a small
predicate tree, and each data file is tested — using only its manifest
footer min/max stats and its hive partition-directory values — for
"MAY this file contain a matching row?".  Files that provably cannot
match are never opened, so the scan half of a selective DML touches a
fraction of the table (``sources/tables.py`` then narrows further to
files that DO match via one column-pruned probe read).

Soundness contract: ``may_match`` may only return ``False`` when NO row
in the file can satisfy the predicate.  Everything the grammar or the
stats can't decide evaluates to ``True`` (read the file); correctness
therefore never depends on the parser — only scan cost does.  This is
the same supported-shape whitelist real engines use for data skipping:

- comparisons between a column and a literal (either side), ``=``,
  ``==``, ``!=``, ``<>``, ``<``, ``<=``, ``>``, ``>=``
- ``IN (literals)``, ``BETWEEN lo AND hi``, ``IS [NOT] NULL``
- ``AND`` / ``OR`` / parentheses; ``NOT`` and anything else → unknown

Three-valued logic is collapsed conservatively: unknown → MAY match.
Partition columns evaluate EXACTLY (every row in the file shares the
directory value); stats columns evaluate on the [min, max] interval.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# -- predicate tree ----------------------------------------------------------


@dataclass(frozen=True)
class Pred:
    """One node: ``kind`` in {'and', 'or', 'cmp', 'in', 'between',
    'null', 'top'}; 'top' = undecidable, always MAY-match."""

    kind: str
    col: str | None = None
    op: str | None = None
    args: tuple = ()


_TOP = Pred("top")


def _tokenize(sql: str) -> list[tuple[str, object]] | None:
    token_re = re.compile(
        r"""\s*(?:
            (?P<num>-?\d+\.\d+|-?\d+)
          | (?P<str>'(?:[^']|'')*')
          | (?P<op><=|>=|==|!=|<>|<|>|=)
          | (?P<lp>\()
          | (?P<rp>\))
          | (?P<comma>,)
          | (?P<bq>`[^`]+`)
          | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
        )""",
        re.VERBOSE,
    )
    out: list[tuple[str, object]] = []
    i = 0
    while i < len(sql):
        m = token_re.match(sql, i)
        if m is None:
            if sql[i:].strip():
                return None  # unlexable character — caller falls back
            break
        i = m.end()
        if m.lastgroup == "num":
            text = m.group("num")
            out.append(("lit", float(text) if "." in text else int(text)))
        elif m.lastgroup == "str":
            out.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "bq":
            out.append(("ident", m.group("bq")[1:-1]))
        elif m.lastgroup == "word":
            w = m.group("word")
            kw = w.upper()
            if kw in (
                "AND", "OR", "NOT", "IN", "IS", "NULL", "BETWEEN",
                "TRUE", "FALSE", "DATE", "TIMESTAMP",
            ):
                out.append(("kw", kw))
            else:
                out.append(("ident", w))
        else:
            out.append((m.lastgroup, m.group(0).strip()))
    return out


class _Parser:
    def __init__(self, toks: list[tuple[str, object]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def expr(self) -> Pred:
        node = self.term()
        while self.peek() == ("kw", "OR"):
            self.take()
            node = Pred("or", args=(node, self.term()))
        return node

    def term(self) -> Pred:
        node = self.factor()
        while self.peek() == ("kw", "AND"):
            self.take()
            node = Pred("and", args=(node, self.factor()))
        return node

    def factor(self) -> Pred:
        kind, val = self.peek()
        if (kind, val) == ("kw", "NOT"):
            # sound negation needs three-valued eval; collapse to TOP
            self.take()
            self.factor()
            return _TOP
        if kind == "lp":
            self.take()
            node = self.expr()
            if self.peek()[0] != "rp":
                return _TOP
            self.take()
            return node
        return self.predicate()

    def _literal(self):
        """Returns (ok, value).  DATE/TIMESTAMP 'lit' keywords wrap a
        string literal whose ISO form compares correctly as a string."""
        kind, val = self.peek()
        if kind == "lit":
            self.take()
            return True, val
        if (kind, val) in (("kw", "TRUE"), ("kw", "FALSE")):
            self.take()
            return True, val == "TRUE"
        if (kind, val) in (("kw", "DATE"), ("kw", "TIMESTAMP")):
            self.take()
            k2, v2 = self.peek()
            if k2 == "lit" and isinstance(v2, str):
                self.take()
                return True, v2
            return False, None
        return False, None

    def predicate(self) -> Pred:
        kind, val = self.peek()
        if kind == "lit" or (kind == "kw" and val in ("TRUE", "FALSE", "DATE", "TIMESTAMP")):
            # literal-first comparison: lit op col  →  col mirrored-op lit
            ok, lit = self._literal()
            if not ok:
                return _TOP
            opk, opv = self.peek()
            if opk != "op":
                return _TOP
            self.take()
            ck, cv = self.take()
            if ck != "ident":
                return _TOP
            mirror = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
            return Pred("cmp", col=cv, op=mirror.get(opv, opv), args=(lit,))
        if kind != "ident":
            return _TOP
        self.take()
        col = val
        k2, v2 = self.peek()
        if k2 == "op":
            self.take()
            ok, lit = self._literal()
            return Pred("cmp", col=col, op=v2, args=(lit,)) if ok else _TOP
        if (k2, v2) == ("kw", "IN"):
            self.take()
            if self.peek()[0] != "lp":
                return _TOP
            self.take()
            lits = []
            while True:
                ok, lit = self._literal()
                if not ok:
                    return _TOP
                lits.append(lit)
                nk, _ = self.peek()
                if nk == "comma":
                    self.take()
                    continue
                if nk == "rp":
                    self.take()
                    return Pred("in", col=col, args=tuple(lits))
                return _TOP
        if (k2, v2) == ("kw", "BETWEEN"):
            self.take()
            ok1, lo = self._literal()
            if not ok1 or self.peek() != ("kw", "AND"):
                return _TOP
            self.take()
            ok2, hi = self._literal()
            return Pred("between", col=col, args=(lo, hi)) if ok2 else _TOP
        if (k2, v2) == ("kw", "IS"):
            self.take()
            neg = False
            if self.peek() == ("kw", "NOT"):
                self.take()
                neg = True
            if self.peek() != ("kw", "NULL"):
                return _TOP
            self.take()
            return Pred("null", col=col, args=(not neg,))
        return _TOP


def parse_predicate(sql: str) -> Pred | None:
    """Parse a SQL boolean expression into a prune tree; ``None`` when
    nothing is prunable (callers then read every file)."""
    toks = _tokenize(sql)
    if not toks:
        return None
    p = _Parser(toks)
    try:
        node = p.expr()
    except Exception:  # noqa: BLE001 — any parse surprise means "no pruning"
        return None
    if p.i != len(p.toks):  # trailing unparsed tokens — distrust the tree
        return None
    return None if node.kind == "top" else node


# -- generated-partition implication -----------------------------------------

# Delta's "generated column partition pruning": when a partition column
# is GENERATED ALWAYS AS a monotone truncation of a base column, a
# predicate on the BASE column implies a predicate on the PARTITION
# column — so `ts >= '2026-08-14 10:00'` prunes `day=` directories even
# though footer stats carry nothing for timestamp columns.  Supported
# generation templates (the same whitelist Delta documents):
#
#   to_date(base) / date(base) / CAST(base AS DATE)   → day truncation
#   year(base)                                        → year extraction
#
# date_trunc is deliberately NOT supported: its partition value is a
# TIMESTAMP string ('2026-08-01 00:00:00'), which breaks the exact
# lexicographic compare against a derived DATE literal ('2026-08-14') —
# a <= bound would wrongly exclude the boundary partition.  DATE-typed
# and integer-typed generations compare exactly.
#
# Soundness: for every ROW, g = f(base) with f monotone nondecreasing,
# so `base op lit` implies `g op' f(lit)` (op' relaxes strict to
# non-strict).  Each matched predicate node P is replaced by
# AND(P, implied) — a row-wise EQUIVALENT node, hence sound under any
# AND/OR composition.  Timestamp literals are interpreted as written
# (session-timezone invariance between writer and reader — the same
# assumption the partition directories themselves encode).

_GEN_DAY = re.compile(
    r"^\s*(?:to_date|date)\s*\(\s*`?(\w+)`?\s*\)\s*$"
    r"|^\s*cast\s*\(\s*`?(\w+)`?\s+as\s+date\s*\)\s*$",
    re.IGNORECASE,
)
_GEN_YEAR = re.compile(r"^\s*year\s*\(\s*`?(\w+)`?\s*\)\s*$", re.IGNORECASE)
_DATE_PREFIX = re.compile(r"^\d{4}-\d{2}-\d{2}")

_RELAX = {
    "=": "=", "==": "=",
    ">": ">=", ">=": ">=",
    "<": "<=", "<=": "<=",
}


def generation_map(
    generated: dict[str, str], partition_cols: list[str]
) -> dict[str, list[tuple[str, str]]]:
    """``{base_col: [(partition_col, 'day'|'year'), ...]}`` for every
    partition column generated by a supported monotone template."""
    out: dict[str, list[tuple[str, str]]] = {}
    pcols = set(partition_cols)
    for gcol, expr in generated.items():
        if gcol not in pcols:
            continue
        m = _GEN_DAY.match(expr)
        if m:
            base = next(g for g in m.groups() if g)
            out.setdefault(base, []).append((gcol, "day"))
            continue
        m = _GEN_YEAR.match(expr)
        if m:
            out.setdefault(m.group(1), []).append((gcol, "year"))
    return out


def _truncate(lit, kind: str):
    """f(lit) for a date-shaped string literal; None = no implication."""
    if not isinstance(lit, str):
        return None
    m = _DATE_PREFIX.match(_canon_ts(lit))
    if not m:
        return None
    return m.group(0) if kind == "day" else int(m.group(0)[:4])


def _implied(node: Pred, gcol: str, kind: str) -> Pred | None:
    if node.kind == "cmp":
        op = _RELAX.get(node.op)
        lit = _truncate(node.args[0], kind)
        if op is None or lit is None:
            return None
        return Pred("cmp", gcol, op, (lit,))
    if node.kind == "in":
        lits = tuple(_truncate(a, kind) for a in node.args)
        if any(v is None for v in lits):
            return None
        return Pred("in", gcol, None, lits)
    if node.kind == "between":
        lo, hi = _truncate(node.args[0], kind), _truncate(node.args[1], kind)
        if lo is None or hi is None:
            return None
        return Pred("between", gcol, None, (lo, hi))
    return None


def augment_generated_partitions(
    pred: Pred | None,
    generated: dict[str, str],
    partition_cols: list[str],
) -> Pred | None:
    """Rewrite ``pred`` so base-column constraints also constrain their
    generated partition columns (see module notes above); returns the
    input unchanged when nothing applies."""
    if pred is None or not generated:
        return pred
    gmap = generation_map(generated, partition_cols)
    if not gmap:
        return pred

    def walk(node: Pred) -> Pred:
        if node.kind in ("and", "or"):
            return Pred(node.kind, args=tuple(walk(a) for a in node.args))
        if node.kind in ("cmp", "in", "between") and node.col in gmap:
            extra = [
                g
                for gcol, kind in gmap[node.col]
                if (g := _implied(node, gcol, kind)) is not None
            ]
            if extra:
                return Pred("and", args=(node, *extra))
        return node

    return walk(pred)


# -- evaluation --------------------------------------------------------------


_TS_RE = re.compile(
    r"^(\d{4}-\d{2}-\d{2})[ T](\d{2}:\d{2}(?::\d{2})?)(\.\d+)?$"
)


def _canon_ts(s: str) -> str:
    """Canonicalize timestamp-looking strings so spelling variance
    (``T`` separator, missing seconds, trailing fraction zeros,
    ``.000000``) cannot defeat the exact partition-string compare —
    Spark's partition directories render ``12:01:00`` while a literal
    may say ``12:01:00.000000``; both must compare equal, and ordering
    must stay lexicographically correct."""
    m = _TS_RE.match(s)
    if not m:
        return s
    date, hms, frac = m.groups()
    if len(hms) == 5:
        hms += ":00"
    out = f"{date} {hms}"
    if frac:
        frac = frac.rstrip("0")
        if len(frac) > 1:
            out += frac
    return out


def _coerce_pair(a, b):
    """Comparable (value, literal) pair or None (→ undecidable).  Both
    partition-dir values (always strings) and stats values meet typed
    literals here; numbers coerce, strings compare as strings
    (timestamp-shaped strings are canonicalized first)."""
    if isinstance(b, bool):
        if isinstance(a, str):
            return {"true": True, "false": False}.get(a.lower()), b
        return (a if isinstance(a, bool) else None), b
    if isinstance(b, (int, float)):
        if isinstance(a, (int, float)):
            return a, b
        try:
            return float(a), float(b)
        except (TypeError, ValueError):
            return None, b
    if isinstance(b, str):
        if not isinstance(a, str):
            return None, b
        return _canon_ts(a), _canon_ts(b)
    return None, b


_CMP = {
    "=": lambda a, b: a == b,
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<>": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


def _cmp_exact(value, op: str, lit) -> bool:
    """Exact one-value comparison (partition columns)."""
    v, b = _coerce_pair(value, lit)
    if v is None:
        return True
    try:
        return _CMP[op](v, b)
    except TypeError:
        return True


def _cmp_range(rng, op: str, lit) -> bool:
    """Interval test: can any v in [lo, hi] satisfy ``v op lit``?"""
    lo, _ = _coerce_pair(rng[0], lit)
    hi, b = _coerce_pair(rng[1], lit)
    if lo is None or hi is None:
        return True
    try:
        if op in ("=", "=="):
            return lo <= b <= hi
        if op in ("!=", "<>"):
            return not (lo == hi == b)
        if op == "<":
            return lo < b
        if op == "<=":
            return lo <= b
        if op == ">":
            return hi > b
        if op == ">=":
            return hi >= b
    except TypeError:
        return True
    return True


def may_match(pred: Pred, stats: dict, part_vals: dict[str, str]) -> bool:
    """MAY any row of a file with these footer ``stats`` (col →
    [min, max]) and hive ``part_vals`` (col → raw directory string)
    satisfy ``pred``?  Partition columns decide exactly; stats columns
    by interval; everything else defaults to True."""
    k = pred.kind
    if k == "and":
        return all(may_match(a, stats, part_vals) for a in pred.args)
    if k == "or":
        return any(may_match(a, stats, part_vals) for a in pred.args)
    if k == "null":
        want_null = pred.args[0]
        if pred.col in part_vals:
            is_null = part_vals[pred.col] == _HIVE_NULL
            return is_null == want_null
        return True  # footer stats carry no null counts
    if k in ("cmp", "in", "between"):
        if pred.col in part_vals:
            pv = part_vals[pred.col]
            if pv == "":
                return True  # unparsable partition path — be safe
            if pv == _HIVE_NULL:
                return False  # NULL satisfies no comparison
            if k == "cmp":
                return _cmp_exact(pv, pred.op, pred.args[0])
            if k == "in":
                return any(_cmp_exact(pv, "=", a) for a in pred.args)
            return _cmp_exact(pv, ">=", pred.args[0]) and _cmp_exact(
                pv, "<=", pred.args[1]
            )
        rng = stats.get(pred.col)
        if rng is None:
            return True  # no stats for this column — must read
        if k == "cmp":
            return _cmp_range(rng, pred.op, pred.args[0])
        if k == "in":
            return any(_cmp_range(rng, "=", a) for a in pred.args)
        return _cmp_range(rng, ">=", pred.args[0]) and _cmp_range(
            rng, "<=", pred.args[1]
        )
    return True  # 'top'
