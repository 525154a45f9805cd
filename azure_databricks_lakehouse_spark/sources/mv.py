"""Materialized views with CDF-driven incremental refresh.

Databricks' DLT/SQL materialized views keep a query's result as a real
table and refresh it incrementally when the engine can prove the
update is equivalent to recomputation.  This module implements that
contract over the engine's own building blocks:

- the MV's DATA lives in an ordinary lakehouse table
  ``<name>__mvdata`` (time-travelable, RESTORE-able, OPTIMIZE-able);
- the MV's NAME is a stored view projecting the data table, so reads
  compose with the whole SQL front-end unchanged;
- refresh state (defining query + dependency version) rides the data
  table's PROPERTIES — versioned, so RESTORE rolls the refresh cursor
  back with the data.

Incremental eligibility (parsed, never guessed):

- **Grouped aggregates** ``SELECT <keys>, SUM(e)/COUNT(*)/COUNT(e)/
  AVG(e)/MIN(e)/MAX(e) [AS a] ... FROM t [WHERE p] GROUP BY <keys>``:
  maintained under ANY DML mix.  The refresh aggregates the base
  table's CDF slice with signed weights (+1 insert/update_postimage,
  −1 delete/update_preimage) into a per-group delta, then folds it
  into the stored state.  SUM's NULL semantics are kept exactly by
  storing per-SUM hidden columns (raw 0-for-NULL sum + non-NULL
  count) and reconstructing ``NULL when count = 0`` in the read view;
  groups whose row count reaches zero are dropped.  MIN/MAX fold
  optimistically and RESCAN exactly the groups whose removed values
  reached the stored extremum (:func:`retraction_delta` /
  :func:`fold_with_retraction` — the proof is in their docstrings);
  an append-only window skips the retraction bookkeeping entirely.
  Cost ∝ changed rows + |groups| + the rescanned groups' base rows —
  never the whole base table.
- **Projections/filters** (no aggregates): over a ROW-TRACKED base,
  maintained under ARBITRARY DML — the state keys on the stable row id
  (``__mv_rid``, hidden from the read view), the CDF window reduces to
  one action per id (the last event decides presence; an image failing
  the WHERE predicate deletes), and everything lands via one id-keyed
  MERGE.  Without row tracking, maintained when the CDF window is
  append-shaped (new rows projected and appended); a rewrite commit
  then falls back to full refresh (a projection's multiset rows are
  not identifiable without ids — exactly why row tracking exists).
  **Over a join** (round 12) the same machinery composes with frozen
  dims: the state keys on the FACT row id, each rid's last post-image
  re-derives its view rows through the pinned dims (a 1:N dim fans a
  rid into a multi-row group the MERGE replaces wholesale; an
  INNER-unmatched or WHERE-failed post-image deletes), and without
  row tracking the append-only fold joins just the new fact rows to
  the frozen dims.  AVG folds as SUM/COUNT state; the read view casts
  the quotient to the real AVG's analyzed output type (see
  :func:`view_body`).
- **Star-join aggregates** ``SELECT <keys>, <aggs> FROM fact [AS f]
  [INNER|LEFT] JOIN dim [AS d] ON <cond> ... [WHERE p] GROUP BY
  <keys>`` — the reference's own gold aggregation-table shape
  (``/root/reference/gold/gold_rx_claims_load.py:237-245`` aggregates
  a claims fact joined to ``dim_date``): maintained under ANY DML mix
  **on the fact table** while every dim is at its pinned version.  The
  algebra: with dims frozen, the join chain is a deterministic
  per-fact-row flatmap (each fact row maps to its join matches — one
  null-extended row for an unmatched LEFT-join row — independently of
  every other fact row), so ``Δ(fact ⋈ dims) = Δfact ⋈ dims`` holds
  multiset-exactly for any INNER/LEFT chain with the fact leftmost.
  The refresh therefore joins the fact CDF slice (weights riding
  along) to the pinned dims, canonicalizes key/agg expressions to
  fixed columns (:func:`joined_rows` + :func:`canonical_plan`), and
  folds through the SAME signed-weight machinery as the single-table
  path — MIN/MAX retraction rescans included, scoped to the unsafe
  groups' join rows.  A dim-side change (pinned version moved) also
  maintains incrementally for INNER-only chains (round 12): the exact
  delta under both fact and dim movement is the bilinear telescoping
  ``Δ(F⋈D1⋈D2) = ΔF⋈D1ᵒ⋈D2ᵒ + Fⁿ⋈ΔD1⋈D2ᵒ + Fⁿ⋈D1ⁿ⋈ΔD2`` (ᵒ pinned,
  ⁿ current; each ΔDi is that dim's CDF slice signed like any delta,
  resolved via ``change_alias``), every leg joining ONE delta slice
  against snapshots — a dim insert/delete changes fact-row
  matchedness and the algebra prices it exactly; the commit re-pins
  ``mv_dep_dims`` atomically.  Extrema fold plainly only when EVERY
  leg's window is append-only, else the retraction rescan runs
  against the CURRENT dims.  LEFT joins under a dim move (the
  null-extension flips rows the legs cannot express), unpinned dims,
  and a VACUUMed dim CDF horizon fall back to full recompute with
  re-pin.  RIGHT/FULL/CROSS/comma joins are not fact-preserving
  flatmaps — full-only.
- **SELECT DISTINCT** (round 11): ``SELECT DISTINCT <items> FROM t
  [joins] [WHERE p]`` is exactly a GROUP BY over the items with ZERO
  aggregates — the state is (keys, live count) and the same signed-
  weight fold maintains it under any DML (a key leaves the view when
  its live count reaches zero).  Star-join DISTINCT composes with the
  join canonicalization above.  DISTINCT anywhere else
  (``COUNT(DISTINCT x)``, DISTINCT over GROUP BY) stays full-only.
- **Per-key windows** (round 11): ``SELECT <items> FROM t [WHERE p]
  QUALIFY <pred>`` where every window partitions by the SAME projected
  keys — dedup-to-latest / top-k-per-key — maintained under ANY DML by
  SCOPED PER-KEY RESCAN: each output key group is a pure function of
  the base rows carrying that key, so the refresh recomputes exactly
  the key groups the CDF window touched (pre- and post-images — a
  deleted winner retracts) and lands them via one key-group MERGE
  (groups replace wholesale, so ``rn <= k`` keeps k rows; empty groups
  delete).  **Over a join** (round 12) the same rescan applies when
  every partition key is a simple qualified column of the fact or of
  a dim: fact-side keys come straight from the fact CDF and scope a
  fact-only semi-join; dim-side keys (``PARTITION BY d.seg`` — top-k
  per dim attribute) come from the CDF joined to the PINNED dims and
  scope fact ⟕semi the touched dim rows — a safe SUPERSET (the MERGE
  lands only the touched groups; semi joins never fan out).  Keys
  spread across SEVERAL dims chain one fact-semi per key-carrying dim:
  the scope is the rows whose per-dim attributes each appear in some
  touched pair — a superset of the touched pairs' rows, with only
  kdf's exact pairs landed.  EXPRESSION keys classify to one side by
  their single qualified ref (``upper(d.seg)``, ``f.k % 2``) and ride
  the same machinery — every dim row evaluating to a touched value is
  in the probe.  ORDER BY / items may reference dim columns — with
  dims frozen each group is still a pure function of its fact rows.
  A MOVED dim maintains incrementally too (round 12, INNER-only):
  the dim CDF INNER-joined to the current fact names the touched
  groups (pre images the losing group, post the gaining; fact-CDF
  keys evaluate under old AND new dims), and the rescan runs against
  the CURRENT dims with ``mv_dep_dims`` re-pinned in the same
  commit — under LEFT a dim delete shifts rows into the NULL key
  group no CDF image names, so LEFT + dim move stays full.
  Expression keys that cannot be PROVED single-sided (no qualifier,
  refs naming two aliases, a bare identifier that could be a column),
  table-name/alias capture shapes, global windows, mixed OVER
  partitioning, unprojected keys, and NULL key components fall back
  to full refresh.
- **Anything else** (subqueries, RIGHT/FULL/CROSS joins, global
  windows): the MV still works — refresh is always full recompute.

At 100 TB: the grouped path reads only the CDF slice (cost ∝ change),
aggregates with one shuffle on the group keys, and lands state sized
by group cardinality.  The fold commits as a full overwrite by
default; ``mv_fold_mode='merge'`` (or ``'auto'`` past a metadata-count
threshold) restricts the fold to the DELTA's groups and lands it via
touched-file-pruned MERGE — dead groups become MERGE-delete rows — so
a billion-group MV pays per refresh only for the groups that changed
(the upgrade ``_fold_state``'s docstring used to promise).

Relationship to ``operators/incremental.refresh_sum_aggregate``: that
is the PYTHON operator for pipeline code (fixed output shape, HLL
distinct sketches, per-group extrema RETRACTION rescan — recompute
only the groups whose deleted values reached the extremum).  This
module is the SQL statement surface: it parses arbitrary aliased
queries, reconstructs exact SQL SUM NULL semantics through a
hidden-state read view, covers projection MVs and the full-recompute
fallback, and (round 10) carries the same targeted extrema rescan —
the upgrade this paragraph used to document as pending.  Both share
the same signed-weight
CDF delta algebra; building this layer surfaced (and fixed) the
operator's NULL-sum drift.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.sources.sql import (
    _bare_idents,
    _blank_strings,
    _ci,
    _find_top_keyword,
    _mask_strings,
    _split_top,
    _unquote_ident,
)

_N = "__mv_n"  # per-group live row count (group death tracking)

_FORBIDDEN = _ci(
    r"\b(ORDER|LIMIT|DISTINCT|UNION|INTERSECT|EXCEPT|MINUS"
    r"|QUALIFY|OVER|PIVOT|LATERAL)\b"
)
# join types whose delta is NOT a per-fact-row flatmap (or that hide
# the join condition): full-refresh-only when present in the FROM
_BAD_JOIN = _ci(r"\b(RIGHT|FULL|CROSS|SEMI|ANTI|NATURAL|USING)\b")
_NONDET = _ci(
    r"\b(rand|randn|uuid|shuffle|current_timestamp|current_date|now"
    r"|monotonically_increasing_id|input_file_name)\s*\("
)
_SHAPE = _ci(
    r"^SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<from>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+GROUP\s+BY\s+(?P<gb>.+?))?"
    r"(?:\s+HAVING\s+(?P<hav>.+?))?$"
)
_JOIN_KW = _ci(r"\s+(?:INNER\s+|LEFT\s+(?:OUTER\s+)?)?JOIN\s+")
_LEFT_KW = _ci(r"^\s+LEFT\b")
_TBL_REF = _ci(r"^(?P<t>`?[\w.]+`?)(?:\s+(?:AS\s+)?(?P<a>`?\w+`?))?$")
_ON_SPLIT = _ci(r"^(?P<ref>.+?)\s+ON\s+(?P<cond>.+)$")
_SUM = _ci(r"^SUM\s*\((?P<e>.+)\)\s+AS\s+(?P<a>`?\w+`?)$")
_AVG = _ci(r"^AVG\s*\((?P<e>.+)\)\s+AS\s+(?P<a>`?\w+`?)$")
_MINMAX = _ci(r"^(?P<f>MIN|MAX)\s*\((?P<e>.+)\)\s+AS\s+(?P<a>`?\w+`?)$")
_CNT_STAR = _ci(r"^COUNT\s*\(\s*(?:\*|1)\s*\)\s+AS\s+(?P<a>`?\w+`?)$")
_CNT = _ci(r"^COUNT\s*\((?P<e>.+)\)\s+AS\s+(?P<a>`?\w+`?)$")
_ALIASED = _ci(r"^(?P<e>.+?)\s+AS\s+(?P<a>`?\w+`?)$")


@dataclass
class MvPlan:
    """Parsed incrementally-maintainable query shape."""

    table: str
    where: str | None
    grouped: bool
    keys: list[tuple[str, str]] = field(default_factory=list)  # (expr, alias)
    # (kind 'sum'|'count'|'count_star', expr|None, alias)
    aggs: list[tuple[str, str | None, str]] = field(default_factory=list)
    items: str | None = None  # raw select list (projection refresh)
    # star-join tail: (table, alias, 'inner'|'left', on-condition) per
    # JOIN clause, fact first in the FROM (empty = single-table plan)
    joins: list[tuple[str, str, str, str]] = field(default_factory=list)
    fact_alias: str | None = None
    # window plan (QUALIFY over per-key windows): maintained by SCOPED
    # per-key rescan — ``keys`` hold the shared PARTITION BY exprs
    window: bool = False
    qualify: str | None = None
    # HAVING predicate REWRITTEN over the view's aliases (grouped plans
    # only): the state keeps EVERY group — a group can enter/leave the
    # HAVING set under DML — and the read view filters.  Aggregates the
    # user didn't project ride hidden ``__mv_h{i}`` items.
    having: str | None = None


def _parse_from(from_sql: str) -> tuple[str, str, list[tuple[str, str, str, str]]] | None:
    """``(fact_table, fact_alias, joins)`` from a FROM clause, or
    ``None`` when it isn't a fact-first INNER/LEFT chain the delta
    algebra covers.  Structure (JOIN keyword spans) is found on the
    LENGTH-PRESERVING string-blanked twin so literals can't fake a
    join AND the spans stay valid on the original text (the shrinking
    ``_mask_strings`` twin would shift every offset after a literal —
    a join condition like ``d.flag = 'Y' AND f.k1 = d.k12`` would
    silently lose its last character)."""
    masked = _blank_strings(from_sql)
    if _BAD_JOIN.search(masked):
        return None
    if len(_split_top(masked, ",")) > 1:
        return None  # comma join: not fact-preserving
    hits = list(_JOIN_KW.finditer(masked))
    segs: list[tuple[str, bool]] = []  # (original segment, is_left)
    prev, prev_left = 0, False
    for h in hits:
        segs.append((from_sql[prev : h.start()], prev_left))
        prev = h.end()
        prev_left = bool(_LEFT_KW.match(masked[h.start() : h.end()]))
    segs.append((from_sql[prev:], prev_left))
    fm = _TBL_REF.match(segs[0][0].strip())
    if not fm:
        return None
    fact = _unquote_ident(fm.group("t"))
    fact_alias = (
        _unquote_ident(fm.group("a"))
        if fm.group("a")
        else fact.rsplit(".", 1)[-1]
    )
    joins: list[tuple[str, str, str, str]] = []
    seen = {fact_alias}
    for seg, is_left in segs[1:]:
        om = _ON_SPLIT.match(seg.strip())
        if not om:
            return None
        rm = _TBL_REF.match(om.group("ref").strip())
        if not rm:
            return None
        t = _unquote_ident(rm.group("t"))
        a = (
            _unquote_ident(rm.group("a"))
            if rm.group("a")
            else t.rsplit(".", 1)[-1]
        )
        if t == fact or a in seen:
            # a self-join's "dim" side changes with the fact (the
            # frozen-dim premise breaks); duplicate aliases are
            # ambiguous — both full-only
            return None
        seen.add(a)
        joins.append((t, a, "left" if is_left else "inner", om.group("cond").strip()))
    return fact, fact_alias, joins


def parse_plan(query: str) -> MvPlan | None:
    """The query as an :class:`MvPlan`, or ``None`` when its shape is
    not incrementally maintainable (full-refresh-only MV)."""
    q = " ".join(query.split())
    # SELECT DISTINCT <items> ≡ GROUP BY <items> with zero aggregates:
    # the state is (keys, live-count) and the SAME signed-weight fold
    # maintains it under any DML (a key dies when its count hits 0).
    # Only the LEADING form qualifies — DISTINCT anywhere else (e.g.
    # COUNT(DISTINCT x)) stays full-only via _FORBIDDEN below.
    dm = _ci(r"^SELECT\s+DISTINCT\s+").match(q)
    distinct = bool(dm)
    if distinct:
        q = "SELECT " + q[dm.end() :]
    # per-key window shape (QUALIFY): its OVER(...) clauses carry ORDER
    # BY text the flat forbidden-keyword scan below would reject, so it
    # parses on its own path (scoped per-key rescan maintenance)
    if not distinct and _find_top_keyword(_blank_strings(q), "QUALIFY") >= 0:
        return _parse_window_plan(q)
    masked = _mask_strings(q)
    if _FORBIDDEN.search(masked) or _NONDET.search(masked):
        return None
    if _ci(r"\(\s*SELECT\b").search(masked):
        return None  # subqueries: full-only
    m = _SHAPE.match(q)
    if not m:
        return None
    parsed_from = _parse_from(m.group("from"))
    if parsed_from is None:
        return None
    table, fact_alias, joins = parsed_from
    where = m.group("where")
    if where and _NONDET.search(_mask_strings(where)):
        return None
    items = [i.strip() for i in _split_top(m.group("items"), ",")]
    if m.group("hav") is not None and (distinct or m.group("gb") is None):
        return None  # HAVING only maintains over a grouped plan
    if distinct:
        if m.group("gb") is not None or _ci(
            r"\b(SUM|COUNT|AVG|MIN|MAX)\s*\("
        ).search(_mask_strings(m.group("items"))):
            return None  # DISTINCT over aggregates/groups: full-only
        keys = []
        pat = r"`?[\w]+`?(?:\.`?[\w]+`?)?" if joins else r"`?[\w]+`?"
        for it in items:
            am = _ALIASED.match(it)
            expr, alias = (
                (am.group("e").strip(), _unquote_ident(am.group("a")))
                if am
                else (it, None)
            )
            name = alias or (
                _unquote_ident(expr.rsplit(".", 1)[-1])
                if re.fullmatch(pat, expr)
                else None
            )
            if name is None:
                return None  # complex DISTINCT item needs an alias
            keys.append((expr, name))
        names = [a for _, a in keys]
        if len(set(names)) != len(names) or any(
            a.startswith("__mv_") for a in names
        ):
            return None
        return MvPlan(
            table, where, grouped=True, keys=keys, aggs=[],
            joins=joins, fact_alias=fact_alias,
        )
    if m.group("gb") is None:
        # projection/filter: every item must be agg-free
        if _ci(r"\b(SUM|COUNT|AVG|MIN|MAX)\s*\(").search(_mask_strings(m.group("items"))):
            # a global aggregate (no GROUP BY): treat as grouped with
            # zero keys only when EVERY item is a supported aggregate
            aggs = _parse_aggs(items)
            if aggs is None:
                return None
            return MvPlan(
                table, where, grouped=True, keys=[], aggs=aggs,
                joins=joins, fact_alias=fact_alias,
            )
        # join projections (round 12) key their state by the FACT row
        # id against frozen dims (rid MERGE replaces a fanned-out rid
        # group wholesale); without row tracking they maintain under
        # append-only windows and fall back to full otherwise
        return MvPlan(
            table, where, grouped=False, items=m.group("items"),
            joins=joins, fact_alias=fact_alias,
        )
    gb = [g.strip() for g in _split_top(m.group("gb"), ",")]
    keys: list[tuple[str, str]] = []
    agg_items: list[str] = []
    for it in items:
        am = _ALIASED.match(it)
        expr, alias = (
            (am.group("e").strip(), _unquote_ident(am.group("a")))
            if am and not _ci(r"^(SUM|COUNT)\s*\(").match(it)
            else (it, None)
        )
        if expr in gb or it in gb:
            # a join plan aggregates over CANONICAL columns, so a
            # qualified bare key (d.n_name) self-names as its last
            # segment; single-table plans evaluate exprs over the raw
            # base frame where no qualifier scope exists — strict there
            pat = r"`?[\w]+`?(?:\.`?[\w]+`?)?" if joins else r"`?[\w]+`?"
            name = alias or (
                _unquote_ident(expr.rsplit(".", 1)[-1])
                if re.fullmatch(pat, expr)
                else None
            )
            if name is None:
                return None  # complex key expression needs an alias
            keys.append((expr if expr in gb else it, name))
        else:
            agg_items.append(it)
    if len(keys) != len(gb):
        return None  # a GROUP BY expr not projected: full-only
    names = [a for _, a in keys]
    if len(set(names)) != len(names) or any(a.startswith("__mv_") for a in names):
        return None  # colliding/reserved canonical key names
    aggs = _parse_aggs(agg_items)
    if aggs is None or not aggs:
        return None
    having = None
    if m.group("hav") is not None:
        rewritten = _rewrite_having(
            m.group("hav"), aggs, [a for _, a in keys]
        )
        if rewritten is None:
            return None
        having, extra = rewritten
        aggs = aggs + extra
    return MvPlan(
        table, where, grouped=True, keys=keys, aggs=aggs,
        joins=joins, fact_alias=fact_alias, having=having,
    )


def _over_spans(text: str) -> list[tuple[int, int]] | None:
    """(start, end) byte spans of every ``OVER ( ... )`` group in the
    string-blanked ``text``; None when any is unbalanced."""
    spans: list[tuple[int, int]] = []
    for m in _ci(r"\bOVER\s*\(").finditer(text):
        depth, j = 0, m.end() - 1
        while j < len(text):
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            return None
        spans.append((m.start(), j + 1))
    return spans


# tokens that may legally appear BARE (no qualifier, no call parens)
# inside a partition-key expression without naming a column: operators,
# CASE scaffolding, literals, CAST targets and interval units.  Anything
# else bare could be a column of either join side — ambiguous, so the
# key refuses toward full-only.
_BARE_KEYWORDS = frozenset(
    """AND OR NOT CASE WHEN THEN ELSE END NULL TRUE FALSE IS IN LIKE
    ESCAPE BETWEEN CAST TRY_CAST AS DIV INTERVAL DATE TIMESTAMP
    TIMESTAMP_NTZ YEAR YEARS MONTH MONTHS WEEK WEEKS DAY DAYS HOUR
    HOURS MINUTE MINUTES SECOND SECONDS QUARTER INT INTEGER BIGINT
    SMALLINT TINYINT LONG FLOAT REAL DOUBLE DECIMAL NUMERIC STRING
    VARCHAR CHAR BOOLEAN BINARY""".split()
)
_REF = _ci(r"`?(\w+)`?\s*\.\s*`?\w+`?")


def _key_side(pk: str) -> str | None:
    """The single alias a partition-key expression resolves against,
    or None when it cannot be classified to one side: no qualified
    ref at all, refs naming two aliases, or a bare identifier that
    could be a column of either side (string literals masked first,
    call names — ``upper(`` — exempt)."""
    pm = _mask_strings(pk)
    aliases = {_unquote_ident(mm.group(1)) for mm in _REF.finditer(pm)}
    if len(aliases) != 1:
        return None
    leftover = _REF.sub(" ", pm)
    for tok in re.finditer(r"\b([A-Za-z_]\w*)\b(\s*\()?", leftover):
        if not tok.group(2) and tok.group(1).upper() not in _BARE_KEYWORDS:
            return None
    return next(iter(aliases))


def _parse_window_plan(q: str) -> MvPlan | None:
    """``SELECT <items> FROM t [WHERE p] QUALIFY <pred>`` where every
    window partitions by the SAME key expressions and each key is
    projected — the dedup-to-latest / top-k-per-key shape
    (``operators/dedup.py``'s ranking window as a materialized view).

    Maintainable by SCOPED PER-KEY RESCAN under ANY DML: a window
    partitioned by ``pk`` makes each output key group a pure function
    of the base rows carrying that key, so a refresh recomputes exactly
    the key groups the CDF window touched and lands them via one
    key-group MERGE (replace / delete per group).  Cost ∝ the affected
    keys' base rows — never the table."""
    qpos = _find_top_keyword(_blank_strings(q), "QUALIFY")
    head, qual = q[:qpos].strip(), q[qpos + 7 :].strip()
    if not qual:
        return None
    hq = head + " " + qual  # the query sans the QUALIFY keyword itself
    spans = _over_spans(_blank_strings(hq))
    if not spans:
        return None
    # forbidden/nondeterminism checks on the text OUTSIDE the windows
    # (ORDER BY belongs inside an OVER clause here) + NONDET inside too
    outside = []
    prev = 0
    for s, e in spans:
        outside.append(hq[prev:s])
        prev = e
    outside.append(hq[prev:])
    out_masked = _mask_strings(" ".join(outside))
    if _FORBIDDEN.search(out_masked) or _NONDET.search(_mask_strings(q)):
        return None
    if _ci(r"\(\s*SELECT\b").search(_mask_strings(q)):
        return None
    # every OVER must share one PARTITION BY list
    pk_norm: str | None = None
    for s, e in spans:
        inner = hq[s:e]
        pm = _ci(r"OVER\s*\(\s*PARTITION\s+BY\s+(?P<rest>.+)\)$").match(inner)
        if not pm:
            return None  # a global window cannot scope a rescan
        rest = pm.group("rest")
        rb = _blank_strings(rest)
        cuts = [
            p
            for kw in ("ORDER", "ROWS", "RANGE")
            if (p := _find_top_keyword(rb, kw)) >= 0
        ]
        pb = rest[: min(cuts)] if cuts else rest
        norm = " ".join(pb.split())
        if pk_norm is None:
            pk_norm = norm
        elif norm != pk_norm:
            return None  # mixed partitioning: no single scoping key
    m = _SHAPE.match(head)
    if not m or m.group("gb") is not None or m.group("hav") is not None:
        return None
    parsed_from = _parse_from(m.group("from"))
    if parsed_from is None:
        return None
    table, fact_alias, joins = parsed_from
    where = m.group("where")
    items = [i.strip() for i in _split_top(m.group("items"), ",")]
    pk_exprs = [p.strip() for p in _split_top(pk_norm, ",")]
    if joins:
        # window-over-join (round 12): maintainable by the scoped
        # per-key rescan when every partition key resolves against ONE
        # side (a qualified column, or an EXPRESSION whose qualified
        # refs all name one alias and whose other tokens are provably
        # not columns).  Fact-side keys: the fact CDF alone names the
        # touched groups and the scope is a fact-only semi-join.
        # Dim-side keys (PARTITION BY d.seg — top-k per dim
        # attribute): touched keys come from the CDF joined to the
        # PINNED dims, and the scope is fact ⟕semi the touched dim
        # rows — a SUPERSET of the needed rows (safe: the MERGE
        # replaces only kdf's groups; for an expression key EVERY dim
        # row evaluating to a touched value is in the probe), never a
        # fan-out.  Keys spread across SEVERAL dims chain one
        # fact-semi per dim.
        sides: set[str] = set()
        for pk in pk_exprs:
            side = _key_side(pk)
            if side is None:
                return None
            sides.add(side)
        dim_aliases = {a for _, a, _, _ in joins}
        if not sides <= ({fact_alias} | dim_aliases):
            return None
        # the rescan substitutes TABLE NAMES in the body text: renaming
        # a table captures any OTHER ref's alias spelled the same way
        # (a ref aliased AS its own table name renames consistently and
        # stays safe) — refuse the capture shapes, full-only
        refs = [(table, fact_alias)] + [(t, a) for t, a, _, _ in joins]
        for _rt, ra in refs:
            for st, _sa in refs:
                if ra == st and _rt != st:
                    return None
    keys: list[tuple[str, str]] = []
    for pk in pk_exprs:
        name = None
        for it in items:
            am = _ALIASED.match(it)
            expr, alias = (
                (am.group("e").strip(), _unquote_ident(am.group("a")))
                if am
                else (it, None)
            )
            # pk is whitespace-normalized (from the OVER clause);
            # normalize the projected expression the same way so an
            # expression key matches its item regardless of spacing
            if " ".join(expr.split()) == pk or " ".join(it.split()) == pk:
                bare = r"`?[\w]+`?(?:\.`?[\w]+`?)?" if joins else r"`?[\w]+`?"
                name = alias or (
                    _unquote_ident(pk.rsplit(".", 1)[-1])
                    if re.fullmatch(bare, pk)
                    else None
                )
                break
        if name is None:
            return None  # a partition key the view doesn't project
        keys.append((pk, name))
    names = [a for _, a in keys]
    if len(set(names)) != len(names) or any(
        a.startswith("__mv_") for a in names
    ):
        return None
    return MvPlan(
        table,
        where,
        grouped=False,
        keys=keys,
        items=m.group("items"),
        joins=joins,
        fact_alias=fact_alias,
        window=True,
        qualify=qual,
    )


def _parse_aggs(items: list[str]) -> list[tuple[str, str | None, str]] | None:
    out: list[tuple[str, str | None, str]] = []
    for it in items:
        cm = _CNT_STAR.match(it)
        if cm:
            out.append(("count_star", None, _unquote_ident(cm.group("a"))))
            continue
        sm = _SUM.match(it)
        if sm:
            out.append(
                ("sum", sm.group("e").strip(), _unquote_ident(sm.group("a")))
            )
            continue
        vm = _AVG.match(it)
        if vm:
            # AVG is SUM/COUNT: same hidden state as SUM, the read view
            # reconstructs the quotient (type-exact CAST computed from
            # the defining query's own analyzed schema at CREATE)
            out.append(
                ("avg", vm.group("e").strip(), _unquote_ident(vm.group("a")))
            )
            continue
        nm = _CNT.match(it)
        if nm:
            out.append(
                ("count", nm.group("e").strip(), _unquote_ident(nm.group("a")))
            )
            continue
        mm = _MINMAX.match(it)
        if mm:
            out.append(
                (
                    mm.group("f").lower(),
                    mm.group("e").strip(),
                    _unquote_ident(mm.group("a")),
                )
            )
            continue
        return None  # AVG/unaliased/unknown aggregates: full-only
    return out


def joined_rows(
    plan: MvPlan,
    fact: DataFrame,
    dims: dict[str, DataFrame],
    extra_cols: tuple[str, ...] = (),
    change_alias: str | None = None,
) -> DataFrame:
    """The join plan's pre-aggregation rows, CANONICALIZED: the fact
    frame (a snapshot, or a CDF slice whose ``extra_cols`` ride along
    fact-qualified) joined through the plan's INNER/LEFT chain against
    ``dims`` (alias → frozen dim frame), WHERE applied, and every key /
    aggregate-argument expression projected to a fixed column — keys
    under their aliases, agg args as ``__mv_e{i}``.  Downstream the
    SINGLE-TABLE machinery (:func:`full_state` / :func:`delta_state` /
    :func:`retraction_delta`) runs unchanged over these rows via
    :func:`canonical_plan`.

    ``change_alias`` resolves ``extra_cols`` against a DIM alias
    instead of the fact — the dim-delta leg of a dim-change refresh
    passes a dim CDF slice as that alias's frame and rides its
    ``_change_type`` out as the row sign."""
    fa = plan.fact_alias or plan.table.rsplit(".", 1)[-1]
    df = fact.alias(fa)
    for t, a, jt, cond in plan.joins:
        df = df.join(dims[a].alias(a), F.expr(cond), jt)
    if plan.where:
        df = df.filter(F.expr(plan.where))
    sel = [F.expr(e).alias(a) for e, a in plan.keys]
    sel += [
        F.expr(e).alias(f"__mv_e{i}")
        for i, (_, e, _) in enumerate(plan.aggs)
        if e is not None
    ]
    sel += [
        F.col(f"{change_alias or fa}.{c}").alias(c) for c in extra_cols
    ]
    return df.select(*sel)


def canonical_plan(plan: MvPlan) -> MvPlan:
    """``plan`` rewritten against :func:`joined_rows` output: keys are
    their own aliases, agg args are the ``__mv_e{i}`` columns, WHERE and
    joins already folded in.  State columns, read view and fold algebra
    are IDENTICAL to the original plan's (same aliases, same agg kinds
    in the same order), so the stored state is interchangeable."""
    return MvPlan(
        plan.table,
        None,
        grouped=True,
        keys=[(a, a) for _, a in plan.keys],
        aggs=[
            (kind, None if e is None else f"__mv_e{i}", alias)
            for i, (kind, e, alias) in enumerate(plan.aggs)
        ],
    )


_AGG_CALL = _ci(r"\b(SUM|COUNT|AVG|MIN|MAX)\s*\(")


def _rewrite_having(
    hav: str,
    aggs: list[tuple[str, str | None, str]],
    key_names: list[str],
) -> tuple[str, list[tuple[str, str | None, str]]] | None:
    """``(having-over-aliases, hidden extra agg items)`` — every
    aggregate call in the HAVING text is replaced by the alias of the
    matching projected item, or by a fresh HIDDEN item (``__mv_h{i}``)
    the state maintains but the read view projects away.  The view
    then filters ``WHERE <rewritten>`` over the reconstructed aliases,
    so a group entering/leaving the HAVING set under DML is just a
    row appearing/disappearing from the filtered read.  None when a
    call isn't a supported aggregate — full-only.  A hidden AVG
    (round 12) maintains like any item; its exact output type comes
    from a probe query analyzed at CREATE (sql.py ``avg_types``)."""
    if _NONDET.search(_mask_strings(hav)):
        return None
    blanked = _blank_strings(hav)
    spans: list[tuple[int, int]] = []
    for am in _AGG_CALL.finditer(blanked):
        depth, j = 0, am.end() - 1
        while j < len(blanked):
            if blanked[j] == "(":
                depth += 1
            elif blanked[j] == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if depth != 0:
            return None
        spans.append((am.start(), j + 1))
    # keep OUTERMOST spans only (a nested aggregate is invalid SQL
    # anyway, but a corrupted rewrite must never reach the parser)
    spans = [
        (s, e)
        for s, e in spans
        if not any(os_ < s and e <= oe for os_, oe in spans if (os_, oe) != (s, e))
    ]
    if not spans:
        return None  # HAVING without an aggregate: use WHERE instead
    existing = {
        (kind, " ".join(e.split()) if e else None): alias
        for kind, e, alias in aggs
    }
    extra: list[tuple[str, str | None, str]] = []
    out = hav
    for s, e in reversed(spans):
        call = hav[s:e]
        parsed = _parse_aggs([f"{call} AS __mv_probe"])
        if parsed is None:
            return None
        kind, expr, _ = parsed[0]
        key = (kind, " ".join(expr.split()) if expr else None)
        alias = existing.get(key)
        if alias is None:
            # hidden AVG (round 12): its exact output type comes from a
            # one-column probe analyzed against the base schema at
            # CREATE (sql.py avg_types) — same machinery as a projected
            # AVG, so it maintains incrementally like any other item
            alias = f"__mv_h{len(extra)}"
            existing[key] = alias
            extra.append((kind, expr, alias))
        out = out[:s] + f"`{alias}`" + out[e:]
    # every remaining column-like reference must be a KEY ALIAS (the
    # only non-aggregate columns the read view exposes): a raw GROUP BY
    # expression or unaliased base column would make the view filter on
    # a column the state table does not have — full-only instead of an
    # unresolvable view
    allowed = set(key_names) | {alias for _, _, alias in aggs} | {
        alias for _, _, alias in extra
    }
    if any(w not in allowed for w in _bare_idents(out)):
        return None
    return out, extra


def has_extrema(plan: MvPlan) -> bool:
    """True when the plan carries MIN/MAX items — maintainable only
    under append-only windows (an extreme is not decrementable: deleting
    the current minimum needs a per-group rescan)."""
    return any(k in ("min", "max") for k, _, _ in plan.aggs)


# -- state shapes -----------------------------------------------------------


def state_columns(plan: MvPlan) -> list[str]:
    cols = [a for _, a in plan.keys] + [_N]
    for i, (kind, _, _) in enumerate(plan.aggs):
        if kind in ("sum", "avg"):
            cols += [f"__mv_s{i}", f"__mv_c{i}"]
        elif kind == "count":
            cols += [f"__mv_c{i}"]
        elif kind in ("min", "max"):
            cols += [f"__mv_m{i}"]
    return cols


def view_body(
    plan: MvPlan, data_name: str, avg_types: dict[int, str] | None = None
) -> str:
    """The read view reconstructing user columns from hidden state.
    ``avg_types`` maps an AVG item's index to the DDL type of the REAL
    ``AVG(e)`` (taken from the defining query's analyzed schema at
    CREATE) — the stored sum has Spark's internal sum type, so
    ``CAST(s / c AS <type>)`` reproduces Average's own divide+cast
    bit-for-bit."""
    sel = [f"`{a}`" for _, a in plan.keys]
    for i, (kind, _, alias) in enumerate(plan.aggs):
        if kind == "avg":
            t = (avg_types or {}).get(i)
            q = f"`__mv_s{i}` / `__mv_c{i}`"
            if t:
                q = f"CAST({q} AS {t})"
            sel.append(
                f"CASE WHEN `__mv_c{i}` = 0 THEN NULL ELSE {q} END"
                f" AS `{alias}`"
            )
        elif kind == "sum":
            sel.append(
                f"CASE WHEN `__mv_c{i}` = 0 THEN NULL ELSE `__mv_s{i}` END"
                f" AS `{alias}`"
            )
        elif kind == "count":
            sel.append(f"`__mv_c{i}` AS `{alias}`")
        elif kind in ("min", "max"):
            sel.append(f"`__mv_m{i}` AS `{alias}`")
        else:
            sel.append(f"`{_N}` AS `{alias}`")
    return f"SELECT {', '.join(sel)} FROM {data_name}"


def full_state(base: DataFrame, plan: MvPlan) -> DataFrame:
    """Hidden-column state recomputed from a base snapshot."""
    if plan.where:
        base = base.filter(F.expr(plan.where))
    keys = [F.expr(e).alias(a) for e, a in plan.keys]
    aggs = [F.count(F.lit(1)).cast("long").alias(_N)]
    for i, (kind, e, _) in enumerate(plan.aggs):
        if kind in ("sum", "avg"):
            x = F.expr(e)
            # raw sum keeps the SUM's natural type (double stays double)
            aggs.append(F.coalesce(F.sum(x), F.lit(0)).alias(f"__mv_s{i}"))
            aggs.append(F.count(x).cast("long").alias(f"__mv_c{i}"))
        elif kind == "count":
            aggs.append(F.count(F.expr(e)).cast("long").alias(f"__mv_c{i}"))
        elif kind == "min":
            aggs.append(F.min(F.expr(e)).alias(f"__mv_m{i}"))
        elif kind == "max":
            aggs.append(F.max(F.expr(e)).alias(f"__mv_m{i}"))
    if keys:
        return base.groupBy(*keys).agg(*aggs)
    return base.agg(*aggs)


def delta_state(changes: DataFrame, plan: MvPlan) -> DataFrame:
    """Signed-weight aggregate of a CDF slice — same shape as
    :func:`full_state` but each row contributes ±1."""
    w = (
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        )
        .when(
            F.col("_change_type").isin("delete", "update_preimage"),
            F.lit(-1),
        )
        .otherwise(F.lit(0))
    )
    df = changes.withColumn("__mv_w", w).filter(F.col("__mv_w") != 0)
    if plan.where:
        df = df.filter(F.expr(plan.where))
    keys = [F.expr(e).alias(a) for e, a in plan.keys]
    aggs = [F.sum("__mv_w").cast("long").alias(_N)]
    for i, (kind, e, _) in enumerate(plan.aggs):
        if kind in ("sum", "avg"):
            x = F.expr(e)
            aggs.append(
                F.coalesce(
                    F.sum(F.col("__mv_w") * F.coalesce(x, F.lit(0))),
                    F.lit(0),
                ).alias(f"__mv_s{i}")
            )
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.col("__mv_w")
                        * F.when(x.isNotNull(), 1).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"__mv_c{i}")
            )
        elif kind == "count":
            x = F.expr(e)
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.col("__mv_w")
                        * F.when(x.isNotNull(), 1).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"__mv_c{i}")
            )
        elif kind in ("min", "max"):
            # only meaningful over an append-only window (the caller
            # checks); negative-weight rows never reach here then
            fn = F.min if kind == "min" else F.max
            aggs.append(fn(F.expr(e)).alias(f"__mv_m{i}"))
    if keys:
        return df.groupBy(*keys).agg(*aggs)
    return df.agg(*aggs)


def retraction_delta(changes: DataFrame, plan: MvPlan) -> DataFrame:
    """Signed counter delta PLUS per-extremum retraction evidence, for
    MIN/MAX maintenance under ARBITRARY DML (the targeted-rescan
    upgrade the module docstring promised):

    - counters (``_N``, sums, counts): exactly :func:`delta_state`;
    - per extremum item i: ``__mv_p{i}`` = the extremum over INSERTED
      values (insert/update_postimage rows), ``__mv_r{i}`` = the
      extremum over REMOVED values (delete/update_preimage rows), and
      ``__mv_rc{i}`` = how many removed rows carried a non-NULL value.

    The fold can then prove, per group, whether the stored extremum
    SURVIVED the window: if every removed value is strictly dominated
    by the stored extremum, the true new extremum is
    ``greatest/least(stored, inserted)`` — any inserted-then-removed
    value is dominated too, so the optimistic fold is exact.  Groups
    where a removed value reached the stored extremum (or where there
    is no stored extremum to compare against — a group born in the
    window with intra-window removals) need a rescan."""
    w = (
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        )
        .when(
            F.col("_change_type").isin("delete", "update_preimage"),
            F.lit(-1),
        )
        .otherwise(F.lit(0))
    )
    df = changes.withColumn("__mv_w", w).filter(F.col("__mv_w") != 0)
    if plan.where:
        df = df.filter(F.expr(plan.where))
    keys = [F.expr(e).alias(a) for e, a in plan.keys]
    pos = F.col("__mv_w") == 1
    aggs = [F.sum("__mv_w").cast("long").alias(_N)]
    for i, (kind, e, _) in enumerate(plan.aggs):
        x = F.expr(e)
        if kind in ("sum", "avg"):
            aggs.append(
                F.coalesce(
                    F.sum(F.col("__mv_w") * F.coalesce(x, F.lit(0))),
                    F.lit(0),
                ).alias(f"__mv_s{i}")
            )
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.col("__mv_w") * F.when(x.isNotNull(), 1).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"__mv_c{i}")
            )
        elif kind == "count":
            aggs.append(
                F.coalesce(
                    F.sum(
                        F.col("__mv_w") * F.when(x.isNotNull(), 1).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias(f"__mv_c{i}")
            )
        elif kind in ("min", "max"):
            fn = F.min if kind == "min" else F.max
            aggs.append(fn(F.when(pos, x)).alias(f"__mv_p{i}"))
            aggs.append(fn(F.when(~pos, x)).alias(f"__mv_r{i}"))
            aggs.append(
                F.count(F.when(~pos, x)).cast("long").alias(f"__mv_rc{i}")
            )
    if keys:
        return df.groupBy(*keys).agg(*aggs)
    return df.agg(*aggs)


def fold_with_retraction(
    old: DataFrame, delta: DataFrame, plan: MvPlan, keep_dead: bool = False
) -> DataFrame:
    """``old ⊕ retraction_delta``: counters fold as in
    :func:`_fold_state`; each extremum folds OPTIMISTICALLY
    (``greatest/least(stored, inserted)``) and the result carries one
    extra boolean ``__mv_unsafe`` marking groups whose optimistic fold
    is unsound — the caller rescans exactly those groups from the base
    snapshot.  Grouped plans only (the caller handles the global
    one-row case with a scalar check)."""
    key_names = [a for _, a in plan.keys]
    ext = {
        i: kind
        for i, (kind, _, _) in enumerate(plan.aggs)
        if kind in ("min", "max")
    }
    counters = [
        c
        for c in state_columns(plan)
        if c not in key_names and not c.startswith("__mv_m")
    ]
    o = old.alias("o")
    d = delta.alias("d")
    cond = None
    for k in key_names:
        eq = F.col(f"o.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = eq if cond is None else cond & eq
    sel = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"d.{k}")).alias(k)
        for k in key_names
    ]
    sel += [
        (
            F.coalesce(F.col(f"o.{c}"), F.lit(0))
            + F.coalesce(F.col(f"d.{c}"), F.lit(0))
        ).alias(c)
        for c in counters
    ]
    unsafe = F.lit(False)
    for i, kind in ext.items():
        stored = F.col(f"o.__mv_m{i}")
        fold = (F.least if kind == "min" else F.greatest)(
            stored, F.col(f"d.__mv_p{i}")
        )
        sel.append(fold.alias(f"__mv_m{i}"))
        dominated = (
            F.col(f"d.__mv_r{i}") > stored
            if kind == "min"
            else F.col(f"d.__mv_r{i}") < stored
        )
        # unsafe: removals happened AND we cannot PROVE the stored
        # extremum survived (stored NULL, or a removed value reached
        # it — the NULL comparison lands here via coalesce(False))
        unsafe = unsafe | (
            (F.coalesce(F.col(f"d.__mv_rc{i}"), F.lit(0)) > 0)
            & ~F.coalesce(stored.isNotNull() & dominated, F.lit(False))
        )
    sel.append(unsafe.alias("__mv_unsafe"))
    merged = o.join(d, cond, "fullOuter").select(*sel)
    if keep_dead:
        # keyed-MERGE fold: dead groups become DELETE rows instead of
        # silently vanishing from an overwritten state
        return merged.withColumn("__mv_dead", F.col(_N) <= 0)
    return merged.filter(F.col(_N) > 0)


def global_fold_safe(delta_row, old_row, plan: MvPlan) -> bool:
    """Scalar safety check for the KEYLESS extrema fold: True iff every
    extremum provably survived the window's removals (same rule as
    :func:`fold_with_retraction`, evaluated on the two one-row
    states)."""
    for i, (kind, _, _) in enumerate(plan.aggs):
        if kind not in ("min", "max"):
            continue
        if (delta_row[f"__mv_rc{i}"] or 0) == 0:
            continue
        stored = old_row[f"__mv_m{i}"] if old_row is not None else None
        removed = delta_row[f"__mv_r{i}"]
        if stored is None:
            return False
        if kind == "max" and not removed < stored:
            return False
        if kind == "min" and not removed > stored:
            return False
    return True


def global_fold(old: DataFrame, delta: DataFrame, plan: MvPlan) -> DataFrame:
    """Keyless ``old ⊕ retraction_delta`` (both one row): counters sum,
    extrema fold ``least/greatest(stored, inserted)`` — only called
    after :func:`global_fold_safe` proved the fold exact.  DataFrame
    arithmetic throughout, so sum/extremum types (decimal scales
    included) are preserved exactly."""
    key_names: list[str] = []
    extrema = {
        f"__mv_m{i}": (i, kind)
        for i, (kind, _, _) in enumerate(plan.aggs)
        if kind in ("min", "max")
    }
    counters = [
        c
        for c in state_columns(plan)
        if c not in key_names and c not in extrema
    ]
    cols = counters + list(extrema)
    o = old.select([F.col(c).alias(f"__o_{c}") for c in cols])
    d_cols = [
        F.col(c).alias(f"__d_{c}") for c in counters
    ] + [
        F.col(f"__mv_p{i}").alias(f"__d_{c}")
        for c, (i, _k) in extrema.items()
    ]
    d = delta.select(d_cols)
    sel = [
        (
            F.coalesce(F.col(f"__o_{c}"), F.lit(0))
            + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
        ).alias(c)
        for c in counters
    ] + [
        (F.least if kind == "min" else F.greatest)(
            F.col(f"__o_{c}"), F.col(f"__d_{c}")
        ).alias(c)
        for c, (_i, kind) in extrema.items()
    ]
    return o.crossJoin(d).select(*sel)


def _fold_state(
    old: DataFrame, delta: DataFrame, plan: MvPlan, keep_dead: bool = False
) -> DataFrame:
    """old ⊕ delta: null-safe full-outer join on the group keys, summed
    hidden columns, dead groups (row count 0) dropped — or, with
    ``keep_dead`` (the keyed-MERGE fold this docstring used to promise),
    kept and flagged ``__mv_dead`` so they become MERGE deletes."""
    key_names = [a for _, a in plan.keys]
    extrema = {
        f"__mv_m{i}": kind
        for i, (kind, _, _) in enumerate(plan.aggs)
        if kind in ("min", "max")
    }
    counters = [
        c
        for c in state_columns(plan)
        if c not in key_names and c not in extrema
    ]

    def _combine(oc, dc):
        adds = [
            (
                F.coalesce(oc(c), F.lit(0)) + F.coalesce(dc(c), F.lit(0))
            ).alias(c)
            for c in counters
        ]
        # least/greatest SKIP NULLs (Spark contract): a side with no
        # observation never wins, all-NULL stays NULL
        folds = [
            (F.least if kind == "min" else F.greatest)(oc(c), dc(c)).alias(c)
            for c, kind in extrema.items()
        ]
        return adds + folds

    if not key_names:
        # global aggregate: both sides are exactly one row
        cols = counters + list(extrema)
        o = old.select([F.col(c).alias(f"__o_{c}") for c in cols])
        d = delta.select([F.col(c).alias(f"__d_{c}") for c in cols])
        return o.crossJoin(d).select(
            *_combine(
                lambda c: F.col(f"__o_{c}"), lambda c: F.col(f"__d_{c}")
            )
        )
    o = old.alias("o")
    d = delta.alias("d")
    cond = None
    for k in key_names:
        eq = F.col(f"o.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = eq if cond is None else cond & eq
    merged = o.join(d, cond, "fullOuter").select(
        *[
            F.coalesce(F.col(f"o.{k}"), F.col(f"d.{k}")).alias(k)
            for k in key_names
        ],
        *_combine(
            lambda c: F.col(f"o.{c}"), lambda c: F.col(f"d.{c}")
        ),
    )
    if keep_dead:
        return merged.withColumn("__mv_dead", F.col(_N) <= 0)
    return merged.filter(F.col(_N) > 0)


def append_only_window(table, start: int, end: int) -> bool:
    """True when every commit in ``(start, end]`` is append-shaped —
    a METADATA-ONLY check reading exactly the window's manifests (not
    the whole history: a long-lived table's refresh must cost the
    WINDOW, never its age)."""
    ops = {
        table._manifest(v)["operation"] for v in range(start + 1, end + 1)
    }
    return ops <= {"APPEND", "COPY INTO", "TXN APPEND"}
