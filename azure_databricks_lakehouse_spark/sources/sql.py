"""Delta-flavored SQL front-end for the lakehouse table layer.

Reference parity: the reference drives its lakehouse through SQL strings —
``spark.sql("CREATE TABLE IF NOT EXISTS bronze.rx_claims USING DELTA
LOCATION ...")`` (``bronze/bronze_rx_claims_load.py:77``,
``gold/gold_rx_claims_load.py:79-232``), ``README.md:50`` ("Use Databricks
SQL or Spark SQL to query curated tables") and
``bronze_silver_gold/readme.md:96-109`` (routine ``OPTIMIZE`` / ``Z-ORDER``
/ ``VACUUM`` maintenance).  Open-source Spark cannot parse Delta DDL/DML
against this engine's versioned-parquet tables, so :class:`Lakehouse`
closes the gap: it recognizes the Delta-style statement forms the
reference (and a Databricks user generally) writes, routes them to the
:class:`~.tables.ParquetTable` API — which owns all the pruning, deletion
-vector, conflict-detection, and clustering machinery — and hands plain
queries to Catalyst via ``spark.sql`` after rewriting lakehouse table
references (including ``VERSION AS OF`` / ``TIMESTAMP AS OF`` and the
``table_changes`` TVF) into snapshot temp views.

Scale stance: this module is a string→API router.  Parsing cost is
O(statement length) on the driver; every data-touching path is exactly
the same file-pruned / broadcast-aware / codegen table-layer code the
Python API exercises, so nothing here changes any query plan.

Honest limits (each raises with a message naming the supported form):

- ``MERGE`` supports the reference's updateAll/insertAll shapes
  (``gold/gold_rx_claims_load.py:216-221``) on a dedicated fast path,
  plus the general Delta clause forms — per-column ``UPDATE SET c = e``
  (expressions may reference both aliases), ``INSERT (cols) VALUES
  (exprs)``, predicated clauses, ``DELETE``, and ``WHEN NOT MATCHED
  BY SOURCE [AND p] THEN UPDATE SET ... | DELETE`` — via a post-image
  rewrite feeding the same table-layer merge.  Multiple source rows
  matching one target row abort with Delta's nondeterminism error
  (the table layer's ``validate_source_keys`` guard).
- Time-travel rewriting recognizes table names immediately after
  ``FROM`` / ``JOIN``; a lakehouse table aliased through a correlated
  nested reference still works because the CURRENT snapshot of every
  referenced table is registered as a view under its own name first.
"""

from __future__ import annotations

import json
import os
import re
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_databricks_lakehouse_spark.plans import cbo
from azure_databricks_lakehouse_spark.sources.tables import (
    CorrelatedCondition,
    ParquetTable,
    _schema_from_json,
    is_table,
)

_CATALOG_FILE = "_lakehouse_catalog.json"


def _ci(pattern: str) -> re.Pattern:
    return re.compile(pattern, re.IGNORECASE | re.DOTALL)


def _strip_stmt(stmt: str) -> str:
    """Drop ``--`` line comments (outside quotes) and the trailing ``;``."""
    out: list[str] = []
    quote = None
    i = 0
    while i < len(stmt):
        ch = stmt[i]
        if quote:
            out.append(ch)
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"', "`"):
            quote = ch
            out.append(ch)
            i += 1
            continue
        if ch == "-" and stmt[i : i + 2] == "--":
            j = stmt.find("\n", i)
            if j < 0:
                break
            i = j  # keep the newline as whitespace
            continue
        if ch == "/" and stmt[i : i + 2] == "/*":
            j = stmt.find("*/", i + 2)
            if j < 0:
                break  # unterminated block comment swallows the rest
            out.append(" ")  # comment acts as a token separator
            i = j + 2
            continue
        out.append(ch)
        i += 1
    return "".join(out).strip().rstrip(";").strip()


def _split_statements(script: str) -> list[str]:
    """Split a multi-statement script on ``;`` — only at top level:
    never inside ``'...'`` / ``"..."`` / `` `...` `` literals, ``--``
    line comments, or ``/* */`` block comments.  Comment text is kept
    with its statement (``_strip_stmt`` removes it later)."""
    parts: list[str] = []
    cur: list[str] = []
    quote = None
    i, n = 0, len(script)
    while i < n:
        ch = script[i]
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            i += 1
            continue
        if ch in ("'", '"', "`"):
            quote = ch
            cur.append(ch)
            i += 1
            continue
        if ch == "-" and script[i : i + 2] == "--":
            j = script.find("\n", i)
            j = n if j < 0 else j
            cur.append(script[i:j])
            i = j
            continue
        if ch == "/" and script[i : i + 2] == "/*":
            j = script.find("*/", i + 2)
            j = n if j < 0 else j + 2
            cur.append(script[i:j])
            i = j
            continue
        if ch == ";":
            parts.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return [p for p in (s.strip() for s in parts) if p]


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren depth 0 outside quotes/backticks."""
    parts: list[str] = []
    depth = 0
    quote = None
    cur: list[str] = []
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"', "`"):
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _split_cols(s: str) -> list[str]:
    """Column-definition splitter: like :func:`_split_top` but ALSO
    tracks ``<...>`` nesting, so generic types (``map<string,int>``,
    ``struct<a:int,b:string>``) keep their commas.  Only used where the
    text is a column list — in expression contexts ``<`` is a
    comparison and must not open a depth level."""
    parts: list[str] = []
    depth = 0
    quote = None
    cur: list[str] = []
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"', "`"):
            quote = ch
        elif ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            continue
        cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _find_top_keyword(s: str, kw: str) -> int:
    """Index of the first ``kw`` at paren depth 0 outside quotes (word-
    boundary match, case-insensitive); -1 if absent.  The literal-blind
    regex alternative matches a 'where' INSIDE a string constant."""
    depth = 0
    quote = None
    n, k = len(s), len(kw)
    for i in range(n):
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and s[i : i + k].upper() == kw
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (
                i + k >= n
                or not (s[i + k].isalnum() or s[i + k] == "_")
            )
        ):
            return i
    return -1


def _unquote_ident(name: str) -> str:
    name = name.strip()
    if name.startswith("`") and name.endswith("`"):
        return name[1:-1]
    return name


def _render_sql_literal(v, ddl_type: str, spark=None) -> str | None:
    """A JSON-safe ANALYZE stat value as a SQL literal expression of the
    column's DECLARED type, or ``None`` when it can't be rendered
    exactly (float NaN).  Temporal/decimal stats are stored as their
    ISO / exact string forms (``_stat_scalar``), so the string→type
    CAST is lossless; float reprs are shortest-round-trip, so the
    double literal parses back bit-identical.

    Quote escaping doubles the quote (``''``) — valid under BOTH
    parser modes.  Backslash handling is the mode-dependent part:
    under the default ``spark.sql.parser.escapedStringLiterals=false``
    a backslash escapes and must be doubled; under ``true`` it is a
    plain character.  The active conf decides; with no session to
    consult, a backslash-carrying value returns None (real scan)
    rather than risk a corrupted literal."""
    import math

    if v is None:
        return f"CAST(NULL AS {ddl_type})"
    if isinstance(v, bool):
        return f"CAST({'TRUE' if v else 'FALSE'} AS {ddl_type})"
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if math.isinf(v):
            s = "'Infinity'" if v > 0 else "'-Infinity'"
            return f"CAST({s} AS {ddl_type})"
        return f"CAST({v!r} AS {ddl_type})"
    if isinstance(v, int):
        return f"CAST({v} AS {ddl_type})"
    if isinstance(v, str):
        esc = v.replace("'", "''")
        if "\\" in esc:
            if spark is None:
                return None
            raw = (
                spark.conf.get(
                    "spark.sql.parser.escapedStringLiterals", "false"
                ).lower()
                == "true"
            )
            if not raw:
                esc = esc.replace("\\", "\\\\")
        return f"CAST('{esc}' AS {ddl_type})"
    return None


def _ident_list(raw: str) -> list[str]:
    return [_unquote_ident(c) for c in _split_top(raw, ",")]


def _split_top_and(s: str) -> list[str]:
    """Split a predicate on top-level ``AND`` (outside parens/quotes)."""
    parts: list[str] = []
    rest = s
    while True:
        i = _find_top_keyword(rest, "AND")
        if i < 0:
            parts.append(rest.strip())
            return parts
        parts.append(rest[:i].strip())
        rest = rest[i + 3 :]


def _top_eq_split(s: str) -> tuple[str, str] | None:
    """Split ``s`` at its single top-level ``=`` (not ``>=``/``<=``/
    ``!=``/``<>``/``==``), outside parens and quotes; None if absent."""
    depth = 0
    quote = None
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"', "`"):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "=" and depth == 0:
            if i > 0 and s[i - 1] in "<>!=":
                continue
            if i + 1 < len(s) and s[i + 1] == "=":
                continue
            return s[:i], s[i + 1 :]
    return None


def _mask_strings(s: str) -> str:
    """``s`` with every quoted literal's CONTENT blanked out (the
    quotes stay) — for keyword-presence checks that must not fire on
    text inside a string, e.g. ``WHERE note = 'x (select y)'`` is a
    row-wise predicate, not a subquery.  Handles ``''`` doubling and
    backslash escapes inside single/double-quoted literals."""
    return re.sub(
        r"('|\")(?:\\.|\1\1|(?:(?!\1)[^\\]))*\1",
        lambda m: m.group(1) * 2,
        s,
    )


# words an expression may use without naming a column
_SQL_WORDS = frozenset(
    {
        "and", "or", "not", "in", "is", "null", "true", "false",
        "case", "when", "then", "else", "end", "between", "like",
        "div", "distinct", "interval", "asc", "desc", "as",
    }
)


def _bare_idents(text: str) -> set[str]:
    """Column-like identifiers in ``text`` (string-blanked): bare or
    backticked words that are not SQL keywords and not function calls
    (followed by ``(``)."""
    b = _blank_strings(text)
    out: set[str] = set()
    for m in re.finditer(r"`([^`]+)`|\b([A-Za-z_]\w*)\b", b):
        if m.group(1):
            out.add(m.group(1))
            continue
        word = m.group(2)
        j = m.end()
        while j < len(b) and b[j].isspace():
            j += 1
        if j < len(b) and b[j] == "(":
            continue  # function call
        if word.lower() in _SQL_WORDS:
            continue
        out.add(word)
    return out


def _blank_strings(s: str) -> str:
    """Length-preserving :func:`_mask_strings`: literal content becomes
    spaces instead of vanishing, so indexes computed on the masked text
    (paren matching, span splicing) are valid on the ORIGINAL text."""
    return re.sub(
        r"('|\")(?:\\.|\1\1|(?:(?!\1)[^\\]))*\1",
        lambda m: m.group(1) + " " * (len(m.group(0)) - 2) + m.group(1),
        s,
    )


# words that terminate a table-ref list / can never be a table alias
_FROM_STOP_WORDS = frozenset(
    {
        "where", "group", "order", "limit", "having", "qualify", "on",
        "using", "join", "inner", "left", "right", "full", "cross",
        "outer", "union", "intersect", "except", "lateral", "natural",
        "anti", "semi", "window", "values", "tablesample", "pivot",
        "unpivot", "distribute", "cluster", "sort", "for", "when",
        "and", "or", "not", "in", "is", "set", "as",
    }
)


def _from_decl_names(sql: str) -> tuple[set[str], set[str]]:
    """Table names and aliases DECLARED by ``FROM`` / ``JOIN`` clauses
    in ``sql``, lower-cased and unquoted: ``(declared at the
    statement's own top level, declared at any nesting depth)``.

    Used for correlation classification (SQL name scoping): in
    ``UPDATE t SET c = (SELECT max(x) FROM s AS t WHERE t.k = 1)`` the
    inner alias ``t`` SHADOWS the target, so ``t.k`` is an inner-scope
    reference and the subquery is uncorrelated — the pre-round-12 code
    classified it as correlated and decorrelated to silent wrong data.
    A top-level declaration shadows for the whole subquery (nested
    scopes inherit and can only re-shadow inward); a declaration only
    at a nested depth makes target-name refs ambiguous to this
    parser, so callers refuse loudly toward MERGE for that case."""
    b = _blank_strings(sql)
    n = len(b)
    top: set[str] = set()
    anyd: set[str] = set()

    def _take_ident(i: int) -> tuple[str | None, int]:
        while i < n and b[i].isspace():
            i += 1
        if i < n and b[i] == "`":
            j = b.find("`", i + 1)
            if j < 0:
                return None, n
            return b[i + 1 : j], j + 1
        j = i
        while j < n and (b[j].isalnum() or b[j] in "_.$"):
            j += 1
        return (b[i:j] or None), j

    depth = 0
    i = 0
    kw = _ci(r"\b(FROM|JOIN)\b")
    while i < n:
        ch = b[i]
        if ch == "(":
            depth += 1
            i += 1
            continue
        if ch == ")":
            depth -= 1
            i += 1
            continue
        m = kw.match(b, i)
        if not m:
            i += 1
            continue
        d0 = depth
        i = m.end()
        # parse a comma-separated table-ref list (FROM a x, b y) /
        # the single ref after JOIN; each ref = table|(...) [AS] [alias]
        while True:
            while i < n and b[i].isspace():
                i += 1
            if i < n and b[i] == "(":
                # derived table / nested parens: scan the group's own
                # FROMs recursively (they declare at a NESTED depth),
                # then continue after it for the alias
                d = 0
                gstart = i
                while i < n:
                    if b[i] == "(":
                        d += 1
                    elif b[i] == ")":
                        d -= 1
                        if d == 0:
                            i += 1
                            break
                    i += 1
                nt, na = _from_decl_names(b[gstart + 1 : i - 1])
                anyd |= nt | na
            else:
                before = i
                name, i = _take_ident(i)
                if name is None:
                    break
                if name.lower() in _FROM_STOP_WORDS:
                    i = before
                    break
                rec = name.split(".")[-1].lower()
                anyd.add(rec)
                if d0 == 0:
                    top.add(rec)
            # optional [AS] alias
            save = i
            alias, i = _take_ident(i)
            if alias and alias.lower() == "as":
                alias, i = _take_ident(i)
            if alias is None or alias.lower() in _FROM_STOP_WORDS or "." in alias:
                i = save
            else:
                rec = alias.lower()
                anyd.add(rec)
                if d0 == 0:
                    top.add(rec)
            while i < n and b[i].isspace():
                i += 1
            if i < n and b[i] == ",":
                i += 1
                continue
            break
    return top, anyd


class Lakehouse:
    """Name→table catalog plus the ``sql()`` dispatcher.

    ``warehouse`` (optional) is the default parent directory for tables
    created without an explicit ``LOCATION``; when given, the
    name→path registry persists to ``<warehouse>/_lakehouse_catalog.json``
    so a fresh session (or another process) sees the same catalog —
    the metastore-registration story of S9, one JSON file instead of a
    Hive service.
    """

    def __init__(self, spark: SparkSession, warehouse: str | None = None):
        self.spark = spark
        self.warehouse = warehouse
        self._paths: dict[str, str] = {}
        self._views: dict[str, str] = {}  # name -> stored SELECT text
        self._mviews: set[str] = set()  # materialized views (state in props)
        self._cached: dict[str, DataFrame] = {}  # CACHE pins (session-local)
        self._asof_seq = 0
        if warehouse:
            os.makedirs(warehouse, exist_ok=True)
            cat = os.path.join(warehouse, _CATALOG_FILE)
            if os.path.exists(cat):
                with open(cat) as fh:
                    raw = json.load(fh)
                if "tables" in raw or "views" in raw:
                    self._paths.update(raw.get("tables", {}))
                    self._views.update(raw.get("views", {}))
                    self._mviews.update(raw.get("mviews", []))
                else:  # pre-views flat format
                    self._paths.update(raw)

    # -- catalog ------------------------------------------------------------

    def _save_catalog(self) -> None:
        if self.warehouse:
            cat = os.path.join(self.warehouse, _CATALOG_FILE)
            tmp = cat + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {
                        "tables": self._paths,
                        "views": self._views,
                        "mviews": sorted(self._mviews),
                    },
                    fh,
                    indent=1,
                    sort_keys=True,
                )
            os.replace(tmp, cat)

    def register(self, name: str, path: str) -> None:
        """Bind ``name`` to an existing table path (external-table DDL)."""
        if not is_table(path):
            raise ValueError(f"not a lakehouse table: {path}")
        self._paths[name] = os.path.abspath(path)
        self._save_catalog()

    def tables(self) -> dict[str, str]:
        return dict(self._paths)

    def mirror_to_catalog(
        self,
        name: str,
        catalog_table: str | None = None,
        analyze: bool = True,
        columns: Sequence[str] | None = None,
    ) -> str:
        """Register ``name``'s CURRENT snapshot as a real Spark CATALOG
        table (default ``<name>_mirror``) and feed Spark's own ANALYZE,
        so PLAIN ``spark.sql`` gets catalog statistics — CBO sizing and
        (with ``spark.sql.cbo.joinReorder.enabled``) join REORDERING,
        which the engine's temp-view mirrors can never provide (temp
        views carry no CatalogStatistics; the registration-time
        broadcast hints cover sizing only).

        Zero data copy: the table's LOCATION is a hardlinked snapshot
        directory (:meth:`~.tables.ParquetTable.snapshot_link_dir`).
        ``analyze=True`` runs ``ANALYZE TABLE ... COMPUTE STATISTICS``
        (row count — parquet count(*) is footer-driven, no column
        bytes) and, with ``columns``, ``FOR COLUMNS`` on those (real
        scan of just those columns — what join reordering's selectivity
        estimates consume).  The mirror is a SNAPSHOT: re-run after new
        commits to refresh (the previous version's link dir remains for
        readers mid-query).  Returns the catalog table name."""
        t = self.table(name)
        path = t.snapshot_link_dir()
        ct = catalog_table or f"{self._view_name(name)}_mirror"
        m = t._manifest()
        schema = _schema_from_json(self.spark, m["schema"])
        ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        part = m["partition_by"]
        self.spark.sql(f"DROP TABLE IF EXISTS `{ct}`")
        stmt = f"CREATE TABLE `{ct}` ({ddl}) USING parquet "
        if part:
            stmt += (
                "PARTITIONED BY ("
                + ", ".join(f"`{c}`" for c in part)
                + ") "
            )
        stmt += f"LOCATION '{path}'"
        self.spark.sql(stmt)
        if part:
            self.spark.sql(f"MSCK REPAIR TABLE `{ct}`")
        if analyze:
            self.spark.sql(f"ANALYZE TABLE `{ct}` COMPUTE STATISTICS")
            if columns:
                cols = ", ".join(f"`{c}`" for c in columns)
                self.spark.sql(
                    f"ANALYZE TABLE `{ct}` COMPUTE STATISTICS "
                    f"FOR COLUMNS {cols}"
                )
        return ct

    def table(self, name: str) -> ParquetTable:
        name = _unquote_ident(name)
        if name not in self._paths:
            raise KeyError(
                f"unknown table {name!r}; known: {sorted(self._paths)}"
            )
        return ParquetTable.for_path(self.spark, self._paths[name])

    def _default_location(self, name: str) -> str:
        if not self.warehouse:
            raise ValueError(
                f"CREATE TABLE {name} needs LOCATION '...' (this Lakehouse "
                "was built without a warehouse directory)"
            )
        return os.path.join(self.warehouse, name.replace(".", "__"))

    # -- status frames ------------------------------------------------------

    def _status(self, op: str, name: str, version: int | None) -> DataFrame:
        return self.spark.createDataFrame(
            [(op, name, version)], "operation string, table string, version int"
        )

    _EXPLAIN = _ci(
        r"^EXPLAIN\s+(?:(?P<mode>EXTENDED|CODEGEN|COST|FORMATTED)\s+)?"
        r"(?P<body>(?:SELECT|WITH|VALUES)\b.*)$"
    )

    def _explain(self, stmt: str) -> DataFrame:
        """``EXPLAIN [EXTENDED|CODEGEN|COST|FORMATTED] <query>`` —
        Spark/Databricks parity, routed through this front-end's own
        query path so the plan shows what would ACTUALLY run: the
        metadata-only aggregate fast path surfaces as a scan-free
        constant projection, and a stats-hinted view registration shows
        its BroadcastHashJoin.  Returns Spark's own one-column ``plan``
        frame shape."""
        m = self._EXPLAIN.match(stmt)
        if not m:
            raise ValueError(
                "supported form: EXPLAIN [EXTENDED|CODEGEN|COST|"
                "FORMATTED] SELECT ... (queries only — DML plans are "
                "engine rewrites, inspect their commits via DESCRIBE "
                "HISTORY)"
            )
        df = self._run_query(m.group("body"))
        mode = (m.group("mode") or "simple").lower()
        text = self.spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), mode
        )
        return self.spark.createDataFrame([(text,)], "plan string")

    # -- dispatcher ---------------------------------------------------------

    def sql(self, statement: str) -> DataFrame:
        """Execute one statement; always returns a DataFrame (like
        ``spark.sql``): query results for queries, a one-row status frame
        for DDL/DML."""
        stmt = _strip_stmt(statement)
        head = stmt.split(None, 2)
        kw = head[0].upper() if head else ""
        if kw in ("SELECT", "WITH", "VALUES"):
            return self._run_query(stmt)
        if kw == "EXPLAIN":
            return self._explain(stmt)
        if kw == "TRUNCATE":
            return self._truncate(stmt)
        if kw == "CREATE":
            return self._create(stmt)
        if kw == "CONVERT":
            return self._convert(stmt)
        if kw == "MERGE":
            return self._merge(stmt)
        if kw == "DELETE":
            return self._delete(stmt)
        if kw == "UPDATE":
            return self._update(stmt)
        if kw == "INSERT":
            return self._insert(stmt)
        if kw == "OPTIMIZE":
            return self._optimize(stmt)
        if kw == "VACUUM":
            return self._vacuum(stmt)
        if kw == "DESCRIBE" or kw == "DESC":
            return self._describe(stmt)
        if kw == "RESTORE":
            return self._restore(stmt)
        if kw == "ALTER":
            return self._alter(stmt)
        if kw == "DROP":
            return self._drop(stmt)
        if kw == "SHOW":
            return self._show(stmt)
        if kw == "REORG":
            return self._reorg(stmt)
        if kw == "COPY":
            return self._copy_into(stmt)
        if kw == "FSCK":
            return self._fsck(stmt)
        if kw in ("CACHE", "UNCACHE"):
            return self._cache(stmt)
        if kw == "APPLY":
            return self._apply_changes(stmt)
        if kw == "ANALYZE":
            return self._analyze(stmt)
        if kw == "REFRESH":
            return self._refresh_mv_stmt(stmt)
        if kw == "COMMENT":
            return self._comment_on(stmt)
        if kw == "DECLARE":
            # session variables (Databricks / Spark 4 DECLARE [OR
            # REPLACE] VARIABLE) — Spark implements them natively;
            # later statements reference them through every route that
            # ends in spark.sql, and DML predicates resolve them via
            # the analyzer (tests/test_session_variables.py)
            return self.spark.sql(stmt)
        if kw == "SET" and _ci(r"^SET\s+VAR(IABLE)?\b").match(stmt):
            return self.spark.sql(stmt)
        raise ValueError(f"unsupported statement: {stmt[:80]!r}")

    def sql_script(self, script: str) -> DataFrame:
        """Run a multi-statement script (the notebook-cell shape the
        reference's pipelines are written in): statements split on
        top-level ``;`` — never inside string/backtick literals or
        comments — execute in order, and the LAST statement's frame is
        returned (earlier results are evaluated for their effects, like
        a Databricks SQL cell).  A mid-script failure raises after the
        preceding statements have committed — each statement is its own
        transaction, exactly the Databricks/Delta contract (no
        cross-statement rollback)."""
        stmts = [s for s in _split_statements(script) if _strip_stmt(s)]
        if not stmts:
            raise ValueError("empty script")
        out: DataFrame | None = None
        for s in stmts:
            out = self.sql(s)
        return out

    _ANALYZE = _ci(
        r"^ANALYZE\s+TABLE\s+(?P<name>`?[\w.]+`?)\s+COMPUTE\s+STATISTICS"
        r"(?:\s+(?P<noscan>NOSCAN)|\s+FOR\s+COLUMNS\s+(?P<cols>.+)"
        r"|\s+FOR\s+ALL\s+COLUMNS(?P<all>))?$"
    )

    def _analyze(self, stmt: str) -> DataFrame:
        m = self._ANALYZE.match(stmt)
        if not m:
            raise ValueError(
                "supported form: ANALYZE TABLE t COMPUTE STATISTICS "
                "[NOSCAN | FOR COLUMNS c1, c2 | FOR ALL COLUMNS]"
            )
        name = _unquote_ident(m.group("name"))
        table = self.table(name)
        columns: list[str] | str | None = None
        if m.group("cols") is not None:
            columns = [
                _unquote_ident(c.strip()) for c in _split_top(m.group("cols"))
            ]
        elif m.group("all") is not None:
            columns = "all"
        version = table.analyze(columns, noscan=bool(m.group("noscan")))
        s = table.statistics() or {}
        return self.spark.createDataFrame(
            [
                (
                    name,
                    version,
                    s.get("num_rows"),
                    s.get("size_bytes"),
                    len(s.get("columns", {})),
                )
            ],
            "table string, version int, num_rows long, size_bytes long, "
            "num_cols_analyzed int",
        )

    _CACHE = _ci(r"^(CACHE|UNCACHE)\s+TABLE\s+(`?[\w.]+`?)$")

    def _cache(self, stmt: str) -> DataFrame:
        m = self._CACHE.match(stmt)
        if not m:
            raise ValueError(f"unsupported CACHE form: {stmt[:80]!r}")
        name = _unquote_ident(m.group(2))
        table = self.table(name)
        view = self._view_name(name)
        if m.group(1).upper() == "CACHE":
            # D9 parity: pin the CURRENT snapshot; the registered view
            # points at the cached frame so later SELECTs reuse it.  A
            # previous pin for the same name is unpersisted first —
            # otherwise every CACHE cycle leaks one snapshot's worth of
            # executor cache memory until the session dies.
            prev = self._cached.pop(name, None)
            if prev is not None:
                prev.unpersist()
            df = table.cache()
            df.createOrReplaceTempView(view)
            self._cached[name] = df
            return self._status("CACHE TABLE", name, table.latest_version())
        prev = self._cached.pop(name, None)
        if prev is not None:
            prev.unpersist()
        self.spark.catalog.dropTempView(view)
        return self._status("UNCACHE TABLE", name, None)

    _FSCK = _ci(
        r"^FSCK\s+REPAIR\s+TABLE\s+(`?[\w.]+`?)(\s+DRY\s+RUN)?$"
    )

    def _fsck(self, stmt: str) -> DataFrame:
        m = self._FSCK.match(stmt)
        if not m:
            raise ValueError(
                "supported form: FSCK REPAIR TABLE t [DRY RUN]"
            )
        name = _unquote_ident(m.group(1))
        res = self.table(name).fsck(dry_run=bool(m.group(2)))
        return self.spark.createDataFrame(
            [(name, res["version"], len(res["missing_files"]), bool(m.group(2)))],
            "table string, version int, missing_files int, dry_run boolean",
        )

    _COPY = _ci(
        r"^COPY\s+INTO\s+(?P<name>`?[\w.]+`?)\s+FROM\s+'(?P<src>[^']+)'\s+"
        r"FILEFORMAT\s*=\s*(?P<fmt>\w+)"
        r"(?:\s+PATTERN\s*=\s*'(?P<pat>[^']*)')?"
        r"(?:\s+FORMAT_OPTIONS\s*\((?P<fo>[^)]*)\))?"
        r"(?:\s+COPY_OPTIONS\s*\((?P<co>[^)]*)\))?$"
    )

    def _copy_into(self, stmt: str) -> DataFrame:
        m = self._COPY.match(stmt)
        if not m:
            raise ValueError(
                "supported form: COPY INTO t FROM '<dir>' FILEFORMAT = X "
                "[PATTERN = '<glob>'] [FORMAT_OPTIONS('k'='v',...)] "
                "[COPY_OPTIONS('mergeSchema'='true'|'force'='true')]"
            )
        name = _unquote_ident(m.group("name"))
        fo = self._parse_props(m.group("fo")) if m.group("fo") else {}
        co = {
            str(k).lower(): v
            for k, v in (
                self._parse_props(m.group("co")) if m.group("co") else {}
            ).items()
        }

        def _flag(key: str) -> bool:
            v = co.get(key.lower(), False)
            return v is True or str(v).lower() == "true"

        res = self.table(name).copy_into(
            m.group("src"),
            fileformat=m.group("fmt").lower(),
            pattern=m.group("pat"),
            format_options={k: str(v) for k, v in fo.items()},
            merge_schema=_flag("mergeSchema"),
            force=_flag("force"),
        )
        return self.spark.createDataFrame(
            [
                (
                    name,
                    res["version"],
                    res["files_loaded"],
                    res["files_skipped"],
                    res["rows_loaded"],
                )
            ],
            "table string, version int, num_files_loaded int, "
            "num_files_skipped int, num_rows_loaded long",
        )

    # -- queries (SELECT / WITH, AS OF, table_changes) ----------------------

    _ASOF = _ci(
        r"\b(FROM|JOIN)\s+(`?[\w.]+`?)"
        r"(?:\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']*)')"
    )
    _TVF = _ci(
        r"\btable_changes\s*\(\s*'([^']+)'\s*,\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)"
    )

    _AGG_ONLY = _ci(
        r"^SELECT\s+(?P<aggs>.+?)\s+FROM\s+(?P<name>`?[\w.]+`?)"
        r"(?:\s+VERSION\s+AS\s+OF\s+(?P<ver>\d+)"
        r"|\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']*)')?"
        r"(?:\s+WHERE\s+(?P<where>.+?))?\s*$"
    )
    # predicate functions whose per-ROW evaluation differs from
    # per-FILE evaluation — a metadata-only answer would be wrong
    _NONDET = _ci(
        r"\b(?:rand|randn|random|uuid|shuffle|input_file_name"
        r"|input_file_block_start|input_file_block_length"
        r"|spark_partition_id|monotonically_increasing_id)\s*\("
    )
    # words a partition-only predicate may contain besides the
    # partition columns themselves: operators, literal keywords, CAST
    # type names.  An identifier outside this set falls through
    # SILENTLY (fast path lost, correctness kept) instead of raising
    # an AnalysisException the engine would catch but Spark would log.
    _PRED_WORDS = frozenset(
        """and or not in is null true false between like rlike ilike
        case when then else end cast as try_cast date timestamp
        timestamp_ntz interval div escape distinct from exists any all
        some int integer bigint smallint tinyint long string varchar
        char double float real decimal dec numeric boolean binary
        void""".split()
    )
    _AGG_ITEM = _ci(
        r"^(?P<fn>COUNT|MIN|MAX)\s*\(\s*(?P<arg>\*|1|`[^`]+`|[\w.]+)\s*\)"
        r"(?:\s+AS\s+(?P<alias>`?\w+`?))?$"
    )

    def _metadata_agg(self, stmt: str) -> DataFrame | None:
        """Metadata-only aggregates (Delta's OptimizeMetadataOnlyQuery /
        Databricks parity): an unfiltered single-table SELECT whose
        items are all ``COUNT(*)`` / ``MIN(col)`` / ``MAX(col)`` is
        answered without scanning data —

        - ``COUNT(*)``: the table layer's exact metadata count (fresh
          ANALYZE stats = zero Spark jobs; stale/absent = parquet
          footers minus DV cardinality, still no data read);
        - ``MIN/MAX(col)``: the FRESH ``ANALYZE ... FOR COLUMNS`` value
          (exact: the stat was computed by a DV-aware scan of this very
          snapshot; freshness guarantees the snapshot hasn't changed).
          Stale or missing column stats make the WHOLE statement fall
          through — the fast path must never answer one item from
          metadata and another from a different snapshot's scan.

        Returns ``None`` to fall through: any qualifier (WHERE, JOIN,
        GROUP BY, AS OF, alias), a CACHE-pinned name (the pin answers),
        a stored view, a float NaN stat (not renderable as a SQL
        literal), or any unsupported item."""
        m = self._AGG_ONLY.match(stmt)
        if not m:
            return None
        name = _unquote_ident(m.group("name"))
        if (
            name not in self._paths
            or name in self._views
            or name in self._cached
        ):
            return None
        items = []
        for raw in _split_top(m.group("aggs"), ","):
            im = self._AGG_ITEM.match(raw.strip())
            if not im:
                return None
            fn = im.group("fn").upper()
            arg = im.group("arg")
            if fn == "COUNT" and arg not in ("*", "1"):
                return None  # COUNT(col) skips NULLs — not metadata-safe
            alias = (
                _unquote_ident(im.group("alias"))
                if im.group("alias")
                else None
            )
            items.append((fn, _unquote_ident(arg), alias))
        table = self.table(name)
        ver = int(m.group("ver")) if m.group("ver") is not None else None
        if m.group("ts") is not None:
            ver = table.version_at(m.group("ts"))
        if m.group("where") is not None:
            return self._metadata_agg_filtered(
                table, items, m.group("where"), ver
            )
        need = [c for fn, c, _ in items if fn in ("MIN", "MAX")]
        col_stats: dict = {}
        if need:
            # freshness resolves against the REQUESTED version's own
            # history tail (the stats prop is versioned), so historical
            # MIN/MAX answers zero-scan when v's stats were fresh AT v
            s = table.fresh_statistics(version=ver)
            col_stats = (s or {}).get("columns") or {}
            if any(c not in col_stats for c in need):
                return None
        types = {
            f.name: f.dataType.simpleString()
            for f in _schema_from_json(
                # the REQUESTED version's schema: a column renamed or
                # retyped since v must render v's stat in v's type
                self.spark, table._manifest(ver)["schema"]
            ).fields
        }
        exprs = []
        for fn, arg, alias in items:
            if fn == "COUNT":
                out = alias or "count(1)"  # spark.sql's name for COUNT(*)
                exprs.append(
                    f"CAST({int(table.count(version=ver))} AS BIGINT) "
                    f"AS `{out.replace('`', '``')}`"
                )
                continue
            v = col_stats[arg]["min" if fn == "MIN" else "max"]
            lit = _render_sql_literal(v, types[arg], spark=self.spark)
            if lit is None:
                return None  # NaN or unrenderable: run the real scan
            out = alias or f"{fn.lower()}({arg})"
            exprs.append(f"{lit} AS `{out.replace('`', '``')}`")
        # a constant projection folds to a LocalRelation — collect()
        # short-circuits driver-side, zero jobs (createDataFrame on
        # python data would parallelize an RDD and launch a real job,
        # defeating the point)
        return self.spark.sql("SELECT " + ", ".join(exprs))

    def _metadata_agg_filtered(
        self, table, items, where: str, ver: int | None
    ) -> DataFrame | None:
        """Partition-filtered metadata aggregates (Delta's
        OptimizeMetadataOnlyQuery with partition predicates): when the
        WHERE references PARTITION columns only, each file matches
        all-or-nothing, so ``COUNT(*)`` is the sum of surviving files'
        live rows (footers minus DV cardinality) and
        ``MIN/MAX(partition_col)`` comes from surviving files with
        live rows > 0 — no data byte is read; the only job is over the
        file-count-sized metadata frame.

        The predicate is evaluated by SPARK over the typed
        partition-value frame, so its semantics match the real scan
        exactly; a WHERE touching any non-partition column simply
        fails to resolve against the frame and the statement falls
        through to the real scan.  Non-deterministic predicates
        (rand()...) fall through too — per-file evaluation would
        differ from per-row."""
        if self._NONDET.search(where) or "__rows" in where:
            return None
        frame = table.partition_file_frame(version=ver)
        if frame is None:
            return None
        part_cols = set(frame.columns) - {"__rows"}
        # silent pre-check: every non-function identifier must be a
        # partition column or predicate vocabulary; anything else (a
        # data column, an alias, a qualified name) falls through to
        # the real scan without tripping the analyzer
        masked = _mask_strings(where)
        idents = {
            w.lower()
            for w in re.findall(r"\b[a-zA-Z_]\w*\b(?!\s*\()", masked)
        } | {w.lower() for w in re.findall(r"`([^`]+)`", masked)}
        allowed = self._PRED_WORDS | {c.lower() for c in part_cols}
        if idents - allowed:
            return None
        aggs = []
        for fn, arg, alias in items:
            if fn == "COUNT":
                out = alias or "count(1)"
                aggs.append(
                    F.coalesce(F.sum("__rows"), F.lit(0))
                    .cast("long")
                    .alias(out)
                )
                continue
            if arg not in part_cols:
                # footer min/max of a data column under a DV is not
                # exact — only partition values are (Delta parity)
                return None
            out = alias or f"{fn.lower()}({arg})"
            agg_fn = F.min if fn == "MIN" else F.max
            # a fully-masked file holds no live rows: its partition
            # value must not contribute to the extreme
            aggs.append(
                agg_fn(
                    F.when(F.col("__rows") > 0, F.col(arg))
                ).alias(out)
            )
        try:
            return frame.filter(F.expr(where)).agg(*aggs)
        except Exception:  # noqa: BLE001 - unresolvable WHERE: real scan
            return None

    def _run_query(self, stmt: str) -> DataFrame:
        # 0. metadata-only aggregates (Databricks/Delta parity): an
        # unfiltered single-table COUNT(*)/MIN/MAX SELECT is answered
        # from the table layer's metadata path — a 100 TB table never
        # runs a scan to report its size or its fresh-ANALYZEd bounds.
        fast = self._metadata_agg(stmt)
        if fast is not None:
            return fast

        # 1. table_changes('name', start[, end]) → CDF view
        def tvf(match: re.Match) -> str:
            name, start, end = match.group(1), match.group(2), match.group(3)
            df = self.table(name).changes_between(
                int(start), int(end) if end else None
            )
            self._asof_seq += 1
            view = f"__lh_cdf_{self._asof_seq}"
            df.createOrReplaceTempView(view)
            return view

        stmt = self._TVF.sub(tvf, stmt)

        # 2. name VERSION/TIMESTAMP AS OF → pinned snapshot view
        def asof(match: re.Match) -> str:
            prefix, name = match.group(1), _unquote_ident(match.group(2))
            if name not in self._paths:
                return match.group(0)  # not ours — leave for Catalyst
            t = self.table(name)
            version = (
                int(match.group(3))
                if match.group(3) is not None
                else t.version_at(match.group(4))
            )
            self._asof_seq += 1
            view = f"__lh_asof_{self._asof_seq}"
            t.read(version).createOrReplaceTempView(view)
            return f"{prefix} {view}"

        stmt = self._ASOF.sub(asof, stmt)

        # 3. stored views expand first (their bodies reference tables);
        # recursion covers views-on-views, a seen-set breaks cycles.
        expanding = getattr(self, "_expanding", set())
        for vname, body in self._views.items():
            if vname in expanding or not re.search(
                rf"\b{re.escape(vname)}\b", stmt
            ):
                continue
            self._expanding = expanding | {vname}
            try:
                df = self._run_query(body)
            finally:
                self._expanding = expanding
            view = self._view_name(vname)
            df.createOrReplaceTempView(view)
            if view != vname:
                stmt = self._sub_ident(stmt, vname, view)

        # 4. every referenced lakehouse table → current-snapshot view.
        # Dotted names (the reference's `bronze.rx_claims` style) cannot
        # be temp-view names, so they register mangled and the statement
        # text is rewritten to match.  A name pinned by CACHE TABLE is
        # NOT re-registered (the pin is the point) but its dotted form
        # still needs the text rewrite to reach the pinned view.
        # Databricks QUALIFY: rewritten AFTER all textual composition
        # (TVF/AS OF substitution, stored-view expansion) so a QUALIFY
        # inside an expanded view body or derived table is seen too.
        if _ci(r"\bQUALIFY\b").search(_mask_strings(stmt)):
            stmt = self._rewrite_qualify(stmt)

        for name in self._paths:
            if not re.search(rf"\b{re.escape(name)}\b", stmt):
                continue
            view = self._view_name(name)
            if name not in self._cached:
                t = self.table(name)
                # CBO at the SQL surface: when FRESH ANALYZE stats bound
                # the table under the broadcast threshold, the registered
                # view carries a static broadcast hint — a user join
                # against a small analyzed dim plans BHJ before the first
                # shuffle instead of waiting for AQE's runtime promotion.
                # No/stale/large stats register plain (default=False =
                # today's behavior); Spark silently drops the hint in
                # non-join plans, so a hinted single-table SELECT is
                # unaffected.
                cbo.maybe_broadcast(
                    t.read(), t.fresh_statistics(), default=False
                ).createOrReplaceTempView(view)
            if view != name:
                stmt = self._sub_ident(stmt, name, view)
        return self.spark.sql(stmt)

    def _rewrite_qualify(self, stmt: str) -> str:
        """Databricks' ``QUALIFY`` clause as a pure text rewrite Spark
        can run (Spark has no QUALIFY; it DOES have ``* EXCEPT`` and
        lateral column-alias resolution)::

            SELECT <list> FROM <rel> ... QUALIFY <pred> [ORDER/LIMIT]
            ⇒ SELECT * EXCEPT (__qualify__) FROM (
                SELECT <list>, (<pred>) AS __qualify__ FROM <rel> ...
              ) __qualify_src__ WHERE __qualify__ [ORDER/LIMIT]

        Injecting the predicate INTO the original select list gives it
        exactly QUALIFY's scope: window functions over any column of
        the FROM relation (projected or not), select-list aliases (via
        Spark's lateral column aliases — verified to resolve across
        window aliases), and windows over aggregates in grouped
        queries; the windows evaluate over the post-WHERE/GROUP rows —
        the documented QUALIFY order.  NULL predicate rows are excluded
        (WHERE semantics), ORDER BY/LIMIT apply after the filter.

        Recurses into every parenthesized group first, so QUALIFY works
        inside CTE bodies, derived tables, and expanded stored views.

        ``SELECT DISTINCT`` heads keep the standard evaluation order
        (QUALIFY before DISTINCT): DISTINCT moves to the OUTER select —
        ``SELECT DISTINCT * EXCEPT (__qualify__) FROM (...) WHERE
        __qualify__`` — so the filter runs on the pre-dedup rows.

        Top-level set operations bind QUALIFY to ITS select block
        (Databricks scoping: QUALIFY is a clause of one SELECT): a
        set-op keyword before the QUALIFY splits off the LAST branch
        for rewriting; one after the predicate ends the branch there
        and the remaining chain rewrites recursively.  A trailing
        ORDER BY/LIMIT keeps its top-level position, so it still
        applies to the whole set operation.  ``* EXCEPT (...)`` is
        distinguished from the EXCEPT set operator by the preceding
        ``*``."""
        blanked = _blank_strings(stmt)
        out: list[str] = []
        i, n = 0, len(stmt)
        while i < n:
            if blanked[i] == "(":
                depth, j = 0, i
                while j < n:
                    if blanked[j] == "(":
                        depth += 1
                    elif blanked[j] == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    j += 1
                if depth != 0:  # unbalanced: let Spark's parser complain
                    out.append(stmt[i:])
                    i = n
                    break
                out.append("(" + self._rewrite_qualify(stmt[i + 1 : j]) + ")")
                i = j + 1
            else:
                out.append(stmt[i])
                i += 1
        stmt = "".join(out)
        q = _find_top_keyword(_blank_strings(stmt), "QUALIFY")
        if q < 0:
            return stmt
        if "__qualify__" in stmt:
            raise ValueError(
                "QUALIFY rewrite reserves the column name __qualify__"
            )
        head = stmt[:q].rstrip()
        rest = stmt[q + 7 :].strip()
        rb = _blank_strings(rest)
        cuts = [
            p
            for kw in ("ORDER", "LIMIT", "OFFSET")
            if (p := _find_top_keyword(rb, kw)) >= 0
        ]
        cut = min(cuts) if cuts else len(rest)
        pred, tail = rest[:cut].strip(), rest[cut:].strip()
        pb = _blank_strings(pred)
        set_kw = _ci(r"^(UNION|INTERSECT|EXCEPT|MINUS)(\s+(ALL|DISTINCT))?\s+")
        pred_ops = self._top_set_ops(pb)
        if pred_ops:
            # the predicate text runs into the NEXT set-op branch: cut
            # the branch there, rewrite it, recurse on the chain
            scut = pred_ops[0]
            branch = f"{head} QUALIFY {pred[:scut].strip()}"
            chain = pred[scut:].strip() + ((" " + tail) if tail else "")
            km = set_kw.match(chain)
            if not km:  # pathological text: let Spark's parser complain
                return stmt
            return (
                self._rewrite_qualify(branch)
                + " "
                + chain[: km.end()].strip()
                + " "
                + self._rewrite_qualify(chain[km.end() :])
            )
        hb = _blank_strings(head)
        head_ops = self._top_set_ops(hb)
        if head_ops:
            # QUALIFY binds to the LAST branch of the set operation
            scut = head_ops[-1]
            km = set_kw.match(head[scut:])
            if not km:
                return stmt
            branch_start = scut + km.end()
            branch = f"{head[branch_start:]} QUALIFY {pred}"
            if tail:
                branch += " " + tail
            return head[:branch_start] + self._rewrite_qualify(branch)
        # only the MAIN select matters; CTE bodies are inside parens
        sp = _find_top_keyword(hb, "SELECT")
        distinct = ""
        if sp >= 0:
            dm = _ci(r"^SELECT\s+DISTINCT\b").match(head[sp:])
            if dm:
                # QUALIFY precedes DISTINCT (standard order): filter on
                # the pre-dedup rows, dedup in the OUTER select
                distinct = "DISTINCT "
                head = head[:sp] + "SELECT" + head[sp + dm.end() :]
                hb = _blank_strings(head)
        f = _find_top_keyword(hb, "FROM")
        if f < 0:
            raise ValueError(
                f"QUALIFY needs a FROM clause: {stmt[:80]!r}"
            )
        inner = f"{head[:f].rstrip()}, ({pred}) AS __qualify__ {head[f:]}"
        rewritten = (
            f"SELECT {distinct}* EXCEPT (__qualify__) FROM ({inner}) "
            f"__qualify_src__ WHERE __qualify__"
        )
        if tail:
            rewritten += " " + tail
        return rewritten

    @staticmethod
    def _top_set_ops(blanked: str) -> list[int]:
        """Positions of genuine top-level set-operation keywords in a
        string-blanked SQL fragment.  ``* EXCEPT (cols)`` (the
        Databricks star-except projection) is excluded by the ``*``
        that always directly precedes it."""
        out: list[int] = []
        for kw in ("UNION", "INTERSECT", "EXCEPT", "MINUS"):
            start = 0
            while True:
                p = _find_top_keyword(blanked[start:], kw)
                if p < 0:
                    break
                pos = start + p
                if not blanked[:pos].rstrip().endswith("*"):
                    out.append(pos)
                start = pos + len(kw)
        return sorted(out)

    @staticmethod
    def _view_name(name: str) -> str:
        return name.replace(".", "__") if "." in name else name

    @staticmethod
    def _sub_ident(stmt: str, name: str, view: str) -> str:
        """Replace identifier occurrences of ``name`` OUTSIDE string
        literals — a literal that happens to contain the table name
        ('bronze.rx_claims' in an audit predicate) must not be
        rewritten into the mangled view name.  Both single- and
        double-quoted segments are protected: Spark SQL treats
        ``"..."`` as a string literal by default
        (spark.sql.ansi.doubleQuotedIdentifiers off)."""
        pat = re.compile(rf"\b{re.escape(name)}\b")
        out: list[str] = []
        lit = r"('(?:[^']|'')*'|\"(?:[^\"]|\"\")*\")"
        for i, seg in enumerate(re.split(lit, stmt)):
            out.append(seg if i % 2 else pat.sub(view, seg))
        return "".join(out)

    # -- CREATE -------------------------------------------------------------

    _CREATE = _ci(
        r"^CREATE\s+(?P<replace>OR\s+REPLACE\s+)?TABLE\s+"
        r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>`?[\w.]+`?)\s*(?P<rest>.*)$"
    )

    _CREATE_VIEW = _ci(
        r"^CREATE\s+(?P<replace>OR\s+REPLACE\s+)?VIEW\s+"
        r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>`?[\w.]+`?)\s+AS\s+"
        r"(?P<body>(?:SELECT|WITH)\b.*)$"
    )

    _CREATE_MV = _ci(
        r"^CREATE\s+MATERIALIZED\s+VIEW\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
        r"(?P<name>`?[\w.]+`?)\s*(?:LOCATION\s+'(?P<loc>[^']*)'\s*)?"
        r"AS\s+(?P<body>SELECT\b.*)$"
    )
    _REFRESH_MV = _ci(
        r"^REFRESH\s+MATERIALIZED\s+VIEW\s+(`?[\w.]+`?)(\s+FULL)?$"
    )

    def _pin_dim_views(self, plan) -> tuple[dict, dict]:
        """(dim versions, table name → temp view) for a join plan's
        dims, each read at its PINNED latest version — SQL-text compute
        paths substitute the table names so the query sees exactly the
        frozen snapshots the stored ``mv_dep_dims`` record."""
        dimver: dict = {}
        views: dict = {}
        for t, _a, _jt, _cond in plan.joins:
            if t in views:
                continue
            dt = self.table(t)
            dv = dt.latest_version()
            self._asof_seq += 1
            dview = f"__mv_dim_{self._asof_seq}"
            dt.read(dv).createOrReplaceTempView(dview)
            dimver[t] = dv
            views[t] = dview
        return dimver, views

    def _mv_compute(self, body: str, plan):
        """(initial/full MV frame, pinned fact version|None, pinned dim
        versions|None).  An incrementally-maintainable plan computes
        from EXPLICITLY pinned snapshots so the stored dependency
        versions match the materialized rows exactly; full-only MVs run
        the raw query."""
        from azure_databricks_lakehouse_spark.sources import mv as _mv

        if plan is None:
            return self._run_query(body), None, None
        base = self.table(plan.table)
        v = base.latest_version()
        snap = base.read(v)
        if plan.window:
            # run the defining query (QUALIFY included — _run_query
            # rewrites it) over the PINNED snapshot
            self._asof_seq += 1
            tmp = f"__mv_win_{self._asof_seq}"
            snap.createOrReplaceTempView(tmp)
            sub = self._sub_ident(body, plan.table, tmp)
            dimver = None
            if plan.joins:
                # window-over-join (round 12): per-key rescan scopes by
                # FACT-side partition keys against FROZEN dims — the
                # star-join premise; a moved dim falls back to full
                dimver, dviews = self._pin_dim_views(plan)
                for t, dview in dviews.items():
                    sub = self._sub_ident(sub, t, dview)
            return self._run_query(sub), v, dimver
        if plan.joins and plan.grouped:
            dims: dict = {}
            dimver: dict = {}
            for t, a, _jt, _cond in plan.joins:
                dt = self.table(t)
                dv = dt.latest_version()
                dims[a] = dt.read(dv)
                dimver[t] = dv
            rows = _mv.joined_rows(plan, snap, dims)
            return _mv.full_state(rows, _mv.canonical_plan(plan)), v, dimver
        # single-table paths evaluate the plan's expressions directly
        # over the base frame; alias it with the FROM clause's alias
        # (or the table's own name) so qualified refs (``f.g`` under
        # ``FROM b f``, ``b.g`` under ``FROM b``) resolve — round-12
        # ADVICE: _parse_from accepts the alias, the frames must too
        fa = plan.fact_alias or plan.table.rsplit(".", 1)[-1]
        if plan.grouped:
            return _mv.full_state(snap.alias(fa), plan), v, None
        rid = (
            base._rt_state(base._manifest(v)) is not None
        )  # row-tracked base: key the state by stable row id, so the
        # projection maintains under ARBITRARY DML (see the refresh)
        if rid:
            snap = base.read(v, with_row_ids=True)
        self._asof_seq += 1
        tmp = f"__mv_src_{self._asof_seq}"
        snap.createOrReplaceTempView(tmp)
        if plan.joins:
            # projection-over-join (round 12): keyed by the FACT row id
            # against frozen dims — a 1:N dim join fans a rid out into
            # a multi-row group the refresh replaces wholesale
            dimver, dviews = self._pin_dim_views(plan)
            rid_item = f", `{fa}`._row_id AS __mv_rid" if rid else ""
            q = f"SELECT {plan.items}{rid_item} FROM {tmp} AS `{fa}`"
            for jt_t, jt_a, jt_k, jt_c in plan.joins:
                q += (
                    f" {'LEFT' if jt_k == 'left' else 'INNER'} JOIN "
                    f"{dviews[jt_t]} AS `{jt_a}` ON {jt_c}"
                )
        else:
            dimver = None
            items = plan.items + (", _row_id AS __mv_rid" if rid else "")
            q = f"SELECT {items} FROM {tmp} AS `{fa}`"
        if plan.where:
            q += f" WHERE {plan.where}"
        return self.spark.sql(q), v, dimver

    def _create_mv(self, m) -> DataFrame:
        """``CREATE MATERIALIZED VIEW name [LOCATION '...'] AS SELECT``
        — data in a lakehouse table ``<name>__mvdata``, reads through a
        stored view, refresh state in the data table's props (see
        ``sources/mv.py`` for the incremental-maintenance design)."""
        from azure_databricks_lakehouse_spark.sources import mv as _mv

        name = _unquote_ident(m.group("name"))
        if name in self._mviews and m.group("ine"):
            return self._status(
                "CREATE MATERIALIZED VIEW (exists)", name, None
            )
        if name in self._views or name in self._paths or name in self._mviews:
            raise ValueError(f"name in use: {name}")
        body = " ".join(m.group("body").split())
        data_name = f"{name}__mvdata"
        loc = m.group("loc") or self._default_location(data_name)
        plan = _mv.parse_plan(body)
        if plan is not None and (
            plan.table not in self._paths
            or any(t not in self._paths for t, _, _, _ in plan.joins)
        ):
            plan = None  # a base isn't a lakehouse table: no CDF, full-only
        df, dep, dimver = self._mv_compute(body, plan)
        rid = "__mv_rid" in df.columns
        if is_table(loc) and f"{name}__mvdata" not in self._paths:
            if os.path.abspath(loc) in set(self._paths.values()):
                # the location belongs to a LIVE registered table (e.g.
                # another MV's state dir) — an "orphan" is by definition
                # unregistered
                raise FileExistsError(
                    f"LOCATION {loc!r} belongs to a registered table; "
                    "refusing to overwrite"
                )
            orphan = ParquetTable.for_path(self.spark, loc)
            if "mv_query" not in orphan.properties():
                raise FileExistsError(
                    f"LOCATION {loc!r} holds a table that is not "
                    "materialized-view state; refusing to overwrite"
                )
            # DROP MATERIALIZED VIEW keeps data (external-table
            # semantics) — re-running the SHOW CREATE DDL reclaims the
            # orphaned state dir with a fresh materialization
            orphan.overwrite(df)
            t = orphan
        else:
            t = ParquetTable.create(self.spark, loc, df)
        # None values UNSET (set_properties contract) — reclaiming an
        # orphaned state dir must not inherit stale refresh state
        props: dict = {
            "mv_query": body,
            "mv_dep_table": plan.table if plan is not None else None,
            "mv_dep_version": dep if plan is not None else None,
            "mv_dep_dims": dimver if (plan is not None and dimver) else None,
            "mv_rid": True if rid else None,
        }
        t.set_properties(props)
        self._paths[data_name] = os.path.abspath(loc)
        if plan is not None and plan.grouped:
            avg_types = None
            avg_idx = [
                i for i, (k, _, _) in enumerate(plan.aggs) if k == "avg"
            ]
            if avg_idx:
                # the defining query's ANALYZED schema names each AVG's
                # exact output type (analysis only, no job) — the view
                # reconstructs `CAST(sum/count AS that_type)`, which is
                # Average's own divide+cast on the same internal sum
                sch = {
                    f.name: f.dataType.simpleString()
                    for f in self._run_query(body).schema.fields
                }
                hidden_avg = [
                    i for i in avg_idx if plan.aggs[i][2] not in sch
                ]
                if hidden_avg:
                    # HIDDEN AVGs (HAVING-only, round 12) have no
                    # projected item to read a type from — analyze a
                    # one-row-zero-data probe of just those aggregates
                    # against the same FROM clause (analysis only)
                    fa = plan.fact_alias or plan.table.rsplit(".", 1)[-1]
                    frm = f"FROM {plan.table} AS `{fa}`"
                    for jt_t, jt_a, jt_k, jt_c in plan.joins:
                        frm += (
                            f" {'LEFT' if jt_k == 'left' else 'INNER'} "
                            f"JOIN {jt_t} AS `{jt_a}` ON {jt_c}"
                        )
                    probe_items = ", ".join(
                        f"AVG({plan.aggs[i][1]}) AS `__mv_probe{i}`"
                        for i in hidden_avg
                    )
                    psch = {
                        f.name: f.dataType.simpleString()
                        for f in self._run_query(
                            f"SELECT {probe_items} {frm}"
                        ).schema.fields
                    }
                    sch.update(
                        {
                            plan.aggs[i][2]: psch[f"__mv_probe{i}"]
                            for i in hidden_avg
                        }
                    )
                avg_types = {
                    i: sch[plan.aggs[i][2]] for i in avg_idx
                }
            view = _mv.view_body(plan, data_name, avg_types=avg_types)
            if plan.having:
                # state keeps EVERY group; the read filters.  Hidden
                # HAVING-only aggregates project away here.
                hidden = [
                    a for _, _, a in plan.aggs if a.startswith("__mv_h")
                ]
                exc = (
                    " EXCEPT (" + ", ".join(f"`{h}`" for h in hidden) + ")"
                    if hidden
                    else ""
                )
                view = (
                    f"SELECT *{exc} FROM ({view}) __mv_hv "
                    f"WHERE {plan.having}"
                )
        elif rid:
            # the id key is state, not a user column — project it away
            cols = ", ".join(
                f"`{c}`" for c in df.columns if c != "__mv_rid"
            )
            view = f"SELECT {cols} FROM {data_name}"
        else:
            view = f"SELECT * FROM {data_name}"
        self._views[name] = view
        self._mviews.add(name)
        self._save_catalog()
        return self._status("CREATE MATERIALIZED VIEW", name, 0)

    def _mv_use_merge(self, table, plan, delta) -> bool:
        """Keyed-MERGE state-fold eligibility: opted in
        (``mv_fold_mode='merge'``) or ``'auto'`` with a state table
        whose metadata-exact row count says a per-refresh overwrite
        dominates; requires group keys and a NULL-free delta key set
        (merge joins are null-unsafe — a NULL group key falls back to
        the overwrite fold, correctness over cost)."""
        if not plan.keys:
            return False
        mode = str(table.properties().get("mv_fold_mode", "auto")).lower()
        if mode == "overwrite":
            return False
        if mode != "merge" and table.count() <= 65536:
            return False
        cond = None
        for _, a in plan.keys:
            isnull = F.col(a).isNull()
            cond = isnull if cond is None else cond | isnull
        return delta.where(cond).isEmpty()

    def _mv_guard_cursor(self, table, dep) -> None:
        """REFRESH-vs-REFRESH guard (round 12): a state landing is only
        sound while the stored cursor still equals the ``dep`` this
        refresh folded from — a concurrent refresh that already
        advanced it would make this landing a DOUBLE-APPLY of the same
        CDF delta (folded state + delta, folded again).  Re-read the
        props at landing time (driver-side manifest read, no Spark
        action) and raise the typed conflict instead; the caller
        retries from the new cursor.  Check-then-commit, so a loser
        that lands in the microseconds between this read and the
        commit's version write still collides on the VERSION number
        (``_commit_typed``) — the guard converts the common
        interleavings into the typed error with the precise message."""
        from azure_databricks_lakehouse_spark.sources.tables import (
            ConcurrentModificationError,
        )

        if dep is None:
            return  # create-time / full-refresh landings have no cursor
        now = table.properties().get("mv_dep_version")
        if now != dep:
            raise ConcurrentModificationError(
                "REFRESH MATERIALIZED VIEW collided with a concurrent "
                f"refresh: the stored cursor moved {dep!r} -> {now!r} "
                "while this refresh folded its delta; re-run REFRESH "
                "to fold from the new cursor"
            )

    def _mv_land_keyed(
        self, table, on, cur, dep, repin=None, *, keys_df, live_df
    ) -> None:
        """Land AFFECTED-GROUP state rows + the refresh cursor in ONE
        commit.  ``keys_df``: the touched group keys (already cheap —
        callers derive it from a materialized frame); ``live_df``: the
        surviving rows for those groups (LAZY — each route evaluates it
        exactly once).  Two routes, same policy as the grouped fold's
        ``_mv_use_merge`` (round 13 extends it to the window/rid
        landings):

        - keyed MERGE — cost ∝ the changed groups' files, the
          huge-cardinality path (and the pinned scale contract).  The
          merge source (keys ⟕ survivors with ``__mv_dead`` marking
          groups that died) is built and ``localCheckpoint``ed HERE:
          merge's probe/write/CDC actions would each re-run the rescan
          otherwise;
        - small states (metadata-exact count ≤ 65536, ``mv_fold_mode``
          'auto'): one OVERWRITE write action — stored-minus-touched ∪
          survivors.  MERGE pays a touched-file probe + data + CDC
          actions per refresh; for a state that fits in one file the
          probe and sidecar buy nothing, and the overwrite collapses
          the refresh to a single action AND skips the merge-source
          join + checkpoint entirely (guide §1.2 — the per-commit
          statement floor is the local cost driver; identical rows).

        ``mv_fold_mode='merge'``/'overwrite' force a route.
        """
        self._mv_guard_cursor(table, dep)
        up = {"mv_dep_version": cur, **(repin or {})}
        mode = str(table.properties().get("mv_fold_mode", "auto")).lower()
        small = mode != "merge" and (
            mode == "overwrite" or table.count() <= 65536
        )
        if small:
            # live rows may be a SUPERSET of the touched groups (the
            # window path's dim-key scope rescans a superset and relies
            # on the landing to restrict to kdf's exact groups) — the
            # semi keeps only touched groups, mirroring what the keyed
            # MERGE's source join does
            live = live_df.join(keys_df, on, "left_semi")
            keep = table.read().join(keys_df, on, "left_anti")
            table.overwrite(
                keep.unionByName(live.select(*keep.columns)),
                extra_props=up,
            )
            return
        src = (
            keys_df.join(
                live_df.withColumn("__mv_alive", F.lit(True)), on, "left"
            )
            .withColumn("__mv_dead", F.col("__mv_alive").isNull())
            .drop("__mv_alive")
            .localCheckpoint()
        )
        table.merge(
            src,
            on=on,
            when_matched_delete=F.col("__mv_dead"),
            source_meta_cols=("__mv_dead",),
            validate_source_keys=False,
            extra_props=up,
        )

    def _mv_write_state(
        self, table, plan, src, cur, use_merge, dep=None, extra_props=None
    ) -> None:
        """Land per-group state rows + the refresh cursor in ONE commit
        (crash-atomic): keyed MERGE when ``src`` holds the AFFECTED
        groups only (``__mv_dead`` rows delete their target group —
        cost ∝ changed groups' files, the huge-cardinality path), else
        a full-state overwrite.  ``dep`` (when given) re-arms the
        concurrent-refresh cursor guard at landing time; ``extra_props``
        ride the same commit (the dim-change refresh re-pins
        ``mv_dep_dims`` atomically with the folded state)."""
        self._mv_guard_cursor(table, dep)
        up = {"mv_dep_version": cur, **(extra_props or {})}
        if use_merge:
            table.merge(
                src,
                on=[a for _, a in plan.keys],
                when_matched_delete=F.col("__mv_dead"),
                source_meta_cols=("__mv_dead",),
                validate_source_keys=False,
                extra_props=up,
            )
        else:
            table.overwrite(src, extra_props=up)

    def _refresh_window_mv(
        self, table, base, plan, body: str, dep: int, cur: int,
        dims: dict | None = None,
        moved: dict | None = None,
        dims_old: dict | None = None,
        dim_versions: dict | None = None,
        repin: dict | None = None,
    ) -> tuple[str, int]:
        """Incremental refresh of a per-key WINDOW MV (QUALIFY over
        windows all partitioned by the same keys — dedup-to-latest /
        top-k-per-key) by SCOPED PER-KEY RESCAN:

        1. affected keys = the key expressions over EVERY image in the
           CDF window (pre AND post, unfiltered — a row leaving the
           WHERE set still changes its key group's answer);
        2. recompute the defining query over ONLY the affected keys'
           base rows (semi-join scope; cost ∝ those keys' rows);
        3. land per key group via MERGE: groups with survivors are
           replaced wholesale (multi-row groups supported — ``rn <= k``
           keeps k rows), groups with none become delete rows.

        Sound because a window partitioned by ``pk`` makes each output
        group a pure function of the base rows carrying that key.  A
        NULL key component falls back to a full refresh: MERGE's key
        join is null-unsafe, and NULL forms a real window group."""
        from azure_databricks_lakehouse_spark.sources import mv as _mv

        key_names = [a for _, a in plan.keys]
        # alias the frames so qualified partition-key exprs (``f.pk``
        # under ``FROM b f``) resolve
        wfa = plan.fact_alias or plan.table.rsplit(".", 1)[-1]
        # classify DIM-side partition keys (grouped per dim alias —
        # keys may spread across several dims): they need the CDF
        # joined to the pinned dims for the touched-key set, and one
        # dim-semi superset scope per key-carrying dim
        dim_aliases = {a for _, a, _, _ in plan.joins}
        dim_key_map: dict[str, list[tuple[str, str]]] = {}
        for e, a in plan.keys:
            # same single-side classification the parser admitted the
            # key under (expression keys classify by their one
            # qualified-ref alias, not by a name prefix)
            al = _mv._key_side(e)
            if al and al in dim_aliases:
                dim_key_map.setdefault(al, []).append((e, a))
        moved = moved or {}
        key_sel = [F.expr(e).alias(a) for e, a in plan.keys]
        # key frames, each a SAFE superset contributor (the MERGE
        # lands only kdf's groups, and an untouched group in kdf just
        # recomputes to its stored rows):
        #   - the fact CDF names groups the fact movement touched —
        #     under BOTH the old and new dim versions when dims moved,
        #     since either version may name the group a row left or
        #     joined;
        #   - each moved dim's CDF, INNER-joined to the CURRENT fact,
        #     names the groups whose DIM side moved (pre images the
        #     losing group, post images the gaining one; item/ORDER
        #     BY/WHERE changes ride the same rows).  Only the
        #     key-referenced dims join — relaxing the other INNER
        #     joins widens the candidate set, never narrows it.
        key_frames = []
        if cur != dep:
            for ds in (
                [dims, dims_old] if (dim_key_map and moved) else [dims]
            ):
                chg = base.changes_between(dep, cur).alias(wfa)
                if dim_key_map:
                    for jt_t, jt_a, jt_k, jt_c in plan.joins:
                        chg = chg.join(
                            ds[jt_a].alias(jt_a), F.expr(jt_c), jt_k
                        )
                key_frames.append(chg.select(*key_sel))
        for a_m, (mt, pv) in moved.items():
            dcdf = self.table(mt).changes_between(pv, dim_versions[mt])
            for ds in ([dims, dims_old] if len(moved) > 1 else [dims]):
                leg = base.read().alias(wfa)
                for jt_t, jt_a, jt_k, jt_c in plan.joins:
                    if jt_a == a_m:
                        dframe = dcdf
                    elif jt_a in dim_key_map:
                        dframe = ds[jt_a]
                    else:
                        continue
                    leg = leg.join(
                        dframe.alias(jt_a), F.expr(jt_c), "inner"
                    )
                key_frames.append(leg.select(*key_sel))
        kdf = key_frames[0]
        for kf in key_frames[1:]:
            kdf = kdf.unionByName(kf)
        kdf = kdf.distinct().localCheckpoint()
        nullcond = None
        for a in key_names:
            isnull = F.col(a).isNull()
            nullcond = isnull if nullcond is None else nullcond | isnull
        # ONE scalar aggregate over the checkpointed key frame answers
        # both gates (was two isEmpty actions — round 12 action fold)
        probe_row = kdf.select(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(nullcond, 1)).alias("__nnull"),
        ).first()
        if probe_row["__n"] == 0:
            # data-preserving commits only (e.g. OPTIMIZE): nothing to
            # rescan — advance the cursor without touching state
            self._mv_guard_cursor(table, dep)
            table.set_properties(
                {"mv_dep_version": cur, **(repin or {})}
            )
            return "incremental", cur
        if probe_row["__nnull"] > 0:
            # a NULL key component: MERGE's key join is null-unsafe and
            # NULL forms a real window group — full refresh
            return "full", None
        if not dim_key_map:
            # scoped base rows: semi-join on the (fact-side) key exprs
            probe = kdf.select(
                *[F.col(a).alias(f"__mvw_{a}") for a in key_names]
            )
            cond = None
            for e, a in plan.keys:
                eq = F.expr(e).eqNullSafe(F.col(f"__mvw_{a}"))
                cond = eq if cond is None else cond & eq
            scoped = base.read().alias(wfa).join(probe, cond, "left_semi")
        else:
            # dim-side keys: per key-carrying dim, touched dim rows =
            # the pinned dim semi that dim's touched key values; scoped
            # fact = fact chained ⟕semi each dim's touched rows on its
            # join condition — a SUPERSET of the needed rows (each
            # touched pair's per-dim attributes are in the per-dim
            # probes; extra groups recompute identically and the MERGE
            # only lands kdf's exact groups), and semi joins can never
            # fan out
            scoped = base.read().alias(wfa)
            for scope_dim, dim_keys in dim_key_map.items():
                dprobe = kdf.select(
                    *[F.col(a).alias(f"__mvw_{a}") for _, a in dim_keys]
                ).distinct()
                dcond = None
                for e, a in dim_keys:
                    eq = F.expr(e).eqNullSafe(F.col(f"__mvw_{a}"))
                    dcond = eq if dcond is None else dcond & eq
                jt = next(j for j in plan.joins if j[1] == scope_dim)
                touched_dims = (
                    dims[scope_dim]
                    .alias(scope_dim)
                    .join(dprobe, dcond, "left_semi")
                    .alias(scope_dim)
                )
                scoped = scoped.join(
                    touched_dims, F.expr(jt[3]), "left_semi"
                ).alias(wfa)
        self._asof_seq += 1
        tmp = f"__mv_win_{self._asof_seq}"
        scoped.createOrReplaceTempView(tmp)
        sub = self._sub_ident(body, plan.table, tmp)
        if plan.joins:
            # window-over-join: the rescan joins the scoped fact rows
            # to the PINNED dims (frozen — the caller gates on dims_ok;
            # fact-side keys scope from the fact CDF alone, dim-side
            # keys through the pinned dims above)
            seen: set = set()
            for jt_t, jt_a, _jt_k, _jt_c in plan.joins:
                if jt_t in seen:
                    continue
                seen.add(jt_t)
                self._asof_seq += 1
                dview = f"__mv_dim_{self._asof_seq}"
                dims[jt_a].createOrReplaceTempView(dview)
                sub = self._sub_ident(sub, jt_t, dview)
        # survivors stays LAZY: the overwrite route evaluates it once
        # inside its single write action; the merge route builds (and
        # checkpoints) the keys ⟕ survivors source itself
        survivors = self._run_query(sub)
        self._mv_land_keyed(
            table, key_names, cur, dep, repin,
            keys_df=kdf, live_df=survivors,
        )
        return "incremental", cur

    def _refresh_mv_stmt(self, stmt: str) -> DataFrame:
        """``REFRESH MATERIALIZED VIEW name [FULL]`` — incremental when
        the stored plan allows (grouped aggregates under any DML via
        weighted CDF deltas; projections under append-only windows),
        full recompute otherwise or on demand.  A VACUUMed CDF horizon
        falls back to full instead of failing."""
        from azure_databricks_lakehouse_spark.sources import mv as _mv

        sm = self._REFRESH_ST.match(stmt)
        if sm:
            return self._refresh_streaming_table(_unquote_ident(sm.group(1)))
        m = self._REFRESH_MV.match(stmt)
        if not m:
            raise ValueError(f"unsupported REFRESH form: {stmt[:80]!r}")
        name = _unquote_ident(m.group(1))
        if name not in self._mviews:
            raise KeyError(f"unknown materialized view {name!r}")
        force_full = bool(m.group(2))
        data_name = f"{name}__mvdata"
        table = self.table(data_name)
        props = table.properties()
        body = props["mv_query"]
        plan = _mv.parse_plan(body)
        if plan is not None and (
            plan.table not in self._paths
            or any(t not in self._paths for t, _, _, _ in plan.joins)
        ):
            plan = None
        mode, dep_out = "full", None
        if plan is not None and not force_full:
            base = self.table(plan.table)
            cur = base.latest_version()
            dep = props.get("mv_dep_version")
            # star-join plans fold a fact-side delta against FROZEN
            # dims; a MOVED dim maintains GROUPED plans incrementally
            # too (the dim-delta legs below) and is the full-refresh
            # fallback otherwise (dims re-pinned by the full branch)
            dims: dict = {}
            dims_ok = True
            dim_moves: list[tuple[str, str, int, int]] | None = []
            dim_versions: dict[str, int] = {}
            if plan.joins:
                pinned = props.get("mv_dep_dims") or {}
                for t, a, _jt, _cond in plan.joins:
                    dt = self.table(t)
                    dv = dt.latest_version()
                    dims[a] = dt.read(dv)
                    dim_versions[t] = dv
                    pv = pinned.get(t)
                    if pv != dv:
                        dims_ok = False
                        if dim_moves is None or pv is None:
                            dim_moves = None  # unpinned: no delta source
                        else:
                            dim_moves.append((t, a, pv, dv))
            if dep == cur and dims_ok:
                return self.spark.createDataFrame(
                    [(name, "noop", dep)],
                    "view string, mode string, dep_version long",
                )
            # dim-change delta legs (round 12): for INNER-only grouped
            # star joins the exact state delta under BOTH fact and dim
            # movement is the bilinear telescoping
            #   Δ(F⋈D1⋈D2) = ΔF⋈D1ᵒ⋈D2ᵒ + Fⁿ⋈ΔD1⋈D2ᵒ + Fⁿ⋈D1ⁿ⋈ΔD2
            # (ᵒ = pinned version, ⁿ = current, ΔDi = the dim's CDF
            # slice signed like any CDF delta) — each leg is a join of
            # ONE delta slice against snapshots, so cost ∝ the changed
            # rows' join fan-out, never the tables.  LEFT joins are
            # excluded: a dim insert/delete flips fact-row MATCHEDNESS
            # there, which this algebra does not express.  Fires only
            # when every moved dim is pinned with a readable CDF
            # window (a VACUUMed horizon falls back to full).
            inner_only = all(
                jt.lower() == "inner" for _, _, jt, _ in plan.joins
            )
            dim_leg = bool(
                plan.joins
                and not dims_ok
                and dim_moves
                and plan.grouped
                and not plan.window
                and inner_only
            )
            # window MVs rescan touched KEY GROUPS, so a moved dim
            # maintains incrementally too: the dim CDF (joined to the
            # current fact) names the groups whose content moved, and
            # the rescan simply runs against the CURRENT dims.
            # INNER-only — under LEFT a dim delete shifts rows into
            # the NULL key group, which no CDF image names.
            win_dim = bool(
                plan.window and not dims_ok and dim_moves and inner_only
            )
            # rid-keyed projections: a moved dim's CDF semi-joined to
            # the current fact names the touched rids; their view rows
            # re-derive through the CURRENT dims via the same
            # rids/live/dead machinery (a dim delete INNER-unmatches a
            # rid → dead row; a dim insert admits one → live row)
            rid_dim = bool(
                plan.joins
                and not dims_ok
                and dim_moves
                and inner_only
                and not plan.grouped
                and not plan.window
                and props.get("mv_rid")
            )
            repin = (
                {"mv_dep_dims": dim_versions}
                if (dim_leg or win_dim or rid_dim)
                else None
            )
            moved: dict[str, tuple[str, int]] = {}
            dims_old: dict = {}
            if plan.joins and (dims_ok or dim_leg or win_dim or rid_dim):
                aplan = _mv.canonical_plan(plan)
                moved = {a: (t, pv) for t, a, pv, _dv in (dim_moves or [])}
                dims_old = {
                    a: (
                        self.table(moved[a][0]).read(moved[a][1])
                        if a in moved
                        else dims[a]
                    )
                    for _t, a, _j, _c in plan.joins
                }

                def _chg_rows():
                    legs = []
                    if cur != dep:
                        legs.append(
                            _mv.joined_rows(
                                plan,
                                base.changes_between(dep, cur),
                                dims_old,
                                extra_cols=("_change_type",),
                            )
                        )
                    if moved:
                        fact_new = base.read()
                        for idx, (_t, a, _j, _c) in enumerate(plan.joins):
                            if a not in moved:
                                continue
                            mt, pv = moved[a]
                            leg_dims = {}
                            for j, (t2, a2, _j2, _c2) in enumerate(
                                plan.joins
                            ):
                                if a2 == a:
                                    leg_dims[a2] = self.table(
                                        mt
                                    ).changes_between(pv, dim_versions[mt])
                                elif j < idx:
                                    leg_dims[a2] = dims[a2]  # current
                                else:
                                    leg_dims[a2] = dims_old[a2]
                            legs.append(
                                _mv.joined_rows(
                                    plan,
                                    fact_new,
                                    leg_dims,
                                    extra_cols=("_change_type",),
                                    change_alias=a,
                                )
                            )
                    out = legs[0]
                    for leg in legs[1:]:
                        out = out.unionByName(leg)
                    return out

                def _base_rows():
                    return _mv.joined_rows(plan, base.read(), dims)

            else:
                aplan = plan
                # single-table plans evaluate key/agg exprs directly
                # over these frames: alias with the FROM clause's
                # alias so qualified refs resolve (see _mv_compute)
                fa = plan.fact_alias or plan.table.rsplit(".", 1)[-1]

                def _chg_rows():
                    return base.changes_between(dep, cur).alias(fa)

                def _base_rows():
                    return base.read().alias(fa)

            if dep is not None and (dims_ok or dim_leg or win_dim or rid_dim):
                try:
                    if plan.window:
                        mode, dep_out = self._refresh_window_mv(
                            table, base, plan, body, dep, cur, dims,
                            moved=moved,
                            dims_old=dims_old,
                            dim_versions=dim_versions,
                            repin=repin,
                        )
                    elif plan.grouped and (
                        not _mv.has_extrema(plan)
                        or (
                            _mv.append_only_window(base, dep, cur)
                            # extrema only fold plainly when EVERY
                            # delta leg is append-only — a moved dim's
                            # update/delete retracts joined rows just
                            # like a fact delete
                            and all(
                                _mv.append_only_window(
                                    self.table(mt), pv, dim_versions[mt]
                                )
                                for mt, pv in moved.values()
                            )
                        )
                    ):
                        # MIN/MAX under an append-only window folds
                        # directly (no retraction possible); SUM/COUNT
                        # fold under any DML mix
                        delta = _mv.delta_state(
                            _chg_rows(), aplan
                        ).localCheckpoint()
                        use_merge = self._mv_use_merge(table, aplan, delta)
                        stored = table.read()
                        if use_merge:
                            # fold only the delta's groups; untouched
                            # groups carry over by file reference
                            stored = stored.join(
                                delta.select(
                                    *[a for _, a in aplan.keys]
                                ),
                                [a for _, a in aplan.keys],
                                "left_semi",
                            )
                        # state + watermark land in ONE commit: a crash
                        # can leave the old state (delta replays once)
                        # or the new state (cursor advanced) — never a
                        # folded state whose cursor still replays the
                        # same delta (double-apply)
                        self._mv_write_state(
                            table,
                            aplan,
                            _mv._fold_state(
                                stored, delta, aplan, keep_dead=use_merge
                            ),
                            cur,
                            use_merge,
                            dep=dep,
                            extra_props=repin,
                        )
                        mode, dep_out = "incremental", cur
                    elif plan.grouped and plan.keys:
                        # MIN/MAX under retractions: optimistic fold +
                        # targeted rescan of exactly the groups whose
                        # removed values reached the stored extremum —
                        # cost ∝ changed rows + the rescanned groups'
                        # base rows, never the whole table
                        delta = _mv.retraction_delta(
                            _chg_rows(), aplan
                        ).localCheckpoint()
                        key_names = [a for _, a in aplan.keys]
                        use_merge = self._mv_use_merge(table, aplan, delta)
                        stored = table.read()
                        if use_merge:
                            stored = stored.join(
                                delta.select(*key_names),
                                key_names,
                                "left_semi",
                            )
                        folded = _mv.fold_with_retraction(
                            stored, delta, aplan, keep_dead=use_merge
                        ).localCheckpoint()
                        unsafe = folded.filter("__mv_unsafe").select(
                            *key_names
                        )
                        rescan = not unsafe.isEmpty()
                        final = folded.filter("NOT __mv_unsafe").drop(
                            "__mv_unsafe"
                        )
                        if rescan:
                            rows = _base_rows()
                            # disambiguate: key exprs resolve against
                            # the base side, the probe side renames
                            # (join plans' rows are already canonical —
                            # aplan's key exprs ARE the aliases)
                            u = unsafe.select(
                                *[
                                    F.col(a).alias(f"__mvu_{a}")
                                    for _, a in aplan.keys
                                ]
                            )
                            cond = None
                            for (e, a) in aplan.keys:
                                eq = F.expr(e).eqNullSafe(
                                    F.col(f"__mvu_{a}")
                                )
                                cond = eq if cond is None else cond & eq
                            scoped = rows.join(u, cond, "left_semi")
                            recomputed = _mv.full_state(scoped, aplan)
                            if use_merge:
                                # unsafe keys absent from the rescan
                                # are dead groups -> MERGE delete rows
                                state_cols = [
                                    c
                                    for c in _mv.state_columns(aplan)
                                    if c not in key_names
                                ]
                                unsafe_final = unsafe.join(
                                    recomputed, key_names, "left"
                                ).select(
                                    *key_names,
                                    *state_cols,
                                    F.col(_mv._N)
                                    .isNull()
                                    .alias("__mv_dead"),
                                )
                                final = final.unionByName(unsafe_final)
                            else:
                                final = final.unionByName(recomputed)
                        self._mv_write_state(
                            table,
                            aplan,
                            final,
                            cur,
                            use_merge,
                            dep=dep,
                            extra_props=repin,
                        )
                        mode = "incremental_rescan" if rescan else (
                            "incremental"
                        )
                        dep_out = cur
                    elif plan.grouped:
                        # global (keyless) extrema: one-row state — a
                        # scalar safety check (metadata-sized collect)
                        # decides fold vs recompute
                        delta_df = _mv.retraction_delta(
                            _chg_rows(), aplan
                        ).localCheckpoint()
                        if _mv.global_fold_safe(
                            delta_df.first(), table.read().first(), aplan
                        ):
                            self._mv_guard_cursor(table, dep)
                            table.overwrite(
                                _mv.global_fold(
                                    table.read(), delta_df, aplan
                                ),
                                extra_props={
                                    "mv_dep_version": cur,
                                    **(repin or {}),
                                },
                            )
                            mode, dep_out = "incremental", cur
                        else:
                            self._mv_guard_cursor(table, dep)
                            table.overwrite(
                                _mv.full_state(_base_rows(), aplan),
                                extra_props={
                                    "mv_dep_version": cur,
                                    **(repin or {}),
                                },
                            )
                            mode, dep_out = "incremental_rescan", cur
                    elif (
                        not plan.grouped
                        and props.get("mv_rid")
                        and all(
                            base._rt_state(base._manifest(v)) is not None
                            for v in range(dep, cur + 1)
                        )
                    ):
                        # projection over a ROW-TRACKED base: CDF rows
                        # carry stable ids, so the state (keyed by
                        # __mv_rid) maintains under ARBITRARY DML — the
                        # composition row tracking exists for.  Per id,
                        # the LAST event decides presence (within one
                        # commit the post-image outranks its pre-image)
                        # and supplies the image; images failing the
                        # MV's WHERE predicate delete too.
                        meta = {
                            "_change_type",
                            "_commit_version",
                            "_commit_timestamp",
                            "_row_id",
                        }
                        ev = None
                        base_cols = None
                        if cur != dep:
                            ch = base.changes_between(
                                dep, cur, with_row_ids=True
                            )
                            base_cols = [
                                c for c in ch.columns if c not in meta
                            ]
                            ev = ch.select(
                                *base_cols,
                                F.col("_row_id").alias("__mv_rid"),
                                "_commit_version",
                                F.col("_change_type")
                                .isin("insert", "update_postimage")
                                .cast("int")
                                .alias("__ins"),
                            )
                        if moved:
                            # dim-change (round 12, session 2): rids of
                            # current fact rows joined to a moved dim's
                            # CDF images become PSEUDO insert events at
                            # version -1 — a real CDF event outranks
                            # them in the per-rid window, and the
                            # rids/live/dead fold re-derives each
                            # touched rid through the CURRENT dims
                            cur_rt = base.read(with_row_ids=True)
                            if base_cols is None:
                                base_cols = [
                                    c
                                    for c in cur_rt.columns
                                    if c not in meta
                                ]
                            pfa0 = plan.fact_alias or plan.table.rsplit(
                                ".", 1
                            )[-1]
                            touched_f = None
                            for a_m, (mt, pv) in moved.items():
                                dcdf = self.table(mt).changes_between(
                                    pv, dim_versions[mt]
                                )
                                jmt = next(
                                    j
                                    for j in plan.joins
                                    if j[1] == a_m
                                )
                                part = cur_rt.alias(pfa0).join(
                                    dcdf.alias(a_m),
                                    F.expr(jmt[3]),
                                    "left_semi",
                                )
                                touched_f = (
                                    part
                                    if touched_f is None
                                    else touched_f.unionByName(part)
                                )
                            pseudo = touched_f.distinct().select(
                                *base_cols,
                                F.col("_row_id").alias("__mv_rid"),
                                F.lit(-1)
                                .cast("long")
                                .alias("_commit_version"),
                                F.lit(1).alias("__ins"),
                            )
                            ev = (
                                pseudo
                                if ev is None
                                else ev.unionByName(pseudo)
                            )
                        from pyspark.sql import Window as _W

                        last = (
                            ev.withColumn(
                                "__rn",
                                F.row_number().over(
                                    _W.partitionBy("__mv_rid").orderBy(
                                        F.col("_commit_version").desc(),
                                        F.col("__ins").desc(),
                                    )
                                ),
                            )
                            .filter(F.col("__rn") == 1)
                            .drop("__rn", "_commit_version")
                            # pin the per-rid last events: the frame
                            # branches (rids + live) and feeds a MERGE
                            # whose probe/write/CDC actions would each
                            # re-evaluate the CDF-with-row-ids scan and
                            # the window (measured 10.8 s → ~2 s on the
                            # q56 rid refresh); size ∝ the CDF slice,
                            # never the table
                            .localCheckpoint()
                        )
                        pfa = plan.fact_alias or plan.table.rsplit(
                            ".", 1
                        )[-1]
                        if plan.joins:
                            # projection-over-join (round 12): per-rid
                            # post-images re-derive their view rows
                            # through the PINNED dims (dims_ok gated);
                            # a 1:N dim fans a rid into a multi-row
                            # group replaced wholesale, a rid with no
                            # surviving row (deleted, WHERE-failed, or
                            # INNER-unmatched) becomes a delete row
                            rids = last.select("__mv_rid").distinct()
                            jf = (
                                last.filter(F.col("__ins") == 1)
                                .drop("__ins")
                                .alias(pfa)
                            )
                            for jt_t, jt_a, jt_k, jt_c in plan.joins:
                                jf = jf.join(
                                    dims[jt_a].alias(jt_a),
                                    F.expr(jt_c),
                                    jt_k,
                                )
                            if plan.where:
                                jf = jf.filter(F.expr(plan.where))
                            # live stays LAZY over the checkpointed
                            # `last`: the overwrite route evaluates it
                            # once in its single write; the merge route
                            # builds + checkpoints rids ⟕ live itself
                            live = jf.selectExpr(
                                *[
                                    i.strip()
                                    for i in _split_top(plan.items, ",")
                                ],
                                "__mv_rid",
                            )
                        else:
                            last = last.alias(pfa)
                            alive = F.col("__ins") == 1
                            if plan.where:
                                alive = alive & F.coalesce(
                                    F.expr(plan.where), F.lit(False)
                                )
                            last = last.withColumn(
                                "__mv_dead", ~alive
                            ).drop("__ins")
                            self._asof_seq += 1
                            tmp = f"__mv_rid_{self._asof_seq}"
                            last.createOrReplaceTempView(tmp)
                            rids = self.spark.sql(
                                f"SELECT __mv_rid FROM {tmp}"
                            )
                            live = self.spark.sql(
                                f"SELECT {plan.items}, __mv_rid, "
                                f"__mv_dead FROM {tmp} AS `{pfa}`"
                            ).filter(~F.col("__mv_dead")).drop("__mv_dead")
                        self._mv_land_keyed(
                            table, ["__mv_rid"], cur, dep, repin,
                            keys_df=rids, live_df=live,
                        )
                        mode, dep_out = "incremental", cur
                    elif not plan.grouped and _mv.append_only_window(
                        base, dep, cur
                    ):
                        ch = (
                            base.changes_between(dep, cur)
                            .filter(
                                F.col("_change_type").isin(
                                    "insert", "update_postimage"
                                )
                            )
                            .drop(
                                "_change_type",
                                "_commit_version",
                                "_commit_timestamp",
                            )
                        )
                        self._asof_seq += 1
                        tmp = f"__mv_chg_{self._asof_seq}"
                        ch.createOrReplaceTempView(tmp)
                        pfa = plan.fact_alias or plan.table.rsplit(
                            ".", 1
                        )[-1]
                        if plan.joins:
                            # append-only projection-over-join: new
                            # fact rows joined to the frozen dims ARE
                            # the new view rows (no old row's output
                            # can change while dims sit pinned)
                            jf = ch.alias(pfa)
                            for jt_t, jt_a, jt_k, jt_c in plan.joins:
                                jf = jf.join(
                                    dims[jt_a].alias(jt_a),
                                    F.expr(jt_c),
                                    jt_k,
                                )
                            if plan.where:
                                jf = jf.filter(F.expr(plan.where))
                            new_rows = jf.selectExpr(
                                *[
                                    i.strip()
                                    for i in _split_top(plan.items, ",")
                                ]
                            )
                        else:
                            q = (
                                f"SELECT {plan.items} FROM {tmp} "
                                f"AS `{pfa}`"
                            )
                            if plan.where:
                                q += f" WHERE {plan.where}"
                            new_rows = self.spark.sql(q)
                        self._mv_guard_cursor(table, dep)
                        table.append(
                            new_rows,
                            props_update=lambda p: {
                                **p,
                                "mv_dep_version": cur,
                            },
                        )
                        mode, dep_out = "incremental", cur
                except FileNotFoundError:
                    mode = "full"  # CDF horizon VACUUMed: recompute
        if mode == "full":
            df, dep_out, dimver = self._mv_compute(body, plan)
            up: dict = {"mv_query": body}
            if plan is not None:
                up["mv_dep_table"] = plan.table
                up["mv_dep_version"] = dep_out
                if dimver:
                    # re-pin the dim versions with the recompute
                    up["mv_dep_dims"] = dimver
            if "__mv_rid" in df.columns and not props.get("mv_rid"):
                # created WITHOUT the id key: keep the state shape the
                # stored view projects (SELECT * would leak the key)
                df = df.drop("__mv_rid")
            # the rid key follows the recompute (base may have LOST row
            # tracking since create); None unsets
            up["mv_rid"] = True if "__mv_rid" in df.columns else None
            table.overwrite(df, extra_props=up)
        return self.spark.createDataFrame(
            [(name, mode, dep_out)],
            "view string, mode string, dep_version long",
        )

    _CREATE_ST = _ci(
        r"^CREATE\s+STREAMING\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
        r"(?P<name>`?[\w.]+`?)\s*(?:LOCATION\s+'(?P<loc>[^']*)'\s*)?"
        r"AS\s+(?P<body>SELECT\b.*)$"
    )
    _ST_BODY = _ci(
        r"^SELECT\s+(?P<items>.+?)\s+FROM\s+STREAM\s*\(\s*"
        r"(?P<src>`?[\w.]+`?)\s*\)(?:\s+WHERE\s+(?P<where>.+))?$"
    )
    _REFRESH_ST = _ci(r"^REFRESH\s+STREAMING\s+TABLE\s+(`?[\w.]+`?)$")

    def _create_streaming_table(self, m) -> DataFrame:
        """DLT parity: ``CREATE STREAMING TABLE name AS SELECT ... FROM
        STREAM(src) [WHERE ...]`` — continuous table-to-table ingestion
        composed from the engine's own primitives: the CDF-backed plain
        table stream (appends only; a rewrite commit in the source
        RAISES — Delta's streaming-table contract) feeding the
        checkpointed transactional-append sink, so each REFRESH drains
        exactly the new source commits exactly-once.  The pipeline spec
        (query + checkpoint) rides the target table's props; the target
        is a plain registered table (DML/OPTIMIZE/time travel all
        apply)."""
        name = _unquote_ident(m.group("name"))
        if name in self._paths and m.group("ine"):
            return self._status("CREATE STREAMING TABLE (exists)", name, None)
        if name in self._paths or name in self._views or name in self._mviews:
            raise ValueError(f"name in use: {name}")
        body = " ".join(m.group("body").split())
        bm = self._ST_BODY.match(body)
        if not bm:
            raise ValueError(
                "CREATE STREAMING TABLE needs AS SELECT ... FROM "
                f"STREAM(table) [WHERE ...]; got {body[:80]!r}"
            )
        src = _unquote_ident(bm.group("src"))
        src_table = self.table(src)  # must be a lakehouse table
        loc = m.group("loc") or self._default_location(name)
        # schema probe: the select over a zero-row batch slice
        self._asof_seq += 1
        tmp = f"__st_probe_{self._asof_seq}"
        src_table.read().limit(0).createOrReplaceTempView(tmp)
        q = f"SELECT {bm.group('items')} FROM {tmp}"
        if bm.group("where"):
            q += f" WHERE {bm.group('where')}"
        empty = self.spark.sql(q)
        t = ParquetTable.create(self.spark, loc, empty)
        ckpt = self._default_location(f"{name}__checkpoint")
        t.set_properties({"st_query": body, "st_checkpoint": ckpt})
        self._paths[name] = os.path.abspath(loc)
        self._save_catalog()
        self._refresh_streaming_table(name)  # drain the initial backlog
        return self._status(
            "CREATE STREAMING TABLE", name, self.table(name).latest_version()
        )

    def _refresh_streaming_table(self, name: str) -> DataFrame:
        """One ``availableNow`` drain of the streaming table's pipeline —
        exactly-once via the persistent checkpoint + per-batch txn
        appends (a replayed micro-batch skips at metadata cost)."""
        from azure_databricks_lakehouse_spark.streaming import jobs as _jobs

        table = self.table(name)
        props = table.properties()
        body = props.get("st_query")
        if not body:
            raise ValueError(f"{name} is not a streaming table")
        bm = self._ST_BODY.match(body)
        src = _unquote_ident(bm.group("src"))
        stream = _jobs.read_table_stream(self.spark, self._paths[src])
        self._asof_seq += 1
        tmp = f"__st_src_{self._asof_seq}"
        stream.createOrReplaceTempView(tmp)
        q = f"SELECT {bm.group('items')} FROM {tmp}"
        if bm.group("where"):
            q += f" WHERE {bm.group('where')}"
        df = self.spark.sql(q)
        ckpt = props["st_checkpoint"]
        query = _jobs.write_stream_to_table(
            df,
            self._paths[name],
            ckpt,
            txn_app=_jobs._checkpoint_lineage(ckpt),
        )
        query.awaitTermination()
        return self._status(
            "REFRESH STREAMING TABLE", name, table.latest_version()
        )

    def _create(self, stmt: str) -> DataFrame:
        mm = self._CREATE_MV.match(stmt)
        if mm:
            return self._create_mv(mm)
        sm = self._CREATE_ST.match(stmt)
        if sm:
            return self._create_streaming_table(sm)
        vm = self._CREATE_VIEW.match(stmt)
        if vm:
            name = _unquote_ident(vm.group("name"))
            if name in self._views and vm.group("ine"):
                return self._status("CREATE VIEW (exists)", name, None)
            if name in self._views and not vm.group("replace"):
                raise ValueError(f"view exists: {name}")
            if name in self._paths:
                raise ValueError(f"{name} is a table, not a view")
            body = vm.group("body")
            self._run_query(body)  # validate now, not at first read
            self._views[name] = body
            self._save_catalog()
            return self._status("CREATE VIEW", name, None)
        m = self._CREATE.match(stmt)
        if not m:
            raise ValueError(f"unsupported CREATE form: {stmt[:80]!r}")
        name = _unquote_ident(m.group("name"))
        replace = bool(m.group("replace"))
        if_not_exists = bool(m.group("ine"))
        rest = m.group("rest").strip()

        clone = _ci(
            r"^(?:SHALLOW\s+|DEEP\s+)?CLONE\s+(`?[\w.]+`?)"
            r"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?"
            r"(?:\s+LOCATION\s+'([^']*)')?$"
        ).match(rest)
        if clone:
            src = self.table(clone.group(1))
            version = int(clone.group(2)) if clone.group(2) else None
            dest = clone.group(3) or self._default_location(name)
            if name in self._paths and if_not_exists:
                return self._status("CREATE TABLE (exists)", name, None)
            src.clone(dest, version=version)
            self.register(name, dest)
            return self._status("CLONE", name, 0)

        like = _ci(
            r"^LIKE\s+(`?[\w.]+`?)\s*(?:LOCATION\s+'([^']*)')?$"
        ).match(rest)
        if like:
            # CREATE TABLE new LIKE src: the DECLARATIVE surface only —
            # schema, partitioning, clustering intent, column clauses
            # (NOT NULL / DEFAULT / GENERATED / IDENTITY with a FRESH
            # high water), CHECK constraints, user TBLPROPERTIES.  No
            # data, no history, and none of the engine state a new
            # empty table cannot have earned (statistics, txn
            # watermarks, blooms' built state).
            if name in self._paths and if_not_exists:
                return self._status("CREATE TABLE (exists)", name, None)
            src = self.table(like.group(1))
            sm = src._manifest()
            sprops = sm.get("props", {})
            dest = like.group(2) or self._default_location(name)
            empty = self.spark.createDataFrame(
                [], _schema_from_json(self.spark, sm["schema"])
            )
            inv = {p: l for l, p in sm.get("colmap", {}).items()}
            t = ParquetTable.create(
                self.spark,
                dest,
                empty,
                partition_by=[inv.get(c, c) for c in sm["partition_by"]]
                or None,
            )
            carried = {
                k: v
                for k, v in sprops.items()
                if k not in ("statistics", "txns", "bloom", "clustering")
            }
            if "identity" in carried:
                carried["identity"] = {
                    c: {**cfg, "high_water": None}
                    for c, cfg in carried["identity"].items()
                }
            clu = (sprops.get("clustering") or {}).get("cols")
            if clu and not carried.get("clustering_intent"):
                carried["clustering_intent"] = list(clu)
            if carried:
                t.set_properties(carried)
            self.register(name, dest)
            return self._status(
                "CREATE TABLE LIKE", name, t.latest_version()
            )

        # column defs?
        coldefs = None
        if rest.startswith("("):
            depth = 0
            for i, ch in enumerate(rest):
                depth += ch == "("
                depth -= ch == ")"
                if depth == 0:
                    coldefs = rest[1:i]
                    rest = rest[i + 1 :].strip()
                    break

        opts = self._create_options(rest)
        if name in self._paths and if_not_exists:
            return self._status("CREATE TABLE (exists)", name, None)

        if opts["as_select"] is not None:  # CTAS
            df = self._run_query(opts["as_select"])
            location = opts["location"] or self._default_location(name)
            if is_table(location):
                if not replace:
                    raise FileExistsError(f"table exists: {location}")
                t = ParquetTable.for_path(self.spark, location)
                t.overwrite(df)
            else:
                t = ParquetTable.create(
                    self.spark,
                    location,
                    df,
                    partition_by=opts["partitioned_by"] or None,
                    cluster_by=opts["cluster_by"] or None,
                )
            if opts["properties"]:
                t.set_properties(opts["properties"])
            self.register(name, location)
            return self._status("CREATE TABLE AS SELECT", name, t.latest_version())

        if coldefs is None:
            # registration form: CREATE TABLE name USING DELTA LOCATION '...'
            location = opts["location"]
            if not location:
                raise ValueError(
                    "CREATE TABLE without columns needs LOCATION '...' "
                    "(the reference's registration form) or AS SELECT"
                )
            if not is_table(location):
                raise ValueError(
                    f"no lakehouse table at {location!r}; for a plain "
                    "parquet directory run CONVERT TO DELTA first"
                )
            self.register(name, location)
            return self._status("CREATE TABLE (registered)", name, None)

        # empty table with declared schema
        location = opts["location"] or self._default_location(name)
        if is_table(location) and not replace:
            raise FileExistsError(f"table exists: {location}")
        return self._create_with_schema(name, coldefs, location, opts, replace)

    def _create_options(self, rest: str) -> dict:
        opts = {
            "location": None,
            "partitioned_by": [],
            "cluster_by": [],
            "properties": {},
            "as_select": None,
        }
        asm = _ci(r"\bAS\s+(SELECT|WITH|VALUES)\b").search(rest)
        if asm:
            opts["as_select"] = rest[asm.start() :].split(None, 1)[1]
            rest = rest[: asm.start()]
        loc = _ci(r"\bLOCATION\s+'([^']*)'").search(rest)
        if loc:
            opts["location"] = loc.group(1)
        part = _ci(r"\bPARTITIONED\s+BY\s*\(([^)]*)\)").search(rest)
        if part:
            opts["partitioned_by"] = _ident_list(part.group(1))
        clu = _ci(r"\bCLUSTER\s+BY\s*\(([^)]*)\)").search(rest)
        if clu:
            opts["cluster_by"] = _ident_list(clu.group(1))
        props = _ci(r"\bTBLPROPERTIES\s*\(").search(rest)
        if props:
            depth, start = 0, props.end() - 1
            for i in range(start, len(rest)):
                depth += rest[i] == "("
                depth -= rest[i] == ")"
                if depth == 0:
                    opts["properties"] = self._parse_props(rest[start + 1 : i])
                    break
        return opts

    @staticmethod
    def _parse_props(raw: str) -> dict:
        out = {}
        for item in _split_top(raw, ","):
            k, _, v = item.partition("=")
            k = k.strip().strip("'\"")
            v = v.strip()
            if v.startswith("'") or v.startswith('"'):
                out[k] = v[1:-1]
            elif v.lower() in ("true", "false"):
                out[k] = v.lower() == "true"
            else:
                try:
                    out[k] = int(v)
                except ValueError:
                    out[k] = v
        return out

    _COLDEF = _ci(
        r"^(?P<name>`?\w+`?)\s+(?P<type>[\w]+(?:\s*\([^)]*\))?(?:\s*<.*>)?)"
        r"(?P<rest>.*)$"
    )

    def _create_with_schema(
        self,
        name: str,
        coldefs: str,
        location: str,
        opts: dict,
        replace: bool = False,
    ) -> DataFrame:
        plain: list[tuple[str, str]] = []
        not_null: list[str] = []
        defaults: dict[str, str] = {}
        generated: list[tuple[str, str, str]] = []
        identity: list[tuple[str, int, int, bool]] = []
        for item in _split_cols(coldefs):
            cm = self._COLDEF.match(item.strip())
            if not cm:
                raise ValueError(f"cannot parse column definition: {item!r}")
            col = _unquote_ident(cm.group("name"))
            dtype = cm.group("type").strip()
            tail = cm.group("rest").strip()
            ident = _ci(
                r"GENERATED\s+(?P<mode>ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY"
                r"(?:\s*\(\s*START\s+WITH\s+(-?\d+)\s+"
                r"INCREMENT\s+BY\s+(-?\d+)\s*\))?"
            ).search(tail)
            gen = _ci(r"GENERATED\s+ALWAYS\s+AS\s*\((?P<e>.*)\)\s*$").search(tail)
            if not ident and not gen and _ci(r"\bGENERATED\b").search(tail):
                raise ValueError(
                    f"unsupported GENERATED clause in {item.strip()!r}: "
                    "expression columns are GENERATED ALWAYS AS (expr); "
                    "only IDENTITY supports BY DEFAULT"
                )
            if ident:
                identity.append(
                    (
                        col,
                        int(ident.group(2) or 1),
                        int(ident.group(3) or 1),
                        ident.group("mode").upper() == "ALWAYS",
                    )
                )
                continue
            if gen and not ident:
                generated.append((col, dtype, gen.group("e")))
                continue
            plain.append((col, dtype))
            if _ci(r"\bNOT\s+NULL\b").search(tail):
                not_null.append(col)
            dm = _ci(r"\bDEFAULT\s+(.+?)(?:\s+NOT\s+NULL)?\s*$").search(tail)
            if dm:
                defaults[col] = dm.group(1).strip()
        if not plain:
            raise ValueError("a table needs at least one non-generated column")
        ddl = ", ".join(f"`{c}` {t}" for c, t in plain)
        empty = self.spark.createDataFrame([], ddl)
        if is_table(location):
            if not replace:
                raise FileExistsError(f"table exists: {location}")
            t = ParquetTable.for_path(self.spark, location)
            t.overwrite(empty)  # history survives, Delta REPLACE style
        else:
            t = ParquetTable.create(
                self.spark,
                location,
                empty,
                partition_by=opts["partitioned_by"] or None,
            )
        for col, start, step, always in identity:
            t.add_identity_column(col, start=start, step=step, always=always)
        for col, dtype, expr in generated:
            t.add_generated_column(col, dtype, expr)
        for col in not_null:
            t.set_not_null(col)
        for col, expr in defaults.items():
            t.set_default(col, expr)
        if opts["properties"]:
            t.set_properties(opts["properties"])
        if opts["cluster_by"]:
            # empty table: record intent only; first optimize applies it
            t.set_properties({"clustering_intent": opts["cluster_by"]})
        self.register(name, location)
        return self._status("CREATE TABLE", name, t.latest_version())

    # -- CONVERT ------------------------------------------------------------

    _CONVERT = _ci(
        r"^CONVERT\s+TO\s+DELTA\s+parquet\s*\.\s*`([^`]+)`"
        r"(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?$"
    )

    def _convert(self, stmt: str) -> DataFrame:
        m = self._CONVERT.match(stmt)
        if not m:
            raise ValueError(
                "supported form: CONVERT TO DELTA parquet.`/path` "
                "[PARTITIONED BY (col type, ...)]"
            )
        path = m.group(1)
        parts = (
            [p.strip() for p in _split_top(m.group(2), ",")]
            if m.group(2)
            else None
        )
        ParquetTable.convert(self.spark, path, partition_by=parts)
        return self._status("CONVERT", path, 0)

    # -- MERGE --------------------------------------------------------------

    _MERGE = _ci(
        r"^MERGE\s+(?P<evo>WITH\s+SCHEMA\s+EVOLUTION\s+)?"
        r"INTO\s+(?P<tgt>`?[\w.]+`?)(?:\s+AS)?\s*(?P<ta>\w+)?\s+"
        r"USING\s+(?P<src>\((?:[^()]|\([^()]*\))*\)|`?[\w.]+`?)(?:\s+AS)?"
        r"\s*(?P<sa>\w+)?\s+ON\s+(?P<on>.+?)\s+(?P<clauses>WHEN\s+.*)$"
    )

    def _merge(self, stmt: str) -> DataFrame:
        m = self._MERGE.match(stmt)
        if not m:
            raise ValueError(f"unsupported MERGE form: {stmt[:80]!r}")
        tgt_name = _unquote_ident(m.group("tgt"))
        evolve = bool(m.group("evo"))
        t_alias = m.group("ta") or tgt_name
        s_alias = m.group("sa")
        src_raw = m.group("src").strip()
        table = self.table(tgt_name)

        if src_raw.startswith("("):
            source = self._run_query(src_raw[1:-1].strip())
            s_alias = s_alias or "src"
        else:
            src_name = _unquote_ident(src_raw)
            s_alias = s_alias or src_name
            if src_name in self._paths:
                source = self.table(src_name).read()
            else:
                source = self.spark.table(src_name)

        keys = self._merge_keys(m.group("on"), t_alias, s_alias)
        clauses = self._merge_clauses(m.group("clauses"), t_alias, s_alias)

        # the star fast path is exactly the reference's updateAll/
        # insertAll shape: unconditional UPDATE SET * / INSERT *, DELETE
        # gated by a source predicate.  Anything else — per-column SET,
        # explicit INSERT columns, predicated update/insert,
        # unconditional DELETE — takes the ordered-cascade rewrite path.
        star_only = all(
            c["kind"] in ("update", "delete", "insert")
            and c["payload"] is None
            and (
                c["pred"] is not None
                if c["kind"] == "delete"
                else c["pred"] is None
            )
            for c in clauses
        )
        if not star_only:
            # per-column SET / explicit INSERT columns / ordered or
            # unconditional clause forms: the rewrite path computes full
            # post-image rows and feeds the same table-layer merge()
            return self._merge_percol(
                table,
                tgt_name,
                source,
                keys,
                clauses,
                t_alias,
                s_alias,
                evolve=evolve,
            )

        update_all = any(c["kind"] == "update" for c in clauses)
        insert_all = any(c["kind"] == "insert" for c in clauses)
        delete_pred = None
        for c in clauses:
            if c["kind"] == "delete":
                delete_pred = F.expr(
                    self._strip_alias(c["pred"], s_alias, t_alias)
                )

        if not update_all and not insert_all:
            raise ValueError("MERGE needs UPDATE SET * and/or INSERT *")
        # merge() is updateAll+insertAll; narrow the source for the
        # one-sided forms so SQL semantics hold exactly.  The key-set
        # frame is aggregated to DISTINCT keys before joining, and AQE
        # picks the join strategy (broadcast when the key set is small).
        if update_all != insert_all:
            tgt_keys = table.read().select(*keys).distinct()
            how = "semi" if update_all else "anti"
            if delete_pred is not None and not update_all:
                # INSERT *-only + CDC delete (round-7 ADVICE): the
                # anti-join narrows away MATCHED source rows, but the
                # delete-flagged ones must reach merge() for
                # when_matched_delete to fire.  Anti-join only the
                # non-flagged rows; keep flagged rows wholesale —
                # merge() treats an unmatched delete row as a no-op
                # (its CDC contract), so no spurious inserts result.
                flag = F.coalesce(delete_pred, F.lit(False))
                source = (
                    source.filter(~flag)
                    .join(tgt_keys, on=keys, how="anti")
                    .unionByName(source.filter(flag))
                )
            else:
                source = source.join(tgt_keys, on=keys, how=how)
        # UPDATE SET * / INSERT * take the TARGET's column set (Delta's
        # star expansion): source-only columns (CDC op flags, sequence
        # numbers) are meta columns consumed by the clauses, never
        # schema-evolved into the table — UNLESS the statement opted in
        # with WITH SCHEMA EVOLUTION, in which case the star expansion
        # is the SOURCE's column set and new columns widen the table
        # (Delta's withSchemaEvolution star semantics).
        meta = (
            []
            if evolve
            else [c for c in source.columns if c not in table.read().columns]
        )
        version = table.merge(
            source,
            on=keys,
            when_matched_delete=delete_pred,
            source_meta_cols=meta,
            evolve_schema=evolve,
        )
        return self._status("MERGE", tgt_name, version)

    # split only at WHEN that starts a clause — an RHS CASE WHEN inside
    # a SET assignment must not be torn apart
    _CLAUSE_SPLIT = _ci(r"\bWHEN\s+(?=(?:NOT\s+)?MATCHED\b)")

    def _merge_clauses(
        self, text: str, t_alias: str, s_alias: str
    ) -> list[dict]:
        """Parse the ordered WHEN-clause list.  Each entry is
        ``{"kind": update|delete|insert, "pred": str|None, "payload"}``
        where payload is ``None`` for the star forms (``UPDATE SET *``
        / ``INSERT *`` / ``DELETE``) or a {column: expression-string}
        map for per-column ``UPDATE SET c = e`` / ``INSERT (cols)
        VALUES (exprs)``."""
        out: list[dict] = []
        supported = (
            "supported: WHEN MATCHED [AND p] THEN UPDATE SET * | "
            "UPDATE SET c = e, ... | DELETE; WHEN NOT MATCHED [AND p] "
            "THEN INSERT * | INSERT (cols) VALUES (exprs); WHEN NOT "
            "MATCHED BY SOURCE [AND p] THEN UPDATE SET c = e, ... | "
            "DELETE (the reference itself uses exactly "
            "updateAll/insertAll, gold/gold_rx_claims_load.py:216-221)"
        )
        for clause in self._CLAUSE_SPLIT.split(text):
            clause = clause.strip()
            if not clause:
                continue
            cm = _ci(
                r"^(?P<not>NOT\s+)?MATCHED(?P<bysrc>\s+BY\s+SOURCE)?"
                r"(?:\s+AND\s+(?P<pred>.+?))?\s+"
                r"THEN\s+(?P<action>.+)$"
            ).match(clause)
            if not cm:
                raise ValueError(
                    f"unsupported MERGE clause {clause!r}; {supported}"
                )
            neg = bool(cm.group("not"))
            bysrc = bool(cm.group("bysrc"))
            if bysrc and not neg:
                raise ValueError(
                    "MATCHED BY SOURCE is not a clause — Delta's "
                    "target-only form is WHEN NOT MATCHED BY SOURCE"
                )
            pred = cm.group("pred")
            action = cm.group("action").strip()
            au = re.sub(r"\s+", " ", action.upper())
            if bysrc and not (au == "DELETE" or au.startswith("UPDATE SET ")):
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports only DELETE or "
                    "UPDATE SET c = e, ... (there is no source row to "
                    "INSERT or to star-expand from)"
                )
            if au == "DELETE":
                if neg and not bysrc:
                    raise ValueError(
                        "DELETE is a WHEN MATCHED clause (an unmatched "
                        "source row has nothing to delete); target rows "
                        "absent from the source take WHEN NOT MATCHED "
                        "BY SOURCE THEN DELETE"
                    )
                out.append(
                    {
                        "kind": "delete_by_source" if bysrc else "delete",
                        "pred": pred,
                        "payload": None,
                    }
                )
            elif au == "UPDATE SET *":
                if neg:
                    raise ValueError(
                        "UPDATE SET * is a WHEN MATCHED clause"
                        + (
                            " — BY SOURCE has no source row to expand "
                            "* from; name the columns"
                            if bysrc
                            else ""
                        )
                    )
                out.append({"kind": "update", "pred": pred, "payload": None})
            elif au.startswith("UPDATE SET "):
                if neg and not bysrc:
                    raise ValueError("UPDATE SET is a WHEN MATCHED clause")
                body = _ci(r"^UPDATE\s+SET\s+").sub("", action)
                assigns: dict[str, str] = {}
                for a in _split_top(body, ","):
                    mm = re.match(
                        r"^\s*(?:(\w+)\s*\.\s*)?`?(\w+)`?\s*=\s*(.+)$",
                        a.strip(),
                        re.DOTALL,
                    )
                    if not mm:
                        raise ValueError(
                            f"unparsable SET assignment {a.strip()!r}; "
                            "expected col = expression"
                        )
                    alias, colname, rhs = mm.groups()
                    if alias is not None and alias != t_alias:
                        raise ValueError(
                            f"SET target {alias}.{colname} must use the "
                            f"target alias {t_alias!r}"
                        )
                    if colname in assigns:
                        raise ValueError(
                            f"duplicate SET assignment for {colname!r}"
                        )
                    assigns[colname] = rhs.strip()
                if bysrc:
                    for text_part in [pred or ""] + list(assigns.values()):
                        if re.search(
                            rf"\b{re.escape(s_alias)}\s*\.", text_part
                        ):
                            raise ValueError(
                                "WHEN NOT MATCHED BY SOURCE expressions "
                                "may reference only the target alias "
                                f"{t_alias!r} — there is no source row"
                            )
                out.append(
                    {
                        "kind": "update_by_source" if bysrc else "update",
                        "pred": pred,
                        "payload": assigns,
                    }
                )
            elif au == "INSERT *":
                if not neg:
                    raise ValueError(
                        "INSERT * is a WHEN NOT MATCHED clause"
                    )
                out.append({"kind": "insert", "pred": pred, "payload": None})
            else:
                im = _ci(
                    r"^INSERT\s*\((?P<cols>[^)]*)\)\s*"
                    r"VALUES\s*\((?P<vals>.+)\)$"
                ).match(action)
                if not im:
                    raise ValueError(
                        f"unsupported MERGE clause {clause!r}; {supported}"
                    )
                if not neg:
                    raise ValueError(
                        "INSERT (cols) VALUES (...) is a WHEN NOT MATCHED "
                        "clause"
                    )
                cols = _ident_list(im.group("cols"))
                vals = [v.strip() for v in _split_top(im.group("vals"), ",")]
                if len(cols) != len(vals):
                    raise ValueError(
                        f"INSERT names {len(cols)} columns but supplies "
                        f"{len(vals)} values"
                    )
                clean: list[str] = []
                for cident in cols:
                    if "." in cident:
                        a, c = cident.split(".", 1)
                        if a != t_alias:
                            raise ValueError(
                                f"INSERT column {cident!r} must use the "
                                f"target alias {t_alias!r}"
                            )
                        cident = c
                    clean.append(cident)
                out.append(
                    {
                        "kind": "insert",
                        "pred": pred,
                        "payload": dict(zip(clean, vals)),
                    }
                )
        if not out:
            raise ValueError("MERGE needs at least one WHEN clause")
        return out

    def _merge_percol(
        self,
        table,
        tgt_name: str,
        source: DataFrame,
        keys: list[str],
        clauses: list[dict],
        t_alias: str,
        s_alias: str,
        evolve: bool = False,
    ) -> DataFrame:
        """Per-column / ordered-clause MERGE (Delta's general form):
        rewrite the source into full post-image rows — a LEFT join of
        source onto the target supplies the pre-image, SET expressions
        (which may reference BOTH aliases) compute the new values, and
        clause predicates cascade in statement order exactly as Delta
        evaluates them — then feed the same table-layer
        :meth:`~.tables.ParquetTable.merge` the star forms use, so
        commit atomicity, partition-pruned rewrite, and conflict
        handling are one code path.

        Scale: the extra pre-image join shuffles source+target on the
        merge keys once — the same cost class as merge()'s own
        anti-join (Delta's physical MERGE likewise joins the full
        target); everything downstream is unchanged."""
        tgt_df = table.read()
        types = {f.name: f.dataType for f in tgt_df.schema.fields}
        tgt_cols = list(types)
        defaults = table.properties().get("defaults", {})
        matched_clauses = [c for c in clauses if c["kind"] in ("update", "delete")]
        insert_clauses = [c for c in clauses if c["kind"] == "insert"]
        bysrc_clauses = [c for c in clauses if c["kind"].endswith("_by_source")]
        for c in clauses:
            if c["payload"]:
                unknown = set(c["payload"]) - set(tgt_cols)
                if unknown and not evolve:
                    raise ValueError(
                        f"MERGE clause targets unknown columns "
                        f"{sorted(unknown)}; table {tgt_name} has "
                        f"{tgt_cols} (MERGE WITH SCHEMA EVOLUTION "
                        "INTO ... widens instead)"
                    )
        tgt = tgt_df.withColumn("__t_exists", F.lit(True)).alias(t_alias)
        src = source.alias(s_alias)
        cond = None
        for k in keys:
            c = F.col(f"{s_alias}.{k}") == F.col(f"{t_alias}.{k}")
            cond = c if cond is None else (cond & c)
        joined = src.join(tgt, cond, "left")
        matched = F.col(f"{t_alias}.__t_exists").isNotNull()
        if evolve:
            # WITH SCHEMA EVOLUTION (per-column form): columns the
            # clauses introduce extend the post-image schema — source
            # columns under a star payload keep their source type,
            # per-column SET/INSERT expressions infer theirs from plan
            # analysis over the pre-image join (no job runs).  The
            # target side contributes typed NULLs for rows that predate
            # the column; the table-layer merge records the widened
            # manifest schema.
            src_types = {f.name: f.dataType for f in source.schema.fields}
            if any(
                c["payload"] is None
                for c in clauses
                if c["kind"] in ("update", "insert")
            ):
                for c_ in source.columns:
                    if c_ not in types:
                        types[c_] = src_types[c_]
                        tgt_cols.append(c_)
            for c in clauses:
                for col_, expr_ in (c["payload"] or {}).items():
                    if col_ not in types:
                        types[col_] = (
                            joined.select(F.expr(expr_).alias("__p"))
                            .schema[0]
                            .dataType
                        )
                        tgt_cols.append(col_)

        def pre_col(col):
            # pre-image value: the target's column, or a typed NULL for
            # a column this MERGE is introducing (old rows predate it)
            if col in tgt_df.columns:
                return F.col(f"{t_alias}.{col}")
            return F.lit(None).cast(types[col])

        def pred_col(p):
            return F.lit(True) if p is None else F.expr(p)

        def when_chain(pairs, default):
            chain = None
            for p, v in pairs:
                chain = F.when(p, v) if chain is None else chain.when(p, v)
            return default if chain is None else chain.otherwise(default)

        delete_flag = F.when(
            matched,
            when_chain(
                [
                    (pred_col(c["pred"]), F.lit(c["kind"] == "delete"))
                    for c in matched_clauses
                ],
                F.lit(False),
            ),
        ).otherwise(F.lit(False))

        ins_keep = F.lit(False)
        for c in insert_clauses:
            ins_keep = ins_keep | pred_col(c["pred"])

        def matched_val(col):
            pre = pre_col(col)
            pairs = []
            for c in matched_clauses:
                if c["kind"] == "delete":
                    v = pre  # payload of a delete row is never stored
                elif c["payload"] is None:  # UPDATE SET *
                    v = (
                        F.col(f"{s_alias}.{col}")
                        if col in source.columns
                        else pre
                    )
                else:
                    v = (
                        F.expr(c["payload"][col])
                        if col in c["payload"]
                        else pre
                    )
                pairs.append((pred_col(c["pred"]), v))
            return when_chain(pairs, pre)

        def insert_val(col):
            def one(c):
                if c["payload"] is None:  # INSERT *
                    if col in source.columns:
                        return F.col(f"{s_alias}.{col}")
                elif col in c["payload"]:
                    return F.expr(c["payload"][col])
                if col in defaults:  # unnamed column: declared DEFAULT
                    return F.expr(defaults[col])
                return F.lit(None)

            return when_chain(
                [(pred_col(c["pred"]), one(c)) for c in insert_clauses],
                F.lit(None),
            )

        payload = [
            F.when(matched, matched_val(c))
            .otherwise(insert_val(c))
            .cast(types[c])
            .alias(c)
            for c in tgt_cols
        ]
        # Insert-only MERGE (no WHEN MATCHED clause): matched source rows
        # must not reach merge() even as no-op updates — Delta permits a
        # source with duplicate matches to one target row when no matched
        # clause exists, and validate_source_keys would otherwise abort.
        # Mirrors the INSERT-* fast path's anti-join semantics.
        row_keep = (matched | ins_keep) if matched_clauses else (~matched & ins_keep)
        rewritten = joined.filter(row_keep).select(
            *payload, delete_flag.alias("__merge_delete")
        )
        if matched_clauses:
            # A DUPLICATE-KEY TARGET expands each source row once per
            # matched target row in the pre-image join, and the expanded
            # copies would trip merge()'s duplicate-source validator.
            # When the ORIGINAL source is key-unique, that expansion is
            # the only possible duplication: collapse identical
            # post-images (deterministic — it matches the star path's
            # group-replace contract on the same input), while rows that
            # stay distinct after collapsing (a SET expression read the
            # differing target pre-images) still reach the validator and
            # abort as genuinely nondeterministic.  Real duplicate
            # SOURCE keys skip the collapse so the strict Delta abort is
            # untouched.  Cost: one source-key agg + a source-sized
            # distinct, the validator's own cost class.
            src_key_dups = (
                source.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") > 1)
                .limit(1)
                .count()
            )
            if src_key_dups == 0:
                rewritten = rewritten.distinct()
                src_was_unique = True
            else:
                src_was_unique = False
        else:
            src_was_unique = False
        if bysrc_clauses:
            # WHEN NOT MATCHED BY SOURCE: target rows with no source
            # match, rewritten from the TARGET side (there is no source
            # row to join — Delta evaluates these clauses over the
            # target anti-join).  Only rows where some clause FIRES are
            # emitted; untouched unmatched-target rows are carried over
            # by merge()'s own anti-join, so partition-pruned rewrite
            # is preserved.  Cost: one anti-join of the target against
            # the DISTINCT source key set (AQE broadcasts it when
            # small) — the same cost class as the pre-image join above.
            src_keys = source.select(*keys).distinct()
            unmatched_t = tgt_df.alias(t_alias).join(src_keys, keys, "anti")
            any_fired = F.lit(False)
            for c in bysrc_clauses:
                any_fired = any_fired | pred_col(c["pred"])
            bysrc_delete = when_chain(
                [
                    (
                        pred_col(c["pred"]),
                        F.lit(c["kind"] == "delete_by_source"),
                    )
                    for c in bysrc_clauses
                ],
                F.lit(False),
            )

            def bysrc_val(col):
                pre = pre_col(col)
                pairs = []
                for c in bysrc_clauses:
                    if c["payload"] and col in c["payload"]:
                        v = F.expr(c["payload"][col])
                    else:
                        v = pre
                    pairs.append((pred_col(c["pred"]), v))
                return when_chain(pairs, pre)

            bysrc_rows = unmatched_t.filter(any_fired).select(
                *[bysrc_val(c).cast(types[c]).alias(c) for c in tgt_cols],
                bysrc_delete.alias("__merge_delete"),
            )
            if matched_clauses or insert_clauses:
                rewritten = rewritten.unionByName(bysrc_rows)
            else:
                # by-source-only statement: the source-driven frame is
                # vacuous no-op updates — skip it so matched target
                # rows are not pointlessly rewritten
                rewritten = bysrc_rows
        try:
            version = table.merge(
                rewritten,
                on=keys,
                when_matched_delete=F.col("__merge_delete"),
                source_meta_cols=["__merge_delete"],
                evolve_schema=evolve,
            )
        except ValueError as exc:
            if src_was_unique and "multiple source rows" in str(exc):
                # the duplication came from the TARGET side: the user's
                # source was key-unique, but a SET expression read the
                # differing pre-images of duplicate-key target rows, so
                # even group-replace has no deterministic answer.  The
                # validator's "de-duplicate the source" advice would
                # mislead here — name the actual cause.
                raise ValueError(
                    "MERGE aborted: the target holds DUPLICATE rows for "
                    f"a matched key on {keys}, and a WHEN MATCHED SET "
                    "expression reads their differing pre-images — the "
                    "group-replace result would be nondeterministic. "
                    "De-duplicate the target (e.g. dedup_latest) or use "
                    "source-only SET expressions."
                ) from exc
            raise
        return self._status("MERGE", tgt_name, version)

    @staticmethod
    def _merge_keys(on: str, t_alias: str, s_alias: str) -> list[str]:
        keys = []
        for term in _ci(r"\bAND\b").split(on):
            em = re.match(
                r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", term.strip()
            )
            if not em:
                raise ValueError(
                    f"MERGE ON term {term.strip()!r} must be "
                    "t.col = s.col (equi-key conjunction)"
                )
            a1, c1, a2, c2 = em.groups()
            if {a1, a2} != {t_alias, s_alias}:
                raise ValueError(
                    f"MERGE ON aliases {a1!r}/{a2!r} must be the target "
                    f"({t_alias!r}) and source ({s_alias!r}) aliases"
                )
            if c1 != c2:
                raise ValueError(
                    f"MERGE ON {term.strip()!r}: differently-named key "
                    "columns are not supported — rename in the source"
                )
            keys.append(c1)
        return keys

    @staticmethod
    def _strip_alias(pred: str, s_alias: str, t_alias: str) -> str:
        if re.search(rf"\b{re.escape(t_alias)}\s*\.", pred):
            raise ValueError(
                "WHEN MATCHED AND <pred> THEN DELETE may reference only "
                "SOURCE columns (the engine's when_matched_delete contract)"
            )
        return re.sub(rf"\b{re.escape(s_alias)}\s*\.", "", pred)

    # -- APPLY CHANGES INTO (DLT declarative CDC) ---------------------------

    _APPLY = _ci(
        r"^APPLY\s+CHANGES\s+INTO\s+(?P<tgt>`?[\w.]+`?)\s+FROM\s+"
        r"(?P<src>\(.*?\)|`?[\w.]+`?)\s+(?P<clauses>.+)$"
    )
    _APPLY_KEYS = _ci(r"\bKEYS\s*\(([^)]*)\)")
    _APPLY_SEQ = _ci(r"\bSEQUENCE\s+BY\s+(`?\w+`?)")
    _APPLY_DEL = _ci(
        r"\bAPPLY\s+AS\s+DELETE\s+WHEN\s+(?P<pred>.+?)\s*"
        r"(?=\bSEQUENCE\s+BY\b|\bCOLUMNS\b|\bEXCEPT\b|\bSTORED\s+AS\b"
        r"|\bWITH\s+SCHEMA\b|$)"
    )
    _APPLY_EXCEPT = _ci(r"\b(?:COLUMNS\s+\*\s+)?EXCEPT\s*\(([^)]*)\)")
    _APPLY_SCD = _ci(r"\bSTORED\s+AS\s+SCD\s+TYPE\s+([12])\b")
    _APPLY_EVO = _ci(r"\bWITH\s+SCHEMA\s+EVOLUTION\b")

    def _apply_changes(self, stmt: str) -> DataFrame:
        """DLT's ``APPLY CHANGES INTO`` statement, routed to
        :func:`streaming.apply_changes.apply_changes_batch`::

            APPLY CHANGES INTO tgt FROM src
              KEYS (k1, k2)
              [APPLY AS DELETE WHEN <pred>]
              SEQUENCE BY seq_col
              [COLUMNS * EXCEPT (c1, c2)]
              [STORED AS SCD TYPE {1|2}]
              [WITH SCHEMA EVOLUTION]

        ``src`` is a registered table, a Spark temp view, or a
        parenthesized subquery (e.g. over the ``table_changes`` TVF);
        the statement applies its CURRENT rows as one change batch —
        sequence floors make re-running it a no-op.  Continuous feeds
        use the Python :func:`streaming.apply_changes.apply_changes`
        wrapper over a streaming source; the statement form is the
        batch/triggered entry point (DLT's own APPLY CHANGES runs
        exactly this per micro-batch).  An absent target is created on
        first apply at the warehouse default location and registered.
        """
        from azure_databricks_lakehouse_spark.streaming.apply_changes import (
            apply_changes_batch,
        )

        m = self._APPLY.match(stmt)
        if not m:
            raise ValueError(f"unsupported APPLY CHANGES form: {stmt[:80]!r}")
        tgt_name = _unquote_ident(m.group("tgt"))
        src_raw = m.group("src").strip()
        clauses = m.group("clauses")

        km = self._APPLY_KEYS.search(clauses)
        sm = self._APPLY_SEQ.search(clauses)
        if not km or not sm:
            raise ValueError(
                "APPLY CHANGES needs KEYS (...) and SEQUENCE BY <col>"
            )
        keys = [_unquote_ident(k.strip()) for k in km.group(1).split(",") if k.strip()]
        sequence_by = _unquote_ident(sm.group(1))
        dm = self._APPLY_DEL.search(clauses)
        apply_as_deletes = dm.group("pred").strip() if dm else None
        em = self._APPLY_EXCEPT.search(clauses)
        except_columns = (
            [_unquote_ident(c.strip()) for c in em.group(1).split(",") if c.strip()]
            if em
            else ()
        )
        scm = self._APPLY_SCD.search(clauses)
        scd_type = int(scm.group(1)) if scm else 1
        evolve = bool(self._APPLY_EVO.search(clauses))

        if src_raw.startswith("("):
            source = self._run_query(src_raw[1:-1].strip())
        else:
            src_name = _unquote_ident(src_raw)
            if src_name in self._paths:
                source = self.table(src_name).read()
            else:
                source = self.spark.table(src_name)

        if tgt_name in self._paths:
            root = self._paths[tgt_name]
        else:
            root = self._default_location(tgt_name)
        apply_changes_batch(
            self.spark,
            root,
            source,
            keys=keys,
            sequence_by=sequence_by,
            apply_as_deletes=apply_as_deletes,
            except_columns=except_columns,
            scd_type=scd_type,
            evolve_schema=evolve,
        )
        if tgt_name not in self._paths:
            self.register(tgt_name, root)
        version = self.table(tgt_name).latest_version()
        return self._status("APPLY CHANGES", tgt_name, version)

    # -- DELETE / UPDATE / INSERT -------------------------------------------

    _DELETE = _ci(r"^DELETE\s+FROM\s+(`?[\w.]+`?)(?P<tail>\s+.*)?$")

    _IN_SUBQUERY = _ci(
        r"^(?P<col>`[^`]+`|[\w.]+|\([^()]+\))\s+(?P<neg>NOT\s+)?IN\s*\(\s*"
        r"(?P<sub>SELECT\b.+)\)\s*$"
    )

    @staticmethod
    def _in_match_ok(sub) -> bool:
        """Reject an ``_IN_SUBQUERY`` match whose greedy subquery
        capture crossed a top-level boundary (compound predicate like
        ``k IN (SELECT ..) AND v > (SELECT ..)``): a real whole-
        predicate membership subquery is paren-balanced."""
        depth = 0
        for ch in _blank_strings(sub.group("sub")):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth < 0:
                    return False
        return depth == 0

    @staticmethod
    def _in_cols(sub) -> list[str]:
        """Membership column list of an IN-subquery match: the single
        column, or the components of the tuple form ``(a, b) IN ...``
        (Databricks supports multi-column IN predicates in DML)."""
        raw = sub.group("col").strip()
        parts = (
            [p.strip() for p in raw[1:-1].split(",")]
            if raw.startswith("(")
            else [raw]
        )
        return [_unquote_ident(p).split(".")[-1] for p in parts]

    def _scalar_literal(self, v, typ: str) -> str:
        """``v`` as a typed SQL literal for scalar-subquery folding —
        :func:`_render_sql_literal` plus the collect()-native types a
        live query can return that JSON-safe ANALYZE stats never carry
        (Decimal/date/datetime via their exact str forms, float NaN via
        the 'NaN' cast Spark parses)."""
        import datetime
        import decimal
        import math

        if isinstance(v, float) and math.isnan(v):
            return f"CAST('NaN' AS {typ})"
        lit = _render_sql_literal(v, typ, spark=self.spark)
        if lit is None and isinstance(
            v, (decimal.Decimal, datetime.date, datetime.datetime)
        ):
            s = str(v).replace("'", "''")
            lit = f"CAST('{s}' AS {typ})"
        if lit is None:
            raise ValueError(
                f"cannot render scalar subquery value {v!r} as a "
                f"{typ} literal"
            )
        return lit

    def _fold_scalar_subqueries(
        self, name: str, text: str, what: str, corr_out: list | None = None
    ) -> str:
        """Replace each UNCORRELATED scalar subquery ``(SELECT ...)`` in
        ``text`` with its value as a typed SQL literal (Databricks
        evaluates DML scalar subqueries ONCE against the pre-statement
        snapshot — exactly what eager folding implements; the rewritten
        expression then rides the ordinary row-wise DML path).

        Membership subqueries — a ``(SELECT ...)`` preceded by ``IN`` or
        ``EXISTS`` — are left verbatim for their own decorrelated
        routes.  SQL scalar contract enforced per subquery: exactly one
        column, at most one row (empty ⇒ typed NULL).  The subquery
        result is one scalar by contract — the ``limit(2).collect()``
        is metadata-sized, not a data move.

        CORRELATED scalars (referencing ``name.col``): with
        ``corr_out`` given (the UPDATE SET route), an equality-
        correlated AGGREGATE subquery decorrelates to a keyed lookup —
        see :meth:`_decorrelate_scalar` — appending ``(lookup_frame,
        join_cond_sql)`` to ``corr_out`` and replacing the subquery
        text with a CASE over the lookup's value/hit columns.  Without
        ``corr_out`` (DELETE WHERE / UPDATE WHERE), correlation still
        raises toward MERGE."""
        blanked = _blank_strings(text)
        out: list[str] = []
        i, n = 0, len(text)
        opener = _ci(r"\(\s*SELECT\b")
        while i < n:
            m = opener.search(blanked, i)
            if not m:
                out.append(text[i:])
                break
            start = m.start()
            # the word before the '(' decides membership vs scalar
            j = start - 1
            while j >= 0 and blanked[j].isspace():
                j -= 1
            k = j
            while k >= 0 and (blanked[k].isalnum() or blanked[k] == "_"):
                k -= 1
            prev = blanked[k + 1 : j + 1].lower()
            depth, end = 0, start
            while end < n:
                if blanked[end] == "(":
                    depth += 1
                elif blanked[end] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                end += 1
            if depth != 0:
                raise ValueError(
                    f"unbalanced parentheses in {what}: {text[:80]!r}"
                )
            if prev in ("in", "exists"):
                out.append(text[i : end + 1])
                i = end + 1
                continue
            inner = text[start + 1 : end].strip()
            if _ci(
                rf"\b(?:`{re.escape(name)}`|{re.escape(name)})\s*\."
            ).search(_mask_strings(inner)):
                # SQL name scoping: an inner FROM alias equal to the
                # target name SHADOWS the target — those refs are
                # inner-scope, the subquery is UNCORRELATED (fall
                # through to the fold).  Shadowing only in a nested
                # scope leaves refs ambiguous to this parser: refuse
                # loudly rather than decorrelate to wrong data.
                top_decl, any_decl = _from_decl_names(inner)
                if name.lower() not in top_decl:
                    if name.lower() in any_decl:
                        raise ValueError(
                            f"a subquery inside the scalar subquery in "
                            f"{what} re-declares the target name "
                            f"{name!r} as a table/alias, making its "
                            "references ambiguous; rename the inner "
                            "alias or use MERGE instead"
                        )
                    if corr_out is None:
                        raise ValueError(
                            f"correlated scalar subqueries in {what} "
                            "are not supported; use MERGE instead"
                        )
                    repl = self._decorrelate_scalar(
                        name, inner, corr_out, what
                    )
                    out.append(text[i:start])
                    out.append(repl)
                    i = end + 1
                    continue
            df = self._run_query(inner)
            if len(df.columns) != 1:
                raise ValueError(
                    "scalar subquery must return exactly one column, "
                    f"got {len(df.columns)}: {inner[:60]!r}"
                )
            rows = df.limit(2).collect()
            if len(rows) > 1:
                raise ValueError(
                    f"scalar subquery returned more than one row: "
                    f"{inner[:60]!r}"
                )
            v = rows[0][0] if rows else None  # empty ⇒ NULL (SQL contract)
            typ = df.schema.fields[0].dataType.simpleString()
            out.append(text[i:start])
            out.append(f"({self._scalar_literal(v, typ)})")
            i = end + 1
        return "".join(out)

    _CORR_AGG = _ci(
        r"\b(sum|count|avg|mean|min|max|first|first_value|last|last_value"
        r"|any_value|stddev|stddev_samp|stddev_pop|variance|var_samp"
        r"|var_pop|approx_count_distinct|median|mode|bool_and|bool_or"
        r"|bit_and|bit_or|bit_xor|collect_list|collect_set)\s*\("
    )
    _INTEGRALS = frozenset({"tinyint", "smallint", "int", "bigint"})

    def _bare_idents(self, text: str) -> set[str]:
        return _bare_idents(text)

    def _strip_target_qual(self, name: str, expr: str) -> str:
        """``expr`` with ``name.`` / `` `name`.`` qualifiers removed
        OUTSIDE string literals — a decorrelated outer-side expression
        evaluates against the target's own (unqualified) frame."""
        pat = _ci(rf"\b(?:`{re.escape(name)}`|{re.escape(name)})\s*\.\s*")
        lit = r"('(?:[^']|'')*'|\"(?:[^\"]|\"\")*\")"
        out: list[str] = []
        for i, seg in enumerate(re.split(lit, expr)):
            out.append(seg if i % 2 else pat.sub("", seg))
        return "".join(out)

    def _decorrelate_scalar(
        self, name: str, inner: str, corr_out: list, what: str
    ) -> str:
        """An equality-correlated AGGREGATE scalar subquery
        (Databricks ``UPDATE t SET c = (SELECT agg(x) FROM s WHERE
        s.k = t.k [AND residual])``) decorrelated to a keyed lookup:

        - the correlation conjuncts (the WHERE's top-level ``AND``
          terms referencing ``name.col``) must each be an equality with
          the target refs on exactly one side; the inner sides become
          the lookup's GROUP BY keys, the outer sides its join keys;
        - the lookup computes the item per key group (key-unique BY
          CONSTRUCTION, so the later left join can never fan out a
          target row);
        - empty groups get the item's true over-empty-relation value
          (``COUNT``→0, ``SUM``→NULL, computed by running the item
          over ``WHERE false`` — not a blanket NULL), via a hit flag;
        - appends ``(lookup_frame, join_cond_sql)`` to ``corr_out`` and
          returns the CASE expression the SET text continues with.
          :meth:`ParquetTable.update` left-joins each lookup onto the
          matched rows — one broadcast-sized join per subquery, cost ∝
          touched files, never the table.

        Non-aggregate items, non-equality correlation, and correlated
        FROM/GROUP BY shapes keep the explicit refusal toward MERGE."""
        tref = _ci(rf"\b(?:`{re.escape(name)}`|{re.escape(name)})\s*\.")

        def _refuse(why: str):
            raise ValueError(
                f"correlated scalar subquery in {what} not supported "
                f"({why}); supported shape: (SELECT <agg> FROM s WHERE "
                f"s.k = {name}.k [AND ...]) — use MERGE otherwise"
            )

        ib = _blank_strings(inner)
        if not _ci(r"^SELECT\b").match(inner):
            _refuse("not a SELECT")
        f = _find_top_keyword(ib, "FROM")
        if f < 0:
            _refuse("no FROM clause")
        item = inner[6:f].strip()
        frm = inner[f:].strip()
        fb = _blank_strings(frm)
        for kw in ("GROUP", "ORDER", "LIMIT", "HAVING", "QUALIFY"):
            if _find_top_keyword(fb, kw) >= 0:
                _refuse(f"{kw} clause in a correlated scalar")
        if len(_split_top(item, ",")) != 1:
            _refuse("must return exactly one column")
        if tref.search(_mask_strings(item)):
            _refuse("target columns in the select item")
        if not self._CORR_AGG.search(_mask_strings(item)):
            _refuse("only aggregate items decorrelate to a keyed lookup")
        w = _find_top_keyword(fb, "WHERE")
        if w < 0:
            _refuse("correlation must live in the WHERE clause")
        from_core = frm[:w].strip()
        where_txt = frm[w + 5 :].strip()
        if tref.search(_mask_strings(from_core)):
            _refuse("target columns in the FROM clause")
        pairs: list[tuple[str, str]] = []  # (inner key expr, outer expr)
        residual: list[str] = []
        for c in _split_top_and(where_txt):
            if not tref.search(_mask_strings(c)):
                residual.append(c)
                continue
            cb = _blank_strings(c)
            if any(
                _find_top_keyword(cb, kw) >= 0
                for kw in ("OR", "NOT", "IN", "EXISTS", "BETWEEN", "LIKE", "IS")
            ):
                _refuse(f"non-equality correlation: {c[:60]!r}")
            eq = _top_eq_split(c)
            if eq is None:
                _refuse(f"non-equality correlation: {c[:60]!r}")
            lhs, rhs = (s.strip() for s in eq)
            for side in (lhs, rhs):
                sb = _blank_strings(side)
                if _top_eq_split(sb) is not None or any(
                    ch in "<>!" for ch in sb
                ):
                    # a second comparator at top level: not the simple
                    # equality the keyed-lookup algebra covers
                    _refuse(f"non-equality correlation: {c[:60]!r}")
            l_has = bool(tref.search(_mask_strings(lhs)))
            r_has = bool(tref.search(_mask_strings(rhs)))
            if l_has == r_has:
                _refuse(f"target columns on both equality sides: {c[:60]!r}")
            outer, innr = (lhs, rhs) if l_has else (rhs, lhs)
            pairs.append((innr, self._strip_target_qual(name, outer)))
        # the outer sides must reference ONLY target columns: a mixed
        # side like ``t.k + s.k = 0`` would strip to a join condition
        # naming a column that exists nowhere — refuse cleanly instead
        tgt0 = self.table(name).read().limit(0)
        tcols = {c.lower() for c in tgt0.columns}
        for innr, outer in pairs:
            bad = {
                w for w in self._bare_idents(outer) if w.lower() not in tcols
            }
            if bad:
                _refuse(
                    "the target side of a correlation equality also "
                    f"references non-target names {sorted(bad)}"
                )
        # the sides must agree on type up to injective integer widening:
        # a lossy implicit coercion ('1' and '01' as strings both equal
        # int 1) would let the key-unique lookup FAN OUT a target row —
        # and true correlated semantics would have aggregated those
        # inner groups together.  Analysis only, no jobs.
        for innr, outer in pairs:
            ot = tgt0.selectExpr(f"({outer}) AS o").schema[0].dataType
            it = (
                self._run_query(f"SELECT ({innr}) AS v {from_core} WHERE false")
                .schema[0]
                .dataType
            )
            os_, is_ = ot.simpleString(), it.simpleString()
            if os_ != is_ and not (
                os_ in self._INTEGRALS and is_ in self._INTEGRALS
            ):
                _refuse(
                    f"correlation equality sides have different types "
                    f"({is_} vs {os_}); cast one side explicitly"
                )
        n = len(corr_out)
        keys = [f"__corr{n}_k{i}" for i in range(len(pairs))]
        key_sel = ", ".join(
            f"({innr}) AS {k}" for (innr, _), k in zip(pairs, keys)
        )
        res_sql = (
            " WHERE " + " AND ".join(f"({r})" for r in residual)
            if residual
            else ""
        )
        gb = ", ".join(f"({innr})" for innr, _ in pairs)
        lookup = self._run_query(
            f"SELECT {key_sel}, ({item}) AS __corr{n}_v, "
            f"true AS __corr{n}_hit {from_core}{res_sql} GROUP BY {gb}"
        )
        empty_df = self._run_query(
            f"SELECT ({item}) AS v {from_core} WHERE false"
        )
        ev = empty_df.collect()[0][0]
        typ = empty_df.schema.fields[0].dataType.simpleString()
        try:
            else_lit = self._scalar_literal(ev, typ)
        except ValueError:
            # e.g. collect_list over an empty group is [] (an array,
            # not NULL) — no SQL literal to fold; refuse with the shape
            _refuse(
                f"the item's empty-group value {ev!r} has no SQL "
                "literal form; COALESCE/aggregate differently"
            )
        cond_sql = " AND ".join(
            f"({outer}) = {k}" for (_, outer), k in zip(pairs, keys)
        )
        corr_out.append((lookup, cond_sql))
        return f"(CASE WHEN __corr{n}_hit THEN __corr{n}_v ELSE {else_lit} END)"

    def _delete(self, stmt: str) -> DataFrame:
        m = self._DELETE.match(stmt)
        if not m:
            raise ValueError(f"unsupported DELETE form: {stmt[:80]!r}")
        name = _unquote_ident(m.group(1))
        tail = (m.group("tail") or "").strip()
        if tail:
            w = _find_top_keyword(tail, "WHERE")
            if w != 0:
                raise ValueError(f"unsupported DELETE form: {stmt[:80]!r}")
            cond = tail[5:].strip()
        else:
            cond = "true"
        sub = self._IN_SUBQUERY.match(cond)
        if sub and not self._in_match_ok(sub):
            sub = None  # compound predicate, not a whole-predicate IN
        if sub:
            return self._delete_in_subquery(name, sub)
        ex = self._parse_exists(name, cond)
        if ex is not None:
            tcols, keys, neg = ex
            if neg:
                return self._delete_not_matching(
                    name, tcols, keys, null_aware=False
                )
            return self._delete_in_keys(name, tcols, keys)
        corr: list = []
        if _ci(r"\(\s*SELECT\b").search(_mask_strings(cond)):
            # not a whole-predicate membership form: fold UNCORRELATED
            # scalar subqueries to typed literals, decorrelate
            # equality-correlated AGGREGATE scalars to keyed lookups
            # (same machinery as UPDATE SET), and ride the row-wise
            # path; membership subqueries surviving the fold are the
            # compound forms MERGE owns
            cond = self._fold_scalar_subqueries(
                name, cond, "DELETE WHERE", corr_out=corr
            )
            if _ci(r"\(\s*SELECT\b").search(_mask_strings(cond)):
                raise ValueError(
                    "IN/EXISTS subqueries in DELETE are supported only "
                    "as the entire predicate; for compound membership "
                    "conditions use MERGE ... WHEN MATCHED [AND p] "
                    "THEN DELETE"
                )
        table = self.table(name)
        before = table.latest_version()
        version = table.delete(
            CorrelatedCondition(tuple(corr), cond) if corr else cond
        )
        c = table.history(limit=1)[0]
        # version > before distinguishes a fresh commit from a
        # zero-match no-commit whose latest version happens to also be
        # a DELETE (skipRecordingEmptyCommits)
        n = (
            (c.metrics or {}).get("rows_deleted", 0)
            if version > before and c.operation == "DELETE"
            else 0  # zero-match delete commits nothing
        )
        return self.spark.createDataFrame(
            [(name, version, n)],
            "table string, version int, num_affected_rows long",
        )

    def _delete_in_subquery(self, name: str, sub) -> DataFrame:
        """``DELETE FROM t WHERE col [NOT] IN (SELECT ...)`` —
        Databricks supports subquery predicates in DELETE; a row-wise
        Column can't express a semi/anti join, so IN routes to the
        table layer's delete-only MERGE (``when_matched_delete``) and
        NOT IN to :meth:`~.tables.ParquetTable.delete_where_not_in`
        (NULL-aware: any NULL subquery key ⇒ delete nothing, the SQL
        three-valued contract).  NULL subquery keys are dropped from
        the IN form first (``NULL = NULL`` never matches)."""
        tcols = self._in_cols(sub)
        keys = self._run_query(sub.group("sub"))
        if sub.group("neg"):
            return self._delete_not_matching(
                name, tcols, keys, null_aware=True
            )
        return self._delete_in_keys(name, tcols, keys)

    def _delete_in_keys(self, name: str, tcols, keys) -> DataFrame:
        if len(keys.columns) != len(tcols):
            raise ValueError(
                "IN-subquery must return exactly "
                f"{'one column' if len(tcols) == 1 else f'{len(tcols)} columns'}"
                f", got {keys.columns}"
            )
        nn = None
        for c in tcols:
            p = F.col(c).isNotNull()
            nn = p if nn is None else (nn & p)
        # positional rename (toDF handles duplicate-named subquery cols)
        keys = keys.toDF(*tcols).where(nn).distinct()
        table = self.table(name)
        # merge() wants the full target schema (updateAll contract); a
        # delete-only source never stores its payload, so pad the other
        # columns with typed NULLs (identity columns must stay absent)
        schema = _schema_from_json(self.spark, table.detail()["schema"])
        ident = table.properties().get("identity", {})
        keys = keys.select(
            *tcols,
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
                if f.name not in tcols and f.name not in ident
            ],
        )
        # rows_deleted is observed DURING the merge's CDC write action
        # (round 12) — no pre-commit count job; a zero-match statement
        # commits nothing, so the metric defaults to 0
        before = table.latest_version()
        version = table.merge(
            keys, on=tcols, when_matched_delete=F.lit(True)
        )
        c = table.history(limit=1)[0]
        n = (
            (c.metrics or {}).get("rows_deleted", 0)
            if version > before and c.operation == "MERGE"
            else 0
        )
        return self.spark.createDataFrame(
            [(name, version, n)],
            "table string, version int, num_affected_rows long",
        )

    _EXISTS_SUBQUERY = _ci(
        r"^(?P<neg>NOT\s+)?EXISTS\s*\(\s*(?P<sub>SELECT\b.+)\)\s*$"
    )

    def _parse_exists(self, name: str, cond: str):
        """``(outer_cols, keys_df, negated)`` when ``cond`` is a whole-
        predicate ``[NOT] EXISTS (SELECT ... WHERE <conjuncts>)`` whose
        correlation is equality conjuncts ``<inner expr> = <name>.<col>``
        (either side order); None when ``cond`` isn't an EXISTS at all.

        The rewrite decorrelates the standard way: correlation conjuncts
        become the subquery's projected key columns, residual conjuncts
        (which must not reference the outer table) stay as its WHERE —
        ``EXISTS`` is then a semi-join on the keys and ``NOT EXISTS``
        an anti-join (NULL-tolerant on the target side: no subquery row
        can equal a NULL key, so NOT EXISTS is TRUE there — the exact
        place its semantics diverge from NOT IN).  Non-equality or
        otherwise-correlated forms raise with the MERGE escape hatch."""
        m = self._EXISTS_SUBQUERY.match(cond)
        if not m:
            return None
        sub = m.group("sub").strip()
        # scoping guard (round 12, mirrors _fold_scalar_subqueries): an
        # inner FROM alias equal to the target name shadows the target,
        # so what LOOKS like an equality correlation ('t.k = 5' under
        # FROM s AS t) is inner-scope — decorrelating it would silently
        # filter on the wrong table.  Refuse loudly instead.
        if _ci(rf"\b(?:`{re.escape(name)}`|{re.escape(name)})\s*\.").search(
            _mask_strings(sub)
        ):
            top_decl, any_decl = _from_decl_names(sub)
            if name.lower() in top_decl or name.lower() in any_decl:
                raise ValueError(
                    f"the EXISTS subquery re-declares the target name "
                    f"{name!r} as a table/alias, shadowing the "
                    "correlation; rename the inner alias or use MERGE"
                )
        w = _find_top_keyword(sub, "WHERE")
        if w < 0:
            raise ValueError(
                "EXISTS subqueries in DML need an equality correlation "
                f"'expr = {name}.col' in their WHERE clause"
            )
        head, tail = sub[:w].strip(), sub[w + 5 :].strip()
        f = _find_top_keyword(head, "FROM")
        if f < 0:
            raise ValueError(f"unsupported EXISTS subquery: {sub[:80]!r}")
        outer_ref = _ci(
            rf"^\s*(?:`{re.escape(name)}`|{re.escape(name)})\s*\.\s*"
            r"(?P<col>`[^`]+`|\w+)\s*$"
        )
        outer_any = _ci(rf"\b(?:`{re.escape(name)}`|{re.escape(name)})\s*\.")
        inner_exprs: list[str] = []
        outer_cols: list[str] = []
        residual: list[str] = []
        for conj in _split_top_and(tail):
            if not outer_any.search(_mask_strings(conj)):
                residual.append(conj)
                continue
            eq = _top_eq_split(conj)
            sides = None
            if eq is not None:
                a, b = eq
                am, bm = outer_ref.match(a), outer_ref.match(b)
                if am and not outer_any.search(_mask_strings(b)):
                    sides = (am.group("col"), b)
                elif bm and not outer_any.search(_mask_strings(a)):
                    sides = (bm.group("col"), a)
            if sides is None:
                raise ValueError(
                    "EXISTS correlation in DML must be equality "
                    f"conjuncts 'expr = {name}.col'; for "
                    f"{conj.strip()!r} use MERGE instead"
                )
            outer_cols.append(_unquote_ident(sides[0]))
            inner_exprs.append(sides[1].strip())
        if not outer_cols:
            raise ValueError(
                "EXISTS subqueries in DML need at least one equality "
                f"correlation conjunct 'expr = {name}.col'"
            )
        proj = ", ".join(
            f"{e} AS __c{i}" for i, e in enumerate(inner_exprs)
        )
        rewritten = f"SELECT {proj} {head[f:]}"
        if residual:
            rewritten += " WHERE " + " AND ".join(residual)
        keys = self._run_query(rewritten)
        return outer_cols, keys, bool(m.group("neg"))

    def _delete_not_matching(
        self, name: str, tcols, keys, null_aware: bool
    ) -> DataFrame:
        """``DELETE ... WHERE col NOT IN (SELECT ...)`` /
        ``WHERE NOT EXISTS (...)`` through the engine's anti-membership
        DML core (NULL semantics there)."""
        table = self.table(name)
        before = table.latest_version()
        version = table.delete_where_not_in(
            tcols if len(tcols) > 1 else tcols[0], keys, null_aware
        )
        c = table.history(limit=1)[0]
        n = (
            (c.metrics or {}).get("rows_deleted", 0)
            if version > before and c.operation == "DELETE"
            else 0  # zero-match delete commits nothing
        )
        return self.spark.createDataFrame(
            [(name, version, n)],
            "table string, version int, num_affected_rows long",
        )

    def _update_not_matching(
        self, name: str, assignments: dict, tcols, keys, null_aware: bool
    ) -> DataFrame:
        table = self.table(name)
        before = table.latest_version()
        version = table.update_where_not_in(
            tcols if len(tcols) > 1 else tcols[0],
            keys,
            assignments,
            null_aware,
        )
        c = table.history(limit=1)[0]
        n = (
            (c.metrics or {}).get("rows_updated", 0)
            if version > before and c.operation == "UPDATE"
            else 0
        )
        return self.spark.createDataFrame(
            [(name, version, n)],
            "table string, version int, num_affected_rows long",
        )

    def _update_in_subquery(self, name: str, assignments: dict, sub):
        """``UPDATE t SET ... WHERE col [NOT] IN (SELECT ...)`` — the
        UPDATE twin of :meth:`_delete_in_subquery` (the round-8
        verdict's asymmetry): IN routes to the table layer's
        :meth:`~.tables.ParquetTable.update_where_in` update-only MERGE,
        which replaces each matched target row with its own row-wise
        post-image — duplicates preserved, NULL keys never matched, the
        rewrite touched-file pruned; NOT IN routes to
        :meth:`~.tables.ParquetTable.update_where_not_in` (NULL-aware
        anti-join, SQL three-valued contract)."""
        tcols = self._in_cols(sub)
        keys = self._run_query(sub.group("sub"))
        if sub.group("neg"):
            return self._update_not_matching(
                name, assignments, tcols, keys, null_aware=True
            )
        return self._update_in_exists_keys(name, assignments, tcols, keys)

    def _update_in_exists_keys(
        self, name: str, assignments: dict, tcols, keys
    ) -> DataFrame:
        """Shared positive-membership UPDATE tail (IN and decorrelated
        EXISTS): update-only MERGE on the key columns."""
        table = self.table(name)
        before = table.latest_version()
        version = table.update_where_in(tcols, keys, assignments)
        # rows_updated is observed DURING the merge's CDC write action
        # (round 12) — no post-commit count job; a zero-match statement
        # commits nothing, so the metric defaults to 0
        c = table.history(limit=1)[0]
        n = (
            (c.metrics or {}).get("rows_updated", 0)
            if version > before and c.operation == "MERGE"
            else 0
        )
        return self.spark.createDataFrame(
            [(name, version, n)],
            "table string, version int, num_affected_rows long",
        )

    _UPDATE = _ci(r"^UPDATE\s+(`?[\w.]+`?)\s+SET\s+(?P<tail>.+)$")

    def _update(self, stmt: str) -> DataFrame:
        m = self._UPDATE.match(stmt)
        if not m:
            raise ValueError(f"unsupported UPDATE form: {stmt[:80]!r}")
        name = _unquote_ident(m.group(1))
        tail = m.group("tail")
        w = _find_top_keyword(tail, "WHERE")
        set_part, cond = (
            (tail[:w], tail[w + 5 :].strip()) if w >= 0 else (tail, "true")
        )
        corr: list = []
        if _ci(r"\(\s*SELECT\b").search(_mask_strings(set_part)):
            # scalar subqueries in SET values (Databricks: UPDATE ...
            # SET v = (SELECT max(x) FROM s)) fold to typed literals
            # BEFORE assignment parsing, so they compose with every
            # predicate route below (row-wise, IN, EXISTS).  Equality-
            # correlated AGGREGATE scalars decorrelate to keyed lookups
            # (``corr``) the row-wise update joins per matched row.
            set_part = self._fold_scalar_subqueries(
                name, set_part, "UPDATE SET", corr_out=corr
            )
        assignments = {}
        for item in _split_top(set_part, ","):
            col, eq, expr = item.partition("=")
            if not eq:
                raise ValueError(f"bad SET item: {item!r}")
            assignments[_unquote_ident(col)] = F.expr(expr.strip())
        sub = self._IN_SUBQUERY.match(cond)
        if sub and not self._in_match_ok(sub):
            sub = None  # compound predicate, not a whole-predicate IN
        if (sub or self._parse_exists(name, cond) is not None) and corr:
            raise ValueError(
                "correlated scalar SET values combined with an "
                "IN/EXISTS predicate are not supported; use MERGE"
            )
        if sub:
            return self._update_in_subquery(name, assignments, sub)
        ex = self._parse_exists(name, cond)
        if ex is not None:
            tcols, keys, neg = ex
            if neg:
                return self._update_not_matching(
                    name, assignments, tcols, keys, null_aware=False
                )
            return self._update_in_exists_keys(name, assignments, tcols, keys)
        set_n = len(corr)
        if _ci(r"\(\s*SELECT\b").search(_mask_strings(cond)):
            # the shared corr list keeps lookup column names unique
            # across the SET and WHERE folds; the slice split below
            # routes each lookup to its consumer
            cond = self._fold_scalar_subqueries(
                name, cond, "UPDATE WHERE", corr_out=corr
            )
            if _ci(r"\(\s*SELECT\b").search(_mask_strings(cond)):
                raise ValueError(
                    "IN/EXISTS subqueries in UPDATE are supported only "
                    "as the entire predicate; for compound membership "
                    "conditions use MERGE ... WHEN MATCHED [AND p] "
                    "THEN UPDATE SET ..."
                )
        where_corr, set_corr = corr[set_n:], corr[:set_n]
        table = self.table(name)
        before = table.latest_version()
        version = table.update(
            CorrelatedCondition(tuple(where_corr), cond)
            if where_corr
            else cond,
            assignments,
            corr_lookups=set_corr or None,
        )
        c = table.history(limit=1)[0]
        n = (
            (c.metrics or {}).get("rows_updated", 0)
            if version > before and c.operation == "UPDATE"
            else 0  # zero-match update commits nothing
        )
        return self.spark.createDataFrame(
            [(name, version, n)],
            "table string, version int, num_affected_rows long",
        )

    _INSERT = _ci(
        r"^INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?:TABLE\s+)?"
        r"(?P<name>`?[\w.]+`?)\s*(?:\((?P<cols>[^)]*)\)\s*)?"
        r"(?P<byname>BY\s+NAME\s+)?"
        r"(?:REPLACE\s+WHERE\s+(?P<rw>.+?)\s+)?"
        r"(?P<body>(?:SELECT|WITH|VALUES)\b.*)$"
    )

    def _insert(self, stmt: str) -> DataFrame:
        m = self._INSERT.match(stmt)
        if not m:
            raise ValueError(f"unsupported INSERT form: {stmt[:80]!r}")
        name = _unquote_ident(m.group("name"))
        table = self.table(name)
        body = m.group("body")
        if body.upper().startswith("VALUES"):
            df = self.spark.sql(f"SELECT * FROM ({body})")
        else:
            df = self._run_query(body)
        manifest_schema = table.read().schema
        props = table.properties()
        auto_cols = set(props.get("identity", {})) | set(
            props.get("generated", {})
        )
        if m.group("byname"):
            # Databricks INSERT ... BY NAME: source columns matched by
            # name in any order; target columns ABSENT from the source
            # get their DEFAULT (via the table layer's _apply_defaults)
            # or a typed NULL — a NOT NULL column without a default
            # raises at the write's constraint check, as it should.
            if m.group("cols"):
                raise ValueError(
                    "INSERT BY NAME takes no column list (names come "
                    "from the source query)"
                )
            if len(set(df.columns)) != len(df.columns):
                raise ValueError(
                    "INSERT BY NAME needs unique source column names"
                )
            target_types = {f.name: f.dataType for f in manifest_schema.fields}
            unknown = [c for c in df.columns if c not in target_types]
            if unknown:
                raise ValueError(
                    f"INSERT BY NAME: {name} has no columns {unknown}"
                )
            by_default_ident = {
                c
                for c, cfg in props.get("identity", {}).items()
                if not cfg.get("always", True)
            }
            assigned_auto = (auto_cols - by_default_ident) & set(df.columns)
            if assigned_auto:
                raise ValueError(
                    "INSERT BY NAME cannot assign identity/generated "
                    f"columns {sorted(assigned_auto)}"
                )
            defaults = set(props.get("defaults", {}))
            ordered = []
            for f in manifest_schema.fields:
                if f.name in df.columns:
                    ordered.append(
                        F.col(f.name).cast(f.dataType).alias(f.name)
                    )
                elif f.name in auto_cols or f.name in defaults:
                    continue  # filled downstream by the table layer
                else:
                    ordered.append(
                        F.lit(None).cast(f.dataType).alias(f.name)
                    )
            df = df.select(*ordered)
        else:
            if m.group("cols"):
                names = _ident_list(m.group("cols"))
            else:
                names = [f.name for f in manifest_schema.fields
                         if f.name not in auto_cols]
            if len(names) != len(df.columns):
                raise ValueError(
                    f"INSERT provides {len(df.columns)} columns but "
                    f"{name} expects {len(names)} ({names})"
                )
            types = {f.name: f.dataType for f in manifest_schema.fields}
            if set(df.columns) == set(names) and len(set(df.columns)) == len(
                df.columns
            ):
                # the SELECT already names the target columns: align BY
                # NAME (the manifest stores partition columns last, so
                # positional mapping would silently cross-assign a
                # reordered SELECT).  Deliberate divergence from Spark's
                # pure-positional INSERT: it behaves like Databricks'
                # INSERT ... BY NAME whenever the names are an exact
                # permutation — the safe reading of intent under this
                # engine's partition-last column order.  A SELECT with
                # non-target names still maps positionally.
                df = df.select(
                    *[
                        F.col(c)
                        .cast(types.get(c, df.schema[c].dataType))
                        .alias(c)
                        for c in names
                    ]
                )
            else:
                df = df.select(
                    *[
                        F.col(old).cast(types[new]).alias(new)
                        if new in types
                        else F.col(old).alias(new)
                        for old, new in zip(df.columns, names)
                    ]
                )
        if m.group("rw"):
            version = table.overwrite_where(df, m.group("rw").strip())
            return self._status("INSERT REPLACE WHERE", name, version)
        if m.group("mode").upper() == "OVERWRITE":
            version = table.overwrite(df)
        else:
            version = table.append(df)
        return self._status(f"INSERT {m.group('mode').upper()}", name, version)

    # -- maintenance --------------------------------------------------------

    _OPTIMIZE = _ci(
        r"^OPTIMIZE\s+(`?[\w.]+`?)"
        r"(?:\s+WHERE\s+(?P<where>.+?))?"
        r"(?:\s+ZORDER\s+BY\s*\((?P<z>[^)]*)\))?"
        r"(?P<full>\s+FULL)?$"
    )

    def _optimize(self, stmt: str) -> DataFrame:
        m = self._OPTIMIZE.match(stmt)
        if not m:
            raise ValueError(f"unsupported OPTIMIZE form: {stmt[:80]!r}")
        name = _unquote_ident(m.group(1))
        table = self.table(name)
        where = m.group("where")
        zcols = _ident_list(m.group("z")) if m.group("z") else None
        full = bool(m.group("full"))
        if zcols is None and full:
            # OPTIMIZE t FULL (liquid clustering): re-cluster everything
            clu = table.properties().get("clustering")
            if not clu:
                raise ValueError(f"{name} has no clustering to re-run FULL")
            zcols = clu["cols"]
        if zcols is None:
            intent = table.properties().get("clustering_intent")
            if intent:
                version = table.optimize(zorder_by=intent, where=where)
                table.set_properties({"clustering_intent": None})
                return self._status("OPTIMIZE (cluster by intent)", name, version)
        version = table.optimize(
            zorder_by=zcols,
            where=where,
            incremental=bool(zcols) and not full,
        )
        return self._status("OPTIMIZE", name, version)

    _VACUUM = _ci(
        r"^VACUUM\s+(`?[\w.]+`?)(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?"
        r"(\s+DRY\s+RUN)?$"
    )

    def _vacuum(self, stmt: str) -> DataFrame:
        m = self._VACUUM.match(stmt)
        if not m:
            raise ValueError(f"unsupported VACUUM form: {stmt[:80]!r}")
        name = _unquote_ident(m.group(1))
        table = self.table(name)
        if m.group(2) is not None:
            # Delta's hour-based retention mapped onto the engine's
            # version-count vacuum: keep every version still live within
            # the window, plus the one current AT the cutoff (files a
            # reader pinned at the horizon could still reference).
            cutoff = time.time() - float(m.group(2)) * 3600.0
            try:
                horizon = table.version_at(cutoff)
            except ValueError:
                horizon = 0  # whole history is younger than the window
            keep = table.latest_version() - horizon + 1
        else:
            keep = 1
        dry = bool(m.group(3))
        n = table.vacuum(keep_versions=keep, dry_run=dry)
        return self.spark.createDataFrame(
            [(name, n, dry)],
            "table string, files_deleted int, dry_run boolean",
        )

    _COMMENT_ON = _ci(
        r"^COMMENT\s+ON\s+TABLE\s+(`?[\w.]+`?)\s+IS\s+"
        r"(?:'(?P<txt>(?:[^']|'')*)'|(?P<null>NULL))$"
    )

    def _comment_on(self, stmt: str) -> DataFrame:
        """``COMMENT ON TABLE t IS 'text' | NULL`` — the table comment
        lives in the versioned props (RESTORE rolls it back); DESCRIBE
        EXTENDED and SHOW CREATE surface it."""
        m = self._COMMENT_ON.match(stmt)
        if not m:
            raise ValueError(f"unsupported COMMENT form: {stmt[:80]!r}")
        name = _unquote_ident(m.group(1))
        table = self.table(name)
        txt = None if m.group("null") else m.group("txt").replace("''", "'")
        v = table.set_properties({"comment": txt})
        return self._status("COMMENT ON TABLE", name, v)

    _DESCRIBE = _ci(
        r"^DESC(?:RIBE)?\s+(?:(HISTORY|DETAIL|EXTENDED)\s+)?(`?[\w.]+`?)"
        r"(?:\s+LIMIT\s+(\d+))?$"
    )

    def _describe(self, stmt: str) -> DataFrame:
        m = self._DESCRIBE.match(stmt)
        if not m:
            raise ValueError(f"unsupported DESCRIBE form: {stmt[:80]!r}")
        what = (m.group(1) or "PLAIN").upper()
        table = self.table(m.group(2))
        if what == "PLAIN":
            # Spark's bare DESCRIBE: column name/type/comment rows
            d = table.detail()
            schema = _schema_from_json(self.spark, d["schema"])
            ccs = d["properties"].get("col_comments", {})
            return self.spark.createDataFrame(
                [
                    (f.name, f.dataType.simpleString(), ccs.get(f.name, ""))
                    for f in schema.fields
                ],
                "col_name string, data_type string, comment string",
            )
        if what == "EXTENDED":
            return self._describe_extended(table)
        if what == "HISTORY":
            limit = int(m.group(3)) if m.group(3) else None
            rows = [
                (
                    c.version,
                    float(c.timestamp),
                    c.operation,
                    c.n_files,
                    json.dumps(c.metrics or {}, sort_keys=True),
                )
                for c in table.history(limit=limit)
            ]
            return self.spark.createDataFrame(
                rows,
                "version int, timestamp double, operation string, "
                "num_files int, operation_metrics string",
            ).orderBy(F.col("version").desc())
        d = table.detail()
        row = (
            "lakehouse-parquet",
            d["location"],
            d["version"],
            d["num_files"],
            d["size_bytes"],
            d["partition_columns"],
            (d["properties"].get("clustering") or {}).get("cols", []),
            float(d["created_at"]),
            float(d["last_modified"]),
            json.dumps(d["properties"], sort_keys=True, default=str),
        )
        return self.spark.createDataFrame(
            [row],
            "format string, location string, version int, num_files int, "
            "size_in_bytes long, partition_columns array<string>, "
            "clustering_columns array<string>, created_at double, "
            "last_modified double, properties string",
        )

    def _describe_extended(self, table) -> DataFrame:
        """``DESCRIBE EXTENDED t`` — schema rows first (Spark's layout),
        then ``# Detailed Table Information`` key/value rows including
        the last ANALYZE's statistics.  Metadata-only: manifest + file
        sizes, no data read."""
        d = table.detail()
        rows: list[tuple[str, str, str]] = []
        schema = _schema_from_json(self.spark, d["schema"])
        for f in schema.fields:
            rows.append((f.name, f.dataType.simpleString(), ""))
        rows.append(("# Detailed Table Information", "", ""))
        rows.append(("Location", d["location"], ""))
        rows.append(("Version", str(d["version"]), ""))
        rows.append(("Num Files", str(d["num_files"]), ""))
        rows.append(("Size Bytes", str(d["size_bytes"]), ""))
        rows.append(
            ("Partition Columns", json.dumps(d["partition_columns"]), "")
        )
        s = d["properties"].get("statistics")
        if s:
            # stale iff any DATA-changing commit landed after the
            # analyzed snapshot (metadata-only commits don't invalidate)
            # — the table layer's rule, shared with every stats-driven
            # plan decision (count(), broadcast-side choice) so the
            # DESCRIBE flag and the optimizer can never disagree.
            stale = table.fresh_statistics() is None
            rows.append(("# Statistics (last ANALYZE)", "", ""))
            rows.append(("Stats As-Of Version", str(s["as_of_version"]), ""))
            rows.append(
                ("Num Rows", str(s.get("num_rows")), "stale" if stale else "")
            )
            for c, cs in sorted(s.get("columns", {}).items()):
                rows.append(
                    (f"Column Stats: {c}", json.dumps(cs, sort_keys=True), "")
                )
        for k, v in sorted(d["properties"].items()):
            if k == "statistics":
                continue
            rows.append(
                (f"Property: {k}", json.dumps(v, sort_keys=True, default=str), "")
            )
        return self.spark.createDataFrame(
            rows, "col_name string, data_type string, comment string"
        )

    _RESTORE = _ci(
        r"^RESTORE\s+(?:TABLE\s+)?(`?[\w.]+`?)\s+TO\s+"
        r"(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']*)')$"
    )

    def _restore(self, stmt: str) -> DataFrame:
        m = self._RESTORE.match(stmt)
        if not m:
            raise ValueError(f"unsupported RESTORE form: {stmt[:80]!r}")
        table = self.table(m.group(1))
        version = (
            int(m.group(2))
            if m.group(2) is not None
            else table.version_at(m.group(3))
        )
        new_version = table.restore(version)
        return self._status("RESTORE", _unquote_ident(m.group(1)), new_version)

    _TRUNCATE = _ci(r"^TRUNCATE\s+TABLE\s+(`?[\w.]+`?)$")

    def _truncate(self, stmt: str) -> DataFrame:
        """``TRUNCATE TABLE t`` (Delta parity): remove every row in one
        commit.  Routes to the unconditioned delete, whose DML-mode
        split DROPS whole files from the manifest — a metadata-only
        commit, no data rewrite, and the pre-truncate snapshot stays
        time-travelable (RESTORE undoes it).  The history records the
        engine's one delete path (operation DELETE with all files
        dropped); an already-empty table commits nothing."""
        m = self._TRUNCATE.match(stmt)
        if not m:
            raise ValueError(f"unsupported TRUNCATE form: {stmt[:80]!r}")
        name = _unquote_ident(m.group(1))
        table = self.table(name)
        if table.count() == 0:  # metadata-only probe: nothing to drop
            return self.spark.createDataFrame(
                [(name, table.latest_version(), 0)],
                "table string, version int, num_affected_rows long",
            )
        version = table.delete("true")
        c = table.history(limit=1)[0]
        n = (
            (c.metrics or {}).get("rows_deleted", 0)
            if c.version == version and c.operation == "DELETE"
            else 0
        )
        return self.spark.createDataFrame(
            [(name, version, n)],
            "table string, version int, num_affected_rows long",
        )

    # -- ALTER TABLE --------------------------------------------------------

    def _alter(self, stmt: str) -> DataFrame:
        m = _ci(r"^ALTER\s+TABLE\s+(`?[\w.]+`?)\s+(.*)$").match(stmt)
        if not m:
            raise ValueError(f"unsupported ALTER form: {stmt[:80]!r}")
        name = _unquote_ident(m.group(1))
        table = self.table(name)
        action = m.group(2).strip()

        if _ci(r"^SYNC\s+IDENTITY$").match(action):
            return self._status(
                "ALTER SYNC IDENTITY", name, table.sync_identity()
            )

        am = _ci(r"^ADD\s+COLUMNS?\s+(.*)$").match(action)
        if am and not _ci(r"^ADD\s+CONSTRAINT\b").match(action):
            raw = am.group(1).strip()
            if raw.startswith("(") and raw.endswith(")"):
                raw = raw[1:-1]
            v = None
            one = _ci(
                r"^(?P<col>`?\w+`?)\s+(?P<type>[\w]+(?:\s*\([^)]*\))?"
                r"(?:\s*<.*>)?)"
                r"(?:\s+GENERATED\s+(?P<mode>ALWAYS|BY\s+DEFAULT)\s+AS\s+"
                r"(?:IDENTITY(?:\s*\(\s*START\s+WITH\s+(?P<st>-?\d+)\s+"
                r"INCREMENT\s+BY\s+(?P<by>-?\d+)\s*\))?"
                r"|\((?P<gen>.+)\)))?\s*$"
            )
            for item in _split_cols(raw):
                cm = one.match(item.strip())
                if not cm:
                    raise ValueError(f"cannot parse ADD COLUMN item: {item!r}")
                col, dtype = _unquote_ident(cm.group("col")), cm.group("type")
                if _ci(r"\bIDENTITY\b").search(item):
                    v = table.add_identity_column(
                        col,
                        start=int(cm.group("st") or 1),
                        step=int(cm.group("by") or 1),
                        always=(cm.group("mode") or "ALWAYS").upper()
                        == "ALWAYS",
                    )
                elif cm.group("gen"):
                    if (cm.group("mode") or "").upper().startswith("BY"):
                        raise ValueError(
                            "expression columns are GENERATED ALWAYS AS "
                            "(expr); only IDENTITY supports BY DEFAULT"
                        )
                    v = table.add_generated_column(col, dtype, cm.group("gen"))
                else:
                    v = table.add_column(col, dtype)
            return self._status("ALTER ADD COLUMNS", name, v)

        dm = _ci(r"^DROP\s+COLUMN\s+(`?\w+`?)$").match(action)
        if dm:
            return self._status(
                "ALTER DROP COLUMN", name, table.drop_column(_unquote_ident(dm.group(1)))
            )
        rm = _ci(r"^RENAME\s+COLUMN\s+(`?\w+`?)\s+TO\s+(`?\w+`?)$").match(action)
        if rm:
            v = table.rename_column(
                _unquote_ident(rm.group(1)), _unquote_ident(rm.group(2))
            )
            return self._status("ALTER RENAME COLUMN", name, v)
        cm = _ci(
            r"^(?:ALTER|CHANGE)\s+COLUMN\s+(`?\w+`?)\s+(.*)$"
        ).match(action)
        if cm:
            col = _unquote_ident(cm.group(1))
            sub = cm.group(2).strip()
            tm = _ci(r"^TYPE\s+([\w()<>, ]+)$").match(sub)
            if tm:
                return self._status(
                    "ALTER COLUMN TYPE", name,
                    table.alter_column_type(col, tm.group(1).strip()),
                )
            cc = _ci(
                r"^COMMENT\s+(?:'(?P<txt>(?:[^']|'')*)'|(?P<null>NULL))$"
            ).match(sub)
            if cc:
                props0 = table.properties()
                ccs = dict(props0.get("col_comments", {}))
                if cc.group("null"):
                    ccs.pop(col, None)
                else:
                    ccs[col] = cc.group("txt").replace("''", "'")
                v = table.set_properties({"col_comments": ccs or None})
                return self._status("ALTER COLUMN COMMENT", name, v)
            if _ci(r"^SET\s+NOT\s+NULL$").match(sub):
                return self._status(
                    "ALTER SET NOT NULL", name, table.set_not_null(col)
                )
            if _ci(r"^DROP\s+NOT\s+NULL$").match(sub):
                return self._status(
                    "ALTER DROP NOT NULL", name, table.drop_not_null(col)
                )
            sd = _ci(r"^SET\s+DEFAULT\s+(.+)$").match(sub)
            if sd:
                return self._status(
                    "ALTER SET DEFAULT", name, table.set_default(col, sd.group(1))
                )
            if _ci(r"^DROP\s+DEFAULT$").match(sub):
                return self._status(
                    "ALTER DROP DEFAULT", name, table.drop_default(col)
                )
            raise ValueError(f"unsupported ALTER COLUMN action: {sub!r}")
        sp = _ci(r"^SET\s+TBLPROPERTIES\s*\((.*)\)$").match(action)
        if sp:
            v = table.set_properties(self._parse_props(sp.group(1)))
            return self._status("ALTER SET TBLPROPERTIES", name, v)
        up = _ci(r"^UNSET\s+TBLPROPERTIES\s*\((.*)\)$").match(action)
        if up:
            keys = [k.strip().strip("'\"") for k in _split_top(up.group(1), ",")]
            v = table.set_properties({k: None for k in keys})
            return self._status("ALTER UNSET TBLPROPERTIES", name, v)
        ac = _ci(r"^ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.*)\)$").match(action)
        if ac:
            v = table.add_check_constraint(ac.group(1), ac.group(2))
            return self._status("ALTER ADD CONSTRAINT", name, v)
        pk = _ci(
            r"^ADD\s+CONSTRAINT\s+(\w+)\s+PRIMARY\s+KEY\s*\(([^)]*)\)$"
        ).match(action)
        if pk:
            v = table.add_key_constraint(
                pk.group(1), "pk", _ident_list(pk.group(2))
            )
            return self._status("ALTER ADD CONSTRAINT", name, v)
        fk = _ci(
            r"^ADD\s+CONSTRAINT\s+(\w+)\s+FOREIGN\s+KEY\s*\(([^)]*)\)\s+"
            r"REFERENCES\s+(`?[\w.]+`?)\s*(?:\(([^)]*)\))?$"
        ).match(action)
        if fk:
            v = table.add_key_constraint(
                fk.group(1),
                "fk",
                _ident_list(fk.group(2)),
                ref_table=_unquote_ident(fk.group(3)),
                ref_cols=_ident_list(fk.group(4)) if fk.group(4) else None,
            )
            return self._status("ALTER ADD CONSTRAINT", name, v)
        dc = _ci(r"^DROP\s+CONSTRAINT\s+(\w+)$").match(action)
        if dc:
            return self._status(
                "ALTER DROP CONSTRAINT", name, table.drop_constraint(dc.group(1))
            )
        cb = _ci(r"^CLUSTER\s+BY\s*\(([^)]*)\)$").match(action)
        if cb:
            # liquid-clustering ALTER: re-key the layout going forward
            v = table.optimize(zorder_by=_ident_list(cb.group(1)))
            return self._status("ALTER CLUSTER BY", name, v)
        raise ValueError(f"unsupported ALTER action: {action[:80]!r}")

    # -- DROP / SHOW --------------------------------------------------------

    _DROP = _ci(
        r"^DROP\s+(MATERIALIZED\s+VIEW|TABLE|VIEW)\s+"
        r"(IF\s+EXISTS\s+)?(`?[\w.]+`?)$"
    )

    def _drop(self, stmt: str) -> DataFrame:
        if _ci(r"^DROP\s+TEMPORARY\s+VARIABLE\b").match(stmt):
            return self.spark.sql(stmt)  # session variable — native
        m = self._DROP.match(stmt)
        if not m:
            raise ValueError(f"unsupported DROP form: {stmt[:80]!r}")
        if m.group(1).upper().startswith("MATERIALIZED"):
            name = _unquote_ident(m.group(3))
            if name not in self._mviews:
                if m.group(2):
                    return self._status(
                        "DROP MATERIALIZED VIEW (absent)", name, None
                    )
                raise KeyError(f"unknown materialized view {name!r}")
            self._mviews.discard(name)
            self._views.pop(name, None)
            self._paths.pop(f"{name}__mvdata", None)
            self._save_catalog()
            self.spark.catalog.dropTempView(self._view_name(name))
            return self._status("DROP MATERIALIZED VIEW", name, None)
        if m.group(1).upper() == "VIEW":
            name = _unquote_ident(m.group(3))
            if name in self._mviews:
                raise ValueError(
                    f"{name} is a materialized view; use DROP "
                    "MATERIALIZED VIEW"
                )
            if name not in self._views:
                if m.group(2):
                    return self._status("DROP VIEW (absent)", name, None)
                raise KeyError(f"unknown view {name!r}")
            del self._views[name]
            self._save_catalog()
            self.spark.catalog.dropTempView(self._view_name(name))
            return self._status("DROP VIEW", name, None)
        name = _unquote_ident(m.group(3))
        if name not in self._paths:
            if m.group(2):
                return self._status("DROP TABLE (absent)", name, None)
            raise KeyError(f"unknown table {name!r}")
        # external-table semantics: the catalog entry goes, data stays
        # (matching the reference's LOCATION-based registrations)
        del self._paths[name]
        self._save_catalog()
        pinned = self._cached.pop(name, None)
        if pinned is not None:
            pinned.unpersist()
        self.spark.catalog.dropTempView(self._view_name(name))
        return self._status("DROP TABLE", name, None)

    # properties that are ENGINE state expressed elsewhere in the DDL
    # (column clauses, ALTER statements) or not reconstructable from a
    # CREATE at all — everything else round-trips via TBLPROPERTIES
    _DDL_RESERVED_PROPS = frozenset(
        {
            "check_constraints",
            "key_constraints",
            "not_null",
            "generated",
            "defaults",
            "identity",
            "bloom",
            "clustering",
            "clustering_intent",
            "statistics",
            "txns",
            # managed-pipeline state (MV / streaming table): internal,
            # not reconstructable through CREATE TABLE
            "comment",
            "col_comments",
            "mv_query",
            "mv_dep_table",
            "mv_dep_version",
            "st_query",
            "st_checkpoint",
            "mv_dep_dims",
            "mv_rid",
            "mv_fold_mode",
        }
    )

    def _show_create(self, name: str) -> DataFrame:
        """``SHOW CREATE TABLE t`` — DDL that reconstructs the table
        through THIS front-end's own parser (round-trip tested): column
        clauses carry NOT NULL / DEFAULT / GENERATED / IDENTITY, then
        PARTITIONED BY / CLUSTER BY / LOCATION / user TBLPROPERTIES.
        Databricks emits one ``createtab_stmt`` row; CHECK constraints
        need ALTER statements here, so they follow as extra rows —
        execute the rows in order to rebuild the table at a new
        LOCATION.  Bloom-index config is maintenance state and is not
        emitted."""
        if name in self._mviews:
            # Databricks' SHOW CREATE TABLE answers for MVs too —
            # emitting a plain CREATE TABLE of the hidden state table
            # would round-trip into something that is NOT an MV
            return self._show_create_mv(name)
        table = self.table(name)
        d = table.detail()
        props = d["properties"]
        if "st_query" in props:
            return self._show_create_st(name, props)
        schema = _schema_from_json(self.spark, d["schema"])
        ident = props.get("identity", {})
        gen = props.get("generated", {})
        defaults = props.get("defaults", {})
        not_null = set(props.get("not_null", []))
        cols = []
        for f in schema.fields:
            if f.name in ident:
                i = ident[f.name]
                mode = "ALWAYS" if i.get("always", True) else "BY DEFAULT"
                cols.append(
                    f"  `{f.name}` BIGINT GENERATED {mode} AS IDENTITY "
                    f"(START WITH {i['start']} INCREMENT BY {i['step']})"
                )
                continue
            line = f"  `{f.name}` {f.dataType.simpleString()}"
            if f.name in gen:
                line += f" GENERATED ALWAYS AS ({gen[f.name]})"
            else:
                if f.name in defaults:
                    line += f" DEFAULT {defaults[f.name]}"
                if f.name in not_null:
                    line += " NOT NULL"
            cols.append(line)
        inv = {p: l for l, p in d["column_mapping"].items()}
        parts = [inv.get(c, c) for c in d["partition_columns"]]
        cluster = (props.get("clustering") or {}).get("cols", []) or props.get(
            "clustering_intent", []
        )
        ddl = f"CREATE TABLE {name} (\n" + ",\n".join(cols) + "\n)\nUSING PARQUET"
        if parts:
            ddl += f"\nPARTITIONED BY ({', '.join(parts)})"
        if cluster:
            ddl += f"\nCLUSTER BY ({', '.join(cluster)})"
        ddl += f"\nLOCATION '{d['location']}'"
        user_props = {
            k: v
            for k, v in props.items()
            if k not in self._DDL_RESERVED_PROPS
        }
        if user_props:
            rendered = ", ".join(
                f"'{k}' = "
                + (
                    f"'{v}'"
                    if isinstance(v, str)
                    else json.dumps(v)  # bool/int render as true/1
                )
                for k, v in sorted(user_props.items())
            )
            ddl += f"\nTBLPROPERTIES ({rendered})"
        rows = [(ddl,)]
        for cname, expr in sorted(
            props.get("check_constraints", {}).items()
        ):
            rows.append(
                (f"ALTER TABLE {name} ADD CONSTRAINT {cname} CHECK ({expr})",)
            )
        for cname, kc in sorted(props.get("key_constraints", {}).items()):
            cols = ", ".join(kc["cols"])
            if kc["kind"] == "pk":
                rows.append(
                    (
                        f"ALTER TABLE {name} ADD CONSTRAINT {cname} "
                        f"PRIMARY KEY ({cols})",
                    )
                )
            else:
                refs = ", ".join(kc["ref_cols"])
                rows.append(
                    (
                        f"ALTER TABLE {name} ADD CONSTRAINT {cname} "
                        f"FOREIGN KEY ({cols}) REFERENCES "
                        f"{kc['ref_table']} ({refs})",
                    )
                )
        if props.get("comment"):
            esc = props["comment"].replace("'", "''")
            rows.append((f"COMMENT ON TABLE {name} IS '{esc}'",))
        for c, txt in sorted(props.get("col_comments", {}).items()):
            esc = txt.replace("'", "''")
            rows.append(
                (f"ALTER TABLE {name} ALTER COLUMN {c} COMMENT '{esc}'",)
            )
        return self.spark.createDataFrame(rows, "createtab_stmt string")

    def _show_create_mv(self, name: str) -> DataFrame:
        """``SHOW CREATE MATERIALIZED VIEW mv`` — DDL that reconstructs
        the MV through this front-end's own parser (round-trip tested):
        the defining query and data LOCATION ride the data table's
        versioned properties, so the emitted statement recreates the
        same MV (recomputed fresh, dependency versions re-pinned).  A
        non-default fold mode follows as an ALTER row."""
        if name not in self._mviews:
            raise KeyError(f"unknown materialized view {name!r}")
        data_name = f"{name}__mvdata"
        props = self.table(data_name).properties()
        loc = self._paths[data_name].replace("'", "''")
        rows = [
            (
                f"CREATE MATERIALIZED VIEW {name} LOCATION '{loc}' "
                f"AS {props['mv_query']}",
            )
        ]
        fold = props.get("mv_fold_mode")
        if fold:
            rows.append(
                (
                    f"ALTER TABLE {data_name} SET TBLPROPERTIES "
                    f"('mv_fold_mode' = '{fold}')",
                )
            )
        return self.spark.createDataFrame(rows, "createtab_stmt string")

    def _show_create_st(self, name: str, props: dict) -> DataFrame:
        """``SHOW CREATE STREAMING TABLE st`` — the pipeline spec
        (query + target LOCATION) as round-trippable DDL."""
        loc = self._paths[name].replace("'", "''")
        return self.spark.createDataFrame(
            [
                (
                    f"CREATE STREAMING TABLE {name} LOCATION '{loc}' "
                    f"AS {props['st_query']}",
                )
            ],
            "createtab_stmt string",
        )

    def _show(self, stmt: str) -> DataFrame:
        scm = _ci(
            r"^SHOW\s+CREATE\s+MATERIALIZED\s+VIEW\s+(`?[\w.]+`?)$"
        ).match(stmt)
        if scm:
            return self._show_create_mv(_unquote_ident(scm.group(1)))
        scs = _ci(
            r"^SHOW\s+CREATE\s+STREAMING\s+TABLE\s+(`?[\w.]+`?)$"
        ).match(stmt)
        if scs:
            name = _unquote_ident(scs.group(1))
            props = self.table(name).properties()
            if "st_query" not in props:
                raise ValueError(f"{name} is not a streaming table")
            return self._show_create_st(name, props)
        sc = _ci(r"^SHOW\s+CREATE\s+TABLE\s+(`?[\w.]+`?)$").match(stmt)
        if sc:
            return self._show_create(_unquote_ident(sc.group(1)))
        cm = _ci(r"^SHOW\s+COLUMNS\s+(?:IN|FROM)\s+(`?[\w.]+`?)$").match(stmt)
        if cm:
            schema = _schema_from_json(
                self.spark, self.table(cm.group(1)).detail()["schema"]
            )
            return self.spark.createDataFrame(
                [(f.name,) for f in schema.fields], "col_name string"
            )
        if _ci(r"^SHOW\s+TABLES$").match(stmt):
            rows = sorted(self._paths.items())
            return self.spark.createDataFrame(
                rows or [("", "")], "table string, location string"
            ).filter(F.col("table") != "")
        if _ci(r"^SHOW\s+VIEWS$").match(stmt):
            rows = sorted(self._views.items())
            return self.spark.createDataFrame(
                rows or [("", "")], "view string, body string"
            ).filter(F.col("view") != "")
        tp = _ci(r"^SHOW\s+TBLPROPERTIES\s+(`?[\w.]+`?)$").match(stmt)
        if tp:
            props = self.table(tp.group(1)).properties()
            rows = sorted(
                (k, json.dumps(v, sort_keys=True, default=str))
                for k, v in props.items()
            )
            return self.spark.createDataFrame(
                rows or [("", "")], "key string, value string"
            ).filter(F.col("key") != "")
        pm = _ci(r"^SHOW\s+PARTITIONS\s+(`?[\w.]+`?)$").match(stmt)
        if pm:
            # metadata-only: partition values come from the manifest's
            # file paths, never a data scan
            from urllib.parse import unquote

            table = self.table(pm.group(1))
            m = table._manifest()
            if not m["partition_by"]:
                raise ValueError(f"{pm.group(1)} is not partitioned")
            inv_cols = m["partition_by"]
            seen = sorted({os.path.dirname(f) for f in m["files"]})
            rows = []
            for d in seen:
                vals = {}
                for seg in d.split("/"):
                    k, _, v = seg.partition("=")
                    vals[k] = unquote(v)
                rows.append(tuple(vals.get(c) for c in inv_cols))
            schema = ", ".join(f"`{c}` string" for c in inv_cols)
            return self.spark.createDataFrame(rows, schema)
        raise ValueError(f"unsupported SHOW form: {stmt[:80]!r}")

    _REORG = _ci(
        r"^REORG\s+TABLE\s+(`?[\w.]+`?)(?:\s+WHERE\s+(.+?))?"
        r"\s+APPLY\s*\(\s*PURGE\s*\)$"
    )

    def _reorg(self, stmt: str) -> DataFrame:
        m = self._REORG.match(stmt)
        if not m:
            raise ValueError(
                "supported form: REORG TABLE t [WHERE p] APPLY (PURGE)"
            )
        name = _unquote_ident(m.group(1))
        version = self.table(name).purge_deletion_vectors(where=m.group(2))
        return self._status("REORG (PURGE)", name, version)
