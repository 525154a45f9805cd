"""Streaming change-data-feed source for the parquet-native table layer.

Exposes :meth:`ParquetTable.changes_between` as a first-class Structured
Streaming source via the Python DataSource API (public in Spark 4):

    spark.dataSource.register(TableChangesDataSource)
    stream = (spark.readStream.format("table_changes")
              .option("path", table_root).load())

Each micro-batch delivers the rows appended since the last committed
table version, tagged ``_change_type`` / ``_commit_version`` — the
streaming half of the CDC contract (Delta's ``readChangeFeed`` stream),
which turns any table written by the batch pipeline into a live feed for
downstream incremental consumers with offsets checkpointed by the engine.

Scale design — the part that matters:

- **Offsets are table versions** (tiny JSON dicts on the driver); the
  driver only ever reads MANIFESTS, never data.
- **One input partition per added data file**: ``partitions()`` diffs
  manifest file-sets, ``read()`` runs ON THE EXECUTORS and streams the
  file through ``pyarrow`` record batches.  Rows never route through the
  driver — this is the partition-based ``DataSourceStreamReader``, not
  the driver-side ``SimpleDataSourceStreamReader`` (which is documented
  for low-throughput sources only).
- **Append commits** (CREATE/APPEND) partition over their added files
  (``insert`` rows); OPTIMIZE commits are skipped as data-preserving.
- **DELETE/UPDATE commits** partition over the CDC sidecar files the
  table layer wrote in the same commit (``_change_data/``): real
  row-level changes — ``delete`` rows, ``update_preimage`` /
  ``update_postimage`` pairs — stream through without any driver-side
  join, cost ∝ changed rows.
- **Rewrite commits WITHOUT a sidecar** (MERGE/OVERWRITE/RESTORE, or
  DML from before the sidecar existed) need the EXCEPT ALL
  reconstruction — a join, not expressible inside a source partition.
  By default such a commit RAISES (silent misreads are worse than a
  stopped stream); ``.option("ignoreChanges", "true")`` skips them, the
  same escape hatch Delta's stream source offers.

Cited parity: the reference documents continuous ETL over ingested
tables (``README.md:20,63``); this source closes the loop so silver/gold
can stream from bronze commits instead of rescanning.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_MANIFEST_DIR = "_manifest"
_DATA_DIR = "data"
_CDC_DIR = "_change_data"

# Operations whose file-diff is NOT pure inserts (see tables.py).
# commits that REMOVE rows; REPLACE_WHERE carries a CDC sidecar (streams
# exactly), FSCK never can (its rows' bytes are lost — raises unless the
# consumer opted out of change commits entirely)
_REWRITE_OPS = {
    "DELETE",
    "UPDATE",
    "MERGE",
    "OVERWRITE",
    "RESTORE",
    "REPLACE_WHERE",
    "FSCK",
}


def _manifest(root: str, version: int) -> dict:
    with open(
        os.path.join(root, _MANIFEST_DIR, f"v{version:010d}.json")
    ) as fh:
        return json.load(fh)


def _versions(root: str) -> list[int]:
    mdir = os.path.join(root, _MANIFEST_DIR)
    return sorted(
        int(f[1:-5])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    )


@dataclass
class _FilePartition(InputPartition):
    path: str  # absolute path of one added data file
    version: int
    # logical -> physical column renames of the commit's manifest (the
    # table's column mapping); data files store PHYSICAL names
    renames: tuple = ()
    # the commit's wall-clock instant (manifest timestamp, microseconds
    # since epoch) — surfaced as Delta's _commit_timestamp CDF column
    commit_ts_us: int = 0


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self.root = options["path"]
        # Variant columns stream (round 11, NESTED since round 12): the
        # executor read routes through parquet_compat.read_table_compat
        # — the footer patcher walks the FLAT SchemaElement list, so it
        # strips the VARIANT annotation from nested leaves too — and a
        # type-driven recursive rebuild turns every {value, metadata}
        # binary pair back into a VariantVal wherever VariantType sits
        # in the declared schema (top level, struct fields, array
        # elements, map values).  The engine writes variant UNSHREDDED
        # (see _write_files); a shredded file still refuses per file.
        self.variant_fields = {
            f.name
            for f in schema.fields
            if "variant" in f.dataType.simpleString()
        }
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
            # Delta's modern spelling of the same opt-out (this source's
            # ignoreChanges always meant SKIP the commit, which is
            # exactly skipChangeCommits' contract)
            or str(options.get("skipchangecommits", "false")).lower()
            == "true"
        )
        # plain-table streaming (read_table_stream): the consumer sees
        # appended ROWS with no _change_type to distinguish a retraction
        # — so a rewrite commit must FAIL even when it carries a CDC
        # sidecar.  Without this, sidecar delete/update_preimage rows
        # would be delivered as if freshly appended (Delta's plain
        # readStream likewise refuses data-changing commits unless
        # skipChangeCommits is set).
        self.plain_stream = (
            str(options.get("plainstream", "false")).lower() == "true"
        )
        start = options.get("startingversion")
        self.start_version = int(start) if start is not None else -1
        mv = options.get("maxversionspertrigger")
        self.max_versions = int(mv) if mv is not None else None
        if self.max_versions is not None and self.max_versions < 1:
            raise ValueError("maxVersionsPerTrigger must be >= 1")
        # rate-limit bookkeeping.  _last_end: the last end offset THIS
        # reader handed out.  _engine_floor: the engine's checkpointed
        # position as far as this reader has OBSERVED it — initialOffset
        # (fresh start only), partitions() (replay of an uncommitted
        # batch), and commit() all reveal it.  latestOffset must never
        # return an offset below the floor: after a checkpoint restart
        # the engine COMMITS whatever we return, and a lower offset
        # silently re-delivers every version in between on the next
        # trigger (duplicate rows downstream).  When neither is known
        # (restart straight into latestOffset) the first answer is the
        # newest version UNBOUNDED — one oversized batch beats replayed
        # data — and rate limiting resumes from there.
        self._last_end: int | None = None
        self._engine_floor: int | None = None
        self.schema = schema
        self.field_names = [f.name for f in schema.fields]

    # -- offsets (driver-side, manifest-only) -------------------------------

    def initialOffset(self) -> dict:
        # called on a FRESH start only (no checkpoint) — the engine's
        # position IS start_version, so rate limiting may begin there
        self._engine_floor = self.start_version
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        """Newest version — or, with ``maxVersionsPerTrigger``, at most
        that many commits past the previous end, so a large backlog
        drains in bounded micro-batches instead of one giant one (the
        ``maxFilesPerTrigger`` idea expressed in version space, the
        source's natural work unit).  Never returns an offset below the
        engine's observed committed position (see ``_engine_floor``)."""
        newest = _versions(self.root)[-1]
        if self.max_versions is None:
            return {"version": newest}
        if self._last_end is None and self._engine_floor is None:
            # checkpoint restart with the engine's position unknown: a
            # bounded guess could land BEHIND the committed offset and
            # be committed over it, replaying versions forever after.
            # Deliver unbounded once; bound again from here on.
            self._last_end = newest
            return {"version": newest}
        base = max(
            v
            for v in (self._last_end, self._engine_floor, self.start_version)
            if v is not None
        )
        end = min(newest, base + self.max_versions)
        self._last_end = max(end, base)
        return {"version": self._last_end}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # the engine only asks for ranges it is about to commit — on a
        # checkpoint-restart replay this is the first place its real
        # position becomes visible, so record it for rate limiting
        floor = max(start["version"], end["version"])
        if self._engine_floor is None or floor > self._engine_floor:
            self._engine_floor = floor
        parts: list[InputPartition] = []
        # column mapping: physical file names are immutable, so the
        # END version's logical->physical map is correct for EVERY
        # commit in the batch — a file written before a rename carries
        # the same physical column the latest mapping points at
        end_colmap = _manifest(self.root, end["version"]).get("colmap", {})
        renames = tuple(sorted(end_colmap.items()))
        for v in range(start["version"] + 1, end["version"] + 1):
            m = _manifest(self.root, v)
            op = m["operation"]
            if op == "OPTIMIZE":
                continue
            if op in _REWRITE_OPS:
                if self.ignore_changes:
                    # the user opted out of rewrite deltas entirely —
                    # honored even when a sidecar exists, matching the
                    # batch escape hatch's semantics
                    continue
                if self.plain_stream:
                    # a sidecar records the delta faithfully, but a
                    # plain stream has no _change_type column to carry
                    # it — delivering the sidecar rows would hand
                    # deleted rows / update preimages downstream as
                    # fresh appends.  Fail loudly instead.
                    raise ValueError(
                        f"version {v} is a {op} commit that removes or "
                        "rewrites rows; a plain table stream delivers "
                        "appends only. Set skip_change_commits=True to "
                        "skip such commits, or stream the CDF "
                        "(format 'table_changes' without plainStream) "
                        "to consume row-level deltas."
                    )
                cdc = m.get("cdc_files", [])
                if cdc:
                    # the commit recorded its exact row-level delta as a
                    # CDC sidecar: stream THOSE files — each row carries
                    # its own _change_type (delete / update_preimage /
                    # update_postimage), no reconstruction needed.
                    # Sidecars store LOGICAL-AT-COMMIT-TIME column names
                    # (not physical), so a rename AFTER the DML commit
                    # needs a composed mapping: current logical -> the
                    # shared physical identity (end colmap) -> the name
                    # logical at v (inverse of v's colmap).  Without it
                    # a backlog spanning a rename reads NULLs for the
                    # renamed column's delete/update rows.
                    v_inv = {p: l for l, p in m.get("colmap", {}).items()}

                    def _at_v(name: str) -> str:
                        phys = end_colmap.get(name, name)
                        return v_inv.get(phys, phys)

                    sidecar_renames = tuple(
                        sorted(
                            (name, _at_v(name))
                            for name in self.field_names
                            if name
                            not in (
                                "_change_type",
                                "_commit_version",
                                "_commit_timestamp",
                            )
                            and _at_v(name) != name
                        )
                    )
                    cdc_root = os.path.join(self.root, _CDC_DIR)
                    for f in sorted(cdc):
                        parts.append(
                            _FilePartition(
                                path=os.path.join(cdc_root, f),
                                version=v,
                                renames=sidecar_renames,
                                commit_ts_us=int(m["timestamp"] * 1e6),
                            )
                        )
                    continue
                raise ValueError(
                    f"version {v} is a {op} commit without a CDC sidecar; "
                    "the streaming CDF source delivers append commits and "
                    "sidecar-backed DELETE/UPDATE commits only. Set "
                    ".option('ignoreChanges', 'true') to skip it, or "
                    "consume it in batch via "
                    "ParquetTable.changes_between()."
                )
            prev_files = (
                set(_manifest(self.root, v - 1)["files"]) if v > 0 else set()
            )
            data_root = os.path.join(self.root, _DATA_DIR)
            for f in sorted(set(m["files"]) - prev_files):
                parts.append(
                    _FilePartition(
                        path=os.path.join(data_root, f),
                        version=v,
                        renames=renames,
                        commit_ts_us=int(m["timestamp"] * 1e6),
                    )
                )
        return parts

    # -- data (executor-side, pyarrow record batches) -----------------------

    def read(self, partition: _FilePartition):
        import urllib.parse

        from pyspark.sql.types import VariantVal

        from azure_databricks_lakehouse_spark.sources.parquet_compat import (
            read_table_compat,
        )

        # Hive-partitioned files carry the partition values in DIRECTORY
        # names (part=x/...), not in the parquet columns — recover them
        # from the path and cast per the declared schema.
        dtypes = {f.name: f.dataType.simpleString() for f in self.schema.fields}
        inv = {p: l for l, p in partition.renames}
        part_vals: dict[str, object] = {}
        for seg in partition.path.split(os.sep)[:-1]:
            if "=" not in seg:
                continue
            name, _, raw = seg.partition("=")
            name = inv.get(name, name)  # hive dirs use physical names
            if name not in dtypes:
                continue
            val = urllib.parse.unquote(raw)
            t = dtypes[name]
            if val == "__HIVE_DEFAULT_PARTITION__":
                part_vals[name] = None
            elif t in ("tinyint", "smallint", "int", "bigint"):
                part_vals[name] = int(val)
            elif t in ("float", "double"):
                part_vals[name] = float(val)
            elif t == "boolean":
                part_vals[name] = val.lower() == "true"
            elif t == "date":
                import datetime as _dtmod

                part_vals[name] = _dtmod.date.fromisoformat(val)
            elif t == "timestamp":
                import datetime as _dtmod

                v = _dtmod.datetime.fromisoformat(val)
                part_vals[name] = (
                    v.replace(tzinfo=_dtmod.timezone.utc)
                    if v.tzinfo is None
                    else v
                )
            else:
                part_vals[name] = val

        table = read_table_compat(partition.path)
        cols = set(table.column_names)
        # column mapping: data files store physical names — read each
        # logical field from its physical column
        phys = dict(partition.renames)
        # Spark writes TIMESTAMP columns as INT96 by default, which
        # pyarrow surfaces as tz-NAIVE datetimes even though the stored
        # value is a UTC instant; the engine's arrow serializer then
        # refuses the naive value.  Re-attach UTC explicitly.
        import datetime as _dt

        ts_names = {
            f.name
            for f in self.schema.fields
            if f.dataType.simpleString() == "timestamp"
        }

        from pyspark.sql.types import (
            ArrayType,
            MapType,
            StructType,
            TimestampType,
            VariantType,
        )

        def _rebuild(dt, name: str, v):
            """Type-driven recursive rebuild of one pyarrow value into
            the declared Spark type: VariantType leaves turn their
            unshredded {value, metadata} binary pair (engine writes —
            _write_files disables shredding) back into a VariantVal at
            ANY nesting depth; INT96-naive timestamps re-attach UTC."""
            if v is None:
                return None
            if isinstance(dt, VariantType):
                # a shredded file carries typed_value subtrees instead;
                # rebuilding those would mean reimplementing the
                # shredding spec — refuse with the batch workaround
                if not isinstance(v, dict) or v.get("value") is None:
                    raise ValueError(
                        f"variant column {name!r} in "
                        f"{partition.path} is parquet-SHREDDED; the "
                        "streaming CDF reads unshredded variant only — "
                        "rewrite the file (OPTIMIZE) or consume in "
                        "batch via changes_between()"
                    )
                return VariantVal(bytes(v["value"]), bytes(v["metadata"]))
            if isinstance(dt, StructType):
                return {
                    f.name: _rebuild(f.dataType, name, v.get(f.name))
                    for f in dt.fields
                }
            if isinstance(dt, ArrayType):
                return [_rebuild(dt.elementType, name, e) for e in v]
            if isinstance(dt, MapType):
                items = v.items() if isinstance(v, dict) else v
                return {
                    k: _rebuild(dt.valueType, name, x) for k, x in items
                }
            if isinstance(dt, TimestampType) and (
                isinstance(v, _dt.datetime) and v.tzinfo is None
            ):
                return v.replace(tzinfo=_dt.timezone.utc)
            return v

        variant_types = {
            f.name: f.dataType
            for f in self.schema.fields
            if f.name in self.variant_fields
        }

        def _val(name: str, r: dict):
            if name == "_commit_version":
                return partition.version
            if name == "_commit_timestamp":
                return _dt.datetime.fromtimestamp(
                    0, tz=_dt.timezone.utc
                ) + _dt.timedelta(microseconds=partition.commit_ts_us)
            if name == "_change_type":
                # CDC sidecar files carry _change_type as a real column
                # (delete / update_preimage / update_postimage); plain
                # data files are appends, so their rows are inserts
                return r["_change_type"] if "_change_type" in cols else "insert"
            p = phys.get(name, name)
            v = r[p] if p in cols else part_vals.get(name)
            if name in self.variant_fields and v is not None:
                return _rebuild(variant_types[name], name, v)
            if (
                name in ts_names
                and isinstance(v, _dt.datetime)
                and v.tzinfo is None
            ):
                v = v.replace(tzinfo=_dt.timezone.utc)
            return v

        for batch in table.to_batches():
            for r in batch.to_pylist():
                yield tuple(_val(name, r) for name in self.field_names)

    def commit(self, end: dict) -> None:
        # offsets live in the engine checkpoint; nothing to release —
        # but the committed position is the rate limiter's floor
        if self._engine_floor is None or end["version"] > self._engine_floor:
            self._engine_floor = end["version"]


class TableChangesDataSource(DataSource):
    """``format("table_changes")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def schema(self) -> StructType:
        root = self.options["path"]
        latest = _versions(root)[-1]
        base = StructType.fromJson(json.loads(_manifest(root, latest)["schema"]))
        return StructType(
            list(base.fields)
            + [
                StructField("_change_type", StringType()),
                StructField("_commit_version", LongType()),
                StructField("_commit_timestamp", TimestampType()),
            ]
        )

    def streamReader(self, schema: StructType) -> TableChangesStreamReader:
        return TableChangesStreamReader(schema, dict(self.options))
