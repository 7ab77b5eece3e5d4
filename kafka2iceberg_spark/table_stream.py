"""IcebergLite table-as-stream: a Spark 4 Python streaming data source.

Consume a committed table INCREMENTALLY as a Structured Streaming source —
Iceberg's incremental append scan as a first-class ``readStream`` format.
This is what lets pipelines CHAIN without a broker in the middle: the
ingest job commits micro-batches to a table, and any number of downstream
jobs (sessionization, CEP, enrichment) stream from the table with their
own checkpoints, each resuming exactly where it left off.

Scale/semantics notes:
- Offsets are snapshot VERSIONS (json ``{"version": N}``), checkpointed by
  Spark; the snapshot chain is immutable, so a (start, end] range always
  resolves to the same file set — deterministic replay, exactly-once when
  paired with an idempotent sink.
- One input partition per added data file: read parallelism tracks the
  producer's file layout; executors read parquet via pyarrow and emit
  Arrow record batches (vectorized end to end, zero per-row Python).
- Rows are conformed to the table schema AS OF the range end (add-column
  null-fill + integer/float widening), matching the batch incremental
  read's evolution semantics.
- Append-scan semantics, like Iceberg's incremental read: compaction /
  materialize snapshots are skipped (their files are rewrites of
  already-consumed rows). MOR upsert commits stream exactly (their data
  files ARE the batch's rows); CoW upsert commits are REFUSED with a
  clear error (their files rewrite already-streamed rows — Iceberg's
  streaming read refuses overwrite snapshots for the same reason).
  Equality-DELETE events do not stream (append scan) — a consumer
  needing full CDC semantics reads the delete files alongside.
- Snapshot expiration must retain at least the consumer's lag (same
  operational rule as Iceberg streaming reads).

No counterpart in the reference (its Flink job is MQ→Iceberg one-way,
Kafka2IcebergApp.java:62-113); this closes the loop Spark-side.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .sink import IcebergLite

FORMAT_NAME = "iceberglite"


#: Changelog metadata columns (Iceberg changelog-scan analogue).
CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"


class _FilesPartition(InputPartition):
    def __init__(
        self,
        path: str,
        schema_json: str,
        change_type: str | None = None,
        version: int | None = None,
    ) -> None:
        self.path = path
        self.schema_json = schema_json
        self.change_type = change_type  # None = plain append scan
        self.version = version


def _arrow_schema(spark_schema: T.StructType):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


def _conform_arrow_table(table, target):
    """Null-fill missing columns and cast (widening) to the target arrow
    schema — executor-side twin of IcebergLite._conform."""
    import pyarrow as pa

    cols = []
    for fld in target:
        if fld.name in table.column_names:
            cols.append(table.column(fld.name).cast(fld.type))
        else:
            cols.append(pa.nulls(len(table), type=fld.type))
    return pa.Table.from_arrays(cols, schema=target)


class _TableStreamReader(DataSourceStreamReader):
    def __init__(self, location: str, schema: T.StructType,
                 starting_version: int | None,
                 changelog: bool = False) -> None:
        self._table = IcebergLite(location, pk=[])
        self._schema = schema
        self._start = starting_version
        self._changelog = changelog

    def initialOffset(self) -> dict:
        if self._start is not None:
            return {"version": int(self._start)}
        # default "latest": stream only commits made after the query starts
        v = self._head()
        return {"version": int(v if v is not None else 0)}

    def latestOffset(self) -> dict:
        v = self._head()
        return {"version": int(v if v is not None else 0)}

    def _head(self) -> int | None:
        """MAIN's head, not the metadata head: commits staged on a WAP/audit
        branch must not stream to consumers until they are fast-forwarded
        onto main."""
        if self._table.current_version() is None:
            return None
        return self._table.head_version("main")

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        if hi <= lo:
            return []
        # CoW MERGE rewrites whole partitions, so its "added files" hold
        # already-delivered rows — an append scan over them double-counts.
        # Refuse loudly, like Iceberg's streaming read refuses overwrite
        # snapshots. Append and MOR commits are true row-adds and stream
        # exactly. (Snapshots older than commit-kind tagging pass through —
        # legacy tables keep the plain append-scan behavior.)
        for v in self._table.lineage_versions(lo, hi):
            s = self._table.snapshot_at(v)
            if s.get("commit_kind") in (
                "upsert-cow", "overwrite", "overwrite-dynamic",
                "delete", "update",
            ):
                raise ValueError(
                    f"snapshot v{v} is a {s['commit_kind']} commit: its "
                    "files rewrite/restate already-streamed rows. Stream "
                    "from tables written with strategy='mor' (or append "
                    "tables), or consume this table in batch."
                )
        # schema AS OF the range end — evolution lands atomically with the
        # batch that introduced it
        snap = self._table.snapshot_at(hi)
        schema = self._table.table_schema(snap) or self._schema
        schema = T.StructType(
            [f for f in schema.fields
             if f.name not in (CHANGE_TYPE_COL, COMMIT_VERSION_COL)]
        )
        sj = json.dumps(schema.jsonValue())
        if not self._changelog:
            return [
                _FilesPartition(p, sj)
                for p in self._table.added_files_between(lo, hi)
            ]
        parts = [
            _FilesPartition(p, sj, "insert", v)
            for p, v in self._table.added_files_with_versions(lo, hi)
        ]
        parts += [
            _FilesPartition(p, sj, "delete", v)
            for p, v in self._table.added_delete_files_with_versions(lo, hi)
        ]
        return parts

    def read(self, partition: _FilesPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = _arrow_schema(
            T.StructType.fromJson(json.loads(partition.schema_json))
        )
        pf = pq.ParquetFile(partition.path)
        want = [n for n in target.names if n in pf.schema_arrow.names]
        for batch in pf.iter_batches(columns=want):
            # equality-delete files hold only PK columns; the conform step
            # null-fills the rest — a changelog DELETE event is the key
            out = _conform_arrow_table(pa.Table.from_batches([batch]), target)
            if partition.change_type is not None:
                n = len(out)
                out = out.append_column(
                    CHANGE_TYPE_COL,
                    pa.array([partition.change_type] * n, pa.string()),
                ).append_column(
                    COMMIT_VERSION_COL,
                    pa.array([partition.version] * n, pa.int64()),
                )
            yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass  # progress lives in Spark's offset checkpoint


class IcebergLiteDataSource(DataSource):
    """``spark.read[Stream].format("iceberglite").option("location", ...)``.

    Streaming options:
      location          table root (required)
      startingVersion   first snapshot version already CONSUMED (exclusive
                        lower bound); 0 replays the table from creation.
                        Default: the current version at stream start
                        ("latest", like Kafka's default).
      changelog         "true" → CDC events (_change_type/_commit_version)

    Batch options (plain ``spark.read`` — see :class:`_TableBatchReader`
    for the pushdown/file-skipping and MOR-reconciliation contract):
      location          table root (required)
      version           time travel to a snapshot version
      branch            read a named branch/tag head (exclusive w/ version)
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _location(self) -> str:
        loc = self.options.get("location") or self.options.get("path")
        if not loc:
            raise ValueError("iceberglite source requires option 'location'")
        return loc

    def _changelog(self) -> bool:
        return str(self.options.get("changelog", "false")).lower() == "true"

    def _batch_snapshot_args(self) -> tuple[int | None, str | None]:
        v = self.options.get("version")
        return (int(v) if v is not None else None, self.options.get("branch"))

    def schema(self) -> T.StructType:
        t = IcebergLite(self._location(), pk=[])
        version, branch = self._batch_snapshot_args()
        if version is not None:
            schema = t.table_schema(t.snapshot_at(version))
        elif branch is not None:
            schema = t.table_schema(t.head_snapshot(branch))
        else:
            schema = t.table_schema()
        if schema is None:
            hint = os.path.join(self._location(), "_schema.json")
            if not os.path.exists(hint):
                raise ValueError(
                    f"table at {self._location()} has no committed schema yet"
                )
            with open(hint) as fh:
                schema = T.StructType.fromJson(json.load(fh))
        if self._changelog():
            schema = T.StructType(
                list(schema.fields)
                + [
                    T.StructField(CHANGE_TYPE_COL, T.StringType(), False),
                    T.StructField(COMMIT_VERSION_COL, T.LongType(), False),
                ]
            )
        return schema

    def streamReader(self, schema: T.StructType) -> _TableStreamReader:
        sv = self.options.get("startingversion")
        return _TableStreamReader(
            self._location(),
            schema,
            int(sv) if sv is not None else None,
            changelog=self._changelog(),
        )

    def reader(self, schema: T.StructType) -> "_TableBatchReader":
        version, branch = self._batch_snapshot_args()
        if self._changelog():
            # the batch reader scans snapshots, not per-commit events; a
            # silent fallthrough would emit rows missing the two changelog
            # columns the declared schema promises (runtime mismatch)
            raise ValueError(
                "changelog reads are streaming-only: use "
                "table_stream(spark, location, starting_version=0, "
                "changelog=True) and drain with trigger(availableNow=True)"
            )
        if version is not None and branch is not None:
            raise ValueError("pass version OR branch, not both")
        cls = _TableBatchReader
        active = SparkSession.getActiveSession()
        if active is not None and str(
            active.conf.get(
                "spark.sql.python.filterPushdown.enabled", "false"
            )
        ).lower() == "true":
            cls = _TableBatchReaderPushdown
        return cls(self._location(), schema, version, branch)


_SEQ_RE_PY = r"/s(\d{8})-"

#: Driver-side cap on the outstanding equality-delete set shipped to read
#: tasks. MOR delete files are small by design (maintenance folds them in);
#: a table that blows past this needs materialize_deletes()/compact() — or
#: the join-based IcebergLite.read — not a bigger broadcast.
MAX_INLINE_DELETE_ROWS = 200_000


def _path_seq(path: str) -> int:
    import re

    m = re.search(_SEQ_RE_PY, path)
    return int(m.group(1)) if m else -1


class _BatchFilesPartition(InputPartition):
    def __init__(
        self,
        path: str,
        schema_json: str,
        pk_names: tuple[str, ...] | None,
        drop_keys: frozenset | None,
    ) -> None:
        self.path = path
        self.schema_json = schema_json
        self.pk_names = pk_names
        self.drop_keys = drop_keys  # equality-delete keys newer than this file


class _TableBatchReader(DataSourceReader):
    """Batch read path: ``spark.read.format("iceberglite")``.

    What the streaming source is to readStream, this is to plain SQL —
    any committed snapshot (head, ``version`` time travel, or a named
    ``branch``/tag) queryable with one partition per data file and
    executor-side Arrow decode, zero per-row Python.

    Two planning features ride the manifest metadata:

    * **Filter pushdown → file skipping** (``pushFilters``): comparison
      filters on top-level columns tighten per-column scan bounds; every
      data file whose stats range cannot intersect them is never opened.
      ALL filters are returned to Spark for post-scan re-application —
      pruning is a pure file-count optimization, so a partially-pushable
      predicate can never change results.
    * **MOR reconciliation without a join**: outstanding equality-delete
      keys are loaded driver-side (delete files are small by design,
      capped at MAX_INLINE_DELETE_ROWS) and each read task drops
      superseded rows of files OLDER than the delete's sequence — the
      Iceberg v2 read contract, delivered as a per-batch Arrow mask.
    """

    def __init__(
        self,
        location: str,
        schema: T.StructType,
        version: int | None,
        branch: str | None,
    ) -> None:
        self._table = IcebergLite(location, pk=[])
        self._schema = schema
        self._version = version
        self._branch = branch
        self._bounds: dict[str, list] = {}  # col -> [lo, hi] (raw values)

    def _merge_bound(self, col: str, lo=None, hi=None) -> None:
        norm = IcebergLite._norm_stat_value
        cur = self._bounds.setdefault(col, [None, None])
        try:
            if lo is not None and (
                cur[0] is None or norm(lo) > norm(cur[0])
            ):
                cur[0] = lo
            if hi is not None and (
                cur[1] is None or norm(hi) < norm(cur[1])
            ):
                cur[1] = hi
        except TypeError:
            pass  # incomparable: leave the existing bound

    def _snapshot(self) -> dict:
        if self._version is not None:
            return self._table.snapshot_at(self._version)
        if self._branch is not None:
            return self._table.head_snapshot(self._branch)
        return self._table.current_snapshot()

    def _delete_sets(self, snap: dict) -> list[tuple[int, tuple, frozenset]]:
        """[(delete_seq, pk_names, key rows)] from the outstanding delete
        files — driver-side metadata+small-data read, capped."""
        import pyarrow.parquet as pq

        out = []
        total = 0
        for ref in snap.get("delete_manifests") or []:
            for f in self._table._load_manifest(ref):
                tbl = pq.read_table(f["path"])
                total += len(tbl)
                if total > MAX_INLINE_DELETE_ROWS:
                    raise ValueError(
                        "outstanding equality-delete set exceeds "
                        f"{MAX_INLINE_DELETE_ROWS} rows; run "
                        "materialize_deletes()/compact() on the table or "
                        "read it via IcebergLite.read (join-based MOR)"
                    )
                names = tuple(tbl.column_names)
                keys = frozenset(
                    zip(*[tbl.column(n).to_pylist() for n in names])
                )
                out.append((_path_seq(f["path"]), names, keys))
        return out

    def partitions(self) -> list[InputPartition]:
        snap = self._snapshot()
        schema = self._table.table_schema(snap) or self._schema
        schema_json = json.dumps(schema.jsonValue())
        deletes = self._delete_sets(snap)
        norm = IcebergLite._norm_stat_value
        # the applicable delete set depends ONLY on the file's sequence
        # number, and distinct sequences are O(commits), not O(files):
        # memoize the suffix unions so planning is O(seqs × delete_rows)
        # instead of O(files × delete_rows), and every same-seq partition
        # shares one frozenset object on the driver
        seq_drop: dict[int, tuple] = {}

        def _drop_for(file_seq: int) -> tuple:
            if file_seq not in seq_drop:
                drop: set = set()
                names: tuple | None = None
                for dseq, nm, keys in deletes:
                    if dseq > file_seq:
                        names = nm
                        drop |= keys
                seq_drop[file_seq] = (
                    names, frozenset(drop) if drop else None
                )
            return seq_drop[file_seq]

        parts: list[InputPartition] = []
        for files in self._table.resolve_manifests(snap).values():
            for f in files:
                skip = False
                for col, (lo, hi) in self._bounds.items():
                    rng = (f.get("stats") or {}).get(col)
                    if rng is None:
                        continue
                    mn, mx = rng
                    try:
                        if lo is not None and mx < norm(lo):
                            skip = True
                        if hi is not None and mn > norm(hi):
                            skip = True
                    except TypeError:
                        continue
                    if skip:
                        break
                if skip:
                    continue
                pk_names, drop_keys = _drop_for(_path_seq(f["path"]))
                parts.append(
                    _BatchFilesPartition(
                        f["path"], schema_json, pk_names, drop_keys
                    )
                )
        return parts

    def read(self, partition: _BatchFilesPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        target = _arrow_schema(
            T.StructType.fromJson(json.loads(partition.schema_json))
        )
        pf = pq.ParquetFile(partition.path)
        want = [n for n in target.names if n in pf.schema_arrow.names]
        for batch in pf.iter_batches(columns=want):
            out = _conform_arrow_table(pa.Table.from_batches([batch]), target)
            if partition.drop_keys:
                cols = [
                    out.column(n).to_pylist() for n in partition.pk_names
                ]
                mask = pa.array(
                    [k not in partition.drop_keys for k in zip(*cols)],
                    pa.bool_(),
                )
                out = out.filter(mask)
            yield from out.to_batches()


class _TableBatchReaderPushdown(_TableBatchReader):
    """The pushdown-capable variant. Spark refuses ANY reader that
    implements ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` is false, so the method
    lives on this subclass and ``IcebergLiteDataSource.reader()`` picks
    the class from the active session's conf — pushdown kicks in the
    moment the user enables it, plain reads never break without it."""

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            value = getattr(f, "value", None)
            if (
                not isinstance(attr, tuple)
                or len(attr) != 1
                or value is None
            ):
                continue
            col = attr[0]
            # strict bounds used inclusively: a superset of files — safe
            if isinstance(f, EqualTo):
                self._merge_bound(col, lo=value, hi=value)
            elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                self._merge_bound(col, lo=value)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                self._merge_bound(col, hi=value)
        return filters  # Spark re-applies everything post-scan


def table_batch(
    spark: SparkSession,
    location: str,
    version: int | None = None,
    branch: str | None = None,
) -> DataFrame:
    """Convenience: register the source (idempotent) and open a batch read
    (``spark.read.format("iceberglite")``) — head snapshot by default,
    ``version`` for time travel, ``branch`` for a named ref. Enable
    ``spark.sql.python.filterPushdown.enabled`` to get manifest-stats file
    skipping for pushable predicates."""
    spark.dataSource.register(IcebergLiteDataSource)
    reader = spark.read.format(FORMAT_NAME).option("location", location)
    if version is not None:
        reader = reader.option("version", str(version))
    if branch is not None:
        reader = reader.option("branch", branch)
    return reader.load()


def table_stream(
    spark: SparkSession,
    location: str,
    starting_version: int | None = None,
    changelog: bool = False,
) -> DataFrame:
    """Convenience: register the source (idempotent) and open the stream.

    ``changelog=True`` emits CDC events instead of a plain append scan
    (Iceberg changelog-scan analogue): every row carries ``_change_type``
    ('insert' | 'delete') and ``_commit_version``; DELETE events are the
    equality-delete keys with non-key columns NULL. A MOR upsert appears
    as delete+insert of the same PK at the same version — the standard
    upsert changelog encoding."""
    spark.dataSource.register(IcebergLiteDataSource)
    reader = spark.readStream.format(FORMAT_NAME).option("location", location)
    if starting_version is not None:
        reader = reader.option("startingVersion", str(starting_version))
    if changelog:
        reader = reader.option("changelog", "true")
    return reader.load()


def apply_changelog(
    batch_df: DataFrame, table: IcebergLite, batch_id: str
) -> bool:
    """Fold a changelog micro-batch into a downstream replica table.

    Per PK keep the newest event — ordered by ``_commit_version``, insert
    beating delete WITHIN a version (a MOR upsert's delete only covers
    OLDER sequences, so its same-version insert survives) — then commit it
    as an upsert with deletes mapped to ``is_cdc_delete``. Chaining
    ``table_stream(..., changelog=True)`` through this in a foreachBatch
    makes the replica converge to the source table exactly, including CDC
    deletes."""
    pk = table.pk
    w = Window.partitionBy(*pk).orderBy(
        F.col(COMMIT_VERSION_COL).desc(),
        (F.col(CHANGE_TYPE_COL) == "insert").desc(),
    )
    latest = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .withColumn(
            "is_cdc_delete", F.col(CHANGE_TYPE_COL) == F.lit("delete")
        )
        .drop("_rn", CHANGE_TYPE_COL, COMMIT_VERSION_COL)
    )
    return table.commit_upsert(latest, batch_id)
