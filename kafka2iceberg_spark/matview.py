"""Incremental materialized-view maintenance from the changelog stream.

A downstream aggregate (per-conversation turn counts, char totals, ...)
recomputed from scratch every trigger is O(table) per micro-batch; at 100 TB
that is the whole job. Classic incremental view maintenance (delta
processing) makes it O(changes): each changelog event contributes a signed
delta (+ for insert, - for delete), deltas are pre-aggregated per group, and
the view table absorbs one small upsert per micro-batch.

The delete pre-image problem: a delete event affects the view only by what
the deleted row LOOKED LIKE, and equality-delete events carry neither the
measures (non-key columns are NULL) nor even a guarantee the row existed —
a MOR upsert pairs every insert with a same-version delete of its PK that
covers only OLDER sequences, so treating deletes as blind decrements would
cancel fresh inserts. The pre-image is therefore always recovered by time
travel: a delete at ``_commit_version v`` removes the row as it stood at
``v-1``, so the delete keys are semi-joined against
``source.read(version=v-1)`` (snapshot immutability makes this
deterministic under replay); a key absent there is a no-op. Versions are
processed in order within the batch — a micro-batch spans few commits.
Count-only views column-prune the pre-image read to the PK columns (at
100 TB, reading two key columns instead of the row is most of the win).

Exactly-once: the view is an IcebergLite table keyed on the group columns;
the per-batch merge commits through ``commit_upsert(batch_id)``, so a
replayed micro-batch is a no-op (same guard as the main sink). Groups whose
count reaches zero are emitted as CDC deletes — the view never retains
empty groups.

No counterpart in the reference (one-way MQ→Iceberg, no aggregation
surface); this is [NORTH] surface — Iceberg changelog scan + the standard
streaming-warehouse MV pattern, Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sink import IcebergLite
from .table_stream import CHANGE_TYPE_COL, COMMIT_VERSION_COL, table_stream


class IncrementalAggView:
    """Maintain ``SELECT group_by..., count(*), sum(expr)... FROM source
    GROUP BY group_by`` incrementally from the source's changelog.

    ``measures`` maps output column -> ("count", None) | ("sum", sql_expr);
    a ``("count", None)`` column is always maintainable; ``sum`` columns
    require pre-image recovery on deletes (see module docstring).
    ``group_by`` must be a subset of the source PK for delete events to
    carry the group key.
    """

    def __init__(
        self,
        source: IcebergLite,
        view: IcebergLite,
        group_by: list[str],
        measures: dict[str, tuple[str, str | None]],
    ) -> None:
        missing = [g for g in group_by if g not in source.pk]
        if missing:
            raise ValueError(
                f"group keys {missing} not in source pk {source.pk}: delete"
                " events would not carry them"
            )
        if sorted(view.pk) != sorted(group_by):
            raise ValueError(
                f"view pk {view.pk} must equal the group keys {group_by}"
            )
        for out, (agg, expr) in measures.items():
            if agg == "count" and expr is not None:
                raise ValueError(f"{out}: count takes no expression")
            if agg == "sum" and not expr:
                raise ValueError(f"{out}: sum needs an expression")
            if agg not in ("count", "sum"):
                raise ValueError(f"{out}: unsupported aggregate {agg!r}")
        self.source = source
        self.view = view
        self.group_by = list(group_by)
        self.measures = dict(measures)
        self._count_col = next(
            (o for o, (a, _) in measures.items() if a == "count"), None
        )
        if self._count_col is None:
            raise ValueError(
                "include a count measure: it arbitrates group liveness"
                " (a group leaves the view when its count reaches 0)"
            )

    @property
    def _needs_preimage(self) -> bool:
        return any(a == "sum" for a, _ in self.measures.values())

    # -- delta computation ---------------------------------------------------

    def _signed(self, rows: DataFrame, sign: int) -> DataFrame:
        """Per-group signed deltas of every measure for a slice of rows."""
        aggs = []
        for out, (agg, expr) in self.measures.items():
            if agg == "count":
                aggs.append(F.sum(F.lit(sign)).cast("long").alias(out))
            else:
                aggs.append(
                    (F.lit(sign) * F.sum(F.coalesce(F.expr(expr), F.lit(0))))
                    .cast("long")
                    .alias(out)
                )
        return rows.groupBy(*self.group_by).agg(*aggs)

    def _batch_deltas(self, events: DataFrame) -> DataFrame:
        inserts = events.where(F.col(CHANGE_TYPE_COL) == "insert")
        deletes = events.where(F.col(CHANGE_TYPE_COL) == "delete")
        parts = [self._signed(inserts, +1)]
        # time-travel pre-image recovery, one bounded read per source
        # version present in the batch (micro-batches span few commits);
        # count-only views prune the read to the PK columns
        versions = [
            r[0]
            for r in deletes.select(COMMIT_VERSION_COL).distinct().collect()
        ]
        spark = events.sparkSession
        for v in sorted(versions):
            keys = deletes.where(
                F.col(COMMIT_VERSION_COL) == v
            ).select(*self.source.pk)
            # pre-image = the commit's PARENT snapshot, not v-1: version
            # numbers are table-global across refs, so v-1 can be a staged
            # branch/transaction commit that main never saw
            snap_v = self.source.snapshot_at(int(v))
            parent = snap_v.get("parent_version", int(v) - 1)
            pre = self.source.read(spark, version=int(parent))
            if not self._needs_preimage:
                pre = pre.select(*self.source.pk)
            pre = pre.join(
                F.broadcast(keys), on=self.source.pk, how="left_semi"
            )
            parts.append(self._signed(pre, -1))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        sums = [
            F.sum(o).cast("long").alias(o) for o in self.measures
        ]
        return out.groupBy(*self.group_by).agg(*sums)

    # -- merge ---------------------------------------------------------------

    def apply_batch(self, events: DataFrame, batch_id: str) -> bool:
        """Fold one changelog micro-batch into the view table. Idempotent
        per batch_id. Use as ``foreachBatch(lambda df, bid:
        mv.apply_batch(df, str(bid)))``."""
        if str(batch_id) in self.view.committed_batches():
            return False  # replayed batch: deltas must not re-apply
        deltas = self._batch_deltas(events)
        deltas = deltas.where(
            ~all_zero([F.col(o) for o in self.measures])
        )
        spark = events.sparkSession
        try:
            current = self.view.read(spark).select(
                *self.group_by, *self.measures
            )
        except FileNotFoundError:
            current = None
        if current is not None:
            merged = deltas.alias("d").join(
                current.alias("c"), on=self.group_by, how="left"
            )
            cols = [F.col(f"d.{g}").alias(g) for g in self.group_by] + [
                (
                    F.coalesce(F.col(f"c.{o}"), F.lit(0))
                    + F.col(f"d.{o}")
                ).cast("long").alias(o)
                for o in self.measures
            ]
            merged = merged.select(*cols)
        else:
            merged = deltas
        merged = merged.withColumn(
            "is_cdc_delete", F.col(self._count_col) <= 0
        )
        return self.view.commit_upsert(merged, str(batch_id))

    # -- wiring ----------------------------------------------------------------

    def start(self, spark: SparkSession, checkpoint: str, **trigger):
        """Open the source changelog stream and maintain the view until the
        trigger completes (default ``availableNow``)."""
        if not trigger:
            trigger = {"availableNow": True}
        # starting_version=0: the view's defining query covers the table's
        # whole history; the checkpoint, not the default head offset,
        # governs where a resumed run picks up
        stream = table_stream(
            spark, self.source.location, starting_version=0, changelog=True
        )
        return (
            stream.writeStream.foreachBatch(
                lambda df, bid: self.apply_batch(df, str(bid))
            )
            .option("checkpointLocation", checkpoint)
            .trigger(**trigger)
            .start()
        )

    def recompute(self, spark: SparkSession) -> DataFrame:
        """The view's defining query, from scratch — the parity oracle."""
        aggs = []
        for out, (agg, expr) in self.measures.items():
            if agg == "count":
                aggs.append(F.count(F.lit(1)).cast("long").alias(out))
            else:
                aggs.append(
                    F.sum(F.coalesce(F.expr(expr), F.lit(0)))
                    .cast("long")
                    .alias(out)
                )
        return self.source.read(spark).groupBy(*self.group_by).agg(*aggs)


def all_zero(cols) -> F.Column:
    out = F.lit(True)
    for c in cols:
        out = out & (c == 0)
    return out


class IncrementalJoinView:
    """Maintain ``SELECT key..., left_cols..., right_cols... FROM left JOIN
    right USING (key...)`` incrementally from per-batch insert deltas of two
    APPEND-ONLY sources (the fact-joins-fact case: orders x lineitem, turns
    x annotations).

    Recomputing a fact-to-fact join every trigger is O(|L| + |R|) per
    micro-batch — at 100 TB it is the whole job, every few seconds. The
    classic delta rule makes it O(changes)::

        dV  =  dL >< R_pre  UNION  L_pre >< dR  UNION  dL >< dR

    where ``pre`` is the committed state BEFORE the batch, so every matching
    (l, r) pair is produced exactly once: whichever row arrives later finds
    the earlier one committed, and same-batch pairs come from the dL >< dR
    term. The view only ever ABSORBS appends — insert-only sources cannot
    retract a previous match (updating/deleting sources are the
    ``IncrementalAggView`` + MOR-upsert territory, not this operator).

    Scale shape: the per-batch deltas are small and broadcast; the big
    committed side is probed with one broadcast-hash join per term — the
    100 TB table is scanned with the join key pushed down and never
    shuffled, and nothing is ever recomputed. An optional ``filter`` is
    applied to each delta BEFORE the join (standard IVM predicate
    pushdown through the view definition).

    Exactly-once across THREE tables: both source appends and the view
    append for one micro-batch publish through a single
    ``MultiTableTransaction`` catalog CAS — a crash between writes leaves
    only invisible staged branches, and a replayed batch_id is a committed
    no-op. The sources-of-record the deltas are appended to are the same
    tables the ``pre`` snapshots are read from (catalog-pinned versions),
    so the delta boundary is exact under any interleaving.

    No counterpart in the reference (one-way MQ->Iceberg, no join surface;
    SURVEY.md §2.1); this is [NORTH] streaming-warehouse surface — the
    Iceberg-changelog incremental-view-maintenance pattern, Spark-first.
    """

    def __init__(
        self,
        catalog,
        left: str,
        right: str,
        view: str,
        on: list[str],
        left_cols: list[str],
        right_cols: list[str],
        filter_left: str | None = None,
        filter_right: str | None = None,
    ) -> None:
        if not on:
            raise ValueError("join needs at least one key column")
        overlap = set(left_cols) & set(right_cols)
        if overlap:
            raise ValueError(f"output columns collide across sides: {overlap}")
        for side, cols in (("left", left_cols), ("right", right_cols)):
            dup = set(cols) & set(on)
            if dup:
                raise ValueError(f"{side}_cols repeat join keys: {dup}")
        self.catalog = catalog
        self.left = left
        self.right = right
        self.view = view
        self.on = list(on)
        self.left_cols = list(left_cols)
        self.right_cols = list(right_cols)
        self.filter_left = filter_left
        self.filter_right = filter_right

    # -- delta computation ----------------------------------------------------

    def _prep(self, df: DataFrame, cols: list[str], flt: str | None) -> DataFrame:
        if flt:
            df = df.where(F.expr(flt))
        return df.select(*self.on, *cols)

    def _pre(self, spark: SparkSession, name: str) -> DataFrame | None:
        """Committed catalog-pinned snapshot, or None before first data."""
        try:
            return self.catalog.read(spark, name)
        except FileNotFoundError:
            return None

    def _delta_view(
        self,
        spark: SparkSession,
        dl: DataFrame,
        dr: DataFrame,
    ) -> DataFrame:
        out_cols = [*self.on, *self.left_cols, *self.right_cols]
        dl = self._prep(dl, self.left_cols, self.filter_left)
        dr = self._prep(dr, self.right_cols, self.filter_right)
        l_pre = self._pre(spark, self.left)
        r_pre = self._pre(spark, self.right)
        parts = [F.broadcast(dl).join(dr, self.on).select(*out_cols)]
        if r_pre is not None:
            # delta side broadcast: the committed 100 TB side is probed in
            # place, never shuffled
            r_pre = self._prep(r_pre, self.right_cols, self.filter_right)
            parts.append(r_pre.join(F.broadcast(dl), self.on).select(*out_cols))
        if l_pre is not None:
            l_pre = self._prep(l_pre, self.left_cols, self.filter_left)
            parts.append(l_pre.join(F.broadcast(dr), self.on).select(*out_cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- merge ------------------------------------------------------------------

    def apply_batch(self, dl: DataFrame, dr: DataFrame, batch_id: str) -> bool:
        """Fold one micro-batch of per-side insert deltas into the sources
        AND the view, atomically. Idempotent per batch_id."""
        txn_id = f"jv:{self.view}:{batch_id}"
        if txn_id in self.catalog.committed_txns():
            return False
        spark = dl.sparkSession
        delta = self._delta_view(spark, dl, dr)
        txn = self.catalog.transaction(txn_id)
        txn.append(self.left, dl)
        txn.append(self.right, dr)
        txn.append(self.view, delta)
        return txn.commit()

    # -- wiring -------------------------------------------------------------------

    def start(
        self,
        stream: DataFrame,
        split,
        checkpoint: str,
        **trigger,
    ):
        """Maintain the view from ONE tagged stream (the multi-table broker
        shape: both sides ride the same source; ``split(df) -> (dl, dr)``
        routes rows). Two independent streaming queries could not share a
        transaction — one stream, split per batch, keeps the three-table
        commit atomic."""
        if not trigger:
            trigger = {"availableNow": True}

        def _one(df: DataFrame, bid) -> None:
            dl, dr = split(df)
            self.apply_batch(dl, dr, str(bid))

        return (
            stream.writeStream.foreachBatch(_one)
            .option("checkpointLocation", checkpoint)
            .trigger(**trigger)
            .start()
        )

    def recompute(self, spark: SparkSession) -> DataFrame:
        """The view's defining query, from scratch — the parity oracle."""
        l = self._prep(
            self.catalog.read(spark, self.left), self.left_cols, self.filter_left
        )
        r = self._prep(
            self.catalog.read(spark, self.right), self.right_cols, self.filter_right
        )
        return l.join(r, self.on).select(
            *self.on, *self.left_cols, *self.right_cols
        )

    def read(self, spark: SparkSession) -> DataFrame:
        """The maintained view, at the catalog's pinned version."""
        return self.catalog.read(spark, self.view).select(
            *self.on, *self.left_cols, *self.right_cols
        )
