"""Multi-table atomic transactions over IcebergLite tables.

Iceberg itself scopes a commit to one table; cross-table atomicity is a
*catalog* feature (the REST catalog spec's multi-table ``CommitTransaction``:
all table updates land in a single catalog commit or none do).  This module
rebuilds that shape on the same optimistic-concurrency substrate the tables
already use:

  * ``CatalogLite`` — a catalog whose metadata is a chain of immutable
    ``catalog-v{N}.json`` files claimed with ``os.link`` (create-if-absent
    CAS, identical to ``IcebergLite._write_snapshot``).  Each catalog
    snapshot pins every registered table to an exact table version, so a
    read *through the catalog* is transaction-consistent across tables by
    construction.
  * ``MultiTableTransaction`` — stages each table's writes on a private
    ``txn-<id>`` branch (the WAP substrate: staged snapshots are durable but
    invisible — no ref a reader follows, no catalog pin).  ``commit()`` is
    ONE catalog CAS that re-pins all staged tables to their branch heads;
    the per-table ``fast_forward`` + branch cleanup that follows is cosmetic
    (direct-table readers converge) — the catalog is already the source of
    truth the moment the CAS lands.

Failure matrix:
  * crash before commit()   → staged branches linger, no catalog pin ever
                              points at them; ``abort()``/GC drops them.
  * crash inside commit()   → the catalog CAS either happened (txn durable,
                              restart's replay guard sees txn_id) or didn't
                              (invisible); there is no partial state.
  * concurrent transactions → staging serializes per table on the table's
                              own version CAS; the catalog CAS rejects a
                              pin built on a stale base (CommitConflict),
                              and commit() retries only when the loser's
                              tables are disjoint from the winner's.
  * replayed micro-batch    → txn ids are recorded in the catalog snapshot;
                              a committed txn_id short-circuits to False
                              (exactly-once, same contract as the sink's
                              batch-id guard).

At 100 TB none of this touches data: staging writes the same files a direct
commit would, and the transaction itself is two metadata files.

Reference scope: the reference commits exactly one Iceberg table per job
(Kafka2IcebergApp.java:86-113); multi-table atomicity is [NORTH] surface for
the fan-out case (turns + sessions + lineage landing together).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from .sink import CommitConflict, IcebergLite


class TxnState(RuntimeError):
    """Transaction used after commit()/abort()."""


class CatalogLite:
    """File-based multi-table catalog with atomic multi-pin commits."""

    def __init__(self, location: str) -> None:
        self.location = location
        self.meta_dir = os.path.join(location, "catalog")

    # -- protocol (same CAS discipline as IcebergLite) ---------------------

    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, "catalog-hint.text")

    def _snap_path(self, v: int) -> str:
        return os.path.join(self.meta_dir, f"catalog-v{v}.json")

    def create(self) -> None:
        os.makedirs(self.meta_dir, exist_ok=True)
        if self.current_version() is None:
            try:
                self._write_catalog(
                    {"version": 0, "txn_id": None, "pins": {}, "txns": []}
                )
            except CommitConflict:
                pass  # racing creator wrote the identical empty v0

    def current_version(self) -> int | None:
        try:
            with open(self._hint_path()) as fh:
                v = int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            try:
                versions = [
                    int(f[len("catalog-v") : -5])
                    for f in os.listdir(self.meta_dir)
                    if f.startswith("catalog-v") and f.endswith(".json")
                ]
            except FileNotFoundError:
                return None
            if not versions:
                return None
            v = max(versions)
        while os.path.exists(self._snap_path(v + 1)):
            v += 1
        return v

    def head(self) -> dict:
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"no catalog at {self.location}")
        with open(self._snap_path(v)) as fh:
            return json.load(fh)

    def _write_catalog(self, snap: dict) -> None:
        path = self._snap_path(snap["version"])
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(snap, fh)
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise CommitConflict(
                f"catalog version {snap['version']} was committed"
                " concurrently; refresh and retry"
            ) from None
        finally:
            os.unlink(tmp)
        htmp = self._hint_path() + f".tmp-{uuid.uuid4().hex}"
        with open(htmp, "w") as fh:
            fh.write(str(snap["version"]))
        os.rename(htmp, self._hint_path())

    # -- table registry -----------------------------------------------------

    def register(self, name: str, table: IcebergLite) -> None:
        """Pin ``table``'s current main head under ``name`` (single-table
        catalog commit; retries the CAS on a racing register)."""
        self.create()
        table.create()
        while True:
            head = self.head()
            pins = dict(head["pins"])
            pins[name] = {
                "location": table.location,
                "pk": table.pk,
                "partition_field": table.partition_field,
                "version": table.head_version("main"),
            }
            try:
                self._write_catalog(
                    {
                        "version": head["version"] + 1,
                        "txn_id": None,
                        "pins": pins,
                        "txns": head["txns"],
                    }
                )
                return
            except CommitConflict:
                continue

    def table(self, name: str) -> IcebergLite:
        pin = self.head()["pins"][name]
        return IcebergLite(
            pin["location"], pk=pin["pk"], partition_field=pin["partition_field"]
        )

    def pinned_version(self, name: str) -> int:
        return self.head()["pins"][name]["version"]

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """Transaction-consistent read: the table AT ITS PINNED VERSION.

        Two ``read`` calls against the same catalog head see the same
        transaction boundary on every table — direct ``table.read()`` may
        run ahead of it (a staged-but-unpublished or post-txn commit)."""
        pin = self.head()["pins"][name]
        return self.table(name).read(spark, version=pin["version"])

    def committed_txns(self) -> set[str]:
        return set(self.head()["txns"])

    def transaction(self, txn_id: str | None = None) -> "MultiTableTransaction":
        self.create()
        return MultiTableTransaction(self, txn_id or uuid.uuid4().hex)


class MultiTableTransaction:
    """Stage writes on per-table txn branches; commit with one catalog CAS."""

    def __init__(self, catalog: CatalogLite, txn_id: str) -> None:
        self.catalog = catalog
        self.txn_id = str(txn_id)
        self.branch = f"txn-{self.txn_id}"
        self._staged: dict[str, tuple[IcebergLite, int]] = {}  # name -> (tbl, base)
        self._seq = 0
        self._done = False

    # -- staging ------------------------------------------------------------

    def _stage_table(self, name: str) -> IcebergLite:
        if self._done:
            raise TxnState(f"transaction {self.txn_id} already finished")
        if name in self._staged:
            return self._staged[name][0]
        tbl = self.catalog.table(name)
        base = self.catalog.pinned_version(name)
        existing = tbl.refs().get(self.branch)
        if existing is not None and existing.get("type") == "branch":
            # a crashed earlier attempt of THIS txn left its staged branch
            # behind. The table-global replay guard makes the re-staged
            # writes no-ops (their deterministic batch ids already exist in
            # abandoned snapshots), so RESETTING the branch to base would
            # commit the transaction with no data. Resume the branch
            # instead — replayed writes dedup against it and the head keeps
            # the staged content — but only while it still descends from
            # the catalog pin; a moved pin means another txn won, and this
            # id's batch ids are burned: the caller must restage under a
            # NEW txn id.
            if tbl.is_ancestor(base, existing["version"]):
                self._staged[name] = (tbl, base)
                return tbl
            raise CommitConflict(
                f"table {name!r} was re-pinned while txn {self.txn_id}"
                f" had a staged branch at v{existing['version']}; abort"
                " and restage under a fresh txn id"
            )
        # fork the staging branch at the PINNED version: the transaction
        # reads-and-writes the catalog's view, not whatever raced onto main
        tbl.create_branch(self.branch, version=base)
        self._staged[name] = (tbl, base)
        return tbl

    def _batch_id(self, name: str) -> str:
        self._seq += 1
        return f"txn:{self.txn_id}:{name}:{self._seq}"

    def append(self, name: str, df: DataFrame) -> None:
        tbl = self._stage_table(name)
        tbl.commit_append(df, self._batch_id(name), branch=self.branch)

    def upsert(self, name: str, df: DataFrame, strategy: str = "cow") -> None:
        tbl = self._stage_table(name)
        tbl.commit_upsert(
            df, self._batch_id(name), strategy=strategy, branch=self.branch
        )

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """Read-your-own-writes inside the transaction."""
        if name in self._staged:
            return self._staged[name][0].read(spark, branch=self.branch)
        return self.catalog.read(spark, name)

    # -- outcome ------------------------------------------------------------

    def commit(self) -> bool:
        """Atomically publish every staged table. Returns False iff this
        txn_id already committed (micro-batch replay). Raises
        ``CommitConflict`` if another transaction re-pinned one of OUR
        tables since we forked (write-write conflict: the staged branches
        no longer descend from the catalog's view)."""
        if self._done:
            raise TxnState(f"transaction {self.txn_id} already finished")
        while True:
            head = self.catalog.head()
            if self.txn_id in head["txns"]:
                self._cleanup()
                self._done = True
                return False
            pins = dict(head["pins"])
            for name, (tbl, base) in self._staged.items():
                if pins[name]["version"] != base:
                    raise CommitConflict(
                        f"table {name!r} was re-pinned to"
                        f" v{pins[name]['version']} (txn {self.txn_id}"
                        f" staged from v{base}); restage and retry"
                    )
                pins[name] = {
                    **pins[name],
                    "version": tbl.head_version(self.branch),
                }
            try:
                self._write_commit(head, pins)
                break
            except CommitConflict:
                # another txn advanced the catalog; loop re-reads the head —
                # disjoint-table txns merge cleanly, overlapping ones raise
                # in the pin check above
                continue
        self._publish()
        self._done = True
        return True

    def _write_commit(self, head: dict, pins: dict) -> None:
        self.catalog._write_catalog(
            {
                "version": head["version"] + 1,
                "txn_id": self.txn_id,
                "pins": pins,
                "txns": head["txns"] + [self.txn_id],
            }
        )

    def _publish(self) -> None:
        """Cosmetic convergence: move each table's main to the staged head
        and drop the txn branch. Best-effort — the catalog pin is already
        the durable truth; a fast-forward refused because main advanced
        independently is left for the next writer to reconcile."""
        for name, (tbl, _) in self._staged.items():
            try:
                tbl.fast_forward(self.branch, "main")
            except (CommitConflict, KeyError):
                pass
            try:
                tbl.drop_ref(self.branch)
            except (KeyError, CommitConflict):
                pass

    def abort(self) -> None:
        """Drop every staged branch; staged snapshots become unreferenced
        (never pinned, never published) and fall to snapshot expiration."""
        if self._done:
            return
        self._cleanup()
        self._done = True

    def _cleanup(self) -> None:
        for _, (tbl, _base) in self._staged.items():
            try:
                tbl.drop_ref(self.branch)
            except (KeyError, CommitConflict):
                pass
