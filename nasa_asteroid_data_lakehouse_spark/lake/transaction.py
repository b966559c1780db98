"""Multi-table transactions: one atomic commit point across several
VersionedTables.

The reference's gold update rewrites four tables one after another
(``src/etl/silver_to_gold.py:153-167``) with no cross-table atomicity:
a reader racing the updater — or an updater crashing midway — sees a
fact table from the new run joined to dimensions from the old one.
Delta/Iceberg have the same gap (transactions are per-table); engines
layer a catalog commit on top.  This module is that layer for
:class:`~nasa_asteroid_data_lakehouse_spark.lake.table.VersionedTable`:

* Each member table keeps its own manifest log (snapshot isolation,
  optimistic concurrency — unchanged).
* A TRANSACTION manifest (``_txn/t{N}.json``) pins ``{table: version}``
  across all members.  Publishing it — write the full payload to a
  temp file, then ``os.link`` it into place — is the single atomic
  commit point, atomic for writers (put-if-absent, as on an object
  store at scale) AND for readers (a visible manifest is always a
  complete JSON document).
* Readers resolve ONE transaction manifest and read every member at
  its pinned version — a consistent cross-table snapshot, however many
  table-local commits happened in between or are in flight.
* A writer crash after some table-local commits but before the
  transaction commit leaves orphan table versions that no transaction
  pins: invisible to transactional readers, reclaimable by vacuum.

Usage::

    txn = MultiTableTransaction(spark, root)
    fact = txn.table("fact"); dim = txn.table("dim")
    v_f = fact.create(...); v_d = dim.create(...)
    txn.commit({"fact": v_f, "dim": v_d})       # txn 0
    ...
    v_f2 = fact.delete_where(...); v_d2 = dim.upsert(...)
    txn.commit({"fact": v_f2, "dim": v_d2})     # txn 1
    txn.read("fact", txn_id=0)                  # time travel, consistent

``commit`` carries FORWARD any member not named: an update touching 2
of 4 tables pins the other 2 at their previous transactional versions.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from nasa_asteroid_data_lakehouse_spark.lake.table import (
    CommitConflict,
    VersionedTable,
)


class MultiTableTransaction:
    def __init__(self, spark: SparkSession, root: str, num_buckets: int = 16):
        self.spark = spark
        self.root = root
        self.num_buckets = num_buckets
        os.makedirs(self._txn_dir, exist_ok=True)
        self._tables: dict[str, VersionedTable] = {}

    # --- paths / log I/O -------------------------------------------------

    @property
    def _txn_dir(self) -> str:
        return os.path.join(self.root, "_txn")

    def _txn_path(self, txn_id: int) -> str:
        return os.path.join(self._txn_dir, f"t{txn_id:08d}.json")

    def latest_txn(self) -> int | None:
        ids = [
            int(f[1:-5])
            for f in os.listdir(self._txn_dir)
            if f.startswith("t") and f.endswith(".json")
        ]
        return max(ids) if ids else None

    def _load_txn(self, txn_id: int) -> dict:
        with open(self._txn_path(txn_id)) as fh:
            return json.load(fh)

    # --- members ----------------------------------------------------------

    def table(self, name: str) -> VersionedTable:
        """The member table handle (its data lives under
        ``root/tables/<name>``; table-local operations work as usual —
        they only become transactionally visible on :meth:`commit`)."""
        if name not in self._tables:
            self._tables[name] = VersionedTable(
                self.spark,
                os.path.join(self.root, "tables", name),
                num_buckets=self.num_buckets,
            )
        return self._tables[name]

    # --- commit / read ------------------------------------------------------

    def commit(self, versions: dict[str, int], retries: int = 3) -> int:
        """Atomically pin ``{table: version}`` as the next transaction.

        Members not named carry forward from the previous transaction.
        The commit point is the exclusive create of the transaction
        manifest; on conflict (another committer won the id) the pin
        set is re-based on the winner's snapshot and retried — the
        named versions themselves are table-local commits that already
        exist, so rebasing never loses data, it only re-parents."""
        for _ in range(retries):
            latest = self.latest_txn()
            pinned: dict[str, int] = {}
            if latest is not None:
                pinned.update(self._load_txn(latest)["tables"])
            pinned.update({k: int(v) for k, v in versions.items()})
            txn_id = 0 if latest is None else latest + 1
            payload = json.dumps(
                {
                    "txn": txn_id,
                    "committed_at": time.time(),
                    "tables": pinned,
                },
                indent=1,
            )
            # Fully write the payload to a temp file, then publish via
            # os.link (atomic put-if-absent): a concurrent
            # latest_txn()+_load_txn() reader can never open a
            # partially-written manifest — O_EXCL-then-write was atomic
            # for writers but not for readers.
            path = self._txn_path(txn_id)
            tmp = path + f".tmp.{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as fh:
                fh.write(payload)
            try:
                os.link(tmp, path)
            except FileExistsError:
                continue  # lost the race: re-base on the winner
            finally:
                os.remove(tmp)
            return txn_id
        raise CommitConflict(f"gave up after {retries} conflicting txn commits")

    def snapshot(self, txn_id: int | None = None) -> dict[str, int]:
        """The ``{table: version}`` pin set of a transaction (latest by
        default)."""
        t = self.latest_txn() if txn_id is None else txn_id
        if t is None:
            raise ValueError(f"no committed transaction at {self.root}")
        return dict(self._load_txn(t)["tables"])

    def read(self, name: str, txn_id: int | None = None) -> DataFrame:
        """Read one member at its transactionally pinned version.  Never
        serves a table-local version no transaction pins — that is the
        whole isolation guarantee."""
        pins = self.snapshot(txn_id)
        if name not in pins:
            raise ValueError(f"table {name!r} not part of transaction")
        return self.table(name).read(version=pins[name])
