"""Spark 4 Python DataSource: a VersionedTable's change feed as a
first-class source — ``spark.readStream.format("table_changes")``
subscribes to the table's commits (Delta's CDF streaming read), and
``spark.read.format("table_changes")`` is the batch form.

Why a real source and not a driver loop: the exactly-once offset
machinery (checkpointed offsets, replayable ranges) and the executor-
side diff both come from the DataSource contract.  Offsets are COMMIT
VERSIONS — ``initialOffset`` starts at ``starting_version`` (default
0, i.e. backfill every commit), ``latestOffset`` is the table head, a
micro-batch covers the versions in ``(start, end]``, and checkpoint
recovery replays the same version range deterministically because
manifests and data files are immutable.

Scale design: one ``InputPartition`` per (version, CHANGED BUCKET) —
the same O(changed buckets) unit ``VersionedTable.changes`` diffs, so
a commit that touched 5 of 1000 buckets costs 5 executor tasks and
the diff join is bucket-local by construction (both sides of a bucket
hold the same key-hash range).  The per-bucket diff runs EXECUTOR-side
over pyarrow/pandas — the driver only reads manifests (JSON).

Parity contract with :meth:`VersionedTable.changes`: rows classify as
``insert`` / ``update_postimage`` / ``delete`` (old image) over the
stream's FIXED schema — the union of key and non-key columns at
stream start, plus Delta-parity ``_change_type`` and
``_commit_version`` metadata columns.  Deletion-vector commits
(``delete_deferred``) surface exactly like deletes: the dv-list diff
marks the bucket changed and the subtracted rows fall out of the new
side.  Maintenance commits (compact / optimize / rebucket — manifest
``data_change`` false) are skipped entirely, Delta's
dataChange=false contract: they rewrite files without changing
logical content, and across a rebucket the bucket-space change makes
name-paired diffs actively wrong (see ``_changed_bucket_partitions``).  Like Delta's CDF stream, a schema change DURING the stream is
not reflected (the source schema is pinned at start); columns added
later are absent, columns dropped later read as NULL.

Options: ``path`` (table root, required); ``starting_version``
(first commit to emit, default 0 — versions BELOW it never surface).
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifests")


def _load_manifest(root: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(root), f"v{version:08d}.json")) as fh:
        return json.load(fh)


def _latest_version(root: str) -> int | None:
    try:
        versions = [
            int(f[1:-5])
            for f in os.listdir(_manifest_dir(root))
            if f.startswith("v") and f.endswith(".json")
        ]
    except FileNotFoundError:
        return None
    return max(versions) if versions else None


def _table_schema(root: str) -> tuple[StructType, list[str]]:
    """The stream's pinned schema (table columns + CDF metadata) and
    the table's key columns, from the latest manifest at call time."""
    latest = _latest_version(root)
    if latest is None:
        raise ValueError(f"no VersionedTable at {root}")
    m = _load_manifest(root, latest)
    schema_json = m.get("schema")
    if schema_json is None:
        raise ValueError(
            f"table at {root} predates schema-carrying manifests"
        )
    base = StructType.fromJson(schema_json)
    fields = [f for f in base.fields if f.name != "__bucket"]
    return (
        StructType(
            fields
            + [
                StructField("_change_type", StringType()),
                StructField("_commit_version", LongType()),
            ]
        ),
        [str(k) for k in m["keys"]],
    )


class _BucketDiff(InputPartition):
    """Everything one executor task needs to diff ONE bucket across
    ONE commit — immutable file lists, so the work is replayable."""

    def __init__(
        self,
        version: int,
        old_files: list[str],
        new_files: list[str],
        old_dv_files: list[str],
        new_dv_files: list[str],
        keys: list[str],
        columns: list[str],
    ):
        self.version = version
        self.old_files = old_files
        self.new_files = new_files
        self.old_dv_files = old_dv_files
        self.new_dv_files = new_dv_files
        self.keys = keys
        self.columns = columns


_MAINTENANCE_OPS = {"compact", "optimize", "rebucket"}


def _is_data_change(manifest: dict) -> bool:
    """Delta-parity ``dataChange`` test: maintenance commits (compact /
    optimize / rebucket) rewrite files without changing logical content
    and are SKIPPED by the change feed — Delta's CDF does the same for
    OPTIMIZE's dataChange=false file actions.  New manifests carry the
    flag explicitly; for manifests written before it existed, the
    operation name is the equivalent test (those three write paths are
    content-preserving by construction — compact/optimize only
    materialize deletion vectors that were already subtracted on every
    read, and rebucket re-hashes the same rows)."""
    flag = manifest.get("data_change")
    if flag is not None:
        return bool(flag)
    return manifest.get("operation") not in _MAINTENANCE_OPS


def _snapshot_diff_bound(options: dict) -> int | None:
    """Single-partition bound for the cross-bucket-space whole-snapshot
    diff: reader option ``snapshot_diff_max_bytes`` wins (readable in
    the planning worker, unlike driver-process env), else None (the
    planner falls back to $NDL_CDF_SNAPSHOT_DIFF_MAX_BYTES / 2 GiB)."""
    v = options.get("snapshot_diff_max_bytes")
    return int(v) if v is not None else None


def _changed_bucket_partitions(
    root: str,
    start_v: int,
    end_v: int,
    keys: list[str],
    columns: list[str],
    snapshot_diff_max_bytes: int | None = None,
) -> list[InputPartition]:
    """One partition per (version in (start_v, end_v], changed bucket)
    — the bucket-identity rule of ``VersionedTable.changes``: a bucket
    whose file list AND dv list are identical across the commit is
    byte-identical and cannot hold a change.

    Maintenance commits (``data_change`` false) are skipped entirely —
    without the skip a rebucket would be WRONG, not just wasteful: the
    bucket-local diff pairs buckets BY NAME, and across a bucket-space
    change old bucket 3 and new bucket 3 hold different key-hash
    ranges, so every moved key would surface as a false delete in its
    old bucket's partition plus a false insert in its new one (same
    ``_commit_version`` — a replica's latest-per-key pick between the
    pair is arbitrary and can drop the row).  The one data-change
    commit that can cross bucket spaces is a restore across a rebucket;
    bucket pairing is meaningless there, so it degrades to a single
    whole-snapshot diff partition (correct, documented cost — a
    rollback across a bucket-spec change mid-subscription is a rare
    manual event).

    FAIL-CLOSED past vacuum: a requested range that needs a vacuumed
    manifest raises a clear driver-side error naming the earliest
    answerable version (Delta's CDF raises the same way when
    startingVersion predates the earliest available commit) — never a
    bare executor FileNotFoundError, and never a silently partial
    feed."""

    def load_or_fail(v: int) -> dict:
        try:
            return _load_manifest(root, v)
        except FileNotFoundError:
            versions = sorted(
                int(f[1:-5])
                for f in os.listdir(_manifest_dir(root))
                if f.startswith("v") and f.endswith(".json")
            )
            earliest = versions[0] if versions else None
            if earliest is None:
                raise ValueError(f"no manifests at {root}") from None
            raise ValueError(
                f"change feed for ({start_v}, {end_v}] needs manifest "
                f"v{v}, which was vacuumed; earliest answerable "
                f"from_version is {earliest} (starting_version "
                f"{earliest + 1} — a diff of version k reads "
                f"manifests k-1 and k)"
            ) from None

    parts: list[InputPartition] = []
    for v in range(start_v + 1, end_v + 1):
        if v == 0:
            # version 0 diffs against the empty table: every row is an
            # insert (the batch default from_version=-1 backfills it)
            from_m: dict = {"buckets": {}, "dvs": {}}
        else:
            from_m = load_or_fail(v - 1)
        to_m = load_or_fail(v)
        if not _is_data_change(to_m):
            continue
        from_b, to_b = from_m["buckets"], to_m["buckets"]
        from_dvs = from_m.get("dvs", {})
        to_dvs = to_m.get("dvs", {})
        from_n = from_m.get("num_buckets")
        to_n = to_m.get("num_buckets")
        # Whole-snapshot diff ONLY when both counts are present and
        # differ (ADVICE r10 #3: one legacy manifest missing the field
        # next to a new one must fall through to the name-paired
        # per-bucket diff, not crash the planner).
        if from_n is not None and to_n is not None and int(from_n) != int(to_n):
            from_files = [f for fs in from_b.values() for f in fs]
            to_files = [f for fs in to_b.values() for f in fs]
            # Both snapshots land in ONE pandas partition here; fail
            # closed with a clear driver-side error instead of an
            # executor OOM on large tables (ADVICE r10 #2).  The bound
            # is deliberately generous — this path only serves the one
            # data-change commit that can cross bucket spaces (restore
            # over a rebucket); production mirrors re-bootstrap from a
            # fresh snapshot instead of streaming through it.
            limit = (
                snapshot_diff_max_bytes
                if snapshot_diff_max_bytes is not None
                else int(
                    os.environ.get("NDL_CDF_SNAPSHOT_DIFF_MAX_BYTES", 2 << 30)
                )
            )
            total = 0
            skipped = 0
            for f in from_files + to_files:
                try:
                    total += os.path.getsize(f)
                except OSError:
                    skipped += 1
            # Fail CLOSED when the sizes are unknowable (ADVICE r11
            # #4): if most of the snapshot's files cannot be stat'ed
            # from here (relative roots, object-store paths), a total
            # of ~0 would silently disarm the guard and reintroduce
            # the single-partition OOM it exists to prevent.
            n_files = len(from_files) + len(to_files)
            if n_files and skipped * 2 > n_files:
                raise ValueError(
                    f"table_changes: version {v} crosses bucket spaces and "
                    f"{skipped}/{n_files} snapshot files could not be sized "
                    f"from the planner; refusing the whole-snapshot diff — "
                    f"re-subscribe from a snapshot at or after version {v}"
                )
            if total > limit:
                raise ValueError(
                    f"table_changes: version {v} crosses bucket spaces and "
                    f"needs a whole-snapshot diff of ~{total >> 20} MiB, over "
                    f"the {limit >> 20} MiB single-partition bound "
                    f"(NDL_CDF_SNAPSHOT_DIFF_MAX_BYTES); re-subscribe from a "
                    f"snapshot at or after version {v} instead"
                )
            parts.append(
                _BucketDiff(
                    v,
                    from_files,
                    to_files,
                    [f for fs in from_dvs.values() for f in fs],
                    [f for fs in to_dvs.values() for f in fs],
                    keys,
                    columns,
                )
            )
            continue
        for b in set(from_b) | set(to_b) | set(from_dvs) | set(to_dvs):
            if from_b.get(b) == to_b.get(b) and from_dvs.get(b) == to_dvs.get(b):
                continue
            parts.append(
                _BucketDiff(
                    v,
                    from_b.get(b, []),
                    to_b.get(b, []),
                    from_dvs.get(b, []),
                    to_dvs.get(b, []),
                    keys,
                    columns,
                )
            )
    if not parts:
        # the DataSource contract wants >=1 partition; an empty diff
        # (no commits in range / maintenance-only commits) yields a
        # no-op task
        parts.append(_BucketDiff(end_v, [], [], [], [], keys, columns))
    return parts


def _read_side(files: list[str], columns: list[str]) -> "pd.DataFrame":
    """Executor-side snapshot of one bucket's files projected onto the
    stream schema: missing columns read as NULL (parquet mergeSchema
    semantics), extra columns are dropped (pinned-schema contract)."""
    import pandas as pd
    import pyarrow.parquet as pq

    frames = []
    for f in files:
        t = pq.read_table(f)
        frames.append(t.to_pandas())
    if not frames:
        return pd.DataFrame(columns=columns)
    df = pd.concat(frames, ignore_index=True, sort=False)
    for c in columns:
        if c not in df.columns:
            df[c] = None
    return df[columns]


def _norm_frame(df: "pd.DataFrame", cols: list[str]) -> "pd.DataFrame":
    """Column-wise NULL-safe normal form (vectorized ``.map``, no row
    iteration): every cell becomes a hashable plain value with one
    NULL sentinel, so pandas merges/compares implement eqNullSafe."""
    import pandas as pd

    return pd.DataFrame(
        {c: df[c].map(_null_norm) for c in cols},
        index=df.index,
    )


def _subtract_dv(
    df: "pd.DataFrame", dv_files: list[str], keys: list[str]
) -> "pd.DataFrame":
    """NULL-safe anti-join against the bucket's deletion-vector keys
    (mirrors ``VersionedTable._apply_dvs``) — vectorized: a normalized
    key merge, never a per-row loop."""
    if not dv_files or df.empty:
        return df
    dv = _read_side(dv_files, keys).drop_duplicates()
    if dv.empty:
        return df
    merged = _norm_frame(df, keys).merge(
        _norm_frame(dv, keys).drop_duplicates(),
        on=keys,
        how="left",
        indicator=True,
    )
    return df[(merged["_merge"] == "left_only").to_numpy()]


class _NullSentinel:
    """The one NULL normal form.  Totally ordered BELOW every other
    value (pandas' outer merge argsorts the key columns, and a plain
    ``object()`` sentinel breaks ``float < object``): Python falls
    back to the reflected operator when ``float.__lt__`` returns
    NotImplemented, so defining both directions here makes any
    sentinel-vs-value comparison resolve."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover — debug aid
        return "<NULL>"

    def __lt__(self, other) -> bool:
        return not isinstance(other, _NullSentinel)

    def __le__(self, other) -> bool:
        return True

    def __gt__(self, other) -> bool:
        return False

    def __ge__(self, other) -> bool:
        return isinstance(other, _NullSentinel)

    def __eq__(self, other) -> bool:
        return isinstance(other, _NullSentinel)

    def __ne__(self, other) -> bool:
        return not isinstance(other, _NullSentinel)

    def __hash__(self) -> int:
        return 0x9E3779B9


_NULL = _NullSentinel()


def _null_norm(v):
    """Hashable, NULL-safe, list-safe normal form for a cell value —
    NaN/None collapse to one sentinel (eqNullSafe semantics), arrays
    become tuples so they hash."""
    import pandas as pd

    if v is None:
        return _NULL
    if isinstance(v, (list, tuple)):
        return tuple(_null_norm(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_null_norm(x) for x in v.tolist())
    except ImportError:  # pragma: no cover
        pass
    try:
        if pd.isna(v):
            return _NULL
    except (TypeError, ValueError):
        pass
    return v


def _yield_rows(
    df: "pd.DataFrame", columns: list[str], change_type: str, version: int
) -> Iterator[tuple]:
    """Emit DataFrame rows as protocol tuples via column-array zip —
    O(cells) plain-Python conversion, no per-row Series construction."""
    if df.empty:
        return
    arrays = [df[c].tolist() for c in columns]
    for cells in zip(*arrays):
        yield tuple(_plain(v) for v in cells) + (change_type, version)


def _diff_bucket(p: _BucketDiff) -> Iterator[tuple]:
    """The bucket-local CDF diff: full-outer key match, value-diff
    classification — the pandas twin of ``VersionedTable.changes``'s
    single full-outer join, run where the bucket's bytes are.
    Vectorized end to end (normalized-key merge + column-wise value
    compare): the per-row iterrows form measured ~10x slower at 250k
    rows/bucket."""
    old = _subtract_dv(_read_side(p.old_files, p.columns), p.old_dv_files, p.keys)
    new = _subtract_dv(_read_side(p.new_files, p.columns), p.new_dv_files, p.keys)
    non_keys = [c for c in p.columns if c not in p.keys]
    v = int(p.version)

    old = old.reset_index(drop=True)
    new = new.reset_index(drop=True)
    old_n = _norm_frame(old, p.columns)
    new_n = _norm_frame(new, p.columns)
    old_n["__oi"] = range(len(old_n))
    new_n["__ni"] = range(len(new_n))
    merged = new_n[p.keys + ["__ni"]].merge(
        old_n[p.keys + ["__oi"]], on=p.keys, how="outer", indicator=True
    )

    ins_idx = merged.loc[merged["_merge"] == "left_only", "__ni"].astype(int)
    yield from _yield_rows(new.iloc[ins_idx], p.columns, "insert", v)

    both = merged[merged["_merge"] == "both"]
    if len(both) and non_keys:
        ni = both["__ni"].astype(int).to_numpy()
        oi = both["__oi"].astype(int).to_numpy()
        diff = None
        for c in non_keys:
            a = new_n[c].to_numpy()[ni]
            b = old_n[c].to_numpy()[oi]
            d = a != b  # normalized values: eqNullSafe semantics
            diff = d if diff is None else (diff | d)
        yield from _yield_rows(
            new.iloc[ni[diff]], p.columns, "update_postimage", v
        )

    del_idx = merged.loc[merged["_merge"] == "right_only", "__oi"].astype(int)
    yield from _yield_rows(old.iloc[del_idx], p.columns, "delete", v)


def _plain(v):
    """Convert pandas/numpy scalars back to plain Python for the
    tuple-row DataSource protocol."""
    if v is None:
        return None
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return v.item()
        if isinstance(v, np.ndarray):
            return [_plain(x) for x in v.tolist()]
    except ImportError:  # pragma: no cover
        pass
    import pandas as pd

    if not isinstance(v, (list, tuple, dict)):
        try:
            if pd.isna(v):
                return None
        except (TypeError, ValueError):
            pass
    return v


class _ChangesBatchReader(DataSourceReader):
    """Batch CDF: all changes in (from_version, to_version] (defaults:
    the whole surviving history up to the head)."""

    def __init__(self, options: dict, keys: list[str], columns: list[str]):
        self.root = options["path"]
        self.from_v = int(options.get("from_version", -1))
        latest = _latest_version(self.root)
        self.to_v = int(options.get("to_version", latest if latest is not None else -1))
        self.keys = keys
        self.columns = columns
        self.snapshot_diff_max_bytes = _snapshot_diff_bound(options)

    def partitions(self) -> list[InputPartition]:
        return _changed_bucket_partitions(
            self.root,
            self.from_v,
            self.to_v,
            self.keys,
            self.columns,
            self.snapshot_diff_max_bytes,
        )

    def read(self, partition: _BucketDiff) -> Iterator[tuple]:
        return _diff_bucket(partition)


class _ChangesStreamReader(DataSourceStreamReader):
    """Streaming CDF: offsets are commit versions; a micro-batch
    covers the versions committed since the last one.  Offsets
    checkpoint as ``{"version": N}`` and replay exactly (immutable
    manifests + files)."""

    def __init__(self, options: dict, keys: list[str], columns: list[str]):
        self.root = options["path"]
        self.keys = keys
        self.columns = columns
        self.start_v = int(options.get("starting_version", 0))
        self.snapshot_diff_max_bytes = _snapshot_diff_bound(options)

    def initialOffset(self) -> dict:
        # the first batch emits versions (start_v - 1, latest] —
        # i.e. starting_version itself and everything after
        return {"version": self.start_v - 1}

    def latestOffset(self) -> dict:
        latest = _latest_version(self.root)
        return {"version": latest if latest is not None else self.start_v - 1}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return _changed_bucket_partitions(
            self.root,
            int(start["version"]),
            int(end["version"]),
            self.keys,
            self.columns,
            self.snapshot_diff_max_bytes,
        )

    def read(self, partition: _BucketDiff) -> Iterator[tuple]:
        return _diff_bucket(partition)

    def commit(self, end: dict) -> None:  # noqa: ARG002 — nothing to release
        return None


class TableChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def schema(self) -> StructType:
        schema, self._keys = _table_schema(self.options["path"])
        return schema

    def _resolved(self, schema: StructType) -> tuple[list[str], list[str]]:
        keys = getattr(self, "_keys", None)
        if keys is None:
            _, keys = _table_schema(self.options["path"])
        columns = [
            f.name
            for f in schema.fields
            if f.name not in ("_change_type", "_commit_version")
        ]
        return keys, columns

    def reader(self, schema: StructType) -> DataSourceReader:
        keys, columns = self._resolved(schema)
        return _ChangesBatchReader(self.options, keys, columns)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        keys, columns = self._resolved(schema)
        return _ChangesStreamReader(self.options, keys, columns)


def register(spark) -> None:
    """Make ``spark.read.format('table_changes')`` /
    ``spark.readStream.format('table_changes')`` available."""
    spark.dataSource.register(TableChangesDataSource)
