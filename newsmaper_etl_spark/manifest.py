"""Manifest-committed parquet tables — the transactional upgrade path
documented at sinks.py (rewrite_dedup: "on object stores the swap
becomes a manifest/pointer flip"), implemented.

Plain directory-of-parquet tables have two failure modes at warehouse
scale: a crashed overwrite leaves a half-written table (sinks.py's
rename-swap narrows but cannot close the window), and readers racing an
append can list a directory mid-write. The fix — the same design Delta
Lake / Iceberg use, reduced to its load-bearing core — is to make the
set of live files an immutable, versioned VALUE and commits a single
atomic pointer flip:

    table/
      _manifests/v0000000001.json   immutable snapshot: file list + stats
      _LATEST                       tiny file holding the current version
      data/b-<uuid>/part-*.parquet  immutable data files

- **Writers** only ever ADD data files (under a fresh batch dir) and
  manifests; nothing live is mutated. A manifest is staged to a temp
  name and CLAIMED with ``os.link`` (atomic create — a half-written or
  already-claimed manifest can never be clobbered), then `_LATEST`
  flips via ``os.replace`` — atomic on POSIX. A crash anywhere before
  the flip leaves the table at the previous snapshot with some
  invisible orphans (reclaimed by :func:`vacuum` / :func:`repair`).
- **Readers** resolve `_LATEST` → manifest → EXPLICIT file list. No
  directory listing races; `version=` gives time travel for free.
- **Conflicts**: commits carry the base version their content was
  computed from (callers that read-then-write pin it — see
  sinks.append_news_tx); if `_LATEST` moved meanwhile, or another
  writer claimed the next manifest first, :class:`ConcurrentWriteError`
  — optimistic concurrency, single-winner, losers recompute. (On an
  object store without atomic rename/link, claim + flip need a
  conditional put or a lock service — exactly Delta's LogStore
  contract; the protocol here is unchanged.)
- **Exactly-once writers**: a commit may carry a ``txn=(app_id,
  txn_version)`` pair; the CUMULATIVE per-app high-water mark is
  carried forward on every subsequent manifest (Delta's txn action),
  so :func:`last_txn_version` is one read of the LATEST manifest —
  O(1), and immune to :func:`vacuum` dropping old manifests.
- **Data skipping**: the manifest records per-file min/max for declared
  stat columns (read from parquet footers, driver-side, no data scan).
  :func:`read_table` prunes the FILE LIST against a predicate range
  before Spark ever sees it — partition pruning without partition
  directories, at file granularity.

Scale posture: a manifest holds one JSON row per file; at 100 TB with
~1 GB files that is ~10⁵ entries — megabytes, driver-trivial. (Iceberg
splits manifests hierarchically for 10⁸ files; out of scope here, the
pointer-flip commit is the part that matters.)
"""

from __future__ import annotations

import json
import os
import uuid


class ConcurrentWriteError(RuntimeError):
    """Another commit landed since this write's snapshot was taken."""


_LATEST = "_LATEST"
_MANIFESTS = "_manifests"
_DATA = "data"


class LogStore:
    """The two atomic primitives the commit protocol stands on, plus the
    reads that observe them — the same seam as Delta's LogStore contract
    (conditional-put claim + atomic pointer flip), so the 100 TB
    transactional story is object-store-portable: on S3/GCS an adapter
    backs ``put_if_absent`` with a conditional PUT (If-None-Match) and
    ``put_atomic`` with a plain PUT (single-key writes are atomic on
    every major object store), with no change to the protocol above it.

    Only the LOG is abstracted: data files are written by Spark and read
    by Spark/DuckDB through their own filesystems, and the maintenance
    walkers (:func:`repair`, :func:`vacuum`) remain POSIX-side — an
    object-store port adds a ``list`` primitive for those.
    """

    def read(self, path: str) -> str:  # pragma: no cover - interface
        raise NotImplementedError

    def exists(self, path: str) -> bool:  # pragma: no cover - interface
        raise NotImplementedError

    def put_if_absent(self, path: str, data: str) -> None:
        """Create ``path`` with ``data`` iff it does not exist — raise
        ``FileExistsError`` otherwise. MUST be atomic: two racers get
        exactly one winner, and a loser/crash can never leave a partial
        or clobbered object at ``path``."""
        raise NotImplementedError  # pragma: no cover - interface

    def put_atomic(self, path: str, data: str) -> None:
        """Atomically (over)write ``path`` with ``data`` — readers see
        the old content or the new, never a prefix."""
        raise NotImplementedError  # pragma: no cover - interface


class PosixLogStore(LogStore):
    """Filesystem implementation: claim = hard-link of a fully-written
    temp (atomic create), flip = ``os.replace``. Correct on any POSIX
    filesystem (and HDFS-style mounts with atomic rename)."""

    def read(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def put_if_absent(self, path: str, data: str) -> None:
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(data)
        try:
            os.link(tmp, path)  # atomic claim: exactly one writer wins
        finally:
            os.unlink(tmp)

    def put_atomic(self, path: str, data: str) -> None:
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(data)
        os.replace(tmp, path)


class InMemoryLogStore(LogStore):
    """Conditional-put fake with object-store semantics (no directories,
    no rename — just keyed conditional writes). Backs the protocol tests
    that prove the commit logic depends ONLY on the LogStore contract,
    not on POSIX rename behavior."""

    def __init__(self) -> None:
        import threading

        self._objects: dict[str, str] = {}
        self._lock = threading.Lock()

    def read(self, path: str) -> str:
        try:
            return self._objects[path]
        except KeyError:
            raise FileNotFoundError(path) from None

    def exists(self, path: str) -> bool:
        return path in self._objects

    def put_if_absent(self, path: str, data: str) -> None:
        with self._lock:
            if path in self._objects:
                raise FileExistsError(path)
            self._objects[path] = data

    def put_atomic(self, path: str, data: str) -> None:
        with self._lock:
            self._objects[path] = data


_LOG_STORE: LogStore = PosixLogStore()


def get_log_store() -> LogStore:
    return _LOG_STORE


def set_log_store(store: LogStore) -> LogStore:
    """Swap the active log store (returns the previous one). Test /
    embedding hook; production code never calls this."""
    global _LOG_STORE
    prev, _LOG_STORE = _LOG_STORE, store
    return prev


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, _MANIFESTS, f"v{version:010d}.json")


def current_version(table: str) -> int:
    """The committed version (0 = empty table, no commits yet)."""
    latest = os.path.join(table, _LATEST)
    store = get_log_store()
    if not store.exists(latest):
        return 0
    return int(store.read(latest).strip())


def _load_manifest(table: str, version: int) -> dict:
    if version == 0:
        return {"version": 0, "files": []}
    return json.loads(get_log_store().read(_manifest_path(table, version)))


def _json_safe(v):
    """Footer statistics arrive as python objects; only types that
    round-trip through JSON *and* compare correctly against prune bounds
    are recorded (bool is excluded — it would satisfy isinstance(int))."""
    return isinstance(v, (int, float, str)) and not isinstance(v, bool)


def _file_stats(path: str, stat_cols: list[str]) -> dict[str, list]:
    """Per-file min/max for the stat columns, read from the parquet
    FOOTER (row-group statistics) — no data pages touched. Columns whose
    stats aren't JSON-safe (timestamps, decimals, binary) are skipped:
    the file is then conservatively kept by every prune."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict[str, list] = {}
    for col in stat_cols:
        if col not in idx:
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None and _json_safe(lo) and _json_safe(hi):
            out[col] = [lo, hi]
    return out


def _partition_values(rel_dir: str) -> dict:
    """Parse Hive-style ``col=value`` path segments into typed values
    (int when it parses, else the unquoted string; the null sentinel →
    None so pruning conservatively keeps the file)."""
    from urllib.parse import unquote

    out: dict = {}
    for seg in rel_dir.split(os.sep):
        if "=" not in seg:
            continue
        col, _, raw = seg.partition("=")
        raw = unquote(raw)
        if raw == "__HIVE_DEFAULT_PARTITION__":
            out[col] = None
            continue
        try:
            out[col] = int(raw)
        except ValueError:
            out[col] = raw
    return out


def _write_batch(
    df, table: str, stat_cols: list[str], partition_by: tuple[str, ...] = ()
) -> list[dict]:
    """Write a fresh immutable batch dir; return file entries + stats.

    With ``partition_by`` the batch is written Hive-style and each file
    is then RELOCATED to ``data/<col=value>/<batchid>-<name>.parquet`` —
    the ``col=value`` directories sit directly under the one shared
    ``data/`` base (batch identity moves into the file NAME), because
    Spark's partition discovery walks upward from each file collecting
    ``k=v`` segments until the first plain directory and then requires
    every file to land on the SAME base: per-batch parents would raise
    CONFLICTING_DIRECTORY_STRUCTURES on the first two-batch read. Each
    manifest entry records its exact typed partition values, so
    :func:`read_table` prunes on them with no footer read (partition
    pruning at manifest granularity; VERDICT r04 'do this' #7). The
    relocation is crash-safe: destination names are batch-unique, and
    a file is only ever referenced after the commit flip — a crash
    mid-relocate leaves unreferenced orphans for vacuum."""
    bid = f"b-{uuid.uuid4().hex[:12]}"
    batch = os.path.join(table, _DATA, bid)
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(batch)
    entries = []
    for dirpath, _dirnames, filenames in os.walk(batch):
        for name in filenames:
            if not name.endswith(".parquet"):
                continue
            full = os.path.join(dirpath, name)
            entry = {"bytes": os.path.getsize(full)}
            if partition_by:
                kv_rel = os.path.relpath(dirpath, batch)
                entry["partition"] = _partition_values(kv_rel)
                dest = os.path.join(table, _DATA, kv_rel, f"{bid}-{name}")
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                os.rename(full, dest)
                full = dest
            entry["path"] = os.path.relpath(full, table)
            entry["stats"] = _file_stats(full, stat_cols)
            entries.append(entry)
    if partition_by:
        # the emptied staging dir (and Spark's _SUCCESS marker)
        import shutil

        shutil.rmtree(batch, ignore_errors=True)
    return sorted(entries, key=lambda e: e["path"])


def _commit(
    table: str, base_version: int, files: list[dict], op: str,
    meta: dict | None = None, schema: list[list[str]] | None = None,
    txn: tuple[str, int] | None = None,
    prev_txns: dict | None = None,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Atomically publish a new snapshot computed against base_version.

    The manifest is CLAIMED via the log store's conditional put
    (``put_if_absent`` — on POSIX a fully-written temp hard-linked into
    place; atomic create, so a crashed writer can only ever leave an
    unreferenced temp file, never a half-written or clobbered manifest),
    and two racers for the same version get exactly one winner.
    `_LATEST` then flips via ``put_atomic`` (POSIX: os.replace). The
    base-version check makes a writer whose snapshot went stale fail
    loudly instead of silently dropping the interleaved commit's rows.
    The whole protocol touches storage only through :class:`LogStore`,
    so the same logic commits against S3/GCS conditional puts."""
    if current_version(table) != base_version:
        raise ConcurrentWriteError(
            f"table moved past v{base_version}; recompute and retry"
        )
    new_version = base_version + 1
    txns = dict(prev_txns or {})
    if txn is not None:
        app, tv = txn
        txns[app] = max(int(tv), int(txns.get(app, -1)))
    manifest = {"version": new_version, "op": op, "files": files}
    if meta:
        manifest["meta"] = meta
    if schema is not None:
        manifest["schema"] = schema
    if txns:
        manifest["txns"] = txns
    manifest["partition_by"] = list(partition_by)
    store = get_log_store()
    try:
        store.put_if_absent(_manifest_path(table, new_version), json.dumps(manifest))
    except FileExistsError:
        raise ConcurrentWriteError(
            f"manifest v{new_version} already claimed by another writer"
        ) from None
    # THE commit point:
    store.put_atomic(os.path.join(table, _LATEST), str(new_version))
    return new_version


def create_table(table: str) -> None:
    os.makedirs(os.path.join(table, _MANIFESTS), exist_ok=True)
    os.makedirs(os.path.join(table, _DATA), exist_ok=True)


def _schema_fields(df) -> list[list[str]]:
    """(name, dataType) pairs — the compatibility contract. Nullability
    is excluded on purpose: parquet files carry their own nullability
    and relaxing it never corrupts a read."""
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


def _check_schema(
    df, prev_manifest: dict, table: str, merge_schema: bool = False
) -> list[list[str]]:
    """The batch-vs-table schema contract, checked at COMMIT (a drifted
    producer fails its own write, not some future read over mixed files).

    Default: exact match. ``merge_schema=True`` enables ADDITIVE
    evolution (Delta's mergeSchema reduced to its safe core): the batch
    must still carry every table column at its recorded type — dropping
    or retyping a column silently nulls/corrupts history — but may add
    NEW columns, which append to the recorded schema. Old files simply
    lack the new columns; :func:`read_table` projects the table schema
    explicitly, so historical rows read as null there — the standard
    add-column semantics. Returns the schema to record on the commit."""
    fields = _schema_fields(df)
    prev = prev_manifest.get("schema")
    if prev is None or prev == fields:
        return fields
    if merge_schema:
        batch_types = dict(map(tuple, fields))
        missing = [n for n, _t in prev if n not in batch_types]
        retyped = [
            [n, t, batch_types[n]]
            for n, t in prev
            if n in batch_types and batch_types[n] != t
        ]
        if not missing and not retyped:
            prev_names = {n for n, _t in prev}
            added = [[n, t] for n, t in fields if n not in prev_names]
            return [list(f) for f in prev] + added
        raise ValueError(
            f"merge_schema appending to {table} is ADDITIVE only: "
            f"missing table columns {missing or '[]'}, retyped "
            f"{retyped or '[]'}\n  table: {prev}\n  batch: {fields}"
        )
    raise ValueError(
        f"schema mismatch appending to {table}:\n  table: {prev}\n"
        f"  batch: {fields}\nuse merge_schema=True to add columns, or "
        "overwrite() for an intentional rewrite (old snapshots stay "
        "readable via time travel)"
    )


def _check_partitioning(
    prev: dict, partition_by: tuple[str, ...], table: str
) -> None:
    """A table's Hive layout is all-or-nothing: mixing partitioned and
    unpartitioned batches would make Spark's path-based partition
    discovery see conflicting structures at read time — fail the COMMIT
    instead (the same contract as the schema check).

    A manifest written before partition support has no ``partition_by``
    key: those tables were laid out FLAT, so for a manifest that already
    references files the missing key means ``()`` — a partitioned append
    onto such a table must fail, not slip through as "unknown". A
    manifest with NO files (the fresh-table version-0 sentinel, or a
    table truncated by overwrite) is still free to establish any
    layout."""
    if not prev.get("files"):
        return
    recorded = tuple(prev.get("partition_by") or ())
    if recorded != tuple(partition_by):
        raise ValueError(
            f"partitioning mismatch appending to {table}: table is "
            f"partitioned by {list(recorded)}, batch by "
            f"{list(partition_by)}"
        )


def append(
    df,
    table: str,
    stat_cols: tuple[str, ...] = (),
    meta: dict | None = None,
    txn: tuple[str, int] | None = None,
    base_version: int | None = None,
    partition_by: tuple[str, ...] = (),
    merge_schema: bool = False,
) -> int:
    """Transactional append: new files + manifest, one pointer flip.

    ``meta`` is recorded verbatim on the commit; ``txn=(app_id,
    txn_version)`` additionally advances the per-app exactly-once
    high-water mark (see :func:`last_txn_version`). ``base_version``
    pins the commit to the snapshot the CALLER's content was computed
    against (a caller that read the table to decide what to append —
    e.g. an anti-join — must pass the version it read, else a commit
    landing in between is silently double-counted). The batch schema
    must match the table's recorded schema — a drifted producer fails
    the COMMIT, not some future read over mixed files. Returns the
    committed version.

    ``partition_by`` lays the batch out in Hive ``col=value/`` subdirs
    and records each file's exact partition values on its manifest entry
    (equality pruning without footer stats); the layout must stay
    consistent across a table's life, checked at commit.

    ``merge_schema=True`` permits ADDITIVE schema evolution: the batch
    may introduce new columns (recorded schema grows; old files read as
    null there), but must still carry every existing column at its
    recorded type — see :func:`_check_schema`."""
    create_table(table)
    base = current_version(table) if base_version is None else base_version
    prev = _load_manifest(table, base)
    fields = _check_schema(df, prev, table, merge_schema=merge_schema)
    _check_partitioning(prev, partition_by, table)
    new_files = _write_batch(df, table, list(stat_cols), tuple(partition_by))
    return _commit(
        table, base, prev["files"] + new_files, op="append", meta=meta,
        schema=fields, txn=txn, prev_txns=prev.get("txns"),
        partition_by=tuple(partition_by),
    )


def overwrite(
    df,
    table: str,
    stat_cols: tuple[str, ...] = (),
    base_version: int | None = None,
    partition_by: tuple[str, ...] = (),
    meta: dict | None = None,
) -> int:
    """Transactional full rewrite (the atomic form of sinks.rewrite_dedup's
    rename swap): the new snapshot references ONLY the fresh batch; old
    files stay on disk for time travel until vacuumed. Safe to compute
    ``df`` FROM the live table — reads resolve to the old snapshot's
    explicit file list, which the write never touches. Pass the version
    the input was read at as ``base_version`` so an interleaved commit
    fails this write instead of being silently erased. Per-app txn
    high-water marks are carried forward — a maintenance rewrite must
    not amnesia the exactly-once state of streaming writers."""
    create_table(table)
    base = current_version(table) if base_version is None else base_version
    prev = _load_manifest(table, base)
    new_files = _write_batch(df, table, list(stat_cols), tuple(partition_by))
    return _commit(
        table, base, new_files, op="overwrite", meta=meta,
        schema=_schema_fields(df),
        prev_txns=prev.get("txns"), partition_by=tuple(partition_by),
    )


def compact(
    spark,
    table: str,
    min_file_bytes: int = 32 * 1024 * 1024,
    target_file_bytes: int = 128 * 1024 * 1024,
    stat_cols: tuple[str, ...] = (),
    base_version: int | None = None,
    order_by: tuple[str, ...] = (),
) -> int:
    """Bin-pack small files into target-sized ones, ONE commit — the
    maintenance operation a 100 TB table under 20-minute micro-batches
    needs forever (VERDICT r05 'do this' #4): every streaming append adds
    a few small files, and a year of that is ~10⁵ files whose per-file
    open/footer/seek cost dominates scans long before data volume does.

    Files ≥ ``min_file_bytes`` are left untouched (rewriting them buys
    nothing and costs a full copy); smaller ones are read back and
    rewritten as ⌈Σbytes / target_file_bytes⌉ files. Partitioned tables
    compact WITHIN each partition (files of different partition values
    can never merge); partitions with a single small file are skipped.
    The new manifest references untouched + freshly written files — same
    rows, fewer objects, ``op="compact"``. Reads are never disturbed
    (old snapshot's files stay until vacuum), schema and exactly-once
    txn marks are carried forward verbatim, and an interleaved commit
    fails this one with ConcurrentWriteError — compaction is always safe
    to retry, it only rearranges bytes.

    ``stat_cols`` defaults to the columns that already carry footer
    stats in the manifest, so data-skipping metadata survives the
    rewrite without the caller restating it.

    ``order_by`` CLUSTERS the rewrite (Delta's OPTIMIZE ZORDER reduced
    to its single-column load-bearing core): rows range-partition and
    sort on the given columns, so each output file covers a DISJOINT
    value range and the footer min/max recorded in the manifest turns
    :func:`read_table`'s prune from "keep almost everything" (append
    order scatters every key range across every file) into "open one
    file". This is the difference between a point lookup scanning a
    100 TB table and scanning one file of it; the sort costs one extra
    shuffle during maintenance, exactly where that cost belongs.
    Ordered columns are added to ``stat_cols`` automatically.

    Returns the committed version (the base version when there was
    nothing to compact)."""
    base = current_version(table) if base_version is None else base_version
    prev = _load_manifest(table, base)
    partition_by = tuple(prev.get("partition_by") or ())
    if not stat_cols:
        stat_cols = tuple(
            sorted({c for e in prev["files"] for c in e.get("stats", {})})
        )
    if order_by:
        # clustered output is only useful if its ranges are recorded
        stat_cols = tuple(dict.fromkeys(tuple(order_by) + tuple(stat_cols)))

    def pkey(entry):
        return tuple(sorted(entry.get("partition", {}).items()))

    groups: dict[tuple, list[dict]] = {}
    untouched: list[dict] = []
    for e in prev["files"]:
        # clustering rewrites EVERYTHING in scope (Delta's OPTIMIZE
        # ZORDER does the same): a large file kept by the size check
        # still spans the full key range and would defeat the disjoint-
        # range pruning that is order_by's whole point
        if order_by or e["bytes"] < min_file_bytes:
            groups.setdefault(pkey(e), []).append(e)
        else:
            untouched.append(e)
    if not order_by:
        # a group of one small file cannot get smaller — leave it alone
        # (under order_by even a single file may need re-sorting)
        for k in [k for k, g in groups.items() if len(g) < 2]:
            untouched.extend(groups.pop(k))
    if not groups:
        return base

    new_files: list[dict] = []
    for g in groups.values():
        paths = [os.path.join(table, e["path"]) for e in g]
        reader = spark.read
        if partition_by:
            reader = reader.option(
                "basePath", os.path.abspath(os.path.join(table, _DATA))
            )
        ddl = _schema_ddl(prev)
        if ddl is not None:
            reader = reader.schema(ddl)
        df = reader.parquet(*paths)
        n_out = max(1, -(-sum(e["bytes"] for e in g) // target_file_bytes))
        if order_by:
            # range-partition + in-partition sort: output file k covers
            # a disjoint slice of the order_by space, so its footer
            # min/max prunes
            df = df.repartitionByRange(int(n_out), *order_by)
            df = df.sortWithinPartitions(*order_by)
        else:
            # coalesce when shrinking (bin-packing needs no shuffle),
            # but coalesce cannot RAISE partition count: when the
            # requested target is finer than Spark's read-side file
            # packing (maxPartitionBytes groups many small files per
            # split), a repartition is required or the output lands
            # ~maxPartitionBytes-sized regardless of target_file_bytes
            read_parts = df.rdd.getNumPartitions()
            df = (
                df.coalesce(int(n_out))
                if n_out <= read_parts
                else df.repartition(int(n_out))
            )
        new_files.extend(
            _write_batch(df, table, list(stat_cols), partition_by)
        )
    return _commit(
        table, base, sorted(untouched + new_files, key=lambda e: e["path"]),
        op="compact", schema=prev.get("schema"),
        prev_txns=prev.get("txns"), partition_by=partition_by,
    )


def last_txn_version(table: str, app_id: str) -> int:
    """The highest committed ``txn_version`` for ``app_id`` (-1 if none)
    — ONE read of the latest manifest (the high-water marks are carried
    forward on every commit), so the exactly-once check is O(1) and
    survives :func:`vacuum` dropping old manifests."""
    m = _load_manifest(table, current_version(table))
    return int((m.get("txns") or {}).get(app_id, -1))


def txn_commit_version(
    table: str, app_id: str, txn_version: int
) -> int | None:
    """The snapshot version whose commit first carried
    ``(app_id, txn_version)`` — i.e. the version at which the app's
    high-water mark reached ``txn_version``. ``None`` when that txn
    never committed, or when the backward walk would need a manifest
    :func:`vacuum` has dropped (callers fall back to the current
    snapshot; in the crash-replay window this fix exists for, the
    commit is seconds old and well inside any retention window).

    This is the replay-determinism primitive: reading an index table at
    ``txn_commit_version(...) - 1`` yields the EXACT state the original
    run of that batch saw — without it, a replayed batch whose keys
    already committed anti-joins itself out of existence and any
    LATER per-batch commit (e.g. the banded-signature index) is
    appended from an empty frame."""
    v = current_version(table)
    if v == 0:
        return None
    m = _load_manifest(table, v)
    if int((m.get("txns") or {}).get(app_id, -1)) < txn_version:
        return None
    while v > 1:
        try:
            prev = _load_manifest(table, v - 1)
        except (FileNotFoundError, KeyError, OSError):
            return None  # vacuumed past — undeterminable
        if int((prev.get("txns") or {}).get(app_id, -1)) < txn_version:
            return v
        v -= 1
    return v


def _schema_ddl(manifest: dict) -> str | None:
    fields = manifest.get("schema")
    if not fields:
        return None
    return ", ".join(f"`{n}` {t}" for n, t in fields)


def _read_entries(spark, table: str, manifest: dict, entries: list[dict]):
    """Plan a read over an explicit manifest entry list — the shared
    tail of :func:`read_table` and :func:`read_table_changes`: a typed
    EMPTY frame when nothing matches (from the recorded schema), the
    Hive basePath pin for partitioned layouts, and explicit recorded-
    schema projection (what makes pre-evolution files read added
    columns as null, and skips the plan-time inference file touch)."""
    if not entries:
        ddl = _schema_ddl(manifest)
        if ddl is None:
            raise ValueError(
                f"snapshot v{manifest.get('version')} of {table} is "
                "empty and records no schema"
            )
        return spark.createDataFrame([], ddl)
    paths = [os.path.join(table, e["path"]) for e in entries]
    reader = spark.read
    if manifest.get("partition_by"):
        # Hive-laid-out table: every file sits at data/<col=value>/…, so
        # partition discovery sees one shared base and reconstructs the
        # partition columns; basePath pins that base explicitly so a
        # single-partition (pruned) read types the same way
        reader = reader.option(
            "basePath", os.path.abspath(os.path.join(table, _DATA))
        )
    ddl = _schema_ddl(manifest)
    if ddl is not None:
        # project the RECORDED schema explicitly instead of inferring
        # from whichever file the reader samples: after additive schema
        # evolution the live file set legitimately mixes schemas, and
        # the explicit projection is what makes pre-evolution files read
        # their missing columns as null (it is also cheaper — no
        # schema-inference file touch at plan time)
        reader = reader.schema(ddl)
    return reader.parquet(*paths)


def read_table(
    spark,
    table: str,
    version: int | None = None,
    prune: tuple[str, object, object] | None = None,
    prune_in: tuple[str, "list | set"] | None = None,
):
    """Snapshot read from the explicit manifest file list.

    ``version`` time-travels to an older snapshot. ``prune=(col, lo, hi)``
    drops files that cannot intersect [lo, hi] BEFORE Spark plans the
    scan — first against the entry's exact PARTITION VALUE when ``col``
    is a partition column (no footer stats involved), else against the
    footer min/max range; files with neither are conservatively kept. A
    prune that eliminates every file returns an EMPTY DataFrame typed
    from the manifest's recorded schema — an empty query result is not
    an error; only a genuinely empty table with no recorded schema
    raises.

    ``prune_in=(col, values)`` is the MULTI-POINT form: keep only files
    whose partition value is in ``values``, or whose footer [min, max]
    contains AT LEAST ONE of them (binary search over the sorted value
    list per file — O(files·log|values|) on the driver, for a
    driver-materialized value set the caller already bounds). This is
    what turns a scattered-id candidate fetch (e.g. the ingest
    near-dedup verify stage pulling bucket-mate documents) into opening
    the few files whose id range the candidates actually touch — on an
    id-clustered table (``compact(order_by=(col,))``) or one whose
    appends have natural id locality, that is a point-lookup read, not
    a table scan. Note the semantics are per-file CONSERVATIVE: a kept
    file may still contain none of the values (ranges lie), so callers
    must still filter/join rows."""
    v = current_version(table) if version is None else version
    manifest = _load_manifest(table, v)
    files = manifest["files"]
    if prune_in is not None:
        import bisect

        pcol, pvals = prune_in
        pval_set = set(pvals)
        try:
            # None can't participate in range math; membership still
            # sees it via pval_set (a null partition matches a null
            # probe). Mixed incomparable probe types disable footer
            # pruning entirely — conservative, like missing stats.
            svals = sorted(v for v in pval_set if v is not None)
        except TypeError:
            svals = None
        kept = []
        for entry in files:
            part = entry.get("partition", {})
            if pcol in part:
                pv = part[pcol]
                if pv in pval_set:
                    kept.append(entry)
                else:
                    # A membership MISS may be a type mismatch, not an
                    # absent value: partition path segments are
                    # int-coerced on record, so a string-typed column
                    # probed with "1" must not silently drop the file
                    # holding 1 (ADVICE r08). Keep unless an ordered
                    # comparison proves the types comparable — the same
                    # conservative-keep contract as the stats branch.
                    try:
                        if svals:
                            pv < svals[0]  # raises on type mismatch
                        else:
                            raise TypeError  # no comparable probe basis
                    except TypeError:
                        kept.append(entry)
                continue
            rng = entry.get("stats", {}).get(pcol)
            try:
                if rng is None or svals is None:
                    kept.append(entry)  # no stats: conservatively keep
                    continue
                lo, hi = rng
                i = bisect.bisect_left(svals, lo)
                if i < len(svals) and svals[i] <= hi:
                    kept.append(entry)
            except TypeError:
                kept.append(entry)  # mismatched types: keep, like prune
        files = kept
    if prune is not None:
        col, lo, hi = prune
        kept = []
        for entry in files:
            part = entry.get("partition", {})
            if col in part:
                pv = part[col]
                try:
                    skip = pv is not None and (pv < lo or pv > hi)
                except TypeError:
                    skip = False
            else:
                rng = entry.get("stats", {}).get(col)
                try:
                    skip = rng is not None and (rng[1] < lo or rng[0] > hi)
                except TypeError:
                    # mismatched types (e.g. string footer stats pruned
                    # with numeric bounds) are a bad prune ARGUMENT, not
                    # a bad file — conservatively keep, like missing stats
                    skip = False
            if not skip:
                kept.append(entry)
        files = kept
    return _read_entries(spark, table, manifest, files)


def read_table_changes(
    spark, table: str, from_version: int, to_version: int | None = None
):
    """Incremental read: the rows ADDED between two snapshots — the
    CDC-lite feed a downstream incremental consumer (index builder,
    aggregation refresher, replication) polls instead of rescanning the
    table. Data files are immutable, so "rows added by appends" is
    exactly "files in ``to`` that weren't in ``from``" — an explicit
    file-list diff, no data scan, no log replay.

    Only append-style deltas are well-defined this way: if any
    intervening commit REWROTE the file set (``overwrite``; ``compact``
    rewrites small files under new names and would surface old rows as
    false adds), this raises instead of returning wrong deltas —
    consumers should re-sync from a full snapshot after maintenance,
    which is the same contract Delta's CDF-less readChangeFeed=false
    incremental consumers live with. Returns an empty typed DataFrame
    when nothing was added."""
    cur = current_version(table)
    to_v = cur if to_version is None else to_version
    # invalid ARGUMENTS fail here, distinctly — only versions that once
    # existed may reach the vacuum-interpretation path below, where a
    # missing manifest really does mean "fell behind retention"
    if from_version < 0 or from_version > cur:
        raise ValueError(
            f"from_version {from_version} is not a committed version of "
            f"{table} (current version is {cur})"
        )
    if to_v < 0 or to_v > cur:
        raise ValueError(
            f"to_version {to_v} is not a committed version of "
            f"{table} (current version is {cur})"
        )
    if from_version > to_v:
        raise ValueError(
            f"from_version {from_version} is above to_version {to_v}"
        )
    new_manifest = None
    try:
        for v in range(from_version + 1, to_v + 1):
            new_manifest = _load_manifest(table, v)
            op = new_manifest.get("op")
            if op not in (None, "append"):
                raise ValueError(
                    f"snapshot range v{from_version}..v{to_v} of {table} "
                    f"contains a '{op}' commit at v{v}: file-diff deltas "
                    "are only sound across pure appends — re-sync from "
                    "read_table() after maintenance/overwrite commits"
                )
        old = {e["path"] for e in _load_manifest(table, from_version)["files"]}
    except FileNotFoundError as e:
        # a manifest inside the range was dropped by vacuum: the
        # long-lived poller this API serves fell behind the retention
        # window — actionable guidance, not a raw missing-file crash
        raise ValueError(
            f"snapshot range v{from_version}..v{to_v} of {table} "
            "includes vacuumed manifests — the consumer fell behind the "
            "retention window; re-sync from read_table() and resume "
            f"polling from the current version ({e})"
        ) from None
    if new_manifest is None:  # from_version == to_v: empty range
        new_manifest = _load_manifest(table, to_v)
    added = [e for e in new_manifest["files"] if e["path"] not in old]
    return _read_entries(spark, table, new_manifest, added)


def history(table: str) -> list[dict]:
    """Committed snapshots, oldest first (version/op/file count).
    Manifests dropped by :func:`vacuum` appear as ``{"vacuumed": True}``
    placeholders instead of crashing the listing."""
    out = []
    for v in range(1, current_version(table) + 1):
        try:
            m = _load_manifest(table, v)
        except FileNotFoundError:
            out.append({"version": v, "vacuumed": True})
            continue
        out.append({"version": v, "op": m.get("op"), "n_files": len(m["files"])})
    return out


def repair(table: str) -> int:
    """Remove claimed-but-never-committed manifests (version above
    `_LATEST`) left by writers that crashed between claim and flip —
    they block their version number forever otherwise — plus staged
    temps in BOTH temp locations: `_manifests/*.tmp-*` (manifest staged
    but never claimed) and the table root's `_LATEST.tmp-*` (pointer
    staged but never flipped). ONLY safe with no writer active (same
    externally-coordinated assumption as any rename-based log store's
    cleanup). Returns files removed."""
    cur = current_version(table)
    removed = 0
    if os.path.isdir(table):
        for name in os.listdir(table):
            if name.startswith(_LATEST + ".tmp-"):
                os.remove(os.path.join(table, name))
                removed += 1
    mdir = os.path.join(table, _MANIFESTS)
    if not os.path.isdir(mdir):
        return removed
    for name in os.listdir(mdir):
        if ".tmp-" in name:  # staged-but-never-claimed manifest writes
            os.remove(os.path.join(mdir, name))
            removed += 1
            continue
        if not (name.startswith("v") and name.endswith(".json")):
            continue
        try:
            v = int(name[1:-5])
        except ValueError:
            continue
        if v > cur:
            os.remove(os.path.join(mdir, name))
            removed += 1
    return removed


def repair_claimed_orphan(table: str, app_id: str, txn_version: int) -> bool:
    """Remove a claimed-but-never-committed next-version manifest IF its
    txn mark shows it was written by THIS writer for THIS txn — the
    targeted, writer-safe subset of :func:`repair`. A crash between the
    ``os.link`` claim and the `_LATEST` flip otherwise wedges the
    writer's own replay forever: every retry of the same batch raises
    ConcurrentWriteError against its own orphan (ADVICE r04). Only the
    writer's own claim is removed — a live racer's claim has a different
    (or absent) mark and is left alone. Returns True if an orphan was
    cleared (the caller should retry its commit)."""
    cur = current_version(table)
    mpath = _manifest_path(table, cur + 1)
    try:
        with open(mpath) as f:
            m = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return False
    if int((m.get("txns") or {}).get(app_id, -1)) == int(txn_version):
        os.remove(mpath)
        return True
    return False


def vacuum(
    table: str, keep_versions: int = 1, retain_seconds: float = 86400.0
) -> int:
    """Delete data files not referenced by the newest ``keep_versions``
    snapshots (and drop the older manifests). Orphans from crashed or
    lost-race writes are removed too — they were never referenced.
    Exactly-once txn marks survive (they ride the latest manifest).
    Returns the number of files deleted.

    ``retain_seconds`` (default 24 h — Delta's ``RETAIN N HOURS``
    pattern) keeps unreferenced files younger than the window: an
    IN-FLIGHT writer's freshly staged batch is unreferenced until its
    commit, and deleting it would make that commit publish a manifest
    pointing at deleted files — silent data loss on the live snapshot.
    The age guard makes vacuum safe to run alongside healthy writers;
    ``retain_seconds=0`` (reclaim everything now) is ONLY safe with no
    writer active, like :func:`repair`."""
    import time

    cur = current_version(table)
    if cur == 0:
        return 0
    keep = set()
    kept_versions = range(max(1, cur - keep_versions + 1), cur + 1)
    for v in kept_versions:
        for e in _load_manifest(table, v)["files"]:
            keep.add(os.path.normpath(e["path"]))
    cutoff = time.time() - retain_seconds
    deleted = 0
    data_root = os.path.join(table, _DATA)
    for dirpath, _dirnames, filenames in os.walk(data_root, topdown=False):
        for name in filenames:
            full = os.path.join(dirpath, name)
            rel = os.path.normpath(os.path.relpath(full, table))
            if rel not in keep and os.path.getmtime(full) <= cutoff:
                os.remove(full)
                deleted += 1
        if not os.listdir(dirpath) and os.path.normpath(dirpath) != os.path.normpath(data_root):
            os.rmdir(dirpath)
    for v in range(1, min(kept_versions)):
        mp = _manifest_path(table, v)
        if os.path.exists(mp):
            os.remove(mp)
    return deleted
