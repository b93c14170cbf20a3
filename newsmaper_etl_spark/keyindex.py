"""Persisted exact-key index for ingest dedup — the side table that
makes corpus-level content dedup batch-scaled at 100 TB.

The r7 streaming ingest dedup (``write_stream_manifest(dedup_keys=...)``)
anti-joined every micro-batch against ``manifest.read_table`` of the FULL
current snapshot: correct, but each 20-minute batch paid an O(corpus)
scan of the key columns (at the 100 TB design point, a multi-billion-row
read that grows forever — VERDICT r07 "what's wrong" #1). This module
replaces that with the narrow persisted index both VERDICT and ADVICE
prescribe: a manifest-committed side table at ``<table>/_keys`` holding
the two xxhash64 lanes per committed key (16 bytes/doc — three orders of
magnitude less I/O than re-deriving keys from document text), appended
per batch under the SAME (app_id, batch_id) exactly-once txn protocol as
the data commits, compacted alongside the main table, and safe from
``manifest.vacuum`` (which only walks ``<table>/data/``).

Key basis: identical to :func:`operators.dedup.exact_dedup`'s
``hash_keys=True`` — ``xxhash64(col, isnull(col), ...)`` two-lane, so
NULL keys compare equal and collision odds are ~2⁻¹²⁸ per pair.

Crash-safety invariant (single writer, as documented on the sink): the
index never runs AHEAD of the data table. Data commits first, keys
second, each guarded by its own txn high-water mark; a crash between the
two leaves the index one batch behind, and the foreachBatch replay of
that same batch repairs it (the data append skips via its mark, the key
append proceeds via its own). Because batch keys are anti-joined against
the index BEFORE append, a key dropped during replay is by construction
already present in the index — the repair can never lose a key. The
index is an EVER-SEEN registry: keys survive row deletes/rewrites of the
main table, which is exactly the documented "key-level at-most-once
across the table's whole history" contract (the r7 snapshot-rescan form
silently re-admitted content that a maintenance rewrite had removed).

Reference parity note: the reference dedups by re-reading its whole SQL
table per DAG run (`newsmaperdag.py` search_id/is_in_base per-row
lookups); this module is the scale-correct form of that contract.

The same side-table discipline now hosts every dedup family's index:
``_keys`` (exact, above), ``_banded`` (MinHash band keys), ``_chunks``
(SimHash pigeonhole chunks + fingerprints), ``_semcells`` +
``_semcentroids`` (SemDeDup cells under frozen centroids, with drift
telemetry and an offline rebuild), and ``_grams`` (substring-span dedup's
distinct gram set) — each parameter-stamped, bootstrap-able from a
pre-existing snapshot, appended under the writer's exactly-once txn
marks, compacted alongside the table, and crash-replay safe.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newsmaper_etl_spark import manifest as M

_KEYS_SUB = "_keys"
_BOOT_APP_SUFFIX = "#keyindex-bootstrap"


def key_index_path(table: str) -> str:
    """The index lives INSIDE the table dir (travels with it on a move)
    but outside ``data/`` — invisible to the main table's manifest reads
    and to vacuum's orphan walk."""
    return os.path.join(table, _KEYS_SUB)


def with_hashed_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Append the two 64-bit key lanes (``__hk1``, ``__hk2``) for the
    column tuple — the exact_dedup/incremental_exact_dedup hashed basis
    (isnull interleave makes NULL keys compare equal)."""
    parts: list = []
    for c in cols:
        parts += [F.col(c), F.isnull(F.col(c))]
    return df.withColumn("__hk1", F.xxhash64(*parts)).withColumn(
        "__hk2", F.xxhash64(F.lit(42), *parts)
    )


def read_key_index(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame | None:
    """The index frame (``__hk1``, ``__hk2``) or None when absent/empty.

    ``version`` time-travels to an older index snapshot — the crash-
    replay determinism hook: a replayed batch whose keys ALREADY
    committed must anti-join against the index as it stood BEFORE that
    commit (``manifest.txn_commit_version(...) - 1``), or the batch
    anti-joins itself out of existence and any later per-batch commit
    (the banded-signature index) is appended from an empty frame
    (ADVICE r08 high)."""
    ktable = key_index_path(table)
    v = M.current_version(ktable) if version is None else version
    if v == 0:
        return None
    return M.read_table(spark, ktable, version=v).select("__hk1", "__hk2")


def anti_join_index(
    batch_df: DataFrame, cols: list[str], index_df: DataFrame
) -> DataFrame:
    """Drop batch rows whose key the index has seen — one hash anti-join
    whose build input is 16 bytes per seen key, never the corpus rows."""
    return (
        with_hashed_keys(batch_df, cols)
        .join(index_df, on=["__hk1", "__hk2"], how="left_anti")
        .drop("__hk1", "__hk2")
    )


def ensure_bootstrap(
    spark: SparkSession, table: str, cols: list[str], app: str,
    version: int | None = None,
) -> bool:
    """One-time index build for a table that predates the index (rows
    committed before ``dedup_keys`` was enabled, or before r8): derive
    the distinct hashed keys from the snapshot — the single deliberate
    O(corpus) scan, paid once instead of per batch — and commit them as
    the index's first version. Returns True if a bootstrap ran.
    Self-heals its own claim orphan like any writer.

    ``version`` pins the build to the PRE-batch snapshot on crash
    replay — defense-in-depth for the replay-determinism invariant
    (every read a replayed batch performs must see the state the
    original run saw): in the reachable crash windows the bootstrap has
    already committed pre-batch content (it runs before the data
    append), but a pinned replay can never be corrupted by a snapshot
    containing the replayed batch's own rows regardless of ordering.
    ``version=0`` (table was empty pre-batch) bootstraps nothing — the
    replay re-derives the batch and its txn-marked appends rebuild both
    indexes completely."""
    ktable = key_index_path(table)
    v = M.current_version(table) if version is None else version
    if M.current_version(ktable) > 0 or v == 0:
        return False
    boot_app = app + _BOOT_APP_SUFFIX
    keys = (
        with_hashed_keys(M.read_table(spark, table, version=v), cols)
        .select("__hk1", "__hk2")
        .distinct()
    )

    def _append() -> int:
        return M.append(
            keys, ktable, txn=(boot_app, 0),
            meta={"op_detail": "keyindex-bootstrap", "covers_version": v},
        )

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(ktable, boot_app, 0):
            raise
        _append()
    return True


def append_batch_keys(
    batch_df: DataFrame, table: str, cols: list[str], app: str, batch_id: int
) -> bool:
    """Commit the batch's distinct keys to the index under the writer's
    (app, batch_id) txn mark — skipped on replay of an already-indexed
    batch, self-healing its own claim orphan. ``batch_df`` must be the
    frame that was (or will be, modulo txn-skip) appended to the DATA
    table: post within-batch dedup, post index anti-join."""
    ktable = key_index_path(table)
    if batch_id <= M.last_txn_version(ktable, app):
        return False
    keys = (
        with_hashed_keys(batch_df, cols).select("__hk1", "__hk2").distinct()
    )

    def _append() -> int:
        return M.append(keys, ktable, txn=(app, int(batch_id)),
                        meta={"app": app, "batch_id": int(batch_id)})

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(ktable, app, int(batch_id)):
            raise
        _append()
    return True


# --------------------------------------------------------------------------
# Banded-signature index (the MinHash near-dedup mirror of the key index)
# --------------------------------------------------------------------------

_BANDED_SUB = "_banded"


def banded_index_path(table: str) -> str:
    return os.path.join(table, _BANDED_SUB)


_BSTAMP = ("__nh", "__nb", "__k")


def _stamped(sigs: DataFrame, num_hashes: int, bands: int, k: int) -> DataFrame:
    """Append the (num_hashes, bands, k) parameterization as constant
    columns (RLE/dict-compressed to ~nothing in parquet) whose footer
    min=max stats land in the manifest — a stamp that survives parquet
    round-trips, compaction, and vacuum, and is validated driver-side
    from the manifest with no Spark job (column METADATA would not: the
    manifest's recorded-DDL schema projection drops it on read)."""
    return (
        sigs.withColumn("__nh", F.lit(num_hashes))
        .withColumn("__nb", F.lit(bands))
        .withColumn("__k", F.lit(k))
    )


def check_banded_stamp(table: str, num_hashes: int, bands: int, k: int) -> None:
    """Raise if the persisted banded index was signed under a different
    (num_hashes, bands, k) than the caller is about to use — mismatched
    parameterizations don't fail, they silently produce band keys that
    never (or spuriously) collide."""
    btable = banded_index_path(table)
    m = M._load_manifest(btable, M.current_version(btable))
    want = dict(zip(_BSTAMP, (num_hashes, bands, k)))
    for e in m["files"]:
        st = e.get("stats", {})
        for c, w in want.items():
            rng = st.get(c)
            if rng is not None and (rng[0] != w or rng[1] != w):
                raise ValueError(
                    f"banded index at {btable} was signed with {c}="
                    f"{rng[0]} but this batch uses {c}={w}; band keys "
                    "from different parameterizations never match — "
                    "rebuild the index or match the parameters"
                )


def read_banded_index(spark: SparkSession, table: str) -> DataFrame | None:
    """The persisted :func:`operators.dedup.banded_signatures` frame for
    the corpus — (id, band, bh), three longs per doc per band. None when
    absent. Callers that are about to JOIN against it should first
    :func:`check_banded_stamp` their parameters."""
    btable = banded_index_path(table)
    if M.current_version(btable) == 0:
        return None
    return M.read_table(spark, btable).drop(*_BSTAMP)


def ensure_banded_bootstrap(
    spark: SparkSession, table: str, id_col: str, text_col: str,
    num_hashes: int, bands: int, k: int, app: str,
    version: int | None = None,
) -> bool:
    """One-time corpus signing for a table that predates the banded
    index — the single deliberate full-corpus MinHash pass, instead of
    re-signing the corpus every batch (the cost the ``seen_banded`` seam
    exists to avoid). ``version`` pins the signing to an older snapshot
    on crash replay (see :func:`ensure_bootstrap`): signing the current
    snapshot would enroll the replayed batch's OWN rows, every batch
    doc would then self-pair at Jaccard 1.0 and drop, and the batch
    would be lost from the data table or its index commits emptied."""
    from newsmaper_etl_spark.operators.dedup import banded_signatures

    btable = banded_index_path(table)
    v = M.current_version(table) if version is None else version
    if M.current_version(btable) > 0 or v == 0:
        return False
    boot_app = app + _BOOT_APP_SUFFIX
    sigs = _stamped(
        banded_signatures(
            M.read_table(spark, table, version=v).select(id_col, text_col),
            id_col, text_col, num_hashes, bands, k,
        ),
        num_hashes, bands, k,
    )

    def _append() -> int:
        return M.append(
            sigs, btable, txn=(boot_app, 0), stat_cols=_BSTAMP,
            meta={"op_detail": "bandedindex-bootstrap", "covers_version": v},
        )

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(btable, boot_app, 0):
            raise
        _append()
    return True


def near_dedup_batch(
    batch_df: DataFrame,
    table: str,
    id_col: str,
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    within_batch: bool = False,
    max_candidate_ids: int = 100_000,
    data_version: int | None = None,
) -> DataFrame:
    """Drop batch docs that near-duplicate ANY already-ingested doc,
    using the persisted banded index — the batch-scaled streaming form
    of :func:`operators.dedup.incremental_minhash_dedup`:

    - candidates: batch band keys ⋈ the persisted index (never
      re-signs the corpus);
    - verify: exact shingle-Jaccard over ONLY the docs that appear in a
      candidate pair — batch docs semi-joined on id_a, and the seen
      bucket-mates fetched from the data table with
      ``read_table(prune_in=(id, candidate_ids))`` manifest file
      skipping, so an id-clustered (or append-local) table opens the
      few files the candidates touch instead of scanning the corpus.
      The candidate id list is a driver materialization bounded by
      ``max_candidate_ids`` (a batch of B docs against sane bucket
      occupancy yields O(B) candidates); above the cap the fetch falls
      back to a distributed semi-join against the full snapshot —
      correct, disclosed, and a sign the LSH parameters need retuning.
      The verify is SIDE-SPLIT (:func:`operators.dedup.
      cross_corpus_losers`): batch and seen shingles never merge under
      a shared id, so a same-id re-crawl with edited text — which
      exact-key dedup on text does not catch — scores its true Jaccard
      instead of a corrupted one (ADVICE r08).

    ``data_version`` pins the seen-doc fetch to an older DATA-table
    snapshot: a crash-replayed batch whose data already committed must
    verify against the corpus as it stood BEFORE that commit, or its
    own committed rows (same-id edits especially) pollute the seen
    side. Parameter drift between the index and this batch's signing
    raises (the banded stamp check)."""
    from newsmaper_etl_spark.operators.dedup import (
        banded_signatures,
        cross_corpus_losers,
        minhash_dedup,
    )

    spark = batch_df.sparkSession
    idx = read_banded_index(spark, table)
    if idx is None:
        return (
            minhash_dedup(batch_df, id_col, text_col, threshold,
                          num_hashes, bands, k)
            if within_batch else batch_df
        )
    check_banded_stamp(table, num_hashes, bands, k)
    nb = banded_signatures(
        batch_df.select(id_col, text_col), id_col, text_col,
        num_hashes, bands, k,
    ).withColumnRenamed(id_col, "__new_id")
    sb = idx.withColumnRenamed(id_col, "__seen_id")
    cands = (
        nb.join(sb, on=["band", "bh"])
        .select(F.col("__new_id").alias("id_a"),
                F.col("__seen_id").alias("id_b"))
        .distinct()
    ).persist()
    try:
        seen_ids = [
            r[0]
            for r in cands.select("id_b").distinct()
            .limit(max_candidate_ids + 1).collect()
        ]
        if not seen_ids:
            out = batch_df
        else:
            if len(seen_ids) > max_candidate_ids:
                seen_docs = M.read_table(
                    spark, table, version=data_version
                ).select(id_col, text_col).join(
                    cands.select(F.col("id_b").alias(id_col)).distinct(),
                    on=id_col, how="left_semi",
                )
            else:
                from pyspark.sql.types import StructField, StructType

                id_type = batch_df.schema[id_col].dataType
                ids_df = spark.createDataFrame(
                    [(i,) for i in seen_ids],
                    StructType([StructField(id_col, id_type)]),
                )
                seen_docs = M.read_table(
                    spark, table, version=data_version,
                    prune_in=(id_col, seen_ids),
                ).select(id_col, text_col).join(
                    F.broadcast(ids_df), on=id_col, how="left_semi",
                )
            losers = cross_corpus_losers(
                batch_df, seen_docs, cands, id_col, text_col, k, threshold
            )
            out = batch_df.join(losers, on=id_col, how="left_anti")
        if within_batch:
            out = minhash_dedup(out, id_col, text_col, threshold,
                                num_hashes, bands, k)
        # materialize before unpersisting the candidate frame the plan
        # depends on
        out = out.localCheckpoint(eager=True)
    finally:
        cands.unpersist()
    return out


def append_batch_banded(
    batch_df: DataFrame, table: str, id_col: str, text_col: str,
    num_hashes: int, bands: int, k: int, app: str, batch_id: int,
) -> bool:
    """Commit the batch survivors' band keys to the banded index under
    the writer's txn mark (replay-skipped, orphan-self-healing) — the
    step that keeps the index covering exactly the corpus so no future
    batch ever re-signs it."""
    from newsmaper_etl_spark.operators.dedup import banded_signatures

    btable = banded_index_path(table)
    if batch_id <= M.last_txn_version(btable, app):
        return False
    sigs = _stamped(
        banded_signatures(
            batch_df.select(id_col, text_col), id_col, text_col,
            num_hashes, bands, k,
        ),
        num_hashes, bands, k,
    )

    def _append() -> int:
        return M.append(sigs, btable, txn=(app, int(batch_id)),
                        stat_cols=_BSTAMP,
                        meta={"app": app, "batch_id": int(batch_id)})

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(btable, app, int(batch_id)):
            raise
        _append()
    return True


def compact_banded_index(
    spark: SparkSession, table: str, min_file_bytes: int = 4 * 1024 * 1024
) -> int:
    btable = banded_index_path(table)
    if M.current_version(btable) == 0:
        return 0
    return M.compact(
        spark, btable, min_file_bytes=min_file_bytes,
        target_file_bytes=64 * 1024 * 1024,
    )


def compact_key_index(
    spark: SparkSession, table: str, min_file_bytes: int = 4 * 1024 * 1024
) -> int:
    """Bin-pack the index's per-batch small files (16 B/row adds up to
    one tiny file per micro-batch forever). Clustering by ``__hk1``
    gives each output file a disjoint lane range — with uniformly-hashed
    batch keys every file still intersects a real batch, so this buys
    footer-stat pruning only for small probes; the load-bearing win is
    the object-count bin-pack. Returns the index's committed version."""
    ktable = key_index_path(table)
    if M.current_version(ktable) == 0:
        return 0
    return M.compact(
        spark, ktable, min_file_bytes=min_file_bytes,
        target_file_bytes=64 * 1024 * 1024,
    )


# --------------------------------------------------------------------------
# SimHash chunk index (the hamming-radius mirror of the banded index)
# --------------------------------------------------------------------------

_CHUNKS_SUB = "_chunks"
_CSTAMP = ("__mh", "__bits")


def chunks_index_path(table: str) -> str:
    return os.path.join(table, _CHUNKS_SUB)


def _cstamped(chunks: DataFrame, max_hamming: int, bits: int) -> DataFrame:
    """(max_hamming, bits) as constant stamp columns whose footer
    min=max stats ride the manifest — the ``keyindex._stamped``
    discipline applied to the SimHash seam (column metadata does not
    survive the manifest's recorded-DDL read)."""
    return chunks.withColumn("__mh", F.lit(max_hamming)).withColumn(
        "__bits", F.lit(bits)
    )


def check_chunks_stamp(table: str, max_hamming: int, bits: int) -> None:
    """Raise on (max_hamming, bits) drift between the persisted chunk
    index and the caller's parameters — drifted chunk keys never (or
    spuriously) collide, and a drifted radius silently changes the
    dedup bar."""
    ctable = chunks_index_path(table)
    m = M._load_manifest(ctable, M.current_version(ctable))
    want = dict(zip(_CSTAMP, (max_hamming, bits)))
    for e in m["files"]:
        st = e.get("stats", {})
        for c, w in want.items():
            rng = st.get(c)
            if rng is not None and (rng[0] != w or rng[1] != w):
                raise ValueError(
                    f"chunk index at {ctable} was signed with {c}="
                    f"{rng[0]} but this batch uses {c}={w}; rebuild the "
                    "index or match the parameters"
                )


def read_chunks_index(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame | None:
    """The persisted :func:`operators.dedup.simhash_chunks` frame for
    the corpus — fingerprints + pigeonhole chunk keys, h+1 rows of 3-4
    longs per doc. None when absent. ``version`` time-travels to an
    older index snapshot (the crash-replay determinism hook — see
    :func:`read_key_index`): unlike the MinHash/semantic paths, the
    simhash verify runs OFF THE INDEX, so a replayed batch whose chunks
    already committed would otherwise self-match at hamming 0 against
    its own fingerprints and empty itself out."""
    ctable = chunks_index_path(table)
    v = M.current_version(ctable) if version is None else version
    if v == 0:
        return None
    return M.read_table(spark, ctable, version=v).drop(*_CSTAMP)


def ensure_chunks_bootstrap(
    spark: SparkSession, table: str, id_col: str, text_col: str,
    max_hamming: int, bits: int, app: str, version: int | None = None,
) -> bool:
    """One-time corpus signing for a table that predates the chunk
    index (the :func:`ensure_banded_bootstrap` twin, incl. the replay
    ``version`` pin)."""
    from newsmaper_etl_spark.operators.dedup import simhash_chunks

    ctable = chunks_index_path(table)
    v = M.current_version(table) if version is None else version
    if M.current_version(ctable) > 0 or v == 0:
        return False
    boot_app = app + _BOOT_APP_SUFFIX
    sigs = _cstamped(
        simhash_chunks(
            M.read_table(spark, table, version=v).select(id_col, text_col),
            id_col, text_col, max_hamming, bits,
        ),
        max_hamming, bits,
    )

    def _append() -> int:
        return M.append(
            sigs, ctable, txn=(boot_app, 0), stat_cols=_CSTAMP,
            meta={"op_detail": "chunkindex-bootstrap", "covers_version": v},
        )

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(ctable, boot_app, 0):
            raise
        _append()
    return True


def simhash_dedup_batch(
    batch_df: DataFrame,
    table: str,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 64,
    within_batch: bool = False,
    index_version: int | None = None,
) -> DataFrame:
    """Drop batch docs within SimHash hamming radius of ANY ingested
    doc, via the persisted chunk index — the streaming form of
    :func:`operators.dedup.incremental_simhash_dedup`. Unlike the
    MinHash path there is NO verify fetch against the data table at
    all: the index carries the fingerprints, so the per-batch read is
    exactly the index's h+1 narrow rows per seen doc. Parameter drift
    raises (the chunk stamp check). Returns an eagerly-materialized
    frame (the sink appends it to multiple targets).

    ``index_version`` pins the chunk-index read on crash replay (code
    review r11): when a LATER per-batch commit (the ``_grams`` table)
    is still pending, the replay re-runs this gate AFTER the batch's
    own chunks committed — unpinned, every redelivered row would
    self-match at hamming 0 and the batch would empty out, and the
    pending commit would then be appended from an empty frame."""
    from newsmaper_etl_spark.operators.dedup import (
        incremental_simhash_dedup,
        simhash_dedup,
    )

    spark = batch_df.sparkSession
    idx = read_chunks_index(spark, table, version=index_version)
    if idx is None:
        out = (
            simhash_dedup(batch_df, id_col, text_col, max_hamming, bits)
            if within_batch else batch_df
        )
        return out
    check_chunks_stamp(table, max_hamming, bits)
    out = incremental_simhash_dedup(
        batch_df, None, id_col, text_col, max_hamming, bits,
        within_batch=within_batch, seen_chunks=idx,
    )
    return out.localCheckpoint(eager=True)


def append_batch_chunks(
    batch_df: DataFrame, table: str, id_col: str, text_col: str,
    max_hamming: int, bits: int, app: str, batch_id: int,
) -> bool:
    """Commit the batch survivors' chunk rows to the index under the
    writer's txn mark (replay-skipped, orphan-self-healing)."""
    from newsmaper_etl_spark.operators.dedup import simhash_chunks

    ctable = chunks_index_path(table)
    if batch_id <= M.last_txn_version(ctable, app):
        return False
    sigs = _cstamped(
        simhash_chunks(
            batch_df.select(id_col, text_col), id_col, text_col,
            max_hamming, bits,
        ),
        max_hamming, bits,
    )

    def _append() -> int:
        return M.append(sigs, ctable, txn=(app, int(batch_id)),
                        stat_cols=_CSTAMP,
                        meta={"app": app, "batch_id": int(batch_id)})

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(ctable, app, int(batch_id)):
            raise
        _append()
    return True


def compact_chunks_index(
    spark: SparkSession, table: str, min_file_bytes: int = 4 * 1024 * 1024
) -> int:
    ctable = chunks_index_path(table)
    if M.current_version(ctable) == 0:
        return 0
    return M.compact(
        spark, ctable, min_file_bytes=min_file_bytes,
        target_file_bytes=64 * 1024 * 1024,
    )

# --------------------------------------------------------------------------
# Semantic (embedding) cell index — the SemDeDup mirror of the banded index
# --------------------------------------------------------------------------

_SEMCELLS_SUB = "_semcells"
_SEMCENTROIDS_SUB = "_semcentroids"
_SSTAMP = ("__nc", "__np", "__nt", "__dim", "__seed")


def semcells_index_path(table: str) -> str:
    return os.path.join(table, _SEMCELLS_SUB)


def semcentroids_path(table: str) -> str:
    return os.path.join(table, _SEMCENTROIDS_SUB)


def _sstamped(df: DataFrame, nc: int, np_: int, nt: int, dim: int,
              seed: int) -> DataFrame:
    """(n_centroids, n_planes, n_tables, dim, seed) as constant stamp
    columns whose footer min=max stats ride the manifest — the
    ``keyindex._stamped`` discipline applied to the SemDeDup seam. The
    WHOLE parameterization must be frozen at index birth: cells from a
    different centroid set, or buckets from a different plane
    count/seed, never (or spuriously) collide."""
    return (
        df.withColumn("__nc", F.lit(nc)).withColumn("__np", F.lit(np_))
        .withColumn("__nt", F.lit(nt)).withColumn("__dim", F.lit(dim))
        .withColumn("__seed", F.lit(seed))
    )


def _read_stamp(tablepath: str, cols: tuple[str, ...]) -> dict | None:
    """The constant stamp values recorded in a side table's manifest
    footer stats (driver-side, no Spark job), or None when the table is
    absent. Raises on a non-constant stamp column (files signed under
    drifting parameters — an index that must be rebuilt)."""
    v = M.current_version(tablepath)
    if v == 0:
        return None
    m = M._load_manifest(tablepath, v)
    out: dict = {}
    for e in m["files"]:
        st = e.get("stats", {})
        for c in cols:
            rng = st.get(c)
            if rng is None:
                continue
            if rng[0] != rng[1] or (c in out and out[c] != rng[0]):
                raise ValueError(
                    f"index at {tablepath} carries a drifting stamp "
                    f"{c}={rng} vs {out.get(c)}; rebuild the index"
                )
            out[c] = rng[0]
    return out or None


def read_semantic_params(table: str) -> dict | None:
    """The frozen (n_centroids, n_planes, n_tables, dim, seed) the
    semantic index was signed under — read from the CENTROIDS table's
    stamp so it is available the moment centroids exist (the crash
    window between the centroid commit and the first cells commit)."""
    st = _read_stamp(semcentroids_path(table), _SSTAMP)
    if st is None:
        return None
    return {"n_centroids": st["__nc"], "n_planes": st["__np"],
            "n_tables": st["__nt"], "dim": st["__dim"],
            "seed": st["__seed"]}


def read_semcells_index(spark: SparkSession, table: str) -> DataFrame | None:
    """The persisted (id, cell, t, b) frame for the corpus — one narrow
    row per (doc, LSH table). None when absent."""
    stable = semcells_index_path(table)
    if M.current_version(stable) == 0:
        return None
    return M.read_table(spark, stable).drop(*_SSTAMP)


def read_centroids(spark: SparkSession, table: str) -> list[list[float]] | None:
    """The frozen centroid matrix (cell-ordered, bounded n_centroids
    rows — a sanctioned driver materialization). None when absent."""
    ctable = semcentroids_path(table)
    if M.current_version(ctable) == 0:
        return None
    rows = (
        M.read_table(spark, ctable).select("cell", "c")
        .orderBy("cell").collect()
    )
    return [list(r["c"]) for r in rows]


def _centroid_frame(
    spark: SparkSession, cents: list[list[float]], n_centroids: int,
    n_planes: int, n_tables: int, dim: int, seed: int,
) -> DataFrame:
    """The stamped (cell, c) frame both centroid writers commit —
    factored so bootstrap (:func:`_commit_centroids`) and offline
    rebuild (:func:`rebuild_semantic_index`) can never fork the
    centroid-table format."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StructField, StructType,
    )

    return _sstamped(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
            StructType([
                StructField("cell", IntegerType()),
                StructField("c", ArrayType(DoubleType())),
            ]),
        ),
        n_centroids, n_planes, n_tables, dim, seed,
    )


def _commit_centroids(
    spark: SparkSession, table: str, src_df: DataFrame, vec_col: str,
    dim: int, n_centroids: int, n_planes: int | None, n_tables: int,
    sample_n: int, seed: int, app: str,
) -> tuple[list[list[float]], int]:
    """Train spherical-k-means centroids on ``src_df`` (snapshot at
    bootstrap, or the first batch of a born-streaming table) and commit
    them — WITH the full parameter stamp — as the semantic index's
    frozen assignment basis. Returns (centroids, n_planes). Idempotent:
    persisted centroids win over retraining (a crash between the
    centroid commit and the first cells commit must not re-train on a
    different frame and silently fork the cell space)."""
    from newsmaper_etl_spark.operators.similarity import (
        _auto_planes,
        _kmeans_centroids,
    )

    ctable = semcentroids_path(table)
    params = read_semantic_params(table)
    if params is not None:
        cents = read_centroids(spark, table)
        return cents, params["n_planes"]
    if n_planes is None:
        n_planes = _auto_planes(src_df.count())
    cents = _kmeans_centroids(src_df, vec_col, n_centroids, sample_n,
                              seed=seed)
    cdf = _centroid_frame(spark, cents, n_centroids, n_planes, n_tables,
                          dim, seed)
    boot_app = app + _BOOT_APP_SUFFIX

    def _append() -> int:
        return M.append(
            cdf, ctable, txn=(boot_app, 0), stat_cols=_SSTAMP,
            meta={"op_detail": "semcentroids"},
        )

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(ctable, boot_app, 0):
            raise
        _append()
    # a racer may have committed first: the persisted set is canonical
    params = read_semantic_params(table)
    return read_centroids(spark, table), params["n_planes"]


def ensure_semantic_bootstrap(
    spark: SparkSession, table: str, id_col: str, vec_col: str, dim: int,
    n_centroids: int, n_planes: int | None, n_tables: int, sample_n: int,
    seed: int, app: str, version: int | None = None,
) -> bool:
    """One-time corpus signing for a table that predates the semantic
    index (the :func:`ensure_banded_bootstrap` twin, incl. the replay
    ``version`` pin): train + commit the frozen centroids, then commit
    every snapshot row's (cell, t, b) keys. The single deliberate
    O(corpus) assignment pass, paid once instead of per batch."""
    from newsmaper_etl_spark.operators.similarity import semantic_cell_keys

    stable = semcells_index_path(table)
    v = M.current_version(table) if version is None else version
    if M.current_version(stable) > 0 or v == 0:
        return False
    snap = M.read_table(spark, table, version=v).select(id_col, vec_col)
    cents, np_ = _commit_centroids(
        spark, table, snap, vec_col, dim, n_centroids, n_planes, n_tables,
        sample_n, seed, app,
    )
    keys = _sstamped(
        semantic_cell_keys(snap, dim, id_col, vec_col, cents, np_,
                           n_tables, seed),
        n_centroids, np_, n_tables, dim, seed,
    )
    boot_app = app + _BOOT_APP_SUFFIX
    # BASELINE drift entry: the affinity of the very corpus the
    # centroids were trained on — the reference later batches decay from
    drift = _affinity_stats(snap, vec_col, cents, dim)

    def _append() -> int:
        return M.append(
            keys, stable, txn=(boot_app, 0), stat_cols=_SSTAMP,
            meta={"op_detail": "semcells-bootstrap", "covers_version": v,
                  "drift": drift},
        )

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(stable, boot_app, 0):
            raise
        _append()
    return True


def check_semantic_stamp(table: str, dim: int, n_centroids: int | None,
                         n_tables: int | None, seed: int | None) -> dict:
    """Validate the caller's parameters against the frozen stamp and
    return the full frozen parameterization (the caller takes n_planes —
    and any parameter it passed as None — from the index, not the other
    way around). Raises on drift: cells/buckets signed under different
    centroids, planes, or seeds never (or spuriously) collide."""
    params = read_semantic_params(table)
    if params is None:
        raise ValueError(f"no semantic index at {semcells_index_path(table)}")
    for name, want in (("dim", dim), ("n_centroids", n_centroids),
                       ("n_tables", n_tables), ("seed", seed)):
        if want is not None and params[name] != want:
            raise ValueError(
                f"semantic index at {table} was signed with {name}="
                f"{params[name]} but this batch uses {name}={want}; "
                "rebuild the index or match the parameters"
            )
    return params


def semantic_dedup_batch(
    batch_df: DataFrame,
    table: str,
    id_col: str,
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.9,
    within_batch: bool = False,
    max_candidate_ids: int = 100_000,
    data_version: int | None = None,
    n_centroids: int | None = None,
    n_tables: int | None = None,
    seed: int | None = None,
) -> DataFrame:
    """Drop batch docs that semantically duplicate ANY already-ingested
    doc (exact cosine ≥ threshold within the same frozen k-means cell),
    via the persisted cell index — the batch-scaled streaming form of
    :func:`operators.similarity.semantic_dedup` that VERDICT r09 'do
    this' #6 names (SemDeDup ran batch-only; a 100 TB ingest needs the
    per-batch cost to be index-sized, not a nightly re-cluster).

    Shape mirrors :func:`near_dedup_batch`: candidates = batch (cell,
    t, b) keys ⋈ the persisted index (the corpus is never re-assigned);
    verify = exact cosine on candidate pairs only, with the seen
    vectors point-fetched from the data table via manifest ``prune_in``
    file skipping, bounded by ``max_candidate_ids`` (above the cap: a
    distributed semi-join fallback — correct, disclosed, a sign the LSH
    parameters need retuning). ``data_version`` pins the seen fetch to
    the pre-batch snapshot on crash replay. Same-id re-crawl versions
    in the data table verify independently per version row — a batch
    doc drops iff ANY committed version scores ≥ threshold (the
    version-aware contract the MinHash path got in r9).

    Centroids are FROZEN at index birth: cells stay comparable across
    batches by construction. Corpus drift degrades cell tightness, not
    correctness (every assignment uses the same centroids); re-cluster
    by rebuilding the index offline when drift warrants it."""
    from newsmaper_etl_spark.operators.similarity import (
        semantic_cell_keys,
        semantic_dedup,
        semantic_losers_vs_seen,
    )

    spark = batch_df.sparkSession
    if semantic_index_stale(table):
        raise ValueError(
            f"semantic index at {table} is mid-rebuild (centroids flipped, "
            "cells not re-signed) — re-run rebuild_semantic_index to "
            "converge before deduping against it"
        )
    idx = read_semcells_index(spark, table)
    if idx is None:
        out = (
            semantic_dedup(batch_df, dim, id_col, vec_col, threshold,
                           keep="min_id")
            if within_batch else batch_df
        )
        return out
    params = check_semantic_stamp(table, dim, n_centroids, n_tables, seed)
    cents = read_centroids(spark, table)
    nb = semantic_cell_keys(
        batch_df.select(id_col, vec_col), dim, id_col, vec_col, cents,
        params["n_planes"], params["n_tables"], params["seed"],
    ).withColumnRenamed(id_col, "__new_id")
    sb = idx.withColumnRenamed(id_col, "__seen_id")
    cands = (
        nb.join(sb, on=["cell", "t", "b"])
        .select(F.col("__new_id").alias("id_a"),
                F.col("__seen_id").alias("id_b"))
        .distinct()
    ).persist()
    try:
        seen_ids = [
            r[0]
            for r in cands.select("id_b").distinct()
            .limit(max_candidate_ids + 1).collect()
        ]
        if not seen_ids:
            out = batch_df
        else:
            if len(seen_ids) > max_candidate_ids:
                seen_vecs = M.read_table(
                    spark, table, version=data_version
                ).select(id_col, vec_col).join(
                    cands.select(F.col("id_b").alias(id_col)).distinct(),
                    on=id_col, how="left_semi",
                )
            else:
                from pyspark.sql.types import StructField, StructType

                id_type = batch_df.schema[id_col].dataType
                ids_df = spark.createDataFrame(
                    [(i,) for i in seen_ids],
                    StructType([StructField(id_col, id_type)]),
                )
                seen_vecs = M.read_table(
                    spark, table, version=data_version,
                    prune_in=(id_col, seen_ids),
                ).select(id_col, vec_col).join(
                    F.broadcast(ids_df), on=id_col, how="left_semi",
                )
            losers = semantic_losers_vs_seen(
                batch_df, seen_vecs, cands, id_col, vec_col, dim, threshold
            )
            out = batch_df.join(losers, on=id_col, how="left_anti")
        if within_batch:
            out = semantic_dedup(out, dim, id_col, vec_col, threshold,
                                 keep="min_id")
        out = out.localCheckpoint(eager=True)
    finally:
        cands.unpersist()
    return out


def append_batch_cells(
    batch_df: DataFrame, table: str, id_col: str, vec_col: str, dim: int,
    n_centroids: int, n_planes: int | None, n_tables: int, sample_n: int,
    seed: int, app: str, batch_id: int,
) -> bool:
    """Commit the batch survivors' (cell, t, b) keys to the semantic
    index under the writer's txn mark (replay-skipped,
    orphan-self-healing). A born-streaming table (no snapshot to
    bootstrap from) trains its frozen centroids HERE, on the first
    batch that reaches the index — deterministic for a fixed batch +
    seed, and persisted-wins on any replay or race."""
    from newsmaper_etl_spark.operators.similarity import semantic_cell_keys

    stable = semcells_index_path(table)
    if batch_id <= M.last_txn_version(stable, app):
        return False
    if semantic_index_stale(table):
        # same guard as semantic_dedup_batch, on the WRITE path: a
        # commit landing in rebuild_semantic_index's crash window would
        # append keys signed under the flipped centroid stamp to a
        # cells table still carrying the old one — the __seed stat goes
        # non-constant and every later stamp read raises, bricking the
        # documented replay recovery
        raise ValueError(
            f"semantic index at {table} is mid-rebuild (centroids "
            "flipped, cells not re-signed) — re-run "
            "rebuild_semantic_index before committing batch keys"
        )
    spark = batch_df.sparkSession
    cents, np_ = _commit_centroids(
        spark, table, batch_df.select(id_col, vec_col), vec_col, dim,
        n_centroids, n_planes, n_tables, sample_n, seed, app,
    )
    # stamp + key under the index's FROZEN parameterization (which a
    # pre-existing centroid commit may own), never the caller's
    params = check_semantic_stamp(table, dim, n_centroids, n_tables, seed)
    keys = _sstamped(
        semantic_cell_keys(batch_df.select(id_col, vec_col), dim, id_col,
                           vec_col, cents, np_, params["n_tables"],
                           params["seed"]),
        params["n_centroids"], np_, params["n_tables"], dim,
        params["seed"],
    )
    # drift telemetry riding the commit (VERDICT r10 #8): batch-scaled
    # affinity vs the frozen centroids — see semantic_drift_history
    drift = _affinity_stats(batch_df, vec_col, cents, dim)

    def _append() -> int:
        return M.append(keys, stable, txn=(app, int(batch_id)),
                        stat_cols=_SSTAMP,
                        meta={"app": app, "batch_id": int(batch_id),
                              "drift": drift})

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(stable, app, int(batch_id)):
            raise
        _append()
    return True


def compact_semcells_index(
    spark: SparkSession, table: str, min_file_bytes: int = 4 * 1024 * 1024
) -> int:
    stable = semcells_index_path(table)
    if M.current_version(stable) == 0:
        return 0
    return M.compact(
        spark, stable, min_file_bytes=min_file_bytes,
        target_file_bytes=64 * 1024 * 1024,
    )


# --------------------------------------------------------------------------
# Corpus gram index — the substring-span-dedup mirror of _keys/_banded
# --------------------------------------------------------------------------

_GRAMS_SUB = "_grams"
_GSTAMP = ("__gk",)


def grams_index_path(table: str) -> str:
    return os.path.join(table, _GRAMS_SUB)


def _gstamped(df: DataFrame, k: int) -> DataFrame:
    """k as a constant stamp column (footer min=max stats ride the
    manifest): gram hashes built at one window width never compare
    against another's."""
    return df.withColumn("__gk", F.lit(k))


def check_grams_stamp(table: str, k: int) -> None:
    """Raise when the persisted gram index was built at a different
    window width than this batch's signing."""
    st = _read_stamp(grams_index_path(table), _GSTAMP)
    if st is not None and st.get("__gk") != k:
        raise ValueError(
            f"gram index at {table} was built with k={st.get('__gk')} "
            f"but this batch is being signed with k={k}; gram hashes "
            "from different window widths never match — rebuild one side"
        )


def read_grams_index(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame | None:
    """The persisted distinct-gram-hash frame (one 8-byte column), or
    None when absent. Honest size note: ~one row per corpus TOKEN —
    orders beyond the per-doc banded/chunks indexes (the suffix-array
    literature builds its structure offline for the same reason); at
    100 TB it shards by hash range, and per-batch cost is still batch
    grams ⋈ index instead of re-gramming the corpus."""
    gtable = grams_index_path(table)
    if M.current_version(gtable) == 0:
        return None
    return M.read_table(spark, gtable, version=version).drop(*_GSTAMP)


def ensure_grams_bootstrap(
    spark: SparkSession, table: str, id_col: str, text_col: str, k: int,
    app: str, version: int | None = None,
) -> bool:
    """One-time gram registration for a table that predates the index —
    the single deliberate O(corpus-tokens) pass (``version`` pins the
    snapshot on crash replay, the :func:`ensure_banded_bootstrap`
    rule: signing the current snapshot would enroll the replayed
    batch's own rows and every batch gram would self-cover)."""
    from newsmaper_etl_spark.operators.dedup import corpus_gram_index

    gtable = grams_index_path(table)
    v = M.current_version(table) if version is None else version
    if M.current_version(gtable) > 0 or v == 0:
        return False
    boot_app = app + _BOOT_APP_SUFFIX
    grams = _gstamped(
        corpus_gram_index(
            M.read_table(spark, table, version=v).select(id_col, text_col),
            id_col, text_col, k,
        ),
        k,
    )

    def _append() -> int:
        return M.append(
            grams, gtable, txn=(boot_app, 0), stat_cols=_GSTAMP,
            meta={"op_detail": "gramsindex-bootstrap", "covers_version": v},
        )

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(gtable, boot_app, 0):
            raise
        _append()
    return True


def span_dedup_batch(
    batch_df: DataFrame,
    table: str,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """EDIT the batch against the persisted gram index: every span the
    corpus already holds (and every within-batch non-first repeat) is
    excised from ``text_col``; all other columns ride through, rows are
    never dropped — span dedup is a rewrite gate, not a filter (the
    :func:`operators.dedup.incremental_remove_duplicate_spans`
    composition on the streaming seam). With no index yet (born-
    streaming first batch), only the within-batch rule applies. The
    result is eagerly materialized: it feeds two commits (data, then
    grams) that must see identical rows."""
    from newsmaper_etl_spark.operators.dedup import (
        incremental_duplicate_span_positions,
        _excise_positions,
    )

    spark = batch_df.sparkSession
    check_grams_stamp(table, k)
    idx = read_grams_index(spark, table)
    if idx is None:
        idx = spark.range(0).select(F.col("id").alias("g"))
    covered = incremental_duplicate_span_positions(
        batch_df, None, id_col, text_col, k, seen_grams=idx,
        distinct=False,
    )
    # one edited row per id BEFORE the join-back: a duplicate-id batch
    # (at-least-once source without dedup_keys — a contract violation,
    # ids must be batch-unique like every *_batch gate documents) would
    # otherwise multiply rows 2x2 through the many-to-many join; with
    # the dropDuplicates the row COUNT is preserved even on dirty input
    # (code review r11)
    edited = _excise_positions(
        batch_df, covered, id_col, text_col
    ).dropDuplicates([id_col])
    cols = [
        F.col("__e.text_dedup").alias(text_col) if c == text_col
        else F.col(f"__b.{c}")
        for c in batch_df.columns
    ]
    out = (
        batch_df.alias("__b")
        .join(edited.alias("__e"), on=id_col)
        .select(*cols)
    )
    return out.localCheckpoint(eager=True)


def append_batch_grams(
    batch_df: DataFrame, table: str, id_col: str, text_col: str, k: int,
    app: str, batch_id: int,
) -> bool:
    """Commit the batch's NEW gram hashes (anti-joined against the
    index so the stored frame stays a set) under the writer's txn mark —
    replay-skipped, orphan-self-healing. ``batch_df`` must be the
    AS-COMMITTED (already span-edited) rows: the induction every future
    batch relies on is that the index covers exactly the grams the
    corpus text still contains."""
    from newsmaper_etl_spark.operators.dedup import corpus_gram_index

    gtable = grams_index_path(table)
    if batch_id <= M.last_txn_version(gtable, app):
        return False
    spark = batch_df.sparkSession
    grams = corpus_gram_index(
        batch_df.select(id_col, text_col), id_col, text_col, k
    )
    idx = read_grams_index(spark, table)
    if idx is not None:
        grams = grams.join(idx, on="g", how="left_anti")

    def _append() -> int:
        return M.append(_gstamped(grams, k), gtable,
                        txn=(app, int(batch_id)), stat_cols=_GSTAMP,
                        meta={"app": app, "batch_id": int(batch_id)})

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(gtable, app, int(batch_id)):
            raise
        _append()
    return True


def compact_grams_index(
    spark: SparkSession, table: str, min_file_bytes: int = 4 * 1024 * 1024
) -> int:
    gtable = grams_index_path(table)
    if M.current_version(gtable) == 0:
        return 0
    return M.compact(
        spark, gtable, min_file_bytes=min_file_bytes,
        target_file_bytes=64 * 1024 * 1024,
    )


# --------------------------------------------------------------------------
# Paragraph-hash index (incremental/streaming paragraph dedup, r12)
# --------------------------------------------------------------------------

_PARAS_SUB = "_paras"
_PSTAMP = ("__psep",)


def paras_index_path(table: str) -> str:
    return os.path.join(table, _PARAS_SUB)


def _sep_fingerprint(sep: str) -> int:
    """Deterministic int fingerprint of the separator for the stamp
    column (string parquet footer stats are bytes-typed and not
    JSON-safe across engines; an int stamp rides the same manifest
    machinery as __gk)."""
    import zlib

    return zlib.crc32(sep.encode("utf-8"))


def _pstamped(df: DataFrame, sep: str) -> DataFrame:
    """Separator fingerprint as a constant stamp column: paragraph
    hashes split under one separator never compare against another's
    (the __gk rule at paragraph granularity)."""
    return df.withColumn("__psep", F.lit(_sep_fingerprint(sep)))


def check_paras_stamp(table: str, sep: str) -> None:
    """Raise when the persisted paragraph index was built under a
    different separator than this batch's split."""
    st = _read_stamp(paras_index_path(table), _PSTAMP)
    if st is not None and st.get("__psep") != _sep_fingerprint(sep):
        raise ValueError(
            f"paragraph index at {table} was built under a different "
            f"separator (stamp {st.get('__psep')} vs "
            f"{_sep_fingerprint(sep)}); hashes from different splits "
            "never match — rebuild one side"
        )


def read_paras_index(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame | None:
    """The persisted distinct-paragraph-hash frame (one 8-byte ``ph``
    column — a few rows per DOC, the lightest index in this module), or
    None when absent."""
    ptable = paras_index_path(table)
    if M.current_version(ptable) == 0:
        return None
    return M.read_table(spark, ptable, version=version).drop(*_PSTAMP)


def ensure_paras_bootstrap(
    spark: SparkSession, table: str, id_col: str, text_col: str,
    sep: str, app: str, version: int | None = None,
) -> bool:
    """One-time paragraph registration for a table that predates the
    index (``version`` pins the snapshot on crash replay — the
    :func:`ensure_grams_bootstrap` rule: signing the current snapshot
    would enroll the replayed batch's own rows and every batch
    paragraph would self-cover)."""
    from newsmaper_etl_spark.operators.dedup import corpus_paragraph_index

    ptable = paras_index_path(table)
    v = M.current_version(table) if version is None else version
    if M.current_version(ptable) > 0 or v == 0:
        return False
    boot_app = app + _BOOT_APP_SUFFIX
    paras = _pstamped(
        corpus_paragraph_index(
            M.read_table(spark, table, version=v).select(id_col, text_col),
            id_col, text_col, sep,
        ),
        sep,
    )

    def _append() -> int:
        return M.append(
            paras, ptable, txn=(boot_app, 0), stat_cols=_PSTAMP,
            meta={"op_detail": "parasindex-bootstrap", "covers_version": v},
        )

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(ptable, boot_app, 0):
            raise
        _append()
    return True


def paragraph_dedup_batch(
    batch_df: DataFrame,
    table: str,
    id_col: str,
    text_col: str = "text",
    sep: str = "\n\n",
    index_version: int | None = None,
) -> DataFrame:
    """EDIT the batch against the persisted paragraph index: every
    paragraph the corpus already holds (and every within-batch
    non-first repeat) is excised from ``text_col``; all other columns
    ride through, rows are never dropped (the
    :func:`operators.dedup.incremental_paragraph_dedup` composition on
    the streaming seam — a rewrite gate, not a filter). With no index
    yet (born-streaming first batch), only the within-batch rule
    applies. Eagerly materialized: it feeds two commits (data, then
    paras) that must see identical rows. ``index_version`` pins the
    index read on crash replay with a pending LATER commit (the
    simhash_dedup_batch rule): if this batch's own paras already
    committed, reading the current index would self-match every
    redelivered row and empty the batch."""
    from newsmaper_etl_spark.operators.dedup import (
        incremental_paragraph_dedup,
    )

    spark = batch_df.sparkSession
    check_paras_stamp(table, sep)
    idx = read_paras_index(spark, table, version=index_version)
    if idx is None:
        idx = spark.range(0).select(F.col("id").alias("ph"))
    edited = incremental_paragraph_dedup(
        batch_df, None, id_col, text_col, sep, seen_paras=idx
    ).dropDuplicates([id_col])
    cols = [
        F.col("__e.text_dedup").alias(text_col) if c == text_col
        else F.col(f"__b.{c}")
        for c in batch_df.columns
    ]
    out = (
        batch_df.alias("__b")
        .join(edited.alias("__e"), on=id_col)
        .select(*cols)
    )
    return out.localCheckpoint(eager=True)


def append_batch_paras(
    batch_df: DataFrame, table: str, id_col: str, text_col: str,
    sep: str, app: str, batch_id: int,
) -> bool:
    """Commit the batch's NEW paragraph hashes (anti-joined against the
    index so the stored frame stays a set) under the writer's txn
    mark — replay-skipped, orphan-self-healing. ``batch_df`` must be
    the AS-COMMITTED (already paragraph-edited) rows: the induction
    every future batch relies on is that the index covers exactly the
    paragraphs the corpus text still contains."""
    from newsmaper_etl_spark.operators.dedup import corpus_paragraph_index

    ptable = paras_index_path(table)
    if batch_id <= M.last_txn_version(ptable, app):
        return False
    spark = batch_df.sparkSession
    paras = corpus_paragraph_index(
        batch_df.select(id_col, text_col), id_col, text_col, sep
    )
    idx = read_paras_index(spark, table)
    if idx is not None:
        paras = paras.join(idx, on="ph", how="left_anti")

    def _append() -> int:
        return M.append(_pstamped(paras, sep), ptable,
                        txn=(app, int(batch_id)), stat_cols=_PSTAMP,
                        meta={"app": app, "batch_id": int(batch_id)})

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(ptable, app, int(batch_id)):
            raise
        _append()
    return True


def compact_paras_index(
    spark: SparkSession, table: str, min_file_bytes: int = 4 * 1024 * 1024
) -> int:
    ptable = paras_index_path(table)
    if M.current_version(ptable) == 0:
        return 0
    return M.compact(
        spark, ptable, min_file_bytes=min_file_bytes,
        target_file_bytes=64 * 1024 * 1024,
    )


# --------------------------------------------------------------------------
# Per-domain statistics index (incremental/streaming domain gate, r14)
# --------------------------------------------------------------------------

_DOMAINS_SUB = "_domains"
_DSTAMP = ("__dpsl",)


def domains_index_path(table: str) -> str:
    return os.path.join(table, _DOMAINS_SUB)


def _domains_fingerprint(tokens: bool) -> int:
    """Stamp fingerprint: the PSL rule snapshot the domains were derived
    under (a different rule set groups hosts differently — stats would
    silently mis-merge) plus whether token sums are carried (an index
    without sums cannot later gate on min_sum_tokens)."""
    import zlib

    from newsmaper_etl_spark.operators.web import DEFAULT_PSL_RULES

    basis = "\n".join(sorted(DEFAULT_PSL_RULES)) + f"\n#tokens={tokens}"
    return zlib.crc32(basis.encode("utf-8"))


def _dstamped(df: DataFrame, tokens: bool) -> DataFrame:
    return df.withColumn("__dpsl", F.lit(_domains_fingerprint(tokens)))


def check_domains_stamp(table: str, tokens: bool) -> None:
    st = _read_stamp(domains_index_path(table), _DSTAMP)
    if st is not None and st.get("__dpsl") != _domains_fingerprint(tokens):
        raise ValueError(
            f"domains index at {table} was built under a different PSL "
            f"snapshot or token basis (stamp {st.get('__dpsl')} vs "
            f"{_domains_fingerprint(tokens)}); per-domain stats from "
            "different groupings never merge — rebuild the index"
        )


def _batch_domain_stats(
    batch_df: DataFrame, url_col: str, tokens_col: str | None
) -> DataFrame:
    from newsmaper_etl_spark.operators.web import domain_stats

    return domain_stats(batch_df, url_col=url_col, tokens_col=tokens_col)


def read_domains_index(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame | None:
    """The ACCUMULATED per-domain statistics ``(domain, n_docs
    [, sum_tokens])`` or None when absent. Stored rows are per-batch
    PARTIALS (append-only — counts and sums are decomposable, so a
    batch commit is one tiny delta frame, never a rewrite); the merge
    is one groupBy over a domain-cardinality frame, paid here on read.
    ``version`` pins the crash-replay read (the read_paras_index
    rule)."""
    dtable = domains_index_path(table)
    v = M.current_version(dtable) if version is None else version
    if v == 0:
        return None
    raw = M.read_table(spark, dtable, version=v).drop(*_DSTAMP)
    aggs = [F.sum("n_docs").cast("long").alias("n_docs")]
    if "sum_tokens" in raw.columns:
        aggs.append(F.sum("sum_tokens").cast("long").alias("sum_tokens"))
    return raw.groupBy("domain").agg(*aggs)


def ensure_domains_bootstrap(
    spark: SparkSession, table: str, url_col: str,
    tokens_col: str | None, app: str, version: int | None = None,
) -> bool:
    """One-time stats build for a table that predates the index — the
    single deliberate O(corpus) aggregation, paid once (``version``
    pins the pre-batch snapshot on crash replay, the
    ensure_paras_bootstrap rule)."""
    dtable = domains_index_path(table)
    v = M.current_version(table) if version is None else version
    if M.current_version(dtable) > 0 or v == 0:
        return False
    boot_app = app + _BOOT_APP_SUFFIX
    stats = _dstamped(
        _batch_domain_stats(
            M.read_table(spark, table, version=v), url_col, tokens_col
        ),
        tokens_col is not None,
    )

    def _append() -> int:
        return M.append(
            stats, dtable, txn=(boot_app, 0), stat_cols=_DSTAMP,
            meta={"op_detail": "domainsindex-bootstrap",
                  "covers_version": v},
        )

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(dtable, boot_app, 0):
            raise
        _append()
    return True


def domain_gate_batch(
    batch_df: DataFrame,
    table: str,
    url_col: str,
    tokens_col: str | None = None,
    min_docs: int | None = None,
    max_docs: int | None = None,
    min_sum_tokens: int | None = None,
    index_version: int | None = None,
) -> DataFrame:
    """GATE the batch against the accumulated per-domain statistics
    (:func:`operators.web.domain_gate_incremental` on the streaming
    seam): rows whose domain's combined (index + this batch) stats
    fail the thresholds are dropped; NULL-domain rows pass. With no
    index yet (born-streaming first batch), the batch's own stats
    gate it. Eagerly materialized: it feeds two commits (data, then
    domain deltas) that must see identical rows. ``index_version``
    pins the index read on crash replay with a pending LATER commit
    (the paragraph_dedup_batch rule): if this batch's own deltas
    already committed, reading the current index would double-count
    the batch and the gate decisions would not reproduce."""
    from newsmaper_etl_spark.operators.web import domain_gate_incremental

    spark = batch_df.sparkSession
    check_domains_stamp(table, tokens_col is not None)
    idx = read_domains_index(spark, table, version=index_version)
    if idx is None:
        cols = [F.lit("").alias("domain"),
                F.lit(0).cast("long").alias("n_docs")]
        if tokens_col is not None:
            cols.append(F.lit(0).cast("long").alias("sum_tokens"))
        idx = spark.range(0).select(*cols)
    out = domain_gate_incremental(
        batch_df, idx, url_col=url_col, tokens_col=tokens_col,
        min_docs=min_docs, max_docs=max_docs,
        min_sum_tokens=min_sum_tokens,
    )
    return out.localCheckpoint(eager=True)


def append_batch_domains(
    batch_df: DataFrame, table: str, url_col: str,
    tokens_col: str | None, app: str, batch_id: int,
) -> bool:
    """Commit the batch's per-domain stat DELTAS under the writer's txn
    mark — replay-skipped, orphan-self-healing. ``batch_df`` must be
    the AS-COMMITTED rows (post every gate), so the accumulated stats
    describe exactly what the corpus holds."""
    dtable = domains_index_path(table)
    if batch_id <= M.last_txn_version(dtable, app):
        return False
    deltas = _dstamped(
        _batch_domain_stats(batch_df, url_col, tokens_col),
        tokens_col is not None,
    )

    def _append() -> int:
        return M.append(deltas, dtable, txn=(app, int(batch_id)),
                        stat_cols=_DSTAMP,
                        meta={"app": app, "batch_id": int(batch_id)})

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(dtable, app, int(batch_id)):
            raise
        _append()
    return True


def compact_domains_index(
    spark: SparkSession, table: str, min_file_bytes: int = 4 * 1024 * 1024
) -> int:
    dtable = domains_index_path(table)
    if M.current_version(dtable) == 0:
        return 0
    return M.compact(
        spark, dtable, min_file_bytes=min_file_bytes,
        target_file_bytes=64 * 1024 * 1024,
    )


# --------------------------------------------------------------------------
# Incremental DSIR selection — the _gumbel top-k side table (r15)
# --------------------------------------------------------------------------
#
# The DSIR Gumbel key ``gk = logw + Gumbel(id, seed)`` is a pure
# per-row function, so the global top-k selection is decomposable:
# topk(seen ∪ batch) == topk(topk(seen) ∪ batch). The side table at
# <table>/_gumbel therefore stores PER-BATCH LOCAL TOP-K partials
# (≤k rows per commit — any global winner from a batch is in that
# batch's local top-k), appended under the same txn/bootstrap/replay
# discipline as _domains; the merge is one union → TakeOrderedAndProject
# paid on read. Per-batch cost is batch-scaled + k index rows — never
# a corpus re-score (VERDICT r14 'do this' #6).

_GUMBEL_SUB = "_gumbel"
_GUMSTAMP = ("__gfp",)


def gumbel_index_path(table: str) -> str:
    return os.path.join(table, _GUMBEL_SUB)


def _gumbel_fingerprint(
    weights, missing: float, seed: int, k: int
) -> int:
    """Stamp fingerprint: the FULL selection basis. Keys computed under
    different weights/missing/seed are incomparable doubles; a
    different k breaks the local-top-k ⊇ global-winners superset
    argument (a batch's (k+1)-th candidate can be a global top-k'
    member for k' > k) — none of these may ever merge silently."""
    import zlib

    basis = "\n".join(
        f"{t}\t{float(w)!r}" for t, w in sorted(weights.items())
    ) + f"\n#missing={float(missing)!r}#seed={int(seed)}#k={int(k)}"
    return zlib.crc32(basis.encode("utf-8"))


def _gfp_stamped(df: DataFrame, fp: int) -> DataFrame:
    return df.withColumn("__gfp", F.lit(int(fp)))


def check_gumbel_stamp(
    table: str, weights, missing: float, seed: int, k: int
) -> None:
    st = _read_stamp(gumbel_index_path(table), _GUMSTAMP)
    fp = _gumbel_fingerprint(weights, missing, seed, k)
    if st is not None and st.get("__gfp") != fp:
        raise ValueError(
            f"gumbel index at {table} was built under a different "
            f"selection basis (stamp {st.get('__gfp')} vs {fp}: "
            "weights/missing/seed/k) — Gumbel keys from different bases "
            "never merge; rebuild the index"
        )


def _batch_gumbel_topk(
    batch_df: DataFrame, weights, k: int, seed: int,
    text_col: str, id_col: str, missing: float,
) -> DataFrame:
    from newsmaper_etl_spark.operators.selection import (
        dsir_log_weights,
        dsir_topk_state,
    )

    scored = dsir_log_weights(
        batch_df.select(F.col(id_col), F.col(text_col)),
        weights, text_col=text_col, id_col=id_col, missing=missing,
    )
    return dsir_topk_state(
        scored, k, logw_col="logw", id_col=id_col, seed=seed
    )


def read_gumbel_index(
    spark: SparkSession, table: str, k: int, version: int | None = None
) -> DataFrame | None:
    """The CURRENT global DSIR selection ``(id, logw, gk)`` — union of
    the per-batch partials, one TakeOrderedAndProject — or None when
    absent. ``version`` pins the crash-replay read (the
    read_domains_index rule)."""
    gtable = gumbel_index_path(table)
    v = M.current_version(gtable) if version is None else version
    if v == 0:
        return None
    raw = M.read_table(spark, gtable, version=v).drop(*_GUMSTAMP)
    return (
        raw.orderBy(F.col("gk").desc(), F.col("id").asc())
        .limit(int(k))
    )


def ensure_gumbel_bootstrap(
    spark: SparkSession, table: str, weights, k: int, seed: int,
    text_col: str, id_col: str, missing: float, app: str,
    version: int | None = None,
) -> bool:
    """One-time selection build for a table that predates the index —
    the single deliberate O(corpus) scoring pass, paid once
    (``version`` pins the pre-batch snapshot on crash replay)."""
    gtable = gumbel_index_path(table)
    v = M.current_version(table) if version is None else version
    if M.current_version(gtable) > 0 or v == 0:
        return False
    boot_app = app + _BOOT_APP_SUFFIX
    fp = _gumbel_fingerprint(weights, missing, seed, k)
    state = _gfp_stamped(
        _batch_gumbel_topk(
            M.read_table(spark, table, version=v), weights, k, seed,
            text_col, id_col, missing,
        ),
        fp,
    )

    def _append() -> int:
        return M.append(
            state, gtable, txn=(boot_app, 0), stat_cols=_GUMSTAMP,
            meta={"op_detail": "gumbelindex-bootstrap",
                  "covers_version": v},
        )

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(gtable, boot_app, 0):
            raise
        _append()
    return True


def append_batch_gumbel(
    batch_df: DataFrame, table: str, weights, k: int, seed: int,
    text_col: str, id_col: str, missing: float, app: str, batch_id: int,
) -> bool:
    """Commit the batch's LOCAL top-k Gumbel partial under the writer's
    txn mark — replay-skipped, orphan-self-healing. ``batch_df`` must
    be the AS-COMMITTED rows (post every gate), so the running
    selection describes exactly what the corpus holds."""
    gtable = gumbel_index_path(table)
    if batch_id <= M.last_txn_version(gtable, app):
        return False
    check_gumbel_stamp(table, weights, missing, seed, k)
    fp = _gumbel_fingerprint(weights, missing, seed, k)
    deltas = _gfp_stamped(
        _batch_gumbel_topk(
            batch_df, weights, k, seed, text_col, id_col, missing
        ),
        fp,
    )

    def _append() -> int:
        return M.append(deltas, gtable, txn=(app, int(batch_id)),
                        stat_cols=_GUMSTAMP,
                        meta={"app": app, "batch_id": int(batch_id)})

    try:
        _append()
    except M.ConcurrentWriteError:
        if not M.repair_claimed_orphan(gtable, app, int(batch_id)):
            raise
        _append()
    return True


def squash_gumbel_index(spark: SparkSession, table: str, k: int) -> int:
    """SEMANTIC compaction of the running selection: the per-batch
    partials are only ever read through one global top-k, so rows
    outside it are dead weight — rewrite the side table as exactly the
    current k winners (one transactional overwrite; txn high-water
    marks carry forward, so replayed batches stay replay-skipped and
    crash-replay version pins keep working inside the retention
    window). Without this the table grows k rows per batch forever —
    file-level compaction (M.compact) merges objects but cannot drop
    the losers. ``k`` must be the stamped selection k."""
    gtable = gumbel_index_path(table)
    v = M.current_version(gtable)
    if v == 0:
        return 0
    raw = M.read_table(spark, gtable, version=v)
    top = raw.orderBy(F.col("gk").desc(), F.col("id").asc()).limit(int(k))
    return M.overwrite(
        top, gtable, stat_cols=_GUMSTAMP, base_version=v,
        meta={"op_detail": "gumbelindex-squash", "k": int(k)},
    )


def compact_gumbel_index(
    spark: SparkSession, table: str, min_file_bytes: int = 4 * 1024 * 1024
) -> int:
    gtable = gumbel_index_path(table)
    if M.current_version(gtable) == 0:
        return 0
    return M.compact(
        spark, gtable, min_file_bytes=min_file_bytes,
        target_file_bytes=64 * 1024 * 1024,
    )


# --------------------------------------------------------------------------
# Semantic-index drift telemetry + offline rebuild (VERDICT r10 #8)
# --------------------------------------------------------------------------

def _affinity_stats(df: DataFrame, vec_col: str, cents: list[list[float]],
                    dim: int) -> dict:
    """Batch affinity against the FROZEN centroids: count / mean / min
    of each row's best cosine-to-centroid. One bounded batch-scaled agg
    (a scalar collect — the per-batch telemetry read, not a corpus
    scan). This is the drift signal: frozen centroids keep cells
    COMPARABLE forever, but as the corpus distribution moves away from
    the training sample the best-cosine affinity decays, cells widen,
    and LSH recall inside them drops silently — the mean riding each
    cells-commit makes that decay visible in the manifest history
    instead of in a recall postmortem."""
    from newsmaper_etl_spark.operators.similarity import (
        _cell_top_hof_sql,
        _with_norm,
    )

    base = _with_norm(df.select(vec_col), vec_col, "__n", dim, unroll=False)
    top = F.expr(_cell_top_hof_sql(vec_col, cents))
    aff = base.select((top["d"] / F.col("__n")).alias("__a"))
    row = aff.agg(
        F.count("__a").alias("n"),
        F.avg("__a").alias("mean"),
        F.min("__a").alias("mn"),
    ).collect()[0]
    return {
        "n": int(row["n"] or 0),
        "mean_csim": None if row["mean"] is None else round(float(row["mean"]), 6),
        "min_csim": None if row["mn"] is None else round(float(row["mn"]), 6),
    }


def semantic_drift_history(table: str) -> list[dict]:
    """The per-commit drift telemetry recorded on the ``_semcells``
    manifest metas, oldest first: one entry per commit that carried
    stats — {version, batch_id?, n, mean_csim, min_csim}. The bootstrap
    commit's entry is the BASELINE (affinity of the very corpus the
    centroids were trained on); compare later batches against it and
    rebuild when the decay crosses the deployment's tolerance
    (:func:`rebuild_semantic_index`). Driver-side manifest walk, no
    Spark job."""
    stable = semcells_index_path(table)
    out: list[dict] = []
    for v in range(1, M.current_version(stable) + 1):
        try:
            m = M._load_manifest(stable, v)
        except FileNotFoundError:  # vacuumed
            continue
        meta = m.get("meta") or {}
        drift = meta.get("drift")
        if drift is None:
            continue
        entry = {"version": v, **drift}
        if "batch_id" in meta:
            entry["batch_id"] = meta["batch_id"]
        out.append(entry)
    return out


def semantic_index_stale(table: str) -> bool:
    """True when the cells table's stamp disagrees with the centroids
    table's — the crash window of :func:`rebuild_semantic_index` (new
    centroids committed, corpus not yet re-signed). A stale index MUST
    NOT serve candidate joins: batch keys signed under the new
    centroids would meet cells signed under the old ones. Re-run the
    rebuild (idempotent) to converge."""
    cstamp = _read_stamp(semcentroids_path(table), _SSTAMP)
    sstamp = _read_stamp(semcells_index_path(table), _SSTAMP)
    if cstamp is None or sstamp is None:
        return False
    return any(cstamp.get(c) != sstamp.get(c) for c in _SSTAMP)


def rebuild_semantic_index(
    spark: SparkSession,
    table: str,
    id_col: str,
    vec_col: str = "embedding",
    sample_n: int = 2048,
    seed: int | None = None,
    version: int | None = None,
) -> dict:
    """OFFLINE re-cluster of the semantic index (VERDICT r10 'do this'
    #8): retrain spherical-k-means on a fresh sample of the CURRENT
    corpus snapshot, overwrite the frozen centroids under a BUMPED
    seed stamp, and re-sign every snapshot row's (cell, t, b) keys —
    the one deliberate O(corpus) pass, paid when
    :func:`semantic_drift_history` says cell tightness has decayed past
    tolerance. Run QUIESCED (no concurrent ingest writer), like
    ``compact``: batches committed between the pinned snapshot and the
    pointer flips would miss the re-sign.

    Crash-safe by stamp ordering: the new ``seed`` (default old+1) makes
    the new parameterization DISTINGUISHABLE from the old, centroids
    flip first, and a crash before the cells flip leaves the two stamps
    disagreeing — :func:`semantic_index_stale` detects it, and re-running
    this function converges (retrain is skipped when the centroids
    already carry the target stamp — the persisted set, trained on the
    ``covers_version`` snapshot recorded in its meta, is canonical; the
    cells re-sign then redoes only the missing flip). Dimension and
    structural parameters (n_centroids/n_planes/n_tables/dim) are kept
    from the frozen stamp — a rebuild re-fits the SAME index shape to
    the drifted distribution. Returns {version, seed, drift} where
    drift is the post-rebuild baseline affinity."""
    from newsmaper_etl_spark.operators.similarity import (
        _kmeans_centroids,
        semantic_cell_keys,
    )

    old = read_semantic_params(table)
    if old is None:
        raise ValueError(f"no semantic index at {table} to rebuild; use "
                         "ensure_semantic_bootstrap for first signing")
    stale = semantic_index_stale(table)
    if seed is None:
        # crash replay adopts the already-flipped centroid stamp (the
        # persisted set is canonical) instead of bumping past it
        new_seed = old["seed"] if stale else old["seed"] + 1
    else:
        new_seed = int(seed)
    if new_seed == old["seed"] and not stale:
        raise ValueError(
            f"rebuild seed {new_seed} equals the live stamp's; cells from "
            "the old and new centroid sets would be indistinguishable — "
            "bump the seed"
        )
    nc, np_, nt, dim = (old["n_centroids"], old["n_planes"],
                        old["n_tables"], old["dim"])
    ctable = semcentroids_path(table)
    stable = semcells_index_path(table)
    v = M.current_version(table) if version is None else version
    snap = M.read_table(spark, table, version=v).select(id_col, vec_col)

    cstamp = _read_stamp(ctable, _SSTAMP) or {}
    if cstamp.get("__seed") == new_seed:
        # crash replay: the target centroids already flipped — canonical;
        # re-pin the snapshot they were trained against for the re-sign
        cents = read_centroids(spark, table)
        cmeta = M._load_manifest(ctable, M.current_version(ctable)).get(
            "meta"
        ) or {}
        v = int(cmeta.get("covers_version", v))
        snap = M.read_table(spark, table, version=v).select(id_col, vec_col)
    else:
        cents = _kmeans_centroids(snap, vec_col, nc, sample_n, seed=new_seed)
        cdf = _centroid_frame(spark, cents, nc, np_, nt, dim, new_seed)
        M.overwrite(cdf, ctable, stat_cols=_SSTAMP,
                    meta={"op_detail": "semcentroids-rebuild",
                          "covers_version": v})
    keys = _sstamped(
        semantic_cell_keys(snap, dim, id_col, vec_col, cents, np_, nt,
                           new_seed),
        nc, np_, nt, dim, new_seed,
    )
    drift = _affinity_stats(snap, vec_col, cents, dim)
    M.overwrite(keys, stable, stat_cols=_SSTAMP,
                meta={"op_detail": "semcells-rebuild", "covers_version": v,
                      "drift": drift})
    return {"version": v, "seed": new_seed, "drift": drift}
