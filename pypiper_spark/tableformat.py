"""Minimal snapshot/manifest table format (VERDICT r6 "What's missing"
#1): ACID-ish incremental writes over plain parquet, the poor-man's
Iceberg a production pipeline needs on day one of incremental ingest.

Layout (one directory per table)::

    <root>/
      data/<writer-uuid>-<seq>.parquet   immutable data files
      snapshots/snap-<N>.json            manifest: data-file list + meta
      CURRENT                            text pointer to the live snapshot

Commit protocol (the os.replace discipline from vectors._atomic_write_table,
applied to a pointer file):

1. write new data files under ``data/`` (unique names — never reused,
   never overwritten);
2. write ``snapshots/snap-N.json`` listing the EXACT file set of the new
   snapshot (full file list, not a delta — reads never chase chains);
3. atomically swap ``CURRENT`` from N-1 to N via temp-file +
   ``os.replace`` — the only mutation of shared state in the protocol.

Guarantees under this protocol:

- **snapshot isolation for readers**: a reader resolves CURRENT once and
  then touches only immutable files; a concurrent commit cannot change
  the file set under it.
- **crash safety**: a crash anywhere before step 3 leaves CURRENT at
  N-1 and the table fully readable; steps 1-2 only created orphan files
  (``orphan_files`` finds them, ``gc_orphans`` removes them). A crash
  DURING step 3 is atomic by os.replace (POSIX rename).
- **optimistic concurrency (single-winner)**: commit re-reads CURRENT
  at swap time and raises ``CommitConflict`` if another writer advanced
  it — the loser retries on the new snapshot. (os.replace alone cannot
  do a true compare-and-swap, so two writers racing within the
  read-check-to-replace window are last-wins; a real deployment puts
  the pointer in a CAS-capable store — the protocol is otherwise
  unchanged, which is the point of the manifest design.)
- **time travel**: every snapshot's manifest is retained; ``read(...,
  snapshot_id=k)`` reconstructs exactly snapshot k's rows.

Beyond the minimal core, the format carries the three lifecycle
operations a table format earns its keep with at 100 TB:

- **manifest stats pruning**: every commit records per-file min/max
  for requested columns (read from parquet footers — free); ``read``
  with a ``prune=`` predicate opens only overlapping files. This is
  the Iceberg/Delta file-skipping win: a point or range query on a
  sorted/clustered key touches O(matching files), not O(table).
- **compaction** (``compact``): rewrite the current file set into
  fewer, larger files as a new snapshot — same rows, same history;
  the small-files answer for streaming/incremental ingest.
- **snapshot expiration** (``expire_snapshots``): drop manifests
  older than the retention window and delete data files no retained
  snapshot references — bounded history, bounded storage.

- **partial-rewrite MERGE** (``merge_partial``): the per-file stats
  select exactly the files that can contain a change key; everything
  else carries into the new snapshot unrewritten — the
  partition-grained MERGE cost model without requiring a partitioned
  layout.

Still intentionally out of scope: format/schema evolution beyond
parquet's own mergeSchema.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer advanced CURRENT between read and swap."""


def _snap_path(root: str, snap_id: int) -> str:
    return os.path.join(root, "snapshots", f"snap-{snap_id:08d}.json")


def current_id(root: str) -> int:
    """The live snapshot id (0 = empty table / nothing committed)."""
    try:
        with open(os.path.join(root, "CURRENT")) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return 0


def read_manifest(root: str, snap_id: int) -> dict:
    with open(_snap_path(root, snap_id)) as fh:
        return json.load(fh)


def snapshots(root: str) -> list[dict]:
    """All RETAINED committed manifests, oldest first (time-travel
    catalog). Expired snapshots (expire_snapshots) are simply absent —
    the catalog never errors on a bounded-history table."""
    out = []
    for i in range(1, current_id(root) + 1):
        try:
            out.append(read_manifest(root, i))
        except FileNotFoundError:
            continue
    return out


def files_for(
    root: str,
    snapshot_id: int | None = None,
    prune: tuple | None = None,
) -> list[str]:
    """The table-relative file list a read would open — after manifest
    stats pruning when ``prune=(col, lo, hi)`` is given. A file is
    skipped only when its recorded [min, max] for ``col`` provably
    cannot overlap [lo, hi]; files without stats for the column are
    always kept (pruning is an optimization, never a filter)."""
    snap = current_id(root) if snapshot_id is None else snapshot_id
    if snap < 1:
        raise FileNotFoundError(f"table at {root} has no committed snapshot")
    m = read_manifest(root, snap)
    files = list(m["files"])
    if prune is None:
        return files
    col, lo, hi = prune
    stats = m.get("stats", {})
    kept = []
    for f in files:
        fs = stats.get(f, {})
        if fs.get("__rows") == 0:
            continue  # empty file: no predicate can match it
        s = fs.get(col)
        if s is None or (s[0] <= hi and s[1] >= lo):
            kept.append(f)
    return kept


def read(
    spark: SparkSession,
    root: str,
    snapshot_id: int | None = None,
    prune: tuple | None = None,
) -> DataFrame:
    """Read the table at CURRENT or at a historical snapshot.

    ``prune=(col, lo, hi)`` applies manifest file-skipping (see
    files_for); the caller still applies the row-level filter — prune
    bounds which FILES are opened, exactly like Iceberg manifest
    pruning ahead of parquet row-group pruning."""
    files = files_for(root, snapshot_id, prune)
    if not files:
        # pruned everything: an empty frame with the table's schema
        any_file = files_for(root, snapshot_id)[0]
        return spark.read.parquet(os.path.join(root, any_file)).limit(0)
    return spark.read.parquet(*[os.path.join(root, f) for f in files])


def _footer_stats(path: str, cols: tuple) -> dict:
    """Per-file min/max for ``cols`` from parquet row-group footers —
    metadata only, no data pages read (the same place Spark's own
    row-group pruning looks; the manifest lifts it one level up so
    file skipping needs no file opens at all)."""
    import pyarrow.parquet as pq_

    md = pq_.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out = {"__rows": md.num_rows}  # 0-row files prune under ANY predicate
    for c in cols:
        if c not in idx:
            continue
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_min_max:
                mins, maxs = [], []
                break
            mins.append(st.min)
            maxs.append(st.max)
        if mins:
            out[c] = [min(mins), max(maxs)]
    return out


def _write_data_files(
    df: DataFrame, root: str, stats_cols: tuple = ()
) -> tuple[list[str], dict]:
    """Materialize df as immutable files under data/, return their
    table-relative paths plus per-file column stats. Spark writes to a
    scratch dir; the parts are then renamed to collision-free names
    (writer uuid + seq) so no two commits can ever contend on a file
    name."""
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    scratch = tempfile.mkdtemp(prefix=".commit_", dir=root)
    try:
        df.write.mode("overwrite").parquet(scratch)
        wid = uuid.uuid4().hex[:12]
        rel: list[str] = []
        stats: dict = {}
        seq = 0
        for f in sorted(os.listdir(scratch)):
            if not f.endswith(".parquet"):
                continue
            name = f"data/{wid}-{seq:05d}.parquet"
            os.replace(os.path.join(scratch, f), os.path.join(root, name))
            rel.append(name)
            if stats_cols:
                stats[name] = _footer_stats(os.path.join(root, name), stats_cols)
            seq += 1
        return rel, stats
    finally:
        for f in os.listdir(scratch):
            try:
                os.remove(os.path.join(scratch, f))
            except OSError:
                pass
        os.rmdir(scratch)


def _commit(
    root: str,
    parent: int,
    files: list[str],
    operation: str,
    n_records: int,
    stats: dict | None = None,
    stats_cols: tuple = (),
) -> int:
    """Steps 2-3 of the protocol: manifest write, then pointer swap.

    Creating ``snap-N.json`` with O_CREAT|O_EXCL is the exclusive
    claim on snapshot id N: of two racing writers with the same
    parent, exactly one creates the manifest; the other gets
    ``CommitConflict`` and retries on the new snapshot. A crash
    between manifest creation and pointer swap leaves an uncommitted
    manifest that blocks id N until ``gc_orphans`` clears it — the
    recovery path the crash test exercises."""
    snap_id = parent + 1
    if current_id(root) != parent:
        raise CommitConflict(
            f"CURRENT moved to {current_id(root)} (expected {parent}); "
            "retry the commit on the new snapshot"
        )
    os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)
    manifest = {
        "snapshot_id": snap_id,
        "parent_id": parent,
        "operation": operation,
        "files": files,
        "n_files": len(files),
        "n_records": n_records,
        "stats": stats or {},
        "stats_cols": list(stats_cols),
    }
    mpath = _snap_path(root, snap_id)
    try:
        fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise CommitConflict(
            f"snapshot {snap_id} already claimed (concurrent commit or "
            "crash residue; run gc_orphans to clear residue)"
        ) from None
    with os.fdopen(fd, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    fd, tmp = tempfile.mkstemp(dir=root, prefix=".tmp_CURRENT_")
    with os.fdopen(fd, "w") as fh:
        fh.write(str(snap_id))
    os.replace(tmp, os.path.join(root, "CURRENT"))
    return snap_id


def create(
    spark: SparkSession, root: str, df: DataFrame, stats_cols: tuple = ()
) -> int:
    """Create the table (snapshot 1). Fails if one already exists.
    ``stats_cols`` opts columns into per-file min/max manifest stats;
    the choice sticks — later commits read it from the parent
    manifest, so every snapshot stays prunable on the same keys."""
    os.makedirs(root, exist_ok=True)
    if current_id(root) != 0:
        raise CommitConflict(f"table at {root} already exists")
    files, stats = _write_data_files(df, root, stats_cols)
    n = read_files_count(spark, root, files)
    return _commit(root, 0, files, "create", n, stats, stats_cols)


def _inherited_stats_cols(root: str, parent: int) -> tuple:
    if not parent:
        return ()
    return tuple(read_manifest(root, parent).get("stats_cols", ()))


def append(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Append-only commit: parent's files + the new files (parent's
    per-file stats carry over untouched — append never rewrites)."""
    parent = current_id(root)
    pm = read_manifest(root, parent) if parent else {}
    cols = _inherited_stats_cols(root, parent)
    files, stats = _write_data_files(df, root, cols)
    n = read_files_count(spark, root, files)
    return _commit(
        root, parent, pm.get("files", []) + files, "append",
        pm.get("n_records", 0) + n,
        {**pm.get("stats", {}), **stats}, cols,
    )


def overwrite(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Full-replace commit (old files stay for time travel)."""
    parent = current_id(root)
    cols = _inherited_stats_cols(root, parent)
    files, stats = _write_data_files(df, root, cols)
    n = read_files_count(spark, root, files)
    return _commit(root, parent, files, "overwrite", n, stats, cols)


def merge(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    key: str,
    merged_builder=None,
) -> int:
    """MERGE (upsert) through the format: read CURRENT, full-outer join
    with the change set on ``key`` (the q_upsert_merge shape — one
    shuffle per side), write the merged rows as a new snapshot. With
    ``merged_builder`` the caller supplies the coalesce logic
    ``(base_df, changes_df) -> merged_df``; the default coalesces every
    change column over the base column (change rows win, unmatched
    change rows insert, untouched base rows pass through)."""
    from pyspark.sql import functions as F

    base = read(spark, root)
    if merged_builder is not None:
        merged = merged_builder(base, changes)
    else:
        b, u = base.alias("b"), changes.alias("u")
        cond = F.col(f"b.{key}") == F.col(f"u.{key}")
        cols = [
            F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c)
            if c in changes.columns
            else F.col(f"b.{c}").alias(c)
            for c in base.columns
        ]
        merged = b.join(u, cond, "full_outer").select(*cols)
    parent = current_id(root)
    cols = _inherited_stats_cols(root, parent)
    files, stats = _write_data_files(merged, root, cols)
    n = read_files_count(spark, root, files)
    return _commit(root, parent, files, "merge", n, stats, cols)


def read_files_count(spark: SparkSession, root: str, files: list[str]) -> int:
    """Row count of a file set from parquet footers (metadata-only —
    Spark's count() over parquet compiles to a footer scan)."""
    if not files:
        return 0
    return spark.read.parquet(*[os.path.join(root, f) for f in files]).count()


def orphan_files(root: str) -> list[str]:
    """Data files referenced by NO committed snapshot — the residue of
    a crash between data write and pointer swap (or an aborted
    commit). Table-relative paths, sorted."""
    live: set[str] = set()
    for m in snapshots(root):
        live.update(m["files"])
    out = []
    data_dir = os.path.join(root, "data")
    if os.path.isdir(data_dir):
        for f in sorted(os.listdir(data_dir)):
            rel = f"data/{f}"
            if rel not in live and not f.startswith("."):
                out.append(rel)
    # a manifest above CURRENT with no pointer is also crash residue
    return out


def uncommitted_manifests(root: str) -> list[int]:
    """snap-N.json files above CURRENT: written but never swapped in."""
    cur = current_id(root)
    out = []
    sdir = os.path.join(root, "snapshots")
    if os.path.isdir(sdir):
        for f in sorted(os.listdir(sdir)):
            if f.startswith("snap-") and f.endswith(".json"):
                n = int(f[5:-5])
                if n > cur:
                    out.append(n)
    return out


def gc_orphans(root: str) -> list[str]:
    """Delete orphan data files and uncommitted manifests; return what
    was removed. Safe at any time: only files unreachable from every
    committed snapshot are touched."""
    removed = []
    for rel in orphan_files(root):
        os.remove(os.path.join(root, rel))
        removed.append(rel)
    for n in uncommitted_manifests(root):
        os.remove(_snap_path(root, n))
        removed.append(f"snapshots/snap-{n:08d}.json")
    return removed


def compact(spark: SparkSession, root: str, target_files: int = 1) -> int:
    """Compaction commit: rewrite the CURRENT file set into
    ``target_files`` larger files — identical rows (asserted via
    footer row counts), new snapshot, history preserved. The
    small-files answer for streaming/incremental ingest: readers of
    the new snapshot open O(target) files instead of O(commits); old
    snapshots still read their original files until expired."""
    parent = current_id(root)
    cols = _inherited_stats_cols(root, parent)
    before = read_manifest(root, parent)["n_records"]
    files, stats = _write_data_files(
        read(spark, root).coalesce(target_files), root, cols
    )
    n = read_files_count(spark, root, files)
    if n != before:
        raise RuntimeError(
            f"compaction row-count drift: {before} -> {n} (refusing to commit)"
        )
    return _commit(root, parent, files, "compact", n, stats, cols)


def expire_snapshots(root: str, keep_last: int) -> list[str]:
    """Bounded history: drop all but the newest ``keep_last`` snapshot
    manifests and delete data files no retained snapshot references.
    Returns what was removed (table-relative paths). CURRENT is never
    expired; time travel to an expired snapshot raises
    FileNotFoundError (the contract: retention is a policy decision,
    reads past it are errors, not silent fallbacks)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (CURRENT is never expired)")
    cur = current_id(root)
    keep = set(range(max(1, cur - keep_last + 1), cur + 1))
    live: set[str] = set()
    expired_ids = []
    for m in snapshots(root):
        if m["snapshot_id"] in keep:
            live.update(m["files"])
        else:
            expired_ids.append(m["snapshot_id"])
    removed = []
    for sid in expired_ids:
        os.remove(_snap_path(root, sid))
        removed.append(f"snapshots/snap-{sid:08d}.json")
    data_dir = os.path.join(root, "data")
    if os.path.isdir(data_dir):
        for f in sorted(os.listdir(data_dir)):
            rel = f"data/{f}"
            if rel not in live and not f.startswith("."):
                os.remove(os.path.join(root, rel))
                removed.append(rel)
    return removed


def merge_partial(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    key: str,
) -> int:
    """MERGE that rewrites ONLY the files that can contain a change
    key — the partition-grained rewrite a 100 TB table needs (a full
    MERGE rewriting every file on a daily 0.1% change set is the
    single biggest cost bug in naive incremental ingest).

    File selection is exact and bounded: the parent manifest's
    per-file [min, max] stats for ``key`` become a tiny ranges frame;
    one broadcast range-join against the change set marks each file
    touched/untouched (a file whose recorded key range provably
    cannot contain any change key — including inserts, which fall
    outside every range or inside a touched one — carries into the
    new snapshot UNREWRITTEN, stats and all). Touched files merge
    with the full change set via the usual full-outer join; unmatched
    change rows insert there exactly once (any base row sharing a
    change key lives in a touched file by construction, so carried
    files can never hide a matched row).

    Requires the table to have ``stats_cols`` including ``key``;
    falls back to the full-table ``merge`` otherwise. Row-for-row
    equality with the full merge is asserted in
    tests/test_tableformat.py."""
    from pyspark.sql import functions as F

    parent = current_id(root)
    m = read_manifest(root, parent)
    stats = m.get("stats", {})
    if key not in m.get("stats_cols", []) or not all(
        key in stats.get(f, {}) or stats.get(f, {}).get("__rows") == 0
        for f in m["files"]
    ):
        return merge(spark, root, changes, key=key)

    ranges = [
        (i, stats[f][key][0], stats[f][key][1])
        for i, f in enumerate(m["files"])
        if stats[f].get("__rows") != 0
    ]
    if not all(
        isinstance(v, int) for _, lo, hi in ranges for v in (lo, hi)
    ):
        return merge(spark, root, changes, key=key)  # non-integer key stats
    rdf = spark.createDataFrame(ranges, "fid int, lo long, hi long")
    touched_ids = {
        r.fid
        for r in changes.alias("u")
        .join(
            F.broadcast(rdf),
            (F.col(f"u.{key}") >= F.col("lo")) & (F.col(f"u.{key}") <= F.col("hi")),
        )
        .select("fid")
        .distinct()
        .collect()  # bounded by the manifest's file count
    }
    touched = [f for i, f in enumerate(m["files"]) if i in touched_ids]
    carried = [
        f
        for i, f in enumerate(m["files"])
        if i not in touched_ids and stats.get(f, {}).get("__rows") != 0
    ]

    base = (
        spark.read.parquet(*[os.path.join(root, f) for f in touched])
        if touched
        else read(spark, root).limit(0)
    )
    b, u = base.alias("b"), changes.alias("u")
    cols = [
        F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c)
        if c in changes.columns
        else F.col(f"b.{c}").alias(c)
        for c in base.columns
    ]
    merged = b.join(u, F.col(f"b.{key}") == F.col(f"u.{key}"), "full_outer").select(
        *cols
    )
    cols_cfg = _inherited_stats_cols(root, parent)
    new_files, new_stats = _write_data_files(merged, root, cols_cfg)
    n = read_files_count(spark, root, new_files) + sum(
        stats[f]["__rows"] for f in carried
    )
    return _commit(
        root,
        parent,
        carried + new_files,
        "merge_partial",
        n,
        {**{f: stats[f] for f in carried}, **new_stats},
        cols_cfg,
    )
