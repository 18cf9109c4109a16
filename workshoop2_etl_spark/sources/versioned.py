"""Versioned parquet tables with time travel — the transaction-log
pattern of Delta Lake / Iceberg in its minimal, dependency-free form
(a public design: Armbrust et al., "Delta Lake: High-Performance ACID
Table Storage over Cloud Object Stores", VLDB 2020).

Why an engine needs this: the reference's pipelines overwrite their
CSV/MySQL sinks in place (`dags/merge_to_dw.py:87-92,305-308`), so a
half-written load is observable and yesterday's answer is gone. The
manifest pattern fixes both with two invariants:

1. **Readers never list directories.** Each commit writes its data
   files first, then publishes ONE manifest naming the complete file
   set for that version. A read plans exactly the manifest's files —
   partially-written data files are invisible because no manifest
   names them (snapshot isolation for free on any storage with
   atomic single-file publish).
2. **Commits are optimistic.** Publishing version N+1 uses an
   exclusive-create (``os.open(..., O_EXCL)``); two concurrent
   writers race, exactly one wins, the loser gets
   :class:`VersionConflict` and must re-read + retry. Single-file
   atomic publish is the only storage primitive required — on object
   stores this maps to conditional PUT.

Scale: the manifest holds file PATHS (metadata, KBs per thousand
files); data never moves on commit — append publishes old files + new
files, overwrite publishes just the new set, rollback re-publishes an
old version's file list as a NEW version (history is immutable,
roll-forward only). Reads are ordinary parquet multi-file scans, so
column pruning, pushdown, and row-group skipping all still apply.

Schema evolution (round 12): each manifest records the version's
SCHEMA, and reads plan with it — so a version whose file set mixes
generations (an additive append) still reads every file, with the
missing columns NULL in pre-evolution files (the Delta ADD COLUMN
semantics). ``commit_append`` enforces compatibility against the
parent's recorded schema: identical appends freely; NEW nullable
columns require the explicit ``merge_schema=True`` opt-in (silent
widening is how schema drift ships); dropped or retyped columns
refuse outright — that's an overwrite, not an append. Time travel
pins the schema per version: v0 read back shows v0's columns,
whatever 'latest' looks like now. Pre-round-12 manifests (no schema
key) read exactly as before.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"


class VersionConflict(RuntimeError):
    """Another writer published this version first — re-read, retry."""


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_DIR, f"v{version:08d}.json")


def current_version(table_dir: str) -> int | None:
    """Highest published version, or None for a non-table."""
    mdir = os.path.join(table_dir, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    versions = [
        int(name[1:-5])
        for name in os.listdir(mdir)
        if name.startswith("v") and name.endswith(".json")
    ]
    return max(versions) if versions else None


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def _publish(table_dir: str, version: int, manifest: dict) -> None:
    """Atomic exclusive publish: write-temp + hard-link-exclusive.
    O_EXCL on the final name is the optimistic lock — exactly one
    concurrent writer of version N can succeed."""
    os.makedirs(os.path.join(table_dir, _MANIFEST_DIR), exist_ok=True)
    final = _manifest_path(table_dir, version)
    payload = json.dumps(manifest, indent=1, sort_keys=True)
    try:
        fd = os.open(final, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError as exc:
        raise VersionConflict(
            f"version {version} already published in {table_dir}"
        ) from exc
    with os.fdopen(fd, "w") as f:
        f.write(payload)


def _write_data(df: DataFrame, table_dir: str) -> list[str]:
    """Write df's rows as a fresh immutable file set; return paths
    relative to the table root. The commit id comes from uuid4 —
    uniqueness, not secrecy, is the requirement."""
    commit_id = uuid.uuid4().hex[:12]
    sub = os.path.join("data", commit_id)
    out = os.path.join(table_dir, sub)
    df.write.mode("error").parquet(out)
    return sorted(
        os.path.join(sub, name)
        for name in os.listdir(out)
        if name.endswith(".parquet")
    )


def _schema_of_manifest(manifest: dict):
    """The manifest's recorded schema as a StructType, or None for a
    pre-round-12 manifest."""
    from pyspark.sql import types as T

    s = manifest.get("schema")
    return T.StructType.fromJson(json.loads(s)) if s else None


def _commit(
    df: DataFrame,
    table_dir: str,
    op: str,
    *,
    parent: int | None,
    base_files: list[str],
    schema=None,
) -> int:
    """Publish ``parent + 1`` — NEVER a re-read 'latest'. The version
    number must name the parent whose file list the commit was built
    from: re-reading latest at publish time would let this commit
    silently drop a concurrent writer's files (lost update). If the
    slot is taken, the O_EXCL publish raises :class:`VersionConflict`
    and the caller re-reads + retries with fresh base files.
    ``schema`` overrides the recorded schema (an evolving append
    records the MERGED schema, not just this batch's)."""
    files = base_files + _write_data(df, table_dir)
    version = 0 if parent is None else parent + 1
    _publish(
        table_dir,
        version,
        {
            "version": version,
            "parent": parent,
            "op": op,
            "files": files,
            "schema": (schema or df.schema).json(),
        },
    )
    return version


def create_table(df: DataFrame, table_dir: str) -> int:
    """Publish version 0. Fails if the table already exists."""
    if current_version(table_dir) is not None:
        raise VersionConflict(f"table already exists at {table_dir}")
    return _commit(df, table_dir, "create", parent=None, base_files=[])


def commit_append(
    df: DataFrame, table_dir: str, *, merge_schema: bool = False
) -> int:
    """New version = parent's files + this df's files (data immutable,
    manifest-only append). Conflicts if anyone commits between the
    parent read and the publish — retry re-reads the new base.

    Schema contract vs the parent's recorded schema (round 12):
    identical (name, type) sets append freely; NEW columns are
    additive evolution and require ``merge_schema=True`` — the
    merged schema (parent fields first, new fields appended) is
    recorded and pre-evolution files read the new columns as NULL;
    a df MISSING parent columns or RETYPING one refuses — rewriting
    the world is :func:`commit_overwrite`'s job, never an append's
    side effect. Parents without a recorded schema (pre-round-12)
    append uncheck, as before."""
    parent = current_version(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no versioned table at {table_dir}")
    manifest = _read_manifest(table_dir, parent)
    base = manifest["files"]
    prev = _schema_of_manifest(manifest)
    schema = None
    if prev is not None:
        prev_fields = {f.name: f.dataType for f in prev.fields}
        cur_fields = {f.name: f.dataType for f in df.schema.fields}
        missing = sorted(set(prev_fields) - set(cur_fields))
        retyped = sorted(
            n
            for n, t in cur_fields.items()
            if n in prev_fields and prev_fields[n] != t
        )
        if missing or retyped:
            raise ValueError(
                f"append schema incompatible with {table_dir} v{parent}: "
                f"missing columns {missing}, retyped {retyped} — use "
                "commit_overwrite to change existing columns"
            )
        new = [f for f in df.schema.fields if f.name not in prev_fields]
        if new:
            if not merge_schema:
                raise ValueError(
                    "append adds new columns "
                    f"{[f.name for f in new]}; pass merge_schema=True "
                    "to evolve the table schema (old files will read "
                    "them as NULL)"
                )
            from pyspark.sql import types as T

            schema = T.StructType(list(prev.fields) + new)
        else:
            schema = prev
    return _commit(
        df, table_dir, "append",
        parent=parent, base_files=base, schema=schema,
    )


def commit_overwrite(df: DataFrame, table_dir: str) -> int:
    """New version = exactly this df's files. Old versions (and their
    files) remain readable — overwrite is logical, not physical."""
    parent = current_version(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no versioned table at {table_dir}")
    return _commit(df, table_dir, "overwrite", parent=parent, base_files=[])


def rollback(table_dir: str, to_version: int) -> int:
    """Re-publish an old version's file list as a NEW version —
    roll-forward history: the bad version stays auditable, readers of
    'latest' see the restored data."""
    latest = current_version(table_dir)
    if latest is None:
        raise FileNotFoundError(f"no versioned table at {table_dir}")
    old = _read_manifest(table_dir, to_version)
    version = latest + 1
    manifest = {
        "version": version,
        "parent": latest,
        "op": f"rollback:{to_version}",
        "files": old["files"],
    }
    if "schema" in old:  # restore the rolled-back-to schema as well
        manifest["schema"] = old["schema"]
    _publish(table_dir, version, manifest)
    return version


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: the pinned (or latest) manifest's exact file
    set, as an ordinary parquet scan — pruning and pushdown intact.
    An empty file list yields an empty DataFrame with whatever schema
    the caller applies downstream (overwrite-to-empty is legal)."""
    if version is None:
        version = current_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no versioned table at {table_dir}")
    manifest = _read_manifest(table_dir, version)
    paths = [os.path.join(table_dir, p) for p in manifest["files"]]
    if not paths:
        raise ValueError(
            f"version {version} of {table_dir} has no files"
        )
    schema = _schema_of_manifest(manifest)
    if schema is not None:
        # plan with the VERSION's recorded schema: files from before
        # an additive evolution read the newer columns as NULL, and
        # time travel pins each version's own column set
        return spark.read.schema(schema).parquet(*paths)
    return spark.read.parquet(*paths)


def read_changes(
    spark: SparkSession,
    table_dir: str,
    from_version: int,
    to_version: int | None = None,
    *,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Change data feed between two versions — Delta's
    ``table_changes`` verb on this log, derived by SNAPSHOT DIFF:
    row-level multiset comparison of the two time-travel reads
    (``exceptAll`` both ways — duplicates diff by multiplicity, not
    presence), classified against ``key_cols`` when given:

    - key only in the new snapshot → ``insert``
    - key only in the old → ``delete``
    - key in both with changed rows → ``update_preimage`` (the old
      row) and ``update_postimage`` (the new row)
    - without ``key_cols``: appeared rows are ``insert``, vanished
      rows ``delete`` (no update pairing is possible keyless).

    Output: the table's columns + ``_change_type`` +
    ``_commit_version`` (the target version), Delta CDF's naming.

    Scale note: snapshot diff reads BOTH versions in full — the right
    tool for tables without a recorded change feed and for audits
    ("what exactly changed between Monday and Tuesday"). A write-time
    recorded feed (what ``merge_cdc`` could additionally persist) is
    the cheaper path when every consumer needs every delta; the diff
    here is two scans + two shuffles either way, never a driver-side
    row walk."""
    from pyspark.sql import functions as F

    if to_version is None:
        to_version = current_version(table_dir)
        if to_version is None:
            raise FileNotFoundError(f"no versioned table at {table_dir}")
    old = read_version(spark, table_dir, from_version)
    new = read_version(spark, table_dir, to_version)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            "schema changed between versions: "
            f"{sorted(old.columns)} vs {sorted(new.columns)}"
        )
    new = new.select(*old.columns)
    gone = old.exceptAll(new)
    came = new.exceptAll(old)
    ctype = "_change_type"
    if key_cols:
        new_keys = new.select(*key_cols).distinct()
        old_keys = old.select(*key_cols).distinct()
        parts = [
            gone.join(new_keys, key_cols, "left_anti").withColumn(
                ctype, F.lit("delete")
            ),
            gone.join(new_keys, key_cols, "left_semi").withColumn(
                ctype, F.lit("update_preimage")
            ),
            came.join(old_keys, key_cols, "left_anti").withColumn(
                ctype, F.lit("insert")
            ),
            came.join(old_keys, key_cols, "left_semi").withColumn(
                ctype, F.lit("update_postimage")
            ),
        ]
    else:
        parts = [
            gone.withColumn(ctype, F.lit("delete")),
            came.withColumn(ctype, F.lit("insert")),
        ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("_commit_version", F.lit(to_version))


def history(table_dir: str) -> list[dict]:
    """All EXISTING manifests, oldest first (the audit log). After a
    retention :func:`vacuum`, truncated versions are simply absent —
    the log must stay readable, not crash on the gap."""
    latest = current_version(table_dir)
    if latest is None:
        return []
    out = []
    for v in range(latest + 1):
        try:
            out.append(_read_manifest(table_dir, v))
        except FileNotFoundError:
            continue
    return out


def merge_cdc(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    key_cols: list[str],
    *,
    op_col: str = "op",
    seq_col: str = "seq",
) -> int:
    """MERGE a CDC feed into the versioned table as one new version —
    the Delta ``MERGE INTO`` verb on this log: read the latest
    snapshot, apply the change feed set-wise
    (:func:`~workshoop2_etl_spark.operators.star.apply_cdc` — max-seq
    per key wins, I/U upsert, D deletes), publish the merged state as
    a logical overwrite. Time travel keeps the pre-merge snapshot
    readable; a conflicting concurrent commit raises
    :class:`VersionConflict` before anything becomes visible.

    Returns the new version number.
    """
    from workshoop2_etl_spark.operators.star import apply_cdc

    parent = current_version(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no versioned table at {table_dir}")
    base = read_version(spark, table_dir, parent)
    merged = apply_cdc(
        base, changes, key_cols, op_col=op_col, seq_col=seq_col
    )
    files = _write_data(merged, table_dir)
    version = parent + 1
    _publish(
        table_dir,
        version,
        {
            "version": version,
            "parent": parent,
            "op": "merge_cdc",
            "files": files,
            "schema": merged.schema.json(),
        },
    )
    return version


def foreach_batch_versioned_sink(table_dir: str):
    """Exactly-once streaming sink: a ``foreachBatch`` function that
    appends each micro-batch to the versioned table with the BATCH ID
    recorded in the manifest — on failure/restart Spark RE-RUNS a
    batch id, and the sink makes the replay a NO-OP instead of a
    duplicate append (the idempotent-sink half of Structured
    Streaming's exactly-once contract; the checkpoint provides the
    other half). This is the documented pattern for transactional
    stores (Delta's txnAppId/txnVersion), built on this module's
    manifests.

    Usage::

        q = (stream.writeStream
             .foreachBatch(foreach_batch_versioned_sink(dir))
             .option("checkpointLocation", ckpt).start())
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        latest = current_version(table_dir)
        if latest is not None:
            seen = {
                m.get("batch_id")
                for m in history(table_dir)
                if m.get("batch_id") is not None
            }
            if batch_id in seen:
                return  # replayed batch — already committed, skip
        files = _write_data(batch_df, table_dir)
        if latest is None:
            _publish(
                table_dir,
                0,
                {
                    "version": 0,
                    "parent": None,
                    "op": "stream_append",
                    "batch_id": batch_id,
                    "files": files,
                    "schema": batch_df.schema.json(),
                },
            )
            return
        base = _read_manifest(table_dir, latest)["files"]
        _publish(
            table_dir,
            latest + 1,
            {
                "version": latest + 1,
                "parent": latest,
                "op": "stream_append",
                "batch_id": batch_id,
                "files": base + files,
                "schema": batch_df.schema.json(),
            },
        )

    return _sink


def foreach_batch_versioned_upsert(table_dir: str, key_cols: list[str]):
    """Exactly-once streaming UPSERT sink — the crawl × lakehouse
    composition (r10 verdict item 6): each micro-batch MERGES into
    the versioned table by ``key_cols`` (for a crawl, the canonical
    URL) instead of appending, so a re-crawled page REPLACES its
    previous row while time travel keeps every pre-recrawl snapshot
    readable. Idempotent like :func:`foreach_batch_versioned_sink`:
    the batch id is recorded in the manifest and a replayed batch id
    (failure/restart re-run) is a no-op, never a double-merge.

    Scale shape: the merge is one left-anti join of the current
    snapshot against the batch's keys plus a union — set-based,
    shuffle keyed on the canonical key; the batch side of the join is
    delta-sized. Within-batch duplicate keys collapse deterministically
    (first by the full row's sort order) before merging. Each commit
    is a logical overwrite (new manifest lists the merged file set),
    identical durability semantics to :func:`merge_cdc`."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        latest = current_version(table_dir)
        if latest is not None:
            seen = {
                m.get("batch_id")
                for m in history(table_dir)
                if m.get("batch_id") is not None
            }
            if batch_id in seen:
                return  # replayed batch — already merged, skip
        # deterministic within-batch dedup by key (one crawl wave can
        # fetch one canonical URL twice)
        others = [c for c in batch_df.columns if c not in key_cols]
        w = Window.partitionBy(*key_cols).orderBy(
            *[F.col(c).asc_nulls_last() for c in others]
        )
        batch = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        if latest is None:
            files = _write_data(batch, table_dir)
            _publish(
                table_dir,
                0,
                {
                    "version": 0,
                    "parent": None,
                    "op": "stream_upsert",
                    "batch_id": batch_id,
                    "files": files,
                    "schema": batch.schema.json(),
                },
            )
            return
        base = read_version(batch_df.sparkSession, table_dir, latest)
        merged = base.join(
            batch.select(*key_cols), key_cols, "left_anti"
        ).unionByName(batch)
        files = _write_data(merged, table_dir)
        _publish(
            table_dir,
            latest + 1,
            {
                "version": latest + 1,
                "parent": latest,
                "op": "stream_upsert",
                "batch_id": batch_id,
                "files": files,
                "schema": merged.schema.json(),
            },
        )

    return _sink


def _collect_file_stats(
    table_dir: str, rel_paths: list[str], stats_cols: list[str]
) -> dict:
    """Per-file [min, max] for ``stats_cols``, read from the parquet
    FOOTERS just written (local metadata reads — no Spark job, no data
    pages). Values are stored JSON-native; non-scalar or absent stats
    simply omit the column (pruning then keeps the file, which is
    always safe)."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for rel in rel_paths:
        f = pq.ParquetFile(os.path.join(table_dir, rel))
        ranges: dict[str, list] = {}  # name -> [min, max]
        broken: set[str] = set()  # any row group without min/max
        for rg in range(f.metadata.num_row_groups):
            meta = f.metadata.row_group(rg)
            for ci in range(meta.num_columns):
                col = meta.column(ci)
                name = col.path_in_schema
                if name not in stats_cols or name in broken:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    broken.add(name)
                    ranges.pop(name, None)
                    continue
                if not isinstance(st.min, (int, float, str)) or not isinstance(
                    st.max, (int, float, str)
                ):
                    # timestamps/bytes don't survive the JSON manifest
                    # — skip the column (conservative: file unpruned)
                    broken.add(name)
                    ranges.pop(name, None)
                    continue
                if name in ranges:
                    ranges[name][0] = min(ranges[name][0], st.min)
                    ranges[name][1] = max(ranges[name][1], st.max)
                else:
                    ranges[name] = [st.min, st.max]
        if ranges:
            out[rel] = ranges
    return out


def commit_with_stats(
    df: DataFrame,
    table_dir: str,
    *,
    stats_cols: list[str],
    op: str = "create",
) -> int:
    """Create (or overwrite) publishing per-file column [min,max]
    stats in the manifest — the Delta/Iceberg data-skipping index in
    manifest form. Pair with a range/Z-order layout
    (``writers.cluster_parquet``) upstream: stats only prune when the
    layout makes per-file ranges tight."""
    parent = current_version(table_dir)
    if op == "create" and parent is not None:
        raise VersionConflict(f"table already exists at {table_dir}")
    files = _write_data(df, table_dir)
    version = 0 if parent is None else parent + 1
    _publish(
        table_dir,
        version,
        {
            "version": version,
            "parent": parent,
            "op": op,
            "files": files,
            "schema": df.schema.json(),
            "file_stats": _collect_file_stats(table_dir, files, stats_cols),
        },
    )
    return version


def candidate_files(
    table_dir: str,
    col: str,
    lo,
    hi,
    *,
    version: int | None = None,
) -> tuple[list[str], int]:
    """Manifest-level data skipping: the version's files whose
    [min,max] for ``col`` intersects [lo, hi] — files without stats
    for the column are conservatively kept. Returns (survivors,
    total) so callers can assert pruning actually engaged."""
    if version is None:
        version = current_version(table_dir)
    manifest = _read_manifest(table_dir, version)
    stats = manifest.get("file_stats", {})
    keep = []
    for rel in manifest["files"]:
        s = stats.get(rel, {}).get(col)
        if s is None or not (hi < s[0] or lo > s[1]):
            keep.append(rel)
    return keep, len(manifest["files"])


def read_version_pruned(
    spark: SparkSession,
    table_dir: str,
    col: str,
    lo,
    hi,
    *,
    version: int | None = None,
) -> DataFrame:
    """Range read that PLANS only the manifest-pruned file set, then
    applies the real predicate — correct for any stats (pruning only
    removes files that provably cannot match), and at 100 TB the
    difference between opening every file and opening the few whose
    footer ranges intersect the query."""
    from pyspark.sql import functions as F

    keep, _total = candidate_files(
        table_dir, col, lo, hi, version=version
    )
    if not keep:
        schema = read_version(spark, table_dir, version).schema
        return spark.createDataFrame([], schema)
    paths = [os.path.join(table_dir, p) for p in keep]
    if version is None:
        version = current_version(table_dir)
    # plan with the version's recorded schema, like read_version —
    # a pruned read of a mixed-generation file set must NULL-fill
    # evolved columns the same way the full read does
    schema = _schema_of_manifest(_read_manifest(table_dir, version))
    reader = (
        spark.read.schema(schema) if schema is not None else spark.read
    )
    return reader.parquet(*paths).filter(
        (F.col(col) >= lo) & (F.col(col) <= hi)
    )


class ExpectationViolation(RuntimeError):
    """A CHECK-constrained commit found violating rows; nothing was
    published. ``counts`` maps expectation name → violating rows."""

    def __init__(self, counts: dict):
        self.counts = counts
        super().__init__(f"expectations violated: {counts}")


def commit_with_expectations(
    df: DataFrame,
    table_dir: str,
    expectations: dict[str, str],
    *,
    op: str = "append",
) -> int:
    """CHECK-constrained commit (Delta table-constraints analog):
    every expectation is a SQL boolean over the rows; a row where it
    is not TRUE (false OR null — strict null-fails, unlike Delta's
    null-passes CHECK, because a null quality signal in a data load
    is itself a defect) is a violation.

    Single pass, fail-invisible: violation counts ride the WRITE job
    itself via the Observation API (accumulator-backed — no separate
    validation scan), and the manifest publishes only after the
    counts come back clean. On violation the freshly-written files
    are ORPHANS — invisible to every reader by the module's
    no-manifest-no-visibility invariant — and
    :class:`ExpectationViolation` reports the per-rule counts.

    The passing manifest records the expectations it enforced, so
    the table's history doubles as its contract audit log.
    """
    from pyspark.sql import functions as F

    from workshoop2_etl_spark.operators.quality import with_load_metrics

    if not expectations:
        raise ValueError("need at least one expectation")
    parent = current_version(table_dir)
    if op == "create":
        if parent is not None:
            raise VersionConflict(f"table already exists at {table_dir}")
        base: list[str] = []
    elif op == "append":
        if parent is None:
            raise FileNotFoundError(f"no versioned table at {table_dir}")
        base = _read_manifest(table_dir, parent)["files"]
    else:
        raise ValueError(f"op must be create|append, got {op!r}")
    metrics = {
        name: F.sum(
            F.when(F.expr(sql), F.lit(0)).otherwise(F.lit(1))
        )
        for name, sql in expectations.items()
    }
    observed, obs = with_load_metrics(df, metrics, name="expectations")
    files = _write_data(observed, table_dir)
    counts = {
        name: int(v or 0) for name, v in obs.get.items()
    }
    bad = {n: c for n, c in counts.items() if c > 0}
    if bad:
        raise ExpectationViolation(bad)
    version = 0 if parent is None else parent + 1
    _publish(
        table_dir,
        version,
        {
            "version": version,
            "parent": parent,
            "op": op,
            "files": base + files,
            "schema": observed.schema.json(),
            "expectations": expectations,
        },
    )
    return version


def compact_table(
    spark: SparkSession, table_dir: str, *, target_files: int = 1
) -> int:
    """Rewrite the latest snapshot into ``target_files`` files and
    publish as op "compact" — same rows, fewer/larger files (the
    small-file problem is the #1 operational cost of streaming
    appends: every reader pays per-file open/footer overhead). The
    pre-compaction versions still read (their files are untouched);
    :func:`vacuum` reclaims them once unreferenced-by-retention.
    """
    parent = current_version(table_dir)
    if parent is None:
        raise FileNotFoundError(f"no versioned table at {table_dir}")
    snapshot = read_version(spark, table_dir, parent)
    files = _write_data(snapshot.repartition(target_files), table_dir)
    version = parent + 1
    _publish(
        table_dir,
        version,
        {
            "version": version,
            "parent": parent,
            "op": "compact",
            "files": files,
            "schema": snapshot.schema.json(),
        },
    )
    return version


def vacuum(
    table_dir: str, *, keep_versions: int | None = None
) -> list[str]:
    """Garbage-collect data files no manifest references (orphans
    from crashed or expectation-failed commits), and — when
    ``keep_versions`` is given — files referenced ONLY by manifests
    older than the newest ``keep_versions`` (whose manifests are also
    dropped, truncating time travel to the retention window; the
    Delta VACUUM trade, stated rather than implied).

    Never touches a file referenced by any retained manifest.
    Returns the deleted paths (table-root-relative) for audit.
    """
    import shutil

    latest = current_version(table_dir)
    if latest is None:
        return []
    if keep_versions is not None and keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    cutoff = (
        0 if keep_versions is None else max(0, latest - keep_versions + 1)
    )
    retained_files: set[str] = set()
    for v in range(cutoff, latest + 1):
        try:
            retained_files.update(_read_manifest(table_dir, v)["files"])
        except FileNotFoundError:
            # already truncated by an earlier, tighter vacuum — a
            # WIDER retention later must not crash on the gap
            continue
    deleted: list[str] = []
    data_root = os.path.join(table_dir, "data")
    if os.path.isdir(data_root):
        for commit_dir in sorted(os.listdir(data_root)):
            sub = os.path.join("data", commit_dir)
            full = os.path.join(data_root, commit_dir)
            members = [
                os.path.join(sub, f)
                for f in os.listdir(full)
                if f.endswith(".parquet")
            ]
            if members and not any(m in retained_files for m in members):
                shutil.rmtree(full)
                deleted.extend(members)
    for v in range(0, cutoff):
        p = _manifest_path(table_dir, v)
        if os.path.exists(p):
            os.remove(p)
    return deleted
