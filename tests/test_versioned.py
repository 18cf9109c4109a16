"""Versioned-table (time-travel) source tests: snapshot isolation via
manifests, append/overwrite/rollback lineage, optimistic publish."""

from __future__ import annotations

import os

import pytest

from workshoop2_etl_spark.sources.versioned import (
    VersionConflict,
    commit_append,
    commit_overwrite,
    create_table,
    current_version,
    history,
    read_version,
    rollback,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 10 AS v")


def test_create_append_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert create_table(_df(spark, 0, 5), t) == 0
    assert commit_append(_df(spark, 5, 8), t) == 1
    assert current_version(t) == 2 - 1
    assert sorted(r.id for r in read_version(spark, t, 0).collect()) == list(
        range(5)
    )
    assert sorted(r.id for r in read_version(spark, t).collect()) == list(
        range(8)
    )
    ops = [m["op"] for m in history(t)]
    assert ops == ["create", "append"]


def test_overwrite_keeps_old_versions_readable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    create_table(_df(spark, 0, 4), t)
    commit_overwrite(_df(spark, 100, 103), t)
    assert sorted(r.id for r in read_version(spark, t, 0).collect()) == [
        0,
        1,
        2,
        3,
    ]
    assert sorted(r.id for r in read_version(spark, t, 1).collect()) == [
        100,
        101,
        102,
    ]


def test_rollback_is_roll_forward(spark, tmp_path):
    t = str(tmp_path / "tbl")
    create_table(_df(spark, 0, 3), t)          # v0
    commit_overwrite(_df(spark, 50, 51), t)    # v1 (the "bad" load)
    v = rollback(t, 0)                         # v2 restores v0's files
    assert v == 2 and current_version(t) == 2
    assert sorted(r.id for r in read_version(spark, t).collect()) == [0, 1, 2]
    # the bad version remains auditable
    assert sorted(r.id for r in read_version(spark, t, 1).collect()) == [50]
    assert history(t)[2]["op"] == "rollback:0"


def test_optimistic_publish_conflict(spark, tmp_path):
    t = str(tmp_path / "tbl")
    create_table(_df(spark, 0, 2), t)
    with pytest.raises(VersionConflict):
        create_table(_df(spark, 0, 2), t)
    # simulate the race: writer A built its commit against parent v0,
    # but another writer published v1 first — A's publish of v1 must
    # conflict (never silently renumber, which would drop B's files)
    from workshoop2_etl_spark.sources.versioned import _commit, _publish

    _publish(t, 1, {"version": 1, "parent": 0, "op": "append", "files": []})
    with pytest.raises(VersionConflict):
        _commit(_df(spark, 2, 4), t, "append", parent=0, base_files=[])
    # a retry that re-reads the new parent succeeds as v2
    assert commit_append(_df(spark, 2, 4), t) == 2


def test_reader_never_sees_unpublished_files(spark, tmp_path):
    """Data files written without a manifest are invisible — the
    snapshot-isolation core."""
    t = str(tmp_path / "tbl")
    create_table(_df(spark, 0, 3), t)
    # orphan data write (simulates a crashed commit: files, no manifest)
    _df(spark, 900, 905).write.parquet(os.path.join(t, "data", "orphan"))
    assert sorted(r.id for r in read_version(spark, t).collect()) == [0, 1, 2]


def test_append_missing_table_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        commit_append(_df(spark, 0, 1), str(tmp_path / "nope"))
