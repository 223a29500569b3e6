"""Manifest-based MVCC snapshots: time travel over immutable parquet.

The lakehouse storage contract in its minimal honest form (the idea
behind Iceberg/Delta, built from first principles on plain files):

- data files are IMMUTABLE once written; a write creates new files,
  it never edits old ones;
- a version is a MANIFEST — a JSON file listing exactly the data
  paths that make up the table at that version;
- committing version N+1 means writing the new data files, then
  atomically publishing ``manifests/vN+1.json`` (os.replace of a
  temp file — the same two-phase commit as the mrout writer in
  sources_custom.py);
- reading version N is ``spark.read.parquet(*manifest(N))`` — time
  travel is free because old manifests keep pointing at files that
  are never mutated, and unchanged files are SHARED between
  versions (a one-bucket update rewrites one bucket's files, not
  the table).

The reference's storage model is the opposite extreme — output
files are truncated in place on rewrite (``mr/worker.go:132``
O_TRUNC), so there is exactly one version and a crashed rewrite
destroys it; this module is the 100 TB-posture upgrade. Used by
``q_snapshot_time_travel`` (queries/bucketed.py) and pinned by
tests/test_snapshots.py (immutability, file sharing, atomicity).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    """A versioned parquet table rooted at ``root``."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- manifest bookkeeping -------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "manifests", f"v{version}.json")

    def versions(self) -> list[int]:
        d = os.path.join(self.root, "manifests")
        return sorted(int(f[1:-5]) for f in os.listdir(d)
                      if f.startswith("v") and f.endswith(".json"))

    def manifest(self, version: int) -> list[str]:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)["paths"]

    def _publish(self, version: int, paths: list[str]) -> None:
        """Atomic manifest publish: temp write + os.replace. A
        reader either sees the previous manifest set or the full new
        one, never a partial listing."""
        final = self._manifest_path(version)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(final))
        with os.fdopen(fd, "w") as fh:
            json.dump({"version": version, "paths": sorted(paths)}, fh)
        os.replace(tmp, final)

    # -- commits --------------------------------------------------
    def commit_full(self, df: DataFrame, version: int,
                    bucket_col: str) -> None:
        """Version from scratch: write every bucket partition as its
        own immutable directory (partitionBy keeps bucket->file
        membership explicit, which is what makes partial rewrites
        possible)."""
        out = os.path.join(self.root, "data", f"v{version}")
        df.write.mode("overwrite").partitionBy(bucket_col).parquet(out)
        buckets = [f for f in os.listdir(out)
                   if f.startswith(f"{bucket_col}=")]
        self._publish(version, [os.path.join(out, b) for b in buckets])

    def commit_rewrite(self, df_new: DataFrame, version: int,
                       base_version: int, bucket_col: str,
                       buckets: list[int]) -> None:
        """Copy-on-write commit: replace only ``buckets`` with the
        matching partitions of ``df_new``; every other path is
        carried over from the base manifest untouched."""
        out = os.path.join(self.root, "data", f"v{version}")
        (df_new.where(df_new[bucket_col].isin(buckets))
         .write.mode("overwrite").partitionBy(bucket_col).parquet(out))
        replaced = {f"{bucket_col}={b}" for b in buckets}
        carried = [p for p in self.manifest(base_version)
                   if os.path.basename(p) not in replaced]
        fresh = [os.path.join(out, f) for f in os.listdir(out)
                 if f in replaced]
        self._publish(version, carried + fresh)

    # -- reads ----------------------------------------------------
    def read(self, spark: SparkSession, version: int) -> DataFrame:
        """Time-travel read of one version. The bucket partition
        column is directory metadata, not row data — readers see the
        payload columns only."""
        return spark.read.parquet(*self.manifest(version))

    def shared_paths(self, v1: int, v2: int) -> set[str]:
        return set(self.manifest(v1)) & set(self.manifest(v2))
