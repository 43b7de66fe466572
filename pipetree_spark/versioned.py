"""Versioned tables: snapshot log + time travel over parquet artifacts.

The content-addressed cache (cache.py) answers "is this exact stage
output already materialized?"; this module answers the orthogonal
production question: "what did the table look like at version N, and
can I get back there?" — the reproducibility contract a training-data
pipeline needs (pin the corpus version a run trained on; roll back a
bad ingest in O(1)) without a lakehouse dependency.

Design — a minimal manifest log, Delta-style in spirit, parquet-pure in
implementation:

- data lives in immutable snapshot dirs ``<root>/<name>/snap-<uuid>/``
  (parquet; written once, never mutated or rewritten),
- each commit writes ``_versions/<n>.json`` listing the snapshot dirs
  that ARE the table at version n (append = previous list + one new
  dir; overwrite = one new dir; rollback = the old version's list,
  re-committed — no data copied),
- a read at version n is ``spark.read.parquet(*dirs)`` — Spark scans
  the union of the listed dirs in parallel; nothing is merged
  driver-side,
- the commit point is the atomic ``rename`` of the version file; a
  concurrent commit to the same version loses the rename race and
  raises ``CommitConflict`` (optimistic concurrency, retry-at-caller —
  the same contract Delta's log gives).

Scale notes: manifests are O(commits) JSON files of directory paths —
metadata, never data; append and rollback never rewrite rows, so a
100 TB table appends in the cost of the new rows only; ``vacuum``
deletes snapshot dirs unreachable from the retained version horizon
(the only operation that destroys data, and it refuses to touch
anything a retained version still references).

Manifest I/O here is plain local-FS ``os`` calls (atomic rename is the
POSIX contract the commit relies on); routing it through the Hadoop
FileSystem API for ``s3a://`` roots is the same mechanical swap
cache.py already demonstrates — data reads/writes are Spark-side and
scheme-agnostic today.

Reference note: the reference (pipetree/pipetree — /root/reference is
empty, SURVEY §0) versions artifacts implicitly via content hashes;
an explicit linear history with time travel is north-star surface
[SURVEY §2.0 tag E].
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer committed this version first — reread and retry."""


class VersionedTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root.rstrip("/"), name)
        self.log_dir = os.path.join(self.dir, "_versions")

    # -- log plumbing ----------------------------------------------------
    def _version_file(self, n: int) -> str:
        return os.path.join(self.log_dir, f"{n:06d}.json")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f.split(".")[0]) for f in os.listdir(self.log_dir) if f.endswith(".json")
        )

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, n: int) -> dict:
        with open(self._version_file(n)) as fh:
            return json.load(fh)

    def _commit(self, dirs: list[str], action: str) -> int:
        """Atomically commit a new version whose content is ``dirs``.
        The temp-write + rename is the commit point; losing the rename
        race to a concurrent writer raises CommitConflict."""
        os.makedirs(self.log_dir, exist_ok=True)
        latest = self.latest_version()
        n = 0 if latest is None else latest + 1
        target = self._version_file(n)
        tmp = target + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump({"version": n, "action": action, "dirs": dirs}, fh)
        if os.path.exists(target):
            os.unlink(tmp)
            raise CommitConflict(f"version {n} already committed")
        os.rename(tmp, target)
        return n

    # -- public API ------------------------------------------------------
    def write(self, df: DataFrame, mode: str = "append") -> int:
        """Materialize ``df`` as a new immutable snapshot dir and commit
        version latest+1: ``append`` keeps prior dirs, ``overwrite``
        replaces the dir list. Returns the committed version."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        snap = os.path.join(self.dir, f"snap-{uuid.uuid4().hex[:12]}")
        df.write.parquet(snap)
        latest = self.latest_version()
        prior = self._manifest(latest)["dirs"] if (latest is not None and mode == "append") else []
        return self._commit(prior + [snap], mode)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Time-travel read: the table as of ``version`` (default
        latest). The union of snapshot dirs is scanned by Spark in one
        parallel read — no driver-side merging."""
        v = self.latest_version() if version is None else version
        if v is None or not os.path.exists(self._version_file(v)):
            raise FileNotFoundError(f"no version {version!r} in {self.log_dir}")
        dirs = self._manifest(v)["dirs"]
        if not dirs:
            raise FileNotFoundError(f"version {v} is empty")
        return spark.read.parquet(*dirs)

    def rollback(self, version: int) -> int:
        """Commit a NEW version whose content is ``version``'s dir list —
        O(1) revert, history preserved (a rollback is itself an
        auditable commit, not an erasure)."""
        dirs = self._manifest(version)["dirs"]
        return self._commit(dirs, f"rollback:{version}")

    def history(self) -> list[dict]:
        return [self._manifest(n) for n in self.versions()]

    def vacuum(self, retain_last: int = 1) -> list[str]:
        """Delete snapshot dirs unreachable from the last ``retain_last``
        versions. Time travel to vacuumed versions stops working — this
        is the one destructive operation, and it never touches a dir a
        retained version references. Returns the deleted dirs."""
        import shutil

        vs = self.versions()
        keep = {d for n in vs[-retain_last:] for d in self._manifest(n)["dirs"]}
        deleted = []
        for entry in os.listdir(self.dir):
            full = os.path.join(self.dir, entry)
            if entry.startswith("snap-") and full not in keep:
                shutil.rmtree(full)
                deleted.append(full)
        return deleted
