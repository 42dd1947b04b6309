"""Persistence configuration — reference ``pw.persistence``
(python/pathway/persistence/__init__.py:13 Backend, :88 Config).

The reference snapshots operator state + input offsets to a backend
(file/s3) and replays on restart (src/persistence/).  Structured Streaming
has this natively: the ``checkpointLocation`` holds offsets + state-store
snapshots and every restart resumes exactly-once from it.  This module
keeps the reference's configuration API shape and resolves it to a
checkpoint location that the streaming sinks accept.

    cfg = pw.persistence.Config(pw.persistence.Backend.filesystem("/ckpt"))
    streaming.write_upsert_parquet(t, path, ["k"], checkpoint=cfg.checkpoint_location)

``s3`` backends map to an ``s3a://`` checkpoint path (hadoop-aws jar on a
real cluster); ``snapshot_interval_ms`` has no analogue — micro-batch
boundaries are the snapshot points — and is accepted for compatibility.
"""

from __future__ import annotations

from dataclasses import dataclass


class Backend:
    """Where the computation state persists (reference persistence/__init__.py:13)."""

    def __init__(self, path: str, kind: str = "filesystem"):
        self._path = path
        self._kind = kind

    @classmethod
    def filesystem(cls, path) -> "Backend":
        return cls(str(path), "filesystem")

    @classmethod
    def s3(cls, root_path: str, bucket_settings=None) -> "Backend":
        path = str(root_path)
        if path.startswith("s3://"):
            path = "s3a://" + path[len("s3://"):]
        return cls(path, "s3")

    @classmethod
    def mock(cls, events=None) -> "Backend":
        """In-memory test backend — maps to a temp-dir checkpoint."""
        import tempfile

        return cls(tempfile.mkdtemp(prefix="pw_ckpt_"), "mock")

    @property
    def path(self) -> str:
        return self._path


@dataclass(frozen=True)
class Config:
    """Reference persistence/__init__.py:88 — pass ``checkpoint_location``
    to any streaming sink."""

    backend: Backend
    snapshot_interval_ms: int = 0  # micro-batch boundaries are the snapshots

    @classmethod
    def simple_config(cls, backend: Backend, snapshot_interval_ms: int = 0) -> "Config":
        return cls(backend, snapshot_interval_ms)

    @property
    def checkpoint_location(self) -> str:
        return self.backend.path
