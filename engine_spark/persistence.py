"""Named-revision persist / restore over streaming checkpoints.

Reference surface: ``EventFluxAppRuntime::persist()`` /
``restore_revision()`` (eventflux_app_runtime.rs:893-921) — a snapshot
service captures every stateful processor's state under a revision id; the
incremental WAL (persistence/incremental/write_ahead_log.rs, 905 LoC)
replays events after the snapshot point.

Spark already maintains the equivalent durable state: the streaming
checkpoint directory holds the state store AND the source offsets. A named
revision is therefore a snapshot of the checkpoint tree:

- ``persist(name)`` — hardlink-copy the checkpoint into
  ``<root>/revisions/<name>`` (links, not byte copies: state-store files
  are immutable once written, the same trick the partitioned Table uses);
- ``restore(name)`` — replace the live checkpoint with the revision.
  The next query start resumes from the revision's offsets, so events
  that arrived after the snapshot are REPLAYED through the restored
  state — exactly the reference's restore-then-WAL-replay semantics,
  with the file/queue source itself acting as the WAL.

On a cluster the same copy runs against HDFS/object storage paths; the
checkpoint layout is Spark's own, so restored queries are plain restarts.
"""

from __future__ import annotations

import os
import shutil


def _copytree_linked(src: str, dst: str) -> None:
    """Copy a directory tree using hardlinks for files (fall back to a real
    copy across filesystems)."""

    def link_or_copy(s: str, d: str) -> None:
        try:
            os.link(s, d)
        except OSError:
            shutil.copy2(s, d)

    shutil.copytree(src, dst, copy_function=link_or_copy)


def persist_checkpoint(checkpoint_dir: str, revisions_root: str, name: str) -> str:
    """Snapshot the checkpoint under a named revision; returns its path.
    Call between query runs (the checkpoint is consistent at rest — Spark
    commits offsets and state per epoch)."""
    dst = os.path.join(revisions_root, name)
    if os.path.exists(dst):
        raise ValueError(f"revision {name!r} already exists")
    os.makedirs(revisions_root, exist_ok=True)
    _copytree_linked(checkpoint_dir, dst)
    return dst


def restore_checkpoint(checkpoint_dir: str, revisions_root: str, name: str) -> None:
    """Replace the live checkpoint with revision ``name``. The next query
    start resumes from the revision's offsets and state; later input is
    replayed through it."""
    src = os.path.join(revisions_root, name)
    if not os.path.isdir(src):
        raise KeyError(f"no such revision {name!r}")
    if os.path.exists(checkpoint_dir):
        shutil.rmtree(checkpoint_dir)
    _copytree_linked(src, checkpoint_dir)


def list_revisions(revisions_root: str) -> list[str]:
    if not os.path.isdir(revisions_root):
        return []
    return sorted(os.listdir(revisions_root))
