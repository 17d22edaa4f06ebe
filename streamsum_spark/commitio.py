"""Commit-primitive backends for the snapshot-MVCC state layer.

The snapshot layer's (snapshots.py) correctness rests on exactly TWO
storage primitives — everything else a commit does is staging I/O that
no reader can observe until these fire:

1. ``put_if_absent(src, dst)`` — atomically publish the fully-written
   file ``src`` at ``dst`` IFF ``dst`` does not exist, reporting
   whether the claim won.  This is the optimistic-concurrency point:
   two writers claiming the same manifest version must serialize here,
   with exactly one winner.
2. ``replace(src, dst)`` — atomically publish ``src`` at ``dst``,
   overwriting any previous object; a concurrent reader sees the old
   content or the new content, never a mix and never a missing file.
   This is the ``_latest`` pointer swap (THE commit) and the vacuum
   watermark update.

A backing store that provides both primitives can host the layer:

- **POSIX / HDFS** (PosixCommitBackend, the default): ``os.link`` is
  put-if-absent by POSIX contract (EEXIST on loss), ``os.replace`` is
  the atomic overwrite.  NFS needs close-to-open consistency for the
  pointer read — same caveat as Delta's HDFSLogStore.
- **Object stores with conditional writes** (CondPutCommitBackend):
  S3 (If-None-Match:* conditional PUT, supported since 2024), GCS
  (x-goog-if-generation-match: 0) and Azure Blob (If-None-Match:*)
  all provide an atomic create-if-absent PUT, and a plain single-object
  PUT is atomic overwrite — so BOTH primitives map directly and no
  external lock table (the pre-conditional-put DynamoDB recipe) is
  needed.  The class here emulates that API shape locally (O_EXCL
  create — notably WITHOUT hard links, which object stores lack) so
  the fault-injection suite can prove the protocol never relies on
  anything outside this contract; a production deployment implements
  the same two methods against the store's SDK.

What is deliberately NOT abstracted: generation-file moves
(``os.rename`` into ``kb=`` dirs) — on an object store these become
uploads to the final key, and their atomicity is irrelevant because no
manifest references a generation file until the pointer swap; and the
rename-aside layer in sinks.py, whose per-bucket directory-swap
protocol is POSIX-only BY DESIGN (documented there; the snapshot layer
is the object-store-portable sibling).
"""

from __future__ import annotations

import os


class PosixCommitBackend:
    """Hard-link claims + rename replaces (POSIX, HDFS)."""

    name = "posix"

    def put_if_absent(self, src: str, dst: str) -> bool:
        """Publish ``src`` at ``dst`` iff absent; consume ``src`` on
        win.  On loss ``src`` is left for the caller (it may inspect
        the incumbent before deciding to overwrite or abort)."""
        try:
            os.link(src, dst)
        except FileExistsError:
            return False
        os.unlink(src)
        return True

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)


class CondPutCommitBackend:
    """Conditional-PUT shaped backend (S3/GCS/Azure contract), emulated
    locally: the claim is an O_EXCL create (the store's If-None-Match
    PUT — atomic object creation, no hard link involved), the replace a
    single-object overwrite.  The emulation's purpose is to run the
    full fault-injection suite against the object-store PRIMITIVE SET;
    a real deployment subclasses this and routes both methods through
    the store SDK with the named preconditions."""

    name = "condput"

    def put_if_absent(self, src: str, dst: str) -> bool:
        try:
            fd = os.open(dst, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        # claim won at the atomic create; stream the object body.  A
        # real conditional PUT uploads body+create atomically — the
        # local window where dst exists but is shorter is covered by
        # the protocol itself: dst only becomes reader-reachable after
        # the pointer swap, and a racing CLAIMER that reads a partial
        # object sees an unparseable manifest == a markerless orphan,
        # which is the refuse-and-retry path, never silent corruption.
        with open(src, "rb") as fh:
            data = fh.read()
        try:
            os.write(fd, data)
        finally:
            os.close(fd)
        os.unlink(src)
        return True

    def replace(self, src: str, dst: str) -> None:
        # single-object PUT overwrite; locally os.replace provides the
        # same all-or-nothing visibility the store gives one object
        os.replace(src, dst)


_BACKEND = PosixCommitBackend()


def get_backend():
    return _BACKEND


def set_backend(backend) -> None:
    """Install a different commit backend (process-wide — the layer's
    single-writer-per-table assumption extends to one backend per
    process; tests swap it around a scoped block)."""
    global _BACKEND
    _BACKEND = backend
