"""SDFS verb surface re-expressed as a catalog over a root directory.

Reference parity (SURVEY §2.1):
- ``PUT``    /root/reference/src/node.go:119-189, src/master.go:212-298
- ``GET``    src/node.go:117,336-418, src/master.go:72-113
- ``DELETE`` src/node.go:206-208, src/master.go:82-108
- ``LS``     src/node.go:191-204
- ``STORE``  src/node.go:211-217

Replication (4 replicas by FNV hash ring, src/master_helpers.go:103-139) and
read-your-writes blocking (src/master.go:75-80) are storage-layer concerns in
Spark — delegated to HDFS/S3/local FS.  What we keep as *engine* semantics:

- the flat filename namespace with prefix-as-directory selection
  (src/master.go:448-453 selects maple inputs by ``strings.HasPrefix``);
- the 60-second write-write conflict window with an explicit user confirm
  (constant ``minute`` src/master_helpers.go:27, Y/N round-trip with a 30 s
  timeout src/master.go:121-178).  Instead of blocking on stdin, ``put``
  raises :class:`WriteConflict` carrying the pending token; callers confirm
  by re-calling with ``confirm=token`` — a deterministic, testable seam.

Scale note: metadata ops here are O(#files) directory listings on the
driver; data never flows through this class (files are moved/copied by the
filesystem, datasets by ``spark.read``/``df.write``), so nothing in this
facade becomes a bottleneck at 100 TB — unlike the reference, where every
shuffle byte funnels through the single master (src/master.go:518-614).
"""

from __future__ import annotations

import shutil
import time
import uuid
from dataclasses import dataclass
from pathlib import Path

CONFLICT_WINDOW_S = 60.0  # src/master_helpers.go:27 ("minute")
CONFIRM_TIMEOUT_S = 30.0  # src/master.go:122


class WriteConflict(Exception):
    """A second PUT to the same name within the 60 s window.

    Mirrors the reference's CONFIRM round-trip (src/master.go:121-178)
    without an interactive prompt: the token must be passed back within
    ``CONFIRM_TIMEOUT_S`` to proceed.
    """

    def __init__(self, name: str, token: str, age_s: float):
        super().__init__(
            f"write-write conflict on {name!r} ({age_s:.1f}s since last write); "
            f"re-call put(..., confirm=token) within {CONFIRM_TIMEOUT_S:.0f}s"
        )
        self.name = name
        self.token = token
        self.age_s = age_s


@dataclass
class _Pending:
    token: str
    issued_at: float


class SdfsStore:
    """Flat-namespace file store over one root directory."""

    def __init__(self, root: str | Path, clock=time.monotonic):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._clock = clock
        self._last_write: dict[str, float] = {}
        self._pending: dict[str, _Pending] = {}

    def _path(self, name: str) -> Path:
        # empty name would resolve to the store ROOT itself (put -> a
        # spurious WriteConflict then IsADirectoryError, delete -> unlink
        # on a directory) — reject it with the same error as other
        # malformed names.
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"flat namespace only: bad name {name!r}")
        return self.root / name

    # -- PUT ---------------------------------------------------------------
    def put(self, local: str | Path, name: str, confirm: str | None = None) -> Path:
        """Upload ``local`` under ``name``; conflict-window semantics above.

        The conflict baseline is the in-memory last-write time within one
        session, falling back to the stored file's mtime when this process
        has no record — the reference master tracks last-writes for its
        whole lifetime (src/master_helpers.go:27), and the mtime fallback
        gives the same protection across separate CLI invocations (the
        store facade is rebuilt per command).
        """
        now = self._clock()
        dest = self._path(name)
        last = self._last_write.get(name)
        pending = self._pending.get(name)
        if confirm is not None:
            if (
                pending is None
                or pending.token != confirm
                or now - pending.issued_at > CONFIRM_TIMEOUT_S
            ):
                raise TimeoutError(
                    f"confirm token for {name!r} missing/expired "
                    f"(>{CONFIRM_TIMEOUT_S:.0f}s) — retry put()"
                )
            del self._pending[name]
        elif last is not None and now - last < CONFLICT_WINDOW_S:
            tok = uuid.uuid4().hex
            self._pending[name] = _Pending(tok, now)
            raise WriteConflict(name, tok, now - last)
        elif last is None and dest.exists():
            # cross-process conflict: mtime is wall-clock, so compare with
            # wall time, not the injectable (possibly monotonic) clock
            age = time.time() - dest.stat().st_mtime
            if 0 <= age < CONFLICT_WINDOW_S:
                tok = uuid.uuid4().hex
                self._pending[name] = _Pending(tok, now)
                raise WriteConflict(name, tok, age)
        shutil.copyfile(local, dest)
        self._last_write[name] = self._clock()
        return dest

    # -- GET ---------------------------------------------------------------
    def get(self, name: str, local: str | Path) -> Path:
        src = self._path(name)
        if not src.exists():
            raise FileNotFoundError(name)
        shutil.copyfile(src, local)
        return Path(local)

    def path(self, name: str) -> Path:
        """Resolve a name for direct spark.read (zero-copy GET)."""
        p = self._path(name)
        if not p.exists():
            raise FileNotFoundError(name)
        return p

    # -- DELETE ------------------------------------------------------------
    def delete(self, name: str) -> None:
        p = self._path(name)
        if p.exists():
            p.unlink()
        self._last_write.pop(name, None)
        self._pending.pop(name, None)

    # -- LS / STORE ----------------------------------------------------------
    def ls(self, name: str) -> list[str]:
        """Locations holding ``name`` (single-root store: 0 or 1)."""
        return [str(self.root)] if self._path(name).exists() else []

    def store(self) -> list[str]:
        """All names in the store (reference: files on the local node)."""
        return sorted(p.name for p in self.root.iterdir() if p.is_file())

    def select_prefix(self, prefix: str) -> list[Path]:
        """Prefix-as-directory input selection (src/master.go:448-453)."""
        return sorted(
            p for p in self.root.iterdir() if p.is_file() and p.name.startswith(prefix)
        )
