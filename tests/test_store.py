"""SDFS verb-surface tests: flat namespace, conflict window, prefix select."""

from __future__ import annotations

import pytest

from mapreduceproject_spark.sources.store import (
    CONFIRM_TIMEOUT_S,
    CONFLICT_WINDOW_S,
    SdfsStore,
    WriteConflict,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


@pytest.fixture
def store(tmp_path):
    clock = FakeClock()
    s = SdfsStore(tmp_path / "sdfs", clock=clock)
    s.clock = clock
    return s


@pytest.fixture
def local(tmp_path):
    p = tmp_path / "local.txt"
    p.write_text("hello\n")
    return p


def test_put_get_ls_store_delete(store, local, tmp_path):
    store.put(local, "f1")
    assert store.ls("f1") and store.store() == ["f1"]
    out = tmp_path / "back.txt"
    store.get("f1", out)
    assert out.read_text() == "hello\n"
    store.delete("f1")
    assert store.ls("f1") == [] and store.store() == []


def test_conflict_window_blocks_then_allows(store, local):
    store.put(local, "f1")
    store.clock.advance(10)
    with pytest.raises(WriteConflict) as ei:
        store.put(local, "f1")
    # confirm with the token proceeds (reference Y path, src/master.go:121-178)
    store.put(local, "f1", confirm=ei.value.token)
    # after the 60 s window, no conflict at all
    store.clock.advance(CONFLICT_WINDOW_S + 1)
    store.put(local, "f1")


def test_confirm_token_expires(store, local):
    store.put(local, "f1")
    store.clock.advance(10)
    with pytest.raises(WriteConflict) as ei:
        store.put(local, "f1")
    store.clock.advance(CONFIRM_TIMEOUT_S + 1)
    with pytest.raises(TimeoutError):
        store.put(local, "f1", confirm=ei.value.token)


def test_prefix_selection(store, local):
    for name in ("wc_a", "wc_b", "other"):
        store.put(local, name)
        store.clock.advance(CONFLICT_WINDOW_S + 1)
    assert [p.name for p in store.select_prefix("wc_")] == ["wc_a", "wc_b"]


def test_flat_namespace_enforced(store, local):
    with pytest.raises(ValueError):
        store.put(local, "dir/child")


def test_conflict_window_survives_new_store_instance(tmp_path, local):
    """The CLI builds a fresh SdfsStore per invocation; the file-mtime
    fallback keeps the 60 s window (and --force) meaningful across
    processes, like the reference master's lifetime last-write table."""
    s1 = SdfsStore(tmp_path / "sdfs")
    s1.put(local, "f1")
    s2 = SdfsStore(tmp_path / "sdfs")  # simulates a second CLI run
    with pytest.raises(WriteConflict) as ei:
        s2.put(local, "f1")
    # confirm path still works in the new process
    s2.put(local, "f1", confirm=ei.value.token)
