"""Small-state persistence for the broker: JSON documents updated by
atomic rename under a per-topic lock file.

The reference serializes offset assignment with a per-topition
``SELECT ... FOR UPDATE`` inside a storage transaction (pg.rs:793); here a
lock file + atomic rename gives the same single-writer guarantee on a
filesystem. On a real deployment this state would live in a proper
metastore (the data plane is unaffected — parquet files are immutable and
readers trust the watermark document, not directory listings).
"""

from __future__ import annotations

import json
import os
import time
from contextlib import contextmanager
from typing import Any


def read_json(path: str, default: Any) -> Any:
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return default


def write_json_atomic(path: str, obj: Any) -> None:
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def write_json_atomic_group(writes: list[tuple[str, Any]]) -> None:
    """Near-atomic multi-file state commit: prepare EVERY temp file
    (write + fsync) first, then rename them back-to-back. Each rename is
    individually atomic; the vulnerable window between files collapses
    from two full write+fsync cycles to the instants between rename
    syscalls. Callers order the list so that a crash inside that residual
    window degrades to at-least-once (e.g. watermarks before producer
    fences: committed records with a stale fence → a retry re-lands the
    batch as duplicates), never to data loss."""
    prepared: list[tuple[str, str]] = []
    for path, obj in writes:
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        prepared.append((tmp, path))
    for tmp, path in prepared:
        os.replace(tmp, path)


@contextmanager
def file_lock(path: str, timeout: float = 30.0, poll: float = 0.02):
    """Exclusive advisory lock via O_CREAT|O_EXCL — the produce-path
    serialization point (one writer per topic at a time)."""
    deadline = time.monotonic() + timeout
    fd = None
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            if time.monotonic() > deadline:
                raise TimeoutError(f"could not acquire lock {path}")
            time.sleep(poll)
    try:
        os.write(fd, str(os.getpid()).encode())
        yield
    finally:
        os.close(fd)
        os.unlink(path)
