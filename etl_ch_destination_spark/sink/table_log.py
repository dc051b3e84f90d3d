"""Transaction-log COMMIT writer — the destination half of the
Delta-style protocol the scan_table_log* family reads.

A lakehouse destination never "writes a table"; it writes immutable
data files and then publishes them with an atomic commit: a
``%020d.json`` action file whose CREATION is the transaction. The
protocol's two load-bearing properties, both enforced here:

- **Atomicity**: the commit file appears fully-written or not at all.
  We write to a temp name in the log directory and publish with
  ``os.link`` (fails with EEXIST instead of overwriting) — the
  put-if-absent primitive Delta requires of its log store.
- **Optimistic concurrency**: two writers racing to version N cannot
  both win. The loser's ``link`` raises ``CommitConflict``; per
  protocol it must re-read the log, re-derive its actions against the
  new state, and retry at N+1 — exactly what a multi-writer
  destination does on a real object store.

``txn`` actions ({appId, version}) ride in commits so idempotent
writers (streaming foreachBatch replaying an epoch) can detect their
own prior commit and skip — read back via ``last_txn_version``.
"""

from __future__ import annotations

import json
import os


class CommitConflict(Exception):
    """Another writer already committed this version (protocol: re-read
    the log and retry at the next version)."""


def commit(log_dir: str, version: int, actions: list[dict]) -> str:
    """Atomically publish ``actions`` as commit ``version``.

    Returns the commit file path. Raises CommitConflict if the version
    already exists — never overwrites (overwriting a commit would
    rewrite table history out from under concurrent readers)."""
    os.makedirs(log_dir, exist_ok=True)
    final = os.path.join(log_dir, "%020d.json" % version)
    tmp = final + ".tmp.%d" % os.getpid()
    with open(tmp, "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, final)  # put-if-absent: EEXIST on conflict
    except FileExistsError:
        raise CommitConflict(f"version {version} already committed")
    finally:
        os.unlink(tmp)
    return final


def latest_version(log_dir: str) -> int:
    """Highest committed version, -1 for an empty/missing log."""
    if not os.path.isdir(log_dir):
        return -1
    versions = [
        int(name[:-5])
        for name in os.listdir(log_dir)
        if name.endswith(".json") and name[:-5].isdigit()
    ]
    return max(versions, default=-1)


def read_actions(log_dir: str, upto: int | None = None) -> list[tuple[int, dict]]:
    """All (version, action) pairs up to ``upto`` (driver-side, over
    the bounded manifest — the same scale shape as Delta's own log
    replay)."""
    out: list[tuple[int, dict]] = []
    if not os.path.isdir(log_dir):
        return out
    hi = latest_version(log_dir) if upto is None else upto
    for name in sorted(os.listdir(log_dir)):
        if not (name.endswith(".json") and name[:-5].isdigit()):
            continue
        v = int(name[:-5])
        if v > hi:
            continue
        with open(os.path.join(log_dir, name)) as f:
            for line in f:
                line = line.strip()
                if line:
                    out.append((v, json.loads(line)))
    return out


def last_txn_version(log_dir: str, app_id: str) -> int:
    """Latest ``txn`` version committed by ``app_id`` (-1 if none) —
    the idempotent-writer probe: a replayed micro-batch whose epoch is
    <= this value has already been committed and must be skipped."""
    best = -1
    for _, action in read_actions(log_dir):
        t = action.get("txn")
        if t and t.get("appId") == app_id:
            best = max(best, int(t["version"]))
    return best


def add_action(path: str, n: int, lo, hi, partition: dict | None = None) -> dict:
    """An ``add`` with the embedded Delta-style stats string the
    scan_table_log reader prunes on."""
    a = {
        "path": path,
        "dataChange": True,
        "stats": json.dumps(
            {
                "numRecords": int(n),
                "minValues": {"o_orderkey": int(lo)},
                "maxValues": {"o_orderkey": int(hi)},
            }
        ),
    }
    if partition is not None:
        a["partitionValues"] = {k: str(v) for k, v in partition.items()}
    return {"add": a}
