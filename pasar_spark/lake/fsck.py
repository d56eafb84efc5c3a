"""Table integrity checker (``fsck``) — the ops tool you run before
trusting a table after a crash, a partial restore, or a suspect storage
layer. Pure METADATA walk by default (no Spark session, no data scan —
runs in milliseconds on a 10^10-row table because it reads manifests and
``stat()``s files, never rows); ``deep=True`` additionally opens every
referenced parquet FOOTER (pyarrow, still no row reads) and cross-checks
the manifest's recorded row counts and schema ids.

Errors (table is NOT trustworthy):
- CURRENT missing/corrupt, or its manifest missing/corrupt;
- broken parent chain among retained manifests (cycle / non-decreasing /
  parent manifest expired while its child is retained is FINE — chains
  legitimately end at the retention horizon — but a parse failure is not);
- a referenced data file missing or unreadable;
- bucket ids outside [0, n_buckets); unresolved lists unknown buckets;
- current_schema_id or an entry's schema_id absent from the schema map;
- duplicate ledger batch ids;
- a STAGED pointer naming a missing manifest;
- deep: footer row count != manifest row count (torn/overwritten file).

Warnings (legal states worth knowing about):
- orphan data files (present on disk, referenced by NO retained
  manifest) — in-flight writers produce these BY DESIGN; report count,
  bytes, and age so the operator can tell a live write from leakage.

The reference ships no such tool; its integrity story is Postgres's.
This is the lakehouse equivalent of ``iceberg verify``/``fsck``.
"""

from __future__ import annotations

import json
import os
import time

CURRENT = "CURRENT"


def _err(report: dict, msg: str) -> None:
    report["errors"].append(msg)


def _warn(report: dict, msg: str) -> None:
    report["warnings"].append(msg)


def fsck(path: str, deep: bool = False) -> dict:
    """Check the lake table at ``path``; returns a report dict:

        {"ok": bool, "errors": [...], "warnings": [...],
         "checked": {"manifests": n, "files": n, "bytes": n, ...}}

    Never raises on a broken table — every defect becomes an error entry
    (a checker that crashes on the corruption it exists to find is
    useless). Raises only if ``path`` itself is not a table directory.
    """
    report: dict = {
        "path": path,
        "ok": True,
        "errors": [],
        "warnings": [],
        "checked": {"manifests": 0, "files": 0, "bytes": 0, "orphan_files": 0},
    }
    meta = os.path.join(path, "metadata")
    if not os.path.isdir(meta):
        raise FileNotFoundError(f"no lake table at {path!r} (no metadata dir)")

    # --- CURRENT and the manifest inventory -----------------------------
    head = None
    try:
        with open(os.path.join(meta, CURRENT)) as fh:
            head = int(fh.read().strip())
    except FileNotFoundError:
        _err(report, "CURRENT pointer missing")
    except ValueError:
        _err(report, "CURRENT pointer unparseable")

    manifests: dict[int, dict] = {}
    for f in sorted(os.listdir(meta)):
        if f.startswith("v") and f.endswith(".json"):
            try:
                v = int(f[1:-5])
            except ValueError:
                # debris from a partial rename/restore — report, don't
                # crash on the very corruption this tool exists to find
                _err(report, f"unparseable manifest filename {f!r} in metadata/")
                continue
            try:
                with open(os.path.join(meta, f)) as fh:
                    manifests[v] = json.load(fh)
            except (json.JSONDecodeError, OSError) as e:
                _err(report, f"manifest v{v} unreadable: {e}")
    report["checked"]["manifests"] = len(manifests)

    if head is not None and head not in manifests:
        _err(report, f"CURRENT points at v{head} but that manifest is absent/corrupt")

    # --- parent chain from head ------------------------------------------
    if head in manifests:
        seen: set[int] = set()
        v = head
        while v in manifests:
            if v in seen:
                _err(report, f"manifest parent chain cycles at v{v}")
                break
            seen.add(v)
            parent = manifests[v].get("parent_version")
            if not isinstance(parent, int) or (parent >= v and parent != 0):
                _err(report, f"manifest v{v} has invalid parent_version {parent!r}")
                break
            if parent == 0:
                break
            v = parent  # chain may legally end at the retention horizon

    # --- staged pointers --------------------------------------------------
    for f in sorted(os.listdir(meta)):
        if f.startswith("STAGED-"):
            try:
                with open(os.path.join(meta, f)) as fh:
                    sv = int(fh.read().strip())
            except ValueError:
                _err(report, f"staged pointer {f} unparseable")
                continue
            if sv not in manifests:
                _err(report, f"staged pointer {f} names missing manifest v{sv}")

    # --- per-manifest structural checks + referenced-file walk ------------
    referenced: set[str] = set()
    # every (path, rows) pair referenced by ANY retained manifest — the
    # deep footer cross-check walks this, not just the head snapshot, so
    # a torn file referenced only by an older retained version (a
    # time-travel read target) is still caught
    deep_refs: set[tuple] = set()
    for v, m in sorted(manifests.items()):
        nb = m.get("n_buckets")
        schemas = m.get("schemas", {})
        if str(m.get("current_schema_id")) not in schemas:
            _err(report, f"v{v}: current_schema_id {m.get('current_schema_id')} not in schema map")
        batch_ids = m.get("ledger", {}).get("batch_ids", [])
        if len(batch_ids) != len(set(batch_ids)):
            _err(report, f"v{v}: duplicate ledger batch ids")
        unresolved = set(m.get("unresolved", []))
        buckets = m.get("buckets", {})
        unknown = unresolved - set(buckets)
        if unknown:
            _err(report, f"v{v}: unresolved lists unknown buckets {sorted(unknown)}")
        for b, entries in buckets.items():
            try:
                b_ok = isinstance(nb, int) and 0 <= int(b) < nb
            except ValueError:
                b_ok = False
            if not b_ok:
                _err(report, f"v{v}: bucket id {b!r} outside [0, {nb})")
            for e in entries:
                if str(e.get("schema_id")) not in schemas:
                    _err(report, f"v{v}: {e.get('path')} written under unknown schema {e.get('schema_id')}")
                referenced.add(e["path"])
                deep_refs.add((e["path"], e.get("rows")))

    # --- files: existence, sizes, deep footer cross-check ------------------
    for rel in sorted(referenced):
        full = os.path.join(path, rel)
        try:
            report["checked"]["bytes"] += os.path.getsize(full)
            report["checked"]["files"] += 1
        except OSError:
            _err(report, f"referenced data file missing: {rel}")
    if deep:
        import pyarrow.parquet as pq

        for rel, rows in sorted(deep_refs, key=lambda t: (t[0], t[1] is None, t[1])):
            full = os.path.join(path, rel)
            if not os.path.exists(full):
                continue  # already reported above
            try:
                md = pq.ParquetFile(full).metadata
            except Exception as e:
                _err(report, f"{rel}: parquet footer unreadable: {e}")
                continue
            if rows is not None and md.num_rows != rows:
                _err(report, f"{rel}: footer has {md.num_rows} rows, manifest records {rows}")

    # --- orphans (warning: in-flight writers make these by design) --------
    data_root = os.path.join(path, "data")
    now = time.time()
    orphan_bytes = 0
    youngest = None
    if os.path.isdir(data_root):
        for dirpath, _dirs, files in os.walk(data_root):
            for f in files:
                full = os.path.join(dirpath, f)
                rel = os.path.relpath(full, path)
                if rel in referenced or not f.endswith(".parquet"):
                    continue
                report["checked"]["orphan_files"] += 1
                try:
                    orphan_bytes += os.path.getsize(full)
                    age = now - os.path.getmtime(full)
                    youngest = age if youngest is None else min(youngest, age)
                except OSError:
                    pass
    if report["checked"]["orphan_files"]:
        age = f"youngest {youngest:.0f}s old" if youngest is not None else "age unknown"
        _warn(
            report,
            f"{report['checked']['orphan_files']} orphan data files "
            f"({orphan_bytes} bytes, {age}) — an "
            "in-flight write, or leakage expire_snapshots will reclaim",
        )

    report["ok"] = not report["errors"]
    return report
