"""Apache Hudi copy-on-write table reader (no jar, no hudi runtime).

Third table format next to ``iceberg_meta`` and ``delta_meta``, same
split: read the table's OWN metadata — here the ``.hoodie`` timeline —
and produce the live data-file list for a snapshot, which feeds
``encode_path(input_files=...)`` for a snapshot-consistent
file-granular encode. Everything is metadata-level: no Spark jobs, no
Hudi runtime, any ``fsutil`` scheme (local, hdfs, s3, mock-s3).

Formats implemented (all public, from the Hudi table spec / docs):

- ``hoodie.properties`` under ``.hoodie/`` — table identity;
  ``hoodie.table.type`` gates COPY_ON_WRITE vs MERGE_ON_READ.
- Timeline instants: files named ``{instant}.{action}[.{state}]`` in
  ``.hoodie/`` (table versions ≤ 0.x) or ``.hoodie/timeline/``
  (1.x), where 1.x completed instants carry a completion time:
  ``{instant}_{completion}.{action}``. Only COMPLETED instants (no
  ``.requested`` / ``.inflight`` suffix, non-empty action) take part
  in the snapshot — a crashed writer's pending instant is invisible,
  the same visibility discipline as our own wave manifests.
- Commit metadata: completed ``.commit`` / ``.replacecommit`` files
  are JSON (``HoodieCommitMetadata``): ``partitionToWriteStats`` maps
  partition path -> write stats, each stat carrying ``fileId`` and the
  table-root-relative ``path`` of the base file written at that
  instant. ``.replacecommit`` (clustering / insert_overwrite) adds
  ``partitionToReplaceFileIds``: those file groups stop existing from
  that instant on.
- Snapshot = latest file slice per FILE GROUP: group base files by
  (partition, fileId), keep the one written at the max completed
  instant ≤ the target, drop groups replaced by a completed
  replacecommit ≤ the target. ``as_of`` gives time travel by instant
  prefix (inclusive), the Hudi ``as.of.instant`` semantics.

Refused loudly rather than silently wrong:

- MERGE_ON_READ tables (``hoodie.table.type``), any completed
  ``.deltacommit`` / ``.compaction`` instant, or a write stat whose
  path is not ``.parquet`` (a log file): reading base files alone
  would resurrect un-compacted updates/deletes.
- ``.restore`` instants: a restore rewinds the timeline in ways this
  replay does not model.
- Non-JSON commit metadata (Hudi 1.x writes Avro-serialized commit
  metadata for completed instants): refused with the version hint
  rather than mis-parsed.
- Unknown completed actions. ``clean`` / ``rollback`` / ``savepoint``
  are known no-ops for snapshot scans (clean deletes only
  NON-latest slices; rollback targets pending instants) and are
  skipped.

Reference analogue: the reference plugin's scan is a Hadoop
FileSystem glob (`ParquetHadoopInputPlugin.java:85-93`); table formats
that version their file sets are our scan planner's concern, the same
split as the Iceberg and Delta readers.

Scale notes: planning reads one directory listing plus one small JSON
per completed commit instant — O(timeline length), no data-file IO.
Hudi archives old instants out of the active timeline, bounding the
listing; the replay cost is independent of table size. The returned
file list fans out one encode task per file exactly like a plain glob.
"""

from __future__ import annotations

import json
import posixpath

from ..plans import fsutil


class HudiMetaError(ValueError):
    """Hudi table metadata is unsupported or inconsistent."""


# completed actions that contribute file-set changes
_APPLY_ACTIONS = ("commit", "replacecommit")
# completed actions that never change the latest file slice
_NOOP_ACTIONS = ("clean", "rollback", "savepoint", "indexing",
                 "schemacommit")
# completed actions that mean the snapshot cannot be reconstructed here
_REFUSE_ACTIONS = {
    "deltacommit": "merge-on-read deltacommit in the timeline",
    "compaction": "merge-on-read compaction in the timeline",
    "logcompaction": "merge-on-read log compaction in the timeline",
    "restore": "a restore instant rewinds the timeline",
}


def _hoodie_dir(table_dir: str) -> str:
    return f"{table_dir.rstrip('/')}/.hoodie"


def table_properties(table_dir: str) -> dict:
    """Parse ``.hoodie/hoodie.properties`` (java.util.Properties text:
    ``key=value`` lines, ``#``/``!`` comments)."""
    path = f"{_hoodie_dir(table_dir)}/hoodie.properties"
    if not fsutil.exists(path):
        raise HudiMetaError(
            f"not a Hudi table: {path} missing")
    props: dict[str, str] = {}
    for line in fsutil.read_bytes(path).decode("utf-8").splitlines():
        line = line.strip()
        if not line or line[0] in "#!":
            continue
        k, sep, v = line.partition("=")
        if sep:
            props[k.strip()] = v.strip()
    return props


def _timeline_dir(table_dir: str) -> str:
    """Active-timeline directory: ``.hoodie/timeline/`` when present
    (1.x layout), else ``.hoodie/`` itself (0.x)."""
    hd = _hoodie_dir(table_dir)
    tl = f"{hd}/timeline"
    return tl if fsutil.isdir(tl) else hd


def _parse_instant_name(name: str) -> tuple[str, str, bool] | None:
    """``(instant, action, completed)`` from a timeline file name, or
    None for non-instant files (hoodie.properties, dirs, .aux, ...).

    Completed: ``{instant}.{action}`` or ``{instant}_{completion}.{action}``
    Pending:   ``...{action}.requested`` / ``....inflight`` (0.x commit
    inflights are the bare ``{instant}.inflight``)."""
    if name.startswith("."):
        return None
    parts = name.split(".")
    if len(parts) < 2 or not parts[0]:
        return None
    stamp = parts[0]
    instant = stamp.split("_", 1)[0]  # strip 1.x completion time
    if not instant.isdigit():
        return None
    if parts[-1] in ("requested", "inflight"):
        action = parts[1] if len(parts) > 2 else "commit"
        return instant, action, False
    return instant, ".".join(parts[1:]), True


def _read_commit_meta(path: str) -> dict:
    raw = fsutil.read_bytes(path)
    if not raw.strip():
        return {}
    try:
        return json.loads(raw)
    except ValueError as e:
        raise HudiMetaError(
            f"commit metadata at {path} is not JSON "
            f"(Hudi 1.x Avro-serialized timeline?): {e}") from e


def _within_as_of(instant: str, as_of: str) -> bool:
    """Hudi ``as.of.instant`` semantics: inclusive, and a SHORTER
    user-supplied timestamp acts as a prefix — ``as_of="20240101"``
    must include every instant on that day, which a plain string
    compare would exclude (``"20240101000000000" > "20240101"``)."""
    return instant <= as_of or instant.startswith(as_of)


def all_completed_instants(table_dir: str) -> set[str]:
    """Every completed instant string, INCLUDING no-op actions
    (clean/rollback/savepoint) — the valid watermark values for
    :func:`snapshot_scan_diff` (a clean's file set equals the previous
    apply-instant's, so it is a perfectly decidable as_of point)."""
    tl = _timeline_dir(table_dir)
    out = set()
    for name in fsutil.listdir(tl):
        parsed = _parse_instant_name(name)
        if parsed is not None and parsed[2]:
            out.add(parsed[0])
    return out


def completed_instants(table_dir: str) -> list[tuple[str, str, str]]:
    """Sorted ``(instant, action, timeline file path)`` for every
    COMPLETED instant, refusing the timeline shapes the snapshot replay
    cannot model."""
    tl = _timeline_dir(table_dir)
    out: list[tuple[str, str, str]] = []
    for name in fsutil.listdir(tl):
        parsed = _parse_instant_name(name)
        if parsed is None:
            continue
        instant, action, completed = parsed
        if not completed:
            continue
        if action in _REFUSE_ACTIONS:
            raise HudiMetaError(
                f"unsupported Hudi timeline: {_REFUSE_ACTIONS[action]} "
                f"({name}) — encode via the Hudi Spark reader instead")
        if action in _NOOP_ACTIONS:
            continue
        if action not in _APPLY_ACTIONS:
            raise HudiMetaError(
                f"unknown completed timeline action {action!r} ({name}) "
                "— refusing rather than guessing its file-set effect")
        out.append((instant, action, f"{tl}/{name}"))
    out.sort()
    return out


def snapshot_scan(table_dir: str, as_of: str | None = None) -> dict:
    """Replay the COW timeline to the latest (or ``as_of``) snapshot.

    Returns ``{"files": [abs paths, sorted], "instant": str | None,
    "partitions": {abs path: partition path}, "groups":
    {(partition, fileId): (slice instant, abs path)}}``. Raises
    :class:`HudiMetaError` for MOR tables and unsupported timelines.
    """
    props = table_properties(table_dir)
    ttype = props.get("hoodie.table.type", "COPY_ON_WRITE").upper()
    if ttype != "COPY_ON_WRITE":
        raise HudiMetaError(
            f"hoodie.table.type={ttype}: base files alone would "
            "resurrect un-compacted merge-on-read rows; encode via the "
            "Hudi Spark reader instead")
    base = table_dir.rstrip("/")
    # (partition, fileId) -> (instant, relpath): the latest file slice
    state: dict[tuple[str, str], tuple[str, str]] = {}
    applied: str | None = None
    for instant, action, fname in completed_instants(table_dir):
        if as_of is not None and not _within_as_of(instant, as_of):
            continue
        meta = _read_commit_meta(fname)
        written: set[tuple[str, str]] = set()
        for part, stats in (meta.get("partitionToWriteStats") or {}).items():
            for st in stats or []:
                rel, fid = st.get("path"), st.get("fileId")
                if not rel:
                    continue
                if not rel.endswith(".parquet"):
                    raise HudiMetaError(
                        f"non-parquet base file {rel!r} written at "
                        f"{instant} (merge-on-read log file?) — refusing")
                if not fid:
                    # filenames are {fileId}_{writeToken}_{instant}.parquet;
                    # fileId never contains '_'
                    fid = posixpath.basename(rel).split("_", 1)[0]
                key = (part, fid)
                written.add(key)
                prev = state.get(key)
                if prev is None or prev[0] < instant:
                    state[key] = (instant, rel)
        if action == "replacecommit":
            for part, fids in (meta.get("partitionToReplaceFileIds")
                               or {}).items():
                for fid in fids or []:
                    key = (part, fid)
                    if key in written:
                        raise HudiMetaError(
                            f"replacecommit {instant} replaces a file "
                            f"group it also writes ({part}/{fid}) — "
                            "malformed metadata")
                    state.pop(key, None)
        applied = instant
    partitions = {f"{base}/{rel}": key[0]
                  for key, (_, rel) in state.items()}
    files = sorted(partitions)
    groups = {key: (inst, f"{base}/{rel}")
              for key, (inst, rel) in state.items()}
    return {"files": files, "instant": applied, "partitions": partitions,
            "groups": groups}


def snapshot_files(table_dir: str, as_of: str | None = None) -> list[str]:
    """Data files of the snapshot, for ``encode_path(input_files=...)``."""
    return snapshot_scan(table_dir, as_of)["files"]


def snapshot_scan_diff(table_dir: str, since_instant: str,
                       as_of: str | None = None) -> dict:
    """File groups ADDED strictly after ``since_instant`` (up to
    ``as_of`` / latest) — the Hudi analogue of the Iceberg
    ``--since-snapshot`` and Delta ``--since-version`` incremental
    ingest, with the same refusal contract: a file group that was live
    at ``since_instant`` and has since been REWRITTEN (upsert) or
    REPLACED (clustering / insert_overwrite) refuses, because an
    append-only encode tree cannot retract rows already committed from
    the old slice. Brand-new file groups (inserts into new or existing
    partitions) are the only diff an append can represent.

    ``since_instant`` must be an actual completed instant (a typo'd
    instant would otherwise silently produce a too-large diff).
    Returns the added files in the same shape as :func:`snapshot_scan`
    (so :func:`filter_partitions` composes), plus the replayed
    ``instant``.
    """
    completed = all_completed_instants(table_dir)
    if since_instant not in completed:
        raise HudiMetaError(
            f"since_instant {since_instant!r} is not a completed "
            f"timeline instant (completed: {sorted(completed)})")
    old = snapshot_scan(table_dir, as_of=since_instant)
    new = snapshot_scan(table_dir, as_of=as_of)
    changed = sorted(
        key for key, slice_ in old["groups"].items()
        if new["groups"].get(key) != slice_)
    if changed:
        raise HudiMetaError(
            f"file group(s) rewritten or replaced since "
            f"{since_instant}: {changed[:3]}{'...' if len(changed) > 3 else ''}"
            " — an append-only encode tree cannot retract committed "
            "rows; re-encode from scratch or encode the full snapshot "
            "into a new tree")
    added = sorted(k for k in new["groups"] if k not in old["groups"])
    groups = {k: new["groups"][k] for k in added}
    partitions = {path: key[0] for key, (_, path) in groups.items()}
    return {"files": sorted(partitions), "instant": new["instant"],
            "partitions": partitions, "groups": groups}


def filter_partitions(scan: dict, pf: dict) -> dict:
    """Metadata-level partition filter over a :func:`snapshot_scan`
    result: keep files whose HIVE-STYLE partition path (``k=v`` slash
    segments, Hudi's ``hive_style_partitioning=true`` layout) matches
    every ``pf`` key. A partition path that does not carry one of the
    filter keys (non-hive layouts like ``2024/01/01``, or the root
    partition) is undecidable and refuses rather than silently
    including/excluding files — same discipline as the Iceberg reader's
    unscopable equality deletes."""
    def _match(ppath: str) -> bool:
        segs = dict(seg.partition("=")[::2] for seg in ppath.split("/")
                    if "=" in seg)
        missing = [k for k in pf if k not in segs]
        if missing:
            raise HudiMetaError(
                f"partition filter key(s) {missing} absent from "
                f"partition path {ppath!r} — not a hive-style "
                "partition layout; cannot filter at metadata level")
        return all(segs[k] == str(v) for k, v in pf.items())

    parts = {f: p for f, p in scan["partitions"].items() if _match(p)}
    return {**scan, "files": sorted(parts), "partitions": parts}


# ---------------------------------------------------------------------------
# fixture writer (tests)

def write_table_fixture(table_dir: str, commits: list[dict],
                        table_type: str = "COPY_ON_WRITE",
                        timeline_v1: bool = False,
                        extra_timeline_files: list[str] | None = None
                        ) -> list[str]:
    """Spec-shaped Hudi COW table over existing Parquet files.

    ``commits`` is a list of instants in order; each dict:

    - ``writes``: ``{partition_path: [(fileId, src_parquet_path)]}`` —
      each src file is copied in as
      ``{partition}/{fileId}_1-0-1_{instant}.parquet`` and recorded in
      that instant's ``partitionToWriteStats`` (root partition: "").
    - ``replaces``: ``{partition_path: [fileId, ...]}`` — emitted as a
      ``replacecommit`` with ``partitionToReplaceFileIds``.
    - ``action``: override the action name (default ``commit``, or
      ``replacecommit`` when ``replaces`` present).
    - ``pending``: write only the ``.requested``/``.inflight`` markers
      (a crashed writer) — its files are copied in but must stay
      invisible.

    ``timeline_v1`` writes instants under ``.hoodie/timeline/`` with
    1.x completion-time-suffixed completed names.
    ``extra_timeline_files`` drops extra (empty) instant files in for
    refusal tests. Returns the instant strings in order.
    """
    base = table_dir.rstrip("/")
    hd = f"{base}/.hoodie"
    tl = f"{hd}/timeline" if timeline_v1 else hd
    fsutil.makedirs_any(tl)
    props = "\n".join([
        "#Updated at 2024-01-01T00:00:00Z",
        "hoodie.table.name=fixture",
        f"hoodie.table.type={table_type}",
        "hoodie.table.version=6" if not timeline_v1
        else "hoodie.table.version=8",
        "hoodie.timeline.layout.version=1",
        "hoodie.datasource.write.hive.style.partitioning=true",
    ]) + "\n"
    fsutil.put_bytes(f"{hd}/hoodie.properties", props.encode())
    instants: list[str] = []
    for i, c in enumerate(commits):
        instant = f"{20240101000000 + i:017d}"
        instants.append(instant)
        action = c.get("action") or (
            "replacecommit" if c.get("replaces") else "commit")
        p2ws: dict[str, list[dict]] = {}
        for part, entries in (c.get("writes") or {}).items():
            stats = []
            for fid, src in entries:
                rel = (f"{part}/" if part else "") + \
                    f"{fid}_1-0-1_{instant}.parquet"
                fsutil.put_file(f"{base}/{rel}", src)
                stats.append({"fileId": fid, "path": rel,
                              "prevCommit": "null",
                              "partitionPath": part})
            p2ws[part] = stats
        meta: dict = {"partitionToWriteStats": p2ws,
                      "compacted": False,
                      "operationType": c.get("operation", "upsert")}
        if c.get("replaces"):
            meta["partitionToReplaceFileIds"] = c["replaces"]
        fsutil.put_bytes(f"{tl}/{instant}.{action}.requested", b"")
        inflight = (f"{instant}.inflight" if action == "commit"
                    and not timeline_v1 else f"{instant}.{action}.inflight")
        fsutil.put_bytes(f"{tl}/{inflight}", b"")
        if not c.get("pending"):
            done = (f"{instant}_{20240101100000 + i:017d}.{action}"
                    if timeline_v1 else f"{instant}.{action}")
            fsutil.put_bytes(f"{tl}/{done}",
                             json.dumps(meta, indent=2).encode())
    for name in extra_timeline_files or []:
        fsutil.put_bytes(f"{tl}/{name}", b"")
    return instants
