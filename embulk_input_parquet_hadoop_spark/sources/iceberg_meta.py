"""Iceberg table-metadata reader (no Iceberg runtime jar needed).

The north rule's input is "Iceberg tables of pre-tokenized training
sequences". The sandbox has no iceberg-spark-runtime on the classpath
(``table.py`` handles that path when one exists); this module reads the
TABLE FORMAT itself — the public Iceberg spec
(https://iceberg.apache.org/spec/) — with the pure-Python Avro layer in
``avro_io.py``:

    metadata/version-hint.text -> vN.metadata.json -> current snapshot
      -> manifest list (avro) -> manifests (avro) -> data files

``snapshot_data_files`` returns the current snapshot's live data-file
paths, which feed ``encode_path(input_files=...)`` directly — the same
file-granular fan-out the engine uses for plain Parquet trees, now
snapshot-consistent: concurrent commits after the metadata read cannot
change the file set mid-job (Iceberg files are immutable; a snapshot is
a frozen list).

Merge-on-read: a snapshot whose manifests carry POSITION deletes (spec
v2 ``content`` 1) is handled by ``snapshot_scan``, which returns the
data files plus a {data_file: [position-delete files]} mapping that
``encode_path(row_deletes=...)`` applies row-positionally inside each
encode task — reading the data files without it would resurrect deleted
rows, so the strict ``snapshot_data_files`` still refuses any MOR
snapshot. EQUALITY deletes (``content`` 2) identify rows by column
value and always raise; those tables need a full Iceberg reader and
``encode_df``.

``write_table_fixture`` writes a minimal spec-shaped table (v2
metadata.json + manifest list + one manifest per data file) over
existing Parquet files, so tests exercise the real layout end to end.
It is a test fixture generator, not a production writer: it fills only
the fields this reader (and a file-level scan) needs.
"""

from __future__ import annotations

import json
import os
import uuid

from . import avro_io

# Avro schemas for the fixture writer: the subset of the spec's manifest
# / manifest-list fields a file-granular scan needs. Readers of OUR
# fixtures and of real tables both go through the file's own embedded
# writer schema, so real tables' richer schemas decode fine too.
_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
    ]}

def _manifest_schema(partition_fields: list[tuple[str, str]] | None = None
                     ) -> dict:
    """Manifest-entry schema; ``partition_fields`` [(name, avro_type)]
    adds the spec's per-file ``partition`` record (``r102``), which is
    what metadata-level partition pruning reads."""
    df_fields = [
        {"name": "content", "type": "int", "field-id": 134},
        {"name": "file_path", "type": "string", "field-id": 100},
        {"name": "file_format", "type": "string", "field-id": 101},
    ]
    if partition_fields:
        df_fields.append({"name": "partition", "field-id": 102, "type": {
            "type": "record", "name": "r102", "fields": [
                {"name": nm, "type": ["null", t]}
                for nm, t in partition_fields]}})
    df_fields += [
        {"name": "record_count", "type": "long", "field-id": 103},
        {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
    ]
    return {"type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "data_file", "field-id": 2,
         "type": {"type": "record", "name": "r2", "fields": df_fields}},
    ]}


_MANIFEST_SCHEMA = _manifest_schema()

_STATUS_DELETED = 2
_CONTENT_DATA = 0
_CONTENT_POS_DELETES = 1
_CONTENT_EQ_DELETES = 2


class IcebergMetaError(ValueError):
    pass


def _part_eq(manifest_value, filter_value) -> bool:
    """Partition equality with type coercion toward the MANIFEST value's
    type: CLI filters arrive as strings (``--partition year=2024``) while
    the manifest stores typed values — a strict ``!=`` would prune every
    file of an int-typed partition and report an empty table."""
    if manifest_value == filter_value:
        return True
    if isinstance(manifest_value, bool):
        return str(manifest_value).lower() == str(filter_value).lower()
    if isinstance(manifest_value, int) and not isinstance(filter_value,
                                                          bool):
        try:
            return manifest_value == int(filter_value)
        except (TypeError, ValueError):
            return False
    return str(manifest_value) == str(filter_value)


def _latest_metadata(table_dir: str) -> str:
    meta_dir = os.path.join(table_dir, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        v = open(hint).read().strip()
        path = os.path.join(meta_dir, f"v{v}.metadata.json")
        if os.path.exists(path):
            return path
    cands = sorted(
        (f for f in os.listdir(meta_dir) if f.endswith(".metadata.json")),
        key=lambda f: (len(f), f))
    if not cands:
        raise IcebergMetaError(f"no metadata.json under {meta_dir}")
    return os.path.join(meta_dir, cands[-1])


def _resolve(table_dir: str, location: str, path: str) -> str:
    """Manifest paths are absolute URIs of the writer's filesystem; remap
    them under ``table_dir`` via the table location prefix so a table
    copied/downloaded to a local path still resolves."""
    if path.startswith("file:"):
        path = path[len("file:"):]
    loc = location
    if loc.startswith("file:"):
        loc = loc[len("file:"):]
    if path.startswith(loc.rstrip("/") + "/"):
        return os.path.join(table_dir, path[len(loc.rstrip("/")) + 1:])
    return path


def read_table_meta(table_dir: str) -> dict:
    """Parsed current metadata.json of an Iceberg table directory."""
    with open(_latest_metadata(table_dir)) as f:
        return json.load(f)


def _scan(table_dir: str, snapshot_id: int | None,
          partition_filter: dict | None
          ) -> tuple[list[str], list[str]]:
    """(sorted data files, sorted POSITION-delete files) of a snapshot.

    Walks manifest list -> manifests; data entries prune by
    ``partition_filter`` (equality at the metadata level). Delete
    manifests (spec v2 manifest-list ``content`` 1) are read the same
    way: position-delete files (``data_file.content`` 1) are returned for
    the caller to apply; EQUALITY deletes (``content`` 2) raise — they
    identify rows by column values, which a file-granular positional scan
    cannot apply without a full Iceberg evaluator.
    """
    meta = read_table_meta(table_dir)
    snap_id = snapshot_id if snapshot_id is not None \
        else meta.get("current-snapshot-id")
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if snap_id is None or snap_id == -1 or snap_id not in snaps:
        raise IcebergMetaError(
            f"snapshot {snap_id!r} not found in {table_dir} "
            f"(have {sorted(snaps)})")
    snap = snaps[snap_id]
    location = meta.get("location", table_dir)
    mlist_path = _resolve(table_dir, location, snap["manifest-list"])
    _, manifests = avro_io.read_avro(mlist_path)
    files: list[str] = []
    delete_files: list[str] = []
    for m in manifests:
        man_path = _resolve(table_dir, location, m["manifest_path"])
        _, entries = avro_io.read_avro(man_path)
        for e in entries:
            if e["status"] == _STATUS_DELETED:
                continue
            df = e["data_file"]
            content = df.get("content", _CONTENT_DATA)
            if content == _CONTENT_EQ_DELETES:
                raise IcebergMetaError(
                    f"equality-delete file in manifest {man_path}: "
                    f"{df['file_path']} — needs a full Iceberg reader "
                    "(equality deletes match rows by value, not position)")
            fmt = df.get("file_format", "PARQUET").upper()
            if fmt != "PARQUET":
                raise IcebergMetaError(
                    f"non-parquet file ({fmt}): {df['file_path']}")
            if content == _CONTENT_POS_DELETES:
                delete_files.append(
                    _resolve(table_dir, location, df["file_path"]))
                continue
            if partition_filter:
                part = df.get("partition")
                if isinstance(part, dict) and any(
                        k in part and not _part_eq(part[k], v)
                        for k, v in partition_filter.items()):
                    continue
            files.append(_resolve(table_dir, location, df["file_path"]))
    return sorted(files), sorted(delete_files)


def snapshot_data_files(table_dir: str,
                        snapshot_id: int | None = None,
                        partition_filter: dict | None = None) -> list[str]:
    """Live data-file paths of a snapshot (default: current).

    ``partition_filter`` ({field: value}) prunes at the METADATA level:
    a file is kept only if its manifest ``partition`` record matches
    every given field by equality — Iceberg scan planning's core move,
    skipping data files without touching them (at 100 TB this is the
    difference between listing 400k files and listing one partition's
    slice). Files whose manifests carry no partition record (unknown
    layout) are KEPT — pruning may only ever widen, never drop data it
    cannot prove out of scope.

    Raises ``IcebergMetaError`` for merge-on-read snapshots (any delete
    files present) — this is the strict COW-only entry point whose file
    list alone fully describes the snapshot; ``snapshot_scan`` is the
    MOR-aware one (position deletes applied at encode).
    """
    files, delete_files = _scan(table_dir, snapshot_id, partition_filter)
    if delete_files:
        raise IcebergMetaError(
            f"snapshot carries {len(delete_files)} position-DELETE "
            f"file(s) (merge-on-read) — use snapshot_scan(), which "
            "returns the per-data-file delete mapping for "
            "encode_path(row_deletes=...)")
    return files


def snapshot_scan(table_dir: str,
                  snapshot_id: int | None = None,
                  partition_filter: dict | None = None) -> dict:
    """MOR-aware scan plan: ``{"data_files": [...], "position_deletes":
    {data_file_path: [delete_file_paths]}}``.

    Position-delete files (Parquet, spec columns ``file_path``/``pos``)
    are mapped to the data files they reference by reading ONLY their
    ``file_path`` column here (dictionary-encoded in practice — tiny);
    the ``pos`` values are read later, inside the encode task that owns
    each data file, with a ``file_path ==`` filter pushed to the delete
    file's row groups (sorted by (file_path, pos) per spec, so that
    filter prunes). Planning cost stays O(metadata), per-task cost
    O(that file's deletes). Equality deletes raise (``_scan``).

    Data files never referenced by any delete file get no mapping entry;
    a partition-pruned data file's deletes are dropped with it.
    """
    files, delete_files = _scan(table_dir, snapshot_id, partition_filter)
    live = set(files)
    deletes: dict[str, list[str]] = {}
    if delete_files:
        import pyarrow.parquet as pq
        meta = read_table_meta(table_dir)
        location = meta.get("location", table_dir)
        for dp in delete_files:
            refs = pq.read_table(dp, columns=["file_path"])
            for ref in refs.column("file_path").unique().to_pylist():
                target = _resolve(table_dir, location, ref)
                if target in live:
                    deletes.setdefault(target, []).append(dp)
    return {"data_files": files, "position_deletes": deletes}


def added_data_files(table_dir: str, from_snapshot_id: int,
                     to_snapshot_id: int | None = None,
                     partition_filter: dict | None = None) -> list[str]:
    """Data files live in ``to`` (default: current) but not in ``from`` —
    the incremental-ingest unit: feed the diff to
    ``encode_path(input_files=..., append=True)`` and each run encodes
    exactly the bytes new since the last processed snapshot. Defined as
    the live-file set difference, so compaction rewrites (new files
    carrying old rows) are *included* — they are new bytes the encode
    tree has not seen; dedup against re-encoded rows is the reader's
    concern, as in Iceberg itself. Two metadata reads (O(manifests),
    measured ~80k entries/s), no data IO.
    """
    old = set(snapshot_data_files(table_dir, from_snapshot_id,
                                  partition_filter))
    new = snapshot_data_files(table_dir, to_snapshot_id, partition_filter)
    return sorted(f for f in new if f not in old)


def _write_snapshot(meta_dir: str, snapshot_id: int,
                    parquet_files: list[str],
                    record_counts: list[int]) -> str:
    """Manifest + manifest list for one snapshot; returns the list path."""
    entries = [{
        "status": 1, "snapshot_id": snapshot_id,
        "data_file": {
            "content": 0,
            "file_path": os.path.abspath(p),
            "file_format": "PARQUET",
            "record_count": int(n),
            "file_size_in_bytes": os.path.getsize(p),
        }} for p, n in zip(parquet_files, record_counts)]
    man_path = os.path.join(meta_dir, f"man-{uuid.uuid4().hex}.avro")
    avro_io.write_avro(man_path, _MANIFEST_SCHEMA, entries)
    mlist = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
    avro_io.write_avro(mlist, _MANIFEST_LIST_SCHEMA, [{
        "manifest_path": man_path,
        "manifest_length": os.path.getsize(man_path),
        "partition_spec_id": 0,
        "content": 0,
        "added_snapshot_id": snapshot_id,
    }])
    return mlist


def write_table_fixture(table_dir: str, parquet_files: list[str],
                        record_counts: list[int] | None = None,
                        snapshot_id: int = 1,
                        with_deletes: bool = False,
                        older_snapshots: dict[int, list[str]] | None = None,
                        partitions: list[dict] | None = None,
                        position_deletes: dict[str, list[int]] | None = None,
                        equality_deletes: bool = False) -> str:
    """Minimal spec-shaped Iceberg v2 table over existing Parquet files.

    Data files stay where they are (absolute paths in the manifest, as
    real writers do). Returns ``table_dir``. ``with_deletes`` adds a
    positional-delete manifest pointing at a phantom file so tests can
    prove the strict reader's MOR refusal without any delete data;
    ``position_deletes`` ({data_file_path: [row positions]}) writes a
    REAL spec-shaped position-delete Parquet (columns ``file_path``,
    ``pos``, sorted) plus its delete manifest — the ``snapshot_scan`` /
    ``encode_path(row_deletes=)`` MOR path end to end.
    ``equality_deletes`` adds an equality-delete manifest entry (content
    2) for the always-refused case. ``older_snapshots``
    ({snapshot_id: files}) records historical snapshots in the metadata
    so time-travel reads (``snapshot_data_files(..., snapshot_id=)``)
    are testable — Iceberg keeps every snapshot's manifest list live
    until expiry."""
    meta_dir = os.path.join(table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    if record_counts is None:
        record_counts = [0] * len(parquet_files)
    snap_records = []
    for sid, sfiles in sorted((older_snapshots or {}).items()):
        ml = _write_snapshot(meta_dir, sid, sfiles, [0] * len(sfiles))
        snap_records.append({"snapshot-id": sid, "manifest-list": ml,
                             "summary": {"operation": "append"}})
    part_fields: list[tuple[str, str]] = []
    if partitions:
        if len(partitions) != len(parquet_files):
            raise ValueError("one partition dict per data file required")
        first = partitions[0]
        part_fields = [
            (k, "long" if isinstance(first[k], int) else "string")
            for k in sorted(first)]
    schema = _manifest_schema(part_fields or None)
    entries = []
    for i, (p, n) in enumerate(zip(parquet_files, record_counts)):
        df_rec = {
            "content": 0,
            "file_path": os.path.abspath(p),
            "file_format": "PARQUET",
            "record_count": int(n),
            "file_size_in_bytes": os.path.getsize(p),
        }
        if partitions:
            df_rec["partition"] = {k: partitions[i].get(k)
                                   for k, _t in part_fields}
        entries.append({"status": 1, "snapshot_id": snapshot_id,
                        "data_file": df_rec})
    man_path = os.path.join(meta_dir, f"man-{uuid.uuid4().hex}.avro")
    avro_io.write_avro(man_path, schema, entries)
    manifests = [{
        "manifest_path": man_path,
        "manifest_length": os.path.getsize(man_path),
        "partition_spec_id": 0,
        "content": 0,
        "added_snapshot_id": snapshot_id,
    }]
    if with_deletes:
        del_man = os.path.join(meta_dir, f"del-{uuid.uuid4().hex}.avro")
        avro_io.write_avro(del_man, _MANIFEST_SCHEMA, [{
            "status": 1, "snapshot_id": snapshot_id,
            "data_file": {
                "content": 1,  # position deletes
                "file_path": os.path.abspath(
                    os.path.join(table_dir, "data", "del-0.parquet")),
                "file_format": "PARQUET",
                "record_count": 1,
                "file_size_in_bytes": 0,
            }}])
        manifests.append({
            "manifest_path": del_man,
            "manifest_length": os.path.getsize(del_man),
            "partition_spec_id": 0,
            "content": 1,
            "added_snapshot_id": snapshot_id,
        })
    if position_deletes:
        import pyarrow as pa
        import pyarrow.parquet as pq
        data_dir = os.path.join(table_dir, "data")
        os.makedirs(data_dir, exist_ok=True)
        # one delete file covering all referenced data files, rows sorted
        # by (file_path, pos) as the spec requires — that ordering is what
        # lets the task-side `file_path ==` read prune row groups
        rows = sorted((os.path.abspath(p), int(x))
                      for p, xs in position_deletes.items() for x in xs)
        del_path = os.path.join(data_dir,
                                f"pos-del-{uuid.uuid4().hex}.parquet")
        pq.write_table(pa.table({
            "file_path": pa.array([r[0] for r in rows], type=pa.string()),
            "pos": pa.array([r[1] for r in rows], type=pa.int64()),
        }), del_path)
        del_man = os.path.join(meta_dir, f"del-{uuid.uuid4().hex}.avro")
        avro_io.write_avro(del_man, _MANIFEST_SCHEMA, [{
            "status": 1, "snapshot_id": snapshot_id,
            "data_file": {
                "content": 1,
                "file_path": del_path,
                "file_format": "PARQUET",
                "record_count": len(rows),
                "file_size_in_bytes": os.path.getsize(del_path),
            }}])
        manifests.append({
            "manifest_path": del_man,
            "manifest_length": os.path.getsize(del_man),
            "partition_spec_id": 0,
            "content": 1,
            "added_snapshot_id": snapshot_id,
        })
    if equality_deletes:
        eq_man = os.path.join(meta_dir, f"eqdel-{uuid.uuid4().hex}.avro")
        avro_io.write_avro(eq_man, _MANIFEST_SCHEMA, [{
            "status": 1, "snapshot_id": snapshot_id,
            "data_file": {
                "content": 2,  # equality deletes — always refused
                "file_path": os.path.abspath(
                    os.path.join(table_dir, "data", "eq-del-0.parquet")),
                "file_format": "PARQUET",
                "record_count": 1,
                "file_size_in_bytes": 0,
            }}])
        manifests.append({
            "manifest_path": eq_man,
            "manifest_length": os.path.getsize(eq_man),
            "partition_spec_id": 0,
            "content": 1,
            "added_snapshot_id": snapshot_id,
        })
    mlist = os.path.join(meta_dir, f"snap-{snapshot_id}.avro")
    avro_io.write_avro(mlist, _MANIFEST_LIST_SCHEMA, manifests)
    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid4()),
        "location": os.path.abspath(table_dir),
        "current-snapshot-id": snapshot_id,
        "snapshots": snap_records + [{
            "snapshot-id": snapshot_id,
            "manifest-list": mlist,
            "summary": {"operation": "append"},
        }],
        "schemas": [], "partition-specs": [], "sort-orders": [],
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")
    return table_dir
