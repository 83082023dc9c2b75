"""Apache Hudi MERGE_ON_READ: log-file block format, slice merge
semantics, snapshot file-slice assembly, and the staged encode
integration (``sources/hudi_log.py`` + ``hudi_meta`` MOR support).

All fixtures are spec-shaped — ``.hoodie`` timeline JSON plus real
``#HUDI#`` log-block bytes written by the fixture helpers (the byte
layout documented from ``HoodieLogFormatWriter.java``) — no Hudi
runtime anywhere."""

from __future__ import annotations

import json
import struct

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from embulk_input_parquet_hadoop_spark.sources import hudi_log as hl
from embulk_input_parquet_hadoop_spark.sources import hudi_meta as hm

SCHEMA = {"type": "record", "name": "rec", "fields": [
    {"name": "_hoodie_record_key", "type": "string"},
    {"name": "doc_id", "type": "long"},
    {"name": "val", "type": ["null", "long"], "default": None},
]}


def _rec(k: str, doc: int, val: int | None) -> dict:
    return {"_hoodie_record_key": k, "doc_id": doc, "val": val}


def _mk_base(tmp_path, name: str, rows: list[dict]) -> str:
    p = str(tmp_path / name)
    pq.write_table(pa.table({
        "_hoodie_record_key": pa.array(
            [r["_hoodie_record_key"] for r in rows], pa.string()),
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "val": pa.array([r["val"] for r in rows], pa.int64()),
    }), p)
    return p


def _by_key(table: pa.Table) -> dict[str, dict]:
    return {r["_hoodie_record_key"]: r for r in table.to_pylist()}


# ---------------------------------------------------------------------
# log name / block format
# ---------------------------------------------------------------------

def test_parse_log_name():
    fid, inst, ver, tok = hl.parse_log_name(
        "p=0/.file-1_20240101000000001.log.3_2-0-7")
    assert (fid, inst, ver, tok) == \
        ("file-1", "20240101000000001", 3, "2-0-7")
    for bad in ("file-1_x.log.1_0-1-0",        # no leading dot
                ".file-1.log.1_0-1-0",         # no base instant
                ".file-1_abc.log.1_0-1-0",     # non-numeric instant
                ".file-1_20240101000000001"):  # no .log. segment
        with pytest.raises(hl.HudiLogError):
            hl.parse_log_name(bad)


def test_log_block_roundtrip(tmp_path):
    recs = [_rec("k1", 1, 10), _rec("k2", 2, None)]
    blocks = [
        hl.avro_data_block_bytes("001", SCHEMA, recs),
        hl.delete_block_bytes("002", ["k1", "kx"]),
        hl.parquet_data_block_bytes(
            "003", pa.table({"_hoodie_record_key": ["k3"],
                             "doc_id": [3], "val": [30]})),
        hl.rollback_block_bytes("004", "002"),
    ]
    p = str(tmp_path / ".f_001.log.1_0-1-0")
    hl.write_log_file(p, blocks)
    with open(p, "rb") as fh:
        got = hl.read_log_blocks(fh.read(), name=p)
    assert [b["type"] for b in got] == [
        hl.AVRO_DATA_BLOCK, hl.DELETE_BLOCK, hl.PARQUET_DATA_BLOCK,
        hl.COMMAND_BLOCK]
    assert hl.decode_data_block(got[0]) == recs
    assert hl.decode_delete_block(got[1]) == ["k1", "kx"]
    assert hl.decode_data_block(got[2]) == \
        [{"_hoodie_record_key": "k3", "doc_id": 3, "val": 30}]
    assert got[3]["header"][hl.H_TARGET_INSTANT_TIME] == "002"
    assert got[0]["header"][hl.H_INSTANT_TIME] == "001"


def test_truncated_final_block_dropped(tmp_path):
    """A crashed writer's partial tail block vanishes; earlier blocks
    survive — the real reader's corrupt-block skip, and safe because a
    partial block's instant can never have completed."""
    b1 = hl.avro_data_block_bytes("001", SCHEMA, [_rec("k1", 1, 1)])
    b2 = hl.avro_data_block_bytes("002", SCHEMA, [_rec("k2", 2, 2)])
    data = b1 + b2
    for cut in (len(b1) + 5, len(b1) + 20, len(data) - 1):
        got = hl.read_log_blocks(data[:cut])
        assert len(got) == 1
        assert hl.decode_data_block(got[0])[0]["_hoodie_record_key"] == "k1"


def test_mangled_block_refused():
    b1 = hl.avro_data_block_bytes("001", SCHEMA, [_rec("k1", 1, 1)])
    # wrong magic
    with pytest.raises(hl.HudiLogError, match="magic"):
        hl.read_log_blocks(b"#HUDX#" + b1[6:])
    # reverse pointer mismatch (flip its last byte)
    bad = b1[:-1] + bytes([b1[-1] ^ 1])
    with pytest.raises(hl.HudiLogError, match="reverse pointer"):
        hl.read_log_blocks(bad)
    # unsupported format version
    bad = b1[:14] + struct.pack(">i", 2) + b1[18:]
    with pytest.raises(hl.HudiLogError, match="format version"):
        hl.read_log_blocks(bad)


def test_legacy_payload_versions_refused():
    """Kryo delete payloads (< v3) and schema-in-content Avro blocks
    (v1) predate the formats modeled here — loud refusal, never a
    guess."""
    blk = {"type": hl.DELETE_BLOCK, "header": {},
           "content": struct.pack(">ii", 2, 4) + b"kryo"}
    with pytest.raises(hl.HudiLogError, match="Kryo"):
        hl.decode_delete_block(blk)
    blk = {"type": hl.AVRO_DATA_BLOCK,
           "header": {hl.H_SCHEMA: json.dumps(SCHEMA)},
           "content": struct.pack(">ii", 1, 0)}
    with pytest.raises(hl.HudiLogError, match="version 1"):
        hl.decode_data_block(blk)


# ---------------------------------------------------------------------
# scan_slice_logs / merge_slice semantics (no Spark)
# ---------------------------------------------------------------------

def _log(tmp_path, name: str, blocks: list[bytes]) -> str:
    p = str(tmp_path / name)
    hl.write_log_file(p, blocks)
    return p


def test_scan_upsert_delete_revive(tmp_path):
    p = _log(tmp_path, ".f_001.log.1_0-1-0", [
        hl.avro_data_block_bytes("001", SCHEMA, [_rec("a", 1, 1),
                                                 _rec("b", 2, 2)]),
        hl.delete_block_bytes("002", ["a", "c"]),
        hl.avro_data_block_bytes("003", SCHEMA, [_rec("a", 1, 99)]),
    ])
    ups, dels = hl.scan_slice_logs([p], {"001", "002", "003"})
    # a: deleted then revived with the new value; b: plain upsert;
    # c: tombstoned (no revival)
    assert set(ups) == {"a", "b"} and ups["a"]["val"] == 99
    assert set(dels) == {"c"}


def test_scan_rollback_invalidates_target_instant(tmp_path):
    p = _log(tmp_path, ".f_001.log.1_0-1-0", [
        hl.avro_data_block_bytes("001", SCHEMA, [_rec("a", 1, 1)]),
        hl.avro_data_block_bytes("002", SCHEMA, [_rec("a", 1, 66),
                                                 _rec("z", 9, 9)]),
        hl.rollback_block_bytes("003", "002"),
    ])
    ups, dels = hl.scan_slice_logs([p], {"001", "002", "003"})
    assert set(ups) == {"a"} and ups["a"]["val"] == 1 and not dels


def test_scan_orphan_instant_invisible(tmp_path):
    """Blocks stamped with a never-completed instant (crashed write)
    are skipped — same visibility rule as pending timeline instants."""
    p = _log(tmp_path, ".f_001.log.1_0-1-0", [
        hl.avro_data_block_bytes("001", SCHEMA, [_rec("a", 1, 1)]),
        hl.avro_data_block_bytes("666", SCHEMA, [_rec("ghost", 6, 6)]),
    ])
    ups, _ = hl.scan_slice_logs([p], {"001"})
    assert set(ups) == {"a"}


def test_scan_hfile_cdc_refused(tmp_path):
    raw = hl._block_bytes(hl.HFILE_DATA_BLOCK,
                          {hl.H_INSTANT_TIME: "001"}, b"HFILE")
    p = _log(tmp_path, ".f_001.log.1_0-1-0", [raw])
    with pytest.raises(hl.HudiLogError, match="hfile/cdc"):
        hl.scan_slice_logs([p], {"001"})


def test_merge_slice_with_base(tmp_path):
    base = _mk_base(tmp_path, "base.parquet",
                    [_rec("a", 1, 1), _rec("b", 2, 2), _rec("c", 3, 3)])
    p = _log(tmp_path, ".f_001.log.1_0-1-0", [
        hl.avro_data_block_bytes("002", SCHEMA, [_rec("b", 2, 22),
                                                 _rec("d", 4, 44)]),
        hl.delete_block_bytes("003", ["c"]),
    ])
    tbl = hl.merge_slice(base, [p], {"001", "002", "003"})
    got = _by_key(tbl)
    assert set(got) == {"a", "b", "d"}
    assert got["a"]["val"] == 1          # untouched base row
    assert got["b"]["val"] == 22         # replaced by the upsert
    assert got["d"]["doc_id"] == 4       # net-new from the log
    assert tbl.schema.names == ["_hoodie_record_key", "doc_id", "val"]
    # deterministic output order: surviving base, replaced, net-new
    assert [r["_hoodie_record_key"] for r in tbl.to_pylist()] == \
        ["a", "b", "d"]


def test_merge_slice_log_chain_order(tmp_path):
    """Log files apply in (version, write-token) order: the later
    version's record wins even if scanned paths are passed sorted
    lexically (version 10 > version 2)."""
    base = _mk_base(tmp_path, "base.parquet", [_rec("a", 1, 1)])
    p2 = _log(tmp_path, ".f_001.log.2_0-1-0", [
        hl.avro_data_block_bytes("002", SCHEMA, [_rec("a", 1, 2)])])
    p10 = _log(tmp_path, ".f_001.log.10_0-1-0", [
        hl.avro_data_block_bytes("003", SCHEMA, [_rec("a", 1, 10)])])
    tbl = hl.merge_slice(base, [p2, p10], {"001", "002", "003"})
    assert _by_key(tbl)["a"]["val"] == 10


def test_merge_log_only_slice(tmp_path):
    p = _log(tmp_path, ".f_001.log.1_0-1-0", [
        hl.avro_data_block_bytes("001", SCHEMA, [_rec("a", 1, 1),
                                                 _rec("b", 2, 2)]),
        hl.delete_block_bytes("002", ["b"]),
    ])
    tbl = hl.merge_slice(None, [p], {"001", "002"})
    assert _by_key(tbl).keys() == {"a"}
    assert tbl.schema.field("doc_id").type == pa.int64()
    # delete-only log chain has no schema to materialize
    p2 = _log(tmp_path, ".f2_001.log.1_0-1-0",
              [hl.delete_block_bytes("002", ["x"])])
    with pytest.raises(hl.HudiLogError, match="no upsert records"):
        hl.merge_slice(None, [p2], {"002"})


def test_merge_parquet_data_block(tmp_path):
    base = _mk_base(tmp_path, "base.parquet", [_rec("a", 1, 1)])
    p = _log(tmp_path, ".f_001.log.1_0-1-0", [
        hl.parquet_data_block_bytes(
            "002", pa.table({"_hoodie_record_key": ["a", "n"],
                             "doc_id": pa.array([1, 7], pa.int64()),
                             "val": pa.array([111, 777], pa.int64())}))])
    got = _by_key(hl.merge_slice(base, [p], {"001", "002"}))
    assert got["a"]["val"] == 111 and got["n"]["val"] == 777


def test_merge_duplicate_base_keys_refused(tmp_path):
    """A base file with duplicate record keys makes 'replace the base
    row' ambiguous (Hudi's contract is one record per key per group)
    — loud refusal, not a KeyError or a silent pick."""
    p = str(tmp_path / "base.parquet")
    pq.write_table(pa.table({
        "_hoodie_record_key": pa.array(["a", "a"], pa.string()),
        "doc_id": pa.array([1, 1], pa.int64()),
        "val": pa.array([1, 2], pa.int64())}), p)
    log = _log(tmp_path, ".f_001.log.1_0-1-0", [
        hl.avro_data_block_bytes("002", SCHEMA, [_rec("a", 1, 9)])])
    with pytest.raises(hl.HudiLogError, match="duplicate"):
        hl.merge_slice(p, [log], {"001", "002"})
    # untouched duplicate keys pass through (we merge, not validate)
    log2 = _log(tmp_path, ".f_001.log.2_0-1-0", [
        hl.avro_data_block_bytes("002", SCHEMA, [_rec("z", 9, 9)])])
    tbl = hl.merge_slice(p, [log2], {"001", "002"})
    assert tbl.num_rows == 3


def test_merge_out_of_commit_order_append_refused(tmp_path):
    """A commit that appended to a NON-latest log file makes file
    order disagree with commit order — replaying it as-is would let
    the earlier commit win, so the chain refuses."""
    base = _mk_base(tmp_path, "base.parquet", [_rec("a", 1, 1)])
    p1 = _log(tmp_path, ".f_001.log.1_0-1-0", [
        hl.avro_data_block_bytes("002", SCHEMA, [_rec("a", 1, 2)]),
        # instant 004 appended AFTER v2 existed (concurrent writer)
        hl.avro_data_block_bytes("004", SCHEMA, [_rec("a", 1, 4)])])
    p2 = _log(tmp_path, ".f_001.log.2_0-1-0", [
        hl.avro_data_block_bytes("003", SCHEMA, [_rec("a", 1, 3)])])
    with pytest.raises(hl.HudiLogError, match="out of commit order"):
        hl.merge_slice(base, [p1, p2], {"001", "002", "003", "004"})
    # the same bytes merge fine when 004 never completed (orphan)
    tbl = hl.merge_slice(base, [p1, p2], {"001", "002", "003"})
    assert _by_key(tbl)["a"]["val"] == 3


def test_merge_base_without_record_key_refused(tmp_path):
    p = str(tmp_path / "base.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([1], pa.int64())}), p)
    with pytest.raises(hl.HudiLogError, match="_hoodie_record_key"):
        hl.merge_slice(p, [], set())


# ---------------------------------------------------------------------
# snapshot slice assembly (hudi_meta MOR replay)
# ---------------------------------------------------------------------

def test_mor_snapshot_assembles_slices(tmp_path):
    base = _mk_base(tmp_path, "b.parquet", [_rec("a", 1, 1)])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"p=0": [("f-a", base)]}},
        {"logs": {"p=0": [("f-a", 0, 1, [
            ("data", SCHEMA, [_rec("n", 2, 2)])])]}},
    ], table_type="MERGE_ON_READ")
    scan = hm.snapshot_scan(d)
    assert scan["needs_merge"] is True
    assert set(scan["valid_instants"]) == set(ins)
    (key, sl), = scan["slices"].items()
    assert key == ("p=0", "f-a")
    assert sl["base"].endswith(f"f-a_1-0-1_{ins[0]}.parquet")
    assert len(sl["logs"]) == 1 and ".log.1_" in sl["logs"][0]
    # base files alone would resurrect un-merged rows
    with pytest.raises(hm.HudiMetaError, match="stage_mor_slices"):
        hm.snapshot_files(d)
    # time travel to before the deltacommit: plain COW slice
    old = hm.snapshot_scan(d, as_of=ins[0])
    assert old["needs_merge"] is False
    assert hm.snapshot_files(d, as_of=ins[0]) == old["files"]


def test_mor_compaction_folds_old_logs(tmp_path):
    """A commit that rewrites the base file (compaction completes as
    'commit') supersedes the logs written against the OLD base — they
    drop out of the slice, Hudi's file-slice rule."""
    b0 = _mk_base(tmp_path, "b0.parquet", [_rec("a", 1, 1)])
    b1 = _mk_base(tmp_path, "b1.parquet", [_rec("a", 1, 2),
                                           _rec("n", 2, 2)])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"": [("f-a", b0)]}},
        {"logs": {"": [("f-a", 0, 1, [
            ("data", SCHEMA, [_rec("n", 2, 2)])])]}},
        {"writes": {"": [("f-a", b1)]}, "action": "commit"},  # compaction
    ], table_type="MERGE_ON_READ")
    scan = hm.snapshot_scan(d)
    assert scan["needs_merge"] is False
    (_, sl), = scan["slices"].items()
    assert sl["logs"] == [] and sl["base_instant"] == ins[2]
    assert hm.snapshot_files(d) == [f for f in scan["files"]]
    # as_of between deltacommit and compaction still carries the log
    mid = hm.snapshot_scan(d, as_of=ins[1])
    assert mid["needs_merge"] is True


def test_mor_log_only_group_and_newer_log_refusal(tmp_path):
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(d, [
        {"logs": {"": [("f-n", None, 1, [
            ("data", SCHEMA, [_rec("x", 9, 9)])])]}},
    ], table_type="MERGE_ON_READ")
    scan = hm.snapshot_scan(d)
    (_, sl), = scan["slices"].items()
    assert sl["base"] is None and len(sl["logs"]) == 1
    assert scan["files"] == []  # no base files at all
    # a log claiming a base instant NEWER than the latest base file is
    # malformed metadata
    base = _mk_base(tmp_path, "b.parquet", [_rec("a", 1, 1)])
    d2 = str(tmp_path / "tbl2")
    hm.write_table_fixture(d2, [
        {"writes": {"": [("f-a", base)]}},
        {"logs": {"": [("f-a", 1, 1, [   # base_idx 1 = its own instant
            ("data", SCHEMA, [_rec("n", 2, 2)])])]}},
    ], table_type="MERGE_ON_READ")
    with pytest.raises(hm.HudiMetaError, match="newer than its latest"):
        hm.snapshot_scan(d2)


def test_appended_log_file_changes_slice_identity(tmp_path):
    """Hudi appends blocks to an EXISTING log file across deltacommits:
    the slice's path set is unchanged, so (a) the writing instants must
    join the slice identity (diff refuses, staged name changes), and
    (b) time travel must hide the appended blocks via the
    valid-instants filter even though they sit in the same file."""
    b0 = _mk_base(tmp_path, "b0.parquet", [_rec("a", 1, 1)])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"": [("f-a", b0)]}},
        {"logs": {"": [("f-a", 0, 1, [
            ("data", SCHEMA, [_rec("n", 2, 2)])])]}},
        {"logs": {"": [("f-a", 0, 1, [      # SAME log file, appended
            ("data", SCHEMA, [_rec("m", 3, 3)])])]}},
    ], table_type="MERGE_ON_READ")
    full = hm.snapshot_scan(d)
    mid = hm.snapshot_scan(d, as_of=ins[1])
    (key,) = full["slices"]
    fsl, msl = full["slices"][key], mid["slices"][key]
    # one deduped log path, but distinct identities and staged names
    assert fsl["logs"] == msl["logs"] and len(fsl["logs"]) == 1
    assert fsl["log_instants"] == (ins[1], ins[2])
    assert msl["log_instants"] == (ins[1],)
    assert full["groups"] != mid["groups"]
    assert hl.staged_slice_name(fsl) != hl.staged_slice_name(msl)
    # incremental diff since the first deltacommit refuses: the slice
    # CHANGED (appended), it was not added
    with pytest.raises(hm.HudiMetaError, match="rewritten or replaced"):
        hm.snapshot_scan_diff(d, ins[1])
    # merge at full sees both appended blocks; at mid the second
    # commit's blocks are invisible despite living in the same file
    got_full = _by_key(hl.merge_slice(
        fsl["base"], fsl["logs"], full["valid_instants"]))
    assert set(got_full) == {"a", "n", "m"}
    got_mid = _by_key(hl.merge_slice(
        msl["base"], msl["logs"], mid["valid_instants"]))
    assert set(got_mid) == {"a", "n"}


def test_mor_partition_filter_updates_slices(tmp_path):
    b0 = _mk_base(tmp_path, "b0.parquet", [_rec("a", 1, 1)])
    b1 = _mk_base(tmp_path, "b1.parquet", [_rec("b", 2, 2)])
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(d, [
        {"writes": {"p=0": [("f-a", b0)], "p=1": [("f-b", b1)]}},
        {"logs": {"p=1": [("f-b", 0, 1, [
            ("data", SCHEMA, [_rec("n", 3, 3)])])]}},
    ], table_type="MERGE_ON_READ")
    scan = hm.snapshot_scan(d)
    assert scan["needs_merge"] is True
    p0 = hm.filter_partitions(scan, {"p": "0"})
    assert p0["needs_merge"] is False and len(p0["slices"]) == 1
    p1 = hm.filter_partitions(scan, {"p": "1"})
    assert p1["needs_merge"] is True and len(p1["slices"]) == 1


def test_mor_unsupported_merge_configs_refused(tmp_path):
    base = _mk_base(tmp_path, "b.parquet", [_rec("a", 1, 1)])
    cases = [
        (["hoodie.table.precombine.field=ts"], "precombine"),
        (["hoodie.record.merge.mode=EVENT_TIME_ORDERING"],
         "EVENT_TIME_ORDERING"),
        (["hoodie.table.payload.class=com.x.CustomPayload"],
         "custom merge payloads"),
        (["hoodie.populate.meta.fields=false"], "meta"),
    ]
    for i, (props, match) in enumerate(cases):
        d = str(tmp_path / f"tbl{i}")
        hm.write_table_fixture(d, [{"writes": {"": [("f-a", base)]}}],
                               table_type="MERGE_ON_READ",
                               extra_props=props)
        with pytest.raises(hm.HudiMetaError, match=match):
            hm.snapshot_scan(d)
    # the default overwrite-latest payload class is accepted
    d = str(tmp_path / "ok")
    hm.write_table_fixture(
        d, [{"writes": {"": [("f-a", base)]}}],
        table_type="MERGE_ON_READ",
        extra_props=["hoodie.table.payload.class=org.apache.hudi."
                     "common.model.OverwriteWithLatestAvroPayload"])
    assert hm.snapshot_scan(d)["needs_merge"] is False


def test_cow_log_stat_and_deltacommit_still_refused(tmp_path):
    """MOR support must not loosen the COW replay: a log write stat or
    a deltacommit instant in a COPY_ON_WRITE timeline is malformed."""
    base = _mk_base(tmp_path, "b.parquet", [_rec("a", 1, 1)])
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(d, [
        {"writes": {"": [("f-a", base)]}},
        {"logs": {"": [("f-a", 0, 1, [
            ("data", SCHEMA, [_rec("n", 2, 2)])])]},
         "action": "commit"},  # force non-deltacommit action
    ])  # COPY_ON_WRITE
    with pytest.raises(hm.HudiMetaError, match="COPY_ON_WRITE"):
        hm.snapshot_scan(d)


# ---------------------------------------------------------------------
# MOR replay + merge fuzz (model-based, mirrors the COW timeline fuzz)
# ---------------------------------------------------------------------

def test_mor_fuzz_vs_model(tmp_path):
    """Random sequences of base writes, log upserts/deletes (new log
    files AND appends to existing ones), compactions and pending
    deltacommits: the driver-side merge of every snapshot — final and
    at every as_of prefix — must equal a trivial dict model. Pending
    commits' blocks sit in REAL visible files (appended) or orphan
    files and must stay invisible either way."""
    import random
    rng = random.Random(20260820)
    keypool = [f"k{i}" for i in range(8)]

    def mk_base(path: str, model: dict) -> str:
        rows = [_rec(k, d, v) for k, (d, v) in sorted(model.items())]
        pq.write_table(pa.table({
            "_hoodie_record_key": pa.array(
                [r["_hoodie_record_key"] for r in rows], pa.string()),
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "val": pa.array([r["val"] for r in rows], pa.int64()),
        }), path)
        return path

    for trial in range(10):
        model: dict[str, tuple] = {}   # key -> (doc_id, val)
        history: list[dict] = []
        commits: list[dict] = []
        base_idx = 0          # commit idx of the current base file
        next_logver = 1
        val = 0
        # commit 0: initial base write
        init = {k: (i, 0) for i, k in enumerate(
            rng.sample(keypool, rng.randint(1, 5)))}
        commits.append({"writes": {"": [("f-a", mk_base(
            str(tmp_path / f"fz{trial}_b0.parquet"), init))]}})
        model = dict(init)
        history.append(dict(model))
        for _ in range(rng.randint(1, 7)):
            op = rng.random()
            pending = rng.random() < 0.2
            val += 1
            if op < 0.35:          # upsert log block
                ks = rng.sample(keypool, rng.randint(1, 3))
                recs = [_rec(k, ord(k[1]) - 48, val) for k in ks]
                append = rng.random() < 0.5 and next_logver > 1
                ver = (next_logver - 1) if append else next_logver
                if not append:
                    next_logver += 1
                commits.append({"logs": {"": [("f-a", base_idx, ver, [
                    ("data", SCHEMA, recs)])]}, "pending": pending})
                if not pending:
                    for k in ks:
                        model[k] = (ord(k[1]) - 48, val)
            elif op < 0.55:        # delete log block
                ks = rng.sample(keypool, rng.randint(1, 3))
                append = rng.random() < 0.5 and next_logver > 1
                ver = (next_logver - 1) if append else next_logver
                if not append:
                    next_logver += 1
                commits.append({"logs": {"": [("f-a", base_idx, ver, [
                    ("delete", ks)])]}, "pending": pending})
                if not pending:
                    for k in ks:
                        model.pop(k, None)
            else:                  # compaction: new base from model
                p = str(tmp_path /
                        f"fz{trial}_b{len(commits)}.parquet")
                commits.append({"writes": {"": [("f-a", mk_base(
                    p, model))]}, "action": "commit",
                    "pending": pending})
                if not pending:
                    base_idx = len(commits) - 1
                    next_logver = 1
            history.append(dict(model))
        d = str(tmp_path / f"fz{trial}")
        ins = hm.write_table_fixture(d, commits,
                                     table_type="MERGE_ON_READ")

        def merged_at(as_of=None):
            scan = hm.snapshot_scan(d, as_of=as_of)
            if not scan["slices"]:
                return {}
            (sl,) = scan["slices"].values()
            tbl = hl.merge_slice(sl["base"], sl["logs"],
                                 scan["valid_instants"])
            return {r["_hoodie_record_key"]: (r["doc_id"], r["val"])
                    for r in tbl.to_pylist()}

        assert merged_at() == model, (trial, commits)
        for step in range(len(commits)):
            assert merged_at(ins[step]) == history[step], \
                (trial, step, commits)


# ---------------------------------------------------------------------
# staged encode integration (Spark)
# ---------------------------------------------------------------------

def _mor_fixture(tmp_path) -> tuple[str, dict[str, dict]]:
    """Two-partition MOR table: p=0 slice carries a log chain with an
    update + delete + insert + an orphan block + a rollback; p=1 is a
    log-free passthrough base. Returns (table_dir, expected rows by
    key)."""
    b0 = _mk_base(tmp_path, "b0.parquet",
                  [_rec("a", 1, 1), _rec("b", 2, 2), _rec("c", 3, 3)])
    b1 = _mk_base(tmp_path, "b1.parquet", [_rec("x", 10, 10)])
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(d, [
        {"writes": {"p=0": [("f-a", b0)], "p=1": [("f-b", b1)]}},
        {"logs": {"p=0": [("f-a", 0, 1, [
            ("data", SCHEMA, [_rec("b", 2, 22), _rec("n", 4, 44)]),
            ("delete", ["c"]),
            ("orphan_data", "99999999999999999", SCHEMA,
             [_rec("ghost", 6, 6)]),
        ])]}},
        {"logs": {"p=0": [("f-a", 0, 2, [
            ("data", SCHEMA, [_rec("r", 5, 55)]),
            ("rollback", 2),  # invalidates THIS instant's earlier block
            ("data", SCHEMA, [_rec("n", 4, 45)]),
        ])]}},
    ], table_type="MERGE_ON_READ")
    expected = {"a": _rec("a", 1, 1), "b": _rec("b", 2, 22),
                "n": _rec("n", 4, 45), "x": _rec("x", 10, 10)}
    return d, expected


def test_stage_mor_slices_and_encode(spark, tmp_path):
    from embulk_input_parquet_hadoop_spark.plans import pipeline, verify
    d, expected = _mor_fixture(tmp_path)
    scan = hm.snapshot_scan(d)
    stg = str(tmp_path / "stg")
    staged = hl.stage_mor_slices(spark, scan, stg)
    assert staged["n_staged"] == 1 and staged["n_passthrough"] == 1
    assert staged["n_skipped"] == 0
    # partitions mapping covers staged AND passthrough files
    assert sorted(staged["partitions"].values()) == ["p=0", "p=1"]
    merged = {}
    for f in staged["files"]:
        merged.update(_by_key(pq.read_table(f)))
    assert merged == expected
    # re-run is idempotent: the staged file is found and skipped
    again = hl.stage_mor_slices(spark, scan, stg)
    assert again["n_staged"] == 0 and again["n_skipped"] == 1
    assert again["files"] == staged["files"]
    # the staged files feed encode_path unchanged
    out = str(tmp_path / "enc")
    totals = pipeline.encode_path(spark, d, out,
                                  input_files=staged["files"])
    assert totals["n_rows"] == len(expected)
    dec = pipeline.decode_chunks(
        pipeline.read_chunks(spark, out),
        ["_hoodie_record_key", "val"],
        "_hoodie_record_key string, val long")
    got = {r._hoodie_record_key: r.val for r in dec.collect()}
    assert got == {k: v["val"] for k, v in expected.items()}
    assert verify.verify_files(spark, out)["ok"]


def test_stage_mor_slices_mock_s3(spark, tmp_path):
    """Remote staging tree: tasks spool locally and publish via the
    PUT-only protocol — object-store MOR tables stage without a local
    shared filesystem."""
    d, expected = _mor_fixture(tmp_path)
    scan = hm.snapshot_scan(d)
    stg = f"mock-s3://bucket{tmp_path}/stg"
    staged = hl.stage_mor_slices(spark, scan, stg)
    assert staged["n_staged"] == 1
    from embulk_input_parquet_hadoop_spark.plans import fsutil
    staged_file = [f for f in staged["files"]
                   if f.startswith("mock-s3://")]
    assert len(staged_file) == 1
    tbl = pq.read_table(pa.BufferReader(
        fsutil.read_bytes(staged_file[0])))
    assert set(_by_key(tbl)) == {"a", "b", "n"}


def test_mor_incremental_diff_stages_new_slices(spark, tmp_path):
    """snapshot_scan_diff on a MOR table: a NEW file group arriving as
    a log-only deltacommit is staged and appended, same ingest shape as
    the COW incremental path."""
    from embulk_input_parquet_hadoop_spark.plans import pipeline
    b0 = _mk_base(tmp_path, "b0.parquet", [_rec("a", 1, 1)])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"": [("f-a", b0)]}},
    ], table_type="MERGE_ON_READ")
    out = str(tmp_path / "enc")
    t0 = pipeline.encode_path(spark, d, out,
                              input_files=hm.snapshot_files(d))
    assert t0["n_rows"] == 1
    # append a log-only group via a second fixture write
    import shutil
    shutil.rmtree(f"{d}/.hoodie")
    ins2 = hm.write_table_fixture(d, [
        {"writes": {"": [("f-a", b0)]}},
        {"logs": {"": [("f-n", None, 1, [
            ("data", SCHEMA, [_rec("p", 7, 7), _rec("q", 8, 8)])])]}},
    ], table_type="MERGE_ON_READ")
    assert ins2[0] == ins[0]  # deterministic instants: same watermark
    diff = hm.snapshot_scan_diff(d, ins[0])
    assert diff["needs_merge"] is True and len(diff["slices"]) == 1
    staged = hl.stage_mor_slices(spark, diff, str(tmp_path / "stg"))
    t1 = pipeline.encode_path(spark, d, out, input_files=staged["files"],
                              append=True)
    assert t1["n_rows"] == 2
    dec = pipeline.decode_chunks(
        pipeline.read_chunks(spark, out),
        ["_hoodie_record_key"], "_hoodie_record_key string")
    assert sorted(r._hoodie_record_key for r in dec.collect()) == \
        ["a", "p", "q"]
