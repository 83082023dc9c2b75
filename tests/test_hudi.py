"""Apache Hudi copy-on-write source: timeline replay, file-group
latest-slice selection, replacecommit clustering, time travel, and the
encode integration (``sources/hudi_meta.py``).

All fixtures are spec-shaped ``.hoodie`` timelines written by
``write_table_fixture`` — Properties file + JSON commit metadata — no
Hudi runtime anywhere. Mirrors the Delta/Iceberg coverage in
``test_delta.py`` / ``test_sources.py``."""

from __future__ import annotations

import glob
import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from embulk_input_parquet_hadoop_spark.sources import hudi_meta as hm


def _mk_parquet(tmp_path, name: str, ids: list[int]):
    p = str(tmp_path / name)
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "n": pa.array([i * 10 for i in ids],
                                           pa.int64())}), p)
    return p


def _names(scan):
    import posixpath
    return sorted(posixpath.basename(f) for f in scan["files"])


# ---------------------------------------------------------------------
# snapshot replay
# ---------------------------------------------------------------------

def test_snapshot_latest_slice_per_group(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1, 2])
    b = _mk_parquet(tmp_path, "b.parquet", [3, 4])
    a2 = _mk_parquet(tmp_path, "a2.parquet", [1, 2, 9])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"p=0": [("f-a", a)], "p=1": [("f-b", b)]}},
        {"writes": {"p=0": [("f-a", a2)]}},  # rewrites group f-a
    ])
    scan = hm.snapshot_scan(d)
    # group f-a resolves to its SECOND slice, f-b keeps its first
    assert _names(scan) == sorted([f"f-a_1-0-1_{ins[1]}.parquet",
                                   f"f-b_1-0-1_{ins[0]}.parquet"])
    assert scan["instant"] == ins[1]
    parts = {f.rsplit("/", 2)[-2] for f in scan["files"]}
    assert parts == {"p=0", "p=1"}
    assert set(scan["partitions"].values()) == {"p=0", "p=1"}
    # time travel to the first instant sees the original slice
    old = hm.snapshot_scan(d, as_of=ins[0])
    assert _names(old) == sorted([f"f-a_1-0-1_{ins[0]}.parquet",
                                  f"f-b_1-0-1_{ins[0]}.parquet"])


def test_replacecommit_clustering(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    b = _mk_parquet(tmp_path, "b.parquet", [2])
    c = _mk_parquet(tmp_path, "c.parquet", [1, 2])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"": [("f-a", a), ("f-b", b)]}},
        # clustering: one new group replaces both originals
        {"writes": {"": [("f-c", c)]},
         "replaces": {"": ["f-a", "f-b"]}},
    ])
    scan = hm.snapshot_scan(d)
    assert _names(scan) == [f"f-c_1-0-1_{ins[1]}.parquet"]
    # root-partition files sit directly under the table dir
    assert scan["files"][0].rsplit("/", 2)[-2] == "tbl"
    # before the replace, both original groups are live
    old = hm.snapshot_scan(d, as_of=ins[0])
    assert _names(old) == sorted([f"f-a_1-0-1_{ins[0]}.parquet",
                                  f"f-b_1-0-1_{ins[0]}.parquet"])


def test_pending_instant_invisible(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    b = _mk_parquet(tmp_path, "b.parquet", [2])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"": [("f-a", a)]}},
        {"writes": {"": [("f-b", b)]}, "pending": True},  # crashed writer
    ])
    scan = hm.snapshot_scan(d)
    # the pending commit's data file EXISTS on disk but is invisible
    assert glob.glob(f"{d}/f-b_*.parquet")
    assert _names(scan) == [f"f-a_1-0-1_{ins[0]}.parquet"]
    assert scan["instant"] == ins[0]


def test_empty_commit_metadata_is_noop(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [{"writes": {"": [("f-a", a)]}}])
    # an empty completed commit file (some writers emit one for
    # metadata-only operations) advances the instant, changes nothing
    with open(f"{d}/.hoodie/{20240101000099:017d}.commit", "wb"):
        pass
    scan = hm.snapshot_scan(d)
    assert _names(scan) == [f"f-a_1-0-1_{ins[0]}.parquet"]
    assert scan["instant"] == f"{20240101000099:017d}"


def test_noop_actions_ignored(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(
        d, [{"writes": {"": [("f-a", a)]}}],
        extra_timeline_files=[f"{20240101000050:017d}.clean",
                              f"{20240101000051:017d}.rollback",
                              f"{20240101000052:017d}.savepoint"])
    assert _names(hm.snapshot_scan(d)) == [f"f-a_1-0-1_{ins[0]}.parquet"]


def test_timeline_v1_layout(tmp_path):
    """1.x: instants under .hoodie/timeline/ with completion-time
    suffixed completed names."""
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    a2 = _mk_parquet(tmp_path, "a2.parquet", [1, 2])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"": [("f-a", a)]}},
        {"writes": {"": [("f-a", a2)]}},
    ], timeline_v1=True)
    scan = hm.snapshot_scan(d)
    assert _names(scan) == [f"f-a_1-0-1_{ins[1]}.parquet"]
    assert _names(hm.snapshot_scan(d, as_of=ins[0])) == \
        [f"f-a_1-0-1_{ins[0]}.parquet"]


# ---------------------------------------------------------------------
# refusals
# ---------------------------------------------------------------------

def test_unknown_table_type_refused(tmp_path):
    """COW and MOR are modeled (MOR coverage in test_hudi_mor.py);
    anything else refuses."""
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(d, [{"writes": {"": [("f-a", a)]}}],
                           table_type="FANCY_NEW_TYPE")
    with pytest.raises(hm.HudiMetaError, match="unknown table type"):
        hm.snapshot_scan(d)


def test_deltacommit_in_timeline_refused(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(
        d, [{"writes": {"": [("f-a", a)]}}],
        extra_timeline_files=[f"{20240101000050:017d}.deltacommit"])
    with pytest.raises(hm.HudiMetaError, match="deltacommit"):
        hm.snapshot_scan(d)


def test_restore_refused(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(
        d, [{"writes": {"": [("f-a", a)]}}],
        extra_timeline_files=[f"{20240101000050:017d}.restore"])
    with pytest.raises(hm.HudiMetaError, match="restore"):
        hm.snapshot_scan(d)


def test_unknown_action_refused(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(
        d, [{"writes": {"": [("f-a", a)]}}],
        extra_timeline_files=[f"{20240101000050:017d}.mystery"])
    with pytest.raises(hm.HudiMetaError, match="mystery"):
        hm.snapshot_scan(d)


def test_log_file_write_stat_refused(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [{"writes": {"": [("f-a", a)]}}])
    meta = {"partitionToWriteStats": {"": [
        {"fileId": "f-a",
         "path": f".f-a_1-0-1_{ins[0]}.log.1_0-1-0"}]}}
    with open(f"{d}/.hoodie/{20240101000050:017d}.commit", "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(hm.HudiMetaError, match="COPY_ON_WRITE"):
        hm.snapshot_scan(d)


def test_replace_own_write_refused(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(d, [
        {"writes": {"": [("f-a", a)]}, "replaces": {"": ["f-a"]}}])
    with pytest.raises(hm.HudiMetaError, match="also writes"):
        hm.snapshot_scan(d)


def test_unparseable_commit_meta_refused(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(d, [{"writes": {"": [("f-a", a)]}}])
    p = f"{d}/.hoodie/{20240101000050:017d}.commit"
    with open(p, "wb") as fh:
        fh.write(b"\x89not-json-not-avro")
    with pytest.raises(hm.HudiMetaError, match="neither JSON nor"):
        hm.snapshot_scan(d)
    with open(p, "wb") as fh:
        fh.write(b"Obj\x01\x02truncated-container")  # bad avro body
    with pytest.raises(hm.HudiMetaError, match="cannot decode"):
        hm.snapshot_scan(d)


def test_avro_commit_metadata_timeline(tmp_path):
    """Hudi 1.x Avro-serialized commit metadata: the same replay result
    as the JSON serialization, including replacecommit clustering and
    the 1.x timeline/ layout, decoded by the pure-Python avro_io reader
    (no Hudi runtime)."""
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    b = _mk_parquet(tmp_path, "b.parquet", [2])
    c = _mk_parquet(tmp_path, "c.parquet", [1, 2])
    commits = [
        {"writes": {"p=0": [("f-a", a)], "p=1": [("f-b", b)]}},
        {"writes": {"p=0": [("f-c", c)]},
         "replaces": {"p=0": ["f-a"]}},
    ]
    trees = {}
    for mode in ("json", "avro", "avro_v1"):
        d = str(tmp_path / f"tbl_{mode}")
        hm.write_table_fixture(d, commits,
                               avro_meta=mode.startswith("avro"),
                               timeline_v1=mode.endswith("v1"))
        trees[mode] = (_names(hm.snapshot_scan(d)),
                       _names(hm.snapshot_scan(
                           d, as_of=f"{20240101000000:017d}")))
    assert trees["json"] == trees["avro"] == trees["avro_v1"]
    assert len(trees["json"][0]) == 2  # f-c replaced f-a; f-b lives
    # the completed instant file really is an Avro container
    import glob as _g
    done = _g.glob(f"{tmp_path}/tbl_avro/.hoodie/*.commit")[0]
    assert open(done, "rb").read(4) == b"Obj\x01"


def test_not_a_hudi_table(tmp_path):
    with pytest.raises(hm.HudiMetaError, match="not a Hudi table"):
        hm.snapshot_scan(str(tmp_path / "nope"))


def test_missing_file_id_derived_from_filename(tmp_path):
    """Write stats without fileId fall back to the filename prefix
    (fileId never contains '_'), so group identity still resolves."""
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    a2 = _mk_parquet(tmp_path, "a2.parquet", [1, 2])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"": [("f-a", a)]}},
        {"writes": {"": [("f-a", a2)]}},
    ])
    for i in ins:  # strip fileId from both commit metadata files
        p = f"{d}/.hoodie/{i}.commit"
        meta = json.load(open(p))
        for stats in meta["partitionToWriteStats"].values():
            for st in stats:
                st.pop("fileId")
        json.dump(meta, open(p, "w"))
    assert _names(hm.snapshot_scan(d)) == \
        [f"f-a_1-0-1_{ins[1]}.parquet"]


def test_snapshot_diff_added_groups(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    b = _mk_parquet(tmp_path, "b.parquet", [2])
    c = _mk_parquet(tmp_path, "c.parquet", [3])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"p=0": [("f-a", a)]}},
        {"writes": {"p=0": [("f-b", b)], "p=1": [("f-c", c)]}},
    ])
    diff = hm.snapshot_scan_diff(d, ins[0])
    assert _names(diff) == sorted([f"f-b_1-0-1_{ins[1]}.parquet",
                                   f"f-c_1-0-1_{ins[1]}.parquet"])
    assert diff["instant"] == ins[1]
    # steady state: nothing after the latest instant
    assert hm.snapshot_scan_diff(d, ins[1])["files"] == []
    # composes with the partition filter
    only_p1 = hm.filter_partitions(diff, {"p": "1"})
    assert _names(only_p1) == [f"f-c_1-0-1_{ins[1]}.parquet"]


def test_snapshot_diff_refuses_rewrite_and_replace(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    a2 = _mk_parquet(tmp_path, "a2.parquet", [1, 2])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"": [("f-a", a)]}},
        {"writes": {"": [("f-a", a2)]}},  # upsert rewrites the group
    ])
    with pytest.raises(hm.HudiMetaError, match="rewritten or replaced"):
        hm.snapshot_scan_diff(d, ins[0])
    d2 = str(tmp_path / "tbl2")
    ins2 = hm.write_table_fixture(d2, [
        {"writes": {"": [("f-a", a)]}},
        {"writes": {"": [("f-b", a2)]}, "replaces": {"": ["f-a"]}},
    ])
    with pytest.raises(hm.HudiMetaError, match="rewritten or replaced"):
        hm.snapshot_scan_diff(d2, ins2[0])
    # but the window BEFORE the rewrite is a clean (empty) diff
    assert hm.snapshot_scan_diff(d, ins[0], as_of=ins[0])["files"] == []


def test_snapshot_diff_bad_instant_refused(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(d, [{"writes": {"": [("f-a", a)]}}])
    with pytest.raises(hm.HudiMetaError, match="not a completed"):
        hm.snapshot_scan_diff(d, "99999999999999999")


def test_hudi_incremental_encode(spark, tokens_path, tmp_path):
    """Full snapshot encode at instant 0, then append the instant-1
    diff: the tree ends up holding the union, with the first wave's
    chunks untouched — the Iceberg --since-snapshot ingest shape on the
    Hudi timeline."""
    from embulk_input_parquet_hadoop_spark.plans import pipeline, verify
    files = sorted(glob.glob(f"{tokens_path}/*.parquet"))[:2]
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"": [("f-0", files[0])]}},
        {"writes": {"": [("f-1", files[1])]}},
    ])
    out = str(tmp_path / "enc")
    t0 = pipeline.encode_path(
        spark, d, out, input_files=hm.snapshot_files(d, as_of=ins[0]))
    diff = hm.snapshot_scan_diff(d, ins[0])
    t1 = pipeline.encode_path(spark, d, out, input_files=diff["files"],
                              append=True)
    n_all = sum(pq.read_metadata(f).num_rows for f in files)
    assert t0["n_rows"] + t1["n_rows"] == n_all
    assert t1["waves_run"] == 1
    dec = pipeline.decode_chunks(
        pipeline.read_chunks(spark, out), ["doc_id"], "doc_id string")
    assert dec.count() == n_all
    assert verify.verify_files(spark, out)["ok"]
    # steady state appends nothing
    t2 = pipeline.encode_path(
        spark, d, out, input_files=hm.snapshot_scan_diff(d, ins[1])["files"],
        append=True)
    assert t2["waves_run"] == 0 and t2["n_rows"] == 0


def test_filter_partitions(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    b = _mk_parquet(tmp_path, "b.parquet", [2])
    c = _mk_parquet(tmp_path, "c.parquet", [3])
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(d, [{"writes": {
        "dt=2024-01-01/src=web": [("f-a", a)],
        "dt=2024-01-01/src=app": [("f-b", b)],
        "dt=2024-01-02/src=web": [("f-c", c)]}}])
    scan = hm.snapshot_scan(d)
    assert len(scan["files"]) == 3
    one = hm.filter_partitions(scan, {"dt": "2024-01-01", "src": "web"})
    assert _names(one) == [f"f-a_1-0-1_{scan['instant']}.parquet"]
    web = hm.filter_partitions(scan, {"src": "web"})
    assert len(web["files"]) == 2
    assert hm.filter_partitions(scan, {"src": "nope"})["files"] == []


def test_filter_partitions_non_hive_refused(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    d = str(tmp_path / "tbl")
    hm.write_table_fixture(d, [{"writes": {"2024/01/01": [("f-a", a)]}}])
    with pytest.raises(hm.HudiMetaError, match="not a hive-style"):
        hm.filter_partitions(hm.snapshot_scan(d), {"dt": "2024-01-01"})


# ---------------------------------------------------------------------
# timeline replay fuzz (model-based, mirrors test_delta replay fuzz)
# ---------------------------------------------------------------------

def test_timeline_fuzz_vs_model(tmp_path):
    """Random insert/upsert/replace/pending commit sequences: the
    scan's live file set must equal a trivial dict model — at the final
    snapshot AND at every as_of prefix — on both timeline layouts."""
    import random
    rng = random.Random(20260820)
    src = _mk_parquet(tmp_path, "src.parquet", [1])
    parts = ["p=0", "p=1"]
    for trial in range(12):
        model: dict[tuple, int] = {}  # (part, fid) -> commit idx of slice
        history: list[dict] = []      # model snapshot after each commit
        commits: list[dict] = []
        next_fid = 0
        for _ in range(rng.randint(1, 8)):
            pending = rng.random() < 0.15
            op = rng.random()
            present = sorted(model)
            if op < 0.4 or not present:  # insert a brand-new group
                part = rng.choice(parts)
                fid = f"f-{next_fid}"
                next_fid += 1
                c = {"writes": {part: [(fid, src)]}, "pending": pending}
                if not pending:
                    model[(part, fid)] = len(commits)
            elif op < 0.7:               # upsert an existing group
                part, fid = rng.choice(present)
                c = {"writes": {part: [(fid, src)]}, "pending": pending}
                if not pending:
                    model[(part, fid)] = len(commits)
            else:                        # cluster: replace 1-2 groups
                victims = rng.sample(present,
                                     rng.randint(1, min(2, len(present))))
                reps: dict[str, list[str]] = {}
                for part, fid in victims:
                    reps.setdefault(part, []).append(fid)
                part = rng.choice(parts)
                fid = f"f-{next_fid}"
                next_fid += 1
                c = {"writes": {part: [(fid, src)]}, "replaces": reps,
                     "pending": pending}
                if not pending:
                    model[(part, fid)] = len(commits)
                    for v in victims:
                        model.pop(v, None)
            commits.append(c)
            history.append(dict(model))
        d = str(tmp_path / f"fz{trial}")
        ins = hm.write_table_fixture(d, commits,
                                     timeline_v1=bool(trial % 2))

        def expected(m, ins=ins):
            return sorted(f"{k[1]}_1-0-1_{ins[i]}.parquet"
                          for k, i in m.items())

        assert _names(hm.snapshot_scan(d)) == expected(model), \
            (trial, commits)
        for step in range(len(commits)):
            got = _names(hm.snapshot_scan(d, as_of=ins[step]))
            assert got == expected(history[step]), (trial, step, commits)


# ---------------------------------------------------------------------
# object-store metadata reads + encode integration
# ---------------------------------------------------------------------

def test_mock_s3_table_plans_remotely(tmp_path):
    a = _mk_parquet(tmp_path, "a.parquet", [1, 2])
    a2 = _mk_parquet(tmp_path, "a2.parquet", [1, 2, 3])
    d = f"mock-s3://bucket{tmp_path}/tbl"
    ins = hm.write_table_fixture(d, [
        {"writes": {"p=0": [("f-a", a)]}},
        {"writes": {"p=0": [("f-a", a2)]}},
    ])
    scan = hm.snapshot_scan(d)
    assert _names(scan) == [f"f-a_1-0-1_{ins[1]}.parquet"]
    assert scan["files"][0].startswith("mock-s3://bucket/")


def test_hudi_encode_end_to_end(spark, tokens_path, tmp_path):
    """COW table whose second commit rewrites a file group and whose
    third clusters two groups into one: snapshot_files feeds
    encode_path(input_files=), and the decoded tree holds exactly the
    final slices' rows — a stale slice anywhere would double-count."""
    from embulk_input_parquet_hadoop_spark.plans import pipeline
    files = sorted(glob.glob(f"{tokens_path}/*.parquet"))[:3]
    stale = _mk_parquet(tmp_path, "stale.parquet", [999])
    # clustering rewrites the same ROWS into a new file group
    t12 = pa.concat_tables([pq.read_table(files[1]),
                            pq.read_table(files[2])])
    clustered = str(tmp_path / "clustered.parquet")
    pq.write_table(t12, clustered)
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"": [("f-0", stale), ("f-1", files[1]),
                         ("f-x", files[2])]}},
        {"writes": {"": [("f-0", files[0])]}},        # rewrites group f-0
        {"writes": {"": [("f-2", clustered)]},
         "replaces": {"": ["f-1", "f-x"]}},           # clusters f-1+f-x
    ])
    flist = hm.snapshot_files(d)
    assert len(flist) == 2
    out = str(tmp_path / "enc")
    totals = pipeline.encode_path(spark, d, out, input_files=flist)
    n_expected = sum(pq.read_metadata(f).num_rows for f in files)
    assert totals["n_rows"] == n_expected
    dec = pipeline.decode_chunks(
        pipeline.read_chunks(spark, out), ["doc_id"], "doc_id string")
    expect = sorted(x for f in files
                    for x in pq.read_table(f).column("doc_id").to_pylist())
    assert sorted(r.doc_id for r in dec.collect()) == expect
    # time travel to the first instant sees all three original groups,
    # including the stale f-0 slice the second commit later rewrote
    old = hm.snapshot_scan(d, as_of=ins[0])
    assert len(old["files"]) == 3
    assert f"f-0_1-0-1_{ins[0]}.parquet" in _names(old)


def test_as_of_prefix_semantics(tmp_path):
    """Hudi as.of.instant: a SHORTER user timestamp is a prefix and
    must include every instant it prefixes (plain string compare would
    exclude the whole day)."""
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    a2 = _mk_parquet(tmp_path, "a2.parquet", [1, 2])
    d = str(tmp_path / "tbl")
    ins = hm.write_table_fixture(d, [
        {"writes": {"": [("f-a", a)]}},
        {"writes": {"": [("f-a", a2)]}},
    ])
    day_prefix = ins[1][:8]  # prefixes BOTH instants
    scan = hm.snapshot_scan(d, as_of=day_prefix)
    assert _names(scan) == [f"f-a_1-0-1_{ins[1]}.parquet"]
    # exact-instant as_of still works (inclusive)
    assert _names(hm.snapshot_scan(d, as_of=ins[0])) == \
        [f"f-a_1-0-1_{ins[0]}.parquet"]


def test_snapshot_diff_accepts_noop_instant_watermark(tmp_path):
    """A completed clean/rollback/savepoint is a real instant and a
    valid incremental watermark (its file set equals the previous
    apply-instant's)."""
    a = _mk_parquet(tmp_path, "a.parquet", [1])
    b = _mk_parquet(tmp_path, "b.parquet", [2])
    d = str(tmp_path / "tbl")
    clean = f"{20240101000000:017d}5"
    ins = hm.write_table_fixture(
        d, [{"writes": {"": [("f-a", a)]}}],
        extra_timeline_files=[f"{clean}.clean"])
    # a later commit after the clean
    import json as _json
    inst2 = f"{20240101000000:017d}9"
    meta = {"partitionToWriteStats": {"": [
        {"fileId": "f-b", "path": f"f-b_1-0-1_{inst2}.parquet"}]}}
    import shutil
    shutil.copy(b, f"{d}/f-b_1-0-1_{inst2}.parquet")
    with open(f"{d}/.hoodie/{inst2}.commit", "w") as fh:
        _json.dump(meta, fh)
    diff = hm.snapshot_scan_diff(d, clean)  # clean as the watermark
    assert _names(diff) == [f"f-b_1-0-1_{inst2}.parquet"]
    assert ins  # fixture instants unused beyond setup
