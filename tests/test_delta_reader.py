"""Delta log reader: snapshot fold, time travel, partitions,
checkpoints, protocol gates — all against hand-built conformance
tables (the codec-module discipline)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from dataflowex_spark.sources.delta_reader import (
    DeltaProtocolError,
    delta_history,
    read_delta,
    stage_parquet_file,
    write_conformance_log,
)

PROTO = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _meta(schema_json, part_cols=None):
    return {
        "metaData": {
            "id": "t",
            "schemaString": schema_json,
            "partitionColumns": part_cols or [],
            "format": {"provider": "parquet"},
        }
    }


def _simple_table(spark, root):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    df2 = spark.createDataFrame([(3, "c")], "k long, v string")
    df3 = spark.createDataFrame([(4, "d")], "k long, v string")
    stage_parquet_file(df1, root, "f1.parquet")
    stage_parquet_file(df2, root, "f2.parquet")
    stage_parquet_file(df3, root, "f3.parquet")
    schema_json = json.dumps(df1.schema.jsonValue())
    commits = [
        [PROTO, _meta(schema_json),
         {"add": {"path": "f1.parquet", "partitionValues": {},
                  "dataChange": True}},
         {"add": {"path": "f2.parquet", "partitionValues": {},
                  "dataChange": True}},
         {"commitInfo": {"operation": "WRITE"}}],
        [{"remove": {"path": "f2.parquet", "dataChange": True}},
         {"add": {"path": "f3.parquet", "partitionValues": {},
                  "dataChange": True}},
         {"commitInfo": {"operation": "MERGE"}}],
    ]
    return commits


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_snapshot_and_time_travel(spark, tmp_path):
    root = str(tmp_path)
    write_conformance_log(root, _simple_table(spark, root))
    assert rows(read_delta(spark, root)) == [(1, "a"), (2, "b"), (4, "d")]
    assert rows(read_delta(spark, root, version=0)) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    hist = delta_history(root)
    assert [h["version"] for h in hist] == [0, 1]
    assert hist[1]["operation"] == "MERGE"
    with pytest.raises(ValueError, match="> latest"):
        read_delta(spark, root, version=7)


def test_partition_values_reattach_typed(spark, tmp_path):
    root = str(tmp_path)
    full = spark.createDataFrame(
        [(1, 10, "x")], "k long, p int, s string"
    )
    phys = full.select("k")
    stage_parquet_file(phys, root, "a.parquet")
    stage_parquet_file(
        spark.createDataFrame([(2,)], "k long"), root, "b.parquet"
    )
    schema_json = json.dumps(full.schema.jsonValue())
    write_conformance_log(
        root,
        [[PROTO, _meta(schema_json, ["p", "s"]),
          {"add": {"path": "a.parquet",
                   "partitionValues": {"p": "10", "s": "x"},
                   "dataChange": True}},
          {"add": {"path": "b.parquet",
                   "partitionValues": {"p": "20", "s": None},
                   "dataChange": True}}]],
    )
    got = read_delta(spark, root)
    assert dict(got.dtypes)["p"] == "int"  # typed, not string
    assert rows(got) == [(1, 10, "x"), (2, 20, None)]


def test_checkpoint_covers_retention_gap(spark, tmp_path):
    root = str(tmp_path)
    commits = _simple_table(spark, root)
    write_conformance_log(root, commits, checkpoint_at=1, spark=spark)
    # simulate log retention: drop the JSON commits the checkpoint covers
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(root, "_delta_log", f"{1:020d}.json"))
    assert rows(read_delta(spark, root)) == [(1, "a"), (2, "b"), (4, "d")]
    # time travel BEFORE the checkpoint is now honestly impossible
    with pytest.raises(FileNotFoundError, match="retention"):
        read_delta(spark, root, version=0)


def test_protocol_gates(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "k long")
    schema_json = json.dumps(df.schema.jsonValue())

    def table(proto, add_extra=None):
        import tempfile

        root = tempfile.mkdtemp(dir=str(tmp_path))
        stage_parquet_file(df, root, "f.parquet")
        add = {"path": "f.parquet", "partitionValues": {},
               "dataChange": True}
        if add_extra:
            add.update(add_extra)
        write_conformance_log(
            root,
            [[{"protocol": proto}, _meta(schema_json), {"add": add}]],
        )
        return root

    # v2 (column mapping era) refused
    with pytest.raises(DeltaProtocolError, match="minReaderVersion: 2"):
        read_delta(spark, table({"minReaderVersion": 2}))
    # v3 with unknown feature refused, with the feature named
    with pytest.raises(DeltaProtocolError, match="deletionVectors"):
        read_delta(
            spark,
            table({"minReaderVersion": 3,
                   "readerFeatures": ["deletionVectors"]}),
        )
    # v3 with only benign features reads fine
    got = read_delta(
        spark,
        table({"minReaderVersion": 3, "readerFeatures": ["timestampNtz"]}),
    )
    assert rows(got) == [(1,)]
    # a DV-carrying add refuses even under v1
    with pytest.raises(DeltaProtocolError, match="deletionVector"):
        read_delta(
            spark,
            table({"minReaderVersion": 1},
                  add_extra={"deletionVector": {"storageType": "u"}}),
        )


def test_column_projection_pushes_to_scan(spark, tmp_path):
    """Projection through the reader reaches the parquet scan (the
    union of per-partition scans stays prunable)."""
    from dataflowex_spark.plans import formatted_plan

    root = str(tmp_path)
    write_conformance_log(root, _simple_table(spark, root))
    df = read_delta(spark, root).select("k").filter(F.col("k") > 1)
    plan = formatted_plan(df)
    assert "PushedFilters: [IsNotNull(k), GreaterThan(k,1)]" in plan
    assert rows(df) == [(2,), (4,)]


def test_mtable_export_roundtrip_and_dv_refusal(spark, tmp_path):
    from pyspark.sql import functions as F

    from dataflowex_spark.sources.delta_reader import (
        export_snapshot_to_delta,
        read_delta,
    )
    from dataflowex_spark.sources.mtable import MTable

    df = spark.range(0, 60).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 17).alias("v")
    )
    t = MTable.create(spark, str(tmp_path / "t"), df, "k")
    upd = t.read().filter(F.col("k") % 4 == 0).select(
        "k",
        F.lit(1).alias("ts"),
        F.lit("U").alias("op"),
        F.lit(0).alias("tie"),
        (F.col("v") + 100).alias("v"),
    )
    t.merge(upd, "ts", "op", "tie", ["v"])
    dest = str(tmp_path / "delta")
    export_snapshot_to_delta(t, dest)
    got = sorted(tuple(r) for r in read_delta(spark, dest).collect())
    want = sorted(tuple(r) for r in t.read().collect())
    assert got == want
    # exporting an OLD version snapshots that version
    dest1 = str(tmp_path / "delta_v1")
    export_snapshot_to_delta(t, dest1, version=1)
    got1 = sorted(tuple(r) for r in read_delta(spark, dest1).collect())
    want1 = sorted(tuple(r) for r in t.read(version=1).collect())
    assert got1 == want1
    # a snapshot with unapplied DV debt refuses
    t.delete_where("k = 3")
    import pytest as _pt

    with _pt.raises(ValueError, match="delete debt"):
        export_snapshot_to_delta(t, str(tmp_path / "delta_dv"))
