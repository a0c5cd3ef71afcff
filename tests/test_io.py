"""io.read_table/write_table: parquet backend, column pruning reaches the
scan, partitioned writes round-trip."""

from __future__ import annotations

from sagan_spark import io as iomod


def test_read_table_prunes_columns(spark, tiny_path):
    df = iomod.read_table(spark, tiny_path, columns=["conv_id", "ts"])
    assert df.columns == ["conv_id", "ts"]
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "ReadSchema: struct<conv_id:string,ts:timestamp_ntz>" in plan


def test_write_table_partitioned_roundtrip(spark, tiny_path, tmp_path):
    df = iomod.read_table(spark, tiny_path).limit(500)
    out = str(tmp_path / "io_out")
    iomod.write_table(df, out, partition_by=["role"])
    back = iomod.read_table(spark, out)
    assert back.count() == 500
    assert set(back.columns) == set(iomod.TRANSCRIPT_COLUMNS)
    # partition pruning on the partition column
    one_role = back.where(back.role == "assistant")
    plan = one_role._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [isnotnull(role" in plan
