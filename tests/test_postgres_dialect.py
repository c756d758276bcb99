"""SURVEY §4.3a/b — Postgres dialect mapping and server-side upsert SQL
generation (no live database: the SQL text and type mappings are the
unit under test, mirroring the reference's DDL and load statements)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
    VarcharType,
)

from evidence_images_etl_airflow_spark.sinks.postgres import (
    PG_DIALECT,
    create_table_sql,
    insert_on_conflict_sql,
    merge_sql,
    mssql_keyed_update_sql,
    staged_merge_statements,
)

# the reference's evidence_images table shape
# (dags/evidence_images_processing.py:44-61)
EVIDENCE_SCHEMA = StructType(
    [
        StructField("sessionuid", StringType()),
        StructField("sceneuid", StringType()),
        StructField("scenetype", VarcharType(50)),
        StructField("subscenetype", VarcharType(50)),
        StructField("evidenceimageurl", StringType()),
        StructField("evidenceimagename", VarcharType(255)),
        StructField("formattedevidenceimageurl", ArrayType(StringType())),
        StructField("formattedevidenceimagename", ArrayType(VarcharType(255))),
        StructField("createdontime", TimestampType()),
        StructField("reexportstatus", IntegerType()),
    ]
)


def test_array_type_round_trip():
    # text[] / varchar(255)[] — the columns Spark's stock dialect drops
    assert PG_DIALECT.to_pg(ArrayType(StringType())) == "text[]"
    assert PG_DIALECT.to_pg(ArrayType(VarcharType(255))) == "varchar(255)[]"
    assert PG_DIALECT.to_spark("text[]") == ArrayType(StringType())
    assert PG_DIALECT.to_spark("varchar(255)[]") == ArrayType(StringType())
    assert PG_DIALECT.to_spark("integer[]") == ArrayType(IntegerType())


def test_scalar_mappings():
    assert PG_DIALECT.to_pg(LongType()) == "bigint"
    assert PG_DIALECT.to_pg(DecimalType(18, 2)) == "numeric(18,2)"
    assert PG_DIALECT.to_spark("numeric(18,2)") == DecimalType(18, 2)
    assert PG_DIALECT.to_spark("uuid") == StringType()
    with pytest.raises(TypeError):
        PG_DIALECT.to_pg(StructType([]))


def test_create_table_column_types_option():
    s = PG_DIALECT.create_table_column_types(EVIDENCE_SCHEMA)
    assert "formattedevidenceimageurl text[]" in s
    assert "formattedevidenceimagename varchar(255)[]" in s
    assert "scenetype varchar(50)" in s
    assert "createdontime timestamp" in s


def test_custom_schema_read_option():
    s = PG_DIALECT.custom_schema(
        {"formattedevidenceimageurl": "text[]", "reexportstatus": "integer"}
    )
    assert "formattedevidenceimageurl array<string>" in s
    assert "reexportstatus int" in s


def test_create_table_sql_matches_reference_ddl_shape():
    sql = create_table_sql(
        "evidence_images", EVIDENCE_SCHEMA, primary_key=["sessionuid", "sceneuid"]
    )
    assert sql.startswith('CREATE TABLE IF NOT EXISTS "evidence_images"')
    assert '"formattedevidenceimageurl" text[]' in sql
    assert '"formattedevidenceimagename" varchar(255)[]' in sql
    assert 'PRIMARY KEY ("sessionuid", "sceneuid")' in sql


def test_insert_on_conflict_do_nothing():
    # evidence_images_processing.py:146-172
    sql = insert_on_conflict_sql(
        "evidence_images",
        ["sessionuid", "sceneuid", "scenetype"],
        ["sessionuid", "sceneuid"],
    )
    assert sql == (
        'INSERT INTO "evidence_images" ("sessionuid", "sceneuid", "scenetype") '
        "VALUES (%s, %s, %s) "
        'ON CONFLICT ("sessionuid", "sceneuid") DO NOTHING'
    )


def test_insert_on_conflict_do_update_excludes_keys():
    sql = insert_on_conflict_sql(
        "t", ["k", "a", "b"], ["k"], do_update=True
    )
    assert sql.endswith(
        'DO UPDATE SET "a" = EXCLUDED."a", "b" = EXCLUDED."b"'
    )
    assert 'SET "k"' not in sql


def test_merge_sql_matches_reference_shape():
    # learn/postgres_op.py:46-58: unqualified assignment targets
    sql = merge_sql(
        "dag_run", "temp_dag_run", ["dt", "dag_id"], ["note"], ["dt", "dag_id", "note"]
    )
    assert 'MERGE INTO "dag_run" AS target' in sql
    assert 'USING "temp_dag_run" AS source' in sql
    assert 'target."dt" = source."dt" AND target."dag_id" = source."dag_id"' in sql
    assert 'UPDATE SET "note" = source."note"' in sql
    assert 'INSERT ("dt", "dag_id", "note") VALUES' in sql
    # qualifying the UPDATE target is a Postgres error the reference
    # documents — make sure we never emit it
    assert 'SET target."' not in sql


def test_staged_merge_statement_ordering():
    stmts = staged_merge_statements(
        "evidence_images", "evidence_images_stage", EVIDENCE_SCHEMA,
        keys=["sessionuid", "sceneuid"],
    )
    assert len(stmts) == 3
    assert stmts[0].startswith("CREATE UNLOGGED TABLE IF NOT EXISTS")
    assert "MERGE INTO" in stmts[1]
    assert stmts[2] == 'DROP TABLE "evidence_images_stage"'
    # update set covers every non-key column
    assert '"scenetype" = source."scenetype"' in stmts[1]
    assert '"sessionuid" = source."sessionuid",' not in stmts[1].split("UPDATE SET")[1].split("WHEN")[0]


def test_mssql_keyed_update_sql():
    # add_image_data.py:65-71, with the reference's broken WHERE fixed
    sql = mssql_keyed_update_sql()
    assert sql == (
        "UPDATE [dbo].[View_ManualQuestions] "
        "SET [EvidenceImageName] = %s, [EvidenceImageURL] = %s "
        "WHERE [OutletCode] = %s AND [SubSceneType] = %s AND [Date] = %s"
    )
