"""Live-database integration tier for the JDBC/Postgres surface
(VERDICT r04 item 6): when a Postgres server binary is present, boot a
throwaway instance on a unix socket and EXECUTE the server-side SQL
the engine generates — create_table_sql's array DDL (the reference's
``varchar(255)[]`` columns, SURVEY §4.3b), insert_on_conflict_sql's
idempotent load, and the staged_merge_statements two-phase MERGE.

Skips cleanly when initdb/pg_ctl/psql are missing or the server can't
start (e.g. no writable tmp, no unprivileged user while root). The
Spark JDBC reader itself still needs a driver jar this container
doesn't ship; these tests cover everything server-side of that jar.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pytest

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    VarcharType,
)

from evidence_images_etl_airflow_spark.sinks.postgres import (
    PG_DIALECT,
    create_table_sql,
    insert_on_conflict_sql,
    staged_merge_statements,
)

_REQUIRED = ("initdb", "pg_ctl", "psql")


def _have_binaries() -> bool:
    return all(shutil.which(b) for b in _REQUIRED)


def _as_pg_user(cmd: str) -> list[str]:
    """Postgres refuses to run as root; when we are root, hop to the
    `postgres` system user (present on Debian-style images)."""
    if os.geteuid() == 0:
        return ["su", "postgres", "-s", "/bin/sh", "-c", cmd]
    return ["/bin/sh", "-c", cmd]


class _LivePg:
    def __init__(self, root: str):
        self.root = root
        self.sock = os.path.join(root, "sock")
        self.data = os.path.join(root, "data")

    def sql(self, statement: str, db: str = "postgres") -> str:
        """Run one statement through psql, raising on SQL errors;
        returns tuples-only output."""
        out = subprocess.run(
            [
                "psql",
                "-h",
                self.sock,
                "-U",
                "sparktest",
                "-d",
                db,
                "-v",
                "ON_ERROR_STOP=1",
                "-tAc",
                statement,
            ],
            capture_output=True,
            text=True,
            timeout=60,
        )
        if out.returncode != 0:
            raise RuntimeError(f"psql failed: {out.stderr.strip()}")
        return out.stdout.strip()


@pytest.fixture(scope="module")
def pg():
    if not _have_binaries():
        pytest.skip("postgres binaries (initdb/pg_ctl/psql) not available")
    root = tempfile.mkdtemp(prefix="pg_live_")
    inst = _LivePg(root)
    os.makedirs(inst.sock, exist_ok=True)
    try:
        if os.geteuid() == 0:
            subprocess.run(["chown", "-R", "postgres", root], check=True)
        boot = subprocess.run(
            _as_pg_user(
                f"initdb -D {inst.data} -U sparktest --no-sync -A trust"
            ),
            capture_output=True,
            text=True,
            timeout=120,
        )
        if boot.returncode != 0:
            pytest.skip(f"initdb failed: {boot.stderr.strip()[:200]}")
        start = subprocess.run(
            _as_pg_user(
                f"pg_ctl -D {inst.data} -w "
                f"-o \"-k {inst.sock} -c listen_addresses=''\" "
                f"-l {inst.data}/log start"
            ),
            capture_output=True,
            text=True,
            timeout=120,
        )
        if start.returncode != 0:
            pytest.skip(f"pg_ctl start failed: {start.stderr.strip()[:200]}")
        assert inst.sql("SELECT 2;") == "2"
        yield inst
    finally:
        subprocess.run(
            _as_pg_user(f"pg_ctl -D {inst.data} -m immediate stop"),
            capture_output=True,
            text=True,
            timeout=60,
        )
        shutil.rmtree(root, ignore_errors=True)


def _fill(sql_with_placeholders: str, values: list[str]) -> str:
    """Substitute SQL literals for the %s executemany placeholders (the
    real pipeline binds them through the driver; psql has no binds)."""
    out = sql_with_placeholders
    for v in values:
        out = out.replace("%s", v, 1)
    return out


EVIDENCE_SCHEMA = StructType(
    [
        StructField("outlet_code", VarcharType(32)),
        StructField("scene_id", LongType()),
        StructField("image_names", ArrayType(VarcharType(255))),
        StructField("image_urls", ArrayType(StringType())),
        StructField("n_images", IntegerType()),
    ]
)


def test_array_ddl_round_trip(pg):
    # the reference's varchar(n)[] / text[] columns (SURVEY §4.3b)
    ddl = create_table_sql(
        "evidence", EVIDENCE_SCHEMA, primary_key=["outlet_code", "scene_id"]
    )
    pg.sql(ddl)
    pg.sql(ddl)  # IF NOT EXISTS really is idempotent on the server
    cols = pg.sql(
        "SELECT column_name, data_type FROM information_schema.columns "
        "WHERE table_name = 'evidence' ORDER BY ordinal_position;"
    )
    assert "image_names|ARRAY" in cols and "image_urls|ARRAY" in cols
    pg.sql(
        "INSERT INTO evidence VALUES ('OUT1', 1, "
        "ARRAY['a.jpg','b.jpg']::varchar(255)[], "
        "ARRAY['http://x/a.jpg']::text[], 2);"
    )
    got = pg.sql("SELECT image_names[1], image_urls[1] FROM evidence;")
    assert got == "a.jpg|http://x/a.jpg"
    # and the reader-side mapping understands what the server reports
    assert PG_DIALECT.to_spark("character varying[]").simpleString() == (
        "array<string>"
    )


def test_insert_on_conflict_do_nothing_idempotent(pg):
    pg.sql("CREATE TABLE k1 (k bigint PRIMARY KEY, v text);")
    sql = insert_on_conflict_sql("k1", ["k", "v"], ["k"])
    pg.sql(_fill(sql, ["1", "'first'"]))
    pg.sql(_fill(sql, ["1", "'replay'"]))  # conflict-skip: no error, no change
    pg.sql(_fill(sql, ["2", "'second'"]))
    assert pg.sql("SELECT count(*), min(v) FROM k1 WHERE k = 1;") == "1|first"
    assert pg.sql("SELECT count(*) FROM k1;") == "2"


def test_insert_on_conflict_do_update_last_write_wins(pg):
    pg.sql("CREATE TABLE k1u (k bigint PRIMARY KEY, v text);")
    sql = insert_on_conflict_sql("k1u", ["k", "v"], ["k"], do_update=True)
    pg.sql(_fill(sql, ["1", "'first'"]))
    pg.sql(_fill(sql, ["1", "'updated'"]))
    assert pg.sql("SELECT v FROM k1u WHERE k = 1;") == "updated"


def test_staged_merge_two_phase_load(pg):
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("v", StringType()),
            StructField("n", IntegerType()),
        ]
    )
    pg.sql(create_table_sql("tgt", schema, primary_key=["k"]))
    pg.sql("INSERT INTO tgt VALUES (1, 'old', 10), (2, 'keep', 20);")
    create_staging, merge, drop_staging = staged_merge_statements(
        "tgt", "stg", schema, keys=["k"]
    )
    pg.sql(create_staging)
    assert (
        pg.sql(
            "SELECT relpersistence FROM pg_class WHERE relname = 'stg';"
        )
        == "u"  # UNLOGGED staging, as generated
    )
    # (in the pipeline df.write.jdbc appends here)
    pg.sql("INSERT INTO stg VALUES (1, 'new', 11), (3, 'ins', 30);")
    pg.sql(merge)
    pg.sql(drop_staging)
    rows = pg.sql("SELECT k, v, n FROM tgt ORDER BY k;")
    assert rows.splitlines() == ["1|new|11", "2|keep|20", "3|ins|30"]
    assert pg.sql("SELECT count(*) FROM pg_class WHERE relname = 'stg';") == "0"
