"""Round-10 additions: sequence pattern matching (operators/sequence)
and compaction planning (operators/maintenance) — hand-computed
semantics plus the real-footer inventory path."""

import os

import pytest
from pyspark.sql import functions as F

from evidence_images_etl_airflow_spark.operators.maintenance import (
    compaction_summary,
    file_inventory,
    plan_compaction,
)
from evidence_images_etl_airflow_spark.operators.sequence import (
    journey_pattern_counts,
    symbolize,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_symbolize_rejects_bad_alphabets(spark):
    with pytest.raises(ValueError, match="single characters"):
        symbolize({"view": "vw"}, "event_type")
    with pytest.raises(ValueError, match="duplicate"):
        symbolize({"view": "v", "click": "v"}, "event_type")


def test_journey_pattern_counts_hand_case(spark):
    """Journey v c p v e e p for user 1 (with a timestamp TIE pinned by
    event_id), v p for user 2. Patterns counted non-overlapping."""
    rows = [
        # user 1 — events 3 and 4 share ts 40: event_id must order them
        (1, 10, 1, "view"), (1, 20, 2, "click"), (1, 30, 3, "purchase"),
        (1, 40, 4, "view"), (1, 40, 5, "error"), (1, 50, 6, "error"),
        (1, 60, 7, "purchase"),
        (2, 10, 8, "view"), (2, 20, 9, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts_us long, event_id long, event_type string"
    )
    sym = symbolize(
        {"view": "v", "click": "c", "purchase": "p", "error": "e"},
        "event_type",
    )
    out = journey_pattern_counts(
        ev,
        group_cols=["user_id"],
        order_cols=["ts_us", "event_id"],
        symbol=sym,
        patterns={"n_conv": "vc*p", "n_err_burst": "ee+"},
        include_journey=True,
    )
    got = {r.user_id: r for r in out.collect()}
    # user 1: sorted journey is v c p v e e p
    assert got[1].journey == "vcpveep"
    assert got[1].journey_len == 7
    assert got[1].n_conv == 1  # 'vcp' matches; second v is cut by 'ee'
    assert got[1].n_err_burst == 1
    assert got[2].journey == "vp" and got[2].n_conv == 1


def test_journey_unmapped_symbols_fall_to_default(spark):
    ev = spark.createDataFrame(
        [(1, 1, 1, "view"), (1, 2, 2, "refund")],
        "user_id long, ts_us long, event_id long, event_type string",
    )
    out = journey_pattern_counts(
        ev, ["user_id"], ["ts_us", "event_id"],
        symbolize({"view": "v"}, "event_type"),
        patterns={"n_x": "x"}, include_journey=True,
    ).first()
    assert out.journey == "vx" and out.n_x == 1


def test_plan_compaction_offset_binning_hand_case(spark):
    """target=100: files of 60,60,60 bin at offsets 0,60,120 ->
    groups 0,0,1; a 250-byte giant starting at 180 gets group 1 (at
    most one file of overflow per group), next file starts at 430 ->
    group 4."""
    files = spark.createDataFrame(
        [("a", 1, 60), ("a", 2, 60), ("a", 3, 60), ("a", 4, 250),
         ("a", 5, 10), ("b", 1, 10)],
        "part string, fid long, file_bytes long",
    )
    planned = plan_compaction(
        files, order_cols=("fid",), partition_cols=("part",),
        target_bytes=100,
    )
    got = {(r.part, r.fid): r.group_id for r in planned.collect()}
    assert got == {
        ("a", 1): 0, ("a", 2): 0, ("a", 3): 1, ("a", 4): 1, ("a", 5): 4,
        ("b", 1): 0,
    }
    summary = {
        (r.part, r.group_id): (r.n_files, r.group_bytes)
        for r in compaction_summary(
            planned, partition_cols=("part",)
        ).collect()
    }
    assert summary[("a", 0)] == (2, 120)
    assert summary[("a", 1)] == (2, 310)
    assert summary[("a", 4)] == (1, 10)
    assert summary[("b", 0)] == (1, 10)
    # conservation: planned bytes == inventory bytes
    assert sum(v[1] for v in summary.values()) == 60 * 3 + 250 + 10 + 10


def test_plan_compaction_validates_args(spark):
    files = spark.createDataFrame([("f", 1)], "file_path string, file_bytes long")
    with pytest.raises(ValueError, match="target_bytes"):
        plan_compaction(files, target_bytes=0)
    with pytest.raises(ValueError, match="order_cols"):
        plan_compaction(files, order_cols=())


def test_file_inventory_reads_real_footers(spark):
    """The _metadata path against the driver-generated parquet: sizes
    must match the filesystem byte-for-byte."""
    path = os.path.join(SF_DIR, "documents.parquet")
    inv = file_inventory(spark, path).collect()
    assert len(inv) >= 1
    for r in inv:
        local = r.file_path.removeprefix("file://").removeprefix("file:")
        assert os.path.getsize(local) == r.file_bytes


def test_symbolize_default_collision_and_pattern_name_clash(spark):
    """r10 self-review: a default symbol equal to a mapped one would
    silently count unmapped values as that category; a pattern named
    like an output column would shadow it."""
    with pytest.raises(ValueError, match="collides"):
        symbolize({"view": "v"}, "event_type", default="v")
    ev = spark.createDataFrame(
        [(1, 1, 1, "view")],
        "user_id long, ts_us long, event_id long, event_type string",
    )
    with pytest.raises(ValueError, match="collide with output"):
        journey_pattern_counts(
            ev, ["user_id"], ["ts_us", "event_id"],
            symbolize({"view": "v"}, "event_type"),
            patterns={"journey_len": "v"},
        )


def test_execute_compaction_incremental(spark, tmp_path):
    """r10: incremental OPTIMIZE — rewrite only multi-file groups, one
    output file per group, data byte-identical, second run a no-op."""
    d = str(tmp_path / "tbl")
    df = spark.range(1200).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    df.repartition(12).write.parquet(d)
    before = spark.read.parquet(d)
    assert before.rdd.getNumPartitions() >= 1
    n_before = len([p for p in os.listdir(d) if p.endswith(".parquet")])
    assert n_before == 12

    from evidence_images_etl_airflow_spark.operators.maintenance import (
        execute_compaction,
    )

    stats = execute_compaction(spark, d, target_bytes=1 << 30)
    assert stats["groups_rewritten"] == 1
    assert stats["files_removed"] == 12 and stats["files_added"] == 1
    after = spark.read.parquet(d)
    assert after.exceptAll(df).count() == 0 and df.exceptAll(after).count() == 0
    n_after = len([p for p in os.listdir(d) if p.endswith(".parquet")])
    assert n_after == 1

    # second run: every group is a single file now -> no-op
    stats2 = execute_compaction(spark, d, target_bytes=1 << 30)
    assert stats2 == {
        "groups_rewritten": 0, "files_removed": 0, "files_added": 0,
    }


def test_execute_compaction_respects_max_groups(spark, tmp_path):
    """Bounded incremental batch: with max_groups=1 only the largest
    group is rewritten; the rest of the layout is untouched."""
    d = str(tmp_path / "tbl2")
    spark.range(2000).select("id").repartition(10).write.parquet(d)
    from evidence_images_etl_airflow_spark.operators.maintenance import (
        execute_compaction,
        file_inventory,
    )

    one_file = file_inventory(spark, d).agg(
        F.max("file_bytes").alias("m")
    ).first().m
    # target ~ 3 files per group -> several multi-file groups
    stats = execute_compaction(
        spark, d, target_bytes=int(one_file * 3), max_groups=1
    )
    assert stats["groups_rewritten"] == 1
    assert stats["files_removed"] >= 2 and stats["files_added"] == 1
    total = spark.read.parquet(d).count()
    assert total == 2000


def test_length_bucket_plan_hand_case(spark):
    """Equal-width buckets over lengths 1..8 with max 8, n=4:
    bucket = min(3, len*4 div 9)."""
    from evidence_images_etl_airflow_spark.functions.partitioning import (
        length_bucket_plan,
    )

    df = spark.createDataFrame([(i,) for i in range(1, 9)], "l long")
    got = {
        r.bucket: (r.n_rows, r.min_len, r.max_len, r.padding_waste)
        for r in length_bucket_plan(df, "l", n_buckets=4).collect()
    }
    # len*4//9: 1,2->0; 3,4->1; 5,6->2; 7,8->3
    assert got == {
        0: (2, 1, 2, 1), 1: (2, 3, 4, 1), 2: (2, 5, 6, 1), 3: (2, 7, 8, 1),
    }
    with pytest.raises(ValueError, match="n_buckets"):
        length_bucket_plan(df, "l", n_buckets=0)


def test_mad_outlier_screen_hand_case(spark):
    """9 values around 10.00 plus one 1000.00 outlier: median 10.00,
    MAD driven by the 0.50-step spread; the z-score screen's mean
    would be dragged to ~109 — MAD is not."""
    from evidence_images_etl_airflow_spark.operators.quality import (
        mad_outlier_screen,
    )

    vals = [9.50, 9.50, 10.00, 10.00, 10.00, 10.00, 10.50, 10.50, 11.00,
            1000.00]
    df = spark.createDataFrame([(v,) for v in vals], "price double")
    r = mad_outlier_screen(df, "price", k=3.0).first()
    assert r.n_rows == 10
    assert r.median_value == 10.0
    # deviations in cents: 50,50,0,0,0,0,50,50,100,99000 -> median 50
    assert r.mad_value == 0.5
    assert (r.lo_cut, r.hi_cut) == (8.5, 11.5)
    assert r.n_outliers == 1  # only the 1000.00 row


def test_execute_compaction_skips_big_files(spark, tmp_path):
    """r10 A/B finding: files at-or-above the small-file threshold must
    never be rewritten just because they neighbor a small-file run —
    OPTIMIZE minFileSize semantics."""
    d = str(tmp_path / "tbl3")
    # one big file + 10 tiny files
    spark.range(500_000).select("id").coalesce(1).write.parquet(d)
    spark.range(500_000, 501_000).select("id").repartition(10).write.mode(
        "append"
    ).parquet(d)
    from evidence_images_etl_airflow_spark.operators.maintenance import (
        execute_compaction,
        file_inventory,
    )

    big = file_inventory(spark, d).agg(F.max("file_bytes").alias("m")).first().m
    stats = execute_compaction(
        spark, d, target_bytes=1 << 30, small_file_bytes=big,  # big excluded
    )
    assert stats["groups_rewritten"] == 1
    assert stats["files_removed"] == 10 and stats["files_added"] == 1
    inv = {r.file_bytes for r in file_inventory(spark, d).collect()}
    assert big in inv  # the big file is byte-untouched
    assert spark.read.parquet(d).count() == 501_000


def test_execute_compaction_refuses_partitioned_layouts(spark, tmp_path):
    """r10 self-review: partition values live in directory names —
    moving rewritten files to the table root would detach rows from
    their partitions. The executor must refuse, not corrupt."""
    d = str(tmp_path / "ptbl")
    spark.range(100).select(
        "id", (F.col("id") % 3).alias("p")
    ).repartition(4).write.partitionBy("p").parquet(d)
    from evidence_images_etl_airflow_spark.operators.maintenance import (
        execute_compaction,
    )

    with pytest.raises(ValueError, match="partition"):
        execute_compaction(spark, d, target_bytes=1 << 30)
    # per-partition-directory compaction works fine
    stats = execute_compaction(spark, d + "/p=0", target_bytes=1 << 30)
    assert stats["files_added"] == 1
    assert spark.read.parquet(d).count() == 100

def test_execute_compaction_crash_between_move_and_delete(spark, tmp_path):
    """r11 (VERDICT r10 item 3 + ADVICE): the swap persists a commit
    manifest and renames BEFORE deleting, so a crash anywhere in the
    window leaves transient DUPLICATES, never missing rows, and
    recover_compaction replays the manifest to finish mechanically."""
    import os

    from evidence_images_etl_airflow_spark.operators.maintenance import (
        execute_compaction,
        recover_compaction,
    )

    d = str(tmp_path / "ctbl")
    df = spark.range(600).select("id", (F.col("id") % 5).alias("v"))
    df.repartition(6).write.parquet(d)

    # crash after the first rename, before any delete
    with pytest.raises(RuntimeError, match="injected crash: after move"):
        execute_compaction(spark, d, target_bytes=1 << 30,
                           _crash_after_moves=1)
    # loss-window guarantee: every original row still present (dupes OK)
    mid = spark.read.parquet(d)
    assert df.exceptAll(mid).count() == 0  # nothing lost
    assert os.path.exists(d + "__compact_manifest.json")

    stats = recover_compaction(spark, d)
    assert stats["moves_replayed"] == 0  # the one move already landed
    assert stats["deletes_replayed"] == 6
    after = spark.read.parquet(d)
    assert after.exceptAll(df).count() == 0 and df.exceptAll(after).count() == 0
    assert not os.path.exists(d + "__compact_manifest.json")
    assert not os.path.exists(d + "__compact_groups")
    # fully compacted: the interrupted plan still completed
    assert len([p for p in os.listdir(d) if p.endswith(".parquet")]) == 1

    # clean-table recovery is a no-op
    assert recover_compaction(spark, d) == {
        "moves_replayed": 0, "deletes_replayed": 0,
    }


def test_execute_compaction_crash_mid_delete_auto_recovers(spark, tmp_path):
    """A crash mid-delete (all moves landed, some originals gone) is
    healed by the NEXT execute_compaction call itself — recovery runs
    before planning, so the rerun plans over a duplicate-free table."""
    import os

    from evidence_images_etl_airflow_spark.operators.maintenance import (
        execute_compaction,
    )

    d = str(tmp_path / "ctbl2")
    df = spark.range(900).select("id", (F.col("id") % 3).alias("v"))
    df.repartition(9).write.parquet(d)

    with pytest.raises(RuntimeError, match="injected crash: after delete"):
        execute_compaction(spark, d, target_bytes=1 << 30,
                           _crash_after_deletes=2)
    mid = spark.read.parquet(d)
    assert df.exceptAll(mid).count() == 0  # nothing lost in the window

    # rerun with no injection: auto-recovery + (no-op) plan
    stats = execute_compaction(spark, d, target_bytes=1 << 30)
    assert stats == {
        "groups_rewritten": 0, "files_removed": 0, "files_added": 0,
    }
    after = spark.read.parquet(d)
    assert after.exceptAll(df).count() == 0 and df.exceptAll(after).count() == 0
    assert not os.path.exists(d + "__compact_manifest.json")
    assert len([p for p in os.listdir(d) if p.endswith(".parquet")]) == 1


def test_recover_compaction_truncated_manifest_is_pre_commit_garbage(
        spark, tmp_path):
    """ADVICE r11 (medium): the manifest write is now atomic (tmp +
    rename), and — defense in depth — an unparseable manifest at the
    final path is treated as pre-commit garbage: deleted, recovery
    no-ops, and the next execute_compaction proceeds instead of
    wedging on JSONDecodeError forever."""
    import os

    from evidence_images_etl_airflow_spark.operators.maintenance import (
        execute_compaction,
        recover_compaction,
    )

    d = str(tmp_path / "ctbl3")
    df = spark.range(300).select("id", (F.col("id") % 4).alias("v"))
    df.repartition(5).write.parquet(d)

    # simulate the old crash window: a truncated JSON at the final path
    with open(d + "__compact_manifest.json", "w") as fh:
        fh.write('{"moves": [{"src": "x", "de')
    # and a stray tmp from a crash mid-atomic-write
    with open(d + "__compact_manifest.json.tmp", "w") as fh:
        fh.write('{"mo')

    stats = recover_compaction(spark, d)
    assert stats == {"moves_replayed": 0, "deletes_replayed": 0}
    assert not os.path.exists(d + "__compact_manifest.json")
    assert not os.path.exists(d + "__compact_manifest.json.tmp")
    # table untouched, and compaction is un-wedged
    assert spark.read.parquet(d).exceptAll(df).count() == 0
    out = execute_compaction(spark, d, target_bytes=1 << 30)
    assert out["groups_rewritten"] == 1
    after = spark.read.parquet(d)
    assert after.exceptAll(df).count() == 0 and df.exceptAll(after).count() == 0


def test_mad_outlier_screen_approx_dial(spark):
    """r11 (VERDICT r10 item 4): approx_accuracy switches both median
    passes to mergeable approx_percentile sketches — the 100 TB mode.
    On the test corpus the sketch at accuracy 10_000 must agree with
    the exact screen EXACTLY (rank error < one rank at this n), and a
    coarse sketch must still land within its documented rank-error
    band."""
    from evidence_images_etl_airflow_spark.operators.quality import (
        mad_outlier_screen,
    )

    # 2001 skewed values + 20 extreme outliers
    vals = [round(10.0 + (i % 400) * 0.05, 2) for i in range(2001)]
    vals += [5000.0 + i for i in range(20)]
    df = spark.createDataFrame([(v,) for v in vals], "price double")

    exact = mad_outlier_screen(df, "price", k=3.0).first()
    tight = mad_outlier_screen(
        df, "price", k=3.0, approx_accuracy=10_000
    ).first()
    assert (tight.median_value, tight.mad_value) == (
        exact.median_value, exact.mad_value,
    )
    assert tight.n_outliers == exact.n_outliers == 20
    assert (tight.lo_cut, tight.hi_cut) == (exact.lo_cut, exact.hi_cut)

    # coarse sketch: rank error <= n/accuracy ranks; the 20 far
    # outliers sit way outside any plausible cutoff drift
    coarse = mad_outlier_screen(
        df, "price", k=3.0, approx_accuracy=100
    ).first()
    n = len(vals)
    rank_err = n / 100  # documented GK bound
    exact_sorted = sorted(vals)
    lo_r = max(0, n // 2 - int(rank_err) - 1)
    hi_r = min(n - 1, n // 2 + int(rank_err) + 1)
    assert exact_sorted[lo_r] <= coarse.median_value <= exact_sorted[hi_r]
    assert coarse.n_outliers == 20

    with pytest.raises(ValueError, match="approx_accuracy"):
        mad_outlier_screen(df, "price", approx_accuracy=0)


def test_maintain_dedup_store_retention_and_compaction(spark, tmp_path):
    """r12 (VERDICT r11 item 6): the epoch-partitioned band store gets
    the same treatment tables get — whole-directory TTL for expired
    epochs (no rewrite) + per-epoch small-file compaction — and the
    store's CONTENT is proven unchanged two ways: recon bucket
    checksums match before/after, and the incremental near-dup gate
    returns identical survivors against the compacted store."""
    import os

    from evidence_images_etl_airflow_spark.operators.dedup import (
        minhash_band_store,
        minhash_lsh_against_store,
    )
    from evidence_images_etl_airflow_spark.operators.maintenance import (
        maintain_dedup_store,
    )
    from evidence_images_etl_airflow_spark.operators.recon import (
        bucket_checksums,
        diff_buckets,
    )

    store = str(tmp_path / "band_store")
    texts = {
        1: [(10, "the quick brown fox jumps over the lazy dog today"),
            (11, "pack my box with five dozen liquor jugs tonight")],
        2: [(20, "sphinx of black quartz judge my vow carefully now"),
            (21, "how vexingly quick daft zebras jump around here")],
        3: [(30, "bright vixens jump dozy fowl quack loudly outside"),
            (31, "two driven jocks help fax my big quiz again soon")],
    }
    for epoch, rows in texts.items():
        batch = spark.createDataFrame(rows, "doc_id long, text string")
        bands = minhash_band_store(batch, "doc_id", "text")
        bands.repartition(3).write.mode("append").parquet(
            f"{store}/epoch={epoch}")

    def _kept():
        return spark.read.parquet(store).filter(F.col("epoch") >= 2)

    def _sums(df):
        return bucket_checksums(
            df, F.col("id"),
            [F.col("id"), F.col("band"), F.col("key")], n_buckets=8)

    before = _sums(_kept()).collect()

    # the incremental gate's verdict against the kept epochs, pre-maintenance
    probe = spark.createDataFrame(
        [(90, texts[2][0][1]),                       # exact dup of doc 20
         (91, "totally novel content about spark engines at scale")],
        "doc_id long, text string")
    surv_before, _ = minhash_lsh_against_store(
        probe, _kept(), "doc_id", "text")
    assert [r.doc_id for r in surv_before.collect()] == [91]

    stats = maintain_dedup_store(
        spark, store, keep_epochs=2, target_bytes=1 << 30)
    assert stats["epochs_dropped"] == [1]
    assert stats["epochs_kept"] == [2, 3]
    assert all(s["groups_rewritten"] == 1 for s in stats["per_epoch"].values())

    # epoch 1 directory is gone entirely; each kept epoch is one file
    assert not os.path.exists(f"{store}/epoch=1")
    for e in (2, 3):
        files = [p for p in os.listdir(f"{store}/epoch={e}")
                 if p.endswith(".parquet")]
        assert len(files) == 1

    after_df = spark.read.parquet(store)
    assert sorted({r.epoch for r in after_df.select("epoch").distinct().collect()}) == [2, 3]
    after = _sums(after_df)
    buckets = diff_buckets(
        spark.createDataFrame(before, after.schema), after).collect()
    assert buckets and all(r.match for r in buckets)

    # identical gate verdict on the compacted store
    surv_after, _ = minhash_lsh_against_store(
        probe, after_df, "doc_id", "text")
    assert [r.doc_id for r in surv_after.collect()] == [91]

    # a second maintenance pass is a no-op
    stats2 = maintain_dedup_store(
        spark, store, keep_epochs=2, target_bytes=1 << 30)
    assert stats2["epochs_dropped"] == []
    assert all(s["groups_rewritten"] == 0 for s in stats2["per_epoch"].values())
