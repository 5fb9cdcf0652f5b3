"""Lake layout utilities: the write-side half of scale performance.

SCALE.md claims two layout facts this module makes executable:

1. **Bucketing eliminates the fact-fact join shuffle.**  Writing both
   join sides bucketed by the join key (same bucket count) lets Spark
   plan a SortMergeJoin with NO Exchange on either side — at 100 TB
   the difference between re-shuffling the lake per query and reading
   co-located buckets.
2. **Date partitioning prunes scans.**  ``partitionBy(event_date)``
   turns time-range predicates into directory pruning
   (PartitionFilters in the scan node): a day query touches 1/365th
   of the data before a single row is read.

Both are asserted by plan inspection in ``tests/test_layout.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from edinet_etl_spark.tables import load

N_BUCKETS = 8


def write_bucketed_join_tables(
    spark: SparkSession, sf_dir: str, out_dir: str, db: str = "lake"
) -> None:
    """Write lineitem+orders bucketed by the join key as *external*
    tables under ``out_dir`` (bucketing metadata needs the catalog;
    an explicit path keeps the data out of the static warehouse
    dir)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        (
            load(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", f"{out_dir}/{name}_bucketed")
            .format("parquet")
            .saveAsTable(f"{db}.{name}_bucketed")
        )


def bucketed_join(spark: SparkSession, db: str = "lake") -> DataFrame:
    """Fact-fact join over the bucketed tables — must plan with zero
    Exchange operators (bucket co-location replaces the shuffle)."""
    li = spark.table(f"{db}.lineitem_bucketed")
    od = spark.table(f"{db}.orders_bucketed")
    return li.join(od, li.l_orderkey == od.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count("*").alias("n"))


def write_date_partitioned_events(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> None:
    """events → parquet partitioned by event_date (the lake layout for
    any time-series fact at scale)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.mode("overwrite").partitionBy("event_date").parquet(out_dir)


def overwrite_one_day(
    spark: SparkSession, out_dir: str, day_df: DataFrame
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``day_df``, leaving every other date directory untouched — the
    idempotent daily-backfill primitive (static overwrite mode would
    truncate the WHOLE table first; at a 100 TB lake that difference is
    the job).  The mode switch is per-write via the session conf; we
    restore the previous value so hostile sessions stay unsurprised."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        day_df.write.mode("overwrite").partitionBy("event_date").parquet(out_dir)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_one_day(spark: SparkSession, out_dir: str, day: str) -> DataFrame:
    """A one-day slice; the date predicate must appear as a
    PartitionFilter (directory pruning), not a data filter."""
    return spark.read.parquet(out_dir).filter(F.col("event_date") == day)


def compact(spark: SparkSession, in_dir: str, out_dir: str,
            target_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-files compaction: rewrite a directory into
    ceil(total/target) files (the companion maintenance job every lake
    needs — thousands of tiny files turn scan planning and shuffle
    fetch into metadata storms).  Returns the output file count.

    Uses one wide repartition; at real scale you run this per
    partition directory so the rewrite itself parallelizes and can be
    incremental."""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, files in os.walk(in_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(in_dir).repartition(n).write.mode("overwrite").parquet(
        out_dir
    )
    return sum(
        1
        for _, _, files in os.walk(out_dir)
        for f in files
        if f.endswith(".parquet")
    )


ZORDER_BITS = 16


def zorder_value(a, b, bits: int = ZORDER_BITS):
    """2-D Morton (Z-order) code: interleave the low ``bits`` bits of
    two non-negative int columns — bit i of ``a`` lands at 2i, bit i of
    ``b`` at 2i+1.  Sorting by this value clusters rows that are close
    in BOTH dimensions, so per-file (and per-row-group) min/max ranges
    stay tight in both — the multi-dimensional generalization of sort-
    by-one-key data skipping (Delta/Iceberg OPTIMIZE ZORDER does the
    same thing).  Pure codegen bit expressions, no Python."""
    z = None
    for i in range(bits):
        pa = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)).cast("bigint"), 2 * i)
        pb = F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("bigint"), 2 * i + 1
        )
        zi = pa.bitwiseOR(pb)
        z = zi if z is None else z.bitwiseOR(zi)
    return z


def sql_zorder_value(a_expr: str, b_expr: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB mirror of :func:`zorder_value` (same bit algebra)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({a_expr} >> {i}) & 1)::BIGINT << {2 * i})")
        parts.append(f"((({b_expr} >> {i}) & 1)::BIGINT << {2 * i + 1})")
    return " | ".join(parts)


ZORDER_DIM_BITS = 8


def write_zordered_orders(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 16
) -> None:
    """orders laid out along the (o_custkey, order-day) Z-curve in
    ``n_files`` range-partitioned files.  Every file then covers a
    compact rectangle-ish region of the (customer, date) plane, so a
    2-D predicate prunes most files via footer min/max — where a
    single-key sort prunes only its own dimension.

    Both dimensions are min/max-normalized to ``ZORDER_DIM_BITS``-bit
    grid coordinates before interleaving — raw interleave would let
    the wider-domain dimension own the code's high bits and collapse
    the curve back into a single-key sort.  (Lakehouse OPTIMIZE
    ZORDER does the same via range-partition IDs per dimension.)  The
    one-row domain-stats aggregate is the standard write-time prep
    pass and is collected once, not per row."""
    od = load(spark, sf_dir, "orders").withColumn(
        "o_day",
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).cast(
            "bigint"
        ),
    )
    lo_k, hi_k, lo_d, hi_d = od.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("o_day"), F.max("o_day")
    ).collect()[0]
    grid = (1 << ZORDER_DIM_BITS) - 1

    def norm(c, lo, hi):
        span = max(int(hi) - int(lo), 1)
        return F.least(
            F.lit(grid).cast("bigint"),
            ((c - F.lit(int(lo))) * grid / span).cast("bigint"),
        )

    od = od.withColumn(
        "zval",
        zorder_value(
            norm(F.col("o_custkey").cast("bigint"), lo_k, hi_k),
            norm(F.col("o_day"), lo_d, hi_d),
            bits=ZORDER_DIM_BITS,
        ),
    ).drop("o_day")
    (
        od.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def write_keysorted_orders(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 16
) -> None:
    """The single-dimension baseline: same file count, range-laid-out
    by o_custkey alone (perfect custkey pruning, no date pruning)."""
    od = load(spark, sf_dir, "orders")
    (
        od.repartitionByRange(n_files, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def files_overlapping_rectangle(
    out_dir: str,
    custkey_range: tuple[int, int],
    date_range: tuple[str, str],
) -> tuple[int, int]:
    """(overlapping, total) file counts for a 2-D rectangle predicate,
    decided purely from parquet footer min/max — exactly the stats a
    scan's file/row-group skipping consults."""
    import datetime
    import os

    import pyarrow.parquet as pq

    lo_k, hi_k = custkey_range
    lo_d = datetime.date.fromisoformat(date_range[0])
    hi_d = datetime.date.fromisoformat(date_range[1])

    def _day(v):
        # parquet stats surface DATE as date or datetime depending on
        # the writer's physical type — normalize to date
        return v.date() if isinstance(v, datetime.datetime) else v
    total = overlap = 0
    for r, _, files in os.walk(out_dir):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            total += 1
            md = pq.read_metadata(os.path.join(r, f))
            kmin = kmax = dmin = dmax = None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    st = col.statistics
                    if st is None:
                        continue
                    if name == "o_custkey":
                        kmin = st.min if kmin is None else min(kmin, st.min)
                        kmax = st.max if kmax is None else max(kmax, st.max)
                    elif name == "o_orderdate":
                        mn, mx = _day(st.min), _day(st.max)
                        dmin = mn if dmin is None else min(dmin, mn)
                        dmax = mx if dmax is None else max(dmax, mx)
            if kmin is None or dmin is None:
                overlap += 1  # no stats → can't skip
            elif kmax >= lo_k and kmin <= hi_k and dmax >= lo_d and dmin <= hi_d:
                overlap += 1
    return overlap, total


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Snapshot upsert without a table format: updates win on key
    collision, unmatched base rows survive — ``updates ∪ (base ⟕̸
    updates)``.  This is the MERGE INTO emulation for plain parquet
    lakes (Delta/Iceberg do the same reconciliation inside commit);
    the anti join is a hash join on the key, so cost is one shuffle of
    each side, and writing the result partitioned by date yields an
    incremental snapshot."""
    return updates.unionByName(base.join(updates, key, "left_anti"))


def roundtrip_format(
    df: DataFrame, out_dir: str, fmt: str, schema: str | None = None
) -> DataFrame:
    """Write ``df`` in ``fmt`` (orc/json/csv/parquet) and read it back
    with the declared schema — the format-interchange surface.

    Schema discipline per tables.py: self-describing formats
    (parquet/ORC) carry their types; text formats (JSON lines, CSV) do
    NOT round-trip types implicitly, so reads take the explicit schema
    — at lake scale, schema-on-read inference over text is both a
    correctness bug (silent type drift) and a full extra pass over the
    data (Spark samples files to infer).
    """
    spark = df.sparkSession
    df.write.mode("overwrite").format(fmt).save(out_dir)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(out_dir)


def scd2_merge(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_date: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2 merge: apply ``updates`` to a
    versioned dimension, closing the current version of changed keys
    (valid_to = effective date) and appending the new open version.

    ``base`` carries (key, tracked..., valid_from, valid_to,
    is_current); ``updates`` carries (key, tracked...).  An update is a
    REAL change only if some tracked attribute differs from the
    current version — no-op updates produce no new version (the
    standard idempotency guard).

    Plan: current ∥ updates equi-join on the key (one co-partitioned
    shuffle pair, or broadcast when the delta is small), a row-compare
    to split changed/unchanged, then a unionByName of: history
    (untouched), closed-out old versions, new open versions for
    changed keys, and first-ever open versions for keys the dimension
    has never seen (the standard SCD2 insert path).  At lake scale
    this is the same shape as ``merge_upsert`` — one pass over the
    dimension, delta-sized extra I/O — and the output is
    re-partitionable by key for the next merge."""
    if not tracked:
        raise ValueError("scd2_merge needs at least one tracked attribute")
    changed_cond = None
    for c in tracked:
        diff = ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
        changed_cond = diff if changed_cond is None else (changed_cond | diff)
    cur = base.filter(F.col("is_current")).alias("cur")
    upd = updates.alias("upd")
    matched = cur.join(upd, F.col(f"cur.{key}") == F.col(f"upd.{key}"))
    changed_keys = matched.filter(changed_cond).select(
        F.col(f"cur.{key}").alias("chg_key")
    )
    closed = (
        base.filter(F.col("is_current"))
        .join(changed_keys, F.col(key) == F.col("chg_key"), "left_semi")
        .withColumn("valid_to", F.lit(effective_date).cast("date"))
        .withColumn("is_current", F.lit(False))
    )
    def _open(rows: DataFrame) -> DataFrame:
        return (
            rows.withColumn("valid_from", F.lit(effective_date).cast("date"))
            .withColumn("valid_to", F.lit(None).cast("date"))
            .withColumn("is_current", F.lit(True))
        )

    fresh = _open(
        updates.join(changed_keys, F.col(key) == F.col("chg_key"), "left_semi")
    )
    # keys with NO current version at all insert as first open versions
    # (an earlier revision semi-joined fresh to changed_keys only, so a
    # brand-new key silently vanished from the merged dimension)
    brand_new = _open(
        updates.join(
            base.filter(F.col("is_current")).select(key), key, "left_anti"
        )
    )
    untouched = base.join(changed_keys, F.col(key) == F.col("chg_key"), "left_anti")
    return (
        untouched.unionByName(closed)
        .unionByName(fresh.select(*untouched.columns))
        .unionByName(brand_new.select(*untouched.columns))
    )


def apply_changes(
    base: DataFrame, changes: DataFrame, key: str, order_by: list[str]
) -> DataFrame:
    """CDC APPLY CHANGES INTO emulation (the Delta Live Tables /
    Debezium-sink semantic): ``changes`` carries (key, op ∈ {I,U,D},
    payload…, sequence cols); conflicts resolve LAST-WRITER-WINS by
    ``order_by``; the final state is base rows with no change ∪ the
    latest change row per key when that op isn't a delete — a key
    whose last op is 'D' disappears, and an insert after a delete
    resurrects it naturally (it's just the later row).

    The upsert-only special case is `merge_upsert`; this adds ordered
    conflict resolution and tombstones.  Plan: one window shuffle on
    the changelog key (delta-sized, not snapshot-sized), one anti join
    against the snapshot — the same cost law a table format's MERGE
    pays, with the changelog side small by construction."""
    w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in order_by])
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", *order_by)
    )
    survivors = latest.filter(F.col("op") != "D").drop("op")
    untouched = base.join(latest.select(key), key, "left_anti")
    return untouched.unionByName(survivors)
