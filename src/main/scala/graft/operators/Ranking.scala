package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-safe ranking: global sequence ids and within-group ranks
  * WITHOUT `row_number() OVER (...)` windows.
  *
  * A global window serializes the corpus through one task; a window
  * partitioned by a low-cardinality group (5 market segments, 20
  * sources) sends terabytes through a handful of tasks at 100 TB. The
  * two-pass shape here (same idiom as IndexingQueries.q167) instead
  * range-repartitions on the sort key — a total order across the
  * partition INDEX — sorts within partitions, and derives ids as
  * `partition offset + local ordinal`: the only driver traffic is one
  * row-count per partition. Ids are a pure function of the total
  * order, so they are deterministic regardless of where the sampled
  * range boundaries land.
  *
  * Unlike the classic `rdd.zipWithIndex` route, everything stays in
  * Tungsten: the local ordinal is the low 33 bits of
  * `monotonically_increasing_id()` evaluated over the sorted,
  * checkpointed partitions (codegen'd counter in row order), and the
  * offset lookup is a ≤`parts`-entry map literal — no RDD round-trip
  * deserializing every row.
  */
object Ranking {

  private val OrdinalMask = (1L << 33) - 1 // mono_id = pid << 33 | ordinal

  /** Append a global 1-based `seq_id` along `order`. `order` MUST be a
    * total order (include a unique tie-break column) — equal sort keys
    * would otherwise take arbitrary ids. */
  def seqIds(df: DataFrame, partsFloor: Int, order: Column*): DataFrame = {
    // r19 (guide §2.5): `partsFloor` is a FLOOR, not the count — the
    // range-partition width scales with the session's parallelism so a
    // call site tuned on a small master never serializes a cluster
    // through 8 range partitions (ids are a pure function of the total
    // order, so the count is free to vary; outputs are identical).
    val parts = math.max(partsFloor,
      df.sparkSession.sparkContext.defaultParallelism)
    // localCheckpoint: the counts job and the output job must see the
    // SAME materialized partitions (and skip re-running the range
    // shuffle + sort once per job).
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .transform(graft.Fx.materialize)
    val withPid = sorted.select(col("*"),
      spark_partition_id().as("__pid"),
      monotonically_increasing_id().as("__mid"))
    val counts = withPid.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // mono_id keeps the ordinal in the low 33 bits — a partition at
    // 2^33 rows would wrap it silently. The counts are already on the
    // driver, so the guard is free; raise `parts` to stay under it.
    counts.values.foreach(c => require(c < OrdinalMask + 1,
      s"seqIds: a partition holds $c rows (>= 2^33); increase parts"))
    val offsets = (0 until parts).scanLeft(0L)((acc, p) =>
      acc + counts.getOrElse(p, 0L))
    val offsetMap = map((0 until parts).flatMap(p =>
      Seq(lit(p), lit(offsets(p)))): _*)
    withPid
      .withColumn("seq_id",
        element_at(offsetMap, col("__pid")) +
          col("__mid").bitwiseAND(OrdinalMask) + 1L)
      .drop("__pid", "__mid")
  }

  /** Append a 1-based `rank` within each `groupCols` class along
    * `innerOrder` (which must totally order rows WITHIN a group).
    * Groups are forced contiguous by prefixing them to the global sort
    * key, so `rank = seq_id − min(seq_id of group) + 1`; the per-group
    * minima are a bounded aggregate (one row per group) broadcast back
    * onto the ids. Contract: the group domain is bounded (segments,
    * sources, languages) — it rides a broadcast join. */
  def groupRanks(df: DataFrame, groupCols: Seq[String], parts: Int,
      innerOrder: Column*): DataFrame = {
    val order = groupCols.map(col) ++ innerOrder
    val ids = seqIds(df, parts, order: _*)
    // Null-safe (<=>) join back: groupBy keeps a null group as its own
    // class, and a plain equi-join would silently DROP its rows —
    // row_number over a window ranks null groups, so must we.
    val mins = ids.groupBy(groupCols.map(col): _*)
      .agg(min(col("seq_id")).as("__g0"))
      .select(groupCols.map(c => col(c).as(s"__gk_$c")) :+ col("__g0"): _*)
    val cond = groupCols.map(c => ids(c) <=> col(s"__gk_$c")).reduce(_ && _)
    ids.join(broadcast(mins), cond)
      .withColumn("rank", col("seq_id") - col("__g0") + 1L)
      .drop(groupCols.map(c => s"__gk_$c") :+ "__g0" :+ "seq_id": _*)
  }

  /** Append `run_before`: the EXCLUSIVE running sum of integer column
    * `valueCol` within each `groupCols` class along `innerOrder`
    * (which must totally order rows within a group) — the distributed
    * prefix sum behind sequence packing and sweep lines, without a
    * group-partitioned window over the raw relation (low-cardinality
    * groups would each serialize through one task).
    *
    * Two-phase scan, same skeleton as [[seqIds]]: range-repartition on
    * (group, order) and sort within partitions; each partition's
    * in-partition exclusive prefix computes under a
    * (partition-id, group) window — cells bounded by partition size,
    * parallel across partitions; the carry-in of a (partition, group)
    * cell is the group's total over PRIOR partitions — an aggregate of
    * ≤ parts × groups rows combined under a bounded-domain window and
    * broadcast back. Null groups are preserved (null-safe join). */
  def groupRunningSum(df: DataFrame, groupCols: Seq[String], partsFloor: Int,
      valueCol: String, innerOrder: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r19: floor semantics, same rationale as [[seqIds]]
    val parts = math.max(partsFloor,
      df.sparkSession.sparkContext.defaultParallelism)
    val order = groupCols.map(col) ++ innerOrder
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .transform(graft.Fx.materialize)
    val withPid = sorted.withColumn("__pid", spark_partition_id())
    val wLocal = Window
      .partitionBy(col("__pid") +: groupCols.map(col): _*)
      .orderBy(innerOrder: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = withPid.withColumn("__local",
      coalesce(sum(col(valueCol)).over(wLocal), lit(0L)))
    val totals = withPid
      .groupBy(col("__pid") +: groupCols.map(col): _*)
      .agg(sum(col(valueCol)).as("__tot"))
    val wCarry = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = totals
      .withColumn("__carry", coalesce(sum(col("__tot")).over(wCarry), lit(0L)))
      .select(col("__pid").as("__cpid") +:
        groupCols.map(c => col(c).as(s"__ck_$c")) :+ col("__carry"): _*)
    val cond = (local("__pid") === carries("__cpid")) +:
      groupCols.map(c => local(c) <=> carries(s"__ck_$c"))
    local.join(broadcast(carries), cond.reduce(_ && _))
      .withColumn("run_before", col("__carry") + col("__local"))
      .drop(groupCols.map(c => s"__ck_$c") :+
        "__pid" :+ "__local" :+ "__cpid" :+ "__carry": _*)
  }

  /** Largest group a plain `row_number() OVER (PARTITION BY …)` window
    * should be asked to sort in one task. The ScaleSmoke `rank` sweep
    * measured the window form WINNING up to ~15 M rows spread over 8
    * groups (single shuffle, trivial per-task sorts) and the two-phase
    * form flat; 8 M rows per GROUP keeps the window's single-task sort
    * well inside executor memory with margin for wide rows. */
  val WindowMaxGroupRows: Long = 8L * 1000 * 1000

  /** Exact max rows-per-group — the q207 profiler's `max_freq` column
    * for this grouping. One aggregate job (map-side partial combine,
    * shuffle of one row per group), the input to [[groupRanksAuto]]'s
    * strategy choice. */
  def profileMaxGroupRows(df: DataFrame, groupCols: Seq[String]): Long = {
    val r = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c")))
      .head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** [[groupRanks]] with the window-vs-two-phase choice made FROM THE
    * DATA instead of by the caller: profile max rows-per-group (q207's
    * `max_freq`; pass `profiledMaxGroupRows` to reuse an existing
    * profile and skip the scan) and
    *  - every group sorts comfortably in one task → the plain
    *    `row_number` window (single shuffle, no checkpoint/counts
    *    overhead — the regime where ScaleSmoke measured it 2–4×
    *    cheaper);
    *  - some group exceeds `maxGroupRowsForWindow` → the two-phase
    *    range-partitioned form, whose per-group state is one offset no
    *    matter how large the group.
    * Output schema and values are identical either way (`rank` as
    * long; `innerOrder` must totally order rows within a group). */
  def groupRanksAuto(df: DataFrame, groupCols: Seq[String], parts: Int,
      innerOrder: Seq[Column],
      maxGroupRowsForWindow: Long = WindowMaxGroupRows,
      profiledMaxGroupRows: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxFreq = profiledMaxGroupRows
      .getOrElse(profileMaxGroupRows(df, groupCols))
    if (maxFreq <= maxGroupRowsForWindow) {
      val w = Window.partitionBy(groupCols.map(col): _*)
        .orderBy(innerOrder: _*)
      df.withColumn("rank", row_number().over(w).cast("long"))
    } else groupRanks(df, groupCols, parts, innerOrder: _*)
  }
}
