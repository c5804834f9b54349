package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integrity card for a release-partitioned store — the nightly health
  * check a 100 TB store fleet runs after every append/vacuum/compact
  * (q207), and the gate [[VectorRelease.maintain]] /
  * [[ReleaseBuild.rollForwardOnDisk]] assert before declaring a night
  * done (the reference's nightly post-deploy check counts every release's
  * rows the same way, `db_etl_update_db/update.py:24-38`). One row per
  * release with the row/id counts and three invariants:
  *
  *   - `cross_release_dup`: ids stored under MORE THAN ONE release
  *     partition. The gram store's novel-margin layout stores each gram
  *     under exactly one release ([[GramStore.append]]) and a vector's
  *     code row lives in exactly one release ([[IndexStore.append]]), so
  *     for those tiers any non-zero is corruption. The SIGNATURE store's
  *     contract ("a document signs once per release it was retained in")
  *     legitimately allows an id under several releases when release
  *     slices overlap (a re-crawled document whose content changed) — set
  *     `dupInvariant = false` there unless the deployment's slices are
  *     known disjoint (the q207 fixture's are).
  *   - `orphan`: stored ids absent from the id universe the store claims
  *     to index (the corpus table, or the corpus gram set). When the
  *     universe carries a `release` column the membership is checked per
  *     (id, release) pair — which is exactly a ROW-PARITY audit when the
  *     universe is another tier of the same store (the int8 rerank tier
  *     audited against the code table: `orphan` = rerank rows the code
  *     table lacks, `missing` = code rows the rerank tier lost — a torn
  *     purge that rewrote one tier but crashed before the other).
  *   - `missing`: the coverage direction — universe ids the store does
  *     NOT hold (a lost append). Per release when the universe carries a
  *     `release` column (coverage is contractual per release: every
  *     retained doc signs, every corpus vector has a code row); store-wide
  *     on a synthetic `(store)` row otherwise (a gram's release is
  *     whichever introduced it, so only whole-store coverage is
  *     meaningful there).
  *
  * Any non-zero is a corrupted store — a torn append, a partial vacuum,
  * an overlapping re-append — caught before it skews dedup margins or
  * serving answers. Scale shape: one store-sized groupBy (map-side
  * combined), one id-keyed duplicate check, one anti-join per direction
  * against the universe — all keyed shuffles on the id, never
  * corpus-text-sized. */
object StoreAudit {

  val StoreRow = "(store)"

  def card(tier: String, store: DataFrame, idCol: String,
           universe: DataFrame, dupInvariant: Boolean = true): DataFrame = {
    val hasRel = universe.columns.contains("release")
    // ONE keyed pass over the store yields every store-side input: the
    // distinct (id, release) set (the old `idRel`), per-release row/id
    // counts (the old second store scan with its countDistinct expand),
    // and the dup check's base — so the store is scanned and shuffled
    // once, not twice, per card. Count semantics: n_rows counts every row
    // (null ids included); n_ids counts DISTINCT ids whose CAST TO LONG is
    // non-null — for the current all-long id tiers that is countDistinct
    // of the raw column, but an id a long cast nulls out (e.g. a
    // string-keyed tier) would not count; audit such a tier on its raw
    // key column instead.
    val idRelCnt = store.select(col(idCol).cast("long").as("__id"),
        col("release").cast("string").as("release"))
      .groupBy(col("__id"), col("release")).agg(count(lit(1)).as("__nr"))
    val idRel = idRelCnt.select(col("__id"), col("release"))
    val dup =
      if (dupInvariant) {
        val dupIds = idRel.groupBy("__id")
          .agg(count(lit(1)).as("__n")).where(col("__n") > 1).select("__id")
        idRel.join(dupIds, Seq("__id"), "left_semi")
          .groupBy("release").agg(count(lit(1)).as("cross_release_dup"))
      } else idRel.limit(0)
        .groupBy("release").agg(count(lit(1)).as("cross_release_dup"))
    val uniIdCol = universe.columns.filterNot(_ == "release").head
    val uni =
      if (hasRel) universe.select(col(uniIdCol).cast("long").as("__id"),
        col("release").cast("string").as("release")).distinct()
      else universe.select(col(uniIdCol).cast("long").as("__id")).distinct()
    val joinKeys = if (hasRel) Seq("__id", "release") else Seq("__id")
    // ONE full-outer join + ONE release-keyed aggregation yield the
    // per-release row/id counts AND both invariant directions (previously
    // three separate aggregates and a releases-dimension union): matched
    // rows carry the store counts, store-side-unmatched rows are orphans,
    // universe-side-unmatched rows are missing — same counts as the old
    // anti-join pair because the join is per (id, release) with a
    // release-keyed universe, and with an id-only universe the unique-id
    // universe side never duplicates store rows. The release dimension is
    // covered by construction (a release present on either side groups
    // here).
    val both = idRelCnt.withColumn("__s", lit(1))
      .join(uni.withColumn("__u", lit(1)), joinKeys, "full_outer")
    val agg = both.groupBy(col("release"))
      .agg(coalesce(sum(when(col("__s") === 1, col("__nr"))), lit(0L))
          .as("n_rows"),
        count(when(col("__s") === 1 && col("__id").isNotNull, lit(1)))
          .as("n_ids"),
        count(when(col("__u").isNull, lit(1))).as("orphan"),
        count(when(col("__s").isNull, lit(1))).as("__miss"))
    // with an id-only universe, `missing` is store-wide on the synthetic
    // (store) row — the universe-unmatched rows grouped under the null
    // release (these stores never write null release partitions; an
    // id-only universe row has no release at all), re-homed to StoreRow;
    // the row appears even with zero missing, as before
    val basis =
      if (hasRel) agg.withColumn("missing", col("__miss")).drop("__miss")
      else {
        val perRel = agg.where(col("release").isNotNull)
          .select(col("release"), col("n_rows"), col("n_ids"),
            col("orphan"), lit(0L).as("missing"))
        val storeRow = agg.agg(
            coalesce(sum(when(col("release").isNull, col("__miss"))), lit(0L))
              .as("missing"))
          .select(lit(StoreRow).as("release"), lit(0L).as("n_rows"),
            lit(0L).as("n_ids"), lit(0L).as("orphan"), col("missing"))
        perRel.unionByName(storeRow)
      }
    basis.join(dup, Seq("release"), "left")
      .na.fill(0L, Seq("n_rows", "n_ids", "cross_release_dup", "orphan",
        "missing"))
      .select(lit(tier).as("tier"), col("release"), col("n_rows"),
        col("n_ids"), col("cross_release_dup"), col("orphan"),
        col("missing"))
  }

  /** The tombstone-list row of an [[IndexStore]]'s card — the takedown
    * BACKLOG (ids tombstoned, not yet purged) in the card's schema, on the
    * store-wide row: a growing backlog is the operational signal to
    * schedule a purge (the list broadcasts on every serve). No invariant
    * column can trip here — any id may legitimately be tombstoned,
    * including never-resident and re-ingested ones (the block outlives
    * re-ingestion by design) — but producing the row READS the list, so a
    * corrupted tombstone directory fails the audit loudly
    * ([[IndexStore.readTombstones]]'s fail-closed contract); the
    * tier-divergence corruption a torn purge leaves is what the code↔int8
    * parity card catches. */
  def tombstones(spark: org.apache.spark.sql.SparkSession,
                 indexPath: String): DataFrame = {
    val n = IndexStore.readTombstones(spark, indexPath)
      .map(_.count()).getOrElse(0L)
    import spark.implicits._
    Seq(("tombstones", StoreRow, n, n, 0L, 0L, 0L))
      .toDF("tier", "release", "n_rows", "n_ids", "cross_release_dup",
        "orphan", "missing")
  }

  /** A store's AUDIT CLOCK — (nights run, night of the last deep audit),
    * the persisted state behind the `deepAuditEvery` cadence of
    * [[VectorRelease.maintain]] and [[ReleaseBuild.rollForwardOnDisk]].
    * Before round 14 "the full card stays on q207's scheduled cadence"
    * was a CONVENTION — nothing in the engine ran it, so the
    * release-bounded gate split's safety depended on an operator
    * remembering to. The clock mechanizes it: the nightly bumps `nights`
    * after every night whose gates all passed, stamps `lastDeep` whenever
    * a full card ran, and escalates to the full card when the gap reaches
    * the dial; an ABORTED night never advances the clock, so a due deep
    * audit re-arms until the corruption is repaired. One tiny
    * whitespace-separated text file at `path` (the caller picks a
    * location that survives that store's maintenance rewrites); a store
    * without the file reads (0, 0). */
  def readAuditClock(spark: org.apache.spark.sql.SparkSession,
                     path: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$AuditClockFile")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) (0L, 0L)
    else {
      val in = fs.open(p)
      val parts =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.split("\\s+")
        finally in.close()
      (parts(0).toLong, parts(1).toLong)
    }
  }

  private[pipeline] def writeAuditClock(
      spark: org.apache.spark.sql.SparkSession, path: String,
      nights: Long, lastDeep: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$AuditClockFile")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"$nights $lastDeep"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private val AuditClockFile = "_auditclock"

  /** Assert a card's invariant columns are all zero, failing LOUDLY with
    * the offending rows in the message — the nightly-gate verb
    * ([[VectorRelease.maintain]] / [[ReleaseBuild.rollForwardOnDisk]] end
    * with this so a night that corrupts its own store aborts instead of
    * reporting success; the store stays recoverable because every
    * mutation it guards is partition-idempotent). Cards are
    * release-list-sized (kilobytes per release), so the collect is
    * bounded driver state, the k-means-centroid idiom. */
  def assertZero(card: DataFrame, invariants: Seq[String],
                 context: String): Unit =
    assertZeroAll(Seq((card, invariants, context)))

  /** [[assertZero]] over SEVERAL cards in ONE Spark job: each card keeps
    * its own invariant set and context (the violation row carries the
    * context it tripped, so abort messages are unchanged per fault), but
    * the violation probes union into a single collect — a nightly gate
    * that runs two or three cards pays one driver round-trip instead of
    * one per card. */
  def assertZeroAll(checks: Seq[(DataFrame, Seq[String], String)]): Unit = {
    val cols7 = Seq("tier", "release", "n_rows", "n_ids",
      "cross_release_dup", "orphan", "missing")
    val bad = checks.map { case (card, invariants, context) =>
      card.where(invariants.map(c => col(c) > 0).reduce(_ || _))
        .select(lit(context).as("__ctx") +: cols7.map(col): _*)
    }.reduce(_ unionByName _).collect()
    if (bad.nonEmpty)
      throw new IllegalStateException(
        bad.map(r => s"store integrity audit failed (${r.getString(0)}): " +
            s"[${r.toSeq.drop(1).mkString(",")}]")
          .mkString("; "))
  }
}
