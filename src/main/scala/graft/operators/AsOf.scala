package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward temporal) join — an operator Spark lacks natively.
  *
  * For every left row `(keys, leftTime)`, attaches the single right row with
  * the greatest `rightTime <= leftTime` for the same keys (DuckDB/kdb `ASOF
  * JOIN` semantics; pandas `merge_asof(direction="backward")`).
  *
  * Scale design: NOT a range join (whose candidate set explodes with key
  * cardinality × time density) and not a per-key collect. Both sides are
  * tagged and unioned, then a single window pass over
  * `(keys) ORDER BY (time, rightFirst)` carries the latest right payload
  * forward onto each left row. One hash shuffle on `keys`, one sort — the
  * same cost as any keyed window, regardless of how dense the right side is.
  * The right payload travels as ONE struct so all its fields come from the
  * same matched row (per-column fills could mix rows when right values are
  * null).
  */
object AsOf {

  /** Bounded interval join: all (left, right) pairs with the same keys and
    * `0 <= leftTime - rightTime <= maxGapSeconds` (right event precedes left
    * within the gap).
    *
    * Scale design: NOT an inequality join (which Spark plans as a cross
    * product per key). Both sides are bucketized into `maxGapSeconds`-wide
    * epochs; the left side probes its own bucket and the previous one (any
    * in-gap pair lands in one of the two), so this is a plain equi-join on
    * (keys, bucket) — hash shuffle, candidates bounded by bucket co-residents
    * — followed by the exact interval filter. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   maxGapSeconds: Long): DataFrame = {
    // gap <= 0 would divide by zero below: with ANSI off __bucket goes null on
    // both sides and the join silently matches nothing.
    require(maxGapSeconds > 0, s"maxGapSeconds must be positive, got $maxGapSeconds")
    // Times are staged as internal second-columns BEFORE the join so the gap
    // filter never references a possibly-ambiguous shared column name
    // (leftTime and rightTime may be spelled the same on both sides).
    // Comparison is at whole-second precision (unix_timestamp floors).
    val l = left
      .withColumn("__lsec", unix_timestamp(col(leftTime)))
      .withColumn("__bucket", explode(array(
        floor(col("__lsec") / maxGapSeconds), floor(col("__lsec") / maxGapSeconds) - 1)))
    val r = right
      .withColumn("__rsec", unix_timestamp(col(rightTime)))
      .withColumn("__bucket", floor(col("__rsec") / maxGapSeconds))
    l.join(r, keys :+ "__bucket")
      .where(col("__lsec") - col("__rsec") >= 0 &&
        col("__lsec") - col("__rsec") <= maxGapSeconds)
      .drop("__bucket", "__lsec", "__rsec")
  }

  /** @param keys       equi-join key columns (present on both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right` (may share the name)
    * @param valueCols  right columns to attach; emitted under their own names
    * @param matchedTimeCol if nonempty, also emit the matched right row's time
    *
    * Precondition: `right` must be unique on (keys, rightTime) — with
    * duplicate right rows at the same instant the tie-break is partition-
    * layout-dependent and the attached payload is nondeterministic.
    * Pre-aggregate the right side (as q78 does) to pick a canonical row.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String, valueCols: Seq[String],
                   matchedTimeCol: String = ""): DataFrame = {
    val leftCols = left.columns.toSeq
    // Attached columns are emitted under their own names; a collision with an
    // existing left column — or among themselves — would produce an
    // ambiguous-column frame that only fails at the caller's next reference.
    // Fail here instead.
    val attached = (valueCols :+ matchedTimeCol).filter(_.nonEmpty)
    val collisions = attached.filter(leftCols.contains)
    require(collisions.isEmpty,
      s"asofBackward output columns ${collisions.mkString(", ")} collide with " +
        "left columns; rename them on the right side first")
    require(attached.distinct.length == attached.length,
      s"asofBackward attached columns contain duplicates: ${attached.mkString(", ")}")
    val payloadType = {
      val fields = (rightTime +: valueCols).map(c => right.schema(c))
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__rt", fields.head.dataType) +:
          valueCols.zip(fields.tail).map { case (c, f) =>
            org.apache.spark.sql.types.StructField(c, f.dataType, nullable = true) })
    }
    val l = left
      .withColumn("__t", col(leftTime)).withColumn("__isR", lit(0))
      .withColumn("__payload", lit(null).cast(payloadType))
    val r = right
      .select(keys.map(col) :+ col(rightTime).as("__t") :+
        struct(col(rightTime).as("__rt") +: valueCols.map(col): _*).as("__payload"): _*)
      .withColumn("__isR", lit(1))
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__t"), col("__isR"), col("__payload")): _*)
    // At equal times the right row sorts first so `<=` matches (asof is
    // inclusive); last(ignoreNulls) then carries the newest payload forward.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = l.unionByName(r)
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__isR") === 0)
    val out = leftCols.map(col) ++
      valueCols.map(c => col("__m").getField(c).as(c)) ++
      (if (matchedTimeCol.nonEmpty) Seq(col("__m").getField("__rt").as(matchedTimeCol))
       else Nil)
    filled.select(out: _*)
  }
}
