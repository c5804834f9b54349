package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomSketch

/** Pins the per-release Bloom sketch contract the O(delta) nightly audits
  * stand on: zero false negatives across build→serialize→probe (both the
  * distributed `stat.bloomFilter` build and the codegen
  * `graft_bloom_contains` probe hash identically), a usable fp rate, and
  * kilobyte-scale serialized size. */
class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val members: Seq[Long] = (0L until 2000L).map(_ * 7 + 3)
  private lazy val sketch: Array[Byte] =
    BloomSketch.build(members.toDF("cand_id"), "cand_id", members.size.toLong)

  test("no false negatives: every inserted key probes true, driver and executor side") {
    val bf = BloomSketch.deserialize(sketch)
    assert(members.forall(bf.mightContainLong))
    val hits = members.toDF("cand_id")
      .where(BloomSketch.mightContain(col("cand_id"), sketch)).count()
    assert(hits === members.size.toLong)
  }

  test("false positives stay near the configured rate on a disjoint key set") {
    val strangers = (1L to 20000L).map(_ * 7 + 5) // never inserted
    val fp = strangers.toDF("cand_id")
      .where(BloomSketch.mightContain(col("cand_id"), sketch)).count()
    // fpp 0.01, 20k probes -> expect ~200; 5x headroom against hash luck
    assert(fp < 1000, s"false-positive rate degenerate: $fp / 20000")
  }

  test("null value probes to null, not a crash") {
    val out = Seq(Some(members.head), None).toDF("cand_id")
      .select(BloomSketch.mightContain(col("cand_id"), sketch).as("hit"))
      .collect()
    assert(out.map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
      === Seq(true, null))
  }

  test("sketch is kilobyte-scale and an empty build rejects everything") {
    assert(sketch.length < (16 << 10), s"2k-key sketch too large: ${sketch.length}")
    val empty = BloomSketch.build(Seq.empty[Long].toDF("cand_id"), "cand_id", 0L)
    val bf = BloomSketch.deserialize(empty)
    assert(members.forall(v => !bf.mightContainLong(v)))
  }

  test("probe stays inside whole-stage codegen (no fallback kicking the stage out)") {
    // a range source, not a local relation — ConvertToLocalRelation would
    // fold the probe at plan time and leave nothing to codegen
    val df = spark.range(0, 2000)
      .select(BloomSketch.mightContain(col("id") * 7 + 3, sketch).as("hit"))
    val codegenned = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenned.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.where(col("hit")).count() === 2000L)
  }
}
