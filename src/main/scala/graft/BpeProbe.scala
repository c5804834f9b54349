package graft

import org.apache.spark.sql.functions._

/** One-off probe for the driver-local BPE merge path at REALISTIC merge
  * counts (the 10³–10⁵ claim): the fixture corpus has a ~30-word
  * vocabulary, so the probe derives a large deterministic vocabulary from
  * it — every token 3-gram AND 4-gram joined by '_' (tens of thousands of
  * distinct words, well under [[graft.operators.TextAnalysis
  * .LocalMergeThreshold]] so training takes the driver-local path; the
  * 4-grams double the vocabulary so pair exhaustion sits beyond the full
  * 32k requested merges at sf0.1) — then:
  *
  *   1. times a full `rounds`-merge local-path training run,
  *   2. re-runs the first `prefix` merges on the DISTRIBUTED path
  *      (`localThreshold = 0`) and checks the trajectories agree —
  *      the PropertiesSpec local ≡ distributed pin, at probe scale.
  *
  * Prints one JSON line and writes BPE_PROBE.json.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.BpeProbe [rounds] [prefix]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val rounds = args.headOption.flatMap(_.toIntOption).getOrElse(32768)
    val prefix = args.lift(1).flatMap(_.toIntOption).getOrElse(64)
    val spark = LocalSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = split(col("text"), " ")
    def grams(w: Int) = docs
      .where(size(toks) >= w)
      .select(explode(transform(sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws("_", slice(toks, i, lit(w))))).as("text"))
    val probe = grams(3).unionByName(grams(4))
      .localCheckpoint() // one tokenize, reused by all three runs below
    val nWords = probe.select(col("text")).distinct().count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    System.err.println(s"[bpe-probe] derived vocabulary: $nWords words")
    val (localMerges, tLocal) = timed {
      graft.operators.TextAnalysis.bpeTrain(probe, "text", rounds)
        .orderBy("round")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toList
    }
    System.err.println(s"[bpe-probe] local path: ${localMerges.size} merges " +
      f"in $tLocal%.1f s")
    val (distMerges, tDist) = timed {
      graft.operators.TextAnalysis.bpeTrain(probe, "text", prefix,
          localThreshold = 0L)
        .orderBy("round")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toList
    }
    val prefixOk = localMerges.take(prefix) == distMerges
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val line =
      s"""{"metric":"bpe_probe","n_words":$nWords,"rounds_requested":$rounds,""" +
        s""""merges_executed":${localMerges.size},"local_sec":${d3(tLocal)},""" +
        s""""dist_prefix_rounds":$prefix,"dist_sec":${d3(tDist)},""" +
        s""""ms_per_merge_local":${d3(tLocal * 1000 / math.max(1, localMerges.size))},""" +
        s""""prefix_ok":$prefixOk,"sf":"$sfDir"}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get("BPE_PROBE.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
    if (!prefixOk) sys.exit(1)
  }
}
