package graft

import org.apache.spark.sql.functions._

/** Unicode normalization vectors through the native expression (SQL path,
  * so registration and codegen are both exercised). */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    Seq(s).toDF("t").select(call_function("graft_nfc", col("t"))).as[String].head()
  private def nfkc(s: String): String =
    Seq(s).toDF("t").select(call_function("graft_nfkc", col("t"))).as[String].head()

  test("NFC composes combining sequences and is idempotent") {
    val decomposed = "Café" // e + combining acute
    assert(nfc(decomposed) === "Café")
    assert(nfc("Café") === "Café")
    assert(nfc("plain ascii") === "plain ascii")
  }

  test("NFKC additionally folds compatibility forms") {
    assert(nfkc("ﬁle") === "file")     // ﬁ ligature
    assert(nfkc("①") === "1")          // circled one
    assert(nfkc("Ｈｉ") === "Hi")   // fullwidth letters
    // canonical-only NFC must NOT fold these
    assert(nfc("ﬁle") === "ﬁle")
  }

  test("null flows through as null") {
    val out = Seq[Option[String]](None).toDF("t")
      .select(call_function("graft_nfc", col("t"))).as[Option[String]].head()
    assert(out.isEmpty)
  }
}
