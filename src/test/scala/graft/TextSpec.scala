package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text

/** Text.redactPii edge cases (the bulk text functions are oracle-checked
  * through the driver gate; redaction's tricky cases are pinned here).
  */
class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Text.redactPii(col("t"))).as[String].head()

  test("emails, phones, and IPs redact to typed placeholders") {
    assert(redact("mail a.b+c@sub.example.org now") == "mail <EMAIL> now")
    assert(redact("call +1 (555) 123-4567 today") == "call <PHONE> today")
    assert(redact("host 192.168.1.254 down") == "host <IP> down")
  }

  test("multiple hits and mixed PII all redact") {
    assert(redact("x@y.io and z@w.dev") == "<EMAIL> and <EMAIL>")
    assert(redact("a@b.co via 10.0.0.1 ring 555-123-4567") == "<EMAIL> via <IP> ring <PHONE>")
  }

  test("clean text and short digit runs pass through unchanged") {
    assert(redact("row batch scan 123 ok") == "row batch scan 123 ok")
    assert(redact("version 1.2.3 is not an ip") == "version 1.2.3 is not an ip")
  }

  test("SQL surface: text-analysis functions resolve via GraftExtensions") {
    Seq((1L, "the quick brown fox and a dog run to the barn")).toDF("id", "t")
      .createOrReplaceTempView("tx_docs")
    val r = spark.sql(
      """SELECT token_count(t) AS n, bpeish_token_count(t) AS nb,
        |       quality_score(t) AS q, lang_id(t) AS lang,
        |       redact_pii(t) AS clean, doc_fingerprint(t) AS fp
        |FROM tx_docs""".stripMargin).collect().head
    assert(r.getAs[Int]("n") == 11 && r.getAs[String]("lang") == "en")
    assert(r.getAs[Double]("q") > 0 && r.getAs[String]("clean").contains("fox"))
    // SQL and Column paths agree on the fingerprint
    val viaCol = Seq("the quick brown fox and a dog run to the barn").toDF("t")
      .select(Text.fingerprint(col("t"))).as[Long].head()
    assert(r.getAs[Long]("fp") == viaCol)
  }
}
