package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** The PII kernels run against SYNTHETIC strings here because the corpus
  * testdata contains none — this spec, not t10's oracle, is what proves
  * redaction; t10 proves the run-collapse and plumbing. */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(text: String, c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(text).toDF("text").select(c.cast("string")).collect()(0).getString(0)
  }

  test("redactPii replaces every email and phone span") {
    val in = "mail a.b+c@ex-1.example.org or x@y.io, call 407-555-0199 or 407.555.0199."
    assert(
      one(in, TextOps.redactPii(col("text"))) ==
        "mail <EMAIL> or <EMAIL>, call <PHONE> or <PHONE>."
    )
  }

  test("piiCount counts emails plus phones") {
    val in = "a@b.co c@d.org 111-222-3333 plain words 1234-555-0199"
    // the last "phone" fails the \b boundary (preceded by a digit run of 4)
    assert(one(in, TextOps.piiCount(col("text"))) == "3")
  }

  test("phone boundary: digits glued to the pattern do not match") {
    assert(one("x1407-555-0199", TextOps.piiCount(col("text"))) == "0")
  }

  test("collapseRuns drops consecutive duplicates only") {
    import spark.implicits._
    val out = Seq("the the the cat sat sat on on on on the mat")
      .toDF("text")
      .select(array_join(TextOps.collapseRuns(split(col("text"), " ")), " "))
      .collect()(0)
      .getString(0)
    assert(out == "the cat sat on the mat")
  }

  test("collapseRuns keeps non-adjacent repeats and empty arrays") {
    import spark.implicits._
    val out = Seq(("a b a b", 1), ("", 2))
      .toDF("text", "id")
      .select(
        col("id"),
        array_join(
          TextOps.collapseRuns(array_remove(split(col("text"), " "), "")),
          " "
        ).as("o")
      )
      .collect()
      .map(r => r.getInt(0) -> r.getString(1))
      .toMap
    assert(out(1) == "a b a b")
    assert(out(2) == "")
  }
}
