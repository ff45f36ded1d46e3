package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** The PII kernels run against SYNTHETIC strings here because the corpus
  * testdata contains none. Since round 12, t31_pii_scrub also proves the
  * full scrub cross-engine on deterministically INJECTED spans; this
  * spec remains the edge-case surface (boundaries, adjacency,
  * pattern disjointness). */
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

  test("redactAllPii scrubs email, phone, IPv4, and SSN-shaped spans in one pass") {
    val in = "a@b.co from 10.0.42.1 call 555-073-1234 ssn 042-42-0042 done"
    assert(
      one(in, TextOps.redactAllPii(col("text"))) ==
        "<EMAIL> from <IP> call <PHONE> ssn <ID> done"
    )
  }

  test("phone and SSN patterns are disjoint on each other's spans") {
    // 3-3-4 digit groups are a phone, 3-2-4 are an id; neither pattern
    // may claim the other's span (t31 counts them independently on the
    // same raw text, so an overlap would double-count cross-engine)
    assert(one("555-073-1234", regexp_count(col("text"), lit(TextOps.SsnRe))) == "0")
    assert(one("042-42-0042", regexp_count(col("text"), lit(TextOps.PhoneRe))) == "0")
    // and an IPv4 inside a dotted phone does not exist: 3 dot groups != 4
    assert(one("555.073.1234", regexp_count(col("text"), lit(TextOps.Ipv4Re))) == "0")
  }

  test("IPv4 boundary: version-like dotted numbers of 4 groups DO redact (over-match by design)") {
    assert(one("v 1.2.3.4 ok", TextOps.redactAllPii(col("text"))) == "v <IP> ok")
    // ...but 5 groups break the \b fence only between groups, so the
    // first 4 still match — the redactor errs toward scrubbing
    assert(one("1.2.3.4.5", TextOps.redactAllPii(col("text"))).contains("<IP>"))
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
