package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextOps

/** The PII scrubber on real-looking strings (the gated query's synthetic
  * fixture only exercises one format per type). */
class PiiRedactSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("text").select(TextOps.redactPii(col("text"))).as[String].collect().head

  private def counts(s: String): (Int, Int, Int) =
    Seq(s).toDF("text").select(
      TextOps.piiCount(col("text"), TextOps.piiEmail),
      TextOps.piiCount(col("text"), TextOps.piiPhone),
      TextOps.piiCount(col("text"), TextOps.piiIpv4))
      .as[(Int, Int, Int)].collect().head

  test("email formats: plus-tags, subdomains, multi-part TLDs") {
    assert(redact("write john.doe+tag@sub.mail.co.uk today") == "write <EMAIL> today")
    assert(redact("a@b.io x_y%z@ex-corp.io") == "<EMAIL> <EMAIL>")
    assert(counts("a@b.io and c@d.org")._1 == 2)
  }

  test("phone formats: parens, intl prefix, dotted") {
    assert(redact("call (415) 555-2671 now") == "call <PHONE> now")
    assert(redact("or +1 415-555-2671") == "or <PHONE>")
    assert(redact("fax 415.555.2671") == "fax <PHONE>")
    assert(counts("(415) 555-2671 +1 415-555-2671")._2 == 2)
  }

  test("ipv4 redacted; dotted versions and bare numbers survive") {
    assert(redact("from 192.168.0.1 port 80") == "from <IP> port 80")
    assert(redact("release v1.2.3 build 42") == "release v1.2.3 build 42",
      "two-dot version strings are not IPs")
    assert(counts("10.0.0.1 10.0.0.2")._3 == 2)
  }

  test("no false positives: dates, prices, versions, ids survive") {
    val prose = "on 2024-01-03 order #4821 cost $1,234.56 under v2.10.3 via node8"
    assert(redact(prose) == prose)
    assert(counts(prose) == ((0, 0, 0)))
  }

  test("mixed text redacts every type without clobbering prose") {
    val in = "user a@b.io at 10.0.0.1 called (415) 555-2671 about order 1234"
    assert(redact(in) == "user <EMAIL> at <IP> called <PHONE> about order 1234")
  }
}
