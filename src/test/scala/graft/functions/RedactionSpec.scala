package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions.col

class RedactionSpec extends SparkSuite {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t")
      .select(Redaction.redactPii(col("t")).as("r"))
      .head().getString(0)

  test("emails, IPs, and phones redact with typed placeholders") {
    assert(redact("mail a.user+tag@sub.example.co.uk today")
      == "mail <EMAIL> today")
    assert(redact("host 192.168.001.1 down") == "host <IP> down")
    assert(redact("call +1 (415) 555-0123 now") == "call <PHONE> now")
    assert(redact("x 10.0.0.1 y bob@x.io z +44 20 7946 0958")
      == "x <IP> y <EMAIL> z <PHONE>")
  }

  test("order prevents cross-mangling: IP is not half-eaten as a phone") {
    assert(redact("ip 10.22.33.44 tail") == "ip <IP> tail")
  }

  test("clean text passes through untouched") {
    val s = "no pii here, just words and 42 numbers. v1.2 stays"
    assert(redact(s) == s)
  }

  test("all occurrences replaced, not just the first") {
    assert(redact("a@b.co and c@d.org") == "<EMAIL> and <EMAIL>")
  }
}
