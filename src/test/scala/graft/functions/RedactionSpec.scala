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

  test("numeric prose with few digits is NOT a phone — separators " +
      "don't count toward the length") {
    // the pre-hardening pattern needed only TWO digits with 7+
    // separator chars between, mangling ranges and version lists
    val s1 = "versions 1.0 - 2.0 - 3.0 shipped"
    assert(redact(s1) == s1, redact(s1))
    val s2 = "see 1.......2 for the figure"
    assert(redact(s2) == s2, redact(s2))
    // 8 digits (the fixture's planted shape) still redacts
    assert(redact("call +1 555 0142 now") == "call <PHONE> now")
  }

  test("all occurrences replaced, not just the first") {
    assert(redact("a@b.co and c@d.org") == "<EMAIL> and <EMAIL>")
  }
}
