package graft

import graft.functions.Psl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full public-suffix-list semantics (functions.Psl) against the
  * publicsuffix.org test-vector classes: exact rules, private-section
  * rules, wildcard rules, exception rules, longest-match, and the
  * implicit-* fallback. */
class PslSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def reg(hosts: String*): Map[String, String] = {
    import spark.implicits._
    hosts.toDF("h").select(col("h"), Psl.registeredDomain(col("h")).as("r"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("parse shapes: the embedded list is the real thing") {
    val r = Psl.full
    val nExact = r.exact.values.map(_.size).sum
    assert(nExact > 5000, s"exact rules: $nExact")
    assert(r.wildBase.values.map(_.size).sum > 50)
    assert(r.excep.values.map(_.size).sum >= 8)
    assert(r.maxMatchDepth >= 5)
    assert(r.exact(1).contains("com") && r.exact(2).contains("co.uk"))
    assert(r.exact(2).contains("github.io")) // private section
    assert(r.wildBase(2).contains("kawasaki.jp"))
    assert(r.excep(3).contains("city.kawasaki.jp"))
  }

  test("exact and longest-match rules") {
    val m = reg("example.com", "www.example.com", "a.b.example.co.uk",
      "example.github.io", "deep.sub.example.github.io")
    assert(m("example.com") == "example.com")
    assert(m("www.example.com") == "example.com")
    assert(m("a.b.example.co.uk") == "example.co.uk")
    // private-section rule: github.io is a public suffix
    assert(m("example.github.io") == "example.github.io")
    assert(m("deep.sub.example.github.io") == "example.github.io")
  }

  test("wildcard and exception rules (the kawasaki.jp family)") {
    val m = reg("site1.kawasaki.jp", "www.site1.kawasaki.jp",
      "city.kawasaki.jp", "www.city.kawasaki.jp", "kawasaki.jp",
      "www.ck", "foo.www.ck", "other.ck", "sub.other.ck")
    // *.kawasaki.jp: site1.kawasaki.jp IS a public suffix
    assert(m("site1.kawasaki.jp") == "site1.kawasaki.jp") // pass-through
    assert(m("www.site1.kawasaki.jp") == "www.site1.kawasaki.jp")
    // !city.kawasaki.jp: exception → ps = kawasaki.jp
    assert(m("city.kawasaki.jp") == "city.kawasaki.jp")
    assert(m("www.city.kawasaki.jp") == "city.kawasaki.jp")
    // the wildcard base itself has no rule at its own depth → implicit *
    // would make jp the ps; jp IS an exact rule → kawasaki.jp registered
    assert(m("kawasaki.jp") == "kawasaki.jp")
    // !www.ck under *.ck
    assert(m("www.ck") == "www.ck")
    assert(m("foo.www.ck") == "www.ck")
    assert(m("other.ck") == "other.ck") // ps itself, pass-through
    assert(m("sub.other.ck") == "sub.other.ck")
  }

  test("implicit * for unknown TLDs; single-label pass-through") {
    val m = reg("host.internal", "a.b.host.internal", "localhost", "com")
    assert(m("host.internal") == "host.internal")
    assert(m("a.b.host.internal") == "host.internal")
    assert(m("localhost") == "localhost")
    assert(m("com") == "com") // a bare public suffix passes through
  }

  test("duck rules VALUES round-trips the same counts") {
    val v = Psl.duckRulesValues()
    val n = v.count(_ == '(')
    val r = Psl.full
    val want = r.exact.values.map(_.size).sum +
      r.wildBase.values.map(_.size).sum + r.excep.values.map(_.size).sum
    assert(n == want)
  }
}
