package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** S4 parity: secret payload parsing, key extraction, fail-fast wrapping. */
class SecretsLoaderSpec extends AnyFunSuite {

  private val payload =
    """{"username": "svc_reader", "password": "p@ss\"word", "host": "db.internal",
      |  "port": 3306, "ssl": true}""".stripMargin

  test("parses the Secrets-Manager credential shape, escapes included") {
    val m = SecretsLoader.load("/analytics/rds/mysql_readonly")(_ => payload)
    assert(m("username") === "svc_reader")
    assert(m("password") === "p@ss\"word")
    assert(m("host") === "db.internal")
    assert(m("port") === "3306")
    assert(m("ssl") === "true")
  }

  test("literal backslash before n/t survives unescaping (single-pass escapes)") {
    // JSON for the literal value C:\data\new — sequential replace()s would
    // turn the unescaped \n into a newline
    val m = SecretsLoader.load("s")(_ => """{"path": "C:\\data\\new", "re": "a\\tb\\\\c"}""")
    assert(m("path") === """C:\data\new""")
    assert(m("re") === """a\tb\\c""")
  }

  test("credentials() extracts the (user, pass) pair the source configs take") {
    val (u, p) = SecretsLoader.credentials("sec")(_ => payload)
    assert((u, p) === ("svc_reader", "p@ss\"word"))
  }

  test("fetch or parse failure wraps in SecretLoadException (fail-fast contract)") {
    val boom = intercept[SecretsLoader.SecretLoadException] {
      SecretsLoader.load("missing")(id => throw new RuntimeException("denied"))
    }
    assert(boom.getMessage.contains("missing"))
    intercept[SecretsLoader.SecretLoadException] {
      SecretsLoader.load("bad")(_ => "not json at all")
    }
    intercept[SecretsLoader.SecretLoadException] {
      SecretsLoader.credentials("nokeys")(_ => """{"other": "x"}""")
    }
  }
}
