package graft.sources

/**
 * Secrets loading — literal parity for the reference's Secrets Manager
 * helper (`/root/reference/bexley_load_auth_from_secrets_manager_v01.py:12-38`):
 * fetch a named secret, parse its JSON payload into a string map, fail fast
 * if the fetch or parse fails.
 *
 * Design (SURVEY §2.1 S4): the TRANSPORT is injected — the reference's
 * boto3 call is an environment detail (and unavailable offline), so
 * `load` takes any `secretId => payload` supplier: an AWS SM client in
 * production, an env-var or file read locally, a fixture map in tests. The
 * engine-owned parts — payload parsing, key extraction, fail-fast — are
 * what this object implements and specs lock down. Downstream, the parsed
 * map feeds the constructor-injected configs ([[KafkaAuth]]-style case
 * classes), keeping secret material out of plan literals and logs.
 *
 * The parser is a tiny flat-JSON-object reader (string/number/bool values;
 * the shape Secrets Manager stores credentials in: `{"username": ...,
 * "password": ..., "host": ..., "port": ...}`) — no JSON library
 * dependency, mirroring the reference's `json.loads` usage for exactly the
 * payloads it handles.
 */
object SecretsLoader {

  final class SecretLoadException(secretId: String, cause: Throwable)
    extends RuntimeException(
      s"An error occured retreiving the required secret $secretId", cause)
  // (message mirrors the reference's wording at :33 — the operational log
  // line an operator would grep for)

  /** Parse a flat JSON object of scalar values into a String map. */
  private[sources] def parseFlatJson(payload: String): Map[String, String] = {
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*("(?:[^"\\]|\\.)*"|-?[0-9.]+|true|false|null)""".r
    val trimmed = payload.trim
    require(trimmed.startsWith("{") && trimmed.endsWith("}"),
      "secret payload is not a JSON object")
    // single-pass escape handling: sequential replace()s would corrupt a
    // literal backslash followed by 'n'/'t' (e.g. a Windows path) by
    // first unescaping \\ and then re-interpreting the exposed \n
    def unescape(s: String) =
      """\\(.)""".r.replaceAllIn(s, m =>
        scala.util.matching.Regex.quoteReplacement(m.group(1) match {
          case "n" => "\n"
          case "t" => "\t"
          case other => other // covers \" \\ \/ and passes unknowns through
        }))
    entry.findAllMatchIn(trimmed).map { m =>
      val v = m.group(2)
      val value = if (v.startsWith("\"")) unescape(v.substring(1, v.length - 1)) else v
      unescape(m.group(1)) -> value
    }.toMap
  }

  /** Fetch + parse a secret; wraps any failure in [[SecretLoadException]]
    * (callers pair it with `StageLogger.failFast` for the reference's
    * log-and-exit behavior). */
  def load(secretId: String)(fetch: String => String): Map[String, String] =
    try parseFlatJson(fetch(secretId))
    catch { case e: Throwable => throw new SecretLoadException(secretId, e) }

  /** The reference's common shape: credentials for a JDBC/Kafka endpoint. */
  def credentials(secretId: String,
      userKey: String = "username", passKey: String = "password")(
      fetch: String => String): (String, String) = {
    val m = load(secretId)(fetch)
    (m.getOrElse(userKey,
      throw new SecretLoadException(secretId,
        new NoSuchElementException(s"key $userKey missing"))),
      m.getOrElse(passKey,
        throw new SecretLoadException(secretId,
          new NoSuchElementException(s"key $passKey missing"))))
  }
}
