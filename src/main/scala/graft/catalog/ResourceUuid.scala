package graft.catalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Resource-id transformation (gnocchi/utils.py:38-59 ResourceUUID):
  * a client may name a resource by any string; non-UUID ids map to a
  * deterministic uuid5 under the fixed namespace, salted with the
  * CREATING user so two tenants' "web-1" never collide:
  *
  *   uuid5(NAMESPACE, id + "\x00" + (creator | "\x00"))
  *
  * UUID-shaped ids pass through (canonical lowercase), '/' is
  * rejected, and transformable ids are capped at 289 chars — all as
  * the reference. Lookup routes re-apply the transform with the
  * REQUESTING user's creator (rest/api.py ResourceController), so the
  * external and internal forms both resolve, per user.
  *
  * Two congruent forms: a scalar for the facade/REST door, and a
  * COLUMN form built purely from codegen'd functions (sha1 + string
  * ops — no UDF) for bulk catalog backfills; parity is spec-pinned
  * and r10 gates the column form against python-uuid5 oracle rows.
  */
object ResourceUuid {

  /** Fixed URN namespace — must never change (utils.py:41-44). */
  val NamespaceHex = "0a7a15ffaa134ac2897c9bdf30ce175b"

  private val Hex32 = "^[0-9a-fA-F]{32}$".r

  /** Mirror python `uuid.UUID(str)`'s lenient parse (utils.py calls it
    * for the passthrough check): drop every `urn:` / `uuid:`
    * substring, strip `{`/`}` from both ends, drop ALL dashes, then
    * require exactly 32 hex chars. Anything python would accept —
    * `urn:uuid:…`, braced, arbitrary-dash placement — must pass
    * through here too, or the same id stores differently in the two
    * engines.
    */
  private def normalizeUuid(value: String): Option[String] = {
    val hex = value.replace("urn:", "").replace("uuid:", "")
      .dropWhile(c => c == '{' || c == '}')
      .reverse.dropWhile(c => c == '{' || c == '}').reverse
      .replace("-", "")
    hex match {
      case Hex32() => Some(dashed(hex.toLowerCase))
      case _       => None
    }
  }

  private def dashed(h: String): String =
    s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20, 32)}"

  private val namespaceBytes: Array[Byte] =
    NamespaceHex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** RFC-4122 uuid5 over the fixed namespace: SHA-1(ns ++ name)
    * truncated to 16 bytes with version/variant bits patched.
    */
  def uuid5(name: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(namespaceBytes)
    md.update(name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val d = md.digest()
    d(6) = ((d(6) & 0x0f) | 0x50).toByte
    d(8) = ((d(8) & 0x3f) | 0x80).toByte
    dashed(d.take(16).map("%02x".format(_)).mkString)
  }

  /** Scalar transform — the facade/REST door. */
  def transform(value: String, creator: Option[String] = None): String = {
    if (value.contains("/"))
      throw new IllegalArgumentException(
        "'/' is not supported in resource id")
    normalizeUuid(value) match {
      case Some(canonical) => canonical
      case None =>
        if (value.length > 289)
          throw new IllegalArgumentException(
            "transformable resource id >289 max allowed characters")
        uuid5(value + "\u0000" + creator.getOrElse("\u0000"))
    }
  }

  /** Column form of [[transform]] for bulk catalog work: UUID-shaped
    * values pass through lowercased, anything else runs the uuid5
    * construction as codegen'd expressions (sha1 of namespace ++ name
    * bytes, version nibble forced to '5', variant nibble to 8..b).
    * Invalid ids ('/', >289 chars) yield null here — bulk callers
    * filter; the scalar door is where per-request errors surface.
    */
  def transformCol(value: Column, creator: Column): Column = {
    val name = concat(value, lit("\u0000"),
      coalesce(creator, lit("\u0000")))
    val h = sha1(concat(unhex(lit(NamespaceHex)), encode(name, "UTF-8")))
    val variant = conv(substring(h, 17, 1), 16, 10).cast("int")
    val vNibble = lower(conv((pmod(variant, lit(4)) + lit(8)).cast("string"),
      10, 16))
    val u5 = concat(
      substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
      lit("5"), substring(h, 14, 3), lit("-"),
      vNibble, substring(h, 18, 3), lit("-"), substring(h, 21, 12))
    // python-uuid.UUID-lenient passthrough, as the scalar door: drop
    // urn:/uuid: substrings, strip {} from the ends, drop dashes,
    // then require 32 hex chars. The replaces are SEQUENTIAL (urn:
    // first, then uuid:) like python str.replace — a one-pass
    // alternation would miss a "uuid:" that the "urn:" removal
    // creates, diverging from the scalar door on the same input.
    val hex = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(value, "urn:", ""), "uuid:", ""),
        "^[{}]+|[{}]+$", ""),
      "-", "")
    when(hex.rlike("^[0-9a-fA-F]{32}$"), lower(concat(
        substring(hex, 1, 8), lit("-"), substring(hex, 9, 4), lit("-"),
        substring(hex, 13, 4), lit("-"), substring(hex, 17, 4), lit("-"),
        substring(hex, 21, 12))))
      .when(value.contains("/") || length(value) > 289, lit(null))
      .otherwise(u5)
  }
}
