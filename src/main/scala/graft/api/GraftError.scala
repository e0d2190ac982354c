package graft.api

/** Typed domain errors across the facade → REST boundary (SURVEY §7.4
  * risk 6). The REST dispatcher maps each subtype to its HTTP status
  * in ONE place — no message inspection — mirroring how the
  * reference's Pecan controllers translate its typed indexer/storage
  * exception hierarchy (indexer/__init__.py → rest/api.py abort
  * calls).
  *
  * Each error also IS-A `IllegalArgumentException` (domain errors) or
  * `SecurityException` (auth errors): facade callers outside the REST
  * layer keep their natural `catch`/`require`-style handling, and the
  * HTTP mapping stays an additive refinement rather than a parallel
  * hierarchy every caller must learn.
  */
sealed trait GraftError { self: RuntimeException =>
  /** The HTTP status the REST boundary maps this error to. */
  def status: Int
}

object GraftError {
  /** 404 — metric / policy / rule / resource / resource-type absent. */
  final class NotFound(msg: String)
      extends IllegalArgumentException(msg) with GraftError {
    val status = 404
  }

  /** 400 — malformed or semantically invalid input. */
  final class BadInput(msg: String)
      extends IllegalArgumentException(msg) with GraftError {
    val status = 400
  }

  /** 409 — id/name collision with an existing object. */
  final class Conflict(msg: String)
      extends IllegalArgumentException(msg) with GraftError {
    val status = 409
  }

  /** 401 — no credentials on a guarded route. */
  final class Unauthenticated(msg: String)
      extends SecurityException(msg) with GraftError {
    val status = 401
  }

  /** 403 — authenticated but not allowed. */
  final class Forbidden(msg: String)
      extends SecurityException(msg) with GraftError {
    val status = 403
  }

  def notFound(msg: String): Nothing = throw new NotFound(msg)
  def badInput(msg: String): Nothing = throw new BadInput(msg)
  def conflict(msg: String): Nothing = throw new Conflict(msg)

  /** `require`-shaped guards carrying the HTTP mapping. */
  def found(cond: Boolean, msg: => String): Unit = if (!cond) notFound(msg)
  def fresh(cond: Boolean, msg: => String): Unit = if (!cond) conflict(msg)
  def valid(cond: Boolean, msg: => String): Unit = if (!cond) badInput(msg)
}
