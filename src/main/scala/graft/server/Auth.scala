package graft.server

/**
 * Pluggable request authorization for [[QueryServer]] — the analog of the
 * reference's auth crate boundary (raphtory-auth-noop/src/lib.rs: the
 * public build ships a no-op `init()`, and a real provider slots in behind
 * the same seam). Here the seam is a per-request check: the server
 * consults the hook before reading the body or dispatching any handler, so
 * a denied request never touches the catalog and never runs a plan.
 *
 * Implementations must be thread-safe — the server invokes them from its
 * handler pool concurrently.
 */
trait Auth {

  /** Authorize one request.
    *
    * @param method HTTP method (`GET`, `POST`, …)
    * @param path request path (e.g. `/query/social/main`)
    * @param token the `Authorization` header value, if present
    * @return `Right(())` to allow; `Left(reason)` is returned to the
    *         client as a 401 with `{"error": reason}`
    */
  def authorize(method: String, path: String, token: Option[String]): Either[String, Unit]
}

/** Allow-everything default — the exact public-build posture of the
  * reference's `raphtory-auth-noop` (its entire surface is `fn init() {}`).
  */
object NoopAuth extends Auth {
  override def authorize(
      method: String,
      path: String,
      token: Option[String]): Either[String, Unit] = Right(())
}

/** Minimal real provider for tests/deployments: a static bearer token.
  * Constant-time comparison so the check doesn't leak prefix length. */
final class BearerTokenAuth(secret: String) extends Auth {
  private val expected = s"Bearer $secret".getBytes("UTF-8")
  override def authorize(
      method: String,
      path: String,
      token: Option[String]): Either[String, Unit] =
    token match {
      case Some(t) if java.security.MessageDigest.isEqual(t.getBytes("UTF-8"), expected) =>
        Right(())
      case Some(_) => Left("invalid bearer token")
      case None => Left("missing Authorization header")
    }
}
