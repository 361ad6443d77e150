package graft.sources

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** The reference's Drive AUTH dispatch
  * (`/root/reference/one_one_one_rule/load_drive.py:26-82`) modeled
  * hermetically, completing the S5 parity surface beside
  * [[LocalDrive]]'s upsert semantics:
  *
  *  - `get_drive_service` (`:57-82`) dispatches on `auth_mode`:
  *    `"oauth"` requires the client-secrets file (else the exact
  *    "OAuth client file not found" failure), `"service_account"`
  *    requires the key file; the mode string is lower-cased and
  *    defaults to service-account when unrecognized, like the
  *    reference's `(auth_mode or "service_account").lower()`.
  *  - `_get_oauth_credentials` (`:35-55`) is the cached-token flow:
  *    a valid cached token is reused as-is; an EXPIRED token WITH a
  *    refresh token is refreshed in place (no user interaction) and
  *    the cache rewritten; otherwise the interactive flow runs
  *    against the client file and the minted token is cached
  *    (parent dirs created, `:52-53`).
  *
  * Hermetic model: credentials are deterministic records derived from
  * file contents + an explicit `now` clock (no wall time — tests pin
  * it). "Running the flow" mints `access = sha-ish(client, now)` with
  * a fixed TTL and a refresh token; "refreshing" mints a new access
  * token from the refresh token, proving the cache was USED rather
  * than re-minted (a flow-minted token and a refreshed token differ).
  */
object DriveAuth {

  val TokenTtlSeconds = 3600L

  final case class Auth(mode: String, accessToken: String,
      expiresAt: Long, refreshToken: Option[String])

  /** deterministic opaque token material (no randomness — resumable
    * across processes, assertable in tests) */
  private def mint(seed: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def readKv(p: Path): Map[String, String] =
    Files.readAllLines(p).asScala.filter(_.contains("\t")).map { l =>
      val Array(k, v) = l.split("\t", 2); k -> v
    }.toMap

  private def writeKv(p: Path, m: Map[String, String]): Unit = {
    Option(p.toAbsolutePath.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p,
      m.toSeq.sorted.map { case (k, v) => s"$k\t$v" }.mkString("", "\n", "\n"))
  }

  /** `_get_oauth_credentials` (`load_drive.py:35-55`). */
  def oauthCredentials(clientFile: Path, tokenFile: Path, now: Long): Auth = {
    val cached: Option[Map[String, String]] =
      if (Files.exists(tokenFile)) Some(readKv(tokenFile)) else None
    cached match {
      case Some(t) if t("expiresAt").toLong > now => // valid — reuse as-is
        Auth("oauth", t("access"), t("expiresAt").toLong,
          t.get("refresh").filter(_.nonEmpty))
      case Some(t) if t.get("refresh").exists(_.nonEmpty) => // refresh
        val access = mint(s"refresh:${t("refresh")}:$now")
        val auth = Auth("oauth", access, now + TokenTtlSeconds,
          t.get("refresh"))
        writeKv(tokenFile, Map("access" -> access,
          "expiresAt" -> auth.expiresAt.toString,
          "refresh" -> t("refresh")))
        auth
      case _ => // no cache / expired without refresh → run the flow
        if (!Files.exists(clientFile))
          throw new IllegalArgumentException(
            "OAuth client file not found. Set GOOGLE_OAUTH_CLIENT_FILE.")
        val client = Files.readString(clientFile)
        val access = mint(s"flow:$client:$now")
        val refresh = mint(s"refresh-grant:$client:$now")
        val auth = Auth("oauth", access, now + TokenTtlSeconds, Some(refresh))
        writeKv(tokenFile, Map("access" -> access,
          "expiresAt" -> auth.expiresAt.toString, "refresh" -> refresh))
        auth
    }
  }

  /** `_get_service_account_credentials` (`load_drive.py:25-31`). */
  def serviceAccountCredentials(keyFile: Path, now: Long): Auth = {
    if (!Files.exists(keyFile))
      throw new IllegalArgumentException(
        "Service account file not found. Set GOOGLE_SERVICE_ACCOUNT_FILE.")
    Auth("service_account",
      mint(s"svc:${Files.readString(keyFile)}:$now"),
      now + TokenTtlSeconds, None)
  }

  /** `get_drive_service` (`load_drive.py:57-82`): the mode dispatch.
    * Returns the Auth the "client" would be built with. */
  def getDriveAuth(authMode: String,
      serviceAccountFile: Option[Path] = None,
      oauthClientFile: Option[Path] = None,
      oauthTokenFile: Option[Path] = None,
      now: Long): Auth = {
    val mode = Option(authMode).filter(_.nonEmpty)
      .getOrElse("service_account").toLowerCase
    if (mode == "oauth") {
      val client = oauthClientFile.getOrElse(
        throw new IllegalArgumentException(
          "OAuth client file not found. Set GOOGLE_OAUTH_CLIENT_FILE."))
      if (!Files.exists(client))
        throw new IllegalArgumentException(
          "OAuth client file not found. Set GOOGLE_OAUTH_CLIENT_FILE.")
      val token = oauthTokenFile.getOrElse(
        java.nio.file.Paths.get("config/oauth_token.tsv"))
      oauthCredentials(client, token, now)
    } else {
      val key = serviceAccountFile.getOrElse(
        throw new IllegalArgumentException(
          "Service account file not found. Set GOOGLE_SERVICE_ACCOUNT_FILE."))
      serviceAccountCredentials(key, now)
    }
  }
}
