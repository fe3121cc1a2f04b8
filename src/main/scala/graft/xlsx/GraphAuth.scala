package graft.xlsx

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

/** Bearer-token source for Microsoft Graph calls. `refresh()` is invoked
  * once when a request comes back 401, mirroring the reference's silent
  * re-acquire before falling back to interactive auth
  * (/root/reference/ducklakexl/ducklakexl.py:100-138).
  */
trait GraphTokenProvider {
  def token(): String
  def refresh(): Unit = ()
}

/** fixed token (CI / tests / externally-managed credential) */
final class StaticTokenProvider(t: String) extends GraphTokenProvider {
  def token(): String = t
}

/** OAuth2 device-code flow against the Microsoft identity platform — the
  * reference's MSAL `initiate_device_flow` (ducklakexl.py:107-126)
  * re-expressed over plain `java.net.http`:
  *
  *  1. POST /{tenant}/oauth2/v2.0/devicecode  -> user_code + verification
  *     URI, surfaced through `onPrompt` (the reference prints the MSAL
  *     message);
  *  2. poll POST /{tenant}/oauth2/v2.0/token (grant_type device_code)
  *     until the user completes sign-in (`authorization_pending`) or the
  *     flow expires.
  *
  * `authBase` is injectable so the flow is testable against a local mock
  * identity endpoint; the default is the public login endpoint.
  */
final class DeviceCodeTokenProvider(
    tenant: String,
    clientId: String,
    scope: String = "https://graph.microsoft.com/.default offline_access",
    authBase: String = "https://login.microsoftonline.com",
    onPrompt: String => Unit = msg => System.err.println(s"[ducklakexl] $msg"),
    pollMillis: Long = 2000L,
    maxPolls: Int = 450) extends GraphTokenProvider {

  private val http = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()
  @volatile private var access: Option[String] = None

  def token(): String = access.getOrElse {
    val t = acquire()
    access = Some(t)
    t
  }

  override def refresh(): Unit = { access = None }

  private def form(kv: (String, String)*): String =
    kv.map { case (k, v) =>
      k + "=" + java.net.URLEncoder.encode(v, StandardCharsets.UTF_8)
    }.mkString("&")

  private def post(url: String, body: String) = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    http.send(req, HttpResponse.BodyHandlers.ofString())
  }

  private def acquire(): String = {
    val dc = post(s"$authBase/$tenant/oauth2/v2.0/devicecode",
      form("client_id" -> clientId, "scope" -> scope))
    require(dc.statusCode() == 200, s"device-code request failed: ${dc.statusCode()} ${dc.body()}")
    val dcJson = mapper.readTree(dc.body())
    onPrompt(Option(dcJson.get("message")).map(_.asText())
      .getOrElse(s"enter code ${dcJson.get("user_code").asText()} at ${dcJson.get("verification_uri").asText()}"))
    val deviceCode = dcJson.get("device_code").asText()
    var polls = 0
    while (polls < maxPolls) {
      val tk = post(s"$authBase/$tenant/oauth2/v2.0/token",
        form("grant_type" -> "urn:ietf:params:oauth:grant-type:device_code",
          "client_id" -> clientId, "device_code" -> deviceCode))
      if (tk.statusCode() == 200)
        return mapper.readTree(tk.body()).get("access_token").asText()
      val err = Option(mapper.readTree(tk.body()).get("error")).map(_.asText()).getOrElse("")
      if (err != "authorization_pending" && err != "slow_down")
        throw new IllegalStateException(s"device-code flow failed: $err")
      Thread.sleep(pollMillis)
      polls += 1
    }
    throw new IllegalStateException("device-code flow timed out")
  }
}

object GraphTokenProvider {
  /** delegated scopes, mirroring the reference exactly
    * (ducklakexl.py:152-155): base `Files.ReadWrite` + `User.Read`;
    * `read_shared_files` adds `Files.ReadWrite.All`, so workbooks SHARED
    * WITH the user resolve too (the reference docstring at :46).
    * `offline_access` keeps the refresh token for the silent re-acquire.
    */
  def scopes(readSharedFiles: Boolean): String =
    "Files.ReadWrite User.Read offline_access" +
      (if (readSharedFiles) " Files.ReadWrite.All" else "")

  /** credential pick for `ExcelRemote.pick`: an explicit token wins, then
    * a device-code flow if a client id is configured, else a provider
    * that explains what is missing the moment it is actually used.
    * `readSharedFiles` (or env GRAPH_READ_SHARED=true) widens the
    * device-code scopes per [[scopes]]; GRAPH_AUTH_BASE redirects the
    * identity endpoint (tests / sovereign clouds).
    */
  def fromEnv(env: Map[String, String] = sys.env,
      readSharedFiles: Boolean = false): GraphTokenProvider =
    env.get("GRAPH_TOKEN").map(new StaticTokenProvider(_))
      .orElse(env.get("GRAPH_CLIENT_ID").map(cid =>
        new DeviceCodeTokenProvider(
          env.getOrElse("GRAPH_TENANT", "organizations"), cid,
          scope = scopes(readSharedFiles ||
            env.get("GRAPH_READ_SHARED").exists(_.equalsIgnoreCase("true"))),
          authBase = env.getOrElse("GRAPH_AUTH_BASE",
            "https://login.microsoftonline.com"))))
      .getOrElse(new GraphTokenProvider {
        def token(): String = throw new IllegalStateException(
          "Graph workbook requested but no credential configured: set " +
          "GRAPH_TOKEN (bearer) or GRAPH_CLIENT_ID [+ GRAPH_TENANT] " +
          "(device-code flow)")
      })
}
