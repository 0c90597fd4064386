package graft.sources

/** extension/auth + configauth analog (reference:
  * extension/auth/server.go:18-30, client.go:15-26,
  * config/configauth/configauth.go:23-55): receivers name a server
  * authenticator that validates each incoming request's headers
  * BEFORE the data enters the pipeline (a failed authentication
  * rejects the request and "the caller must not retry" —
  * server.go:21-22); exporters name a client authenticator that
  * injects credentials into each outgoing request (the RoundTripper /
  * PerRPCCredentials halves of client.go collapse to one
  * header-injection surface here because both graft transports are
  * header-carrying).
  *
  * On success the server side returns the authenticator's published
  * attributes (the "resulting context should contain the
  * authentication data, such as the principal/username" contract of
  * server.go:24-26); the receiver hands them to
  * [[graft.pipeline.ClientInfo]] so downstream tenancy/routing reads
  * `_client.auth` exactly as it would read reference AuthData.
  *
  * The concrete authenticators model the collector's common ones
  * (bearer token, basic auth, API key) from their public wire
  * behavior — RFC 6750 Bearer, RFC 7617 Basic — not any contrib code.
  */
object Auth {

  /** auth.Server analog. Headers arrive with LOWERCASED names
    * (HTTP/2 requires lowercase on the wire; the HTTP/1.1 receiver
    * normalizes — the reference's metadata lookup is likewise
    * case-insensitive). Right = published auth attributes;
    * Left = rejection reason (the request must be refused, 401 /
    * UNAUTHENTICATED, and never retried). */
  trait ServerAuthenticator {
    def authenticate(headers: Map[String, Seq[String]]): Either[String, Map[String, String]]
    /** the WWW-Authenticate challenge scheme for HTTP 401 responses */
    def challenge: String = "Bearer"
  }

  /** auth.Client analog: credentials as request headers, computed per
    * request (tokens may rotate between calls). */
  trait ClientAuthenticator {
    def headers(): Map[String, String]
  }

  private def headerFirst(headers: Map[String, Seq[String]], name: String): Option[String] =
    headers.get(name).flatMap(_.headOption)

  // ---- bearer token (RFC 6750) ------------------------------------
  /** Server half: `Authorization: Bearer <token>` against a token
    * set. A matched token publishes no identity attributes by itself
    * (a bare bearer token carries none); pass `attrsFor` to map
    * tokens to published attributes (e.g. a tenant registry). */
  final case class BearerTokenServer(
      tokens: Set[String],
      attrsFor: String => Map[String, String] = _ => Map.empty)
      extends ServerAuthenticator {
    def authenticate(headers: Map[String, Seq[String]]): Either[String, Map[String, String]] =
      headerFirst(headers, "authorization") match {
        case None => Left("missing authorization header")
        case Some(v) if !v.regionMatches(true, 0, "Bearer ", 0, 7) =>
          Left("authorization scheme must be Bearer")
        case Some(v) =>
          val tok = v.substring(7).trim
          if (tokens.contains(tok)) Right(attrsFor(tok))
          else Left("invalid bearer token")
      }
  }

  final case class BearerTokenClient(token: String) extends ClientAuthenticator {
    def headers(): Map[String, String] = Map("authorization" -> s"Bearer $token")
  }

  // ---- basic auth (RFC 7617) --------------------------------------
  /** Server half: username/password table; a successful match
    * publishes `subject` = username (the principal contract of
    * server.go:24-26). */
  final case class BasicAuthServer(users: Map[String, String])
      extends ServerAuthenticator {
    override def challenge: String = "Basic"
    def authenticate(headers: Map[String, Seq[String]]): Either[String, Map[String, String]] =
      headerFirst(headers, "authorization") match {
        case None => Left("missing authorization header")
        case Some(v) if !v.regionMatches(true, 0, "Basic ", 0, 6) =>
          Left("authorization scheme must be Basic")
        case Some(v) =>
          val decoded =
            try new String(java.util.Base64.getDecoder.decode(v.substring(6).trim), "UTF-8")
            catch { case _: IllegalArgumentException => "" }
          decoded.indexOf(':') match {
            case -1 => Left("malformed basic credentials")
            case i =>
              val (user, pass) = (decoded.substring(0, i), decoded.substring(i + 1))
              // constant-time-ish compare is irrelevant for a loopback
              // test double; equality semantics are what's modeled
              if (users.get(user).contains(pass)) Right(Map("subject" -> user))
              else Left("invalid username or password")
          }
      }
  }

  final case class BasicAuthClient(username: String, password: String)
      extends ClientAuthenticator {
    def headers(): Map[String, String] = Map("authorization" ->
      ("Basic " + java.util.Base64.getEncoder.encodeToString(
        s"$username:$password".getBytes("UTF-8"))))
  }

  // ---- API key ----------------------------------------------------
  /** Server half: a custom header mapped through a key→tenant
    * registry; publishes `tenant`. The shape of header-carried
    * API-key auth every OTLP vendor endpoint uses. */
  final case class ApiKeyServer(header: String, keys: Map[String, String])
      extends ServerAuthenticator {
    override def challenge: String = "ApiKey"
    private val h = header.toLowerCase
    def authenticate(headers: Map[String, Seq[String]]): Either[String, Map[String, String]] =
      headerFirst(headers, h) match {
        case None => Left(s"missing $header header")
        case Some(k) => keys.get(k) match {
          case Some(tenant) => Right(Map("tenant" -> tenant))
          case None => Left("unknown api key")
        }
      }
  }

  final case class ApiKeyClient(header: String, key: String) extends ClientAuthenticator {
    def headers(): Map[String, String] = Map(header.toLowerCase -> key)
  }

  // ---- configauth-style construction ------------------------------
  /** `auth:` block → server authenticator (configauth.Authentication
    * resolving an authenticator by config — the registry collapses to
    * a tagged map here):
    * {{{
    *   auth: {bearer_tokens: [t1, t2]}
    *   auth: {basic_users: {alice: pw}}
    *   auth: {api_key_header: X-Api-Key, api_keys: {k1: tenantA}}
    * }}} */
  def serverFromMap(m: Map[String, Object]): ServerAuthenticator = {
    if (m.contains("bearer_tokens"))
      BearerTokenServer(m("bearer_tokens").asInstanceOf[java.util.List[Object]]
        .toArray.map(_.toString).toSet)
    else if (m.contains("basic_users"))
      BasicAuthServer(scala.jdk.CollectionConverters.MapHasAsScala(
        m("basic_users").asInstanceOf[java.util.Map[String, Object]]).asScala
        .map { case (k, v) => k -> v.toString }.toMap)
    else if (m.contains("api_key_header"))
      ApiKeyServer(m("api_key_header").toString,
        scala.jdk.CollectionConverters.MapHasAsScala(
          m("api_keys").asInstanceOf[java.util.Map[String, Object]]).asScala
          .map { case (k, v) => k -> v.toString }.toMap)
    else throw new IllegalArgumentException(
      "auth block needs bearer_tokens | basic_users | api_key_header")
  }

  /** `auth:` block → client authenticator:
    * {{{
    *   auth: {bearer_token: t1}
    *   auth: {basic: {username: alice, password: pw}}
    *   auth: {api_key_header: X-Api-Key, api_key: k1}
    * }}} */
  def clientFromMap(m: Map[String, Object]): ClientAuthenticator = {
    if (m.contains("bearer_token"))
      BearerTokenClient(m("bearer_token").toString)
    else if (m.contains("basic")) {
      val b = scala.jdk.CollectionConverters.MapHasAsScala(
        m("basic").asInstanceOf[java.util.Map[String, Object]]).asScala
      BasicAuthClient(b("username").toString, b("password").toString)
    } else if (m.contains("api_key_header"))
      ApiKeyClient(m("api_key_header").toString, m("api_key").toString)
    else throw new IllegalArgumentException(
      "auth block needs bearer_token | basic | api_key_header")
  }
}
