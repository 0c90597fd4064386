package graft.model

/** OpenTelemetry semantic-convention constants (reference: semconv/
  * v1.18.0/generated_resource.go + schema.go — the generated attribute
  * catalog every collector component names resource attributes with).
  * Graft carries the subset its surfaces actually touch plus the core
  * resource groups, as named constants so a component never invents an
  * attribute key ad hoc; the catalog is data from the PUBLIC semantic
  * conventions, not copied code. */
object SemConv {
  /** schema.go: the schema URL this catalog version pins */
  val SchemaUrl = "https://opentelemetry.io/schemas/1.18.0"

  // ---- service.* (the resource identity every signal carries) ------
  val AttributeServiceName = "service.name"
  val AttributeServiceNamespace = "service.namespace"
  val AttributeServiceInstanceId = "service.instance.id"
  val AttributeServiceVersion = "service.version"

  // ---- telemetry.sdk.* ---------------------------------------------
  val AttributeTelemetrySdkName = "telemetry.sdk.name"
  val AttributeTelemetrySdkLanguage = "telemetry.sdk.language"
  val AttributeTelemetrySdkVersion = "telemetry.sdk.version"

  // ---- host.* / os.* / process.* (resource detection surface) ------
  val AttributeHostName = "host.name"
  val AttributeHostId = "host.id"
  val AttributeHostArch = "host.arch"
  val AttributeOsType = "os.type"
  val AttributeOsDescription = "os.description"
  val AttributeProcessPid = "process.pid"
  val AttributeProcessExecutableName = "process.executable.name"
  val AttributeProcessRuntimeName = "process.runtime.name"
  val AttributeProcessRuntimeVersion = "process.runtime.version"
  val AttributeProcessCommandLine = "process.command_line"

  // ---- cloud.* / container.* / k8s.* (deployment detection) --------
  val AttributeCloudProvider = "cloud.provider"
  val AttributeCloudRegion = "cloud.region"
  val AttributeCloudAvailabilityZone = "cloud.availability_zone"
  val AttributeContainerName = "container.name"
  val AttributeContainerId = "container.id"
  val AttributeK8sNamespaceName = "k8s.namespace.name"
  val AttributeK8sPodName = "k8s.pod.name"
  val AttributeK8sDeploymentName = "k8s.deployment.name"
  val AttributeDeploymentEnvironment = "deployment.environment"

  // ---- cloud./container./host./os./process. breadth -----------------
  val AttributeCloudAccountId = "cloud.account.id"
  val AttributeCloudPlatform = "cloud.platform"
  val AttributeCloudResourceId = "cloud.resource_id"
  val AttributeContainerImageName = "container.image.name"
  val AttributeContainerImageTag = "container.image.tag"
  val AttributeContainerRuntime = "container.runtime"
  val AttributeHostType = "host.type"
  val AttributeHostImageName = "host.image.name"
  val AttributeHostImageId = "host.image.id"
  val AttributeHostImageVersion = "host.image.version"
  val AttributeOsName = "os.name"
  val AttributeOsVersion = "os.version"
  val AttributeProcessParentPid = "process.parent_pid"
  val AttributeProcessCommand = "process.command"
  val AttributeProcessCommandArgs = "process.command_args"
  val AttributeProcessExecutablePath = "process.executable.path"
  val AttributeProcessOwner = "process.owner"
  val AttributeProcessRuntimeDescription = "process.runtime.description"

  // ---- k8s.* breadth -------------------------------------------------
  val AttributeK8sClusterName = "k8s.cluster.name"
  val AttributeK8sNodeName = "k8s.node.name"
  val AttributeK8sNodeUid = "k8s.node.uid"
  val AttributeK8sPodUid = "k8s.pod.uid"
  val AttributeK8sContainerName = "k8s.container.name"
  val AttributeK8sContainerRestartCount = "k8s.container.restart_count"
  val AttributeK8sReplicaSetName = "k8s.replicaset.name"
  val AttributeK8sStatefulSetName = "k8s.statefulset.name"
  val AttributeK8sDaemonSetName = "k8s.daemonset.name"
  val AttributeK8sJobName = "k8s.job.name"
  val AttributeK8sCronJobName = "k8s.cronjob.name"

  // ---- faas.* / browser.* / device.* / webengine.* ------------------
  val AttributeFaasName = "faas.name"
  val AttributeFaasVersion = "faas.version"
  val AttributeFaasInstance = "faas.instance"
  val AttributeFaasMaxMemory = "faas.max_memory"
  val AttributeFaasTrigger = "faas.trigger"
  val AttributeFaasInvocationId = "faas.invocation_id"
  val AttributeBrowserBrands = "browser.brands"
  val AttributeBrowserPlatform = "browser.platform"
  val AttributeBrowserMobile = "browser.mobile"
  val AttributeBrowserLanguage = "browser.language"
  val AttributeDeviceId = "device.id"
  val AttributeDeviceModelIdentifier = "device.model.identifier"
  val AttributeDeviceModelName = "device.model.name"
  val AttributeDeviceManufacturer = "device.manufacturer"
  val AttributeWebengineName = "webengine.name"
  val AttributeWebengineVersion = "webengine.version"

  // ---- otel scope / instrumentation library --------------------------
  val AttributeOtelScopeName = "otel.scope.name"
  val AttributeOtelScopeVersion = "otel.scope.version"
  val AttributeOtelStatusCode = "otel.status_code"
  val AttributeOtelStatusDescription = "otel.status_description"

  // ---- common span attributes (generated_trace.go subset) ----------
  val AttributeHttpMethod = "http.method"
  val AttributeHttpStatusCode = "http.status_code"
  val AttributeHttpRoute = "http.route"
  val AttributeHttpTarget = "http.target"
  val AttributeHttpUrl = "http.url"
  val AttributeHttpScheme = "http.scheme"
  val AttributeHttpFlavor = "http.flavor"
  val AttributeHttpUserAgent = "http.user_agent"
  val AttributeHttpRequestContentLength = "http.request_content_length"
  val AttributeHttpResponseContentLength = "http.response_content_length"
  val AttributeHttpClientIp = "http.client_ip"
  val AttributeHttpServerName = "http.server_name"
  val AttributeNetPeerName = "net.peer.name"
  val AttributeNetPeerPort = "net.peer.port"
  val AttributeNetHostName = "net.host.name"
  val AttributeNetHostPort = "net.host.port"
  val AttributeNetTransport = "net.transport"
  val AttributeNetAppProtocolName = "net.app.protocol.name"
  val AttributeNetAppProtocolVersion = "net.app.protocol.version"
  val AttributeNetSockPeerAddr = "net.sock.peer.addr"
  val AttributeNetSockPeerPort = "net.sock.peer.port"
  val AttributeNetSockPeerName = "net.sock.peer.name"
  val AttributeNetSockHostAddr = "net.sock.host.addr"
  val AttributeNetSockHostPort = "net.sock.host.port"
  val AttributeRpcSystem = "rpc.system"
  val AttributeRpcService = "rpc.service"
  val AttributeRpcMethod = "rpc.method"
  val AttributeRpcGrpcStatusCode = "rpc.grpc.status_code"
  val AttributeDbSystem = "db.system"
  val AttributeDbStatement = "db.statement"
  val AttributeDbConnectionString = "db.connection_string"
  val AttributeDbUser = "db.user"
  val AttributeDbName = "db.name"
  val AttributeDbOperation = "db.operation"
  val AttributeDbSqlTable = "db.sql.table"
  val AttributeMessagingSystem = "messaging.system"
  val AttributeMessagingOperation = "messaging.operation"
  val AttributeMessagingMessageId = "messaging.message.id"
  val AttributeMessagingDestinationName = "messaging.destination.name"
  val AttributeExceptionType = "exception.type"
  val AttributeExceptionMessage = "exception.message"
  val AttributeExceptionStacktrace = "exception.stacktrace"
  val AttributeExceptionEscaped = "exception.escaped"
  val AttributeEnduserId = "enduser.id"
  val AttributeEnduserRole = "enduser.role"
  val AttributeEnduserScope = "enduser.scope"
  val AttributeThreadId = "thread.id"
  val AttributeThreadName = "thread.name"
  val AttributeCodeFunction = "code.function"
  val AttributeCodeNamespace = "code.namespace"
  val AttributeCodeFilepath = "code.filepath"
  val AttributeCodeLineno = "code.lineno"
  val AttributeCodeColumn = "code.column"
  val AttributePeerService = "peer.service"
  val AttributeEventName = "event.name"
  val AttributeEventDomain = "event.domain"

  // ---- multi-version catalogs ---------------------------------------
  // The reference ships one generated package PER schema version
  // (semconv/v1.18.0, v1.21.0, v1.23.0, …). Graft models that as
  // Catalog values: constant-name → attribute-key lookup, per-key
  // stability markers, and the cross-version RENAME tables a schema
  // migration needs (the v1.23.0 HTTP stabilization is the big one:
  // http.method → http.request.method, http.url → url.full,
  // net.peer.* → server.*, net.sock.* → network.*, …). Names and
  // renames are data from the PUBLIC semantic-conventions registry.

  /** one schema version's view of the registry */
  sealed abstract class Catalog(val schemaUrl: String) {
    /** constant name (reference generated-package style) → key */
    def catalog: Map[String, String]
    /** attribute key → "stable" | "experimental" at this version */
    def stability: Map[String, String]
    def key(constant: String): String = catalog.getOrElse(constant,
      throw new NoSuchElementException(
        s"semconv $schemaUrl has no constant '$constant'"))
  }

  /** every Attribute* constant above, keyed by its constant suffix */
  private lazy val baseCatalog: Map[String, String] =
    getClass.getMethods.toSeq
      .filter(m => m.getName.startsWith("Attribute") &&
        m.getParameterCount == 0 && m.getReturnType == classOf[String])
      .map(m => m.getName.stripPrefix("Attribute") ->
        m.invoke(this).asInstanceOf[String])
      .toMap

  /** the pinned catalog the constants above spell (v1.18.0):
    * HTTP/net conventions still experimental at this version */
  object V1_18_0 extends Catalog("https://opentelemetry.io/schemas/1.18.0") {
    val catalog: Map[String, String] = baseCatalog
    val stability: Map[String, String] = {
      // the long-stable core identity attributes; everything else in
      // the 1.18 registry was experimental (HTTP stabilized at 1.23)
      val stable = Set(AttributeServiceName, AttributeServiceVersion,
        AttributeTelemetrySdkName, AttributeTelemetrySdkLanguage,
        AttributeTelemetrySdkVersion)
      catalog.values.map(k =>
        k -> (if (stable(k)) "stable" else "experimental")).toMap
    }
  }

  /** the HTTP-stabilization milestone (v1.23.0): renamed constants
    * resolve to the stabilized keys; the old spellings are GONE from
    * this catalog (the reference's per-version packages likewise
    * drop them), and event.domain is removed outright */
  object V1_23_0 extends Catalog("https://opentelemetry.io/schemas/1.23.0") {
    private val renamedConstants: Map[String, (String, String)] = Map(
      // old constant -> (new constant, new key)
      "HttpMethod" -> ("HttpRequestMethod", "http.request.method"),
      "HttpStatusCode" -> ("HttpResponseStatusCode", "http.response.status_code"),
      "HttpRequestContentLength" -> ("HttpRequestBodySize", "http.request.body.size"),
      "HttpResponseContentLength" -> ("HttpResponseBodySize", "http.response.body.size"),
      "HttpUrl" -> ("UrlFull", "url.full"),
      "HttpScheme" -> ("UrlScheme", "url.scheme"),
      "HttpUserAgent" -> ("UserAgentOriginal", "user_agent.original"),
      // both old spellings fold into one new constant (the values
      // below dedupe in the toMap — that is the point of the fold)
      "HttpFlavor" -> ("NetworkProtocolVersion", "network.protocol.version"),
      "HttpClientIp" -> ("ClientAddress", "client.address"),
      "NetPeerName" -> ("ServerAddress", "server.address"),
      "NetPeerPort" -> ("ServerPort", "server.port"),
      "NetHostName" -> ("ServerAddress", "server.address"),
      "NetHostPort" -> ("ServerPort", "server.port"),
      "NetTransport" -> ("NetworkTransport", "network.transport"),
      "NetAppProtocolName" -> ("NetworkProtocolName", "network.protocol.name"),
      "NetAppProtocolVersion" -> ("NetworkProtocolVersion", "network.protocol.version"),
      "NetSockPeerAddr" -> ("NetworkPeerAddress", "network.peer.address"),
      "NetSockPeerPort" -> ("NetworkPeerPort", "network.peer.port"),
      "NetSockHostAddr" -> ("NetworkLocalAddress", "network.local.address"),
      "NetSockHostPort" -> ("NetworkLocalPort", "network.local.port"),
      "DeploymentEnvironment" -> ("DeploymentEnvironment", "deployment.environment"))
    // event.domain is removed outright; http.target SPLITS into
    // url.path + url.query (not a 1:1 rename, so no migration entry);
    // http.server_name was deprecated into server.address
    private val removedConstants = Set("EventDomain", "HttpTarget",
      "HttpServerName")
    val catalog: Map[String, String] =
      (baseCatalog -- removedConstants -- renamedConstants.keys) ++
        renamedConstants.values.toSeq
    val stability: Map[String, String] = {
      val stable = Set("http.request.method", "http.response.status_code",
        "http.route", "url.full", "url.scheme", "user_agent.original",
        "server.address", "server.port", "client.address",
        "network.transport", "network.protocol.name",
        "network.protocol.version", "network.peer.address",
        "network.peer.port", AttributeServiceName, AttributeServiceVersion,
        AttributeTelemetrySdkName, AttributeTelemetrySdkLanguage,
        AttributeTelemetrySdkVersion)
      catalog.values.map(k =>
        k -> (if (stable(k)) "stable" else "experimental")).toMap
    }
  }

  val versions: Map[String, Catalog] = Map(
    V1_18_0.schemaUrl -> V1_18_0, V1_23_0.schemaUrl -> V1_23_0,
    "1.18.0" -> V1_18_0, "1.23.0" -> V1_23_0)

  private def catalogOf(v: String): Catalog =
    versions.getOrElse(v, throw new IllegalArgumentException(
      s"unknown semconv version '$v' (${versions.keys.toSeq.sorted.mkString(", ")})"))

  /** old-key → new-key rename table between two catalog versions.
    * `side` picks the span perspective for the net.* family — the
    * stabilized conventions fold net.peer.* (client view) and
    * net.host.* (server view) into ONE server.address/port pair, so
    * a single bidirectional table would collide: client maps
    * net.peer.*, server maps net.host.* (+ http.client_ip). The
    * common HTTP/url/user_agent/network renames apply to both.
    * Same-version → empty. Only 1.18.0 → 1.23.0 is defined (the
    * registry's documented migration); anything else refuses. */
  def renames(from: String, to: String, side: String = "client")
      : Map[String, String] = {
    val f = catalogOf(from); val t = catalogOf(to)
    if (f == t) return Map.empty
    require(f == V1_18_0 && t == V1_23_0,
      s"no semconv rename table from '$from' to '$to' " +
        "(defined: 1.18.0 -> 1.23.0)")
    // the socket-level renames are side-AGNOSTIC (both views carry
    // them); only the server.address/port fold needs the side split
    val common = Map(
      "http.method" -> "http.request.method",
      "http.status_code" -> "http.response.status_code",
      "http.request_content_length" -> "http.request.body.size",
      "http.response_content_length" -> "http.response.body.size",
      "http.url" -> "url.full",
      "http.scheme" -> "url.scheme",
      "http.user_agent" -> "user_agent.original",
      "http.flavor" -> "network.protocol.version",
      "net.transport" -> "network.transport",
      "net.app.protocol.name" -> "network.protocol.name",
      "net.app.protocol.version" -> "network.protocol.version",
      "net.sock.peer.addr" -> "network.peer.address",
      "net.sock.peer.port" -> "network.peer.port",
      "net.sock.host.addr" -> "network.local.address",
      "net.sock.host.port" -> "network.local.port")
    side match {
      case "client" => common ++ Map(
        "net.peer.name" -> "server.address",
        "net.peer.port" -> "server.port")
      case "server" => common ++ Map(
        "net.host.name" -> "server.address",
        "net.host.port" -> "server.port",
        "http.client_ip" -> "client.address")
      case other => throw new IllegalArgumentException(
        s"semconv rename side must be client|server, got '$other'")
    }
  }

  /** migrate a map<string,string> attributes column between schema
    * versions: keys rewrite through [[renames]] inside one codegen'd
    * projection (map_entries → transform → map_from_entries), values
    * and unknown keys pass through untouched. Spark refuses duplicate
    * keys in map_from_entries, which is the CORRECT loud failure when
    * a row carries both the old and the new spelling of one key. */
  def migrateAttrs(attrs: org.apache.spark.sql.Column,
                   from: String, to: String,
                   side: String = "client"): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val ren = renames(from, to, side)
    if (ren.isEmpty) attrs
    else map_from_entries(transform(map_entries(attrs), e =>
      struct(
        coalesce(element_at(typedLit(ren), e.getField("key")),
          e.getField("key")).as("key"),
        e.getField("value").as("value"))))
  }
}
