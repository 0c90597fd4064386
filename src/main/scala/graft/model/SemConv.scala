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

  // ---- common span attributes (generated_trace.go subset) ----------
  val AttributeHttpMethod = "http.method"
  val AttributeHttpStatusCode = "http.status_code"
  val AttributeHttpRoute = "http.route"
  val AttributeHttpTarget = "http.target"
  val AttributeNetPeerName = "net.peer.name"
  val AttributeNetPeerPort = "net.peer.port"
  val AttributeRpcSystem = "rpc.system"
  val AttributeRpcService = "rpc.service"
  val AttributeRpcMethod = "rpc.method"
  val AttributeDbSystem = "db.system"
  val AttributeDbStatement = "db.statement"
  val AttributeMessagingSystem = "messaging.system"
  val AttributeExceptionType = "exception.type"
  val AttributeExceptionMessage = "exception.message"
  val AttributeExceptionStacktrace = "exception.stacktrace"
}
