package graft.pipeline

/** Service extensions (reference: extension/extension.go +
  * service/extensions/extensions.go): components outside the data
  * path that the service starts BEFORE any pipeline runs and shuts
  * down — in reverse start order — after the pipelines stop. Two
  * concrete extensions are provided, mirroring the reference tree:
  * the experimental storage extension (component-scoped durable KV)
  * and the memory ballast.
  *
  * Config shape follows the collector document: a top-level
  * `extensions:` section DECLARES instances; `service: {extensions:
  * [names]}` ENABLES them in start order. A name listed under
  * `service.extensions` but not declared is a validation error, and
  * a declared-but-unlisted extension is never built — exactly the
  * reference's two-sided validation (service/config.go).
  */
object Extensions {

  /** extension.Extension lifecycle (extension/extension.go): Start /
    * Shutdown, plus the confmap-watcher hook (extension/extension.go
    * ConfigWatcher.NotifyConfig — extensions observe the RESOLVED
    * config; graft hands them the redacted effective document). */
  trait Extension {
    def name: String
    def start(): Unit = ()
    def shutdown(): Unit = ()
    def notifyConfig(effectiveConfig: String): Unit = ()
  }

  // ----------------------------------------------------------------
  // storage (reference: extension/experimental/storage/storage.go)
  // ----------------------------------------------------------------

  sealed trait OpType
  case object GetOp extends OpType
  case object SetOp extends OpType
  case object DeleteOp extends OpType

  /** storage.Operation (storage.go:58-73): key + mutable value +
    * type; Get results land in-place in `value` during [[Client.batch]]. */
  final class Operation private (val key: String, @volatile var value: Array[Byte],
                                 val opType: OpType)
  object Operation {
    def get(key: String): Operation = new Operation(key, null, GetOp)
    def set(key: String, value: Array[Byte]): Operation =
      new Operation(key, value, SetOp)
    def delete(key: String): Operation = new Operation(key, null, DeleteOp)
  }

  /** storage.Client (storage.go:36-56) — golang-map semantics: Set
    * overwrites silently, Get of a missing key is None (not an
    * error), Delete of a missing key no-ops; errors are reserved for
    * real storage problems. Each component closes its own client. */
  trait Client extends AutoCloseable {
    def get(key: String): Option[Array[Byte]]
    def set(key: String, value: Array[Byte]): Unit
    def delete(key: String): Unit
    /** operations run in order; Get results are stored in-place into
      * the given Operation's `value` (null = not found) */
    def batch(ops: Operation*): Unit
    def close(): Unit
  }

  /** storage.Extension (storage.go:13-23): a client per
    * (component kind, component id, storageName) — one component may
    * hold several named storages (e.g. one per signal), and two
    * components NEVER see each other's keys. */
  trait StorageExtension extends Extension {
    def getClient(kind: String, id: String, storageName: String): Client
  }

  /** File-backed storage extension (the contrib filestorage shape,
    * built from the storage.go contract — no bbolt on the JVM, so
    * the layout is one directory per component scope and one file
    * per key, with atomic tmp+rename writes). Values survive a
    * process restart: a new FileStorage over the same directory
    * serves the same data. Scope directories use the reference
    * client-name shape `<kind>_<id>_<storageName>` (sanitized), so
    * isolation is structural, not convention. */
  final class FileStorage(val directory: String,
                          override val name: String = "file_storage")
      extends StorageExtension {
    import java.nio.file.{Files, Paths, Path, StandardCopyOption}

    override def start(): Unit = {
      val d = Paths.get(directory)
      Files.createDirectories(d)
      require(Files.isWritable(d), s"storage directory $directory is not writable")
    }

    // percent-encode anything outside [A-Za-z0-9._-] so arbitrary
    // component ids and key strings map to safe, collision-free file
    // names (%-escaping is injective; '%' itself is escaped)
    private def enc(s: String): String =
      s.flatMap { c =>
        if (c.isLetterOrDigit || c == '.' || c == '_' || c == '-') c.toString
        else f"%%${c.toInt}%04x"
      }

    def getClient(kind: String, id: String, storageName: String): Client = {
      val scope = Paths.get(scopeDirectory(kind, id, storageName))
      // layout migration belongs to the KV surface ONLY: a queue
      // scope (scopeDirectory as a spool root) has its own layout
      // that a rename sweep would corrupt
      migrateLayout(scope)
      new FileClient(scope)
    }

    /** graft-specific bridge for components whose DATA plane is a
      * distributed parquet spool (the persistent queue): the storage
      * extension still OWNS the durable location — the component asks
      * it for its scope directory instead of a KV client, the same
      * ownership inversion the reference queue gets from
      * queue.storageID. */
    def scopeDirectory(kind: String, id: String, storageName: String): String = {
      val scope = Paths.get(directory,
        s"${enc(kind)}_${enc(id)}_${enc(storageName)}")
      Files.createDirectories(scope)
      scope.toString
    }

    /** one-time migration to the v2 layout (key files prefixed `k_`
      * so they are namespace-disjoint from `.tmp_*` scratch): a
      * pre-existing scope written by the v1 layout is re-prefixed
      * once, marked, and never touched again — an upgrade must not
      * silently reset queue metadata / recovery counters to empty */
    private def migrateLayout(scope: Path): Unit = {
      val marker = scope.resolve("_layout_v2")
      if (Files.exists(marker)) return
      val legacy = Option(scope.toFile.listFiles()).getOrElse(Array.empty)
        .filter { f =>
          f.isFile &&
            // already in the k_ namespace = already v2 (also makes a
            // crash-interrupted sweep idempotent on re-run: moved
            // files are never re-prefixed to k_k_*; the cost is that
            // a hypothetical V1 key whose name itself began with
            // `k_` reads back without that prefix — the ambiguity is
            // unresolvable and this direction never corrupts v2 data)
            !f.getName.startsWith("k_") &&
            // v1 tmp scratch and the marker are not keys; every other
            // dot/underscore name IS a legitimate v1 key (enc passes
            // '.' and '_' through)
            !f.getName.startsWith(".tmp_") &&
            f.getName != "_layout_v2"
        }
      legacy.foreach { f =>
        Files.move(f.toPath, scope.resolve("k_" + f.getName),
          StandardCopyOption.ATOMIC_MOVE)
      }
      Files.write(marker, Array.empty[Byte])
      ()
    }

    private final class FileClient(scope: Path) extends Client {
      @volatile private var closed = false
      private def check(): Unit =
        if (closed) throw new IllegalStateException(
          s"storage client for $scope is closed")
      // `k_` keeps key files and `.tmp_*` scratch in disjoint
      // namespaces: '.', '_' and letters all pass enc() unencoded, so
      // a key literally named ".tmp_x_1" must not resolve to another
      // key's in-flight tmp file and break the atomic publish
      private def fileFor(key: String): Path = scope.resolve("k_" + enc(key))

      def get(key: String): Option[Array[Byte]] = {
        check()
        val p = fileFor(key)
        if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
      }

      def set(key: String, value: Array[Byte]): Unit = {
        check()
        require(value != null, "storage value must not be null")
        val p = fileFor(key)
        // atomic publish: a crash mid-write can never leave a
        // half-written value under the real key
        val tmp = scope.resolve(s".tmp_${enc(key)}_${Thread.currentThread().getId}")
        Files.write(tmp, value)
        Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      }

      def delete(key: String): Unit = {
        check()
        Files.deleteIfExists(fileFor(key))
        ()
      }

      // honest divergence from the bbolt-backed reference: each
      // OPERATION is atomic (tmp+rename), the batch as a whole is
      // NOT a transaction — a crash mid-batch leaves the completed
      // prefix applied. The components using this store (queue
      // metadata, counters) write independent keys, so the weaker
      // guarantee is sufficient; a component needing multi-key
      // atomicity must encode its state in ONE key.
      def batch(ops: Operation*): Unit = {
        check()
        ops.foreach { op =>
          op.opType match {
            case GetOp    => op.value = get(op.key).orNull
            case SetOp    => set(op.key, op.value)
            case DeleteOp => delete(op.key)
          }
        }
      }

      def close(): Unit = closed = true
    }
  }

  // ----------------------------------------------------------------
  // memory ballast (reference: extension/ballastextension)
  // ----------------------------------------------------------------

  /** Heap ballast (ballastextension/memory_ballast.go: allocate a
    * large, never-touched byte slice at start so the GC's heap-growth
    * target rises and collection frequency falls; freed on shutdown).
    * The JVM analog holds a strong reference to one allocation; the
    * effect — a raised live-set floor that stretches the GC cycle —
    * is the same mechanism the Go ballast exploits. */
  final class MemoryBallast(val sizeMib: Int,
                            override val name: String = "memory_ballast")
      extends Extension {
    require(sizeMib >= 0, "ballast size must be >= 0")
    @volatile private var ballast: Array[Byte] = null
    override def start(): Unit =
      if (sizeMib > 0 && ballast == null) ballast = new Array[Byte](sizeMib << 20)
    override def shutdown(): Unit = ballast = null
    def allocatedBytes: Long = {
      val b = ballast
      if (b == null) 0L else b.length.toLong
    }
  }

  // ----------------------------------------------------------------
  // zpages (reference: extension/zpagesextension)
  // ----------------------------------------------------------------

  /** zpagesextension as a config-declared extension: the debug-page
    * HTTP server, declared `extensions: {zpages: {port: N}}` and
    * enabled via service.extensions. The reference extension receives
    * the serving host from the component Host at Start; graft's
    * equivalent seam is [[bind]] — the collector binds the built
    * Service (and the resolved config for /debug/configz) once it
    * exists, which is when the pages have something to show.
    * Shutdown stops the server. */
  final class ZpagesExtension(val port: Int,
                              override val name: String = "zpages")
      extends Extension {
    @volatile private var server: ZpagesServer = null
    def bind(service: Pipeline.Service,
             spark: org.apache.spark.sql.SparkSession,
             configDoc: Option[String] = None,
             gates: FeatureGate.Registry = FeatureGate.global,
             // the service's self-trace store — non-null serves
             // /debug/tracez (zpagesextension.go:46-52 registers the
             // zpages span processor on the service TracerProvider)
             tracer: SelfTrace.Tracer = null): Unit =
      synchronized {
        if (server == null)
          server = new ZpagesServer(service, spark, port, gates,
            extensions = service.extensions.map(_.name),
            configDoc = configDoc, tracer = tracer)
      }
    def boundPort: Int = {
      val s = server
      require(s != null, "zpages extension not bound to a service yet")
      s.boundPort
    }
    override def shutdown(): Unit = synchronized {
      if (server != null) { server.stop(); server = null }
    }
  }

  // ----------------------------------------------------------------
  // configtelemetry (reference: config/configtelemetry)
  // ----------------------------------------------------------------

  /** service::telemetry::metrics::readers entries (reference
    * telemetry/generated_config.go MetricReader: pull →
    * Prometheus exposition server, periodic → interval-driven
    * console writer). Parsed and validated by ConfigLoader; started
    * by the CLI alongside the legacy `address` server. */
  sealed trait MetricReader
  final case class PullPrometheusReader(host: String, port: Int)
      extends MetricReader {
    def address: String = s"$host:$port"
  }
  final case class PeriodicConsoleReader(intervalMs: Long)
      extends MetricReader
  /** periodic reader with an OTLP push exporter
    * (generated_config.go:142-174 OtlpMetric;
    * proctelemetry/config.go:249-264) — the service ships its own
    * metrics to a remote backend on an interval */
  final case class PeriodicOtlpReader(intervalMs: Long,
      otlp: SelfTelemetryOtlp.OtlpPush) extends MetricReader

  /** Internal-telemetry verbosity (configtelemetry.go Level): how
    * much self-observability the service emits about ITSELF. Applied
    * to [[Pipeline.Service.healthFrame]]: none publishes nothing,
    * basic the essentials (queue depth gauges + delivery/dead-letter
    * totals), normal adds the retry/partial-success indicators,
    * detailed adds the per-transport dimensioned counters. The
    * reference service default is basic
    * (service/telemetry/config_test.go pins it). */
  sealed abstract class TelemetryLevel(val rank: Int, val label: String)
  case object LevelNone extends TelemetryLevel(-1, "none")
  case object LevelBasic extends TelemetryLevel(0, "basic")
  case object LevelNormal extends TelemetryLevel(1, "normal")
  case object LevelDetailed extends TelemetryLevel(2, "detailed")

  object TelemetryLevel {
    val default: TelemetryLevel = LevelBasic
    /** UnmarshalText semantics (configtelemetry.go:57-75):
      * case-insensitive name; unknown text is a config error */
    def parse(s: String): TelemetryLevel = s.trim.toLowerCase match {
      case "none"     => LevelNone
      case "basic"    => LevelBasic
      case "normal"   => LevelNormal
      case "detailed" => LevelDetailed
      case other => throw new IllegalArgumentException(
        s"unknown telemetry level: '$other' (none|basic|normal|detailed)")
    }
  }
}
