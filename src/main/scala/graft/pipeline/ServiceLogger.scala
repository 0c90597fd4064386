package graft.pipeline

/** `service::telemetry::logs` — the collector's OWN logger, configured
  * like the reference's zap config (service/telemetry/config.go
  * LogsConfig + telemetry.go newLogger):
  *
  *  - `level`: minimum enabled severity (debug|info|warn|error;
  *    default info — zap's production default).
  *  - `encoding`: `console` (ISO-8601 timestamp, TAB-separated — the
  *    reference switches zap's console encoder to ISO8601 time,
  *    telemetry.go:72-75) or `json` (zap production encoder shape:
  *    epoch-seconds ts, level, msg, then fields). Unknown encodings
  *    refuse the config, as zap's Build does.
  *  - `output_paths`: where records go — `stdout`, `stderr`, or file
  *    paths (appended). ALL records route here; `error_output_paths`
  *    receives the logger's INTERNAL failures only (a sink that
  *    cannot be written), zap's split exactly — error-LEVEL records
  *    are not rerouted.
  *  - `sampling`: zap-sampler semantics shared with the logging
  *    exporter (Pipeline.scala LoggingExporter): per one-second
  *    window AND per message text, the first `initial` records pass,
  *    thereafter every `thereafter`-th. Absent block = no sampling
  *    (the reference's nil SamplingConfig).
  *  - `initial_fields`: static fields stamped on every record.
  *
  * The CLI keeps printing its command OUTPUT contract to stdout
  * unchanged; when this block is configured the service's lifecycle
  * messages ALSO flow here with severities — the reference collector
  * logs through its zap logger while the otelcol command owns its
  * own stdout.
  */
object ServiceLogger {

  final case class LogsConfig(
      level: String = "info",
      encoding: String = "console",
      outputPaths: Seq[String] = Seq("stderr"),
      errorOutputPaths: Seq[String] = Seq("stderr"),
      // 0/0 = sampling disabled (nil SamplingConfig)
      samplingInitial: Int = 0,
      samplingThereafter: Int = 0,
      initialFields: Map[String, String] = Map.empty)

  private[pipeline] val Levels =
    Map("debug" -> 0, "info" -> 1, "warn" -> 2, "error" -> 3)
  private val Encodings = Set("console", "json")

  /** SDK LogRecordProcessor seam (the reference's generated schema
    * declares LogRecordProcessor/LogRecordExporter —
    * generated_config.go:57-76 — even though its own service wires
    * only zap; graft wires it the way the traces side is wired).
    * Every ADMITTED record (level gate + zap sampler both passed —
    * the processors see what the sinks see) reaches each processor;
    * onLog must be cheap/non-blocking (a queue offer). */
  trait LogProcessor {
    def onLog(tsMs: Long, level: String, msg: String): Unit
    def forceFlush(): Unit = ()
    def shutdown(): Unit = ()
  }

  /** plog severity numbers (logs data model: DEBUG=5 INFO=9 WARN=13
    * ERROR=17) for the zap level set */
  val SeverityNumbers: Map[String, Int] =
    Map("debug" -> 5, "info" -> 9, "warn" -> 13, "error" -> 17)

  /** validate the knobs the way zap's Build refuses them: unknown
    * level/encoding, empty outputs, bad sampling are config errors */
  def validate(cfg: LogsConfig): LogsConfig = {
    require(Levels.contains(cfg.level),
      s"telemetry logs level '${cfg.level}' is not one of ${Levels.keys.toSeq.sorted.mkString("|")}")
    require(Encodings(cfg.encoding),
      s"telemetry logs encoding '${cfg.encoding}' is not one of console|json")
    require(cfg.outputPaths.nonEmpty, "telemetry logs output_paths is empty")
    require(cfg.samplingInitial >= 0, "sampling initial must be >= 0")
    require(cfg.samplingThereafter >= 0, "sampling thereafter must be >= 0")
    cfg
  }

  def fromMap(m: Map[String, Object]): LogsConfig = {
    def strs(key: String, dflt: Seq[String]): Seq[String] = m.get(key) match {
      case Some(l: java.util.List[_]) =>
        import scala.jdk.CollectionConverters._
        l.asScala.map(_.toString).toSeq
      case Some(other) => Seq(other.toString)
      case None => dflt
    }
    val sampling = m.get("sampling").map { s =>
      val sm = s.asInstanceOf[java.util.Map[String, Object]]
      (Option(sm.get("initial")).map(_.asInstanceOf[Number].intValue()).getOrElse(100),
        Option(sm.get("thereafter")).map(_.asInstanceOf[Number].intValue()).getOrElse(100))
    }
    val fields: Map[String, String] = m.get("initial_fields") match {
      case Some(f: java.util.Map[_, _]) =>
        import scala.jdk.CollectionConverters._
        f.asInstanceOf[java.util.Map[String, Object]].asScala
          .map { case (k, v) => k -> v.toString }.toMap
      case _ => Map.empty
    }
    validate(LogsConfig(
      level = m.get("level").map(_.toString).getOrElse("info"),
      encoding = m.get("encoding").map(_.toString).getOrElse("console"),
      outputPaths = strs("output_paths", Seq("stderr")),
      errorOutputPaths = strs("error_output_paths", Seq("stderr")),
      samplingInitial = sampling.map(_._1).getOrElse(0),
      samplingThereafter = sampling.map(_._2).getOrElse(0),
      initialFields = fields))
  }
}

final class ServiceLogger(
    cfg: ServiceLogger.LogsConfig,
    nowMs: () => Long = () => System.currentTimeMillis(),
    // telemetry::logs::processors — batch processors exporting the
    // service's own log records (OTLP/console), the third
    // self-telemetry signal next to the metric readers and span
    // processors
    processors: Seq[ServiceLogger.LogProcessor] = Nil) {
  ServiceLogger.validate(cfg)

  private val minRank = ServiceLogger.Levels(cfg.level)

  // zap-sampler state per message TEXT per one-second window (the
  // LoggingExporter kernel, keyed by message like zap's sampler core)
  private var windowStartMs = 0L
  private val seenInWindow = scala.collection.mutable.Map.empty[String, Long]

  private def admit(msg: String): Boolean = synchronized {
    if (cfg.samplingInitial == 0 && cfg.samplingThereafter == 0) return true
    val now = nowMs()
    if (now - windowStartMs >= 1000L) { windowStartMs = now; seenInWindow.clear() }
    val seen = seenInWindow.getOrElse(msg, 0L) + 1L
    seenInWindow(msg) = seen
    seen <= cfg.samplingInitial ||
      (cfg.samplingThereafter > 0 &&
        (seen - cfg.samplingInitial) % cfg.samplingThereafter == 0)
  }

  private def jsonEsc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def format(level: String, msg: String, now: Long): String = {
    if (cfg.encoding == "json") {
      val fields = cfg.initialFields.toSeq.sortBy(_._1)
        .map { case (k, v) => s""","${jsonEsc(k)}":"${jsonEsc(v)}"""" }.mkString
      // zap production shape: epoch seconds with millis, lowercase level
      s"""{"level":"$level","ts":${now / 1000L}.${"%03d".format(now % 1000L)},"msg":"${jsonEsc(msg)}"$fields}"""
    } else {
      val iso = java.time.Instant.ofEpochMilli(now).toString
      val fields =
        if (cfg.initialFields.isEmpty) ""
        else cfg.initialFields.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString("\t{", ", ", "}")
      s"$iso\t${level.toUpperCase}\t$msg$fields"
    }
  }

  // file sinks open ONCE and stay open (zap builds its sinks at
  // config Build, not per record) — a hot sampled path must not pay
  // a mkdir walk + open/append/close cycle per admitted record. A
  // failed open is NOT cached, so each record retries and the
  // failure routes to error_output_paths each time.
  private val fileSinks =
    scala.collection.mutable.Map.empty[String, java.io.PrintWriter]

  private def sink(path: String, line: String): Unit = path match {
    case "stdout" => System.out.println(line)
    case "stderr" => System.err.println(line)
    case p => synchronized {
      val w = fileSinks.getOrElseUpdate(p, {
        val f = java.nio.file.Paths.get(p)
        Option(f.getParent).foreach(java.nio.file.Files.createDirectories(_))
        new java.io.PrintWriter(new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(
            java.nio.file.Files.newOutputStream(f,
              java.nio.file.StandardOpenOption.CREATE,
              java.nio.file.StandardOpenOption.APPEND),
            java.nio.charset.StandardCharsets.UTF_8)))
      })
      w.println(line)
      w.flush() // a log line must be durable when the call returns
    }
  }

  /** release the held file handles (the CLI bracket calls this; a
    * long-lived embedding service may keep the logger open) */
  def close(): Unit = synchronized {
    fileSinks.values.foreach(w =>
      try w.close() catch { case scala.util.control.NonFatal(_) => () })
    fileSinks.clear()
  }

  def log(level: String, msg: String): Unit = {
    if (ServiceLogger.Levels.getOrElse(level, 1) < minRank) return
    if (!admit(msg)) return
    // processors see exactly what the sinks see (post level gate +
    // sampler) — the zap-core ordering, sampler before outputs. ONE
    // clock read per record: the exported record and the sink line
    // must carry the same timestamp or correlating them fails
    // (review-wave finding)
    val ts = nowMs()
    processors.foreach(p =>
      try p.onLog(ts, level, msg)
      catch { case scala.util.control.NonFatal(_) => () })
    val line = format(level, msg, ts)
    cfg.outputPaths.foreach { p =>
      try sink(p, line)
      catch {
        case scala.util.control.NonFatal(e) =>
          // zap's split: the logger's INTERNAL failures go to
          // error_output_paths — never silently, never recursively
          cfg.errorOutputPaths.foreach { ep =>
            try sink(ep, s"log write to $p failed: ${e.getMessage}")
            catch { case scala.util.control.NonFatal(_) => () }
          }
      }
    }
  }

  def debug(msg: String): Unit = log("debug", msg)
  def info(msg: String): Unit = log("info", msg)
  def warn(msg: String): Unit = log("warn", msg)
  def error(msg: String): Unit = log("error", msg)
}
