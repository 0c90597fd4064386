package graft.pipeline

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean
import scala.jdk.CollectionConverters._

/** featuregate analog (reference featuregate/gate.go, stage.go,
  * registry.go, flag.go): a registry of named feature gates, each with
  * a lifecycle stage that fixes its default and what an operator may
  * override.
  *
  *  - Alpha: disabled by default, must be explicitly enabled
  *  - Beta: enabled by default, may be disabled
  *  - Stable: permanently on — disabling is an error, and a removal
  *    version is mandatory at registration (registry.go:99-101)
  *  - Deprecated: permanently off — enabling is an error, removal
  *    version mandatory
  *
  * Overrides arrive through the same two surfaces as the collector:
  * the `--feature-gates` flag syntax (`gate,+gate,-gate` —
  * flag.go:35-56) and the service config (a `featuregates` list,
  * applied by [[ConfigLoader]] at resolve time with unknown-gate
  * rejection, so a typo'd gate id refuses the config instead of
  * silently doing nothing).
  */
object FeatureGate {

  sealed abstract class Stage(val name: String) {
    override def toString: String = name
  }
  case object Alpha extends Stage("Alpha")
  case object Beta extends Stage("Beta")
  case object Stable extends Stage("Stable")
  case object Deprecated extends Stage("Deprecated")

  final class Gate private[FeatureGate] (
      val id: String,
      val stage: Stage,
      val description: String,
      val referenceUrl: String,
      val fromVersion: String,
      val toVersion: String) {
    private[FeatureGate] val on = new AtomicBoolean(
      stage == Beta || stage == Stable)
    def isEnabled: Boolean = on.get
  }

  final class Registry {
    private val gates = new ConcurrentHashMap[String, Gate]()

    /** Register a gate (registry.go:81-106): duplicate ids and
      * missing removal versions on terminal stages are errors. */
    def register(id: String, stage: Stage, description: String = "",
                 referenceUrl: String = "", fromVersion: String = "",
                 toVersion: String = ""): Gate = {
      require(id.nonEmpty, "empty gate id")
      if ((stage == Stable || stage == Deprecated) && toVersion.isEmpty)
        throw new IllegalArgumentException(
          s"no removal version set for $stage gate \"$id\"")
      val g = new Gate(id, stage, description, referenceUrl,
        fromVersion, toVersion)
      if (gates.putIfAbsent(id, g) != null)
        throw new IllegalArgumentException(
          s"attempted to add pre-existing gate \"$id\"")
      g
    }

    def get(id: String): Option[Gate] = Option(gates.get(id))

    def isEnabled(id: String): Boolean =
      get(id).map(_.isEnabled).getOrElse(
        throw new IllegalArgumentException(s"no such feature gate \"$id\""))

    /** Set the enabled value (registry.go:109-133): unknown gates and
      * overrides against a terminal stage are errors — except the
      * no-op direction (enabling Stable / disabling Deprecated), which
      * the reference accepts with a removal warning. */
    def set(id: String, enabled: Boolean): Unit = {
      validateSet(id, enabled)
      val g = gates.get(id)
      g.stage match {
        case Stable | Deprecated => () // no-op direction, gate is fixed
        case _ => g.on.set(enabled)
      }
    }

    /** the validation half of [[set]] — same unknown-gate and
      * terminal-stage checks, NO mutation. Lets a config loader
      * validate every flip in a document and reject the whole thing
      * before any gate state changes (parse must not be a
      * side-effecting operation). */
    def validateSet(id: String, enabled: Boolean): Unit = {
      val g = get(id).getOrElse(throw new IllegalArgumentException(
        s"no such feature gate \"$id\""))
      g.stage match {
        case Stable if !enabled => throw new IllegalStateException(
          s"feature gate \"$id\" is stable, can not be disabled")
        case Deprecated if enabled => throw new IllegalStateException(
          s"feature gate \"$id\" is deprecated, can not be enabled")
        case _ => ()
      }
    }

    /** gates in lexicographical id order (registry.go VisitAll) */
    def visitAll: Seq[Gate] =
      gates.values.asScala.toSeq.sortBy(_.id)

    /** `--feature-gates` flag syntax (flag.go:35-56): comma-separated
      * ids, optional `+`/`-` prefix; every id must resolve. Empty
      * items (trailing/double commas) are skipped, not errors. */
    def applyFlags(s: String): Unit =
      FeatureGate.parseFlags(s).foreach { case (id, v) => set(id, v) }

    /** the flag's String() form: every gate id, disabled ones with a
      * `-` prefix (flag.go:23-33) — round-trips through applyFlags */
    def flagString: String =
      visitAll.map(g => if (g.isEnabled) g.id else s"-${g.id}").mkString(",")
  }

  /** Decompose one `--feature-gates`-syntax string into (id, enabled)
    * pairs without touching any registry — the pure half of
    * [[Registry.applyFlags]], so callers can validate a whole document
    * of flips before committing any of them. */
  def parseFlags(s: String): Seq[(String, Boolean)] =
    if (s.isEmpty) Nil
    else s.split(",").iterator.filter(_.nonEmpty).map { raw =>
      raw.charAt(0) match {
        case '-' => (raw.substring(1), false)
        case '+' => (raw.substring(1), true)
        case _   => (raw, true)
      }
    }.toSeq

  /** the process-wide registry (registry.go GlobalRegistry) */
  val global = new Registry

  /** graft-owned gates, registered at class load like the reference's
    * package-init MustRegister calls. */

  /** remote config retrieval is powerful and off-by-choice-able: an
    * operator can close the http(s) provider surface entirely. */
  val HttpConfigProvider: Gate = global.register(
    "graft.confmap.httpProvider", Beta,
    description = "allow http(s):// config URIs in ConfigLoader.fromUri/watch",
    fromVersion = "r7")

  /** config hot-reload (the watch loop) as a disable-able surface */
  val ConfigWatch: Gate = global.register(
    "graft.confmap.watch", Beta,
    description = "allow ConfigLoader.watch polling reload loops",
    fromVersion = "r7")

  /** bare `$VAR` expansion in config documents — the deprecated
    * expandconverter form the reference still wires into its DEFAULT
    * converter set (otelcol/configprovider.go:139 →
    * confmap/converter/expandconverter). On by default for parity;
    * disabling (`-graft.confmap.expandLegacy`) is the opt-out for
    * configs carrying literal dollar text (`/data/$HOME/...`) that a
    * set env var would silently rewrite — exactly the corruption mode
    * the upstream deprecation cites. The modern `${env:VAR}` /
    * `${VAR}` forms are unaffected by this gate. */
  val ExpandLegacy: Gate = global.register(
    "graft.confmap.expandLegacy", Beta,
    description = "expand bare $VAR (deprecated expandconverter form) in configs",
    fromVersion = "r11")

  /** the reference's high-cardinality self-metrics guard
    * (internal/obsreportconfig/obsreportconfig.go:24-30, consumed at
    * service/service.go:83 → proctelemetry batchViews): when enabled,
    * the [[Obsreport.HighCardinalityViews]] filter set applies over
    * the obsreport catalog before any serving surface — a fleet with
    * per-peer receiver dimensions would otherwise explode its own
    * /metrics. Alpha and default-off, exactly the reference's
    * registration ("the gate will be removed when the collector
    * allows for view configuration" — graft already allows it, via
    * service::telemetry::metrics::views). */
  val DisableHighCardinalityMetrics: Gate = global.register(
    "telemetry.disableHighCardinalityMetrics", Alpha,
    description = "drop high-cardinality socket/host attributes from self-metrics",
    fromVersion = "r14")
}
