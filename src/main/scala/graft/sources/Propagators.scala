package graft.sources

/** `service::telemetry::traces::propagators` — the text-map context
  * propagators the reference composes for its self-telemetry
  * (service/telemetry.go:234-245: `tracecontext` → W3C TraceContext,
  * `b3` → the B3 propagator, anything else refuses the config).
  *
  * Semantics follow the OpenTelemetry propagator contracts:
  *  - TraceContext: the `traceparent` header
  *    `vv-{32 hex trace id}-{16 hex span id}-{2 hex flags}`; version
  *    `ff` and all-zero ids are invalid (W3C §4.4); sampled = bit 0
  *    of flags. Inject writes version 00.
  *  - B3: extraction accepts BOTH the single `b3` header
  *    (`{traceId}-{spanId}[-{sampling}[-{parentSpanId}]]`, sampling
  *    `0|1|d` where `d` (debug) implies sampled; a lone `0` denies)
  *    and the multi `x-b3-traceid`/`x-b3-spanid`/`x-b3-sampled`/
  *    `x-b3-flags` form (`x-b3-flags: 1` = debug). 64-bit (16 hex)
  *    trace ids left-pad to 128-bit. Injection writes the single
  *    header — the contrib b3.New() default.
  *  - Composite: extract runs every member IN ORDER and a later
  *    successful extraction overrides an earlier one (the OTel
  *    composite contract — each member updates the context); inject
  *    writes the union of every member's headers.
  *
  * Header lookup is case-insensitive (HTTP field names).
  */
object Propagators {

  /** the extracted trace context (SpanContext's wire-relevant core) */
  final case class SpanContext(traceId: String, spanId: String, sampled: Boolean)

  sealed trait TextMap {
    /** the header names this propagator reads/writes (lowercase) */
    def fields: Seq[String]
    def extract(headers: Map[String, String]): Option[SpanContext]
    def inject(ctx: SpanContext): Map[String, String]
  }

  private def lower(headers: Map[String, String]): Map[String, String] =
    headers.map { case (k, v) => k.toLowerCase -> v }

  private def hexValid(s: String, len: Int): Boolean =
    s.length == len && s.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')) &&
      s.exists(_ != '0') // all-zero ids are invalid in both schemes

  case object TraceContext extends TextMap {
    val fields: Seq[String] = Seq("traceparent")
    // version 00 is EXACTLY four fields; a FUTURE version may carry
    // additional `-`-delimited fields after the flags (W3C §4.3
    // forward compatibility: parse the known prefix, ignore the rest)
    private val Re = "^([0-9a-f]{2})-([0-9a-f]{32})-([0-9a-f]{16})-([0-9a-f]{2})(-.+)?$".r
    def extract(headers: Map[String, String]): Option[SpanContext] =
      lower(headers).get("traceparent").flatMap {
        case Re(ver, tid, sid, flags, trailing)
            if ver != "ff" && hexValid(tid, 32) && hexValid(sid, 16) &&
              (trailing == null || ver != "00") =>
          // flags bit 0 = sampled (W3C trace-flags)
          Some(SpanContext(tid, sid,
            (Integer.parseInt(flags, 16) & 1) == 1))
        case _ => None
      }
    def inject(ctx: SpanContext): Map[String, String] =
      Map("traceparent" ->
        s"00-${ctx.traceId}-${ctx.spanId}-${if (ctx.sampled) "01" else "00"}")
  }

  case object B3 extends TextMap {
    val fields: Seq[String] =
      Seq("b3", "x-b3-traceid", "x-b3-spanid", "x-b3-sampled", "x-b3-flags")
    private def padTrace(tid: String): Option[String] =
      if (hexValid(tid, 32)) Some(tid)
      else if (hexValid(tid, 16)) Some("0" * 16 + tid)
      else None
    private def sampledOf(s: String): Boolean = s match {
      case "1" | "d" | "true" => true
      case _ => false
    }
    def extract(headers: Map[String, String]): Option[SpanContext] = {
      val h = lower(headers)
      // a PRESENT single header DECIDES — the B3 precedence rule: its
      // deny marker ("b3: 0") or a malformed value must not fall
      // through to the multi form and resurrect a context the single
      // header refused. split with limit -1 keeps trailing empties,
      // so "tid-sid-" is malformed, not a 2-part context.
      if (h.contains("b3")) h.get("b3").flatMap { v =>
        v.split("-", -1) match {
          case Array(tid, sid) =>
            // no sampling state: defer (unsampled context still rides)
            for (t <- padTrace(tid) if hexValid(sid, 16))
              yield SpanContext(t, sid, sampled = false)
          case parts if parts.length == 3 || parts.length == 4 =>
            // single-header sampling state is STRICTLY 0|1|d (the
            // multi form's true/false spellings are not valid here),
            // and a 4th field must be a well-formed parent span id —
            // "tid-sid-" (empty state) is malformed, not unsampled
            for {
              t <- padTrace(parts(0))
              if hexValid(parts(1), 16)
              if Set("0", "1", "d")(parts(2))
              if parts.length == 3 || hexValid(parts(3), 16)
            } yield SpanContext(t, parts(1), parts(2) != "0")
          case _ => None // incl. the lone "0" deny marker: no context
        }
      }
      else for {
        t0 <- h.get("x-b3-traceid"); t <- padTrace(t0)
        s <- h.get("x-b3-spanid") if hexValid(s, 16)
      } yield SpanContext(t, s,
        h.get("x-b3-flags").contains("1") ||
          h.get("x-b3-sampled").exists(sampledOf))
    }
    def inject(ctx: SpanContext): Map[String, String] =
      Map("b3" ->
        s"${ctx.traceId}-${ctx.spanId}-${if (ctx.sampled) "1" else "0"}")
  }

  final case class Composite(members: Seq[TextMap]) extends TextMap {
    def fields: Seq[String] = members.flatMap(_.fields).distinct
    def extract(headers: Map[String, String]): Option[SpanContext] =
      members.foldLeft(Option.empty[SpanContext]) { (acc, p) =>
        p.extract(headers).orElse(acc)
      }
    def inject(ctx: SpanContext): Map[String, String] =
      members.foldLeft(Map.empty[String, String])((acc, p) => acc ++ p.inject(ctx))
  }

  /** telemetry.go textMapPropagatorFromConfig: named members in
    * declared order; an unknown name refuses the config. An empty
    * list composes to a no-op (extracts nothing, injects nothing). */
  def fromConfig(names: Seq[String]): Composite =
    Composite(names.map {
      case "tracecontext" => TraceContext
      case "b3" => B3
      case other => throw new IllegalArgumentException(
        s"unsupported propagator '$other' (tracecontext|b3)")
    })
}
