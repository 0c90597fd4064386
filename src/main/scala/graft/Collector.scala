package graft

import graft.pipeline.{ConfigLoader, FeatureGate}

/** otelcol command surface (reference: otelcol/command.go +
  * otelcol/collector.go — the collector binary's CLI): the
  * repeatable `--config` flag resolved through the confmap providers
  * and merged in order, `--feature-gates` flag syntax, and the
  * subcommands a collector operator actually runs:
  *
  *  - `validate`      — build the whole config (components, wiring,
  *                      connector graph, gates) and report; exit 0/1
  *                      (otelcol/command_validate.go)
  *  - `print-config`  — the resolved document with opaque fields
  *                      `[REDACTED]` (the print-initial-config flow
  *                      over configopaque marshaling)
  *  - `components`    — every buildable component type
  *                      (otelcol/command_components.go)
  *  - `run`           — recover persistent queues, then run every
  *                      pipeline once (the batch-engine analog of the
  *                      service lifecycle: queue redelivery precedes
  *                      new data — collector.go setupConfiguration →
  *                      Run)
  *  - `builder`       — the ocb analog (cmd/builder): a manifest
  *                      names the components a DISTRIBUTION contains;
  *                      builder validates every entry against the
  *                      registry and emits the distribution file.
  *                      `validate`/`run --distribution <file>` then
  *                      refuse configs referencing components outside
  *                      it — a built collector simply does not
  *                      contain them.
  *
  * `execute` is the testable core: args in, exit code out, all
  * output on the supplied stream. `main` adapts it to the process
  * boundary.
  */
object Collector {

  /** the buildable component registry, grouped like the reference's
    * components command output (pinned to the ConfigLoader build
    * matches by CollectorCliSpec) */
  val componentTypes: Map[String, Seq[String]] = Map(
    "receivers" -> Seq("table", "parquet", "otlp_json_logs", "otlp_pb_logs",
      "otlp_pb_logs_gz", "arrow_logs", "stream_json_logs", "stream_pb_logs",
      "scrape_jvm", "otlp_http", "otlp_grpc", "otlp_arrow", "warc", "jsonl",
      "forward", "union"),
    "processors" -> Seq("filter", "upsert", "drop", "select", "sample",
      "route", "batch", "batch_by_metadata", "batch_timed", "aggregate"),
    "exporters" -> Seq("parquet", "parquet_by_metadata", "parquet_queued",
      "parquet_persistent", "arrow_spool", "arrow_pool", "logging", "debug",
      "otlp_http", "otlp_grpc", "otlp_arrow", "jsonl"),
    "extensions" -> Seq("file_storage", "memory_ballast", "zpages"))

  /** load a builder-emitted distribution file: kind → allowed types */
  private def readDistribution(path: String): Map[String, Set[String]] = {
    import scala.jdk.CollectionConverters._
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(new java.io.File(path), classOf[java.util.Map[String, Object]])
    Option(root.get("components")).map(_.asInstanceOf[java.util.Map[String, Object]])
      .map(_.asScala.map { case (k, v) =>
        k -> v.asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSet
      }.toMap)
      .getOrElse(Map.empty)
  }

  def main(args: Array[String]): Unit =
    sys.exit(execute(args.toSeq, System.out))

  def execute(args: Seq[String], out: java.io.PrintStream): Int = {
    val (cmd, rest) = args match {
      case head +: tail if !head.startsWith("--") => (head, tail)
      case _ => ("run", args)
    }
    // flag parse: --config is REPEATABLE (merged in order);
    // --feature-gates takes the registry flag syntax
    val configs = scala.collection.mutable.ArrayBuffer[String]()
    val gateFlags = scala.collection.mutable.ArrayBuffer[String]()
    val sets = scala.collection.mutable.ArrayBuffer[String]()
    var manifest: Option[String] = None
    var output: Option[String] = None
    var distribution: Option[String] = None
    var i = 0
    val it = rest.toIndexedSeq
    while (i < it.size) {
      it(i) match {
        case "--config" if i + 1 < it.size => configs += it(i + 1); i += 2
        case "--feature-gates" if i + 1 < it.size => gateFlags += it(i + 1); i += 2
        case flag if flag.startsWith("--set=") => sets += flag.stripPrefix("--set="); i += 1
        case "--set" if i + 1 < it.size => sets += it(i + 1); i += 2
        case "--manifest" if i + 1 < it.size => manifest = Some(it(i + 1)); i += 2
        case "--output" if i + 1 < it.size => output = Some(it(i + 1)); i += 2
        case "--distribution" if i + 1 < it.size => distribution = Some(it(i + 1)); i += 2
        case other =>
          out.println(s"unknown flag: $other")
          return 1
      }
    }

    /** distribution gate: every component type the config uses must
      * be in the built distribution's manifest */
    def checkDistribution(): Boolean = distribution match {
      case None => true
      case Some(path) =>
        val dist = readDistribution(path)
        val used = ConfigLoader.usedComponentTypes(configs.toSeq,
          sets = sets.toSeq)
        val missing = used.toSeq.sortBy(_._1).flatMap { case (kind, types) =>
          (types -- dist.getOrElse(kind, Set.empty)).toSeq.sorted
            .map(t => s"$kind/$t")
        }
        if (missing.nonEmpty)
          out.println(s"Error: config uses components not in the " +
            s"distribution: ${missing.mkString(", ")}")
        missing.isEmpty
    }

    def requireConfigs(): Boolean = {
      if (configs.isEmpty) out.println("at least one --config is required")
      configs.nonEmpty
    }

    try {
      gateFlags.foreach(FeatureGate.global.applyFlags)
      cmd match {
        case "components" =>
          componentTypes.toSeq.sortBy(_._1).foreach { case (kind, types) =>
            out.println(s"$kind:")
            types.foreach(t => out.println(s"  - $t"))
          }
          0
        case "builder" =>
          manifest match {
            case None => out.println("builder requires --manifest"); 1
            case Some(mf) =>
              val text = new String(java.nio.file.Files.readAllBytes(
                java.nio.file.Paths.get(mf)), "UTF-8")
              val mapper =
                if (text.dropWhile(_.isWhitespace).startsWith("{"))
                  new com.fasterxml.jackson.databind.ObjectMapper()
                else new com.fasterxml.jackson.databind.ObjectMapper(
                  new com.fasterxml.jackson.dataformat.yaml.YAMLFactory())
              val root = mapper.readValue(text,
                classOf[java.util.Map[String, Object]])
              import scala.jdk.CollectionConverters._
              val name = Option(root.get("dist"))
                .map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
                .flatMap(_.get("name")).map(_.toString).getOrElse("graft-custom")
              val kinds = Seq("receivers", "processors", "exporters", "extensions")
              val requested: Map[String, Seq[String]] = kinds.map { k =>
                k -> Option(root.get(k)).toSeq
                  .flatMap(_.asInstanceOf[java.util.List[Object]].asScala)
                  .map(_.toString)
              }.toMap
              // the build fails on a component the registry cannot
              // provide — ocb's unresolvable-module error
              val unknown = requested.toSeq.sortBy(_._1).flatMap {
                case (k, types) =>
                  types.filterNot(componentTypes.getOrElse(k, Nil).contains)
                    .map(t => s"$k/$t")
              }
              if (unknown.nonEmpty) {
                out.println(s"Error: manifest requests unknown components: " +
                  unknown.mkString(", "))
                return 1
              }
              val json = new com.fasterxml.jackson.databind.ObjectMapper()
                .writerWithDefaultPrettyPrinter()
                .writeValueAsString(Map(
                  "name" -> name,
                  "components" -> requested.map { case (k, v) =>
                    k -> v.asJava }.asJava).asJava)
              output match {
                case Some(o) =>
                  java.nio.file.Files.write(java.nio.file.Paths.get(o),
                    json.getBytes("UTF-8"))
                  out.println(s"built distribution '$name' -> $o")
                case None => out.println(json)
              }
              0
          }
        case "validate" =>
          if (!requireConfigs()) return 1
          if (!checkDistribution()) return 1
          ConfigLoader.fromUris(configs.toSeq, sets = sets.toSeq)
          out.println("OK")
          0
        case "print-config" =>
          // note: prints each resolved DOCUMENT; --set overrides apply
          // at build time (validate/run) and are visible there — the
          // documents themselves are the render unit, as in the
          // reference's per-source print
          if (!requireConfigs()) return 1
          // validate first (a broken document should not pretty-print
          // as if it were deployable), then render redacted
          ConfigLoader.fromUris(configs.toSeq)
          val docs = configs.toSeq.map { u =>
            // re-retrieve through the provider chain for rendering
            val text = u match {
              case e if e.startsWith("env:") =>
                sys.env.getOrElse(e.stripPrefix("env:"), "")
              case f => new String(java.nio.file.Files.readAllBytes(
                java.nio.file.Paths.get(f.stripPrefix("file:"))), "UTF-8")
            }
            ConfigLoader.effectiveConfig(text,
              yaml = !text.dropWhile(_.isWhitespace).startsWith("{"))
          }
          docs.foreach(out.println)
          0
        case "run" =>
          if (!requireConfigs()) return 1
          if (!checkDistribution()) return 1
          val svc = ConfigLoader.fromUris(configs.toSeq, sets = sets.toSeq)
          val spark = GraftSession.get()
          // service::telemetry::logs: lifecycle messages ALSO flow
          // through the service's own configured logger (level/
          // encoding/output_paths — the reference collector logs via
          // its zap logger while the otelcol command keeps stdout);
          // the CLI output contract on `out` is unchanged
          // logs::processors realized BEFORE the logger so every
          // admitted record of the run reaches them — the third
          // self-telemetry signal (OTLP or console export of the
          // service's own log records)
          val logProcs = svc.telemetryLogProcessors.map(c =>
            c.realizeLogs(spark, svc.telemetryResource,
              svc.telemetryLogs.map(_.initialFields).getOrElse(Map.empty),
              out, autoStart = false))
          // the DEFAULT service logger (r15 verdict #4): the
          // reference's service builds its zap logger UNCONDITIONALLY
          // with production defaults (telemetry.go newLogger — level
          // info, console encoding, stderr); graft previously built
          // one only when `logs:` was configured, so a plain run had
          // no logger for self-telemetry to observe. Absent block =
          // those same defaults; the CLI's stdout contract on `out`
          // is unchanged (the default logger writes to stderr), and a
          // `logs:` block carrying ONLY `processors:` now means
          // "default zap + export the run's records" — one step past
          // the reference, whose generated schema declares
          // LogRecordProcessor but whose service never wires it.
          val slog = new graft.pipeline.ServiceLogger(
            svc.telemetryLogs.getOrElse(graft.pipeline.ServiceLogger.LogsConfig()),
            processors = logProcs)
          def lifecycle(msg: String): Unit = {
            out.println(msg); slog.info(msg)
          }
          // the service's own TracerProvider analog (telemetry.go:
          // 46-50: built unconditionally so zpages can serve tracez;
          // the configured sampler mode decides what it records —
          // the default record-only parent-based composition keeps
          // spans zpages-visible without marking them sampled)
          // traces::processors realized BEFORE the tracer so every
          // recorded span of the run reaches them (batch processors
          // exporting the service's own spans — console or OTLP; the
          // sampler below gates what actually exports)
          val spanProcs = svc.telemetrySpanProcessors.map(c =>
            c.realize(spark, svc.telemetryResource, out,
              autoStart = false))
          val tracer = new graft.pipeline.SelfTrace.Tracer(
            svc.telemetrySampler, processors = spanProcs)
          // the processors' bracket: everything above REALIZED with
          // autoStart=false — a throw in ServiceLogger validation or
          // span-processor realization leaks no threads because none
          // run yet. The flush daemons start as the FIRST statements
          // inside this try, so every running thread is covered by
          // the backstop finally from the instant it exists (records
          // enqueued before start() just wait in the bounded queue;
          // the final flush drains them either way). Shutdown is
          // idempotent — the data-path finally flushes them FIRST,
          // while receivers still accept; this outer backstop only
          // matters on the early-failure path.
          try {
          logProcs.foreach(_.start())
          spanProcs.foreach(_.start())
          spanProcs.foreach(_ => lifecycle("started batch span processor"))
          // extension lifecycle brackets the data path (reference
          // service.go: extensions start first, stop last)
          svc.startExtensions()
          svc.extensions.foreach(e => lifecycle(s"started extension ${e.name}"))
          // host wiring: the zpages extension observes the built
          // service (and the first config document for /debug/configz)
          svc.extensions.collect {
            case z: graft.pipeline.Extensions.ZpagesExtension =>
              val doc = configs.headOption
                .filterNot(u => u.startsWith("env:") || u.startsWith("http"))
                .flatMap { u =>
                  try Some(new String(java.nio.file.Files.readAllBytes(
                    java.nio.file.Paths.get(u.stripPrefix("file:"))), "UTF-8"))
                  catch { case scala.util.control.NonFatal(_) => None }
                }
              z.bind(svc, spark, doc, tracer = tracer)
              lifecycle(s"zpages serving on localhost:${z.boundPort}")
          }
          // the data path brackets: a failing recovery/pipeline/query
          // — or a bad telemetry address below — must still stop
          // receivers and shut extensions down, or the zpages server /
          // socket listeners / scrape threads leak in the embedding
          // JVM (reference collector.go shuts down on failure paths
          // too); the Prometheus server therefore starts INSIDE the
          // bracket
          var promSrv: Option[graft.pipeline.PromTelemetryServer] = None
          // service-lifetime obsreport catalog: batch pipelines record
          // accepted/refused/sent/send_failed/dropped per component
          // into it (runObsreport); scraper tallies mirror in at
          // scrape time. Same-id components SUM by construction.
          val obsReg = new graft.pipeline.Obsreport.Registry
          var readerSrvs: Seq[graft.pipeline.PromTelemetryServer] = Nil
          var periodicWriters: Seq[graft.pipeline.PeriodicMetricsWriter] = Nil
          var otlpPushers: Seq[graft.pipeline.SelfTelemetryOtlp.PeriodicOtlpPusher] = Nil
          try {
            // service::telemetry::metrics::address: the self-metrics
            // Prometheus endpoint (telemetry.go:202-206). The
            // transports thunk reads the LIVE obsreport counters off
            // every wire receiver the service started, so a raised
            // telemetry level actually serves the per-transport
            // families it promises.
            // TWO receivers of one transport type (two pipelines,
            // two ports) must SUM per counter — a plain .toMap
            // would keep only the last receiver's map and the
            // other's accepted/refused traffic would silently
            // vanish from /metrics (mergeTransports, spec-pinned)
            val transportsThunk = () => graft.pipeline.PromTelemetryServer
              .mergeTransports(svc.pipelines.values.toSeq.flatMap { p =>
                p.receiver match {
                  case r: graft.pipeline.Pipeline.OtlpHttpServerReceiver =>
                    r.counters.map("otlp_http" -> _)
                  case r: graft.pipeline.Pipeline.OtlpGrpcServerReceiver =>
                    r.counters.map("otlp_grpc" -> _)
                  case r: graft.pipeline.Pipeline.OtlpArrowServerReceiver =>
                    r.counters.map("otlp_arrow" -> _)
                  case _ => None
                }
              })
            val obsreportThunk = () => {
              // refresh the scraper mirrors at scrape time. The
              // ScraperObs totals are LIFETIME, so the registry entry
              // is a set() — but two receivers sharing one declared
              // id must SUM (the mergeTransports discipline), so the
              // snapshots aggregate per (receiver id, scraper) BEFORE
              // the set; a last-wins loop would clobber one
              // receiver's points with the other's. MultiReceiver
              // members unwrap (receiverIds is aligned flat), named
              // receivers keep their declared `type/name` id.
              def unwrap(r: graft.pipeline.Pipeline.Receiver)
                  : Seq[graft.pipeline.Pipeline.Receiver] = r match {
                case graft.pipeline.Pipeline.MultiReceiver(rs) => rs.flatMap(unwrap)
                case graft.pipeline.Pipeline.ClientInfoReceiver(inner, _) => unwrap(inner)
                case x => Seq(x)
              }
              val tallies = svc.pipelines.values.toSeq.flatMap { p =>
                unwrap(p.receiver).zipWithIndex.collect {
                  case (r: graft.pipeline.Pipeline.ScrapeJvmReceiver, i) =>
                    val id = p.receiverIds.lift(i).map(_._1).getOrElse("scrape_jvm")
                    r.scraperCounters.toSeq.map { case (scraper, c) =>
                      ((id, scraper),
                        (c.getOrElse("scraped_points", 0L),
                         c.getOrElse("errored_points", 0L)))
                    }
                }.flatten
              }
              tallies.groupBy(_._1).foreach { case ((id, scraper), vs) =>
                obsReg.scraperScraped(id, scraper, vs.map(_._2._1).sum)
                obsReg.scraperErrored(id, scraper, vs.map(_._2._2).sum)
              }
              obsReg
            }
            promSrv = svc.telemetryAddress.map { addr =>
              val s = new graft.pipeline.PromTelemetryServer(svc, spark, addr,
                transports = transportsThunk, obsreport = obsreportThunk)
              lifecycle(
                s"telemetry metrics on localhost:${s.boundPort}/metrics")
              s
            }
            // service::telemetry::metrics::readers — the reader-list
            // shape alongside `address` (telemetry/config.go:111-161):
            // every pull reader gets its own Prometheus server on the
            // SAME healthFrame thunks; every periodic reader an
            // interval-driven console jsonl writer
            svc.telemetryReaders.foreach {
              case r: graft.pipeline.Extensions.PullPrometheusReader =>
                val s = new graft.pipeline.PromTelemetryServer(svc, spark,
                  r.address, transports = transportsThunk,
                  obsreport = obsreportThunk)
                readerSrvs :+= s
                lifecycle(s"telemetry pull reader on " +
                  s"localhost:${s.boundPort}/metrics")
              case p: graft.pipeline.Extensions.PeriodicConsoleReader =>
                periodicWriters :+= new graft.pipeline.PeriodicMetricsWriter(
                  svc, spark, p.intervalMs,
                  transports = transportsThunk, obsreport = obsreportThunk)
                lifecycle(s"telemetry periodic console reader " +
                  s"every ${p.intervalMs} ms")
              case p: graft.pipeline.Extensions.PeriodicOtlpReader =>
                // the OTLP push reader: same healthFrame, same level
                // gate, shipped to a remote backend through the
                // existing otlp client machinery
                otlpPushers :+= new graft.pipeline.SelfTelemetryOtlp
                  .PeriodicOtlpPusher(svc, spark, p.intervalMs,
                    graft.pipeline.SelfTelemetryOtlp.metricExporter(p.otlp),
                    transports = transportsThunk, obsreport = obsreportThunk)
                lifecycle(s"telemetry periodic otlp push to " +
                  s"${p.otlp.endpoint} (${p.otlp.protocol}) " +
                  s"every ${p.intervalMs} ms")
            }
            val recovered = svc.recover(spark)
            recovered.foreach { case (name, st) =>
              lifecycle(s"recovered $name: redelivered=${st.redelivered} " +
                s"dlq=${st.deadLettered}")
            }
            // batch pipelines run to completion; streaming pipelines
            // start, drain everything currently spooled, and stop —
            // the CLI's run is "process what's there" (a daemon keeps
            // the queries via Service.runStreaming directly)
            val (streamingDefs, batchDefs) =
              svc.pipelines.partition(_._2.plan(spark).isStreaming)
            // obsreport accounting costs a dedicated counting pass
            // per pipeline (runObsreport's exact-stats price) — pay
            // it only when the catalog has a consumer: level ≥ basic
            // AND something serves it (the telemetry address server
            // or a configured metrics reader). A plain config with
            // neither runs N_exporters executions, not N+1.
            // Siblings run even when one fails and the first failure
            // rethrows after all ran (Service.runObsreport semantics,
            // pinned in ZpagesSpec) — on BOTH paths: which pipelines
            // execute after a failure must not depend on the
            // telemetry knob.
            val obsConsumers = svc.telemetryAddress.nonEmpty ||
              svc.telemetryReaders.nonEmpty
            val withObs = obsConsumers && svc.telemetryLevel.rank >=
              graft.pipeline.Extensions.LevelBasic.rank
            var batchFailed: Throwable = null
            batchDefs.toSeq.sortBy(_._1).foreach { case (name, p) =>
              try {
                // both paths self-trace (the reference's provider is
                // always on; the SAMPLER decides what records) — the
                // obs path adds per-component children with row
                // counts, the plain path a root + exporter children
                if (withObs) p.runObsreport(spark, name, obsReg, tracer)
                else p.runTraced(spark, name, tracer)
              } catch { case e: Throwable =>
                if (batchFailed == null) batchFailed = e }
            }
            if (batchFailed != null) throw batchFailed
            if (streamingDefs.nonEmpty) {
              val ckpt = java.nio.file.Files
                .createTempDirectory("graft_cli_ckpt").toString
              val queries = svc.runStreaming(spark, ckpt)
              queries.values.flatten.foreach { q =>
                q.processAllAvailable(); q.stop()
              }
              lifecycle(s"drained ${queries.size} streaming pipeline(s)")
            }
            // the closing record logs INSIDE the data-path bracket so
            // the logs self-telemetry flush still carries it ("every
            // admitted record reaches the processors" — a record
            // emitted after their shutdown would silently vanish from
            // the exported stream; review-wave finding). Success-path
            // only, same as before.
            lifecycle(s"ran ${svc.pipelines.size} pipeline(s)")
          } finally {
            // self-telemetry exits FIRST, while receivers still
            // accept: the final metric push and span flush may
            // loop back into a receiver of this very service
            otlpPushers.foreach(p =>
              try p.stop() // final export (periodic reader Shutdown)
              catch { case scala.util.control.NonFatal(_) => () })
            spanProcs.foreach(p =>
              try p.shutdown() // stop loop + final flush
              catch { case scala.util.control.NonFatal(_) => () })
            logProcs.foreach(p =>
              try p.shutdown() // stop loop + final flush
              catch { case scala.util.control.NonFatal(_) => () })
            periodicWriters.foreach(w =>
              try w.stop()
              catch { case scala.util.control.NonFatal(_) => () })
            readerSrvs.foreach(s =>
              try s.stop()
              catch { case scala.util.control.NonFatal(_) => () })
            promSrv.foreach(s =>
              try s.stop()
              catch { case scala.util.control.NonFatal(_) => () })
            try svc.stopReceivers()
            catch { case scala.util.control.NonFatal(_) => () }
            // exporters next (pooled Arrow stream sockets / delta
            // encoder allocators live here) — before extensions, the
            // reference service teardown order
            try svc.shutdownExporters()
            catch { case scala.util.control.NonFatal(_) => () }
            svc.shutdownExtensions()
            // last words written, release the self-logger's file
            // handles (per-run loggers must not leak fds in an
            // embedding JVM that calls run repeatedly)
            try slog.close()
            catch { case scala.util.control.NonFatal(_) => () }
          }
          } finally {
            // leak backstop for the span/log-processor daemon threads
            // (no-op when the data-path finally already flushed them)
            spanProcs.foreach(p =>
              try p.shutdown()
              catch { case scala.util.control.NonFatal(_) => () })
            logProcs.foreach(p =>
              try p.shutdown()
              catch { case scala.util.control.NonFatal(_) => () })
          }
          // the closing record printed inside the bracket may have
          // reopened a closed file sink (sinks reopen on demand after
          // close) — release it again before return
          try slog.close()
          catch { case scala.util.control.NonFatal(_) => () }
          0
        case other =>
          out.println(s"unknown command: $other " +
            "(validate | print-config | components | run | builder)")
          1
      }
    } catch {
      case e: IllegalArgumentException => out.println(s"Error: ${e.getMessage}"); 1
      case e: IllegalStateException => out.println(s"Error: ${e.getMessage}"); 1
      case e: java.io.IOException => out.println(s"Error: ${e.getMessage}"); 1
    }
  }
}
