package graft.pipeline

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions.{col, expr}
import graft.pipeline.Pipeline._

/** Declarative pipeline config (confmap/otelcol analog): a JSON
  * document describing receivers → processors → exporters builds a
  * runnable [[Pipeline.Service]]. Processor conditions/expressions are
  * Spark SQL strings, so the config surface is the full SQL function
  * library — the OTTL role in the collector.
  *
  * {
  *  "pipelines": {
  *   "logs/errors": {
  *    "receiver":   {"type": "table", "dir": "/data/sf", "table": "events"},
  *    "processors": [{"type": "filter", "where": "event_type = 'error'"},
  *                   {"type": "upsert", "name": "sev", "expr": "upper(event_type)"},
  *                   {"type": "drop", "columns": ["props"]},
  *                   {"type": "select", "exprs": ["event_id", "sev"]}],
  *    "exporters":  [{"type": "parquet", "path": "/out/errors"}]
  *   }
  *  }
  * }
  */
object ConfigLoader {

  def fromJson(json: String): Service = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readValue(json, classOf[java.util.Map[String, Object]]).asScala
    val pipelines = root("pipelines").asInstanceOf[java.util.Map[String, Object]].asScala
    Service(pipelines.map { case (name, defn0) =>
      val defn = defn0.asInstanceOf[java.util.Map[String, Object]].asScala
      name -> PipelineDef(
        receiver = buildReceiver(asMap(defn("receiver"))),
        processors = defn.get("processors").toSeq
          .flatMap(_.asInstanceOf[java.util.List[Object]].asScala)
          .map(p => buildProcessor(asMap(p))),
        exporters = defn.get("exporters").toSeq
          .flatMap(_.asInstanceOf[java.util.List[Object]].asScala)
          .map(e => buildExporter(asMap(e))))
    }.toMap)
  }

  private def asMap(o: Object): Map[String, Object] =
    o.asInstanceOf[java.util.Map[String, Object]].asScala.toMap

  private def str(m: Map[String, Object], k: String): String = m(k).toString

  private def buildReceiver(m: Map[String, Object]): Receiver = str(m, "type") match {
    case "table"          => TableReceiver(str(m, "dir"), str(m, "table"))
    case "parquet"        => ParquetReceiver(str(m, "path"))
    case "otlp_json_logs" => OtlpJsonLogReceiver(str(m, "path"))
    case other => throw new IllegalArgumentException(s"unknown receiver type: $other")
  }

  private def buildProcessor(m: Map[String, Object]): Stage = str(m, "type") match {
    case "filter" => df => df.filter(expr(str(m, "where")))
    case "upsert" => df => df.withColumn(str(m, "name"), expr(str(m, "expr")))
    case "drop" => df => df.drop(
      m("columns").asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSeq: _*)
    case "select" => df => df.selectExpr(
      m("exprs").asInstanceOf[java.util.List[Object]].asScala.map(_.toString).toSeq: _*)
    case "sample" => df =>
      graft.operators.Processors.probabilisticSample(df, col(str(m, "id")),
        m("hexDigits").asInstanceOf[Number].intValue())
    case other => throw new IllegalArgumentException(s"unknown processor type: $other")
  }

  private def buildExporter(m: Map[String, Object]): Exporter = str(m, "type") match {
    case "parquet" => ParquetExporter(str(m, "path"),
      partitionBy = m.get("partitionBy").toSeq
        .flatMap(_.asInstanceOf[java.util.List[Object]].asScala.map(_.toString)))
    case "logging" => LoggingExporter()
    case other => throw new IllegalArgumentException(s"unknown exporter type: $other")
  }
}
