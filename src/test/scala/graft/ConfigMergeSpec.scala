package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ConfigLoader
import graft.pipeline.Pipeline

/** confmap multi-URI resolution: the repeatable --config flag —
  * documents retrieved in order, nested maps merged recursively,
  * scalars and lists replaced by the later overlay, formats mixable. */
class ConfigMergeSpec extends AnyFunSuite {

  private def write(name: String, content: String): String = {
    val f = java.nio.file.Files.createTempFile("cfg_", name)
    java.nio.file.Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  test("overlay retunes one nested knob; the base supplies the rest; lists replace wholesale") {
    // JSON base: one pipeline, parquet receiver at /base, one exporter
    val base = write(".json",
      """{"pipelines": {"logs/m": {
        |  "receiver": {"type": "parquet", "path": "/base/in"},
        |  "exporters": [{"type": "parquet", "path": "/base/out"},
        |                {"type": "logging"}]
        |}}}""".stripMargin)
    // YAML overlay: ONLY the receiver path — `type` must survive from
    // the base (recursive map merge), and the exporters list must
    // survive untouched
    val overlayPath = write(".yaml",
      """pipelines:
        |  logs/m:
        |    receiver:
        |      path: /override/in
        |""".stripMargin)
    val svc = ConfigLoader.fromUris(Seq(base, overlayPath))
    val p = svc.pipelines("logs/m")
    assert(p.receiver.asInstanceOf[Pipeline.ParquetReceiver].path == "/override/in")
    assert(p.exporters.size == 2, "untouched sibling list must survive the merge")

    // an overlay that REPLACES the exporters list replaces it
    // wholesale (lists never merge element-wise)
    val overlayList = write(".yaml",
      """pipelines:
        |  logs/m:
        |    exporters:
        |      - {type: logging}
        |""".stripMargin)
    val svc2 = ConfigLoader.fromUris(Seq(base, overlayList))
    assert(svc2.pipelines("logs/m").exporters.size == 1)
    // base receiver untouched by this overlay
    assert(svc2.pipelines("logs/m").receiver
      .asInstanceOf[Pipeline.ParquetReceiver].path == "/base/in")
  }

  test("merge order is document order: the LAST overlay wins") {
    val base = write(".json",
      """{"pipelines": {"logs/o": {
        |  "receiver": {"type": "parquet", "path": "/a"},
        |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    val o1 = write(".json",
      """{"pipelines": {"logs/o": {"receiver": {"path": "/b"}}}}""")
    val o2 = write(".json",
      """{"pipelines": {"logs/o": {"receiver": {"path": "/c"}}}}""")
    val svc = ConfigLoader.fromUris(Seq(base, o1, o2))
    assert(svc.pipelines("logs/o").receiver
      .asInstanceOf[Pipeline.ParquetReceiver].path == "/c")
    // reversed order, reversed winner
    val svc2 = ConfigLoader.fromUris(Seq(base, o2, o1))
    assert(svc2.pipelines("logs/o").receiver
      .asInstanceOf[Pipeline.ParquetReceiver].path == "/b")
  }

  test("an overlay can add a whole pipeline next to the base's") {
    val base = write(".json",
      """{"pipelines": {"logs/one": {
        |  "receiver": {"type": "parquet", "path": "/one"},
        |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    val add = write(".yaml",
      """pipelines:
        |  logs/two:
        |    receiver: {type: parquet, path: /two}
        |    exporters:
        |      - {type: logging}
        |""".stripMargin)
    val svc = ConfigLoader.fromUris(Seq(base, add))
    assert(svc.pipelines.keySet == Set("logs/one", "logs/two"))
  }

  test("zero URIs is a config error") {
    intercept[IllegalArgumentException] { ConfigLoader.fromUris(Nil) }
  }

  test("yaml: inline provider — `::`-delimited keys address nested maps (confmap/provider/yamlprovider)") {
    val base = write(".json",
      """{"pipelines": {"logs/y": {
        |  "receiver": {"type": "parquet", "path": "/base/in"},
        |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    // one nested knob retuned through an inline yaml: URI — no file
    val svc = ConfigLoader.fromUris(Seq(base,
      "yaml:pipelines::logs/y::receiver::path: /inline/in"))
    assert(svc.pipelines("logs/y").receiver
      .asInstanceOf[Pipeline.ParquetReceiver].path == "/inline/in")
    // the bytes are a full YAML document: nested YAML under a
    // delimited key works too, and YAML scalar typing applies
    val svc2 = ConfigLoader.fromUris(Seq(base,
      "yaml:pipelines::logs/y::receiver: {type: parquet, path: /deep/in}"))
    assert(svc2.pipelines("logs/y").receiver
      .asInstanceOf[Pipeline.ParquetReceiver].path == "/deep/in")
    // merge order still holds: the LAST yaml: overlay wins
    val svc3 = ConfigLoader.fromUris(Seq(base,
      "yaml:pipelines::logs/y::receiver::path: /a",
      "yaml:pipelines::logs/y::receiver::path: /b"))
    assert(svc3.pipelines("logs/y").receiver
      .asInstanceOf[Pipeline.ParquetReceiver].path == "/b")
    // an empty `::` segment is a config error, not a silent key —
    // including a TRAILING delimiter (split must keep empties)
    intercept[IllegalArgumentException] {
      ConfigLoader.fromUris(Seq(base, "yaml:pipelines::::x: 1"))
    }
    intercept[IllegalArgumentException] {
      ConfigLoader.fromUris(Seq(base, "yaml:pipelines::: 1"))
    }
  }
}
