package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{ConfigLoader, FeatureGate}
import graft.pipeline.FeatureGate._

/** featuregate semantics (reference featuregate/: gate.go, stage.go,
  * registry.go, flag.go) plus the config-surface override. */
class FeatureGateSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private def reg(): Registry = new Registry

  test("stage fixes the default: alpha/deprecated off, beta/stable on") {
    val r = reg()
    assert(!r.register("a", Alpha).isEnabled)
    assert(r.register("b", Beta).isEnabled)
    assert(r.register("s", Stable, toVersion = "v9").isEnabled)
    assert(!r.register("d", Deprecated, toVersion = "v9").isEnabled)
  }

  test("registration rejects duplicates and missing removal versions") {
    val r = reg()
    r.register("dup", Alpha)
    assert(intercept[IllegalArgumentException] { r.register("dup", Beta) }
      .getMessage.contains("pre-existing"))
    assert(intercept[IllegalArgumentException] { r.register("st", Stable) }
      .getMessage.contains("no removal version"))
    assert(intercept[IllegalArgumentException] { r.register("de", Deprecated) }
      .getMessage.contains("no removal version"))
  }

  test("set: unknown gates and terminal-stage overrides are errors") {
    val r = reg()
    r.register("a", Alpha)
    r.register("s", Stable, toVersion = "v9")
    r.register("d", Deprecated, toVersion = "v9")
    r.set("a", true); assert(r.isEnabled("a"))
    r.set("a", false); assert(!r.isEnabled("a"))
    assert(intercept[IllegalArgumentException] { r.set("nope", true) }
      .getMessage.contains("no such feature gate"))
    assert(intercept[IllegalStateException] { r.set("s", false) }
      .getMessage.contains("stable"))
    assert(intercept[IllegalStateException] { r.set("d", true) }
      .getMessage.contains("deprecated"))
    // the no-op direction is accepted (reference warns, succeeds)
    r.set("s", true); r.set("d", false)
  }

  test("flag syntax applies and round-trips") {
    val r = reg()
    r.register("one", Alpha); r.register("two", Beta); r.register("three", Alpha)
    r.applyFlags("one,-two,+three")
    assert(r.isEnabled("one") && !r.isEnabled("two") && r.isEnabled("three"))
    // String() form: lexicographic, disabled prefixed with '-'
    assert(r.flagString == "one,three,-two")
    // round-trip: applying the string to an equal registry reproduces it
    val r2 = reg()
    r2.register("one", Alpha); r2.register("two", Beta); r2.register("three", Alpha)
    r2.applyFlags(r.flagString)
    assert(r2.flagString == r.flagString)
  }

  test("config override flips gates; unknown gate rejects the document") {
    val r = reg()
    r.register("graft.test.alpha", Alpha)
    val cfg = s"""{"featuregates": ["graft.test.alpha"],
      "pipelines": {"p": {
        "receiver": {"type": "table", "dir": "$sf", "table": "region"},
        "exporters": []}}}"""
    ConfigLoader.fromJson(cfg, gates = r)
    assert(r.isEnabled("graft.test.alpha"))
    val bad = cfg.replace("graft.test.alpha", "graft.test.typo")
    assert(intercept[IllegalArgumentException] {
      ConfigLoader.fromJson(bad, gates = r)
    }.getMessage.contains("no such feature gate"))
  }

  test("a document rejected after the gate list leaves gate state untouched") {
    // parse must not be a side-effecting operation: a config that flips
    // a gate but fails LATER validation (here: a receiver forwarding
    // from an undefined pipeline) must leave the live registry exactly
    // as it was — otherwise a watch-loop reload of a bad document
    // mutates gate state it claims to have rejected.
    val r = reg()
    r.register("graft.test.alpha", Alpha)
    r.register("graft.test.beta", Beta)
    val bad = s"""{"featuregates": ["graft.test.alpha,-graft.test.beta"],
      "pipelines": {"p": {
        "receiver": {"type": "forward", "from": "no_such_pipeline"},
        "exporters": []}}}"""
    intercept[IllegalArgumentException] { ConfigLoader.fromJson(bad, gates = r) }
    assert(!r.isEnabled("graft.test.alpha"), "alpha flip leaked from a rejected document")
    assert(r.isEnabled("graft.test.beta"), "beta flip leaked from a rejected document")
    // the same flips in a VALID document do commit
    val good = s"""{"featuregates": ["graft.test.alpha,-graft.test.beta"],
      "pipelines": {"p": {
        "receiver": {"type": "table", "dir": "$sf", "table": "region"},
        "exporters": []}}}"""
    ConfigLoader.fromJson(good, gates = r)
    assert(r.isEnabled("graft.test.alpha") && !r.isEnabled("graft.test.beta"))
  }

  test("disabling graft.confmap.httpProvider closes the http config surface") {
    FeatureGate.global.set(FeatureGate.HttpConfigProvider.id, false)
    try {
      val e = intercept[IllegalStateException] {
        ConfigLoader.fromUri("http://127.0.0.1:1/cfg.json")
      }
      assert(e.getMessage.contains("disabled by feature gate"))
    } finally FeatureGate.global.set(FeatureGate.HttpConfigProvider.id, true)
    // re-enabled: the surface is open again (fails on CONNECTION, not
    // on the gate — nothing listens on port 1)
    val e2 = intercept[Exception] {
      ConfigLoader.fromUri("http://127.0.0.1:1/cfg.json")
    }
    assert(!e2.getMessage.contains("feature gate"))
  }

  test("disabling graft.confmap.watch refuses the reload loop") {
    FeatureGate.global.set(FeatureGate.ConfigWatch.id, false)
    try {
      val e = intercept[IllegalStateException] {
        ConfigLoader.watch("file:/nonexistent", 1000L)(_ => ())
      }
      assert(e.getMessage.contains("disabled by feature gate"))
    } finally FeatureGate.global.set(FeatureGate.ConfigWatch.id, true)
  }
}
