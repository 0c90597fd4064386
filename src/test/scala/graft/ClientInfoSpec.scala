package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{ClientInfo, Pipeline}
import graft.pipeline.Pipeline._
import graft.operators.Processors

/** client.Info propagation (reference client/client.go): receivers
  * produce it, the pipeline carries it, processors/exporters consume
  * it — batching per metadata combination and per-tenant delivery. */
class ClientInfoSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def tenant(name: String, addr: String): ClientInfo =
    ClientInfo(addr = Some(addr),
      auth = Map("subject" -> s"user-$name"),
      metadata = Map("Tenant" -> Seq(name), "X-Scope-OrgID" -> Seq(name, "eu")))

  test("metadata Get is case-insensitive; unset is NULL, set-empty is empty") {
    val df = ClientInfo.attach(
      Tables(spark, sf, "region"),
      ClientInfo(metadata = Map("TeNaNt" -> Seq("acme"), "empty" -> Nil)))
    val r = df.select(
      ClientInfo.metadataHead("tenant").as("low"),
      ClientInfo.metadataHead("TENANT").as("up"),
      ClientInfo.metadataCol("absent").as("unset"),
      ClientInfo.metadataCol("EMPTY").as("empty")).head()
    assert(r.getAs[String]("low") == "acme")
    assert(r.getAs[String]("up") == "acme")
    assert(r.isNullAt(r.fieldIndex("unset")))
    assert(r.getAs[scala.collection.Seq[String]]("empty").isEmpty)
    // metadataId keeps unset ≠ empty distinct (batch config.go:37)
    val ids = df.select(ClientInfo.metadataId("absent").as("a"),
      ClientInfo.metadataId("empty").as("e")).head()
    assert(ids.isNullAt(0) && ids.getString(1) == "")
  }

  test("auth attributes flow from the receiver wrapper to any stage") {
    val recv = ClientInfoReceiver(TableReceiver(sf, "nation"),
      ClientInfo(auth = Map("subject" -> "oidc-user", "membership" -> "admins")))
    val got = recv.read(spark)
      .select(ClientInfo.authCol("subject"), ClientInfo.authCol("membership"))
      .distinct().collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("oidc-user", "admins")))
  }

  test("per-metadata-key batching + per-tenant partitioned delivery") {
    val out = java.nio.file.Files.createTempDirectory("graft_clientinfo").toString
    // two requests from two tenants over the same pipeline (the
    // multi-client receiver shape: each connection's frame carries its
    // own info, fan-in unions them)
    def req(t: String, addr: String) = PipelineDef(
      ClientInfoReceiver(TableReceiver(sf, "events"), tenant(t, addr)))
    val pipe = PipelineDef(
      receiver = UnionReceiver(() => Seq(req("acme", "10.0.0.1:4317"),
                                         req("globex", "10.0.0.2:4317"))),
      processors = Seq(
        df => df.filter(col("event_type").isNotNull), // _client survives stages
        df => Processors.assignBatchesByMetadata(df, Seq("Tenant"),
          orderCol = col("event_id"), batchSize = 100, cardinalityLimit = 8)),
      exporters = Seq(MetadataPartitionedExporter(out, Seq("Tenant"))))
    pipe.run(spark)

    val back = spark.read.parquet(out)
    // per-tenant directories, only that tenant's rows, carrier stripped
    assert(back.columns.contains("meta_tenant"))
    assert(!back.columns.contains(ClientInfo.ColName))
    // directory values carry the partition-safe encoding; decode
    // recovers the original tenant names
    val perTenant = back.groupBy(ClientInfo
        .metadataPartitionDecode(col("meta_tenant")).as("tenant"))
      .count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perTenant.keySet == Set("acme", "globex"))
    assert(perTenant.values.toSet.size == 1) // same source → same count
    // batches numbered independently per tenant (one shard per
    // combination, batch_processor.go:279-308), bounded by batchSize
    val batches = back.groupBy("meta_tenant", "batch_id").count().collect()
    assert(batches.forall(_.getLong(2) <= 100))
    val perTenantBatchIds = batches.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
    perTenantBatchIds.values.foreach { ids =>
      assert(ids == (0L until ids.length).toSeq) // contiguous from 0
    }
    // partition pruning reaches the scan: a one-tenant read plans only
    // that tenant's files (the point of per-tenant layout at 100 TB)
    val pruned = spark.read.parquet(out).filter(col("meta_tenant") === "v_acme")
    assert(pruned.count() == perTenant("acme"))
  }

  test("partitioned delivery keeps unset distinct from set-empty in the path") {
    // the parquet writer folds both NULL and "" into
    // __HIVE_DEFAULT_PARTITION__ — the sentinel+prefix encoding is
    // what lets the unset-vs-empty distinction (metadata Get's
    // contract) survive the round trip through a directory name
    val out = java.nio.file.Files.createTempDirectory("graft_unset_empty").toString
    val base = Tables(spark, sf, "region")
    val unset = ClientInfo.attach(base, ClientInfo())                       // no Tenant key
    val empty = ClientInfo.attach(base, ClientInfo(metadata = Map("Tenant" -> Nil)))
    val named = ClientInfo.attach(base, ClientInfo(metadata = Map("Tenant" -> Seq("acme"))))
    MetadataPartitionedExporter(out, Seq("Tenant"))
      .export(unset.unionByName(empty).unionByName(named))
    val back = spark.read.parquet(out)
    val n = base.count()
    // three distinguishable directories, none hive-default
    val dirs = back.select("meta_tenant").distinct().collect()
      .map(_.getString(0)).toSet
    assert(dirs == Set("__unset__", "v_", "v_acme"))
    // decode round-trips: unset → NULL, set-empty → "", named → value
    val decoded = back.groupBy(ClientInfo
        .metadataPartitionDecode(col("meta_tenant")).as("t")).count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(decoded == Map(None -> n, Some("") -> n, Some("acme") -> n))
    // a tenant literally named "__unset__" stays unambiguous
    val tricky = java.nio.file.Files.createTempDirectory("graft_tricky").toString
    MetadataPartitionedExporter(tricky, Seq("Tenant")).export(
      ClientInfo.attach(base, ClientInfo(metadata = Map("Tenant" -> Seq("__unset__"))))
        .unionByName(unset))
    val trickyBack = spark.read.parquet(tricky)
    assert(trickyBack.select("meta_tenant").distinct().collect()
      .map(_.getString(0)).toSet == Set("v___unset__", "__unset__"))
    assert(trickyBack.filter(ClientInfo
        .metadataPartitionDecode(col("meta_tenant")) === "__unset__")
      .count() == n)
  }

  test("authenticator validates, publishes auth attrs, rejects the rest") {
    // two "requests": one bearing a valid bearer token, one without
    val good = ClientInfo.attach(Tables(spark, sf, "region"),
      ClientInfo(auth = Map("subject" -> "client-claimed"), // gets overridden
        metadata = Map("Authorization" -> Seq("Bearer tok-42"))))
    val bad = ClientInfo.attach(Tables(spark, sf, "region"), ClientInfo())
    val df = good.unionByName(bad)
    val (accepted, rejected) = ClientInfo.authenticate(df,
      validate = ClientInfo.metadataHead("authorization").startsWith("Bearer "),
      attrs = Map("subject" ->
        regexp_extract(ClientInfo.metadataHead("authorization"),
          "^Bearer (.+)$", 1)))
    val n = Tables(spark, sf, "region").count()
    assert(accepted.count() == n && rejected.count() == n)
    // authenticator-published subject wins over the client-claimed one
    val subj = accepted.select(ClientInfo.authCol("subject")).distinct().collect()
    assert(subj.map(_.getString(0)).toSeq == Seq("tok-42"))
    // absent credentials reject (NULL validate is not a pass)
    assert(rejected.filter(ClientInfo.metadataCol("authorization").isNull)
      .count() == n)
  }

  test("config-built multi-tenant pipeline: client info → metadata batch → partitioned delivery") {
    val out = java.nio.file.Files.createTempDirectory("graft_cfg_tenant").toString
    val cfg = s"""{
      "pipelines": {
        "t/acme": {
          "receiver": {"type": "table", "dir": "$sf", "table": "events",
            "client": {"addr": "10.0.0.1:4317",
              "auth": {"subject": "user-acme"},
              "metadata": {"Tenant": "acme", "X-Scope-OrgID": ["acme", "eu"]}}},
          "exporters": []
        },
        "t/globex": {
          "receiver": {"type": "table", "dir": "$sf", "table": "events",
            "client": {"metadata": {"tenant": ["globex"]}}},
          "exporters": []
        },
        "t/all": {
          "receiver": {"type": "union", "from": ["t/acme", "t/globex"]},
          "processors": [
            {"type": "batch_by_metadata", "metadataKeys": ["Tenant"],
             "order": "event_id", "size": 100, "cardinalityLimit": 8}],
          "exporters": [{"type": "parquet_by_metadata", "path": "$out",
            "metadataKeys": ["Tenant"]}]
        }
      }
    }"""
    graft.pipeline.ConfigLoader.fromJson(cfg).pipelines("t/all").run(spark)
    val back = spark.read.parquet(out)
    val tenants = back.groupBy(ClientInfo
        .metadataPartitionDecode(col("meta_tenant")).as("tenant"))
      .count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tenants.keySet == Set("acme", "globex"))
    assert(back.groupBy("meta_tenant", "batch_id").count().collect()
      .forall(_.getLong(2) <= 100))
    assert(!back.columns.contains(ClientInfo.ColName))
  }

  test("client info rides a STREAMING pipeline into per-tenant delivery") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_stream_tenant").toString
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    // the receiver-side attach is the same column transform in
    // streaming — context flows through micro-batches untouched
    val withInfo = ClientInfo.attach(ms.toDF().toDF("id", "payload"),
      ClientInfo(metadata = Map("Tenant" -> Seq("acme"))))
    val exporter = Pipeline.MetadataPartitionedExporter(out, Seq("Tenant"))
    val q = withInfo.writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_stream_ck").toString)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                     id: Long) => exporter.exportBatch(b, id))
      .start()
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      ms.addData((3L, "c"))
      q.processAllAvailable()
      val back = spark.read.parquet(out)
      assert(back.count() == 3)
      assert(back.select(ClientInfo
          .metadataPartitionDecode(col("meta_tenant"))).distinct().collect()
        .map(_.getString(0)).toSeq == Seq("acme"))
      assert(!back.columns.contains(ClientInfo.ColName))
    } finally q.stop()
  }

  test("metadata cardinality limit refuses, like errTooManyBatchers") {
    val df = ClientInfo.attach(Tables(spark, sf, "events"),
      ClientInfo(metadata = Map("tenant" -> Seq("a"))))
      .withColumn("_client", // forge per-row tenants to blow the limit
        struct(lit(null).cast("string").as("addr"),
          typedLit(Map.empty[String, String]).as("auth"),
          map(lit("tenant"), array(col("event_type").cast("string")))
            .as("metadata")))
    val e = intercept[IllegalArgumentException] {
      Processors.assignBatchesByMetadata(df, Seq("tenant"),
        col("event_id"), 100, cardinalityLimit = 1).count()
    }
    assert(e.getMessage.contains("metadata-value combinations"))
  }
}
