package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Processors
import graft.operators.Processors._
import QUtil._

/** Collector-processor demo queries (SURVEY §2 "Collector processors").
  * The `events` table stands in for the telemetry stream: user_id ≈
  * trace id, event_type ≈ span name/severity, props ≈ attributes map.
  */
object ProcessorQueries {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // filter processor: include + exclude predicate pair
    "q_filter_events" -> ((s, dir) => {
      Processors.filter(Tables(s, dir, "events"),
          include = col("event_type") === "error" && col("value") >= 100,
          exclude = col("user_id") % 97 === 0)
        .select(col("event_id"), col("user_id"), col("value"))
    }),

    // attributes processor: upsert (json attr extract + severity), keep-subset
    "q_attributes_update" -> ((s, dir) => {
      Processors.attributes(Tables(s, dir, "events"), Seq(
          Upsert("severity", upper(col("event_type"))),
          Upsert("k_int", get_json_object(col("props"), "$.k").cast("int")),
          Delete("props"), Delete("ts"), Delete("ts_ns"), Delete("value"), Delete("user_id"),
          Delete("event_type")))
        .filter(col("k_int") > 80)
    }),

    // redaction processor: blocked-value masking over the attribute
    // map plus the redaction-summary count; emitted as a sorted kv
    // string so the oracle compares engine-portably (map columns
    // don't hash stably across engines)
    "q_redact_attrs" -> ((s, dir) => {
      val attrs = map(
        lit("etype"), col("event_type"),
        lit("props"), col("props"),
        lit("uid"), col("user_id").cast("string"))
      Tables(s, dir, "events")
        .filter(col("event_id") % 37 === 0)
        .select(col("event_id"),
          graft.operators.Ottl.toKeyValueString(
            Processors.mapRedact(attrs, "\\d{2,}"), ",", "=").as("redacted"),
          Processors.mapRedactCount(attrs, "\\d{2,}").as("n_redacted"))
    }),

    // resource detection processor (reference:
    // resourcedetectionprocessor): environment-detected resource
    // attributes merge into the existing resource map under BOTH
    // precedence modes — override=false (existing keys win; `insert`)
    // and override=true (detected wins; `upsert`). Detected values
    // are plan-time constants per run, exactly like the processor's
    // one-time detection at collector start. Sorted kv strings keep
    // the map oracle-portable (the q_redact_attrs discipline).
    "q_resource_detect" -> ((s, dir) => {
      val existing = map(
        lit("source"), col("source"),
        lit("host.name"), concat(lit("doc-host-"), (col("doc_id") % 3).cast("string")))
      val detected = map(
        lit("host.name"), lit("detected-host"),
        lit("os.type"), lit("linux"))
      Tables(s, dir, "documents").select(col("doc_id"),
        graft.operators.Ottl.toKeyValueString(
          graft.operators.Ottl.mergeMaps(existing, detected, "insert"), ",", "=")
          .as("res_keep_existing"),
        graft.operators.Ottl.toKeyValueString(
          graft.operators.Ottl.mergeMaps(existing, detected, "upsert"), ",", "=")
          .as("res_override"))
    }),

    // OTTL-style scalar transform suite over documents
    "q_transform_ottl" -> ((s, dir) => {
      Tables(s, dir, "documents").select(
        col("doc_id"),
        upper(col("lang")).as("lang_uc"),
        substring(col("text"), 1, 12).as("head"),
        length(col("text")).as("text_len"),
        regexp_extract(col("source"), "src(\\d+)", 1).cast("int").as("src_id"),
        concat(col("lang"), lit(":"), col("source")).as("lang_src"))
    }),

    // group-by-attributes processor
    "q_groupbyattrs" -> ((s, dir) => {
      Processors.groupByAttrs(Tables(s, dir, "events"), Seq("event_type"), Seq(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        dsum(col("value")).as("total_value"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value")))
    }),

    // per-metadata-key batcher: batches form independently per
    // event_type shard (batch_processor.go metadataKeys analog)
    "q_batch_by_key" -> ((s, dir) => {
      Processors.assignBatchesByKey(Tables(s, dir, "events"),
          Seq("event_type"), col("event_id"), 256)
        .groupBy(col("event_type"), col("batch_id"))
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("first_id"),
          max(col("event_id")).as("last_id"))
    }),

    // OTLP/JSON AnyValue fidelity: events → typed-attribute OTLP
    // request documents (double/bool/int values; ~hundreds of records
    // per request, like a real batched export) → parseLogs →
    // aggregate the recovered typed values. The oracle aggregates the
    // raw table — equality proves parse∘marshal loses nothing.
    "q_otlp_roundtrip" -> ((s, dir) => {
      val av = graft.sources.OtlpJsonSource.typedAnyValue _
      val rec = struct(
        col("ts_ns").cast("string").as("timeUnixNano"),
        when(col("event_type") === "error", 17).otherwise(9).as("severityNumber"),
        struct(col("event_type").as("stringValue")).as("body"),
        array(
          struct(lit("value").as("key"),
            av(null, null, col("value"), null).as("value")),
          struct(lit("is_error").as("key"),
            av(null, null, null, col("event_type") === "error").as("value")),
          struct(lit("user").as("key"),
            av(null, col("user_id").cast("string"), null, null).as("value"))
        ).as("attributes"))
      // Shard key derived from record id RANGE, not a fixed modulus:
      // each request holds ≤1000 records regardless of table size
      // (reference batcher's sendBatchSize shape). A fixed pmod(id, 64)
      // would put N/64 records in one aggregation buffer / JSON string
      // — executor OOM at 100×. The oracle is shard-count-agnostic.
      val json = Tables(s, dir, "events")
        .groupBy(expr("event_id DIV 1000").as("_shard"))
        .agg(collect_list(rec).as("recs"))
        .select(to_json(struct(array(struct(
          struct(array(struct(lit("service.name").as("key"),
            av(lit("graft"), null, null, null).as("value"))).as("attributes")).as("resource"),
          array(struct(
            struct(lit("graft").as("name")).as("scope"),
            col("recs").as("logRecords"))).as("scopeLogs"))).as("resourceLogs")))
          .as("json"))
      graft.sources.OtlpJsonSource.parseLogs(json)
        .groupBy(col("severity_number"))
        .agg(count(lit(1)).as("n"),
          dsum(element_at(col("attributes"), "value").cast("double")).as("total_value"),
          count(when(element_at(col("attributes"), "is_error") === "true", 1)).as("n_flagged"),
          countDistinct(element_at(col("attributes"), "user").cast("long")).as("n_users"))
    }),

    // batch processor: deterministic size-based batch ids
    "q_batch_assign" -> ((s, dir) => {
      Processors.assignBatches(Tables(s, dir, "events"), col("event_id"), 256)
        .groupBy(col("batch_id"))
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("first_id"),
          max(col("event_id")).as("last_id"))
    }),

    // batch timeout in batch mode: batches bounded by BOTH size and
    // event-time age (no batch spans >1 minute of event time) — the
    // batchprocessor timeout trigger replayed over stored data
    "q_batch_timeout" -> ((s, dir) => {
      Processors.assignBatchesTimed(
          Tables(s, dir, "events").withColumn("ts_us", expr("ts_ns DIV 1000")),
          col("ts_us"), 60000000L, col("event_id"), 64)
        .groupBy(col("batch_window"), col("batch_id"))
        .agg(count(lit(1)).as("n"),
          min(col("event_id")).as("first_id"),
          (max(col("ts_us")) - min(col("ts_us"))).as("span_us"))
    }),

    // memory limiter: bounded deterministic admission
    "q_memory_limiter" -> ((s, dir) => {
      Processors.memoryLimit(Tables(s, dir, "events"),
          Seq(col("value").desc, col("event_id").asc), 500)
        .agg(count(lit(1)).as("n_admitted"),
          dsum(col("value")).as("admitted_value"),
          min(col("value")).as("min_admitted_value"))
    }),

    // hash-seeded probabilistic sampler (~25% via first md5 hex digit)
    "q_probabilistic_sampler" -> ((s, dir) => {
      Processors.probabilisticSample(Tables(s, dir, "events"), col("event_id"), 4)
        .agg(count(lit(1)).as("n_sampled"),
          countDistinct(col("user_id")).as("n_users"),
          dsum(col("value")).as("sampled_value"))
    }),

    // tail sampling: keep whole traces (users) containing an error
    "q_tail_sampling" -> ((s, dir) => {
      Processors.tailSample(Tables(s, dir, "events"), "user_id",
          col("event_type") === "error")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    }),

    // routing connector: first-match-wins route labels
    "q_route_split" -> ((s, dir) => {
      Processors.route(Tables(s, dir, "events"),
          Seq("errors" -> (col("event_type") === "error"),
              "high_value" -> (col("value") > 150)),
          defaultRoute = "default")
        .groupBy(col("route"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    }),

    // fanout + forward connector: two pipelines over one source, merged
    "q_fanout_union" -> ((s, dir) => {
      Processors.fanout(Tables(s, dir, "events"), Seq(
          d => d.filter(col("event_type") === "error")
            .select(lit("errors").as("pipeline"), col("event_id"), col("value")),
          d => d.filter(col("value") > 180)
            .select(lit("big").as("pipeline"), col("event_id"), col("value"))))
        .groupBy(col("pipeline"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    }),

    // trace assembly: spans (events) grouped into traces (user_id =
    // trace id) → per-trace summary like a spanmetrics/servicegraph
    // connector would need: span count, wall duration, error count,
    // distinct operations, root span id
    "q_trace_assembly" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("ts_us", expr("ts_ns DIV 1000"))
        .groupBy(col("user_id").as("trace_key"))
        .agg(count(lit(1)).as("n_spans"),
          (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
          count(when(col("event_type") === "error", 1)).as("n_errors"),
          countDistinct(col("event_type")).as("n_operations"),
          min(col("event_id")).as("root_span_id"))
    }),

    // servicegraph connector analog: call-transition edges from the
    // per-trace event sequence (prev op -> op), with edge stats
    "q_servicegraph" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // order at µs granularity (DuckDB truncates ns parquet to µs)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(expr("ts_ns DIV 1000"), col("event_id"))
      Tables(s, dir, "events")
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n_calls"), dsum(col("value")).as("total_value"))
    }),

    // compaction / upsert view: latest record per key (changelog ->
    // current-state materialization)
    "q_latest_by_key" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(expr("ts_ns DIV 1000").desc, col("event_id").desc)
      Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"), col("value").as("last_value"),
          expr("ts_ns DIV 1000").as("last_ts_us"))
    }),

    // as-of join: enrich each event with the latest order state at
    // event time (Spark lacks a native as-of join; composed from
    // union + one window pass — see operators.AsOfJoin)
    "q_asof_enrich" -> ((s, dir) => {
      val e = Tables(s, dir, "events").withColumn("ts_us", expr("ts_ns DIV 1000"))
      val state = Tables(s, dir, "orders")
        .withColumn("t_us", expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))"))
        .groupBy(col("o_custkey").as("user_id"), col("t_us"))
        .agg(max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
      graft.operators.AsOfJoin.asOf(e, state, "user_id", "ts_us", "t_us", Seq("o_totalprice"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          count(col("asof_o_totalprice")).as("n_with_state"),
          dsum(coalesce(col("asof_o_totalprice"), lit(0))).as("total_state_value"))
    }),

    // OLAP rollup over telemetry dimensions: per (event_type, cohort),
    // per event_type subtotal, and grand total in one pass — the
    // hierarchy a metrics backend pre-aggregates
    "q_rollup_counts" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("cohort", (col("user_id") % 10).cast("int"))
        .rollup(col("event_type"), col("cohort"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    }),

    // OLAP CUBE over telemetry dimensions — the cross-dimension
    // companion of q_rollup_counts' hierarchy: all four grouping sets
    // in one pass with grouping_id disambiguating a real NULL from an
    // aggregated-out dimension (the reason the operator exists)
    "q_cube_counts" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("cohort", (col("user_id") % 10).cast("int"))
        .cube(col("event_type"), col("cohort"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    }),

    // OTTL ExtractPatterns over the props attribute bag (the
    // transform processor's regex-extraction converter): pull the
    // integer k out of the raw props string, upsert it as a typed
    // attribute, derive a band dimension, aggregate — attribute
    // extraction is map-side; the one agg is the only exchange
    "q_ottl_extract_patterns" -> ((s, dir) => {
      Tables(s, dir, "events")
        // try_cast, not cast: regexp_extract yields '' on a no-match
        // row and ANSI CAST('' AS BIGINT) would crash the whole query
        // — the oracle's TRY_CAST yields a NULL band instead, and the
        // engines must agree on malformed props
        .withColumn("k", expr(
          """try_cast(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)"""))
        .withColumn("k_band", expr("k DIV 10"))
        .groupBy(col("event_type"), col("k_band"))
        .agg(count(lit(1)).as("n"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    }),

    // the FULL plog severity scale: all 24 levels with band
    // qualifiers (TRACE..FATAL4), derived deterministically per event
    "q_severity_map" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("severity_number", (pmod(col("event_id"), lit(24)) + 1).cast("int"))
        .withColumn("severity_text", Processors.severityText(col("severity_number")))
        .groupBy(col("severity_number"), col("severity_text"))
        .agg(count(lit(1)).as("n"), min(col("event_id")).as("first_id"))
    }),

    // W3C traceparent propagation: synthesize the header from event
    // identity, then parse it back — field extraction + version/flags
    // validation, the context-propagation surface of the receiver
    "q_traceparent" -> ((s, dir) => {
      val tp = concat(lit("00-"), md5(col("event_id").cast("string")), lit("-"),
        substring(md5(concat(col("event_id").cast("string"), lit("s"))), 1, 16),
        lit("-"), when(col("event_type") === "error", "01").otherwise("00"))
      val re = "^([0-9a-f]{2})-([0-9a-f]{32})-([0-9a-f]{16})-([0-9a-f]{2})$"
      Tables(s, dir, "events")
        .withColumn("tp", tp)
        .withColumn("trace_id", regexp_extract(col("tp"), re, 2))
        .withColumn("span_id", regexp_extract(col("tp"), re, 3))
        .withColumn("sampled", regexp_extract(col("tp"), re, 4) === "01")
        .groupBy(col("sampled"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("trace_id")).as("n_traces"),
          count(when(length(col("span_id")) === 16, 1)).as("n_valid_span_ids"))
    }),

    // log severity normalization (plog severity_number mapping)
    "q_span_status" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("severity_number",
          when(col("event_type") === "error", lit(17))
            .when(col("event_type") === "purchase", lit(9))
            .when(col("event_type") === "signup", lit(9))
            .otherwise(lit(5)))
        .withColumn("severity_text",
          when(col("severity_number") === 17, "ERROR")
            .when(col("severity_number") === 9, "INFO")
            .otherwise("DEBUG"))
        .groupBy(col("severity_number"), col("severity_text"))
        .agg(count(lit(1)).as("n"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_filter_events" ->
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'error' AND value >= 100 AND NOT (user_id % 97 = 0)""".stripMargin,

    "q_attributes_update" ->
      """SELECT event_id, severity, k_int FROM (
        | SELECT event_id, UPPER(event_type) AS severity,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int
        | FROM events) WHERE k_int > 80""".stripMargin,

    "q_redact_attrs" ->
      """SELECT event_id,
        | 'etype=' || (CASE WHEN regexp_matches(event_type, '\d{2,}') THEN '****' ELSE event_type END)
        | || ',props=' || (CASE WHEN regexp_matches(props, '\d{2,}') THEN '****' ELSE props END)
        | || ',uid=' || (CASE WHEN regexp_matches(CAST(user_id AS VARCHAR), '\d{2,}') THEN '****' ELSE CAST(user_id AS VARCHAR) END)
        | AS redacted,
        | CAST((CASE WHEN regexp_matches(event_type, '\d{2,}') THEN 1 ELSE 0 END)
        |  + (CASE WHEN regexp_matches(props, '\d{2,}') THEN 1 ELSE 0 END)
        |  + (CASE WHEN regexp_matches(CAST(user_id AS VARCHAR), '\d{2,}') THEN 1 ELSE 0 END) AS INTEGER) AS n_redacted
        |FROM events WHERE event_id % 37 = 0""".stripMargin,

    "q_resource_detect" ->
      """SELECT doc_id,
        | 'host.name=doc-host-' || CAST(doc_id % 3 AS VARCHAR)
        |  || ',os.type=linux,source=' || source AS res_keep_existing,
        | 'host.name=detected-host,os.type=linux,source=' || source AS res_override
        |FROM documents""".stripMargin,

    "q_transform_ottl" ->
      """SELECT doc_id, UPPER(lang) AS lang_uc, SUBSTRING(text, 1, 12) AS head,
        | LENGTH(text) AS text_len,
        | CAST(regexp_extract(source, 'src(\d+)', 1) AS INTEGER) AS src_id,
        | lang || ':' || source AS lang_src
        |FROM documents""".stripMargin,

    "q_groupbyattrs" ->
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value,
        | MAX(value) AS max_value, MIN(value) AS min_value
        |FROM events GROUP BY event_type""".stripMargin,

    "q_batch_by_key" ->
      """SELECT event_type, batch_id, COUNT(*) AS n,
        | MIN(event_id) AS first_id, MAX(event_id) AS last_id
        |FROM (SELECT event_type, event_id,
        |  CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) - 1) / 256.0) AS BIGINT) AS batch_id
        | FROM events)
        |GROUP BY 1, 2""".stripMargin,

    "q_otlp_roundtrip" ->
      """SELECT CASE WHEN event_type = 'error' THEN 17 ELSE 9 END AS severity_number,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_flagged,
        | COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin,

    "q_batch_assign" ->
      """SELECT batch_id, COUNT(*) AS n, MIN(event_id) AS first_id, MAX(event_id) AS last_id
        |FROM (SELECT event_id,
        |  CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY event_id) - 1) / 256.0) AS BIGINT) AS batch_id
        | FROM events)
        |GROUP BY batch_id""".stripMargin,

    "q_batch_timeout" ->
      """SELECT batch_window, batch_id, COUNT(*) AS n,
        | MIN(event_id) AS first_id,
        | MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us
        |FROM (SELECT event_id, ts,
        |  epoch_us(ts) // 60000000 AS batch_window,
        |  CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY epoch_us(ts) // 60000000 ORDER BY event_id) - 1) / 64.0) AS BIGINT) AS batch_id
        | FROM events)
        |GROUP BY 1, 2""".stripMargin,

    "q_memory_limiter" ->
      """SELECT COUNT(*) AS n_admitted,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS admitted_value,
        | MIN(value) AS min_admitted_value
        |FROM (SELECT * FROM events ORDER BY value DESC, event_id ASC LIMIT 500)""".stripMargin,

    "q_probabilistic_sampler" ->
      """SELECT COUNT(*) AS n_sampled, COUNT(DISTINCT user_id) AS n_users,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS sampled_value
        |FROM events
        |WHERE SUBSTRING(md5(CAST(event_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')""".stripMargin,

    "q_tail_sampling" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value
        |FROM events
        |WHERE user_id IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |GROUP BY event_type""".stripMargin,

    "q_route_split" ->
      """SELECT route, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value
        |FROM (SELECT CASE WHEN event_type = 'error' THEN 'errors'
        |  WHEN value > 150 THEN 'high_value' ELSE 'default' END AS route, value
        | FROM events)
        |GROUP BY route""".stripMargin,

    "q_fanout_union" ->
      """SELECT pipeline, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value
        |FROM (
        | SELECT 'errors' AS pipeline, event_id, value FROM events WHERE event_type = 'error'
        | UNION ALL
        | SELECT 'big' AS pipeline, event_id, value FROM events WHERE value > 180)
        |GROUP BY pipeline""".stripMargin,

    "q_trace_assembly" ->
      """SELECT user_id AS trace_key, COUNT(*) AS n_spans,
        | MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us,
        | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors,
        | COUNT(DISTINCT event_type) AS n_operations,
        | MIN(event_id) AS root_span_id
        |FROM events GROUP BY user_id""".stripMargin,

    "q_servicegraph" ->
      """WITH seq AS (
        | SELECT event_type, value,
        |  LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
        | FROM events)
        |SELECT prev_type, event_type, COUNT(*) AS n_calls,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value
        |FROM seq WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type""".stripMargin,

    "q_latest_by_key" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
        | value AS last_value, epoch_us(ts) AS last_ts_us
        |FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
        |  ORDER BY epoch_us(ts) DESC, event_id DESC) = 1""".stripMargin,

    "q_asof_enrich" ->
      """WITH state AS (
        | SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS t_us,
        |  arg_max(o_totalprice, o_orderkey) AS o_totalprice
        | FROM orders GROUP BY 1, 2),
        |j AS (
        | SELECT e.event_type, s.o_totalprice
        | FROM events e ASOF LEFT JOIN state s
        |  ON e.user_id = s.user_id AND epoch_us(e.ts) >= s.t_us)
        |SELECT event_type, COUNT(*) AS n_events,
        | COUNT(o_totalprice) AS n_with_state,
        | CAST(SUM(CAST(COALESCE(o_totalprice, 0) AS DECIMAL(28,8))) AS DOUBLE) AS total_state_value
        |FROM j GROUP BY event_type""".stripMargin,

    "q_rollup_counts" ->
      """SELECT event_type, CAST(user_id % 10 AS INTEGER) AS cohort,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY ROLLUP(event_type, CAST(user_id % 10 AS INTEGER))""".stripMargin,

    "q_cube_counts" ->
      """WITH e AS (SELECT event_type,
        |  CAST(user_id % 10 AS INTEGER) AS cohort, value FROM events)
        |SELECT event_type, cohort,
        | CAST(GROUPING(event_type, cohort) AS BIGINT) AS gid,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value
        |FROM e GROUP BY CUBE(event_type, cohort)""".stripMargin,

    "q_ottl_extract_patterns" ->
      """SELECT event_type,
        | TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) // 10 AS k_band,
        | COUNT(*) AS n,
        | MIN(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS min_k,
        | MAX(TRY_CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS max_k
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_severity_map" ->
      s"""SELECT severity_number, severity_text, COUNT(*) AS n, MIN(event_id) AS first_id
         |FROM (SELECT event_id,
         |  CAST(event_id % 24 + 1 AS INTEGER) AS severity_number,
         |  ${graft.operators.Processors.severityTextSql("(event_id % 24 + 1)")} AS severity_text
         | FROM events)
         |GROUP BY 1, 2""".stripMargin,

    "q_traceparent" ->
      """SELECT sampled, COUNT(*) AS n,
        | COUNT(DISTINCT trace_id) AS n_traces,
        | COUNT(CASE WHEN LENGTH(span_id) = 16 THEN 1 END) AS n_valid_span_ids
        |FROM (SELECT
        |  regexp_extract(tp, '^([0-9a-f]{2})-([0-9a-f]{32})-([0-9a-f]{16})-([0-9a-f]{2})$', 2) AS trace_id,
        |  regexp_extract(tp, '^([0-9a-f]{2})-([0-9a-f]{32})-([0-9a-f]{16})-([0-9a-f]{2})$', 3) AS span_id,
        |  regexp_extract(tp, '^([0-9a-f]{2})-([0-9a-f]{32})-([0-9a-f]{16})-([0-9a-f]{2})$', 4) = '01' AS sampled
        | FROM (SELECT '00-' || md5(CAST(event_id AS VARCHAR)) || '-' ||
        |   substr(md5(CAST(event_id AS VARCHAR) || 's'), 1, 16) || '-' ||
        |   CASE WHEN event_type = 'error' THEN '01' ELSE '00' END AS tp
        |  FROM events))
        |GROUP BY sampled""".stripMargin,

    "q_span_status" ->
      """SELECT severity_number, severity_text, COUNT(*) AS n FROM (
        | SELECT CASE WHEN event_type = 'error' THEN 17
        |   WHEN event_type IN ('purchase','signup') THEN 9 ELSE 5 END AS severity_number,
        |  CASE WHEN event_type = 'error' THEN 'ERROR'
        |   WHEN event_type IN ('purchase','signup') THEN 'INFO' ELSE 'DEBUG' END AS severity_text
        | FROM events)
        |GROUP BY severity_number, severity_text""".stripMargin
  )
}
