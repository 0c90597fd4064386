package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, FieldVector, IntVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.complex.MapVector
import org.apache.arrow.vector.complex.writer.BaseWriter.MapWriter
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** OTLP-over-Arrow transport analog — the otel-arrow fork's namesake
  * wire format (reference behavior, not code:
  * receiver/otlpreceiver/internal/arrow/arrow.go:251-260 decodes
  * BatchArrowRecords whose `record` field is an Arrow IPC stream;
  * exporter/otlpexporter/internal/arrow/stream.go encodes the same
  * going out).
  *
  * graft's processing representation is already columnar
  * (Tungsten/Parquet), so "OTLP-over-Arrow support" here means the
  * WIRE seam: spooled Arrow IPC record batches — the BatchArrowRecords
  * payload minus the gRPC framing, exactly as the pb receivers consume
  * Export*ServiceRequest files minus their HTTP framing — decode into
  * the same flattened log rows [[OtlpJsonSource.parseLogs]] produces,
  * and flattened rows encode back out as Arrow IPC spool files. A
  * migrating otel-arrow user points their Arrow stream at a spool
  * directory and both directions just work.
  *
  * Layout note vs the reference: OTAP splits a signal across multiple
  * related record batches (logs + attrs tables keyed by parent ids)
  * to maximize dictionary/delta compression on the wire. Here one
  * batch carries the flattened record with map-typed attribute
  * columns — Arrow expresses that natively, Parquet/zstd provides the
  * at-rest compression, and no id re-join is needed at ingest. The
  * seam (IPC stream in, IPC stream out) is the compatible part;
  * a bit-level OTAP schema twin would buy nothing on the Spark side.
  *
  * Scale: encode/decode run per executor partition (foreachPartition /
  * flatMap) — no driver funnel; files land via the Hadoop FS API so
  * the spool works on any cluster filesystem.
  */
object ArrowLogsIpc {

  /** the flattened log row ([[OtlpJsonSource.parseLogs]] column order);
    * boxed numerics so wire-absent fields stay null through the round
    * trip instead of collapsing to 0 */
  final case class ArrowFlatLog(
      time_unix_nano: java.lang.Long,
      observed_time_unix_nano: java.lang.Long,
      severity_number: java.lang.Integer,
      severity_text: String,
      body: String,
      attributes: Map[String, String],
      flags: java.lang.Integer,
      dropped_attributes_count: java.lang.Integer,
      trace_id: String,
      span_id: String,
      resource_attributes: Map[String, String],
      scope_name: String)

  private val fieldNames = Seq("time_unix_nano", "observed_time_unix_nano",
    "severity_number", "severity_text", "body", "attributes", "flags",
    "dropped_attributes_count", "trace_id", "span_id",
    "resource_attributes", "scope_name")

  // ---- encode: flattened rows → one Arrow IPC stream ---------------

  private def writeText(w: org.apache.arrow.vector.complex.writer.VarCharWriter,
                        s: String, alloc: RootAllocator): Unit = {
    val bytes = s.getBytes(UTF_8)
    val buf = alloc.buffer(math.max(bytes.length, 1).toLong)
    try { buf.setBytes(0, bytes); w.writeVarChar(0, bytes.length, buf) }
    finally buf.close()
  }

  private def writeMap(w: MapWriter, m: Map[String, String],
                       alloc: RootAllocator): Unit = {
    w.startMap()
    // deterministic entry order — byte-stable payloads for identical rows
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      w.startEntry()
      writeText(w.key().varChar(), k, alloc)
      if (v != null) writeText(w.value().varChar(), v, alloc)
      w.endEntry()
    }
    w.endMap()
  }

  /** map<varchar,varchar> vector with its entries struct declared
    * non-nullable up front — writer-lazy child creation can mark the
    * struct nullable (e.g. when the first row writes a NULL map),
    * which Arrow's Map validation then rejects at serialization */
  private def newMapVector(name: String, alloc: RootAllocator): MapVector = {
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
    val entries = new Field(MapVector.DATA_VECTOR_NAME,
      new FieldType(false, ArrowType.Struct.INSTANCE, null),
      Seq(
        new Field(MapVector.KEY_NAME,
          new FieldType(false, new ArrowType.Utf8, null), null),
        new Field(MapVector.VALUE_NAME,
          new FieldType(true, new ArrowType.Utf8, null), null)).asJava)
    val mapField = new Field(name,
      new FieldType(true, new ArrowType.Map(false), null), Seq(entries).asJava)
    mapField.createVector(alloc).asInstanceOf[MapVector]
  }

  /** Encode rows (in [[fieldNames]] order) as ONE record batch in an
    * Arrow IPC stream. Callers chunk (the spool writer caps rows per
    * file) — a single batch per stream keeps the writer trivially
    * correct; the READER accepts any number of batches per stream, as
    * otel-arrow producers send them. */
  def encodeRows(rows: Seq[Row]): Array[Byte] = {
    val alloc = new RootAllocator()
    try {
      val timeV = new BigIntVector("time_unix_nano", alloc)
      val obsV = new BigIntVector("observed_time_unix_nano", alloc)
      val sevNV = new IntVector("severity_number", alloc)
      val sevTV = new VarCharVector("severity_text", alloc)
      val bodyV = new VarCharVector("body", alloc)
      val attrV = newMapVector("attributes", alloc)
      val flagV = new IntVector("flags", alloc)
      val dropV = new IntVector("dropped_attributes_count", alloc)
      val traceV = new VarCharVector("trace_id", alloc)
      val spanV = new VarCharVector("span_id", alloc)
      val resV = newMapVector("resource_attributes", alloc)
      val scopeV = new VarCharVector("scope_name", alloc)
      val vecs: Seq[FieldVector] = Seq(timeV, obsV, sevNV, sevTV, bodyV,
        attrV, flagV, dropV, traceV, spanV, resV, scopeV)
      try {
        val n = rows.length
        vecs.foreach(_.setInitialCapacity(n))
        val attrW = attrV.getWriter
        val resW = resV.getWriter
        def setLong(v: BigIntVector, i: Int, x: Any): Unit =
          if (x == null) v.setNull(i) else v.setSafe(i, x.asInstanceOf[Long])
        def setInt(v: IntVector, i: Int, x: Any): Unit =
          if (x == null) v.setNull(i) else v.setSafe(i, x.asInstanceOf[Int])
        def setStr(v: VarCharVector, i: Int, x: Any): Unit =
          if (x == null) v.setNull(i) else v.setSafe(i, x.asInstanceOf[String].getBytes(UTF_8))
        rows.zipWithIndex.foreach { case (r, i) =>
          setLong(timeV, i, r.get(0)); setLong(obsV, i, r.get(1))
          setInt(sevNV, i, r.get(2)); setStr(sevTV, i, r.get(3))
          setStr(bodyV, i, r.get(4))
          attrW.setPosition(i)
          Option(r.getMap[String, String](5)).fold(attrW.writeNull())(m =>
            writeMap(attrW, m.toMap, alloc))
          setInt(flagV, i, r.get(6)); setInt(dropV, i, r.get(7))
          setStr(traceV, i, r.get(8)); setStr(spanV, i, r.get(9))
          resW.setPosition(i)
          Option(r.getMap[String, String](10)).fold(resW.writeNull())(m =>
            writeMap(resW, m.toMap, alloc))
          setStr(scopeV, i, r.get(11))
        }
        vecs.foreach(_.setValueCount(n))
        val root = new VectorSchemaRoot(vecs.asJava)
        root.setRowCount(n)
        val out = new java.io.ByteArrayOutputStream()
        val w = new ArrowStreamWriter(root, null, out)
        try { w.start(); w.writeBatch(); w.end() } finally w.close()
        out.toByteArray
      } finally vecs.foreach(_.close())
    } finally alloc.close()
  }

  // ---- decode: one Arrow IPC stream → flattened rows ---------------

  /** decode every record batch of an IPC stream (materialized so the
    * off-heap allocator closes before returning) */
  def decode(bytes: Array[Byte]): Seq[ArrowFlatLog] = {
    val alloc = new RootAllocator()
    val out = scala.collection.mutable.ArrayBuffer.empty[ArrowFlatLog]
    val reader = new ArrowStreamReader(new ByteArrayInputStream(bytes), alloc)
    try {
      val root = reader.getVectorSchemaRoot
      while (reader.loadNextBatch()) {
        val n = root.getRowCount
        def long(name: String, i: Int): java.lang.Long = {
          val v = root.getVector(name).asInstanceOf[BigIntVector]
          if (v.isNull(i)) null else java.lang.Long.valueOf(v.get(i))
        }
        def int(name: String, i: Int): java.lang.Integer = {
          val v = root.getVector(name).asInstanceOf[IntVector]
          if (v.isNull(i)) null else java.lang.Integer.valueOf(v.get(i))
        }
        def str(name: String, i: Int): String = {
          val v = root.getVector(name).asInstanceOf[VarCharVector]
          if (v.isNull(i)) null else new String(v.get(i), UTF_8)
        }
        def map(name: String, i: Int): Map[String, String] = {
          val v = root.getVector(name).asInstanceOf[MapVector]
          if (v.isNull(i)) null
          else v.getObject(i).asInstanceOf[java.util.List[_]].asScala.map { e =>
            val entry = e.asInstanceOf[java.util.Map[_, _]]
            String.valueOf(entry.get(MapVector.KEY_NAME)) ->
              Option(entry.get(MapVector.VALUE_NAME)).map(String.valueOf).orNull
          }.toMap
        }
        var i = 0
        while (i < n) {
          out += ArrowFlatLog(long("time_unix_nano", i),
            long("observed_time_unix_nano", i), int("severity_number", i),
            str("severity_text", i), str("body", i), map("attributes", i),
            int("flags", i), int("dropped_attributes_count", i),
            str("trace_id", i), str("span_id", i),
            map("resource_attributes", i), str("scope_name", i))
          i += 1
        }
      }
      out.toSeq
    } finally { reader.close(); alloc.close() }
  }

  // ---- Spark surfaces ----------------------------------------------

  /** Arrow IPC spool EXPORTER: flattened log rows → one .arrow file
    * per (partition, chunk), written executor-side through the Hadoop
    * FS API (works on any cluster filesystem — no driver collect). */
  def spool(logs: DataFrame, dir: String, maxPerFile: Int = 4096): Unit = {
    val ordered = logs.select(fieldNames.map(col): _*)
    ordered.foreachPartition { (it: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var chunk = 0
      it.grouped(maxPerFile).foreach { rows =>
        val bytes = encodeRows(rows)
        val path = new org.apache.hadoop.fs.Path(dir,
          f"part-$pid%05d-$chunk%04d-${java.util.UUID.randomUUID()}.arrow")
        val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val os = fs.create(path, true)
        try os.write(bytes) finally os.close()
        chunk += 1
      }
    }
  }

  /** binary IPC payload column → flattened log rows (the pb receivers'
    * `parseLogsPb` twin for the Arrow encoding) */
  def parseLogsArrow(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("ipc")).as[Array[Byte]]
      .flatMap(decode(_))
      .toDF()
      // cast boxed columns to the exact parseLogs types (already equal;
      // the select pins column ORDER to the shared flattened contract)
      .select(fieldNames.map(col): _*)
  }

  /** batch receiver: read a spool directory of .arrow files */
  def readSpool(spark: SparkSession, dir: String): DataFrame =
    parseLogsArrow(spark.read.format("binaryFile").load(dir)
      .select(col("content").as("ipc")))

  /** streaming receiver: tail the spool directory (the arrow.go
    * receive loop minus gRPC framing — each file is one
    * BatchArrowRecords payload) */
  def streamSpool(spark: SparkSession, dir: String,
                  maxFilesPerTrigger: Int = 10): DataFrame =
    parseLogsArrow(spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(col("content").as("ipc")))
}
