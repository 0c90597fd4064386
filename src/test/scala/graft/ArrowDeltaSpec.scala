package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ArrowIpc

/** Wire-to-wire specs for long-lived Arrow streams: dictionary DELTA
  * messages on later batches, schema reset when a dictionary
  * overflows, lossless decode across both — and the payload-size
  * claim that deltas beat re-sending the accumulated dictionary.
  */
class ArrowDeltaSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("sev", StringType),
    StructField("svc", StringType)))

  private def row(id: Long, sev: String, svc: String): Row = Row(id, sev, svc)

  test("delta dictionaries: later batches ship only NEW entries; decode lossless; deltas beat full resend") {
    // long values: the dictionary payload (not the int32 indices) is
    // what deltas save, so make entries realistically heavy
    val pool = (0 until 400).map(i => f"service-$i%04d-" + ("x" * 80))
    val batch1 = pool.zipWithIndex.map { case (s, i) =>
      row(i.toLong, if (i % 2 == 0) "INFO" else "ERROR", s)
    }
    // batch2 references EVERY accumulated value once plus 3 new ones:
    // a full-dictionary resend must carry 403 entries, a delta just 3
    val batch2 = (pool ++ Seq("service-new-a", "service-new-b", "service-new-c"))
      .zipWithIndex.map { case (s, i) => row(1000L + i, "INFO", s) }
    // batch3 introduces nothing new: zero dictionary messages expected
    val batch3 = Seq(row(5000L, "ERROR", pool(7)))

    val enc = new ArrowIpc.DeltaStreamEncoder(schema, dictCap = 1024)
    val b1 = enc.writeBatch(batch1)
    val b2 = enc.writeBatch(batch2)
    val b3 = enc.writeBatch(batch3)
    val eos = enc.end()
    assert(enc.streamCount == 1, "no reset happened in this stream")

    // lossless decode through the PLAIN single-stream reader — the
    // Arrow reader itself applies delta batches mid-stream
    val all = batch1 ++ batch2 ++ batch3
    val back = ArrowIpc.decodeRows(schema, b1 ++ b2 ++ b3 ++ eos)
    assert(back == all)
    // and through the multi-stream decoder (same bytes, no reset)
    assert(ArrowIpc.decodeRowsMulti(schema, b1 ++ b2 ++ b3 ++ eos) == all)

    // the size claim: batch2's wire cost with a 3-entry DELTA must be
    // far under an independent stream that re-sends the full
    // accumulated dictionary alongside the same rows
    val fullResend = ArrowIpc.encodeRows(schema, batch2, dictCap = 1024)
    assert(b2.length < fullResend.length / 2,
      s"delta batch ${b2.length}B should undercut full-dict resend ${fullResend.length}B")
    // a batch with no new values carries no dictionary payload at all:
    // its overhead is the record batch alone (compare to a same-rows
    // batch that DID ship a dictionary delta)
    assert(b3.length < b2.length / 10,
      s"no-new-values batch ${b3.length}B vs delta batch ${b2.length}B")
  }

  test("dictionary overflow: EOS + schema reset to plain utf8, surviving columns keep their dictionaries") {
    val enc = new ArrowIpc.DeltaStreamEncoder(schema, dictCap = 8)
    val batch1 = (0 until 6).map(i => row(i.toLong, "INFO", s"svc-$i"))
    // 10 new svc values blow the cap of 8 → svc falls back to plain
    // utf8 in a fresh stream; sev (2 values) keeps its dictionary
    val batch2 = (0 until 10).map(i => row(100L + i, "ERROR", s"other-$i"))
    val batch3 = Seq(row(200L, "WARN", "svc-3"), row(201L, "INFO", "yet-another"))
    val b1 = enc.writeBatch(batch1)
    val b2 = enc.writeBatch(batch2)
    val b3 = enc.writeBatch(batch3)
    val eos = enc.end()
    assert(enc.streamCount == 2, "overflow must have reset the stream exactly once")

    val all = batch1 ++ batch2 ++ batch3
    assert(ArrowIpc.decodeRowsMulti(schema, b1 ++ b2 ++ b3 ++ eos) == all)
    // the reset batch re-declares schema + resends surviving dicts —
    // visibly bigger than a plain continuation batch of similar rows
    assert(b2.length > b3.length)
    // single-stream decode stops at the reset: only batch1 visible —
    // proving the reset really is a new stream, not an in-band patch
    assert(ArrowIpc.decodeRows(schema, b1 ++ b2 ++ b3 ++ eos) == batch1)
  }

  test("overflow on the FIRST batch starts plain without a reset; empty batch is a heartbeat") {
    val enc = new ArrowIpc.DeltaStreamEncoder(schema, dictCap = 4)
    val batch1 = (0 until 9).map(i => row(i.toLong, "INFO", s"svc-$i"))
    val b1 = enc.writeBatch(batch1)
    val hb = enc.writeBatch(Nil)
    val eos = enc.end()
    assert(enc.streamCount == 1, "first-batch overflow is a plain start, not a reset")
    assert(ArrowIpc.decodeRowsMulti(schema, b1 ++ hb ++ eos) == batch1)
    assert(hb.length < b1.length)
  }
}
