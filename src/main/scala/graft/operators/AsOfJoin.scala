package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: attach to each left row the latest right
  * row with the same key and time ≤ the left time — "what was the
  * state when this event happened". Spark has no native as-of join;
  * rather than a custom SparkPlan, this composes built-ins (the
  * preferred tier): union both sides, one window pass per key
  * carrying the last-seen state forward, keep left rows.
  *
  * One shuffle on the key; the sort is the window's. At 100 TB this
  * beats the naive range-join formulation (which explodes to an
  * inequality join) — state propagation is linear in rows.
  *
  * Right side must be unique per (key, time) — pre-aggregate if not
  * (ambiguous as-of matches are nondeterministic in any engine).
  */
object AsOfJoin {

  /** @param left        event side
    * @param right       state side, unique per (key, time)
    * @param key         join key column name (same on both sides)
    * @param leftTime    integral event-time column on left
    * @param rightTime   integral state-time column on right
    * @param stateCols   right-side payload columns to carry
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           stateCols: Seq[String]): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("__t", col(leftTime).cast("long"))
      .withColumn("__is_event", lit(1))
    val r = right.select((col(key) +: col(rightTime).cast("long").as("__t") +:
        stateCols.map(c => col(c).as(s"__s_$c"))): _*)
      .withColumn("__is_event", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // state sorts before events at equal time => "<=" as-of semantics
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__is_event"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry ONE struct per right row, null on event rows: per-column
    // last(ignoreNulls) would stitch fields from different right rows
    // whenever a state value is genuinely NULL — a composite snapshot
    // no right row ever held. The struct keeps the match row-atomic.
    val carried = unioned
      .withColumn("__state", when(col("__is_event") === 0,
        struct(stateCols.map(c => col(s"__s_$c").as(c)): _*)))
      .withColumn("__last_state", last(col("__state"), ignoreNulls = true).over(w))
    carried.filter(col("__is_event") === 1)
      .select(lCols.map(col) ++
        stateCols.map(c => col("__last_state").getField(c).as(s"asof_$c")): _*)
  }
}
