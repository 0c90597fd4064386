package graft.pipeline

import java.util.concurrent.atomic.AtomicLong

/** Receiver-side admission control — the otel-arrow receiver's
  * bounded in-flight memory budget (reference behavior: the Arrow
  * receiver admits a request's byte size against a fixed budget
  * BEFORE buffering it; a full budget makes further requests WAIT
  * (backpressure to the transport), a bounded waiter count converts
  * pile-ups into immediate refusal, and a single request larger than
  * the whole budget can never be admitted, so it is rejected rather
  * than deadlocking a waiter forever).
  *
  * This is the receive-side twin of the export-side reactive
  * admission (`exportStreamAdmitted`): that one bounds how much a
  * micro-batch may carry OUT of the spool; this one bounds how many
  * received-but-not-yet-durable bytes a push receiver may hold in
  * MEMORY. Once a payload is spooled (durable, readable by the
  * streaming file receivers) its budget share is released — disk is
  * the 100 TB-scale buffer, memory is not.
  *
  * Plain monitor-based accounting: admission decisions are a few
  * comparisons under a lock at request rate (not row rate) — never
  * on a Spark executor path.
  */
object AdmissionController {
  /** why an acquire did not succeed */
  sealed trait Refusal
  /** the payload alone exceeds the whole budget — waiting can never
    * help; the caller should reject permanently (entity too large) */
  case object TooLarge extends Refusal
  /** the budget is full and the waiting room is too — the caller
    * should throttle (retryable: 429/RESOURCE_EXHAUSTED) */
  case object TooManyWaiters extends Refusal
  /** the budget did not free up within the caller's patience —
    * retryable throttle */
  case object Timeout extends Refusal
  /** the PROCESS heap is above the limiter's soft limit — retryable
    * (the reference memory limiter's refuse-data verdict); distinct
    * from the byte-budget refusals because no release will clear it,
    * only falling heap usage */
  case object MemoryPressure extends Refusal
}

final class AdmissionController(val maxBytes: Long, val maxWaiters: Int = 64) {
  import AdmissionController._
  require(maxBytes > 0, "admission budget must be positive")
  require(maxWaiters >= 0, "maxWaiters must be non-negative")

  private val lock = new Object
  private var inFlight = 0L
  private var waiters = 0
  /** high-water mark of admitted in-flight bytes — observability and
    * the spec's "never exceeded the budget" witness */
  val highWater = new AtomicLong
  val admitted = new AtomicLong
  val refused = new AtomicLong

  /** current admitted-but-unreleased bytes */
  def inFlightBytes: Long = lock.synchronized(inFlight)

  /** optional process-heap trigger (reference memorylimiter wired
    * into receiver admission): while the limiter refuses, EVERY
    * acquire refuses retryably regardless of the byte budget */
  @volatile private var heapGate: () => Boolean = () => false
  def withHeapLimiter(hl: HeapLimiter): this.type = {
    heapGate = () => hl.mustRefuse; this
  }

  /** Admit `bytes`, waiting up to `waitMs` for the budget to free.
    * Left(refusal) never admitted anything; Right(()) must be paired
    * with exactly one [[release]] of the same size. */
  def acquire(bytes: Long, waitMs: Long = Long.MaxValue): Either[Refusal, Unit] = {
    require(bytes >= 0, "negative payload size")
    if (bytes > maxBytes) { refused.incrementAndGet(); return Left(TooLarge) }
    if (heapGate()) { refused.incrementAndGet(); return Left(MemoryPressure) }
    val deadline =
      if (waitMs == Long.MaxValue) Long.MaxValue
      else System.nanoTime() + waitMs * 1000000L
    lock.synchronized {
      if (inFlight + bytes > maxBytes && waiters >= maxWaiters) {
        refused.incrementAndGet(); return Left(TooManyWaiters)
      }
      waiters += 1
      try {
        while (inFlight + bytes > maxBytes) {
          val remainNs =
            if (deadline == Long.MaxValue) Long.MaxValue
            else deadline - System.nanoTime()
          if (remainNs <= 0) { refused.incrementAndGet(); return Left(Timeout) }
          if (remainNs == Long.MaxValue) lock.wait()
          else lock.wait(remainNs / 1000000L, (remainNs % 1000000L).toInt)
        }
        inFlight += bytes
        admitted.incrementAndGet()
        highWater.getAndAccumulate(inFlight, math.max(_, _))
        Right(())
      } finally waiters -= 1
    }
  }

  /** return an admitted payload's bytes to the budget (call exactly
    * once per successful acquire, after the payload is durable or
    * dropped) */
  def release(bytes: Long): Unit = lock.synchronized {
    inFlight = math.max(0L, inFlight - bytes)
    lock.notifyAll()
  }

  /** run `f` under an admission slot, releasing on every exit path */
  def withAdmission[A](bytes: Long, waitMs: Long = Long.MaxValue)(
      f: => A): Either[Refusal, A] =
    acquire(bytes, waitMs).map { _ =>
      try f finally release(bytes)
    }
}
