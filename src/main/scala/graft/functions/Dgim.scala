package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** DGIM (Datar–Gionis–Indyk–Motwani, "Maintaining Stream Statistics over
  * Sliding Windows", SIAM J. Comput. 2002): approximate count of 1-bits in
  * the last W time units of a bit stream using O(log² W) space.
  *
  * Semantics mirror the reference engine (cited file:line, not copied):
  *  - bucket = (timestamp seconds, size), newest first; each 1-bit inserts
  *    a size-1 bucket, then any 3 equal-size buckets merge the middle two
  *    (middle timestamp kept, size doubled)
  *    — /root/reference/src/main/java/com/bencejdanko/flink/DGIMAccumulator.java:129-160
  *  - buckets expire when latest - ts >= W — DGIMAccumulator.java:167-176
  *  - estimate = all bucket sizes except the oldest + ceil(oldest/2)
  *    — DGIMAccumulator.java:75-95 (the Java flagship rounds up; the PyFlink
  *    variant rounds down — we follow the flagship)
  *  - accumulator merge = concat, sort desc by ts, re-merge, expire
  *    — DGIMAccumulator.java:104-123
  */
object Dgim {

  /** Mergeable, Encoder-friendly DGIM state. `ts` and `size` are parallel
    * arrays, newest first.
    */
  case class State(windowSeconds: Long, latest: Long, ts: Array[Long], size: Array[Long]) {
    def estimate: Long = {
      val (t, s) = expired(latest)
      if (s.isEmpty) 0L
      else if (s.length == 1) s.head
      else s.view.slice(0, s.length - 1).sum + (s.last + 1) / 2
    }
    private def expired(now: Long): (Array[Long], Array[Long]) = {
      val keep = ts.indices.takeWhile(i => now - ts(i) < windowSeconds)
      (keep.map(ts).toArray, keep.map(size).toArray)
    }
  }

  def emptyState(windowSeconds: Long): State =
    State(windowSeconds, 0L, Array.empty, Array.empty)

  /** Mutable builder used on the hot path (one per group/partition). */
  final class Builder(val windowSeconds: Long) {
    private val bts = ArrayBuffer.empty[Long]   // newest first
    private val bsz = ArrayBuffer.empty[Long]
    private var latest = 0L

    def add(tsSeconds: Long): Unit = {
      latest = math.max(latest, tsSeconds)
      bts.insert(0, tsSeconds)
      bsz.insert(0, 1L)
      mergeTriples()
      expire(tsSeconds)
    }

    /** Merge rule: while 3 consecutive buckets share a size, double the
      * middle one and drop the oldest of the three (restart scan, matching
      * the reference's loop shape).
      */
    private def mergeTriples(): Unit = {
      var i = 0
      while (i + 2 < bsz.length) {
        if (bsz(i) == bsz(i + 1) && bsz(i + 1) == bsz(i + 2)) {
          bsz(i + 1) *= 2
          bts.remove(i + 2)
          bsz.remove(i + 2)
          i = 0
        } else i += 1
      }
    }

    private def expire(now: Long): Unit =
      while (bts.nonEmpty && now - bts.last >= windowSeconds) {
        bts.remove(bts.length - 1)
        bsz.remove(bsz.length - 1)
      }

    def state: State = State(windowSeconds, latest, bts.toArray, bsz.toArray)

    def loadFrom(s: State): Builder = {
      latest = s.latest
      bts.clear(); bts ++= s.ts
      bsz.clear(); bsz ++= s.size
      this
    }

    def rebalanceAndExpire(): Unit = { mergeTriples(); expire(latest) }
  }

  /** Deterministic batch path: sorted 1-bit timestamps → estimate at the
    * max timestamp. This is the reference PyFlink job's semantics
    * (sort-then-fold, /root/reference/src/usrcode/job.py:75-93) with the
    * flagship's round-up estimate.
    */
  def estimateSorted(sortedTsSeconds: Array[Long], windowSeconds: Long): Long = {
    val b = new Builder(windowSeconds)
    var i = 0
    while (i < sortedTsSeconds.length) { b.add(sortedTsSeconds(i)); i += 1 }
    b.state.estimate
  }

  /** Canonical merge of two states: concat, sort desc, re-merge, expire. */
  def merge(a: State, b: State): State = {
    val w = math.max(a.windowSeconds, b.windowSeconds)
    val pairs = (a.ts.zip(a.size) ++ b.ts.zip(b.size)).sortBy(-_._1)
    val builder = new Builder(w)
    builder.loadFrom(State(w, math.max(a.latest, b.latest),
      pairs.map(_._1), pairs.map(_._2)))
    builder.rebalanceAndExpire()
    builder.state
  }
}

/** Typed Aggregator exposing DGIM to DataFrame/streaming aggregation:
  * `ds.groupBy(window(...)).agg(udaf(new DgimAggregator(3600)).apply($"ts_sec"))`.
  *
  * reduce() consumes timestamps in encounter order (the reference's
  * accumulate semantics, approximate under repartitioning); merge() is the
  * canonical bucket merge. For the deterministic batch twin use
  * `Dgim.estimateSorted` via mapGroups.
  */
/** Raw traffic message shape fed to [[DgimBitAggregator]]: the reference's
  * accumulate(value, timestampSeconds) signature
  * (DGIMAggregateFunction.java:56-78).
  */
case class BitEvent(value: String, tsSec: Long)

/** DGIM over (value, ts) pairs: non-numeric values are skipped, only
  * bit == 1 feeds the sketch — the reference's lenient accumulate.
  */
class DgimBitAggregator(windowSeconds: Long) extends Aggregator[BitEvent, Dgim.State, Long] {
  override def zero: Dgim.State = Dgim.emptyState(windowSeconds)
  override def reduce(b: Dgim.State, e: BitEvent): Dgim.State = {
    val isOne = e.value != null && e.value.trim.toIntOption.contains(1)
    if (!isOne) b
    else {
      val builder = new Dgim.Builder(windowSeconds).loadFrom(b)
      builder.add(e.tsSec)
      builder.state
    }
  }
  override def merge(a: Dgim.State, b: Dgim.State): Dgim.State = Dgim.merge(a, b)
  override def finish(r: Dgim.State): Long = r.estimate
  override def bufferEncoder: Encoder[Dgim.State] = Encoders.product[Dgim.State]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

class DgimAggregator(windowSeconds: Long) extends Aggregator[Long, Dgim.State, Long] {
  override def zero: Dgim.State = Dgim.emptyState(windowSeconds)
  override def reduce(b: Dgim.State, tsSeconds: Long): Dgim.State = {
    val builder = new Dgim.Builder(windowSeconds).loadFrom(b)
    builder.add(tsSeconds)
    builder.state
  }
  override def merge(a: Dgim.State, b: Dgim.State): Dgim.State = Dgim.merge(a, b)
  override def finish(r: Dgim.State): Long = r.estimate
  override def bufferEncoder: Encoder[Dgim.State] = Encoders.product[Dgim.State]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
