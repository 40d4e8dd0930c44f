package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dgim

class DgimSpec extends AnyFunSuite {

  private def exactInWindow(ts: Array[Long], w: Long): Long = {
    if (ts.isEmpty) return 0L
    val latest = ts.max
    ts.count(t => latest - t < w).toLong
  }

  test("empty stream estimates 0") {
    assert(Dgim.estimateSorted(Array.empty, 3600) === 0L)
  }

  test("small streams (no merges) are exact") {
    // With <= 2 one-bits all buckets have size 1 → estimate is exact.
    assert(Dgim.estimateSorted(Array(10L), 3600) === 1L)
    assert(Dgim.estimateSorted(Array(10L, 20L), 3600) === 2L)
  }

  test("expiry drops bits older than the window") {
    // bits at t=0..9 then one at t=5000 with W=3600: only the last remains
    val ts = (0L to 9L).toArray :+ 5000L
    assert(Dgim.estimateSorted(ts, 3600) === 1L)
  }

  test("estimate respects the DGIM 50% error bound (200 seeded random streams)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200) {
      val n = rnd.nextInt(2000)
      val w = Seq(60L, 600L, 3600L)(rnd.nextInt(3))
      val ts = Array.fill(n)(rnd.nextLong(7200L)).sorted
      val est = Dgim.estimateSorted(ts, w)
      val exact = exactInWindow(ts, w)
      // DGIM guarantee: |est - exact| <= exact/2 (+1 slack for the
      // flagship's round-up of the oldest bucket)
      assert(math.abs(est - exact) <= exact / 2 + 1,
        s"est=$est exact=$exact w=$w n=${ts.length}")
    }
  }

  test("dense stream estimate stays within bound (merge-heavy path)") {
    val ts = Array.tabulate(10000)(i => (i / 3).toLong) // 3 bits per second
    val est = Dgim.estimateSorted(ts, 3600)
    val exact = exactInWindow(ts, 3600)
    assert(math.abs(est - exact) <= exact / 2 + 1)
  }

  test("bucket invariant: at most 2 buckets of each size, sizes are powers of 2") {
    val b = new Dgim.Builder(3600)
    (0 until 5000).foreach(i => b.add(i / 2L))
    val st = b.state
    val bySize = st.size.groupBy(identity)
    bySize.foreach { case (sz, occ) =>
      assert((sz & (sz - 1)) == 0, s"size $sz not a power of 2")
      assert(occ.length <= 2, s"${occ.length} buckets of size $sz")
    }
  }

  test("canonical merge matches reference semantics and keeps the bound") {
    val left = {
      val b = new Dgim.Builder(3600); (0L until 300L).foreach(b.add); b.state
    }
    val right = {
      val b = new Dgim.Builder(3600); (300L until 700L).foreach(b.add); b.state
    }
    val merged = Dgim.merge(left, right)
    val exact = 700L // all within window of latest=699
    assert(math.abs(merged.estimate - exact) <= exact / 2 + 1)
    assert(merged.latest === 699L)
  }

  test("round-up (Java flagship) vs round-down (PyFlink) estimates, hand-computed") {
    // Two 1-bits → buckets [(20,1),(10,1)]; oldest has size 1, the only
    // parity where the two published semantics differ:
    //   flagship  (DGIMAccumulator.java:75-95): 1 + ceil(1/2) = 2
    //   PyFlink   (job.py:37-46, size // 2):    1 + floor(1/2) = 1
    assert(Dgim.estimateSorted(Array(10L, 20L), 3600, roundUp = true) === 2L)
    assert(Dgim.estimateSorted(Array(10L, 20L), 3600, roundUp = false) === 1L)
    assert(Dgim.estimateSorted(Array(10L), 3600, roundUp = true) === 1L)
    assert(Dgim.estimateSorted(Array(10L), 3600, roundUp = false) === 0L)
    // Three bits → triple-merge to [(30,1),(20,2)]; oldest size 2 is even
    // so ceil == floor and both variants agree at 1 + 1 = 2:
    assert(Dgim.estimateSorted(Array(10L, 20L, 30L), 3600, roundUp = true) === 2L)
    assert(Dgim.estimateSorted(Array(10L, 20L, 30L), 3600, roundUp = false) === 2L)
    // default estimate is the flagship's round-up
    val b = new Dgim.Builder(3600); b.add(10L); b.add(20L)
    assert(b.state.estimate === b.state.estimate(roundUp = true))
  }

  test("single live bucket: flagship returns its FULL size, PyFlink still floors") {
    // DGIMAccumulator.java:72-75 early-returns the bucket's full size when
    // only one bucket remains; job.py:37-46 has no special case and always
    // floors the last bucket. Internally built states only ever reach this
    // case with size 1 (where both forms coincide with the general rule),
    // so pin it with an externally constructed state of size 4:
    val lone = Dgim.State(3600L, 100L, Array(100L), Array(4L))
    assert(lone.estimate(roundUp = true) === 4L)
    assert(lone.estimate(roundUp = false) === 2L)
    // same, with an expired older bucket that must not resurrect the
    // general path: live prefix is still just the size-4 bucket
    val withExpired = Dgim.State(60L, 2000L, Array(2000L, 10L), Array(4L, 8L))
    assert(withExpired.estimate(roundUp = true) === 4L)
    assert(withExpired.estimate(roundUp = false) === 2L)
  }

  test("added() immutable fast path folds to the identical state as Builder") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      val n = rnd.nextInt(500)
      // UNSORTED: the streaming aggregator consumes arrival order, so the
      // fast path must match the builder on out-of-order streams too
      val ts = Array.fill(n)(rnd.nextLong(7200L))
      val viaBuilder = {
        val b = new Dgim.Builder(600); ts.foreach(b.add); b.state
      }
      val viaAdded = ts.foldLeft(Dgim.emptyState(600))(Dgim.added)
      assert(viaAdded.ts.toSeq === viaBuilder.ts.toSeq)
      assert(viaAdded.size.toSeq === viaBuilder.size.toSeq)
      assert(viaAdded.latest === viaBuilder.latest)
      assert(viaAdded.estimate === viaBuilder.estimate)
    }
  }

  test("out-of-order adds expire against the incoming timestamp (reference add semantics)") {
    val b = new Dgim.Builder(60)
    b.add(1000L); b.add(1001L); b.add(2000L)
    // bits at 1000/1001 are >= 60s older than 2000 → expired
    assert(b.state.estimate === 1L)
  }
}
