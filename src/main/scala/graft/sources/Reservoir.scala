package graft.sources

/** Bounded reservoir sampler with percentile extraction — the reference's
  * `Population` (core/samples.go:109-170): uniform reservoir of the last
  * population, reported as p50/p90/p99 in the 5-second stats ticker
  * (reference pufs/cmd/mount.go:305-316).
  *
  * Deterministic replacement (counter-hash, not Random) so tests are
  * reproducible; thread-safe via synchronization (writers are the fetch
  * paths, low frequency relative to the IO they measure).
  */
final class Reservoir(capacity: Int) {
  private val buf = new Array[Long](capacity)
  private var n = 0L // total recorded

  def record(v: Long): Unit = synchronized {
    if (n < capacity) buf(n.toInt) = v
    else {
      // deterministic pseudo-random slot: splitmix-style hash of the count
      var z = n + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      val r = java.lang.Long.remainderUnsigned(z ^ (z >>> 31), n + 1)
      if (r < capacity) buf(r.toInt) = v
    }
    n += 1
  }

  def count: Long = synchronized(n)

  def percentiles(ps: Seq[Double]): Seq[Long] = synchronized {
    val size = math.min(n, capacity.toLong).toInt
    if (size == 0) ps.map(_ => 0L)
    else {
      val sorted = buf.take(size).sorted
      ps.map { p =>
        val idx = math.min(size - 1, math.max(0, (p * (size - 1)).round.toInt))
        sorted(idx)
      }
    }
  }

  def reset(): Unit = synchronized { n = 0 }
}
