package graft.sources

/** Mutable sorted-disjoint interval set tracking which byte ranges of a
  * block are locally populated — the reference's region mask
  * (reference region/region.go:9-124: Mask.Add / GetMissing / GetNextStart)
  * with the same coalescing semantics (touching runs merge).
  *
  * Thread-safe via synchronization: one mask guards one cache file, and
  * concurrent Spark tasks may read the same block.
  */
final class RegionMask {
  // flattened sorted disjoint [s0,e0,s1,e1,...]
  private var runs: Vector[Long] = Vector.empty

  /** Record [start, end) as populated. */
  def add(start: Long, end: Long): Unit = synchronized {
    if (end <= start) return
    val b = Vector.newBuilder[Long]
    var cs = start
    var ce = end
    var placed = false
    var i = 0
    while (i < runs.length) {
      val (bs, be) = (runs(i), runs(i + 1))
      if (be < cs) { b += bs += be }
      else if (bs > ce) {
        if (!placed) { b += cs += ce; placed = true }
        b += bs += be
      } else { cs = math.min(cs, bs); ce = math.max(ce, be) }
      i += 2
    }
    if (!placed) b += cs += ce
    runs = b.result()
  }

  /** Sub-ranges of [start, end) NOT yet populated (reference GetMissing). */
  def missing(start: Long, end: Long): Seq[(Long, Long)] = synchronized {
    if (end <= start) return Nil
    val out = Seq.newBuilder[(Long, Long)]
    var cursor = start
    var i = 0
    while (i < runs.length && cursor < end) {
      val (bs, be) = (runs(i), runs(i + 1))
      if (be <= cursor) { /* run entirely before cursor */ }
      else if (bs >= end) { i = runs.length - 2 /* done */ }
      else {
        if (bs > cursor) out += ((cursor, math.min(bs, end)))
        cursor = math.max(cursor, be)
      }
      i += 2
    }
    if (cursor < end) out += ((cursor, end))
    out.result()
  }

  def contains(start: Long, end: Long): Boolean = missing(start, end).isEmpty

  def populatedBytes: Long = synchronized {
    runs.grouped(2).map(p => p(1) - p(0)).sum
  }

  def regionCount: Int = synchronized { runs.length / 2 }

  def snapshot: Seq[(Long, Long)] = synchronized {
    runs.grouped(2).map(p => (p(0), p(1))).toSeq
  }
}
