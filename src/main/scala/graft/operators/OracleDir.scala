package graft.operators

/** Resolves WHICH corpus dir's engine-emitted fixture a generated
  * oracle (l54w/l53/l20/l64) should bind to.
  *
  * The fixture caches are keyed by corpus dir, but the oracle dump
  * (`SparkEntry.oracleSql`) is a plain map with no dir parameter — the
  * r14 implementation bound each entry to a last-write-wins slot, which
  * is correct only while one JVM verifies one dir (advisor r14: a
  * future in-process multi-scale gate would check dir A's output
  * against dir B's model). Resolution instead:
  *
  *   1. `active` — set by Verify to the dir it is dumping (and by any
  *      other harness that runs lanes against a specific dir);
  *   2. with no active dir, a SOLE built fixture is unambiguous;
  *   3. with multiple dirs built and no active dir, the entry is
  *      OMITTED — the driver then records the weaker rows-only check,
  *      which beats silently hashing against the wrong corpus's model.
  */
private[graft] object OracleDir {

  /** The corpus dir whose generated oracles should be emitted. */
  @volatile private[graft] var active: Option[String] = None

  /** Pick the fixture for the active dir out of a per-dir cache. */
  def select[V](built: java.util.concurrent.ConcurrentHashMap[String, V])
      : Option[V] =
    active match {
      case Some(d) => Option(built.get(d))
      case None =>
        if (built.size == 1) Some(built.values.iterator.next()) else None
    }
}
