package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The 5-second stats ticker (reference pufs/cmd/mount.go:63-75), captured
  * at a fast test cadence: ≥2 ticks with plausible numbers that move when
  * real pufs IO happens between them. */
class StatsHeartbeatSpec extends AnyFunSuite {

  private def awaitTicks(hb: StatsHeartbeat, n: Long, timeoutMs: Long): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (hb.ticks.get() < n && System.nanoTime() < deadline) Thread.sleep(5)
    assert(hb.ticks.get() >= n, s"only ${hb.ticks.get()} ticks in $timeoutMs ms")
  }

  test("publishes the PrintStats line on a cadence; counters move with IO") {
    PufsFileSystem.simulateRestart()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val hb = new StatsHeartbeat(25, lines.add(_))
    try {
      awaitTicks(hb, 2, 5000)
      val first = lines.peek()
      // the report shape: totals, percentiles, gauge, trailing rate
      assert(first.contains("fetches=") && first.contains("latency_us(p50/p90/p99)=")
        && first.contains("size_b(p50/p90/p99)=") && first.contains("rate_5s="))
      val fetchesBefore =
        "fetches=(\\d+)".r.findFirstMatchIn(first).get.group(1).toLong

      // real pufs IO between ticks: lazy-pull a slice through the cache
      val data = new Array[Byte](64 * 1024)
      new scala.util.Random(3).nextBytes(data)
      val src = Files.createTempDirectory("hb-src").resolve("blk.bin")
      Files.write(src, data)
      val entry = PufsFileSystem.cacheEntry(
        Files.createTempDirectory("hb-cache").toString, "hb-block", data.length)
      val in = new LazyPullInputStream(entry, new LocalStore(src.toFile),
        data.length, 8192, 0)
      val buf = new Array[Byte](5000)
      in.readFully(20000L, buf, 0, 5000)
      in.close()

      val tickAtIo = hb.ticks.get()
      awaitTicks(hb, tickAtIo + 2, 5000)
      val after = lines.toArray(Array.empty[String]).last
      val fetchesAfter =
        "fetches=(\\d+)".r.findFirstMatchIn(after).get.group(1).toLong
      assert(fetchesAfter > fetchesBefore,
        s"ticker did not observe the pull: $after")
      assert("bytes=(\\d+)".r.findFirstMatchIn(after).get.group(1).toLong >= 8192)
    } finally hb.close()
  }

  test("a throwing sink does not kill the timer") {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val hb = new StatsHeartbeat(10, _ => {
      n.incrementAndGet()
      throw new RuntimeException("sink down")
    })
    try {
      awaitTicks(hb, 3, 5000)
      assert(n.get() >= 3)
    } finally hb.close()
  }

  test("global heartbeat is idempotent and stoppable") {
    StatsHeartbeat.stopGlobal()
    StatsHeartbeat.ensureGlobal(60000)
    StatsHeartbeat.ensureGlobal(60000) // second call must not leak a thread
    val count = Thread.getAllStackTraces.keySet.stream()
      .filter(_.getName == "pufs-stats-heartbeat").count()
    assert(count == 1, s"$count heartbeat threads")
    StatsHeartbeat.stopGlobal()
  }
}
