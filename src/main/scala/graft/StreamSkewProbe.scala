package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skewed stream-stream join evidence (VERDICT r18 #8) — the measurement
  * behind [[graft.streaming.StreamJobs.clickViewJoinSalted]]: t13's
  * scaladoc names the hot-user hazard ("a skewed power user salts like
  * any hot equi key"); this probe quantifies it on the t13/clickViewJoin
  * batch frame at a zipf user distribution (user 1 holds 5% of BOTH
  * streams — 50× any tail user's share; per-key join work is QUADRATIC
  * in the key's rows, so the hot key owns ~95% of all matched pairs
  * and its entire probe volume lands in one shuffle partition; tail
  * uniform over 1000 users) and measures the salted form against it.
  * The head share is deliberately 5%, not 50%: at K=100 a half-hot
  * stream's pair term is ~10¹¹ evaluations and the probe would measure
  * nothing but one task running for hours on EITHER arm (salting
  * PARALLELIZES the hot key's work; it cannot shrink it).
  *
  * Three cells per scale K (clicks = 1k·K, views = 10k·K, event times
  * uniform over 30 days, 5-minute attribution window — the
  * clickViewJoin constant):
  *
  *   plain_noaqe  — the unsalted join with AQE skew-splitting OFF: the
  *                  STREAMING regime (AQE does not apply to streaming
  *                  state-store joins), where one partition owns the hot
  *                  user's entire probe volume
  *   salted_noaqe — clickViewJoinSalted's shape (clicks pick one salt,
  *                  views replicate ×8), same AQE-off session: the
  *                  structural fix streaming must use
  *   plain_aqe    — the unsalted join with AQE skew-join ON: the BATCH
  *                  answer, for honest context (batch callers should
  *                  just let AQE split; salting is for streams)
  *
  * Broadcast is disabled throughout (at 100 TB the view side does not
  * broadcast; letting local-mode broadcast erase the shuffle would
  * measure nothing). All three cells must return the same pair count —
  * the probe REQUIREs it.
  *
  *   SPARK_GRAFT_SSKEW_CLICKS  base clicks (default 1,000)
  *   SPARK_GRAFT_SSKEW_VIEWS   base views (default 10,000)
  *   SPARK_GRAFT_SSKEW_KS      scales (default "10,100")
  *   SPARK_GRAFT_SSKEW_SALTS   salt count (default 8)
  *
  * Prints ONE JSON line:
  *   {"metric":"stream_skew_probe","salts":S,
  *    "cells":{"x10":{"plain_noaqe":s,"salted_noaqe":s,"plain_aqe":s,
  *                    "rows":n,"hot_share":f}, ...}}
  */
object StreamSkewProbe {

  def main(args: Array[String]): Unit = {
    val baseC = sys.env.getOrElse("SPARK_GRAFT_SSKEW_CLICKS", "1000").toLong
    val baseV = sys.env.getOrElse("SPARK_GRAFT_SSKEW_VIEWS", "10000").toLong
    val ks = sys.env.getOrElse("SPARK_GRAFT_SSKEW_KS", "10,100")
      .split(",").map(_.trim.toInt).toSeq
    val salts = sys.env.getOrElse("SPARK_GRAFT_SSKEW_SALTS", "8").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // zipf-head streams: 5% of rows on user 1 (50× any tail user),
    // tail uniform over 1000 users
    def users(seed: Long) =
      expr(s"CASE WHEN abs(hash(id, ${seed}L)) % 100 < 5 THEN 1L " +
        s"ELSE 2 + abs(hash(id, ${seed + 1}L)) % 1000 END")
    def clicksOf(n: Long): DataFrame = spark.range(n).select(
      expr("timestamp_seconds(CAST(abs(hash(id, 11L)) % 2592000 AS BIGINT))")
        .as("cts"),
      users(21).as("c_user"))
    def viewsOf(n: Long): DataFrame = spark.range(n).select(
      expr("timestamp_seconds(CAST(abs(hash(id, 12L)) % 2592000 AS BIGINT))")
        .as("vts"),
      users(31).as("v_user"))

    def plainJoin(c: DataFrame, v: DataFrame): DataFrame =
      c.join(v, expr("c_user = v_user AND " +
        "vts BETWEEN cts - INTERVAL 5 MINUTES AND cts"))
    def saltedJoin(c: DataFrame, v: DataFrame): DataFrame = {
      val cs = c.withColumn("c_salt",
        pmod(xxhash64(col("cts")), lit(salts.toLong)).cast("int"))
      val vs = v.withColumn("v_salt",
        explode(array((0 until salts).map(i => lit(i)): _*)))
      cs.join(vs, expr("c_user = v_user AND c_salt = v_salt AND " +
        "vts BETWEEN cts - INTERVAL 5 MINUTES AND cts"))
    }

    def withConf[A](k: String, v: String)(f: => A): A = {
      val saved = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try f finally saved match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
    }
    val aqeSkew = "spark.sql.adaptive.skewJoin.enabled"
    val aqe = "spark.sql.adaptive.enabled"

    def timeCount(df: => DataFrame): (Double, Long) = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = df.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val a = once(); val b = once()
      (math.min(a._1, b._1), a._2)
    }

    val cells = ks.map { k =>
      val c = clicksOf(baseC * k)
      val v = viewsOf(baseV * k)
      val (tPlain, nPlain) = withConf(aqe, "false") {
        timeCount(plainJoin(c, v))
      }
      val (tSalt, nSalt) = withConf(aqe, "false") {
        timeCount(saltedJoin(c, v))
      }
      val (tAqe, nAqe) = withConf(aqe, "true") {
        withConf(aqeSkew, "true")(timeCount(plainJoin(c, v)))
      }
      require(nPlain == nSalt && nPlain == nAqe,
        s"arms disagree at x$k: $nPlain / $nSalt / $nAqe")
      val hot = withConf(aqe, "false") {
        plainJoin(c, v).filter(col("c_user") === 1L).count()
      }
      f""""x$k":{"plain_noaqe":$tPlain%.3f,"salted_noaqe":$tSalt%.3f,""" +
        f""""plain_aqe":$tAqe%.3f,"rows":$nPlain,""" +
        f""""hot_share":${hot.toDouble / math.max(1, nPlain)}%.3f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_skew_probe","salts":$salts,"cells":$cells}""")
    spark.stop()
  }
}
