package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders over the driver testdata layout (`$dir/<name>.parquet`).
  *
  * All engine queries read through here so the scan path is a single
  * choke-point. Default: plain parquet over the local filesystem. Set
  * SPARK_GRAFT_PUFS=1 to route every table read through the `pufs://`
  * lazily-caching FileSystem (graft.sources.PufsFileSystem) with the
  * testdata dir as backing store — same results, byte-range-lazy IO
  * (verified by PufsFsSpec's differential test).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** OPT-IN scan-split for scaling probes (r20, VERDICT r19 #5). The
    * driver's testdata tables are single-file single-ROW-GROUP parquet,
    * so every scan stage is ONE task no matter what SPARK_GRAFT_CPUS
    * says: the low-vs-high-core scaling probe has no signal, and every
    * lane's map-side work (shingling, hashing, window building) runs
    * serially. With this conf set to the session's core count
    * (SPARK_GRAFT_SPLIT_READS=1 in Bench/LaneProbe; Verify, tests, and
    * the oracle path never set it, so declared plans and artifacts are
    * untouched), a table whose OBSERVED scan parallelism is below the
    * value is round-robin repartitioned to it on read. The decision
    * derives from the observed partition count + file length, so
    * multi-file production inputs bypass the extra exchange entirely.
    * Tiny dims (< 256 KiB: region, nation, supplier) stay unsplit —
    * they exist to be broadcast. NOT the bench default: measured at
    * sf0.1 (OPTIMIZATION_r20.md), the forced exchange of full base-
    * table rows costs 1.5-2x more than the parallelism buys on these
    * latency-bound lanes — the honest fix for the probe is multi-row-
    * group testdata, which only the driver can ship. */
  private[graft] val SplitScansKey = "spark.graft.bench.splitScans"
  private val SplitMinBytes = 256L * 1024
  // (scan partitions, file bytes) per dir/name — plan metadata, not data
  private val scanMeta =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()

  private def maybeSplit(spark: SparkSession, dir: String, name: String,
      df: DataFrame): DataFrame = {
    val want = spark.conf.getOption(SplitScansKey).map(_.toInt).getOrElse(0)
    if (want <= 1) return df
    val (parts, bytes) = scanMeta.computeIfAbsent(s"$dir/$name", _ => {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val len = try p.getFileSystem(spark.sessionState.newHadoopConf())
        .getContentSummary(p).getLength
      catch { case _: Throwable => Long.MaxValue }
      (df.rdd.getNumPartitions, len)
    })
    if (parts >= want || bytes < SplitMinBytes) df else df.repartition(want)
  }

  /** Load one testdata table. Parquet scan → Catalyst handles column
    * pruning + predicate pushdown; callers must NOT cache or collect.
    *
    * `events.parquet` has shipped with three different `ts` physical
    * types across driver generations: TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read nanos as long via the legacy conf
    * and convert), plain TIMESTAMP(MICROS) with isAdjustedToUTC=false
    * (read as TIMESTAMP_NTZ — cast to TimestampType; sessions pin UTC so
    * the instant is identical), or a session-zoned TIMESTAMP (use as-is).
    * Branching on the OBSERVED schema keeps every lane working no matter
    * which generation of testdata is mounted. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path =
      if (sys.env.get("SPARK_GRAFT_PUFS").contains("1")) {
        val hc = spark.sparkContext.hadoopConfiguration
        hc.set("fs.pufs.impl", "graft.sources.PufsFileSystem")
        // the backing dir rides in the URI authority (the bucket), NOT in
        // shared conf: lazy execution of a plan built against dir A must
        // not resolve against whatever dir was configured last (ADVICE
        // r2). Authority-distinct URIs also cache as distinct FS
        // instances, so no cache disabling is needed.
        val token = "d" + java.security.MessageDigest.getInstance("MD5")
          .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
        val prefix = graft.sources.PufsFileSystem.registerBacking(token, dir)
        s"$prefix/$name.parquet"
      } else s"$dir/$name.parquet"
    val df = if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path)
      raw.schema("ts").dataType match {
        case LongType => // nanos-as-long generation
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => // micros, not UTC-adjusted
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else {
      spark.read.parquet(path)
    }
    maybeSplit(spark, dir, name, df)
  }

  /** Register every table as a temp view (for SQL-only surfaces such as
    * GROUPING SETS — Spark SQL shares the same Catalyst plans). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
