package graft.operators

/** Pins the r20 staleness fix (VERDICT r19 #3): a rebuild producing
  * same-named, same-length files within one mtime granule must still
  * invalidate the resident model — the r19 name:len:mtime signature
  * served stale state in exactly that case. */
class ServeModelCacheSpec extends graft.SparkSpec {

  test("same-name same-length same-mtime rebuild invalidates the entry") {
    val dir = java.nio.file.Files.createTempDirectory("smc-spec").toFile
    try {
      val f = new java.io.File(dir, "model.bin")
      def write(content: String, mtime: Long): Unit = {
        java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
        assert(f.setLastModified(mtime))
      }
      val t0 = (System.currentTimeMillis() / 1000) * 1000 // whole granule
      var loads = 0
      def load() = { loads += 1; java.lang.Integer.valueOf(loads) }

      write("AAAA", t0)
      assert(ServeModelCache.cached(spark, dir.getPath)(load()) == 1)
      assert(ServeModelCache.cached(spark, dir.getPath)(load()) == 1,
        "unchanged content must stay a cache hit")

      write("BBBB", t0) // same name, same length, same mtime
      assert(ServeModelCache.cached(spark, dir.getPath)(load()) == 2,
        "content change with identical name/len/mtime must reload")
      assert(loads == 2)
    } finally {
      ServeModelCache.clear()
      dir.listFiles().foreach(_.delete()); dir.delete()
      ()
    }
  }
}
