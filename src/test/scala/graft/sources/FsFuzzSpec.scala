package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.SparkSpec
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Randomized op-sequence differential: the same seeded sequence of
  * create/mkdir/rename/delete/read ops runs against pufs:// and a plain
  * ground-truth tree; every read and the final tree must agree byte-for-
  * byte. This is the reference's fuzz layer (core/fuzz_entry.go:10-171
  * script DSL over two datastores + benchmark/stress.go differential)
  * collapsed into one property. */
class FsFuzzSpec extends SparkSpec {

  test("150 random ops: pufs tree ≡ ground-truth tree") {
    val backing = Files.createTempDirectory("fuzz-backing").toString
    val truth = Files.createTempDirectory("fuzz-truth").toString
    val conf = new Configuration()
    conf.set("fs.pufs.impl", classOf[PufsFileSystem].getName)
    conf.set("fs.pufs.backing", backing)
    conf.set("fs.pufs.cache", Files.createTempDirectory("fuzz-cache").toString)
    conf.setLong("fs.pufs.chunk.size", 4096)
    conf.setLong("fs.pufs.readahead", 0)
    conf.setBoolean("fs.pufs.impl.disable.cache", true)
    val fs = FileSystem.get(java.net.URI.create("pufs:///"), conf)

    val rnd = new scala.util.Random(2024)
    var files = Vector.empty[String]
    var nextId = 0
    def freshPath(): String = {
      val depth = rnd.nextInt(3)
      val dirs = (0 until depth).map(_ => s"d${rnd.nextInt(4)}")
      nextId += 1
      (dirs :+ s"f$nextId.bin").mkString("/")
    }

    (1 to 150).foreach { opIdx =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => // create
          val p = freshPath()
          val content = new Array[Byte](rnd.nextInt(50000) + 1)
          rnd.nextBytes(content)
          val tp = Paths.get(truth, p)
          Files.createDirectories(tp.getParent)
          Files.write(tp, content)
          val out = fs.create(new Path("/" + p))
          out.write(content); out.close()
          files :+= p
        case 3 => // mkdirs
          val d = s"d${rnd.nextInt(4)}/d${rnd.nextInt(4)}"
          fs.mkdirs(new Path("/" + d))
          Files.createDirectories(Paths.get(truth, d))
        case 4 if files.nonEmpty => // rename
          val src = files(rnd.nextInt(files.length))
          val dst = freshPath()
          Files.createDirectories(Paths.get(truth, dst).getParent)
          Files.move(Paths.get(truth, src), Paths.get(truth, dst),
            StandardCopyOption.REPLACE_EXISTING)
          assert(fs.rename(new Path("/" + src), new Path("/" + dst)),
            s"op $opIdx: rename $src -> $dst failed")
          files = files.filterNot(_ == src) :+ dst
        case 5 if files.nonEmpty => // delete
          val p = files(rnd.nextInt(files.length))
          Files.delete(Paths.get(truth, p))
          assert(fs.delete(new Path("/" + p), false), s"op $opIdx: delete $p failed")
          files = files.filterNot(_ == p)
        case _ if files.nonEmpty => // ranged read
          val p = files(rnd.nextInt(files.length))
          val expect = Files.readAllBytes(Paths.get(truth, p))
          val off = rnd.nextInt(expect.length)
          val len = math.min(expect.length - off, rnd.nextInt(8000) + 1)
          val buf = new Array[Byte](len)
          val in = fs.open(new Path("/" + p))
          in.readFully(off.toLong, buf, 0, len)
          in.close()
          assert(java.util.Arrays.equals(buf,
            java.util.Arrays.copyOfRange(expect, off, off + len)),
            s"op $opIdx: read mismatch $p off=$off len=$len")
        case _ => ()
      }
    }

    // final differential: identical file sets, identical bytes
    def walkTruth(): Map[String, Array[Byte]] = {
      val root = Paths.get(truth)
      val s = Files.walk(root)
      try s.filter(Files.isRegularFile(_)).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .map(p => root.relativize(p).toString -> Files.readAllBytes(p)).toMap
      finally s.close()
    }
    val truthTree = walkTruth()
    assert(truthTree.keySet == files.toSet)
    files.foreach { p =>
      val st = fs.getFileStatus(new Path("/" + p))
      assert(st.getLen == truthTree(p).length, s"size mismatch $p")
      val buf = new Array[Byte](st.getLen.toInt)
      val in = fs.open(new Path("/" + p))
      if (buf.length > 0) in.readFully(0L, buf, 0, buf.length)
      in.close()
      assert(java.util.Arrays.equals(buf, truthTree(p)), s"final bytes mismatch $p")
    }
    fs.close()
  }
}
