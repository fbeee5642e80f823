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
        case 6 if files.nonEmpty => // vectored scatter-gather read
          val p = files(rnd.nextInt(files.length))
          val expect = Files.readAllBytes(Paths.get(truth, p))
          if (expect.length > 0) {
            import scala.jdk.CollectionConverters._
            val ranges = (1 to (rnd.nextInt(3) + 1)).map { _ =>
              val off = rnd.nextInt(expect.length)
              val len = math.min(expect.length - off, rnd.nextInt(4000) + 1)
              org.apache.hadoop.fs.FileRange.createFileRange(off.toLong, len)
            }.asJava
            val in = fs.open(new Path("/" + p))
            in.readVectored(ranges, (n: Int) => java.nio.ByteBuffer.allocate(n))
            ranges.asScala.foreach { r =>
              val buf = r.getData.get(30, java.util.concurrent.TimeUnit.SECONDS)
              val arr = new Array[Byte](r.getLength)
              buf.get(arr)
              val off = r.getOffset.toInt
              assert(java.util.Arrays.equals(arr,
                java.util.Arrays.copyOfRange(expect, off, off + r.getLength)),
                s"op $opIdx: vectored read mismatch $p off=$off len=${r.getLength}")
            }
            in.close()
          }
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

  /** The reference fuzz DSL also drives push (`p`) and mount (`m`/`M`)
    * between mutations (core/fuzz_entry.go:10-171). Property: a snapshot
    * published mid-sequence stays byte-identical to its publish-time tree
    * no matter how the live tree mutates afterwards — snapshot isolation
    * under the Merkle/CAS design (mutation can't reach frozen blocks). */
  test("fuzz with publish/mount: snapshots stay frozen under live mutation") {
    val backing = Files.createTempDirectory("fuzzp-backing").toString
    val repo = Files.createTempDirectory("fuzzp-repo").toString
    val conf = new Configuration()
    conf.set("fs.pufs.impl", classOf[PufsFileSystem].getName)
    conf.set("fs.pufs.backing", backing)
    conf.set("fs.pufs.cache", Files.createTempDirectory("fuzzp-cache").toString)
    conf.setLong("fs.pufs.chunk.size", 4096)
    conf.setLong("fs.pufs.readahead", 0)
    conf.setBoolean("fs.pufs.impl.disable.cache", true)
    val fs = FileSystem.get(java.net.URI.create("pufs:///"), conf)

    val rnd = new scala.util.Random(777)
    var files = Vector.empty[String]
    var nextId = 0
    // label -> content of every file at publish time
    var snaps = Vector.empty[(String, Map[String, Array[Byte]])]
    val live = scala.collection.mutable.Map.empty[String, Array[Byte]]

    try {
      (1 to 120).foreach { opIdx =>
        rnd.nextInt(10) match {
          case 0 | 1 | 2 => // create (or overwrite) through pufs
            nextId += 1
            val p = s"d${rnd.nextInt(3)}/f$nextId.bin"
            val content = new Array[Byte](rnd.nextInt(30000) + 1)
            rnd.nextBytes(content)
            val out = fs.create(new Path("/" + p), true)
            out.write(content); out.close()
            live(p) = content
            files = (files.filterNot(_ == p)) :+ p
          case 3 if files.nonEmpty => // delete
            val p = files(rnd.nextInt(files.length))
            assert(fs.delete(new Path("/" + p), false))
            live.remove(p)
            files = files.filterNot(_ == p)
          case 4 if opIdx > 10 => // push + mount (reference `p` + `m`)
            val label = s"snap${snaps.size}"
            SnapshotStore.publish(backing, repo, label)
            PufsFileSystem.mountSnapshot(s"fz/$label", repo, label)
            snaps :+= (label -> live.toMap.map { case (k, v) => k -> v.clone() })
          case _ if snaps.nonEmpty && rnd.nextBoolean() => // snapshot read
            val (label, frozen) = snaps(rnd.nextInt(snaps.length))
            if (frozen.nonEmpty) {
              val p = frozen.keys.toSeq(rnd.nextInt(frozen.size))
              val expect = frozen(p)
              val off = rnd.nextInt(expect.length)
              val len = math.min(expect.length - off, rnd.nextInt(6000) + 1)
              val buf = new Array[Byte](len)
              val in = fs.open(new Path(s"/fz/$label/$p"))
              in.readFully(off.toLong, buf, 0, len)
              in.close()
              assert(java.util.Arrays.equals(buf,
                java.util.Arrays.copyOfRange(expect, off, off + len)),
                s"op $opIdx: snapshot $label read of $p diverged from its " +
                  "publish-time bytes — isolation broken")
            }
          case _ if files.nonEmpty => // live ranged read
            val p = files(rnd.nextInt(files.length))
            val expect = live(p)
            val off = rnd.nextInt(expect.length)
            val len = math.min(expect.length - off, rnd.nextInt(6000) + 1)
            val buf = new Array[Byte](len)
            val in = fs.open(new Path("/" + p))
            in.readFully(off.toLong, buf, 0, len)
            in.close()
            assert(java.util.Arrays.equals(buf,
              java.util.Arrays.copyOfRange(expect, off, off + len)),
              s"op $opIdx: live read mismatch $p")
          case _ => ()
        }
      }
      // final sweep: EVERY snapshot still serves its full publish-time tree
      snaps.foreach { case (label, frozen) =>
        frozen.foreach { case (p, expect) =>
          val buf = new Array[Byte](expect.length)
          val in = fs.open(new Path(s"/fz/$label/$p"))
          in.readFully(0L, buf, 0, buf.length)
          in.close()
          assert(java.util.Arrays.equals(buf, expect),
            s"final: snapshot $label file $p diverged")
        }
      }
      assert(snaps.nonEmpty, "sequence never published — weak run")
    } finally {
      snaps.foreach { case (label, _) => PufsFileSystem.unmountSnapshot(s"fz/$label") }
      fs.close()
    }
  }
}
