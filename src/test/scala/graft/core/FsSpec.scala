package graft.core

import graft.SparkSpec
import graft.sinks.Sinks

/** graft.core.Fs — Hadoop-FileSystem-backed file access for the
  * compatibility sinks and caches. The deployment contract: every path is
  * a Hadoop URI, so `file:`, `hdfs:` and `s3a:` behave identically; these
  * specs exercise the `file:` scheme EXPLICITLY (the only one available
  * in the sandbox) plus scheme-less paths resolving to the default FS. */
class FsSpec extends SparkSpec {

  private def conf = Fs.conf(spark)

  test("write/read/exists/mkdirs round-trip through an explicit file: URI") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fs").toString
    val uri = s"file:$dir/sub/nested"
    assert(!Fs.exists(uri, conf))
    Fs.mkdirs(uri, conf)
    assert(Fs.exists(uri, conf))
    Fs.writeString(s"$uri/a.txt", "hello\n", conf)
    assert(Fs.readString(s"$uri/a.txt", conf) == "hello\n")
    // overwrite is create-or-replace, and parents auto-create
    Fs.writeString(s"$uri/deep/b.txt", "x", conf)
    Fs.writeString(s"$uri/deep/b.txt", "y", conf)
    assert(Fs.readString(s"$uri/deep/b.txt", conf) == "y")
    // the same file is visible through the scheme-less local path
    assert(new java.io.File(s"$dir/sub/nested/deep/b.txt").exists())
  }

  test("executor-side sink writes work against a file: URI outDir") {
    import spark.implicits._
    val integ = Seq((1, 0, 1.05, 10.0), (1, 2, 1.25, 30.0))
      .toDF("frame_no", "tth_bin", "tth", "i_base")
    val dir = java.nio.file.Files.createTempDirectory("graft_fs_chi").toString
    // the URI travels into foreachPartition tasks via the serialized conf
    Sinks.writeChi(integ, s"file:$dir", "base", dense = Some((4, 1.0, 0.1)))
    val f = new java.io.File(s"$dir/frame-00001_base.chi")
    assert(f.exists(), "chi file not written through the file: URI")
    val lines = scala.io.Source.fromFile(f).getLines().toSeq
    assert(lines(3).trim == "4")
    val vals = lines.drop(4).map(_.trim.split("\\s+")(1).toDouble)
    assert(vals == Seq(10.0, 0.0, 30.0, 0.0))
  }

  test("geometry cache existence check resolves file: URIs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fs_geo").toString
    val cal = SyntheticFrame.testCalibration(16)
    val geo1 = graft.geometry.Geometry.buildCached(spark, cal, s"file:$dir")
    val n1 = geo1.count()
    // second call must hit the cache (same path exists), not rebuild
    val cached = new java.io.File(dir).list()
      .count(_.startsWith("geometry_"))
    assert(cached == 1)
    val geo2 = graft.geometry.Geometry.buildCached(spark, cal, s"file:$dir")
    assert(geo2.count() == n1)
  }
}
