package graft.core

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Object-store-safe filesystem access for the non-parquet artifacts (the
  * reference-shaped `.chi`/TIFF/CSV/txt tree and the geometry cache).
  *
  * The parquet tables already go through Spark's Hadoop-based writers, but
  * the compatibility sinks used raw `java.nio.file` — fine on the beamline
  * NFS posture the reference targets (pipeline.py:44-52 writes the same
  * way), wrong for a 100 TB deployment on HDFS/S3. Every path here is a
  * Hadoop-resolved URI: `file:/...`, `hdfs://...`, `s3a://...` all work,
  * and a bare `/path` resolves against `fs.defaultFS` exactly like
  * Spark's own sinks.
  *
  * Executor-side use: capture [[Fs.onExecutors]] OUTSIDE the closure (it
  * wraps the driver's Hadoop configuration in a serializable carrier),
  * then call the methods with `hc.value` inside — a bare
  * `new Configuration()` built on an executor would drop cluster-specific
  * fs settings (credential providers, endpoints, defaultFS).
  */
object Fs {

  /** Serializable carrier for a Hadoop `Configuration` (which itself is a
    * `Writable`, not `Serializable`). Java-serialization hooks write the
    * conf's key/values through its own wire format. */
  final class HadoopConf(@transient private var conf: Configuration)
      extends Serializable {
    def value: Configuration = conf
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }

  /** Driver-side configuration of the active session. */
  def conf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  /** Serializable carrier of the driver's Hadoop conf for
    * foreachPartition closures. */
  def onExecutors(spark: SparkSession): HadoopConf =
    new HadoopConf(conf(spark))

  private def fsOf(p: Path, c: Configuration): FileSystem =
    p.getFileSystem(c)

  def exists(p: String, c: Configuration): Boolean = {
    val path = new Path(p)
    fsOf(path, c).exists(path)
  }

  /** True iff `p` exists AND holds at least one parquet DATA file
    * (recursively). The streaming stores' guard: a batch that admitted
    * nothing leaves a fileless `batch=<id>` directory, and a bare
    * directory-existence check would send the next batch's read into
    * an UNABLE_TO_INFER_SCHEMA crash. */
  def hasParquetData(p: String, c: Configuration): Boolean = {
    def hasParquet(fs: FileSystem, path: Path): Boolean =
      fs.listStatus(path).exists { st =>
        if (st.isDirectory) hasParquet(fs, st.getPath)
        else st.getPath.getName.endsWith(".parquet")
      }
    val path = new Path(p)
    val fs = fsOf(path, c)
    fs.exists(path) && hasParquet(fs, path)
  }

  def mkdirs(p: String, c: Configuration): Unit = {
    val path = new Path(p)
    fsOf(path, c).mkdirs(path)
  }

  /** Create-or-overwrite a small file in one shot (parents auto-created —
    * Hadoop `FileSystem.create` semantics, same on posix and object
    * stores). The sinks' files are KB-sized, so a single write + close
    * is both the simplest and the object-store-friendly shape (one PUT).
    */
  def write(p: String, bytes: Array[Byte], c: Configuration): Unit = {
    val path = new Path(p)
    val out = fsOf(path, c).create(path, true)
    try out.write(bytes)
    finally out.close()
  }

  def writeString(p: String, body: String, c: Configuration): Unit =
    write(p, body.getBytes(StandardCharsets.UTF_8), c)

  /** Read a small file fully (test/probe helper). */
  def readString(p: String, c: Configuration): String = {
    val path = new Path(p)
    val in = fsOf(path, c).open(path)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }
}
