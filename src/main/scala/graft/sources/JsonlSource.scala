package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-contracted JSONL corpus ingest with corrupt-line quarantine —
  * the de-facto interchange format for training-data pipelines (one JSON
  * document per line, appended by many producers, routinely carrying
  * truncated or malformed lines a batch must SURVIVE, not die on).
  *
  * Design rules (the [[FrameSource.toPixels]] quarantine posture,
  * applied to text):
  *  - the caller's schema is a CONTRACT: fields are read as declared,
  *    extra JSON fields are ignored, missing fields are null;
  *  - a line that fails to parse against the contract lands in the
  *    quarantine output with its raw text intact — nothing is silently
  *    dropped and nothing kills the batch;
  *  - parsing happens ONCE: the raw lines are read as text and
  *    `from_json` splits clean/corrupt from the same projection, which
  *    sidesteps Spark's raw-JSON limitation (a reader-level
  *    `_corrupt_record` column cannot be filtered without caching the
  *    parsed relation — SPARK-21610) and keeps both outputs pure
  *    column logic over one scan.
  *
  * Scale shape: text-file scan → one `from_json` projection → two
  * filters. No shuffle anywhere; quarantine volume is corrupt-line
  * volume. JSONL is line-splittable, so a 100 TB directory parallelizes
  * by byte ranges exactly like any text source.
  */
object JsonlSource {

  /** Read `path` as JSONL against `schema`. Returns (clean, corrupt):
    * clean carries the schema's columns; corrupt carries the offending
    * raw line as `raw`. A line is corrupt when it fails to parse as a
    * JSON object (from_json yields null). JSON nulls and missing fields
    * are CLEAN (null columns) — schema-level nullability policy belongs
    * to the caller's downstream filters, not the decoder. */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): (DataFrame, DataFrame) =
    parseWithQuarantine(spark.read
      .schema(StructType(Seq(StructField("raw", StringType))))
      .text(path), schema)

  /** The parse half of [[readWithQuarantine]], over an ALREADY-LOADED
    * single-string-column DataFrame of raw lines (its first column is
    * the line text, whatever its name) — the seam that lets the same
    * contract parsing run over any line source: a text scan, a
    * streaming socket, or an in-plan rendering. Pure column logic over
    * one pass of the input; no shuffle, fully lazy. */
  def parseWithQuarantine(lines: DataFrame,
                          schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_jl_corrupt"),
      "the schema already carries the _jl_corrupt helper field")
    // backtick-quote the input column: a bare col(name) would mis-parse
    // a NAME containing a dot as a nested path — the same hazard the
    // getField comment below guards on the schema side
    val first = lines.columns.head
    val raw = lines
      .select(col("`" + first.replace("`", "``") + "`").as("raw"))
    // PERMISSIVE from_json yields an ALL-NULL struct for a malformed
    // line — indistinguishable from a valid object of nulls — so
    // corruption is detected via an explicit corrupt-record field
    // (non-null exactly when the line failed the contract); a null
    // struct (empty line) is corrupt too
    val pSchema = schema.add(StructField("_jl_corrupt", StringType))
    val parsed = raw.select(col("raw"),
      from_json(col("raw"), pSchema,
        java.util.Map.of("columnNameOfCorruptRecord", "_jl_corrupt")).as("j"))
    val bad = col("j").isNull || col("j._jl_corrupt").isNotNull
    // getField (literal name) rather than col("j.f") string paths: a
    // schema field whose NAME contains a dot (legal JSON) would
    // otherwise mis-parse as a nested path
    val clean = parsed.where(!bad)
      .select(schema.fieldNames.map(f => col("j").getField(f).as(f)): _*)
    val corrupt = parsed.where(bad).select(col("raw"))
    (clean, corrupt)
  }
}
