package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The round-8 regression class: a throwing query must fail LOUDLY in
  * the correctness artifacts, not vanish from the record.
  */
class HarnessSpec extends SparkSpec {

  test("Verify.dump: a deliberately-broken query lands in " +
      "_verify_errors.json; good dumps and escaped oracle still write") {
    val out = java.nio.file.Files.createTempDirectory("harness").toString
    val good: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq((1L, "a")).toDF("id", "v") }
    val broken: (SparkSession, String) => DataFrame =
      (s, _) => s.read.parquet("/nonexistent/deliberately/broken.parquet")
    val errors = Verify.dump(spark, "/unused", out,
      Map("q_good" -> good, "q_broken" -> broken),
      Map("q_good" -> "SELECT 1 AS a,\n\t\"b\" FROM t"))
    // the failure is recorded, keyed by query, with the cause
    assert(errors.keySet == Set("q_broken"))
    assert(errors("q_broken").contains("PATH_NOT_FOUND") ||
      errors("q_broken").toLowerCase.contains("path does not exist"))
    val errFile = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/_verify_errors.json"))
    assert(errFile.contains("\"q_broken\""))
    // the good dump still wrote (one failure must not poison the round)
    val re = spark.read.parquet(s"$out/q_good").collect()
    assert(re.length == 1 && re(0).getLong(0) == 1L)
    // oracle_sql.json escapes control chars and quotes — the driver's
    // strict json.load must not choke on builder-authored SQL
    val oracleFile = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    assert(oracleFile.contains("\\n") && oracleFile.contains("\\t") &&
      oracleFile.contains("\\\"b\\\""))
    assert(!oracleFile.exists(c => c < ' ' && c != '\n'.toChar),
      "raw control characters leaked into oracle_sql.json")
  }
}
