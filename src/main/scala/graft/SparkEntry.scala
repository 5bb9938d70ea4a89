package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` has a matching DuckDB oracle in `oracleSql`
  * (same column names — the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TextOps.wordCount(
      Tables.documents(spark, "/root/testdata/sf0.001"), "text")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_wordcount" -> ((s, d) => TextOps.wordCount(Tables.documents(s, d), "text")),
    "q_grep"      -> ((s, d) => TextOps.grep(Tables.documents(s, d), "text", "s[a-z]+")),
  )

  /** DuckDB oracles. The driver registers each parquet table as a view of
    * its bare name (contract example: `FROM lineitem`).
    */
  def oracleSql: Map[String, String] = Map(
    "q_wordcount" ->
      """SELECT word, count(*) AS cnt
         FROM (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents)
         WHERE word <> '' GROUP BY word""",
    "q_grep" ->
      """SELECT m AS match, count(*) AS cnt
         FROM (SELECT unnest(regexp_extract_all(text, 's[a-z]+')) AS m FROM documents)
         WHERE m <> '' GROUP BY m""",
  )
}
