package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.MainPipeline
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query;
  * each query with DuckDB-expressible semantics has an equivalent oracle in
  * `oracleSql` (column names aligned on both sides — the driver sorts columns
  * by name and hash-compares values). Queries without an oracle entry get the
  * weaker rows-only check and are asserted in ScalaTest instead.
  */
object SparkEntry {

  /** Flagship: the full reference pipeline (densify → normalise → rolling
    * family → rates → trim → EAV melt → keyed BLAKE2s hash) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    MainPipeline.run(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TimeseriesQueries.queries ++ EventQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ MiscQueries.queries ++ ServingQueries.queries ++
      RoutedQueries.queries

  def oracleSql: Map[String, String] =
    TimeseriesQueries.oracles ++ EventQueries.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ MiscQueries.oracles ++ ServingQueries.oracles ++
      RoutedQueries.oracles
}
