package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries are assembled from per-domain registries; each entry is a
  * `QueryDef` carrying the Spark plan and (when SQL-expressible) its
  * DuckDB oracle SQL.
  */
object SparkEntry {

  def registry: Seq[QueryDef] =
    graft.queries.Relational.all ++
      graft.queries.Tpch.all ++
      graft.queries.VersionedTables.all ++
      graft.queries.DataQuality.all ++
      graft.queries.Documents.all ++
      graft.queries.Dedup.all ++
      graft.queries.StreamIngest.all ++
      graft.queries.Similarity.all ++
      graft.queries.Zk.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Bench headline subset. */
  def headlines: Seq[String] = registry.filter(_.headline).map(_.name)
}
