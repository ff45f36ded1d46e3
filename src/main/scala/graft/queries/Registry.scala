package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: a Spark implementation plus (when SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables. Column names and
  * types must match between the two — the driver's compare sorts columns by
  * name and hashes values (see the builder contract in SparkEntry).
  */
final case class Q(
    name: String,
    oracle: Option[String]
)(val run: (SparkSession, String) => DataFrame)

object Registry {
  def all: Seq[Q] =
    Relational.all ++ LlmOps.all ++ PMapOps.all ++ MMOps.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
