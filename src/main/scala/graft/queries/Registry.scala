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
  def all: Seq[Q] = {
    val qs = Relational.all ++ LlmOps.all ++ PMapOps.all ++ MMOps.all
    // fail fast on a reused name: .toMap below would silently keep only
    // the LAST entry, making one implementation vanish from the verify
    // dump with no error
    val dup = qs.groupBy(_.name).collect { case (n, vs) if vs.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    qs
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
