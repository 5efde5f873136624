package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** The curated movie record — the one schema in the pipeline that is
  * stable enough for the typed API (SURVEY §1.2: `Dataset[T]` for the
  * final movies schema, `DataFrame` for the 190-sparse-column wiki
  * frame whose schema is data-dependent).
  */
final case class Movie(
    imdb_id: String,
    kaggle_id: Option[Int],
    title: Option[String],
    runtime: Option[Double],
    budget: Option[Double],
    revenue: Option[Double],
    release_date: Option[java.sql.Date],
    director: Option[String],
    writers: Option[String])

object TypedMovies {

  /** Narrow the curated frame to the typed record. Encoder-driven
    * analysis catches schema drift at query-build time instead of at
    * first action.
    */
  def typed(movies: DataFrame): Dataset[Movie] = {
    val enc = Encoders.product[Movie]
    movies.select(
      col("imdb_id"), col("kaggle_id"), col("title"), col("runtime"),
      col("budget"), col("revenue"), col("release_date"), col("director"),
      col("writers")).as(enc)
  }

  /** Example typed transformations: compile-time-checked field access. */
  def profitable(ds: Dataset[Movie]): Dataset[Movie] =
    ds.filter(m => (for { b <- m.budget; r <- m.revenue } yield r > b).getOrElse(false))

  def totalRuntimeHours(ds: Dataset[Movie]): Double = {
    import ds.sparkSession.implicits._
    // agg, not reduce: reduce throws on an all-null/empty Dataset
    ds.flatMap(_.runtime).agg(sum("value")).collect()(0) match {
      case r if r.isNullAt(0) => 0.0
      case r => r.getDouble(0) / 60.0
    }
  }
}
