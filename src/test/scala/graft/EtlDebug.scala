package graft

import graft.etl.MoviesEtl
import org.apache.spark.sql.functions._

/** Scratch diagnostics for the ETL pipeline stages (Test/runMain). */
object EtlDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val fx = (n: String) => s"/root/repo/src/test/resources/fixtures/$n"
    val wiki = MoviesEtl.readWikiJson(spark, fx("wiki_movies.json"))
    println(s"raw wiki: ${wiki.count()} cols=${wiki.columns.length}")
    val filtered = MoviesEtl.filterMovieRecords(wiki)
    println(s"filtered: ${filtered.count()}")
    val cleaned = MoviesEtl.cleanMovies(filtered)
    println(s"cleaned: ${cleaned.count()} cols=${cleaned.columns.sorted.mkString(",")}")
    val deduped = MoviesEtl.dedupByImdbId(cleaned)
    println(s"deduped: ${deduped.count()}")
    val parsed = MoviesEtl.parseWikiColumns(deduped)
    println(s"parsed: ${parsed.count()}")
    parsed.select("imdb_id", "title", "box_office", "budget_wiki", "release_date_wiki", "running_time").show(20, false)
    val kaggle = MoviesEtl.cleanKaggle(MoviesEtl.readCsv(spark, fx("movies_metadata.csv")))
    println(s"kaggle: ${kaggle.count()}")
    kaggle.select("imdb_id", "kaggle_id", "title", "budget_kaggle", "runtime", "revenue", "release_date_kaggle").show(20, false)
    val movies = MoviesEtl.mergeMovies(parsed, kaggle)
    println(s"movies: ${movies.count()}")
    movies.show(20, false)
    spark.stop()
  }
}
