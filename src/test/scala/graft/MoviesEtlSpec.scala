package graft

import graft.etl.MoviesEtl
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** End-to-end golden test of the reference pipeline shape on the
  * FIXTURES.md §A fixtures (wiki JSON + kaggle CSV + ratings CSV).
  */
class MoviesEtlSpec extends SparkSpec {

  private lazy val result = MoviesEtl.extractTransformLoad(spark,
    fixture("wiki_movies.json"),
    fixture("movies_metadata.csv"),
    fixture("ratings.csv"))

  private def movieRow(imdbId: String): Row =
    result.movies.filter(col("imdb_id") === imdbId).collect()(0)

  test("record filter, dedup, inner join and outlier drop land on 8 movies") {
    // 12 wiki records: -1 TV series (No. of episodes), -1 no imdb_link,
    // -1 duplicate imdb_id; 9 join kaggle on imdb_id → 9 matches minus
    // the (wiki>1996, kaggle<1965) outlier (tt0000009) → 8.
    assert(result.movies.count() == 8)
    assert(result.movies.filter(col("imdb_id") === "tt0000009").count() == 0)
    assert(result.movies.filter(col("imdb_id") === "tt0000003").count() == 0)
  }

  test("adult row is filtered from kaggle side") {
    assert(result.movies.filter(col("title") === "Adult Only").count() == 0)
  }

  test("zero-sentinel fills take wiki values where kaggle is 0") {
    val beta = movieRow("tt0000002")
    assert(beta.getAs[Double]("budget") == 1.2e9)       // kaggle 0 → wiki "$1.2 billion"
    assert(beta.getAs[Double]("revenue") == 1.0e8)      // kaggle 0 → wiki "$90-100 million"
    val delta = movieRow("tt0000004")
    assert(delta.getAs[Double]("runtime") == 95.0)      // kaggle 0 → wiki "95 m"
    val alpha = movieRow("tt0000001")
    assert(alpha.getAs[Double]("budget") == 2.0e7)      // kaggle non-zero wins
  }

  test("money grammar flows through the pipeline") {
    val delta = movieRow("tt0000004")
    assert(delta.getAs[Double]("budget") == 4.5e7)      // "[1]$45,000,000"
    val kappa = movieRow("tt0000011")
    assert(kappa.getAs[Double]("budget") == 1.5e8)      // kaggle 150M (non-zero)
  }

  test("curated schema has the reference's final column names") {
    val cols = result.movies.columns.toSet
    for (c <- Seq("imdb_id", "kaggle_id", "title", "wikipedia_url", "runtime",
      "budget", "revenue", "release_date", "director", "writers"))
      assert(cols.contains(c), s"missing column $c")
  }

  test("writer consolidation merges the four source spellings") {
    assert(movieRow("tt0000002").getAs[String]("writers") == "Writer B")
    assert(movieRow("tt0000004").getAs[String]("writers") == "Writer D")
  }

  test("alt-titles map collects language variants through the pipeline") {
    // alt_titles is assembled pre-curation; assert on the cleaned frame
    val cleaned = MoviesEtl.cleanMovies(MoviesEtl.filterMovieRecords(
      MoviesEtl.readWikiJson(spark, fixture("wiki_movies.json"))))
    val beta = cleaned.filter(col("title") === "Beta Film")
      .select("alt_titles").collect()(0).getMap[String, String](0)
    assert(beta == Map("French" -> "Le Film Beta"))
    val delta = cleaned.filter(col("title") === "Delta Motion Picture")
      .select("alt_titles").collect()(0).getMap[String, String](0)
    assert(delta.keySet == Set("Hangul", "Revised Romanization", "McCune-Reischauer"))
    // the language columns themselves are gone from the frame
    assert(!cleaned.columns.contains("French") && !cleaned.columns.contains("Hangul"))
  }

  test("ratings pivot: counts per star bucket with zero fill") {
    val wr = result.moviesWithRatings
    val alpha = wr.filter(col("imdb_id") === "tt0000001").collect()(0)
    assert(alpha.getAs[Long]("rating_4.0") == 3L)       // users 1, 7, 9
    assert(alpha.getAs[Long]("rating_0.5") == 1L)
    assert(alpha.getAs[Long]("rating_2.0") == 0L)       // zero-filled
    val lambda = wr.filter(col("imdb_id") === "tt0000012").collect()(0)
    assert(lambda.getAs[Long]("rating_2.0") == 1L)
    assert(lambda.getAs[Long]("rating_5.0") == 0L)
  }

  test("moviesWithRatings preserves movie count (left join)") {
    assert(result.moviesWithRatings.count() == 8)
  }

  test("load writes parquet sinks") {
    val out = java.nio.file.Files.createTempDirectory("etl_out").toString
    MoviesEtl.load(result, out)
    val back = spark.read.parquet(s"$out/movies")
    assert(back.count() == 8)
  }

  test("resilient run with all sources healthy matches the strict façade") {
    val run = MoviesEtl.extractTransformLoadResilient(spark,
      fixture("wiki_movies.json"),
      fixture("movies_metadata.csv"),
      fixture("ratings.csv"))
    assert(run.failed.isEmpty)
    assert(run.completed.contains("merge_movies") &&
      run.completed.contains("ratings_pivot_join"))
    assert(run.result.movies.count() == 8)
    assert(run.result.moviesWithRatings.count() == 8)
  }

  test("resilient run degrades per stage: bad kaggle → wiki-only, bad ratings → unmerged") {
    val run = MoviesEtl.extractTransformLoadResilient(spark,
      fixture("wiki_movies.json"),
      "/nonexistent/kaggle.csv",
      "/nonexistent/ratings.csv")
    assert(run.failed.map(_._1) == Seq("kaggle_clean", "ratings_read"))
    // wiki spine survives: 9 records post filter+dedup (no kaggle join,
    // so no outlier drop to 8)
    assert(run.result.movies.count() == 9)
    // no ratings → moviesWithRatings degrades to movies
    assert(run.result.moviesWithRatings.count() == 9)
  }
}
