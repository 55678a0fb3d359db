package graft

/** DuckDB mirror fragments shared by the oracle SQL of several query
  * modules — ONE definition per gated formula (tokens, shingles, hashed
  * shingles, stopword hits, quality score) so the mirrors cannot drift
  * apart. Every fragment here is hash-gated through each query that
  * embeds it, at both sf0.01 and sf0.1. */
object OracleSql {

  /** Mirror of [[operators.TextOps.tokens]] over a `text` column. */
  val toks = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** Mirror of [[operators.TextOps.shingles]] (k=3) given a toks binding. */
  def shingles(toks: String): String =
    s"CASE WHEN len($toks) >= 3 THEN list_transform(range(1, len($toks) - 1), " +
      s"i -> array_to_string(($toks)[i:i+2], ' ')) ELSE [] END"

  /** Mirror of the native ShingleSet kernel / TextOps.hashedShingles:
    * distinct 60-bit md5-prefix ids of the 3-shingles. */
  def hashedShingles(toks: String): String =
    s"list_distinct(list_transform(${shingles(toks)}, " +
      "s -> ('0x' || substr(md5(s), 1, 15))::BIGINT))"

  /** The `[...]` DuckDB list literal of [[operators.TextOps.stopwords]]. */
  def stopList(lang: String): String =
    operators.TextOps.stopwords(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  /** Mirror of [[operators.TextOps.stopwordHits]] for `lang`. */
  def stopHits(toks: String, lang: String): String =
    s"len(list_filter($toks, t -> list_contains(${stopList(lang)}, t)))"

  /** Mirror of [[operators.TextOps.qualityScore]] given a toks binding. */
  def quality(toks: String): String =
    s"""floor((
       |    least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0) * 0.4 +
       |    CAST(${stopHits(toks, "en")} AS DOUBLE) / CAST(len($toks) AS DOUBLE) * 0.4 +
       |    least(CAST(list_sum(list_transform($toks, x -> length(x))) AS DOUBLE)
       |      / CAST(len($toks) AS DOUBLE) / 10.0, 1.0) * 0.2) * 1000000) / 1000000""".stripMargin
}
