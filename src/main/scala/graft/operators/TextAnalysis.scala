package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** Per-document text analysis: language ID, quality scoring, token
  * counting, fingerprinting. Pure per-row Column expressions — no shuffle,
  * trivially parallel at any scale, pushdown-friendly.
  */
object TextAnalysis {

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von"),
    "fr" -> Seq("le", "les", "des", "et", "une", "dans"))

  private def hitRatio(wordsCol: Column, set: Seq[String]): Column = {
    val hits = size(filter(wordsCol, w => w.isInCollection(set)))
    hits.cast("double") / size(wordsCol)
  }

  private def sqlHitRatio(set: Seq[String]): String = {
    val inList = set.map(s => s"'$s'").mkString(",")
    s"len(list_filter(w, x -> x IN ($inList))) * 1.0 / len(w)"
  }

  private val sqlWords =
    """WITH d AS (SELECT doc_id, trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) t, text FROM documents),
      |wd AS (SELECT doc_id, text, t, string_split(t, ' ') w FROM d)""".stripMargin

  /** Stopword-score language ID with a fixed argmax precedence
    * (en > es > de > fr > unknown). On this synthetic corpus the text is
    * English-like regardless of the `lang` label — the point is the
    * deterministic scoring operator, not a production model.
    */
  def langid(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Text.wordsFast($"text")
    val scored = Tables.documents(spark, dir).select($"doc_id",
      hitRatio(w, stopwords("en")).as("s_en"), hitRatio(w, stopwords("es")).as("s_es"),
      hitRatio(w, stopwords("de")).as("s_de"), hitRatio(w, stopwords("fr")).as("s_fr"))
    scored.withColumn("predicted_lang",
      when($"s_en" >= $"s_es" && $"s_en" >= $"s_de" && $"s_en" >= $"s_fr" && $"s_en" > 0, "en")
        .when($"s_es" >= $"s_de" && $"s_es" >= $"s_fr" && $"s_es" > 0, "es")
        .when($"s_de" >= $"s_fr" && $"s_de" > 0, "de")
        .when($"s_fr" > 0, "fr")
        .otherwise("unknown"))
  }

  val langidSql: String = sqlWords + s"""
    SELECT doc_id,
      ${sqlHitRatio(stopwords("en"))} AS s_en, ${sqlHitRatio(stopwords("es"))} AS s_es,
      ${sqlHitRatio(stopwords("de"))} AS s_de, ${sqlHitRatio(stopwords("fr"))} AS s_fr,
      CASE WHEN ${sqlHitRatio(stopwords("en"))} >= ${sqlHitRatio(stopwords("es"))}
             AND ${sqlHitRatio(stopwords("en"))} >= ${sqlHitRatio(stopwords("de"))}
             AND ${sqlHitRatio(stopwords("en"))} >= ${sqlHitRatio(stopwords("fr"))}
             AND ${sqlHitRatio(stopwords("en"))} > 0 THEN 'en'
           WHEN ${sqlHitRatio(stopwords("es"))} >= ${sqlHitRatio(stopwords("de"))}
             AND ${sqlHitRatio(stopwords("es"))} >= ${sqlHitRatio(stopwords("fr"))}
             AND ${sqlHitRatio(stopwords("es"))} > 0 THEN 'es'
           WHEN ${sqlHitRatio(stopwords("de"))} >= ${sqlHitRatio(stopwords("fr"))}
             AND ${sqlHitRatio(stopwords("de"))} > 0 THEN 'de'
           WHEN ${sqlHitRatio(stopwords("fr"))} > 0 THEN 'fr'
           ELSE 'unknown' END AS predicted_lang
    FROM wd"""

  /** Quality scoring: length stats, punctuation ratio, stopword ratio,
    * composite score — the usual pre-training corpus filters.
    */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Text.wordsFast($"text")
    val nWords = size(w)
    val nChars = length($"text")
    val nPunct = length(regexp_replace($"text", "[a-zA-Z0-9 ]", ""))
    val stopRatio = hitRatio(w, stopwords("en"))
    Tables.documents(spark, dir).select($"doc_id",
      nChars.as("n_chars"), nWords.as("n_words"),
      ((length(Text.normalizeFastUdf($"text")) - nWords + 1).cast("double") / nWords).as("avg_word_len"),
      (nPunct.cast("double") / nChars).as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      (least(nWords.cast("double") / 100.0, lit(1.0)) * 0.5 + stopRatio * 0.5).as("quality_score"))
  }

  val qualitySql: String = sqlWords + s"""
    SELECT doc_id,
      length(text) AS n_chars,
      CAST(len(w) AS INT) AS n_words,
      (length(t) - len(w) + 1) * 1.0 / len(w) AS avg_word_len,
      length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 1.0 / length(text) AS punct_ratio,
      ${sqlHitRatio(stopwords("en"))} AS stopword_ratio,
      least(len(w) * 1.0 / 100.0, 1.0) * 0.5 + ${sqlHitRatio(stopwords("en"))} * 0.5 AS quality_score
    FROM wd"""

  /** Token counting: canonical word count + a BPE-ish regex token count
    * (letter runs / digit runs / single non-alnum symbols).
    */
  def tokens(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
    Tables.documents(spark, dir).select($"doc_id",
      size(Text.wordsFast($"text")).as("n_words"),
      regexp_count(lower($"text"), lit(pattern)).as("n_regex_tokens"),
      (length($"text").cast("double") /
        greatest(regexp_count(lower($"text"), lit(pattern)), lit(1))).as("chars_per_token"))
  }

  val tokensSql: String = sqlWords + """
    SELECT doc_id,
      CAST(len(w) AS INT) AS n_words,
      CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS n_regex_tokens,
      length(text) * 1.0 / greatest(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')), 1) AS chars_per_token
    FROM wd"""

  /** TF-IDF-style salient terms: top-3 words per document ranked by
    * tf/df (term frequency over corpus document frequency). The ratio
    * needs no transcendentals, so the ordering is bit-deterministic
    * across engines; the emitted columns are all integers (rank, tf, df)
    * — no floats in the hash compare. Shape: explode → two groupBys
    * (tf per (doc,word), df per word) → top-k window; at 100 TB the df
    * table is words-cardinality (broadcastable) and the window is the
    * same map-side-limited top-k as q_topk_window.
    */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
    val words = Tables.documents(spark, dir)
      .select($"doc_id", explode(Text.wordsFast($"text")).as("word"))
      .filter(length($"word") >= 3)
    val tf = words.groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val df = words.select($"doc_id", $"word").distinct()
      .groupBy($"word").agg(count(lit(1)).as("df"))
    tf.join(df, "word")
      .withColumn("rk", row_number().over(
        w.partitionBy($"doc_id")
          .orderBy(($"tf" * lit(1.0) / $"df").desc, $"word".asc)))
      .filter($"rk" <= 3)
      .select($"doc_id", $"word", $"rk", $"tf", $"df")
  }

  val tfidfSql: String = sqlWords + """
    , words AS (
      SELECT doc_id, unnest(w) AS word FROM wd),
    fw AS (SELECT doc_id, word FROM words WHERE length(word) >= 3),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM fw GROUP BY 1, 2),
    df AS (SELECT word, count(DISTINCT doc_id) AS df FROM fw GROUP BY 1),
    ranked AS (
      SELECT t.doc_id, t.word, t.tf, df.df,
             row_number() OVER (PARTITION BY t.doc_id
               ORDER BY t.tf * 1.0 / df.df DESC, t.word ASC) AS rk
      FROM tf t JOIN df USING (word))
    SELECT doc_id, word, CAST(rk AS INT) AS rk, tf, df
    FROM ranked WHERE rk <= 3"""

  /** Content fingerprint: md5 of the normalized text (SQL-oracled). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select($"doc_id",
      md5(Text.normalizeFastUdf($"text")).as("fp_md5"),
      length(Text.normalizeFastUdf($"text")).as("norm_len"))
  }

  val fingerprintSql: String = """
    SELECT doc_id,
      md5(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))) AS fp_md5,
      length(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))) AS norm_len
    FROM documents"""

  /** Order-sensitive 61-bit rolling polynomial fingerprint (Rabin–Karp).
    * Not SQL-expressible → rows-only driver check; SketchSpec pins known
    * vectors.
    */
  def rollhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select($"doc_id",
      Text.rollingHashUdf(Text.normalizeFastUdf($"text")).as("fp_roll"))
  }

  /** Overlapping word-window chunking — the tokenize-and-window step that
    * turns documents into training sequences: 32-word chunks on a 24-word
    * stride (8-word overlap), each identified by (doc_id, chunk_idx) and
    * fingerprinted by md5 of the chunk text.
    *
    * Plan shape: one projection computes `words` ONCE into a column, then
    * sequence+posexplode fan out start offsets and `slice` reads the
    * materialized array — the lambda-free form (HOFs referencing a
    * computed subtree re-evaluate it per element; an attribute reference
    * is just a row read). Pure per-row fan-out ×(n_words/stride), no
    * shuffle anywhere.
    */
  def chunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ChunkWords = 32
    val Stride = 24
    Tables.documents(spark, dir)
      .select($"doc_id", Text.wordsFast($"text").as("w"))
      .select($"doc_id", $"w",
        posexplode(sequence(lit(0), size($"w") - 1, lit(Stride)))
          .as(Seq("chunk_idx", "start_word")))
      .select($"doc_id", $"chunk_idx", $"start_word",
        slice($"w", $"start_word" + 1, lit(ChunkWords)).as("chunk"))
      .select($"doc_id", $"chunk_idx", $"start_word",
        size($"chunk").as("n_chunk_words"),
        md5(concat_ws(" ", $"chunk")).as("chunk_md5"))
  }

  val chunksSql: String = sqlWords + """,
    c AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx, CAST(i * 24 AS INT) AS start_word,
                 w[i*24 + 1 : i*24 + 32] AS chunk
          FROM wd, LATERAL (SELECT unnest(range(0, (len(w) - 1) // 24 + 1)) AS i))
    SELECT doc_id, chunk_idx, start_word,
           CAST(len(chunk) AS INT) AS n_chunk_words,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM c"""
}
