package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}

/** FALLBACK heuristic language identification: stopword voting with
  * a character-trigram tie-break — the zero-training path for text
  * with no model available. The PRIMARY path since round 15 is the
  * TRAINED character-bigram Naive Bayes through the stored-weight
  * seam (`llm_langid_train` / `llm_langid_score` in [[LlmQueries]]:
  * counts artifact → broadcast → exact integer floor-log2 scoring,
  * oracle-replayed end to end); use this object only where no
  * trained counts exist for the corpus at hand.
  *
  * Deterministic by construction: ties break lexicographically on the
  * language code, so results are stable across runs and engines. Runs
  * partition-local via [[tagLanguages]] (one profile table per
  * executor, zero shuffle).
  *
  * Note: the driver's synthetic `documents.lang` column is not
  * correlated with its text (all languages share one vocabulary), so
  * the trained lane scores a CONSTRUCTED labeled fixture whose text
  * genuinely correlates with its label; this heuristic is unit-tested
  * on real sentences.
  */
object LangId {

  /** Function-word profiles (top stopwords per language). */
  private[llm] val stopwordProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "and", "of", "to", "in", "is", "that", "it",
      "was", "for", "with", "are", "this", "not"),
    "nl" -> Set("de", "het", "een", "en", "van", "ik", "dat", "die",
      "niet", "op", "zijn", "met", "voor", "je"),
    "de" -> Set("der", "die", "das", "und", "ich", "nicht", "ist",
      "du", "sie", "wir", "ein", "eine", "mit", "zu"),
    "fr" -> Set("le", "la", "les", "et", "un", "une", "est", "que",
      "pas", "pour", "dans", "vous", "je", "ne"),
    "es" -> Set("el", "los", "que", "y", "un", "una", "es", "no",
      "por", "con", "para", "las", "se", "su"))

  /** Distinctive character trigrams, used when stopwords give no
    * signal (short strings, no function words). */
  private[llm] val trigramProfiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "ing", "ion", "ent", "tio"),
    "nl" -> Set("aar", "oor", "ijk", "sch", "een"),
    "de" -> Set("sch", "ich", "ein", "und", "che"),
    "fr" -> Set("ait", "eur", "oux", "eau", "ons"),
    "es" -> Set("ión", "ado", "nte", "los", "ent"))

  val Unknown = "und" // BCP-47 "undetermined"

  def detect(text: String): String = {
    if (text == null || text.isEmpty) return Unknown
    val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val byStopwords = scoreBy(words.toSeq, stopwordProfiles)
    if (byStopwords.nonEmpty) return byStopwords.get
    val padded = " " + words.mkString(" ") + " "
    val trigrams = padded.sliding(3).toSeq
    scoreBy(trigrams, trigramProfiles).getOrElse(Unknown)
  }

  private def scoreBy(tokens: Seq[String],
      profiles: Map[String, Set[String]]): Option[String] = {
    val scores = profiles.view.mapValues(p => tokens.count(p)).toMap
    val top = scores.values.max
    if (top == 0) None
    else Some(scores.filter(_._2 == top).keys.min) // det. tie-break
  }

  /** Tag a documents DataFrame (column `text`) with a detected
    * language — partition-local, no shuffle. */
  def tagLanguages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(
      docs.schema.fields :+ org.apache.spark.sql.types.StructField(
        "detected_lang", org.apache.spark.sql.types.StringType))
    val textIdx = docs.schema.fieldIndex("text")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    docs.mapPartitions { it =>
      it.map { r =>
        org.apache.spark.sql.Row.fromSeq(
          r.toSeq :+ detect(r.getString(textIdx)))
      }
    }(enc)
  }
}
