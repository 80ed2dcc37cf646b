package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, n-gram language ID, and document fingerprinting —
  * the LLM-training-pipeline surface (BASELINE.json north_star). All
  * per-row array expressions (no shuffle): at 100 TB these run embedded
  * in the scan stage under whole-stage codegen.
  *
  * Every computation is mirrored token-for-token in the DuckDB oracle
  * (split on single space, same hash formula, same tie-breaks).
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Fixed stopword list for quality scoring (shared with oracle SQL). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "in", "is")

  /** Per-language signature token sets for the n-gram language-ID
    * heuristic. Deterministic argmax, ties broken by this fixed order.
    */
  val langSignatures: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "de" -> Seq("data", "table", "row"),
    "es" -> Seq("query", "scan", "filter"),
    "fr" -> Seq("join", "merge", "group"),
    "zh" -> Seq("spark", "stream", "batch"))

  private def tokens(c: Column): Column = split(c, " ")

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t))).cast(LongType)

  private def sqlCountIn(toksSql: String, words: Seq[String]): String =
    s"CAST(len(list_filter($toksSql, t -> list_contains([${words.map(w => s"'$w'").mkString(",")}], t))) AS BIGINT)"

  val queries: Seq[Q] = Seq(

    // ── token / char statistics ─────────────────────────────────────
    Q("text_stats",
      """SELECT doc_id, lang,
        |  CAST(length(text) AS BIGINT) AS chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace
        |FROM documents""".stripMargin) { (s, dir) =>
      docs(s, dir).select(
        col("doc_id"), col("lang"),
        length(col("text")).cast(LongType).as("chars"),
        size(tokens(col("text"))).cast(LongType).as("n_tokens"),
        size(array_distinct(tokens(col("text")))).cast(LongType).as("n_uniq"),
        length(regexp_replace(col("text"), " ", "")).cast(LongType).as("n_nonspace"))
    },

    // ── quality scoring: stopword ratio / alpha ratio / token length ─
    Q("text_quality", {
      val toks = "string_split(text, ' ')"
      s"""SELECT doc_id,
         |  CAST(len($toks) AS BIGINT) AS n_tokens,
         |  CAST(${sqlCountIn(toks, stopwords)} AS DOUBLE) / len($toks) AS stop_ratio,
         |  CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
         |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len($toks) AS avg_token_len,
         |  0.5 * (CAST(${sqlCountIn(toks, stopwords)} AS DOUBLE) / len($toks))
         |    + 0.5 * (CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text)) AS quality
         |FROM documents""".stripMargin
    }) { (s, dir) =>
      val toks = tokens(col("text"))
      val nTok = size(toks).cast(LongType)
      val stopRatio = countIn(toks, stopwords).cast(DoubleType) / nTok
      val alphaRatio =
        length(regexp_replace(col("text"), "[^a-z]", "")).cast(DoubleType) / length(col("text"))
      docs(s, dir).select(
        col("doc_id"),
        nTok.as("n_tokens"),
        stopRatio.as("stop_ratio"),
        alphaRatio.as("alpha_ratio"),
        (length(regexp_replace(col("text"), " ", "")).cast(DoubleType) / nTok).as("avg_token_len"),
        (lit(0.5) * stopRatio + lit(0.5) * alphaRatio).as("quality"))
    },

    // ── language ID: signature-set scoring, deterministic argmax ────
    Q("text_langid", {
      val toks = "string_split(text, ' ')"
      val scores = langSignatures.map { case (l, ws) => l -> sqlCountIn(toks, ws) }
      val caseChain = scores.zipWithIndex.map { case ((l, sc), i) =>
        val laterGte = scores.drop(i + 1).map { case (_, sc2) => s"$sc >= $sc2" }
        if (laterGte.isEmpty) s"ELSE '$l'"
        else s"WHEN ${laterGte.mkString(" AND ")} THEN '$l'"
      }.mkString("CASE ", " ", " END")
      s"""SELECT doc_id, lang, $caseChain AS pred_lang,
         |  (($caseChain) = lang) AS hit
         |FROM documents""".stripMargin
    }) { (s, dir) =>
      val toks = tokens(col("text"))
      val scores = langSignatures.map { case (l, ws) => l -> countIn(toks, ws) }
      val pred = scores.zipWithIndex.foldRight(lit(scores.last._1)) {
        case (((l, sc), i), acc) =>
          val later = scores.drop(i + 1)
          if (later.isEmpty) acc
          else when(later.map { case (_, sc2) => sc >= sc2 }.reduce(_ && _), lit(l)).otherwise(acc)
      }
      docs(s, dir).select(col("doc_id"), col("lang"),
        pred.as("pred_lang"), (pred === col("lang")).as("hit"))
    },

    // ── BPE-ish subword token counting ──────────────────────────────
    // A byte-pair-style pre-tokenizer regex (letter runs | digit runs |
    // single punctuation — the character-class core of GPT-2's pattern,
    // kept to constructs whose leftmost-longest semantics are identical
    // in Java regex and RE2) counts the units a subword tokenizer would
    // split further. Whitespace-token counts sit in text_stats; the two
    // together give the token-budget estimate a training pipeline needs.
    Q("text_tokens_bpe", {
      val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_bpe,
         |  CAST(len(list_filter(regexp_extract_all(text, '$pat'),
         |        t -> regexp_matches(t, '^[A-Za-z]+$$'))) AS BIGINT) AS n_word,
         |  CAST(len(list_filter(regexp_extract_all(text, '$pat'),
         |        t -> regexp_matches(t, '^[0-9]+$$'))) AS BIGINT) AS n_num,
         |  CAST(list_sum(list_transform(regexp_extract_all(text, '$pat'),
         |        t -> length(t))) AS BIGINT) AS n_chars_tokenized
         |FROM documents""".stripMargin
    }) { (s, dir) =>
      val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"
      val toks = regexp_extract_all(col("text"), lit(pat), lit(0))
      docs(s, dir).select(
        col("doc_id"),
        size(toks).cast(LongType).as("n_bpe"),
        size(filter(toks, t => t.rlike("^[A-Za-z]+$"))).cast(LongType).as("n_word"),
        size(filter(toks, t => t.rlike("^[0-9]+$"))).cast(LongType).as("n_num"),
        aggregate(transform(toks, t => length(t).cast(LongType)),
          lit(0L), (acc, x) => acc + x).as("n_chars_tokenized"))
    },

    // ── edit-distance similarity on planted near-duplicate pairs ────
    // Levenshtein is exact integer arithmetic in both engines; pairs
    // are each 10th doc vs its 4/5-token truncation (the same planted
    // near-dups the LSH dedup families hunt), so the distances also
    // characterize what "near-duplicate" means in this corpus.
    Q("text_editdist",
      """SELECT doc_id,
        |  CAST(levenshtein(text, ttext) AS BIGINT) AS edit_dist,
        |  CAST(length(text) AS BIGINT) AS len_orig,
        |  CAST(length(ttext) AS BIGINT) AS len_trunc
        |FROM (
        |  SELECT doc_id, text,
        |    array_to_string(list_slice(string_split(text, ' '), 1,
        |      greatest(1, CAST(floor(len(string_split(text, ' ')) * 4 / 5.0) AS INTEGER))), ' ') AS ttext
        |  FROM documents WHERE doc_id % 10 = 0) t""".stripMargin) { (s, dir) =>
      val toks = split(col("text"), " ")
      val keep = greatest(lit(1),
        floor(size(toks) * 4 / lit(5.0)).cast("int"))
      val trunc = array_join(slice(toks, lit(1), keep), " ")
      docs(s, dir).filter(col("doc_id") % 10 === 0).select(
        col("doc_id"),
        levenshtein(col("text"), trunc).cast(LongType).as("edit_dist"),
        length(col("text")).cast(LongType).as("len_orig"),
        length(trunc).cast(LongType).as("len_trunc"))
    },

    // ── deterministic train/val/test split ──────────────────────────
    // The reproducible-sampling operator every training pipeline needs:
    // the split is a pure function of the document id's hash (no RNG,
    // no engine-specific TABLESAMPLE), so any engine — and any re-run —
    // assigns every document to the same 80/10/10 bucket.
    Q("q_split_train", {
      val u = graft.OracleSql.unitHash("CAST(doc_id AS VARCHAR)")
      s"""SELECT split, lang, count(*) AS n FROM (
         |  SELECT lang,
         |    CASE WHEN $u < 0.8 THEN 'train'
         |         WHEN $u < 0.9 THEN 'val' ELSE 'test' END AS split
         |  FROM documents) t
         |GROUP BY split, lang""".stripMargin
    }) { (s, dir) =>
      val u = graft.Cols.unitHash(col("doc_id").cast("string"))
      docs(s, dir).select(col("lang"),
        when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").as("split"))
        .groupBy("split", "lang").agg(count(lit(1)).as("n"))
    },

    // ── corpus-statistics term weighting (IDF-shaped two-pass) ──────
    // Per-doc top-3 terms by rarity-weighted frequency: tf * 1e6 / df,
    // the log-free integer-exact surrogate of tf-idf (ln() can differ
    // in the last ulp between libm implementations, so the weight stays
    // rational). The SHAPE is the point at scale: one explode + two
    // hash aggregations + one token-keyed join + a per-doc top-k — the
    // classic corpus-statistics pipeline (rare-term extraction,
    // vocabulary pruning) with no driver-side state.
    Q("q_term_weights",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
        |df AS (SELECT token, count(*) AS df FROM (SELECT DISTINCT doc_id, token FROM tok) t GROUP BY token),
        |j AS (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |         CAST(tf.tf * 1000000 AS DOUBLE) / df.df AS weight
        |  FROM tf JOIN df ON tf.token = df.token)
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, token, tf, df, weight FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |                               ORDER BY weight DESC, token) AS rk
        |  FROM j) t
        |WHERE rk <= 3""".stripMargin) { (s, dir) =>
      val tok = docs(s, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf")).persist()
      // df derived from tf (exactly one row per (doc, token) there):
      // one explode and one fewer shuffle than re-aggregating tok
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val j = tf.join(df, "token")
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          ((col("tf") * 1000000L).cast(DoubleType) / col("df")).as("weight"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("weight").desc, col("token"))
      j.withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .select("doc_id", "rk", "token", "tf", "df", "weight")
    },

    // ── fingerprinting: content md5 + position-weighted rolling hash ─
    Q("text_fingerprint", {
      val toks = "string_split(text, ' ')"
      s"""SELECT doc_id,
         |  md5(text) AS fp_md5,
         |  CAST(list_sum(list_transform($toks,
         |         (t, i) -> ((('0x' || substr(md5(t), 1, 15))::BIGINT % 1000003) * i)))
         |       % 2147483648 AS BIGINT) AS fp_roll
         |FROM documents""".stripMargin
    }) { (s, dir) =>
      // Same formula: token hash h = hex60(t) % 1000003, weighted by its
      // 1-based position, summed, mod 2^31. Spark's transform index is
      // 0-based, hence i+1.
      val weighted = transform(tokens(col("text")), (t, i) =>
        (graft.Cols.hex60(t) % lit(1000003L)) * (i.cast(LongType) + lit(1L)))
      docs(s, dir).select(
        col("doc_id"),
        md5(col("text")).as("fp_md5"),
        (aggregate(weighted, lit(0L), (acc, x) => acc + x) % lit(2147483648L))
          .cast(LongType).as("fp_roll"))
    },
  )
}
