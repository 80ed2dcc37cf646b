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

  /** THE document quality score — 0.5*stop_ratio + 0.5*alpha_ratio.
    * Single definition (with its SQL twin below) shared by
    * `text_quality` and `corpus_curate`, so the curation filter can
    * never drift from the published score.
    */
  private def qualityCol(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast(LongType)
    lit(0.5) * (countIn(toks, stopwords).cast(DoubleType) / nTok) +
      lit(0.5) * (length(regexp_replace(text, "[^a-z]", ""))
        .cast(DoubleType) / length(text))
  }

  private val qualitySql: String = {
    val toks = "string_split(text, ' ')"
    s"""(0.5 * (CAST(${sqlCountIn(toks, stopwords)} AS DOUBLE) / len($toks))
       | + 0.5 * (CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / length(text)))""".stripMargin
  }

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
         |  $qualitySql AS quality
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
        qualityCol(col("text")).as("quality"))
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
         |  CAST(COALESCE(list_sum(list_transform(regexp_extract_all(text, '$pat'),
         |        t -> length(t))), 0) AS BIGINT) AS n_chars_tokenized
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
      s"""SELECT doc_id,
         |  CAST(levenshtein(text, ttext) AS BIGINT) AS edit_dist,
         |  CAST(length(text) AS BIGINT) AS len_orig,
         |  CAST(length(ttext) AS BIGINT) AS len_trunc
         |FROM (
         |  SELECT doc_id, text,
         |    ${DedupOps.truncatedTextSql} AS ttext
         |  FROM documents WHERE doc_id % 10 = 0) t""".stripMargin) { (s, dir) =>
      // DedupOps.truncatedText: the SAME planted-near-dup transform the
      // LSH dedup families hunt — this query characterizes its distances
      val trunc = DedupOps.truncatedText(col("text"))
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

    // ── PII redaction ───────────────────────────────────────────────
    // The scrubbing pass every training corpus needs before the
    // tokenizer sees it. The fixture text has no natural PII, so every
    // 5th doc is augmented with a deterministic email + phone (same
    // synthesis in the oracle), then ALL docs go through the redactor.
    // Patterns stay inside the regex subset whose leftmost-longest
    // semantics are identical in Java regex and RE2: character classes
    // and bounded/unbounded counts, no backrefs or lookaround. Per-row
    // expression in the scan stage — no shuffle at any scale.
    Q("text_pii_redact", {
      val email = "[a-z0-9._]+@[a-z0-9.]+"
      val phone = "[0-9]{3}-[0-9]{4}"
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(aug, '$email', '<EMAIL>', 'g'),
         |                 '$phone', '<PHONE>', 'g') AS clean,
         |  CAST(len(regexp_extract_all(aug, '$email')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(aug, '$phone')) AS BIGINT) AS n_phone
         |FROM (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0
         |      THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
         |           || '@mail.example.com or call 555-'
         |           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |      ELSE text END AS aug
         |  FROM documents) t""".stripMargin
    }) { (s, dir) =>
      val email = "[a-z0-9._]+@[a-z0-9.]+"
      val phone = "[0-9]{3}-[0-9]{4}"
      val aug = when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text"))
      docs(s, dir).select(col("doc_id"), aug.as("aug")).select(
        col("doc_id"),
        regexp_replace(regexp_replace(col("aug"), email, "<EMAIL>"),
          phone, "<PHONE>").as("clean"),
        size(regexp_extract_all(col("aug"), lit(email), lit(0)))
          .cast(LongType).as("n_email"),
        size(regexp_extract_all(col("aug"), lit(phone), lit(0)))
          .cast(LongType).as("n_phone"))
    },

    // ── stratified (rebalancing) sampling ───────────────────────────
    // Per-stratum rates — downsample the dominant language, keep the
    // rest — as a pure function of the doc id's hash: no RNG, no
    // engine-specific TABLESAMPLE, identical membership on any engine
    // or re-run. Scan-stage filter; at scale this never shuffles.
    Q("q_sample_stratified", {
      val u = graft.OracleSql.unitHash("'smp|' || CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang, $u AS u,
         |    CASE lang WHEN 'en' THEN 0.05 ELSE 0.2 END AS rate
         |  FROM documents) t
         |WHERE u < rate""".stripMargin
    }) { (s, dir) =>
      val u = graft.Cols.unitHash(concat(lit("smp|"), col("doc_id").cast("string")))
      val rate = when(col("lang") === "en", lit(0.05)).otherwise(lit(0.2))
      docs(s, dir).filter(u < rate).select("doc_id", "lang")
    },

    // ── vocabulary build with cumulative coverage ───────────────────
    // Top-20 tokens by frequency plus the cumulative share of the
    // corpus they cover — the vocabulary-pruning / OOV-budget operator.
    // Scale shape: explode + one hash agg to vocab-sized counts, then
    // TakeOrdered(20) — the 20-row window runs on the head only, and
    // its running sum equals the global one because the top-20 are a
    // prefix of the global (n DESC, token) order.
    Q("text_vocab",
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
        |r AS (
        |  SELECT token, n,
        |    row_number() OVER (ORDER BY n DESC, token) AS rk,
        |    sum(n) OVER (ORDER BY n DESC, token ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(n) OVER () AS total
        |  FROM cnt)
        |SELECT CAST(rk AS BIGINT) AS rk, token, n,
        |       CAST(cum AS DOUBLE) / total AS coverage
        |FROM r WHERE rk <= 20""".stripMargin) { (s, dir) =>
      val cnt = docs(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .persist()
      val total = cnt.agg(sum("n").as("total"))
      val top = cnt.orderBy(col("n").desc, col("token")).limit(20)
      val ord = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("token"))
      top.crossJoin(broadcast(total))
        .withColumn("rk", row_number().over(ord).cast(LongType))
        .withColumn("coverage",
          sum("n").over(ord.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow))
            .cast(DoubleType) / col("total"))
        .select("rk", "token", "n", "coverage")
    },

    // ── bigram association (PMI-shaped collocation mining) ──────────
    // score = P(a,b) / (P(a)P(b)) in the log-free rational form
    // (n_ab * N) / (n_a * n_b): each count cast to double FIRST (an
    // int64 product n_ab*N overflows at ~1e13-bigram corpora; the
    // double product is one correctly-rounded IEEE multiply, identical
    // in both engines), one division — where ln() would drift in the
    // last ulp between libm implementations. Scale shape:
    // explode to bigrams, two vocab-sized hash aggs, two hash joins on
    // the token key — no window over the corpus, no driver state.
    Q("text_ngram_pmi",
      """WITH tok AS (
        |  SELECT string_split(text, ' ') AS tokens FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |idx AS (SELECT tokens, unnest(range(1, len(tokens))) AS i FROM tok),
        |bg AS (SELECT tokens[i] AS w1, tokens[i+1] AS w2 FROM idx),
        |bc AS (SELECT w1, w2, count(*) AS n_ab,
        |              sum(count(*)) OVER () AS n_tot
        |       FROM bg GROUP BY w1, w2),
        |uc AS (SELECT unnest(tokens) AS token FROM tok),
        |un AS (SELECT token, count(*) AS n FROM uc GROUP BY token)
        |SELECT w1, w2, n_ab,
        |       a.n AS n_a, b.n AS n_b,
        |       (CAST(n_ab AS DOUBLE) * CAST(n_tot AS DOUBLE))
        |         / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)) AS score
        |FROM bc JOIN un a ON bc.w1 = a.token JOIN un b ON bc.w2 = b.token
        |WHERE n_ab >= 5""".stripMargin) { (s, dir) =>
      val toks = tokens(col("text"))
      val tok = docs(s, dir).filter(size(toks) >= 2)
        .select(toks.as("tokens")).persist()
      val bg = tok.select(explode(transform(
        sequence(lit(1), size(col("tokens")) - 1), i =>
          struct(element_at(col("tokens"), i).as("w1"),
            element_at(col("tokens"), i + 1).as("w2")))).as("p"))
        .select(col("p.w1"), col("p.w2"))
      // n_tot via a 1-row agg + broadcast, NOT a global window: the
      // bigram-count relation is vocab^2-sized and a partitionless
      // window would collapse it onto one task at scale
      val cnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab")).persist()
      val bc = cnt.crossJoin(broadcast(cnt.agg(sum("n_ab").as("n_tot"))))
      val un = tok.select(explode(col("tokens")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
      bc.join(un.select(col("token").as("w1"), col("n").as("n_a")), "w1")
        .join(un.select(col("token").as("w2"), col("n").as("n_b")), "w2")
        .filter(col("n_ab") >= 5)
        .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
          ((col("n_ab").cast(DoubleType) * col("n_tot").cast(DoubleType)) /
            (col("n_a").cast(DoubleType) * col("n_b").cast(DoubleType))).as("score"))
    },

    // ── end-to-end corpus curation (the flagship LLM-data pipeline) ─
    // quality-filter -> exact-dedup (keep min doc_id per digest) ->
    // deterministic split assignment, in ONE pass shape: per-row
    // expressions in the scan stage, a single hash shuffle on the
    // content digest, and a hash-free split function — the whole
    // curation pipeline costs one shuffle at any corpus size. Corpus:
    // documents + exact copies of every 7th doc (same augmentation as
    // dedup_exact), so the dedup stage provably drops rows.
    Q("corpus_curate", {
      val toks = "string_split(text, ' ')"
      val u = graft.OracleSql.unitHash("CAST(doc_id AS VARCHAR)")
      s"""WITH aug AS (
         |  ${DedupOps.dupAugSql(Seq("lang", "text"))}),
         |q AS (
         |  SELECT doc_id, lang, text,
         |    CAST(len($toks) AS BIGINT) AS n_tokens,
         |    $qualitySql AS quality
         |  FROM aug),
         |d AS (
         |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM q WHERE quality >= 0.44)
         |SELECT doc_id, lang, n_tokens, quality,
         |  CASE WHEN $u < 0.8 THEN 'train'
         |       WHEN $u < 0.9 THEN 'val' ELSE 'test' END AS split
         |FROM d WHERE rn = 1""".stripMargin
    }) { (s, dir) =>
      val aug = DedupOps.dupAug(s, dir, Seq("lang", "text"))
      val nTok = size(tokens(col("text"))).cast(LongType)
      val u = graft.Cols.unitHash(col("doc_id").cast("string"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      aug.select(col("doc_id"), col("lang"), col("text"),
        nTok.as("n_tokens"), qualityCol(col("text")).as("quality"))
        .filter(col("quality") >= 0.44)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("quality"),
          when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").as("split"))
    },

    // ── near-dup curation: the composed production dedup pipeline ───
    // MinHash pairs -> connected components -> keep ONLY each group's
    // canonical (min-id) member -> quality filter -> split assignment,
    // over the near-dup-augmented corpus. Every stage reuses the
    // factored machinery (minhashPairs*, connectedComponents,
    // qualityCol, unitHash) — the point is that the library composes:
    // a real curation run is exactly this chain at 100 TB, where each
    // stage is the bucketed/one-shuffle shape proven by its own query.
    Q("curate_neardup", {
      val u = graft.OracleSql.unitHash("CAST(doc_id AS VARCHAR)")
      s"""WITH pairs AS (${DedupOps.minhashPairsSql}),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
         |comp AS (WITH ${DedupOps.componentsSql("edges")}),
         |corpus AS (${DedupOps.docsAugSql})
         |SELECT doc_id, n_tokens, quality,
         |  CASE WHEN $u < 0.8 THEN 'train'
         |       WHEN $u < 0.9 THEN 'val' ELSE 'test' END AS split
         |FROM (
         |  SELECT c.doc_id AS doc_id, text,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    $qualitySql AS quality
         |  FROM corpus c LEFT JOIN comp k ON c.doc_id = k.doc_id
         |  WHERE k.doc_id IS NULL OR k.component = c.doc_id) t
         |WHERE quality >= 0.44""".stripMargin
    }) { (s, dir) =>
      val comp = DedupOps.connectedComponents(
        DedupOps.minhashPairsDf(s, dir)
          .select(col("doc_a").as("a"), col("doc_b").as("b")))
        .withColumnRenamed("doc_id", "cid")
      val u = graft.Cols.unitHash(col("doc_id").cast("string"))
      DedupOps.docsAug(s, dir)
        .join(comp, col("doc_id") === col("cid"), "left")
        .filter(col("cid").isNull || col("component") === col("doc_id"))
        .select(col("doc_id"),
          size(tokens(col("text"))).cast(LongType).as("n_tokens"),
          qualityCol(col("text")).as("quality"))
        .filter(col("quality") >= 0.44)
        .withColumn("split",
          when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test"))
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
