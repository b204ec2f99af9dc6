package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.RelationalQueries.Q
import graft.tables.Tables

/** LLM-training-data pipeline operators over the `documents` table:
  * text statistics, language ID, quality scoring, fingerprinting, exact
  * dedup, MinHash+LSH and n-gram-Jaccard near-dedup, SimHash.
  *
  * Scale design notes (100 TB):
  *  - all per-document features are pure expression work (higher-order
  *    array functions inside whole-stage codegen) — zero shuffles;
  *  - near-dup candidate generation uses LSH band buckets / SimHash
  *    bands, i.e. an equi-join shuffle on the band key, never an O(n²)
  *    cross join; true similarity is verified only on candidates;
  *  - the cross-engine-deterministic hash primitive is md5 (available
  *    in both Spark and DuckDB): int form = first 8–15 hex digits.
  */
object TextQueries {

  /** Whitespace tokens. */
  private def toks(c: Column): Column = split(c, " ")

  /** md5-derived 32-bit int of a string column (cross-engine stable). */
  private def md5Int(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)

  /** Distinct 3-word shingles of a text column (empty when <3 tokens). */
  private def shingles(c: Column): Column = {
    val t = toks(c)
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(0), size(t) - 3), i =>
        concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2),
          element_at(t, i + 3)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** DuckDB equivalent of [[shingles]] as a SQL expression over `toks`. */
  private val duckShingles =
    """list_distinct(CASE WHEN len(toks) >= 3
       THEN list_transform(range(1, len(toks)-1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       ELSE [] END)"""

  // =====================================================================
  // Text analysis
  // =====================================================================

  val q25TokenStats = Q("q25_token_stats",
    (s, d) => {
      val t = toks(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        size(t).as("n_tokens"),
        length(col("text")).as("n_chars_calc"),
        (length(regexp_replace(col("text"), " ", "")) / size(t)).as("avg_token_len"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .as("n_subtokens"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
        FROM documents)
      SELECT doc_id, len(toks) AS n_tokens, length(text) AS n_chars_calc,
        length(replace(text, ' ', '')) / len(toks) AS avg_token_len,
        len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subtokens
      FROM t ORDER BY doc_id"""))

  private val langWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  val q26LangId = Q("q26_lang_id",
    // n-gram/stopword-overlap language ID heuristic; fixed priority
    // en > es > fr > de on score ties. Pure expression — no shuffle.
    (s, d) => {
      val t = toks(col("text"))
      val score: Map[String, Column] = langWords.map { case (lang, ws) =>
        lang -> size(filter(t, x => x.isin(ws: _*)))
      }.toMap
      val predicted =
        when(score("en") >= score("es") && score("en") >= score("fr") &&
          score("en") >= score("de"), "en")
          .when(score("es") >= score("fr") && score("es") >= score("de"), "es")
          .when(score("fr") >= score("de"), "fr")
          .otherwise("de")
      Tables.documents(s, d).select(
        col("doc_id"),
        score("en").as("score_en"), score("es").as("score_es"),
        score("fr").as("score_fr"), score("de").as("score_de"),
        predicted.as("lang_pred"),
        (predicted === col("lang")).as("is_match"))
        .orderBy(col("doc_id"))
    },
    Some {
      def sc(ws: Seq[String]) =
        s"len(list_filter(toks, x -> x IN (${ws.map("'" + _ + "'").mkString(",")})))"
      val m = langWords.toMap
      s"""WITH t AS (SELECT doc_id, lang, string_split(text,' ') AS toks FROM documents),
        sco AS (SELECT doc_id, lang, ${sc(m("en"))} AS score_en, ${sc(m("es"))} AS score_es,
          ${sc(m("fr"))} AS score_fr, ${sc(m("de"))} AS score_de FROM t)
      SELECT doc_id, score_en, score_es, score_fr, score_de,
        CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_de THEN 'en'
             WHEN score_es >= score_fr AND score_es >= score_de THEN 'es'
             WHEN score_fr >= score_de THEN 'fr' ELSE 'de' END AS lang_pred,
        (CASE WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_de THEN 'en'
             WHEN score_es >= score_fr AND score_es >= score_de THEN 'es'
             WHEN score_fr >= score_de THEN 'fr' ELSE 'de' END) = lang AS is_match
      FROM sco ORDER BY doc_id"""
    })

  val q27QualityScore = Q("q27_quality_score",
    // length/stopword/token-shape quality heuristic; rational arithmetic
    // only (no transcendentals — exp/log implementations diverge across
    // engines and would break bit-exact oracle comparison)
    (s, d) => {
      val t = toks(col("text"))
      val nTok = size(t)
      val stop = size(filter(t, x => x.isin("the", "a", "of", "and", "is", "or", "in")))
      val avgLen = length(regexp_replace(col("text"), " ", "")) / nTok
      val score = round((stop / nTok * 2.0 + avgLen * 0.1) /
        (lit(1.0) + length(col("text")) * 0.001), 6)
      Tables.documents(s, d).select(
        col("doc_id"), nTok.as("n_tokens"),
        round(stop / nTok, 6).as("stopword_ratio"),
        round(avgLen, 6).as("avg_token_len"),
        score.as("quality_score"),
        (score > 0.02).as("quality_ok"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id, text, string_split(text,' ') AS toks FROM documents),
        f AS (SELECT doc_id,
          len(toks) AS n_tokens,
          len(list_filter(toks, x -> x IN ('the','a','of','and','is','or','in'))) AS stop,
          length(replace(text,' ','')) / len(toks) AS avg_len,
          length(text) AS n_chars FROM t)
      SELECT doc_id, n_tokens,
        round(stop / n_tokens, 6) AS stopword_ratio,
        round(avg_len, 6) AS avg_token_len,
        round((stop / n_tokens * 2.0 + avg_len * 0.1) / (1.0 + n_chars * 0.001), 6)
          AS quality_score,
        round((stop / n_tokens * 2.0 + avg_len * 0.1) / (1.0 + n_chars * 0.001), 6) > 0.02
          AS quality_ok
      FROM f ORDER BY doc_id"""))

  val q28Fingerprint = Q("q28_fingerprint",
    // document fingerprinting: md5 content hash + token-level rolling
    // hash (order-sensitive polynomial fold, mod 1e9+7)
    (s, d) => {
      val t = toks(col("text"))
      val tokHashes = transform(t, x => md5Int(x) % 1000000007L)
      val rolling = aggregate(tokHashes, lit(0L),
        (acc, h) => (acc * 31L + h) % 1000000007L)
      Tables.documents(s, d).select(
        col("doc_id"),
        substring(md5(col("text")), 1, 16).as("fp_hex"),
        conv(substring(md5(col("text")), 1, 15), 16, 10).cast(LongType).as("fp_int"),
        rolling.as("rolling_hash"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
        substr(md5(text), 1, 16) AS fp_hex,
        CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS fp_int,
        list_reduce(
          list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(text,' '),
              x -> CAST('0x' || substr(md5(x),1,8) AS BIGINT) % 1000000007)),
          (acc, h) -> (acc * 31 + h) % 1000000007) AS rolling_hash
      FROM documents ORDER BY doc_id"""))

  // =====================================================================
  // Deduplication
  // =====================================================================

  val q29DedupExact = Q("q29_dedup_exact",
    // exact dedup by content hash: input = documents ∪ shifted copy
    // (planted duplicates), hash-groupBy keeps min doc_id per content
    (s, d) => {
      val docs = Tables.documents(s, d)
      val dup = docs.withColumn("doc_id", col("doc_id") + 1000000L)
      docs.unionByName(dup)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .orderBy(col("keeper_id"))
    },
    Some("""WITH u AS (SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000, text FROM documents)
      SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
        count(*) AS n_copies
      FROM u GROUP BY md5(text) ORDER BY keeper_id"""))

  val q30MinhashLsh = Q("q30_minhash_lsh",
    // MinHash (12 permutations via seeded md5, min as string order) +
    // LSH (4 bands × 3 rows); candidates = same band signature;
    // true Jaccard verified on candidates only. Shuffles: one on the
    // band key (candidate join) + one re-join to shingle sets — never n².
    (s, d) => {
      // persisted: re-joined twice for the Jaccard verify and feeds the
      // minhash computation — one shingle build instead of three
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
        .persist()
      val mh = (0 until 12).map { i =>
        array_min(transform(col("sh"), x =>
          md5(concat(lit(s"$i:"), x)))).as(s"m$i")
      }
      val withMh = docs.select(col("doc_id") +: col("sh") +: mh: _*)
      val bands = (0 until 4).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|", col(s"m${3 * b}"), col(s"m${3 * b + 1}"),
            col(s"m${3 * b + 2}"))).as("sig"))
      }
      // persisted: self-joined a×b — otherwise all 12 minhash passes
      // (every md5 of every shingle) execute once per join side
      val exploded = withMh
        .select(col("doc_id"), explode(array(bands: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
        .persist()
      val cand = exploded.as("a").join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct()
      val j = cand
        .join(docs.select(col("doc_id").as("da"), col("sh").as("sha")), Seq("da"))
        .join(docs.select(col("doc_id").as("db"), col("sh").as("shb")), Seq("db"))
        .select(col("da"), col("db"),
          round(size(array_intersect(col("sha"), col("shb"))) /
            size(array_union(col("sha"), col("shb"))), 6).as("jaccard"))
      j.filter(col("jaccard") >= 0.5).orderBy(col("da"), col("db"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        sh AS (SELECT doc_id, $duckShingles AS shingles FROM t),
        sh2 AS (SELECT doc_id, shingles FROM sh WHERE len(shingles) > 0),
        inst AS (SELECT doc_id, unnest(shingles) AS s FROM sh2),
        mh AS (SELECT doc_id, r.i AS i, min(md5(CAST(r.i AS VARCHAR) || ':' || s)) AS m
               FROM inst, range(0, 12) r(i) GROUP BY doc_id, r.i),
        bands AS (SELECT doc_id, i // 3 AS band,
                  md5(string_agg(m, '|' ORDER BY i)) AS sig
                  FROM mh GROUP BY doc_id, i // 3),
        cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
                 FROM bands a JOIN bands b
                 ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
      SELECT da, db,
        round(len(list_intersect(x.shingles, y.shingles)) /
              len(list_distinct(x.shingles || y.shingles)), 6) AS jaccard
      FROM cand JOIN sh2 x ON x.doc_id = da JOIN sh2 y ON y.doc_id = db
      WHERE round(len(list_intersect(x.shingles, y.shingles)) /
              len(list_distinct(x.shingles || y.shingles)), 6) >= 0.5
      ORDER BY da, db"""))

  val q31NgramJaccard = Q("q31_ngram_jaccard",
    // exhaustive n-gram Jaccard via inverted shingle index (equi-join on
    // shingle, not cross join): pairs sharing ≥1 shingle, true Jaccard
    (s, d) => {
      // persisted: feeds sizes (joined twice) and the inverted index
      val sh = Tables.documents(s, d)
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
        .persist()
      val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
      // persisted: self-joined a×b for the intersection counts
      val inst = sh.select(col("doc_id"), explode(col("sh")).as("s")).persist()
      val inter = inst.as("a").join(inst.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
        .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
        .select(col("da"), col("db"),
          round(col("inter") / (col("na") + col("nb") - col("inter")), 6)
            .as("jaccard"))
        .filter(col("jaccard") >= 0.6)
        .orderBy(col("da"), col("db"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
        sh AS (SELECT doc_id, $duckShingles AS shingles FROM t),
        sh2 AS (SELECT doc_id, shingles FROM sh WHERE len(shingles) > 0),
        sz AS (SELECT doc_id, len(shingles) AS n FROM sh2),
        inst AS (SELECT doc_id, unnest(shingles) AS s FROM sh2),
        p AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
              FROM inst a JOIN inst b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
      SELECT da, db, round(inter / (x.n + y.n - inter), 6) AS jaccard
      FROM p JOIN sz x ON x.doc_id = da JOIN sz y ON y.doc_id = db
      WHERE round(inter / (x.n + y.n - inter), 6) >= 0.6
      ORDER BY da, db"""))

  val q32Simhash = Q("q32_simhash",
    // 32-bit SimHash over distinct tokens; near-dup pairs = banded
    // candidates (4 bands × 8 bits — exact for hamming ≤ 3 by
    // pigeonhole) with hamming distance ≤ 3
    (s, d) => {
      // features = 3-gram shingles, not tokens: the synthetic corpus has
      // a tiny vocabulary, so token-set fingerprints would collide for
      // nearly every pair and the candidate join would degenerate to n²
      val dt = shingles(col("text"))
      val pow2 = typedLit((0 until 32).map(p => 1L << p))
      // Single pass over the hashed shingles: fold each hash into a
      // 32-wide bit-count vector via zip_with, so the md5 transform
      // appears exactly ONCE in the expression tree. (The naive
      // per-bit-position fold referenced `hashed` 32× and Catalyst's
      // CollapseProject inlined the md5 work 32× — 90 s at sf0.001.)
      val counts = aggregate(
        transform(dt, t => md5Int(t)),
        array_repeat(lit(0L), 32),
        (acc, h) => zip_with(acc, pow2, (c, b) =>
          c + when(h.bitwiseAND(b) =!= 0L, 1L).otherwise(0L)))
      val n = size(dt)
      val fp = aggregate(
        zip_with(counts, pow2, (c, b) => when(c * 2 > n, b).otherwise(0L)),
        lit(0L), (acc, v) => acc + v)
      // persisted: the band self-join consumes this tiny (doc_id, fp)
      // frame twice — without it every md5 re-executes per side
      val docs = Tables.documents(s, d).select(col("doc_id"), fp.as("fp"))
        .persist()
      val bands = docs.select(col("doc_id"), col("fp"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("fp"), 8 * b).bitwiseAND(lit(255L)).as("key"))): _*))
          .as("bk"))
        .select(col("doc_id"), col("fp"), col("bk.band").as("band"),
          col("bk.key").as("key"))
      val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
          col("a.fp").as("fa"), col("b.fp").as("fb"))
        .distinct()
      cand.select(col("da"), col("db"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).as("hamming"))
        .filter(col("hamming") <= 3)
        .orderBy(col("da"), col("db"))
    },
    Some(s"""WITH tt AS (SELECT doc_id, string_split(text,' ') AS toks
          FROM documents),
        t AS (SELECT doc_id, $duckShingles AS dt FROM tt),
        h AS (SELECT doc_id, CAST('0x' || substr(md5(tok),1,8) AS BIGINT) AS hv
              FROM (SELECT doc_id, unnest(dt) AS tok FROM t)),
        c AS (SELECT doc_id, p.p AS p,
              count(*) FILTER (((hv >> p.p) & 1) = 1) AS ones, count(*) AS n
              FROM h, range(0, 32) p(p) GROUP BY doc_id, p.p),
        fp AS (SELECT doc_id,
               sum(CASE WHEN ones * 2 > n THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS fp
               FROM c GROUP BY doc_id)
      SELECT a.doc_id AS da, b.doc_id AS db,
        bit_count(xor(a.fp, b.fp)) AS hamming
      FROM fp a JOIN fp b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.fp, b.fp)) <= 3
      ORDER BY da, db"""))

  val all: Seq[Q] = Seq(q25TokenStats, q26LangId, q27QualityScore,
    q28Fingerprint, q29DedupExact, q30MinhashLsh, q31NgramJaccard, q32Simhash)
}
