package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for LLM-training-data pipelines over the
  * `documents` fixture: token counting (whitespace + BPE-ish regex),
  * quality scoring, language-ID heuristics, and the multimodal binary
  * column plumbing.
  *
  * The reference's only text handling is fixed-schema CSV columns
  * (`/root/reference/assets/schema/make_schema.py:41-51`); these are the
  * per-document profiling passes a corpus pipeline runs before training.
  * Everything is a single narrow projection per document — one scan, no
  * shuffle until the final (tiny) ordered output, whole-stage codegen'd
  * built-ins throughout (no UDFs).
  */
object TextAnalysisQueries {

  /** Per-document text statistics: whitespace token count, BPE-ish regex
    * token count, mean token length, stopword ratio, alphabetic ratio,
    * a stopword-based language-ID heuristic, and a 0-3 quality score
    * (the length/punct/stopword family of crawl-filtering heuristics). */
  def q27TextStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", expr("split(text, ' ')"))
      .select(
        col("doc_id").cast("bigint").as("doc_id"),
        col("lang"),
        expr("cast(size(toks) as bigint)").as("n_tokens"),
        expr("cast(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) as bigint)")
          .as("n_bpe"),
        expr("cast(aggregate(toks, 0, (acc, t) -> acc + length(t)) as double) / cast(size(toks) as double)")
          .as("avg_tok_len"),
        expr("cast(size(filter(toks, t -> t in ('the', 'a', 'of', 'and', 'to'))) as double) / cast(size(toks) as double)")
          .as("stop_ratio"),
        expr("cast(length(regexp_replace(text, '[^a-z]', '')) as double) / cast(length(text) as double)")
          .as("alpha_ratio"))
      .withColumn("pred_lang", expr("case when stop_ratio >= 0.08 then 'en' else 'other' end"))
      .withColumn("quality", expr(
        "cast((case when n_tokens >= 20 then 1 else 0 end) + " +
          "(case when stop_ratio >= 0.05 then 1 else 0 end) + " +
          "(case when avg_tok_len between 3 and 8 then 1 else 0 end) as int)"))
      .orderBy("doc_id")

  /** Multimodal binary-column plumbing: documents' text re-encoded as an
    * opaque binary payload (standing in for image/audio bytes, which the
    * container cannot decode), then the metadata-extraction pass a media
    * pipeline runs: byte length, content checksum, a deterministic fake
    * decode of width/height/frame-count. The real decoder would replace the
    * fake arithmetic inside the same projection (or a mapPartitions batch —
    * see graft.multimodal.BinaryPipeline); the Spark-side schema, scan
    * shape, and partitioning are what this query pins down. */
  def q29MultimodalBinary(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("payload", expr("encode(text, 'UTF-8')"))
      .select(
        col("doc_id").cast("bigint").as("doc_id"),
        expr("cast(octet_length(payload) as bigint)").as("n_bytes"),
        expr("md5(hex(payload))").as("checksum"),
        expr("substring(hex(payload), 1, 16)").as("hex_prefix"),
        expr("cast(64 + octet_length(payload) % 512 as int)").as("fake_width"),
        expr("cast(64 + (octet_length(payload) * 7) % 512 as int)").as("fake_height"),
        expr("cast(greatest(1, octet_length(payload) div 100) as int)").as("n_frames"))
      .orderBy("doc_id")

  /** Corpus vocabulary with term and document frequencies (the IDF-side
    * statistics a text pipeline computes before weighting/filtering):
    * explode tokens, count occurrences and distinct documents per token,
    * top-20 by frequency. Map-side partial aggregation collapses the
    * exploded token stream before the shuffle; the distinct-doc count is
    * the two-phase (token, doc) pre-aggregate, so no per-token set is ever
    * materialized. Total order: ties broken by token. */
  def q41Vocabulary(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(expr("split(text, ' ')")).as("tok"))
      .groupBy("tok", "doc_id")
      .agg(count(lit(1)).as("n"))
      .groupBy("tok")
      .agg(sum(col("n")).cast("bigint").as("tf"),
           count(lit(1)).cast("bigint").as("df"))
      .orderBy(desc("tf"), asc("tok"))
      .limit(20)

  /** String-function suite (extends SURVEY §2.11 — the reference's only
    * string functions are concat/concat_ws): case mapping, trim/pad,
    * slicing, replace/translate, repeat/reverse over the bounded nation
    * dim. Every function here has identical semantics in both engines
    * (ASCII inputs; regex-based functions are deliberately excluded —
    * Java and RE2 dialects differ at the edges). */
  def q48StringSuite(s: SparkSession, dir: String): DataFrame =
    graft.Tables.nation(s, dir)
      .select(
        col("n_nationkey").cast("bigint").as("id"),
        lower(col("n_name")).as("lower_name"),
        expr("substring(n_name, 1, 3)").as("prefix3"),
        expr("lpad(n_name, 12, '.')").as("padded"),
        expr("rpad(cast(n_nationkey as string), 4, '0')").as("key_padded"),
        expr("replace(n_name, 'A', '@')").as("replaced"),
        expr("translate(n_name, 'AEIOU', 'aeiou')").as("translated"),
        expr("reverse(n_name)").as("reversed"),
        expr("repeat('-', cast(n_nationkey % 5 as int))").as("bar"),
        expr("cast(length(trim(concat(' ', n_name, ' '))) as int)").as("trimmed_len"))
      .orderBy("id")

  /** Frame-sample over the multimodal payload (every 4th 256-byte frame,
    * per-frame byte count + digest) — the rate-sampling pass a video/audio
    * pipeline runs before feature extraction, here on the opaque binary
    * column via graft.multimodal.BinaryPipeline.frameSample. The ASCII
    * guard (octet_length = length) keeps byte slicing expressible in the
    * VARCHAR-only DuckDB oracle: for ASCII text the byte slice IS the
    * character slice, so both engines digest identical bytes; non-ASCII
    * rows are excluded on BOTH sides rather than silently diverging. */
  def q53FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .filter(expr("octet_length(text) = length(text)"))
      .select(col("doc_id").cast("long").as("doc_id"),
              expr("encode(text, 'UTF-8')").as("payload"), col("source"))
      .as[graft.multimodal.MediaRow]
    graft.multimodal.BinaryPipeline.frameSample(media)
      .orderBy("doc_id", "frame_idx")
  }

  /** BPE-ish token statistics (the brief's second tokenizer next to q27's
    * whitespace split): a run-based regex — letter runs, digit runs,
    * punctuation runs — in the dialect-portable subset (explicit ranges
    * only, no lookaround, no shorthand classes), identical under Java
    * regex and RE2, so Spark and DuckDB tokenize bit-identically. The
    * subword estimate is ceil(len/4) per letter run — the BPE-ish
    * heuristic (merged tokens average ~4 chars) a token-budget planner
    * uses before running a real tokenizer. */
  def q54BpeTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").cast("bigint").as("doc_id"),
        expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+', 0)").as("toks"))
      .select(col("doc_id"),
        expr("cast(size(toks) as bigint)").as("n_tokens"),
        expr("cast(size(filter(toks, t -> substring(t, 1, 1) rlike '[A-Za-z]')) as bigint)").as("n_word"),
        expr("cast(size(filter(toks, t -> substring(t, 1, 1) rlike '[0-9]')) as bigint)").as("n_digit"),
        expr("cast(aggregate(filter(toks, t -> substring(t, 1, 1) rlike '[A-Za-z]'), " +
          "0L, (a, t) -> a + (length(t) + 3) div 4) as bigint)").as("n_subword_est"))
      .withColumn("n_punct", (col("n_tokens") - col("n_word") - col("n_digit")).cast("bigint"))
      .select("doc_id", "n_tokens", "n_word", "n_digit", "n_punct", "n_subword_est")
      .orderBy("doc_id")

  /** Deterministic stratified sampling — the mixture-control op a
    * training-data pipeline runs to hit per-source quotas: each document
    * maps to a bucket in [0, 100) via the first md5 byte of its
    * (doc_id, source) key, and survives iff bucket < its source's rate.
    * Hash-based (not rand()) so the sample is REPRODUCIBLE across runs,
    * engines, and partitionings — rerunning the pipeline keeps the same
    * documents, which dataset versioning depends on. Per-source rates are
    * derived from the source id here; production passes a rate map. One
    * narrow scan + one groupBy; the sample decision is a codegen'd
    * projection, so at 100 TB this is scan-bound. */
  def q55StratifiedSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").cast("bigint").as("doc_id"), col("source"))
      .withColumn("rate", expr("20 + (cast(substring(source, 4) as int) * 7) % 60"))
      .withColumn("bucket", expr(
        "cast(conv(substring(md5(concat(cast(doc_id as string), ':', source)), 1, 2), 16, 10) as int) % 100"))
      .withColumn("kept", col("bucket") < col("rate"))
      .groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("n_total"),
           sum(when(col("kept"), 1L).otherwise(0L)).cast("bigint").as("n_kept"),
           coalesce(min(when(col("kept"), col("doc_id"))), lit(-1L)).cast("bigint").as("first_kept"),
           coalesce(max(when(col("kept"), col("doc_id"))), lit(-1L)).cast("bigint").as("last_kept"),
           min(col("rate")).cast("int").as("rate"))
      .orderBy("source")

  /** PII scrubbing — the redaction pass a training-data pipeline runs
    * before anything else sees raw crawl text: emails, IPv4 addresses, and
    * long digit runs (phone/account numbers) are replaced with sentinel
    * tokens, and per-document redaction counts are emitted for audit.
    *
    * The synthetic fixture contains no PII (single-case words, no digits),
    * so the query first appends a DETERMINISTIC contaminated footer derived
    * from doc_id — identically in the oracle — to make the scrub
    * observable; production runs the same three regexp_replace steps on the
    * raw text column directly. Patterns stay in the dialect-portable regex
    * subset (explicit classes, no shorthand, no lookaround — see q54) so
    * Java regex and DuckDB's RE2 match identical spans. Replacement order
    * matters and is fixed: emails first (their host would otherwise leave a
    * digit-bearing tail), then IPv4 (dotted quads would otherwise be eaten
    * digit-run by digit-run), then bare digit runs of 7+.
    *
    * Scale shape: one narrow scan, three codegen'd regexp_replace calls +
    * three regexp_extract_all counts per row, no shuffle until the final
    * ordered output — scan-bound at 100 TB, like q27. */
  def q60PiiScrub(s: SparkSession, dir: String): DataFrame = {
    val email = "[A-Za-z0-9._-]+@[A-Za-z0-9.-]+[.][A-Za-z]+"
    val ipv4 = "[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+"
    val digits = "[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+"
    Tables.documents(s, dir)
      .select(col("doc_id").cast("bigint").as("doc_id"),
        expr("concat(text, ' reach user', cast(doc_id as string), '@mail', " +
          "cast(doc_id % 7 as string), '.example.com or ', " +
          "cast(10 + doc_id % 90 as string), '.', cast(doc_id % 256 as string), '.', " +
          "cast((doc_id * 3) % 256 as string), '.', cast((doc_id * 7) % 256 as string), " +
          "' ref ', lpad(cast((doc_id * 991) % 100000000 as string), 8, '0'))").as("raw"))
      .withColumn("n_email", expr(s"cast(size(regexp_extract_all(raw, '$email', 0)) as int)"))
      .withColumn("pass1", expr(s"regexp_replace(raw, '$email', '<EMAIL>')"))
      .withColumn("n_ip", expr(s"cast(size(regexp_extract_all(pass1, '$ipv4', 0)) as int)"))
      .withColumn("pass2", expr(s"regexp_replace(pass1, '$ipv4', '<IP>')"))
      .withColumn("n_num", expr(s"cast(size(regexp_extract_all(pass2, '$digits', 0)) as int)"))
      .withColumn("scrubbed", expr(s"regexp_replace(pass2, '$digits', '<NUM>')"))
      .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_num"),
        expr("cast(length(scrubbed) as bigint)").as("scrubbed_len"),
        expr("md5(scrubbed)").as("scrubbed_md5"))
      .orderBy("doc_id")
  }

  /** Intra-document repetition ratio (the Gopher-family quality gate a
    * crawl pipeline applies before training): the fraction of word 3-grams
    * that are repeats of an earlier 3-gram in the SAME document, plus the
    * hottest gram's count. Machine-generated and boilerplate text scores
    * high; `keep_doc` applies the standard <= 0.2 duplicate-fraction cut.
    *
    * Shape: explode 3-grams, two-phase aggregate — (doc, gram) partial
    * counts collapse the exploded stream map-side before the single
    * shuffle, then per-doc totals; nothing per-document is ever collected
    * to one row except the final four counters. Same scale contract as
    * q41's vocabulary pass. */
  def q61RepetitionRatio(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id").cast("bigint").as("doc_id"),
              expr("split(text, ' ')").as("toks"))
      .filter(expr("size(toks) >= 3"))
      .select(col("doc_id"),
        explode(expr("graft_shingles(toks, 3)")).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum(col("n")).cast("bigint").as("n_grams"),
           count(lit(1)).cast("bigint").as("n_distinct"),
           max(col("n")).cast("bigint").as("top_gram_n"))
      .withColumn("dup_ratio",
        lit(1.0) - col("n_distinct").cast("double") / col("n_grams").cast("double"))
      .withColumn("keep_doc", col("dup_ratio") <= 0.2)
      .orderBy("doc_id")

  /** Sliding-window document chunking (the pass that turns cleaned
    * documents into model-context-sized training rows): 64-token chunks on
    * a 48-token stride (16-token overlap), chunk identity = md5 of the
    * chunk text. A doc with n tokens yields ceil(n/48) chunks — chunk i
    * starts at token i*48+1 and the tail chunk is short. One narrow
    * projection + explode per document, no shuffle until the (tiny)
    * presentation sort: the real pipeline writes chunks straight back to
    * partitioned parquet, so the operator is scan-bound at any scale. */
  def q73Chunking(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", expr("split(text, ' ')"))
      .withColumn("n", expr("size(toks)"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, (n - 1) div 48), " +
          "i -> struct(i as idx, slice(toks, i * 48 + 1, 64) as chunk))")).as("c"))
      .select(col("doc_id").cast("bigint").as("doc_id"),
        col("c.idx").cast("int").as("chunk_idx"),
        expr("cast(size(c.chunk) as int)").as("chunk_tokens"),
        expr("md5(concat_ws(' ', c.chunk))").as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")

  /** BPE merge-candidate statistics: corpus-wide adjacent character-pair
    * counts within words — the aggregation at the heart of every BPE
    * tokenizer-training iteration (the highest-count pair becomes the next
    * merge rule). Top-20, ties broken by pair. Two explodes (words, then
    * the length-1 pair windows) collapse through map-side combine before
    * the single shuffle on the pair; the hot loop of tokenizer training at
    * 100 TB is exactly this scan-bound aggregate repeated per merge. */
  def q74BpeMerges(s: SparkSession, dir: String): DataFrame =
    // Round-16: the word-instance explode + per-position interpreted
    // substring lambda (one dispatch per character of every word
    // occurrence) is the k=2 slice of graft_gramcounts — per-document
    // in-word gram counting in one compiled loop, emitting distinct
    // (gram, count) rows instead of one row per occurrence. Identical
    // pairs and counts: both step by code point, and words shorter than
    // 2 produce no 2-gram either way (GramCountsSpec pins the family).
    Tables.documents(s, dir)
      .select(explode(expr("graft_gramcounts(text)")).as("gk"))
      .filter(col("gk.k") === 2)
      .groupBy(col("gk.g").as("pair"))
      .agg(sum("gk.cnt").cast("bigint").as("cnt"))
      .orderBy(desc("cnt"), asc("pair"))
      .limit(20)

  /** Corpus words as character-token strings — BPE training's initial
    * state: each word becomes its characters joined by single spaces
    * ("the" → "t h e"), so a token SEQUENCE is a flat string and merge
    * rounds are pure string algebra both engines execute identically. */
  /** The distinct-WORD frequency table, char-split: (t = "c h a r s",
    * freq = instance count). The Sennrich BPE-trainer representation —
    * the corpus instance stream is touched exactly ONCE (this count);
    * every merge round after it runs over the distinct-word frame and
    * weights by freq, so rounds cost O(|vocabulary|), not O(corpus).
    * Merging never collides two distinct words (a merge is a
    * deterministic rewrite of the word's unchanged character sequence),
    * so the frame stays keyed by word with no per-round re-group. */
  private def bpeInitialTokens(docs: DataFrame): DataFrame =
    docs.select(explode(expr("split(text, ' ')")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(expr(
        "array_join(transform(sequence(1, length(w)), i -> substring(w, i, 1)), ' ')").as("t"),
        col("freq"))

  /** The corpus-top adjacent token pair of a (token-string, freq) frame:
    * ONE row (pair "l r", instance-weighted count), ties to the
    * lexicographically first pair — the next BPE merge rule. */
  private def bpeTopPair(words: DataFrame): DataFrame =
    words.select(col("freq"), expr("split(t, ' ')").as("arr"))
      .filter(expr("size(arr) >= 2"))
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(arr) - 1), i -> concat(arr[i-1], ' ', arr[i]))")).as("pair"))
      .groupBy("pair").agg(sum("freq").cast("bigint").as("cnt"))
      .orderBy(desc("cnt"), asc("pair")).limit(1)

  /** Apply one merge rule left-to-right non-overlapping — the BPE merge
    * semantics — as three string replaces: widen separators to double
    * spaces so every token owns BOTH its flanks ("a a a a" →
    * " a  a  a  a "), replace " l  r " with " lr " (replace() scans
    * left-to-right and resumes after each replacement, which with owned
    * flanks is exactly non-overlapping leftmost merge: [a,a,a,a] →
    * [aa,aa], [a,a,a] → [aa,a]), then collapse separators and trim. A
    * single-space pattern would share its boundary space between
    * adjacent matches and silently skip every second merge. */
  private def bpeApplyMerge(words: DataFrame, pairStr: String): DataFrame =
    words.select(trim(replace(
      replace(
        concat(lit(" "), replace(col("t"), lit(" "), lit("  ")), lit(" ")),
        lit(" " + pairStr.replace(" ", "  ") + " "),
        lit(" " + pairStr.replace(" ", "") + " ")),
      lit("  "), lit(" "))).as("t"), col("freq"))

  /** Iterative BPE tokenizer training, `rounds` unrolled merge rounds —
    * the loop [[q74BpeMerges]] computes one iteration of: count adjacent
    * pairs, adopt the top pair as a merge rule, re-tokenize, repeat. One
    * row per round: the rule, its support count, and the corpus token
    * count after applying it (strictly decreasing while any pair repeats
    * — BpeSpec's property). The state is the [[bpeInitialTokens]]
    * distinct-word FREQUENCY table, so the corpus instance stream is
    * scanned exactly once (the initial count shuffle); every round's
    * pair count and merge then run over the vocabulary frame with
    * freq-weighted sums — O(|vocabulary|) per round, the Sennrich
    * trainer's representation, which is what makes a realistic round
    * count affordable at 100 TB. Loop mechanics follow the
    * pagerankConverged discipline: each round's vocabulary frame stages
    * through parquet, the post-merge token count rides the merge write
    * as a freq-weighted Observation, and the adopted rule is a bounded
    * one-row driver scalar that becomes a plan-time literal — two jobs
    * per round. */
  private[graft] def bpeTrainRounds(docs: DataFrame, rounds: Int): DataFrame = {
    val s = docs.sparkSession
    val ck = graft.Staging.fresh("bpe")
    // vocabulary frames coalesce to a few files per round: they are tiny
    // (distinct words, not instances), and 32 task-files × R rounds of
    // commit overhead otherwise dominates
    bpeInitialTokens(docs).coalesce(4).write.mode("overwrite").parquet(s"$ck/w0")
    var words = s.read.parquet(s"$ck/w0")
    val perRound = (1 to rounds).map { r =>
      // the adopted rule is a BOUNDED driver scalar — one row, the same
      // class as the dim/min-max mirrors (q19, TransformJourneys) — and
      // becomes a plan-time literal of the merge pass; the post-merge
      // token count rides the merge WRITE as an Observation. Two jobs per
      // round total (pair count, merge+count+write), which is also how a
      // production trainer iterates: adopt the rule, re-tokenize, repeat.
      val topRow = bpeTopPair(words).head()
      val (pair, cnt) = (topRow.getString(0), topRow.getLong(1))
      val obs = org.apache.spark.sql.Observation(s"graft_bpe_round_$r")
      bpeApplyMerge(words, pair)
        .observe(obs,
          sum(col("freq") * size(split(col("t"), " "))).cast("long").as("n_after"))
        .coalesce(4).write.mode("overwrite").parquet(s"$ck/w$r")
      words = s.read.parquet(s"$ck/w$r")
      (r, pair, pair.replace(" ", ""), cnt,
        obs.get("n_after").asInstanceOf[Long])
    }
    import s.implicits._
    perRound.toDF("round", "pair", "merged", "cnt", "n_tokens_after")
      .orderBy("round")
  }

  /** The registered 3-round instance over the fixture corpus. */
  def q98BpeTrain(s: SparkSession, dir: String): DataFrame =
    bpeTrainRounds(Tables.documents(s, dir), 3)

  // ---------------------------------------------------------------- q144

  /** BPE ENCODE — applying the q98-trained merge rules to a corpus
    * slice, closing the train → apply loop (a tokenizer you can only
    * train is half an operator; token COUNTS under the trained vocab are
    * what the packing/budget family q68/q120 consumes upstream).
    *
    * The rules come from [[bpeTrainRounds]] over the FULL corpus — a
    * bounded driver scalar per round (the same one-row class as q19's
    * min/max mirror) that becomes a plan-time literal of the encode
    * pass. Encoding then follows the Sennrich-representation discipline
    * that made q98 affordable: the merge chain is applied once per
    * DISTINCT word (the vocabulary frame), and per-document counts come
    * from an instance ⋈ vocabulary equi-join on the word — at 100 TB
    * the merge arithmetic cost scales with |vocabulary|, not corpus
    * instances, and both shuffles (vocab build, per-doc sum) ride
    * scaling keys. Output per document: word/char counts, BPE token
    * count, and the chars-per-token compression ratio (one
    * correctly-rounded double division of exact BIGINTs). */
  /** The trained merge chain applied to a word column `w`, as a single
    * column expression (the q98 separator-widening replace fold) —
    * shared by q144 (per-doc counts) and q241 (per-language fertility). */
  private def bpeAppliedExpr(rules: Seq[String]): org.apache.spark.sql.Column =
    rules.foldLeft(expr(
      "array_join(transform(sequence(1, length(w)), i -> substring(w, i, 1)), ' ')")) {
      (t, r) =>
        trim(replace(replace(
          concat(lit(" "), replace(t, lit(" "), lit("  ")), lit(" ")),
          lit(" " + r.replace(" ", "  ") + " "),
          lit(" " + r.replace(" ", "") + " ")), lit("  "), lit(" ")))
    }

  /** Trained merge rules per corpus fingerprint per JVM — training is
    * a deterministic function of the corpus, so it is a once-per-corpus
    * INDEX BUILD (the q205 weightsCache idiom); shared by the encode
    * consumers q144/q241 so repeated scoring runs pay the 3-round train
    * once. The rules are a bounded driver scalar (one short string per
    * round) — the q19 mirror class, independent of corpus size. */
  private val bpeRulesCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  /** The standing corpus's FULL unigram gram-count table per corpus
    * fingerprint per JVM — durable through the Layouts registry (q321);
    * the map only memoizes the staged path. */
  private val unigramBaseCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The corpus's segmented distinct-word frame (the unigram E-step) per
    * corpus fingerprint per JVM — durable through the Layouts registry;
    * shared by q319 (usage counts) and q320 (round-0 numbers + usage),
    * so the path fold runs once per corpus, not per consumer. */
  private val unigramSegCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The corpus's full gram-count table per corpus fingerprint per JVM
    * — durable through the Layouts registry; the one corpus-scale pass
    * every unigram query (q318–q320, stagedSegmented's build) shares. */
  private val unigramFullCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Test hook: forget the durable trained-rules, gram-count and
    * segmentation caches (the Layouts files and manifests remain,
    * exactly what a fresh JVM sees). */
  private[graft] def resetDurableStagesForTest(): Unit = {
    bpeRulesCache.clear()
    unigramBaseCache.clear()
    unigramSegCache.clear()
    unigramFullCache.clear()
  }

  private def trainedBpeRules(s: SparkSession, dir: String): Array[String] =
    bpeRulesCache.computeIfAbsent(
      graft.CorpusKey(dir, "documents.parquet"), _ => {
        // durable through the Layouts registry (round 15): the trained
        // rules land as a newline-joined text file next to the manifest,
        // so a later JVM attaches instead of re-running the 3-round train
        val p = graft.etl.Layouts.stage(s, "bperules", "v1;rounds=3", dir,
          Seq("documents")) { base =>
          val rules = bpeTrainRounds(Tables.documents(s, dir), 3)
            .orderBy("round").select("pair").collect().map(_.getString(0))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(base, "rules.txt"),
            rules.mkString("\n").getBytes("UTF-8"))
          s"$base/rules.txt"
        }
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)), "UTF-8")
          .split("\n", -1).filter(_.nonEmpty)
      })

  def q144BpeEncode(s: SparkSession, dir: String): DataFrame = {
    val rules = trainedBpeRules(s, dir)
    val inst = Tables.documents(s, dir).filter(col("doc_id") < 200)
      .select(col("doc_id"), explode(expr("split(text, ' ')")).as("w"))
      .filter(length(col("w")) >= 1)
    val vocab = inst.select("w").distinct()
      .select(col("w"), size(split(bpeAppliedExpr(rules.toSeq), " ")).as("n_tok"))
    inst.join(vocab, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_words"),
        sum(length(col("w"))).cast("bigint").as("n_chars"),
        sum("n_tok").cast("bigint").as("n_bpe_tokens"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("n_bpe_tokens").cast("double"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q241

  /** q241 — TOKENIZER FERTILITY per language: BPE tokens per word and
    * chars per token under the q98-trained vocabulary, per language —
    * THE cross-lingual tokenizer-equity readout (a language whose
    * fertility is 2× pays twice the sequence length for the same text,
    * so compute budgets, packing yields q68, and context limits all
    * skew against it; tokenizer papers report exactly this table).
    *
    * Same scale discipline as q144: the merge chain runs once per
    * DISTINCT word (the Sennrich vocabulary frame), instances reach
    * their token counts through one word-keyed equi-join, and the
    * language rollup is a bounded aggregate. Fertility and compression
    * surface as exact e6 integer divisions of BIGINT sums — engine-
    * identical, no float. */
  def q241TokenizerFertility(s: SparkSession, dir: String): DataFrame = {
    val rules = trainedBpeRules(s, dir)
    val inst = Tables.documents(s, dir)
      .select(col("lang"), explode(expr("split(text, ' ')")).as("w"))
      .filter(length(col("w")) >= 1)
    val vocab = inst.select("w").distinct()
      .select(col("w"), size(split(bpeAppliedExpr(rules.toSeq), " ")).as("n_tok"))
    inst.join(vocab, Seq("w"))
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_words"),
        sum(length(col("w"))).cast("bigint").as("n_chars"),
        sum("n_tok").cast("bigint").as("n_bpe_tokens"))
      .select(col("lang"), col("n_words"), col("n_bpe_tokens"),
        expr("(1000000 * n_bpe_tokens) div n_words").as("fertility_e6"),
        expr("(1000000 * n_chars) div n_bpe_tokens").as("chars_per_token_e6"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- q163

  /** Collocation extraction by PMI LIFT — the top adjacent token pairs
    * whose joint frequency most exceeds independence, ranked by
    * lift = p(x,y) / (p(x)·p(y)) (PMI without the log: log is monotone,
    * and ln/log2 are the one function family the cross-engine
    * determinism contract excludes — the q75 lesson). The corpus
    * phrase-mining primitive behind tokenizer vocab curation and q104's
    * phrase index seeding.
    *
    * Scale: bigram and unigram counts are two map-side-combinable
    * shuffles on token keys (the q74 machinery); the totals are 1-row
    * broadcasts; the support floor (c_pair >= 10) bounds the ranked
    * frame before the top-k sort. The lift double is one identical
    * 5-op chain over exact BIGINTs, so ranking ties and values agree
    * bit-for-bit. */
  def q163PmiCollocations(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir).select(expr("split(text, ' ')").as("arr"))
    val uni = toks.select(explode(col("arr")).as("w"))
    val cx = uni.groupBy("w").agg(count(lit(1)).as("c"))
    val nu = uni.agg(count(lit(1)).as("n_uni"))
    val pairs = toks.filter(expr("size(arr) >= 2"))
      .select(explode(expr(
        "transform(sequence(1, size(arr) - 1), i -> struct(arr[i-1] as x, arr[i] as y))"))
        .as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val cp = pairs.groupBy("x", "y").agg(count(lit(1)).as("c_pair"))
    val np = pairs.agg(count(lit(1)).as("n_pairs"))
    cp.filter(col("c_pair") >= 10)
      .join(cx.select(col("w").as("x"), col("c").as("c_x")), "x")
      .join(cx.select(col("w").as("y"), col("c").as("c_y")), "y")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(np))
      .withColumn("lift",
        col("c_pair").cast("double") * col("n_uni").cast("double") /
          col("c_x").cast("double") * col("n_uni").cast("double") /
          col("c_y").cast("double") / col("n_pairs").cast("double"))
      .select(col("x"), col("y"), col("c_pair").cast("bigint").as("c_pair"),
        col("c_x").cast("bigint").as("c_x"), col("c_y").cast("bigint").as("c_y"),
        col("lift"))
      .orderBy(desc("lift"), asc("x"), asc("y")).limit(20)
  }

  /** True winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting" — the
    * rolling-hash selection scheme behind MOSS, and the principled form
    * of q28's simpler min-4 sketch): hash every character 4-gram, slide a
    * 5-hash window over the sequence, and SELECT each window's minimum —
    * the winnowing guarantee is that any shared substring of length
    * >= 8 chars (gram + window) contributes at least one shared selected
    * hash, so matching fingerprints localize plagiarized/duplicated
    * spans, not just whole-document similarity. Output per document: the
    * gram count, the distinct selected count (the fingerprint density),
    * and the md5 of the sorted selection — a stable whole-doc
    * fingerprint id.
    *
    * Scale: entirely in-row (one codegen'd projection over higher-order
    * functions — no explode, no shuffle except the final sort); the
    * selected set is ~2/(w+1) of grams by the winnowing density bound,
    * so the projection output stays a bounded fraction of the text. Both
    * engines fold the same lists in the same order; lexicographic string
    * mins on lowercase hex are identical. */
  def q91Winnowing(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(expr("length(text) >= 8"))
      // the native expression (graft.functions.Winnow): one UTF-8 pass,
      // md5 per gram without substring materialization, monotonic-deque
      // rolling min — 3.3 s -> ~1 s at sf0.1 vs the HOF form, which
      // WinnowSpec keeps as the differential reference and the DuckDB
      // oracle re-derives independently (list_min over list slices)
      .withColumn("sel", expr("graft_winnow(text, 4, 5)"))
      .select(col("doc_id").cast("bigint").as("doc_id"),
        expr("cast(length(text) - 3 as bigint)").as("n_grams"),
        expr("cast(size(sel) as bigint)").as("n_selected"),
        expr("md5(concat_ws('', array_sort(sel)))").as("fingerprint"))
      .orderBy("doc_id")

  /** The higher-order-function twin of [[q91Winnowing]]'s selection —
    * kept (test-only) as WinnowSpec's differential reference for the
    * native expression. */
  private[graft] def winnowingHof(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(expr("length(text) >= 8"))
      .withColumn("h", expr(
        "transform(sequence(1, length(text) - 3), i -> md5(substring(text, i, 4)))"))
      .withColumn("sel", expr(
        "array_distinct(transform(sequence(1, size(h) - 4), " +
          "j -> least(h[j-1], h[j], h[j+1], h[j+2], h[j+3])))"))
      .select(col("doc_id").cast("bigint").as("doc_id"),
        expr("cast(size(h) as bigint)").as("n_grams"),
        expr("cast(size(sel) as bigint)").as("n_selected"),
        expr("md5(concat_ws('', array_sort(sel)))").as("fingerprint"))
      .orderBy("doc_id")

  /** Exact phrase search over a positional inverted index: documents
    * containing the 3-token phrase "big order scan" as consecutive
    * whitespace tokens, with occurrence count and first match position
    * (0-based). The retrieval primitive a corpus pipeline needs for
    * targeted contamination probes and boilerplate hunting that q41's
    * bag-of-words vocabulary cannot answer.
    *
    * Plan shape: posexplode to (doc_id, pos, tok) postings, PRUNE to the
    * phrase's terms inside the scan projection (the isin filter pushes
    * below the generate, so non-phrase tokens never reach a shuffle),
    * then offset-aligned equi-joins on (doc_id, pos - i) — the classic
    * positional-intersection, never a per-document scan of full position
    * lists. At 100 TB each join key is (doc, position): maximally
    * spread, no skew; AQE orders/sizes the joins by actual term
    * frequency (rarest-first comes free from its size estimates). The
    * same postings relation feeds all three sides from ONE tokenize
    * (self-joined, so the exchange is reused across the two joins). */
  private[graft] def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val postings = docs
      .select(col("doc_id"),
        posexplode(expr("split(text, ' ')")).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase: _*))
    def side(i: Int): DataFrame = postings
      .filter(col("tok") === phrase(i))
      .select(col("doc_id"), (col("pos") - i).as("pos"))
    phrase.indices.tail
      .foldLeft(side(0))((acc, i) => acc.join(side(i), Seq("doc_id", "pos")))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("bigint").as("n_matches"),
        min("pos").cast("bigint").as("first_pos"))
      .select(col("doc_id").cast("bigint").as("doc_id"),
        col("n_matches"), col("first_pos"))
      .orderBy("doc_id")
  }

  def q104PhraseSearch(s: SparkSession, dir: String): DataFrame =
    phraseSearch(Tables.documents(s, dir), Seq("big", "order", "scan"))

  /** Array higher-order/collection function suite — the §2.11 surface a
    * token-array pipeline leans on daily (size/distinct/contains/
    * position/sort/reverse/slice/element_at/array_max), each with a
    * DuckDB list_* twin so the whole family is hash-checked in one
    * query (the q48 string-suite discipline applied to arrays). Scalar
    * projections per document, one bounded per-language aggregate; every
    * function is codegen'd (no HOF lambdas that would fall back to
    * interpreted eval — the graft_dot lesson). */
  def q127ArraySuite(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", expr("split(text, ' ')"))
      .select(col("lang"),
        expr("size(toks)").as("nt"),
        expr("size(array_distinct(toks))").as("nd"),
        expr("cast(array_contains(toks, 'the') as int)").as("has_the"),
        expr("coalesce(array_position(toks, 'the'), 0L)").as("pos_the"),
        expr("element_at(array_sort(toks), 1)").as("first_sorted"),
        expr("element_at(reverse(toks), 1)").as("last_tok"),
        expr("concat_ws(' ', slice(toks, 2, 3))").as("mid3"),
        expr("array_max(toks)").as("max_tok"))
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("nt").cast("bigint").as("sum_tokens"),
        sum("nd").cast("bigint").as("sum_distinct"),
        sum("has_the").cast("bigint").as("n_with_the"),
        sum("pos_the").cast("bigint").as("sum_pos_the"),
        min("first_sorted").as("min_first_sorted"),
        max("max_tok").as("max_token"),
        countDistinct("mid3").cast("bigint").as("n_distinct_mid3"),
        countDistinct("last_tok").cast("bigint").as("n_distinct_last"))
      .orderBy("lang")

  /** Regex function suite — extract / extract-all / replace / rlike in
    * one hash-checked pass (q60's PII scrub uses the family in anger;
    * this pins the primitives). Patterns stay in the dialect
    * intersection (character classes, quantifiers — no lookaround, no
    * \\d shorthand) because Spark compiles java.util.regex and DuckDB
    * compiles RE2: a pattern outside the common subset can MATCH
    * DIFFERENTLY while both engines accept it, which is exactly the
    * portability trap this query documents. Scalar projections + one
    * bounded per-language aggregate. */
  def q131RegexSuite(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"),
        expr("size(regexp_extract_all(text, '[0-9]+', 0))").as("n_numbers"),
        expr("regexp_extract(text, '([a-z]+ing)', 1)").as("first_ing"),
        expr("cast(text rlike '[A-Z][a-z]+' as int)").as("has_capitalized"),
        expr("length(regexp_replace(text, '[aeiou]', ''))").as("len_novowels"),
        expr("length(text)").as("len"))
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("n_numbers").cast("bigint").as("sum_numbers"),
        countDistinct("first_ing").cast("bigint").as("n_distinct_ing"),
        min(when(col("first_ing") =!= "", col("first_ing"))).as("min_ing"),
        sum("has_capitalized").cast("bigint").as("n_capitalized"),
        sum("len_novowels").cast("bigint").as("sum_novowel_len"),
        sum("len").cast("bigint").as("sum_len"))
      .orderBy("lang")

  // ---------------------------------------------------------------- q221

  /** TextRank iteration count — kept small so the oracle's unrolled CTE
    * chain stays linear (the q95 discipline); KEYWORD rankings are
    * already stable at 3 passes on the fixture. */
  private val trIters = 3

  /** q221 — TEXTRANK keyword extraction (Mihalcea & Tarau 2004): rank
    * words by PageRank over the adjacent-token co-occurrence graph and
    * report the global top-20 — the graph-centrality keyword scorer
    * next to the frequency family (q41 vocabulary, q66 TF-IDF, q163
    * PMI): a word matters if it co-occurs with words that matter, not
    * merely if it is frequent.
    *
    * Composition, not new machinery: the co-occurrence pairs (adjacent
    * tokens, canonical order, distinct — the unweighted window-2 graph
    * of the paper) stage to parquet, and the rank loop IS q95's
    * integer-lattice PageRank ([[SimilarityQueries.pagerankUnrolled]],
    * same object code: damping 85/100, rank scale 1e12, split-div
    * overflow form, floor semantics both engines). Node ids are WORDS
    * (strings) — the rank arithmetic never touches the id type.
    *
    * Scale: pair extraction is one explode + distinct on a scaling
    * (w1, w2) key; each rank pass is one join + aggregate over staged
    * leaf scans (the q95/q158 rotation). Vocabulary, not corpus size,
    * bounds the graph. */
  def q221Textrank(s: SparkSession, dir: String): DataFrame = {
    val stage = graft.Staging.fresh("trank")
    Tables.documents(s, dir)
      .withColumn("toks", expr("split(text, ' ')"))
      .filter(expr("size(toks) >= 2"))
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(toks[i-1] as a, toks[i] as b))")).as("p"))
      .select(least(col("p.a"), col("p.b")).as("vec_a"),
        greatest(col("p.a"), col("p.b")).as("vec_b"))
      .filter(col("vec_a") =!= col("vec_b"))
      .distinct()
      .write.mode("overwrite").parquet(s"$stage/pairs")
    SimilarityQueries.pagerankUnrolled(s, s"$stage/pairs", trIters)
      .select(col("v").as("word"), col("deg").cast("bigint").as("degree"),
        expr("cast(rank as double) / 1e12").as("rank"))
      .orderBy(desc("rank"), asc("word")).limit(20)
  }

  /** Unrolled TextRank oracle — the q95 chain over the word graph. */
  private def q221Oracle: String = {
    val passes = (1 to trIters).map { k =>
      s"""c$k AS (SELECT e.dst, CAST(SUM(r.rank * 85 // (100 * r.deg)) AS BIGINT) AS inflow
         |  FROM edges e JOIN r${k - 1} r ON e.src = r.v GROUP BY e.dst),
         |r$k AS (SELECT d.src AS v, d.deg,
         |    CAST(150000000000 AS BIGINT) + COALESCE(c$k.inflow, CAST(0 AS BIGINT)) AS rank
         |  FROM deg d LEFT JOIN c$k ON d.src = c$k.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
       |bp AS (SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
       |    i -> struct_pack(a := toks[i], b := toks[i+1]))) AS p
       |  FROM t WHERE len(toks) >= 2),
       |pr AS (SELECT DISTINCT LEAST(p.a, p.b) AS vec_a, GREATEST(p.a, p.b) AS vec_b
       |  FROM bp WHERE p.a <> p.b),
       |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pr
       |  UNION ALL SELECT vec_b AS src, vec_a AS dst FROM pr),
       |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT src AS v, deg, CAST(1000000000000 AS BIGINT) AS rank FROM deg),
       |$passes
       |SELECT v AS word, CAST(deg AS BIGINT) AS degree,
       |  CAST(rank AS DOUBLE) / 1e12 AS rank
       |FROM r$trIters ORDER BY rank DESC, word ASC LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------- q234

  /** q234 — skip-gram training-pair generation with frequency
    * subsampling (the word2vec data-assembly pass, Mikolov et al. 2013:
    * every embedding trainer consumes (center, context) pairs drawn
    * from a window over the subsampled token stream, where
    * high-frequency words are dropped with probability
    * 1 − sqrt(t / f_rel) before pairing). The whole pass is exact:
    *
    *   - the drop decision is the cross-multiplied integer form of
    *     Mikolov's rule — occurrence hash h ∈ [0, 65536) from a salted
    *     md5 of (doc_id, pos), kept iff h²·f ≤ (t·65536²)·N with
    *     t = 1/1024, so P(keep) = sqrt(t·N/f) exactly as published but
    *     with zero float arithmetic (the q222/q230 cross-multiply
    *     discipline; h²·f is BIGINT-exact to corpus token frequencies
    *     of ~2.1e9 — beyond, widen to decimal(38,0), the q187 path);
    *   - surviving occurrences COMPACT per document (row_number over
    *     the doc partition — an entity key) so the ±2 window spans the
    *     subsampled stream, not raw offsets: dropping a hot word pulls
    *     its neighbors together, exactly the variance-reduction effect
    *     the subsampling is for;
    *   - pairing is a BOUNDED fanout (each kept token emits its +1/+2
    *     context slots — the q216 explode discipline, never a per-doc
    *     self-join on an inequality) resolved by ONE equi-join on
    *     (doc, slot), then symmetrized.
    *
    * Scale: two corpus-sized shuffles (the token-frequency aggregate
    * and the pair count), one broadcast 1-row total, one doc-keyed
    * window, one equi-join on a scaling key. Output: the top-25
    * (center, context) pairs — the head of the co-occurrence table a
    * trainer's unigram/pair statistics are built from. */
  def q234SkipgramPairs(s: SparkSession, dir: String): DataFrame =
    skipgramPairFrame(Tables.documents(s, dir))
      .orderBy(desc("cnt"), asc("center"), asc("context"))
      .limit(25)

  /** The full symmetrized pair-count frame (pre-top-k) — factored so
    * WriterWaveSpec can assert symmetry and the rare-word-keep
    * guarantee over the whole table, and so a caller wanting the full
    * co-occurrence output skips the presentation cut. */
  private[graft] def skipgramPairFrame(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("f"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    val kept = toks
      .join(freq, "tok")
      .crossJoin(broadcast(total))
      .withColumn("h", expr(
        "cast(conv(substring(md5(concat(cast(doc_id as string), '_', " +
          "cast(pos as string))), 1, 4), 16, 10) as bigint)"))
      .filter(expr("h * h * f <= 4194304 * n_total"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val c = kept.select(col("doc_id"), col("pos"), col("tok"))
      .withColumn("cpos", row_number().over(w))
    val r = c.select(col("doc_id").as("rdoc"), col("cpos").as("rpos"),
      col("tok").as("rtok"))
    val fwd = c
      .select(col("doc_id"), col("tok").as("ltok"),
        explode(expr("array(cpos + 1, cpos + 2)")).as("tpos"))
      .join(r, col("doc_id") === col("rdoc") && col("tpos") === col("rpos"))
    fwd.select(col("ltok").as("center"), col("rtok").as("context"))
      .union(fwd.select(col("rtok").as("center"), col("ltok").as("context")))
      .groupBy("center", "context")
      .agg(count(lit(1)).cast("bigint").as("cnt"))
  }

  /** q234's oracle: the identical salted-hash subsample (nibble-Horner
    * hex parse), compaction, and ±2 pairing — the pair join written as
    * the direct position condition DuckDB plans as an equi-join on doc
    * plus a residual. */
  private def q234Oracle: String = {
    val h = (1 to 4).foldLeft("CAST(0 AS BIGINT)") { (acc, i) =>
      s"(($acc) * 16 + (strpos('0123456789abcdef', substr(" +
        s"md5(CAST(doc_id AS VARCHAR) || '_' || CAST(pos AS VARCHAR)), $i, 1)) - 1))"
    }
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
       |tok AS (SELECT doc_id, unnest(arr) AS tok,
       |    generate_subscripts(arr, 1) AS pos FROM t),
       |fr AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS f FROM tok GROUP BY tok),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tok),
       |kept AS (SELECT k.doc_id, k.pos, k.tok
       |  FROM tok k JOIN fr USING (tok) CROSS JOIN nt
       |  WHERE ($h) * ($h) * f <= 4194304 * n_total),
       |c AS (SELECT doc_id, tok,
       |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS cpos
       |  FROM kept),
       |fwd AS (SELECT l.tok AS ltok, r.tok AS rtok
       |  FROM c l JOIN c r ON l.doc_id = r.doc_id
       |    AND (r.cpos = l.cpos + 1 OR r.cpos = l.cpos + 2)),
       |sym AS (SELECT ltok AS center, rtok AS context FROM fwd
       |  UNION ALL SELECT rtok AS center, ltok AS context FROM fwd)
       |SELECT center, context, CAST(COUNT(*) AS BIGINT) AS cnt
       |FROM sym GROUP BY center, context
       |ORDER BY cnt DESC, center ASC, context ASC LIMIT 25""".stripMargin
  }

  // ---------------------------------------------------------------- q245

  /** q245 — N-GRAM DIVERSITY per source: the type/token ratio on
    * 3-grams plus the singleton share and the hottest-gram share — the
    * corpus-diversity readout (self-BLEU's integer cousin) a data-mix
    * designer reads next to volume: a source with high token count but
    * collapsing 3-gram diversity is templated/boilerplate text that
    * dedup won't fully catch (q223 finds the hot grams; this scores
    * the DISTRIBUTION). Singleton share estimates the unseen-mass /
    * Good-Turing direction; top-gram share is the degenerate-template
    * alarm.
    *
    * All exact: counts are BIGINTs, shares are e6 floor divisions of
    * non-negative operands (trunc == floor both engines).
    *
    * Scale shape: one explode → ONE map-side-combinable shuffle on the
    * scaling (source, gram) key → a bounded per-source rollup (count/
    * sum/max/conditional-sum over per-gram counts — all combinable).
    * The gram strings never re-sort; no window, no join, two
    * exchanges total, the second over |sources| rows. */
  def q245NgramDiversity(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(s, dir)
      .select(col("source"), expr("split(text, ' ')").as("toks"))
      .filter(expr("size(toks) >= 3"))
      .select(col("source"),
        explode(expr("graft_shingles(toks, 3)")).as("g"))
    grams.groupBy("source", "g").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("n_types"),
        sum("c").cast("bigint").as("n_grams"),
        sum(expr("case when c = 1 then 1 else 0 end")).cast("bigint")
          .as("n_singletons"),
        max("c").cast("bigint").as("top_count"))
      .select(col("source"), col("n_types"), col("n_grams"), col("n_singletons"),
        col("top_count"),
        expr("(1000000 * n_types) div n_grams").cast("bigint").as("ttr_e6"),
        expr("(1000000 * n_singletons) div n_grams").cast("bigint")
          .as("singleton_e6"),
        expr("(1000000 * top_count) div n_grams").cast("bigint").as("top_share_e6"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- q246

  /** Vocabulary size for the q246 coverage audit (a premise constant —
    * production sweeps 32k/64k/128k the same way). */
  private val oovK = 256

  /** q246 — OOV RATE per language under a TOP-K frequency vocabulary:
    * the coverage audit run before freezing any word-level vocabulary
    * (classic word-embedding / softmax-vocab sizing, and the equity
    * twin of q241's fertility — a language whose instance OOV share is
    * 3× pays it in UNK tokens). Reports per language: token instances,
    * instance OOV share, distinct word types, and type OOV share —
    * instances answer "how much text breaks", types answer "how much
    * vocabulary is missing" (they diverge exactly when the missing
    * words are frequent).
    *
    * Determinism: the vocabulary is the top-$oovK$ by (count DESC,
    * token ASC) — a TOTAL order, so the cut is engine-identical; shares
    * are e6 floor divisions on BIGINTs.
    *
    * Scale shape: one token shuffle for global counts; the vocabulary
    * cut is TakeOrderedAndProject (bounded K, never a global sort);
    * per-(lang, word) counts are a second map-side-combinable shuffle;
    * the vocab side joins BROADCAST — justified because K is bounded
    * by the premise, not by data (the q25 probe-set rule); the rollup
    * key is the bounded lang enum. */
  def q246OovRate(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(s, dir)
      .select(col("lang"), explode(expr("split(text, ' ')")).as("w"))
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w")).limit(oovK)
      .select(col("w"), lit(1L).as("in_vocab"))
    val langWord = tok.groupBy("lang", "w")
      .agg(count(lit(1)).cast("bigint").as("cnt"))
    langWord.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("lang")
      .agg(sum("cnt").cast("bigint").as("n_instances"),
        sum(expr("case when in_vocab is null then cnt else 0L end")).cast("bigint")
          .as("n_oov_instances"),
        count(lit(1)).cast("bigint").as("n_types"),
        sum(expr("case when in_vocab is null then 1 else 0 end")).cast("bigint")
          .as("n_oov_types"))
      .select(col("lang"), col("n_instances"), col("n_oov_instances"),
        col("n_types"), col("n_oov_types"),
        expr("(1000000 * n_oov_instances) div n_instances").cast("bigint")
          .as("oov_instance_e6"),
        expr("(1000000 * n_oov_types) div n_types").cast("bigint")
          .as("oov_type_e6"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- q257

  /** q257 — AUDIO ACTIVITY SEGMENTATION (the VAD-shaped pass): per
    * source, block/active-block counts, activity segments, and the
    * longest take, over REAL decoded PCM — each document synthesizes a
    * WAV (deterministic character→amplitude rule, spaces silent),
    * round-trips it through javax.sound's actual encode → decode path,
    * and segments the DECODED samples (multimodal/BinaryPipeline
    * .audioSegments). Because the amplitude rule is integer arithmetic
    * on character codes, the DuckDB twin re-derives every block verdict
    * from the text alone — putting the codec round-trip itself under
    * the hash gate, one level stronger than q29's byte-level checks.
    *
    * Scale shape: the decode is the mapPartitions batch boundary (the
    * multimodal idiom — per-partition codec init, one pass per
    * payload, no shuffle); the rollup is one bounded source aggregate. */
  def q257AudioSegments(s: SparkSession, dir: String): DataFrame =
    graft.multimodal.BinaryPipeline.audioSegments(Tables.documents(s, dir))
      .toDF()
      .groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("n_blocks").cast("bigint").as("n_blocks"),
        sum("n_active_blocks").cast("bigint").as("n_active_blocks"),
        sum("n_segments").cast("bigint").as("n_segments"),
        max("longest_segment").cast("bigint").as("max_longest"))
      .orderBy("source")

  // ---------------------------------------------------------------- q260

  /** q260 — VIDEO SCENE DETECTION (shot boundaries): per source, frame
    * and scene counts plus the longest take, over REAL demuxed Y4M —
    * each document synthesizes a Y4M stream (one 8×8 constant-luma
    * frame per character), runs it through the actual container parser
    * (multimodal/BinaryPipeline.videoScenes), and cuts where
    * consecutive frames' mean luma moves ≥ 8. The video sibling of
    * q257's audio pass, same contract: the luma rule is integer
    * arithmetic on character codes, so the DuckDB twin re-derives
    * every boundary from the text alone — the demux itself is under
    * the hash gate (one corrupted plane shifts a mean and flips a
    * cut). q53 samples frames at a rate; this finds where the cuts
    * are, which is what a frame-sampling curation pass actually wants.
    *
    * Scale shape: mapPartitions batch decode (the multimodal idiom),
    * one bounded source rollup, no shuffle before it. */
  def q260VideoScenes(s: SparkSession, dir: String): DataFrame =
    graft.multimodal.BinaryPipeline.videoScenes(Tables.documents(s, dir))
      .toDF()
      .groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("n_frames").cast("bigint").as("n_frames"),
        sum("n_scenes").cast("bigint").as("n_scenes"),
        max("longest_scene").cast("bigint").as("max_longest"))
      .orderBy("source")

  // ---------------------------------------------------------------- q267

  /** q267 — VOCABULARY-SIZING CURVE: instance coverage and OOV share
    * at K ∈ {64, 128, 256, 512} — the sweep a tokenizer/vocab designer
    * reads before freezing K (q246 reports ONE operating point; sizing
    * decisions come from the knee of this curve). Key identity:
    * coverage at K is Σ of the top-K words' OWN counts, so once the
    * top-512 frame exists (TakeOrderedAndProject — bounded, never a
    * global sort) the whole curve is arithmetic over 512 summary rows;
    * the corpus is scanned once for counts and once for the total,
    * nothing joins back.
    *
    * All exact: counts are BIGINTs, the (count DESC, token ASC) cut is
    * a total order, shares are e6 floor divisions. */
  def q267VocabCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = Tables.documents(s, dir)
      .select(explode(expr("split(text, ' ')")).as("w"))
    // ONE corpus scan carries BOTH products: the per-word counts feed the
    // bounded top-512 cut (TakeOrderedAndProject — every grouped row is
    // examined to find the top-k, so it all flows through the observe
    // point first) while an Observation on the same aggregate sums the
    // counts into the instance total — the r12 form paid a second full
    // scan + aggregate for a number the first job already had in hand.
    // Top-512 to the driver: bounded by the K premise, not data (the
    // q207/q150 bounded-premise-scalar idiom) — a first cut ranked with
    // an unpartitioned row_number, which the straggler sweep rightly
    // flagged (it cannot see the LIMIT bound statically).
    val obs = org.apache.spark.sql.Observation()
    val top = tok.groupBy("w").agg(count(lit(1)).as("c"))
      .observe(obs, sum(col("c")).cast("bigint").as("n_instances"))
      .orderBy(desc("c"), asc("w")).limit(512)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, c) => (-c, w) }
    val nInstances = obs.get("n_instances").asInstanceOf[Long]
    val curve = Seq(64, 128, 256, 512).map { k =>
      (k.toLong, top.take(k).map(_._2).sum)
    }
    curve.toDF("k", "covered_instances")
      .select(col("k"), col("covered_instances"),
        lit(nInstances).cast("bigint").as("n_instances"),
        expr(s"(1000000 * (${nInstances}L - covered_instances)) div " +
          s"greatest(${nInstances}L, 1L)")
          .cast("bigint").as("oov_instance_e6"))
      .orderBy("k")
  }

  // ---------------------------------------------------------------- q273

  /** q273 — TEXT-NORMALIZATION pipeline with an IDEMPOTENCE audit: the
    * canonicalization pass every crawl pipeline runs before
    * fingerprinting (the exact-dedup md5 at DedupQueries.scala:41
    * assumes whitespace-normalized input — this operator is the pass
    * that makes that assumption true corpus-wide). Four ordered rules,
    * each a single codegen'd string function: lowercase → control
    * chars (tab) to space → collapse punctuation runs → collapse
    * whitespace runs + trim. The fixture text is already clean, so —
    * the q60 observability idiom — a deterministic doc_id-derived
    * noise suffix (mixed case, a tab, a variable '!' run, a double
    * space) is appended IDENTICALLY in both engines to make every rule
    * measurable. Reported per source: how many documents each rule
    * changed, exact char mass in/out, the e6-floored shrink share, and
    * the idempotence counter — the chain applied TWICE must fix-point
    * after one pass (n_non_idem is computed honestly from a second
    * application, not assumed zero; a rule ordering that re-exposes
    * work to an earlier rule would surface here).
    *
    * Scale shape: the q60/q27 contract — one narrow scan, a per-row
    * chain of codegen'd string ops (the idempotence re-application
    * doubles the per-row constant, which IS the audit's price), then
    * ONE map-side-combinable aggregate on the bounded source key. No
    * joins, no explode; scan-bound at 100 TB. */
  def q273NormalizationAudit(s: SparkSession, dir: String): DataFrame = {
    def chain(x: String): Seq[String] = {
      val s1 = s"lower($x)"
      val s2 = s"replace($s1, chr(9), ' ')"
      val s3 = s"regexp_replace($s2, '[!]+', '!')"
      val s4 = s"trim(regexp_replace($s3, '  +', ' '))"
      Seq(s1, s2, s3, s4)
    }
    val noisy = "concat(text, ' Mixed', cast(doc_id % 5 as string), 'CASE  ', " +
      "repeat('!', cast(1 + doc_id % 3 as int)), ' end', chr(9), 'tab')"
    val Seq(c1, c2, c3, c4) = chain("raw")
    Tables.documents(s, dir)
      .select(col("source"), expr(noisy).as("raw"))
      .withColumn("s1", expr(c1)).withColumn("s2", expr(c2))
      .withColumn("s3", expr(c3)).withColumn("s4", expr(c4))
      .withColumn("again", expr(chain("s4").last))
      .groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(expr("case when s1 <> raw then 1 else 0 end"))
          .cast("bigint").as("n_case"),
        sum(expr("case when s2 <> s1 then 1 else 0 end"))
          .cast("bigint").as("n_ctrl"),
        sum(expr("case when s3 <> s2 then 1 else 0 end"))
          .cast("bigint").as("n_punct"),
        sum(expr("case when s4 <> s3 then 1 else 0 end"))
          .cast("bigint").as("n_ws"),
        sum(expr("length(raw)")).cast("bigint").as("chars_in"),
        sum(expr("length(s4)")).cast("bigint").as("chars_out"),
        sum(expr("case when again <> s4 then 1 else 0 end"))
          .cast("bigint").as("n_non_idem"))
      .withColumn("shrink_e6",
        expr("(1000000 * (chars_in - chars_out)) div chars_in").cast("bigint"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- q283

  /** q283 — ZIPF MASS PROFILE: the rank-frequency structure of the
    * corpus vocabulary on the exact integer lattice. Tokens rank
    * globally under (count DESC, token ASC); ranks bucket by binary
    * magnitude — bucket = len(bin(rank)) = ⌊log₂ rank⌋ + 1, an INTEGER
    * log with identical semantics in both engines (no float log2,
    * whose libm rounding at exact powers of two differs) — and each
    * doubling bucket reports its token count, token mass, e6 mass
    * share, and cumulative share. Under a Zipf-1 law every doubling
    * bucket carries roughly constant mass, so the profile reads as a
    * flatness test: a head-heavy corpus (templates, boilerplate)
    * spikes the first buckets, a tail-heavy one (OCR noise, unique
    * junk tokens) inflates the last — the corpus-health companion to
    * q245's n-gram diversity and q246's OOV rate.
    *
    * Scale shape: one token explode into the map-side-combinable
    * vocab count; the global rank is the q266 TWO-PHASE discipline —
    * offsets from the count-of-counts frame (bounded by distinct
    * count VALUES, not vocab size) via a cumulative window over that
    * bounded frame, intra-bucket row_number partitioned by count —
    * never a single-partition sort of the scaling vocab frame. The
    * bucket rollup is ≤ 64 rows by construction. */
  def q283ZipfProfile(s: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(s, dir)
      .select(explode(expr("split(text, ' ')")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast("bigint").as("cnt"))
      .withColumn("vb", expr("cnt div 4"))
    // count-bucket grid vb = cnt÷4 aligns with the (cnt DESC, tok)
    // order: vb₁ > vb₂ ⟹ every vb₁ count exceeds every vb₂ count, so
    // bucket offsets + intra-bucket row_number IS the global rank
    val wOff = Window.orderBy(desc("vb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = vocab.groupBy("vb").agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum("bc").over(wOff), lit(0L)))
      .select("vb", "off")
    val wIntra = Window.partitionBy("vb").orderBy(desc("cnt"), asc("tok"))
    val ranked = vocab.join(offs, Seq("vb"))
      .withColumn("rank", col("off") + row_number().over(wIntra))
    val tot = ranked.agg(sum("cnt").cast("bigint").as("n_total"))
    val wCum = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .withColumn("bucket", expr("cast(length(bin(rank)) as int)"))
      .groupBy("bucket")
      .agg(count(lit(1)).cast("bigint").as("n_ranks"),
        sum("cnt").cast("bigint").as("mass"))
      .crossJoin(broadcast(tot))
      .withColumn("share_e6",
        expr("(1000000 * mass) div n_total").cast("bigint"))
      .withColumn("cum_mass", sum("mass").over(wCum))
      .withColumn("cum_share_e6",
        expr("(1000000 * cum_mass) div n_total").cast("bigint"))
      .select("bucket", "n_ranks", "mass", "share_e6", "cum_share_e6")
      .orderBy("bucket")
  }

  // ---------------------------------------------------------------- q290

  /** q290 — TEMPLATE CENSUS: boilerplate at the DOCUMENT-OPENING grain.
    * Web templates, license headers, and generated pages share their
    * first words verbatim even when bodies diverge — below q21's
    * exact-dup bar and orthogonal to q223's corpus-wide trigram DF.
    * Key = the exact leading 4-token prefix; any key with ≥ 2 documents
    * is a template family. Top 20 families by population (key ASC
    * tiebreak, a total order), each with its document count, source
    * and language spread, and token mass — the remove-list a template
    * strip pass consumes.
    *
    * Scale shape: a row-local codegen'd prefix projection, one
    * map-side-combinable groupBy on the prefix key, TakeOrderedAndProject
    * for the presentation cut (the q41 idiom). The two COUNT(DISTINCT)s
    * run two-phase on the (key, source/lang) lattice inside one
    * aggregate — never a document-level window. */
  def q290TemplateCensus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), col("lang"),
        expr("split(text, ' ')").as("toks"))
      .filter(expr("size(toks) >= 4"))
      .select(col("source"), col("lang"),
        expr("concat_ws(' ', slice(toks, 1, 4))").as("template_key"),
        expr("cast(size(toks) as bigint)").as("ntok"))
      .groupBy("template_key")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        countDistinct("source").cast("bigint").as("n_sources"),
        countDistinct("lang").cast("bigint").as("n_langs"),
        sum("ntok").cast("bigint").as("tokens"))
      .filter(col("n_docs") >= 2)
      .orderBy(desc("n_docs"), asc("template_key"))
      .limit(20)

  // ---------------------------------------------------------------- q292

  /** q292 — WORDPIECE ENCODE (Schuster & Nakajima 2012's greedy
    * maximal-munch, the BPE-encode alternative q144 doesn't cover):
    * every word is segmented left-to-right, at each position taking
    * the LONGEST matching piece from a trained vocabulary — here the
    * top-16 character trigrams and top-16 bigrams of the corpus's own
    * words (exact counts, (count DESC, gram ASC) total order), single
    * characters as the implicit fallback alphabet. Per source: word,
    * character and piece masses, pieces-per-word fertility, and
    * characters-per-piece compression — q241's fertility readout for
    * the second tokenizer family, so the two algorithms are directly
    * comparable on the same corpus.
    *
    * The segmenter is ONE fold, not a joined DP: aggregate() walks the
    * word's positions with a (skip, tok) struct accumulator — a
    * position inside a matched piece decrements skip, a boundary
    * position takes the longest vocab hit (3 > 2 > 1) and bumps the
    * piece count. Strictly row-local, O(|word|) per word, and run once
    * per DISTINCT word (the q318 family's Sennrich discipline), joined
    * back to per-(source, word) instance counts.
    *
    * Scale shape: ONE corpus scan collapses to the staged
    * (source, word, count) frame; gram training explodes distinct words
    * weighted by corpus count (two map-side-combinable sums with
    * TakeOrderedAndProject cuts); the trained piece table is bounded
    * (32 rows → one 1-ROW ARRAY frame) and rides a broadcast cross join
    * INTO the fold's lambda as a plain column — no driver collect, no
    * literal splice. */
  def q292WordpieceEncode(s: SparkSession, dir: String): DataFrame = {
    // Round-15 optimization (guide §1.2 step 1, §2.3): every stage now
    // rides the DISTINCT-word frame — the q318 family's Sennrich
    // discipline, which this query predated. One corpus scan collapses
    // instances to per-(source, word) counts (map-side combined); gram
    // training explodes each distinct word ONCE weighted by its corpus
    // count (sum(cw) == the per-instance count exactly, since gram
    // occurrences are additive over instances), and the maximal-munch
    // fold runs once per distinct word instead of once per instance —
    // Zipf makes the distinct frame sublinear in corpus mass. Counts,
    // vocab, and per-source sums are bit-identical to the per-instance
    // form; the oracle is unchanged. Measured at sf0.1: 3.82 s → see
    // OPTIMIZATION_r15.md (plan: 3 corpus scans → 1).
    val wc = Tables.documents(s, dir)
      .select(col("source"), explode(expr("split(text, ' ')")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("source", "w").agg(count(lit(1)).as("ni"))
    val ck = graft.Staging.fresh("wpwords")
    wc.write.mode("overwrite").parquet(s"$ck/wc")
    val wcS = s.read.parquet(s"$ck/wc")
    val cw = wcS.groupBy("w").agg(sum("ni").as("cw"))
    def topGrams(n: Int, k: Int): DataFrame = cw
      .filter(length(col("w")) >= n)
      .select(col("cw"), explode(expr(
        s"transform(sequence(1, length(w) - ${n - 1}), i -> substring(w, i, $n))"))
        .as("g"))
      .groupBy("g").agg(sum("cw").as("cnt"))
      .orderBy(desc("cnt"), asc("g")).limit(k)
    val vocab = topGrams(3, 16).agg(expr("collect_list(g)").as("v3"))
      .crossJoin(topGrams(2, 16).agg(expr("collect_list(g)").as("v2")))
    val seg = cw.crossJoin(broadcast(vocab))
      .withColumn("pieces", expr(
        "aggregate(sequence(1, length(w)), named_struct('skip', 0, 'tok', 0L), " +
          "(acc, i) -> case " +
          "when acc.skip > 0 then named_struct('skip', acc.skip - 1, 'tok', acc.tok) " +
          "when array_contains(v3, substring(w, i, 3)) then named_struct('skip', 2, 'tok', acc.tok + 1L) " +
          "when array_contains(v2, substring(w, i, 2)) then named_struct('skip', 1, 'tok', acc.tok + 1L) " +
          "else named_struct('skip', 0, 'tok', acc.tok + 1L) end, " +
          "acc -> acc.tok)"))
      .select("w", "pieces")
    wcS.join(seg, "w")
      .groupBy("source")
      .agg(sum("ni").cast("bigint").as("n_words"),
        sum(expr("ni * cast(length(w) as bigint)")).cast("bigint").as("n_chars"),
        sum(expr("ni * pieces")).cast("bigint").as("n_pieces"))
      .withColumn("fertility_e6",
        expr("(1000000 * n_pieces) div n_words").cast("bigint"))
      .withColumn("chars_per_piece_e6",
        expr("(1000000 * n_chars) div greatest(n_pieces, 1)").cast("bigint"))
      .orderBy("source")
  }

  /** q296 — CODE-SWITCHING (mixed-language document) detection: chunk each
    * document into complete 16-token windows, language-ID each chunk with
    * the q27 stopword heuristic (≥ 2 English stopword hits → 'en' chunk),
    * and flag a document as code-switched when BOTH chunk classes appear
    * and the minority class holds ≥ 25% of chunks — the per-segment form
    * of langID every multilingual corpus pipeline runs, because
    * document-level language labels hide bilingual documents that poison
    * monolingual training mixes. Per labeled language: document count,
    * mixed count, mixed share (exact e6 integer).
    *
    * Scale shape: one corpus scan; the chunk fanout is bounded by
    * length/16 and collapses through two partial-aggregating groupBys
    * (doc, then lang) — the exchanges carry per-document counters and a
    * bounded language rollup, never token rows. */
  def q296CodeSwitching(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", expr("split(text, ' ')"))
      .withColumn("nc", expr("size(toks) div 16"))
      .filter(col("nc") >= 2)
      .withColumn("ci", explode(expr("sequence(0L, nc - 1L)")))
      .withColumn("is_en", expr(
        "case when size(filter(slice(toks, cast(ci * 16 + 1 as int), 16), " +
          "t -> t = 'the' or t = 'a' or t = 'of' or t = 'and' or t = 'to')) >= 2 " +
          "then 1L else 0L end"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("chunks"), sum("is_en").as("enc"))
      .withColumn("mixed", expr(
        "case when enc >= 1 and chunks - enc >= 1 " +
          "and 4 * least(enc, chunks - enc) >= chunks then 1L else 0L end"))
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("mixed").cast("bigint").as("n_mixed"))
      .withColumn("mixed_e6", expr("(1000000 * n_mixed) div n_docs").cast("bigint"))
      .orderBy("lang")

  // ---------------------------------------------------------------- q318

  /** q318 — UNIGRAM-LM VITERBI SEGMENTATION (the Kudo 2018 tokenizer
    * family's decode step), the third tokenizer next to BPE (q54/q144)
    * and greedy WordPiece (q292), run head-to-head against the greedy
    * walk over the SAME trained vocabulary so the output states the
    * greedy-vs-optimal fertility gap directly. The vocabulary is q292's
    * (top-16 trigrams + top-16 bigrams by exact count, every corpus
    * character as the fallback alphabet), each piece scored with an
    * integer-lattice log-probability — `1000 * (bitlen(count) -
    * bitlen(total_mass))` via `length(bin(x))`, the cross-engine-exact
    * floor-log2 q283 already leans on — and each word segmented by the
    * DP that MAXIMIZES the segmentation's total score (ties resolved to
    * fewest pieces; the readout is score/piece-count aggregates, on
    * which any remaining tie is value-identical).
    *
    * The DP is ONE row-local fold, not a joined DP: pieces are at most
    * 3 characters, so the Viterbi frontier is the last three dp entries
    * — a bounded (score, pieces) × 3 struct accumulator that
    * aggregate() slides across the word's positions, probing the three
    * broadcast piece maps per step. O(|word|) per word, zero shuffles
    * beyond the bounded vocab aggregates.
    *
    * Scale shape: segmentation runs once per DISTINCT word (Zipf makes
    * that sublinear in corpus mass — the q292-oracle/Sennrich
    * discipline, here on the engine side too) and joins back to
    * per-(source, word) instance counts, so the exchanges carry the
    * distinct-word frame and bounded per-source aggregates, never
    * per-instance pieces; the 33-entry-plus-alphabet vocab rides one
    * broadcast as three map columns. */
  /** The word stream of a documents frame, as the unigram-tokenizer
    * family (q318–q321) trains and segments over it. */
  private def wordsOf(docs: DataFrame): DataFrame =
    docs.select(col("source"), explode(expr("split(text, ' ')")).as("w"))
      .filter(length(col("w")) >= 1)

  /** The corpus word stream the unigram-tokenizer family trains and
    * segments over. */
  private def unigramWords(s: SparkSession, dir: String): DataFrame =
    wordsOf(Tables.documents(s, dir))

  /** FULL (uncut) gram-count table per piece length — the additive
    * training statistic q321 maintains incrementally. Bounded by the
    * corpus's distinct 1/2/3-grams (alphabet-cubed at worst), never by
    * corpus mass. ONE scan, and (round-15) the occurrence counting runs
    * row-locally per document in the compiled `graft_gramcounts` loop —
    * only each document's distinct (g, k) entries reach the explode and
    * the aggregate (map-side combine pushed inside the row; the HOF
    * explode paid one interpreted lambda + boxed struct per gram
    * occurrence). sum(cnt) equals the exploded per-occurrence count
    * exactly; q322's stream shares the operator. */
  private def fullGramCounts(docs: DataFrame): DataFrame =
    docs.select(explode(expr("graft_gramcounts(text)")).as("gk"))
      .groupBy(col("gk.g").as("g"), col("gk.k").as("k"))
      .agg(sum(col("gk.cnt")).as("cnt"))

  /** q292's vocabulary with counts and integer-lattice scores kept: one
    * row per piece (g, cnt, k = piece length, lp) — top-16 trigrams +
    * top-16 bigrams by exact count, every corpus character as the
    * fallback alphabet. lp is exact on the integer lattice:
    * length(bin(x)) = floor(log2 x)+1, so lp = 1000 * (bitlen(count) -
    * bitlen(total_mass)). */
  /** The corpus's FULL gram-count table, staged durably — the one
    * corpus-scale pass the whole unigram family derives from. Staging
    * it (rather than recomputing inside vocabOfCounts) matters doubly:
    * the cut/total branches replicate their input subtree in the plan,
    * so an unstaged count would re-run the corpus aggregation per
    * branch (measured 1.4 → 3.5 s on q318 when this briefly regressed),
    * while the staged leaf is gram-table-sized. */
  private def fullCountsStaged(s: SparkSession, dir: String): DataFrame = {
    val pth = unigramFullCache.computeIfAbsent(
      graft.CorpusKey(dir, "documents.parquet"), _ =>
        graft.etl.Layouts.stage(s, "ugcnts", "v1", dir, Seq("documents")) { ck =>
          fullGramCounts(Tables.documents(s, dir))
            .write.mode("overwrite").parquet(s"$ck/cnts")
          s"$ck/cnts"
        })
    s.read.parquet(pth)
  }

  private def unigramGrams(s: SparkSession, dir: String): DataFrame =
    vocabOfCounts(fullCountsStaged(s, dir)).withColumnRenamed("lp_e3", "lp")

  /** The piece table folded to one row of three lookup maps (by piece
    * length), the shape the segmentation folds probe per position. */
  private def unigramMaps(grams: DataFrame): DataFrame =
    grams.agg(
      expr("map_from_entries(collect_list(case when k = 1 then struct(g, lp) end))").as("m1"),
      expr("map_from_entries(collect_list(case when k = 2 then struct(g, lp) end))").as("m2"),
      expr("map_from_entries(collect_list(case when k = 3 then struct(g, lp) end))").as("m3"))

  /** The (score, pieces) Viterbi fold q318 and q320's re-decode share:
    * dp[i] = best entry over the three piece lengths ending at position
    * i; the accumulator carries dp[i-1], dp[i-2], dp[i-3]. Sentinels: an
    * invalid origin scores -1e15 (never beats a real path — cs1 is
    * always real, every character is in m1 by construction), and a
    * non-winning candidate contributes 1e15 pieces to the LEAST. */
  private def viterbiScoreFoldSql: String = {
    val neg = "-1000000000000000L"
    val big = "1000000000000000L"
    val cs1 = "acc.s1 + element_at(m1, substring(w, i, 1))"
    val cs2 = "case when i >= 2 and element_at(m2, substring(w, i - 1, 2)) is not null " +
      s"then acc.s2 + element_at(m2, substring(w, i - 1, 2)) else $neg end"
    val cs3 = "case when i >= 3 and element_at(m3, substring(w, i - 2, 3)) is not null " +
      s"then acc.s3 + element_at(m3, substring(w, i - 2, 3)) else $neg end"
    val best = s"greatest($cs1, $cs2, $cs3)"
    s"""aggregate(sequence(1, length(w)),
       |  named_struct('s1', 0L, 'n1', 0L, 's2', $neg, 'n2', 0L, 's3', $neg, 'n3', 0L),
       |  (acc, i) -> named_struct(
       |    's1', $best,
       |    'n1', least(
       |      case when ($cs1) = ($best) then acc.n1 + 1L else $big end,
       |      case when ($cs2) = ($best) then acc.n2 + 1L else $big end,
       |      case when ($cs3) = ($best) then acc.n3 + 1L else $big end),
       |    's2', acc.s1, 'n2', acc.n1, 's3', acc.s2, 'n3', acc.n2),
       |  acc -> named_struct('score', acc.s1, 'pieces', acc.n1))""".stripMargin
  }

  def q318UnigramViterbi(s: SparkSession, dir: String): DataFrame = {
    val words = unigramWords(s, dir)
    val vocab = unigramMaps(unigramGrams(s, dir))
    val seg = words.select("w").distinct()
      .crossJoin(broadcast(vocab))
      .withColumn("dp", expr(viterbiScoreFoldSql))
      // q292's greedy maximal-munch over the same vocabulary, for the gap
      .withColumn("gpieces", expr(
        "aggregate(sequence(1, length(w)), named_struct('skip', 0, 'tok', 0L), " +
          "(acc, i) -> case " +
          "when acc.skip > 0 then named_struct('skip', acc.skip - 1, 'tok', acc.tok) " +
          "when element_at(m3, substring(w, i, 3)) is not null then named_struct('skip', 2, 'tok', acc.tok + 1L) " +
          "when element_at(m2, substring(w, i, 2)) is not null then named_struct('skip', 1, 'tok', acc.tok + 1L) " +
          "else named_struct('skip', 0, 'tok', acc.tok + 1L) end, " +
          "acc -> acc.tok)"))
      .select("w", "dp", "gpieces")
    words.groupBy("source", "w").agg(count(lit(1)).as("ni"))
      .join(seg, "w")
      .groupBy("source")
      .agg(sum("ni").cast("bigint").as("n_words"),
        sum(expr("ni * cast(length(w) as bigint)")).cast("bigint").as("n_chars"),
        sum(expr("ni * gpieces")).cast("bigint").as("greedy_pieces"),
        sum(expr("ni * dp.pieces")).cast("bigint").as("viterbi_pieces"),
        sum(expr("ni * dp.score")).cast("bigint").as("score_e3"))
      .withColumn("greedy_fertility_e6",
        expr("(1000000 * greedy_pieces) div n_words").cast("bigint"))
      .withColumn("viterbi_fertility_e6",
        expr("(1000000 * viterbi_pieces) div n_words").cast("bigint"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- q319

  /** q319 — one VITERBI (hard-EM) RE-ESTIMATION ROUND for the unigram
    * tokenizer (Kudo 2018's trainer in its deterministic hard-EM form),
    * completing train+decode for the third tokenizer family the way
    * q98→q144 does for BPE: the E-step segments every distinct word
    * under q318's count-based scores and counts which vocabulary pieces
    * the optimal segmentations actually USE (weighted by corpus
    * instance counts); the M-step re-scores each piece from its usage
    * mass on the same integer floor-log2 lattice and marks never-used
    * pieces PRUNED — exactly the evidence SentencePiece's trainer
    * prunes on. Output: the full re-estimated vocabulary (piece, piece
    * length, training count, old score, usage, pruned flag, new score).
    *
    * The E-step fold is q318's bounded 3-entry Viterbi frontier
    * carrying one extra field — the winning PATH as a piece-length
    * string — with ties resolved (max score, then fewest pieces, then
    * shortest last piece) via an array_sort comparator over the three
    * candidate structs, a total order both engines implement
    * identically. The path then explodes relationally (posexplode +
    * per-word running offset), never via a lambda re-probing the word.
    *
    * Scale shape: segmentation and path explode run once per DISTINCT
    * word; usage aggregation collapses to the bounded vocabulary before
    * the single broadcast of the usage-mass total; every exchange
    * carries distinct-word rows or vocab-sized summaries. */
  /** The path-carrying Viterbi fold (q319/q320's E-step): q318's
    * frontier widened with the winning PATH as a piece-length string.
    * Tie order: score DESC, pieces ASC, piece length ASC — the last key
    * makes the winning path deterministic, not just (score, n) — via an
    * array_sort comparator over the three candidate structs. */
  private def viterbiPathFoldSql: String = {
    val neg = "-1000000000000000L"
    def cand(k: Int, origin: String) = {
      val (sc, n, p) = (s"acc.s$origin", s"acc.n$origin", s"acc.p$origin")
      val piece = k match {
        case 1 => "substring(w, i, 1)"
        case 2 => "substring(w, i - 1, 2)"
        case 3 => "substring(w, i - 2, 3)"
      }
      val score =
        if (k == 1) s"$sc + element_at(m1, $piece)"
        else s"case when i >= $k and element_at(m$k, $piece) is not null " +
          s"then $sc + element_at(m$k, $piece) else $neg end"
      s"named_struct('s', $score, 'n', $n + 1L, 'k', $k, 'p', concat($p, '$k,'))"
    }
    val win = s"element_at(array_sort(array(${cand(1, "1")}, ${cand(2, "2")}, ${cand(3, "3")}), " +
      "(x, y) -> case when x.s > y.s then -1 when x.s < y.s then 1 " +
      "when x.n < y.n then -1 when x.n > y.n then 1 " +
      "when x.k < y.k then -1 when x.k > y.k then 1 else 0 end), 1)"
    s"""aggregate(sequence(1, length(w)),
       |  named_struct('s1', 0L, 'n1', 0L, 'p1', '',
       |    's2', $neg, 'n2', 0L, 'p2', '', 's3', $neg, 'n3', 0L, 'p3', ''),
       |  (acc, i) -> named_struct(
       |    's1', ($win).s, 'n1', ($win).n, 'p1', ($win).p,
       |    's2', acc.s1, 'n2', acc.n1, 'p2', acc.p1,
       |    's3', acc.s2, 'n3', acc.n2, 'p3', acc.p2),
       |  acc -> named_struct('score', acc.s1, 'pieces', acc.n1, 'p', acc.p1))""".stripMargin
  }

  /** E-step over the distinct-word frame: each word's corpus instance
    * count plus its optimal segmentation under `maps` (score, pieces,
    * path). */
  private def unigramSegmented(words: DataFrame, maps: DataFrame): DataFrame =
    words.groupBy("w").agg(count(lit(1)).as("cw"))
      .crossJoin(broadcast(maps))
      .withColumn("dp", expr(viterbiPathFoldSql))
      .select("w", "cw", "dp")

  /** The corpus's E-step, staged: a deterministic function of the
    * corpus, so it is a once-per-corpus index build shared by q319 and
    * q320 — the same discipline as the trained BPE rules above. */
  private def stagedSegmented(s: SparkSession, dir: String): DataFrame = {
    val pth = unigramSegCache.computeIfAbsent(
      graft.CorpusKey(dir, "documents.parquet"), _ =>
        // the version pins the vocabulary geometry (the top-16 cut):
        // changing the cut must miss this attach check, or q319/q320
        // would serve an E-step computed under the old vocabulary
        graft.etl.Layouts.stage(s, "ugseg", "v1;top=16", dir, Seq("documents")) { ck =>
          val words = unigramWords(s, dir)
          unigramSegmented(words, unigramMaps(unigramGrams(s, dir)))
            .write.mode("overwrite").parquet(s"$ck/seg")
          s"$ck/seg"
        })
    s.read.parquet(pth)
  }

  /** Weighted piece-usage counts from the segmented frame: the winning
    * paths explode relationally (posexplode + per-word running offset),
    * never via a lambda re-probing the word. */
  private def usageOf(seg: DataFrame): DataFrame = {
    val wOff = Window.partitionBy("w").orderBy("j")
      .rowsBetween(Window.unboundedPreceding, -1)
    seg
      .select(col("w"), col("cw"),
        posexplode(expr("filter(split(dp.p, ','), x -> x <> '')")).as(Seq("j", "kl")))
      .withColumn("kli", col("kl").cast("int"))
      .withColumn("off", coalesce(sum("kli").over(wOff), lit(0)) + lit(1))
      .select(expr("substring(w, off, kli)").as("g"), col("cw"))
      .groupBy("g").agg(sum("cw").as("usage"))
  }

  def q319UnigramEm(s: SparkSession, dir: String): DataFrame = {
    val grams = unigramGrams(s, dir)
    val usage = usageOf(stagedSegmented(s, dir))
    val uTot = usage.agg(sum("usage").as("u"))
    grams.join(usage, Seq("g"), "left")
      .crossJoin(broadcast(uTot))
      .select(col("g"), col("k").cast("int").as("k"),
        col("cnt").cast("bigint").as("cnt"),
        col("lp").cast("bigint").as("lp0_e3"),
        coalesce(col("usage"), lit(0L)).cast("bigint").as("usage"),
        col("u"))
      .withColumn("pruned", expr("case when usage = 0 then 1 else 0 end").cast("int"))
      .withColumn("lp1_e3", expr(
        "case when usage > 0 then cast(1000 * (length(bin(usage)) - length(bin(u))) as bigint) else 0L end"))
      .drop("u")
      .orderBy("k", "g")
  }

  // ---------------------------------------------------------------- q320

  /** q320 — the EM CONVERGENCE READOUT: re-decode the corpus under
    * q319's re-estimated scores and state, per source, what the
    * training round actually bought — pieces/fertility before vs after,
    * and each model's own total score. The round-2 vocabulary keeps
    * every CHARACTER regardless of usage (the coverage guarantee
    * SentencePiece's trainer enforces — pruning a character could leave
    * a word unsegmentable) with a Laplace floor count of 1 for unused
    * characters; multi-character pieces survive only with usage > 0,
    * exactly q319's prune verdict. The two score columns are each
    * model's objective over its own parameters (the masses differ), so
    * the cross-round comparable is fertility; score1 vs score0 states
    * how much probability mass the re-estimated model concentrates on
    * the corpus it was fit to.
    *
    * Scale shape: two bounded-frontier folds over the distinct-word
    * frame (round 0 with paths for usage, round 1 score-only), one
    * vocab-sized usage aggregate between them, and per-source sums —
    * the q318/q319 exchanges, twice. */
  def q320UnigramEmEval(s: SparkSession, dir: String): DataFrame = {
    val words = unigramWords(s, dir)
    val grams = unigramGrams(s, dir)
    val seg0 = stagedSegmented(s, dir)
    val usage = usageOf(seg0)
    val uTot = usage.agg(sum("usage").as("u"))
    val vocab1 = grams.join(usage, Seq("g"), "left")
      .filter(col("k") === 1 || coalesce(col("usage"), lit(0L)) > 0)
      .withColumn("u1", greatest(coalesce(col("usage"), lit(0L)), lit(1L)))
      .crossJoin(broadcast(uTot))
      .withColumn("lp", expr(
        "cast(1000 * (length(bin(u1)) - length(bin(u))) as bigint)"))
      .select("g", "k", "lp")
    val seg1 = words.select("w").distinct()
      .crossJoin(broadcast(unigramMaps(vocab1)))
      .withColumn("dp1", expr(viterbiScoreFoldSql))
      .select("w", "dp1")
    words.groupBy("source", "w").agg(count(lit(1)).as("ni"))
      .join(seg0.select(col("w"), col("dp")), "w")
      .join(seg1, "w")
      .groupBy("source")
      .agg(sum("ni").cast("bigint").as("n_words"),
        sum(expr("ni * dp.pieces")).cast("bigint").as("pieces0"),
        sum(expr("ni * dp1.pieces")).cast("bigint").as("pieces1"),
        sum(expr("ni * dp.score")).cast("bigint").as("score0_e3"),
        sum(expr("ni * dp1.score")).cast("bigint").as("score1_e3"))
      .withColumn("fertility0_e6",
        expr("(1000000 * pieces0) div n_words").cast("bigint"))
      .withColumn("fertility1_e6",
        expr("(1000000 * pieces1) div n_words").cast("bigint"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- q321

  /** q321 — INCREMENTAL maintenance of the unigram trainer's statistics,
    * extending the standing-index family (q311 LSH, q308 IVF, q312 PQ,
    * q313 fuzzy pairs, q314 substring, q317 image hashes) to tokenizer
    * training: the standing corpus's (doc_id % 10 != 7) FULL gram-count
    * table is a durable staged index; this week's batch (% 10 == 7)
    * counts only its OWN grams and adds. Counts are exactly additive, so
    * the maintenance is lossless BY CONSTRUCTION — and because the
    * staged table is the full count table (bounded by distinct grams,
    * not corpus mass), a gram that crosses into the top-16 cut only
    * because of delta mass is cut correctly, the case that silently
    * breaks any "stage only the kept vocabulary" shortcut (pinned in
    * UnigramViterbiSpec). Output = the trained vocabulary (g, k, cnt,
    * lp) over base+delta, answering to the full-rebuild oracle.
    *
    * Scale shape: recurring cost is counting the DELTA's grams plus a
    * vocab-bounded merge/cut/re-score — the standing corpus is touched
    * only through its gram table; at 100 TB with a daily batch the
    * trainer's statistics update at delta cost like every other
    * standing index. */
  def q321UnigramIncremental(s: SparkSession, dir: String): DataFrame = {
    val pth = unigramBaseCache.computeIfAbsent(
      graft.CorpusKey(dir, "documents.parquet"), _ =>
        graft.etl.Layouts.stage(s, "uggrams", "v1;mod=7", dir, Seq("documents")) { ck =>
          fullGramCounts(
              Tables.documents(s, dir).filter(col("doc_id") % 10 =!= 7))
            .write.mode("overwrite").parquet(s"$ck/grams")
          s"$ck/grams"
        })
    // the merged table lands in a staging leaf ONCE (the q311 eager
    // staging-write discipline): the cut branches and the total then read
    // a vocab-bounded parquet instead of re-deriving the delta count per
    // branch — the returned plan scans raw documents ZERO times
    // (PlanShapeSpec), the delta paying its single scan here
    val merged = graft.Staging.fresh("ugmerged")
    s.read.parquet(pth)
      .unionByName(fullGramCounts(
        Tables.documents(s, dir).filter(col("doc_id") % 10 === 7)))
      .groupBy("g", "k").agg(sum("cnt").as("cnt"))
      .write.mode("overwrite").parquet(merged)
    vocabOfCounts(s.read.parquet(merged))
  }

  /** The vocab-bounded cut + floor-log2 re-score over a full gram-count
    * frame (g, k, cnt) — q321's tail, shared with the stream-maintained
    * counts (q322). */
  private[graft] def vocabOfCounts(merged: DataFrame): DataFrame = {
    def cutTop(k: Int): DataFrame = {
      val f = merged.filter(col("k") === k)
      if (k == 1) f else f.orderBy(desc("cnt"), asc("g")).limit(16)
    }
    val kept = cutTop(1).unionByName(cutTop(2)).unionByName(cutTop(3))
    val tot = kept.agg(sum("cnt").as("t"))
    kept.crossJoin(broadcast(tot))
      .select(col("g"), col("k").cast("int").as("k"),
        col("cnt").cast("bigint").as("cnt"),
        expr("cast(1000 * (length(bin(cnt)) - length(bin(t))) as bigint)").as("lp_e3"))
      .orderBy("k", "g")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q321_unigram_incremental" -> (q321UnigramIncremental _),
    "q320_unigram_em_eval" -> (q320UnigramEmEval _),
    "q319_unigram_em" -> (q319UnigramEm _),
    "q318_unigram_viterbi" -> (q318UnigramViterbi _),
    "q296_code_switching" -> (q296CodeSwitching _),
    "q283_zipf_profile" -> (q283ZipfProfile _),
    "q292_wordpiece_encode" -> (q292WordpieceEncode _),
    "q290_template_census" -> (q290TemplateCensus _),
    "q273_normalization_audit" -> (q273NormalizationAudit _),
    "q267_vocab_curve" -> (q267VocabCurve _),
    "q260_video_scenes" -> (q260VideoScenes _),
    "q257_audio_segments" -> (q257AudioSegments _),
    "q245_ngram_diversity" -> (q245NgramDiversity _),
    "q246_oov_rate" -> (q246OovRate _),
    "q234_skipgram_pairs" -> (q234SkipgramPairs _),
    "q221_textrank" -> (q221Textrank _),
    "q131_regex_suite" -> (q131RegexSuite _),
    "q127_array_suite" -> (q127ArraySuite _),
    "q104_phrase_search" -> (q104PhraseSearch _),
    "q27_text_stats" -> (q27TextStats _),
    "q73_chunking" -> (q73Chunking _),
    "q74_bpe_merges" -> (q74BpeMerges _),
    "q54_bpe_tokens" -> (q54BpeTokens _),
    "q55_stratified_sample" -> (q55StratifiedSample _),
    "q29_multimodal_binary" -> (q29MultimodalBinary _),
    "q41_vocabulary" -> (q41Vocabulary _),
    "q53_frame_sample" -> (q53FrameSample _),
    "q48_string_suite" -> (q48StringSuite _),
    "q60_pii_scrub" -> (q60PiiScrub _),
    "q61_repetition_ratio" -> (q61RepetitionRatio _),
    "q91_winnowing" -> (q91Winnowing _),
    "q98_bpe_train" -> (q98BpeTrain _),
    "q144_bpe_encode" -> (q144BpeEncode _),
    "q163_pmi_collocations" -> (q163PmiCollocations _),
    "q241_tokenizer_fertility" -> (q241TokenizerFertility _),
  )

  /** The leftmost-non-overlapping merge rewrite in DuckDB SQL — the
    * separator-widening replace chain, over columns `t` and `pair`. */
  private val bpeMergeT =
    "trim(replace(replace(' ' || replace(t, ' ', '  ') || ' ', " +
      "' ' || replace(pair, ' ', '  ') || ' ', " +
      "' ' || replace(pair, ' ', '') || ' '), '  ', ' '))"

  /** Unrolled BPE training CTE chain (w0 → per-round top-pair t_r →
    * merged frame w_r → post-merge count s_r), mirroring
    * [[bpeTrainRounds]] construction for construction. Shared by the
    * q98 (training output) and q144 (encode) oracles. */
  private def bpeTrainCtes(rounds: Int): String = {
    val body = (1 to rounds).map { r =>
      s"""p$r AS (SELECT arr[i] || ' ' || arr[i + 1] AS pair
         |  FROM (SELECT string_split(t, ' ') AS arr FROM w${r - 1}) sp$r,
         |    unnest(generate_series(1, len(arr) - 1)) AS u(i)
         |  WHERE len(arr) >= 2),
         |t$r AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM p$r
         |  GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 1),
         |w$r AS (SELECT $bpeMergeT AS t FROM w${r - 1} CROSS JOIN t$r),
         |s$r AS (SELECT CAST(SUM(len(string_split(t, ' '))) AS BIGINT) AS n FROM w$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""w0 AS (SELECT array_to_string(list_transform(generate_series(1, length(w)),
       |    i -> substr(w, i, 1)), ' ') AS t
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) ww
       |  WHERE length(w) >= 1),
       |$body""".stripMargin
  }

  private def q98Oracle: String = {
    val sel = (1 to 3).map { r =>
      s"SELECT CAST($r AS INTEGER) AS round, pair, replace(pair, ' ', '') AS merged, " +
        s"cnt, (SELECT n FROM s$r) AS n_tokens_after FROM t$r"
    }.mkString("\nUNION ALL\n")
    s"""WITH ${bpeTrainCtes(3)},
       |x AS (SELECT 1)
       |$sel
       |ORDER BY round""".stripMargin
  }

  /** q144 oracle: re-derive the 3 trained rules (the shared chain), then
    * encode the doc_id < 200 slice — merge chain applied once per
    * DISTINCT word, instance ⋈ vocabulary join for per-doc counts,
    * mirroring [[q144BpeEncode]]'s topology as well as its values. */
  /** The 3-rule merge chain over accumulated expression `t`, the rule
    * columns disambiguated as t$r.pair — shared by q144/q241 oracles. */
  private val bpeMergeChain3: String =
    (1 to 3).foldLeft("t") { (acc, r) =>
      "trim(replace(replace(' ' || replace(" + acc + ", ' ', '  ') || ' ', " +
        s"' ' || replace(t$r.pair, ' ', '  ') || ' ', " +
        s"' ' || replace(t$r.pair, ' ', '') || ' '), '  ', ' '))"
    }

  private def q144Oracle: String = {
    val mergeChain = bpeMergeChain3
    s"""WITH ${bpeTrainCtes(3)},
       |inst AS (SELECT doc_id, w
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents WHERE doc_id < 200) x
       |  WHERE length(w) >= 1),
       |vs AS (SELECT w, array_to_string(list_transform(generate_series(1, length(w)),
       |    i -> substr(w, i, 1)), ' ') AS t
       |  FROM (SELECT DISTINCT w FROM inst) v0),
       |vocab AS (SELECT w, len(string_split($mergeChain, ' ')) AS n_tok
       |  FROM vs CROSS JOIN t1 CROSS JOIN t2 CROSS JOIN t3)
       |SELECT i.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(length(i.w)) AS BIGINT) AS n_chars,
       |  CAST(SUM(v.n_tok) AS BIGINT) AS n_bpe_tokens,
       |  CAST(SUM(length(i.w)) AS DOUBLE) / CAST(SUM(v.n_tok) AS DOUBLE)
       |    AS chars_per_token
       |FROM inst i JOIN vocab v ON v.w = i.w
       |GROUP BY i.doc_id ORDER BY i.doc_id""".stripMargin
  }

  /** q241 oracle: the shared trained chain + vocabulary encode, rolled
    * up per language with exact e6 integer divisions. */
  private def q241Oracle: String =
    s"""WITH ${bpeTrainCtes(3)},
       |inst AS (SELECT lang, w
       |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS w
       |    FROM documents) x
       |  WHERE length(w) >= 1),
       |vs AS (SELECT w, array_to_string(list_transform(generate_series(1, length(w)),
       |    i -> substr(w, i, 1)), ' ') AS t
       |  FROM (SELECT DISTINCT w FROM inst) v0),
       |vocab AS (SELECT w, len(string_split($bpeMergeChain3, ' ')) AS n_tok
       |  FROM vs CROSS JOIN t1 CROSS JOIN t2 CROSS JOIN t3)
       |SELECT i.lang, CAST(COUNT(*) AS BIGINT) AS n_words,
       |  CAST(SUM(v.n_tok) AS BIGINT) AS n_bpe_tokens,
       |  CAST((1000000 * SUM(v.n_tok)) // COUNT(*) AS BIGINT) AS fertility_e6,
       |  CAST((1000000 * SUM(length(i.w))) // SUM(v.n_tok) AS BIGINT)
       |    AS chars_per_token_e6
       |FROM inst i JOIN vocab v ON v.w = i.w
       |GROUP BY i.lang ORDER BY i.lang""".stripMargin

  /** q318's oracle: identical gram training with counts kept, the same
    * integer floor-log2 scores (length(bin(x)) is minimal-width in both
    * engines — the q283 precedent), and the Viterbi DP as a recursive
    * CTE over DISTINCT words whose state carries the last three dp
    * entries — the q292-oracle join-walk discipline, because a DuckDB
    * list_reduce lambda probing a captured outer column misbinds across
    * vectorized chunks (see the q292 note above). The greedy twin is
    * q292's walk verbatim against the same piece tables. */
  /** The unigram-vocabulary training CTEs q318/q319's oracles share:
    * word stream, gram tables with counts (t1/t2/t3), the total-mass bit
    * length (tot.lt), scored piece tables (l1/l2/l3), distinct words. */
  private def unigramTrainCtes: String =
    s"""wd AS (SELECT source, unnest(string_split(text, ' ')) AS w
       |    FROM documents),
       |ws AS (SELECT source, w FROM wd WHERE length(w) >= 1),
       |g3r AS (SELECT unnest(list_transform(generate_series(1, length(w) - 2),
       |      i -> substr(w, CAST(i AS INT), 3))) AS g
       |  FROM ws WHERE length(w) >= 3),
       |t3 AS MATERIALIZED (SELECT g, cnt FROM (
       |  SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt FROM g3r GROUP BY g
       |  ORDER BY cnt DESC, g ASC LIMIT 16)),
       |g2r AS (SELECT unnest(list_transform(generate_series(1, length(w) - 1),
       |      i -> substr(w, CAST(i AS INT), 2))) AS g
       |  FROM ws WHERE length(w) >= 2),
       |t2 AS MATERIALIZED (SELECT g, cnt FROM (
       |  SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt FROM g2r GROUP BY g
       |  ORDER BY cnt DESC, g ASC LIMIT 16)),
       |g1r AS (SELECT unnest(list_transform(generate_series(1, length(w)),
       |      i -> substr(w, CAST(i AS INT), 1))) AS g FROM ws),
       |t1 AS MATERIALIZED (SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM g1r GROUP BY g),
       |tot AS MATERIALIZED (SELECT CAST(length(bin(SUM(cnt))) AS BIGINT) AS lt
       |  FROM (SELECT cnt FROM t1 UNION ALL SELECT cnt FROM t2
       |        UNION ALL SELECT cnt FROM t3)),
       |l1 AS MATERIALIZED (SELECT g,
       |    1000 * (CAST(length(bin(cnt)) AS BIGINT) - (SELECT lt FROM tot)) AS lp FROM t1),
       |l2 AS MATERIALIZED (SELECT g,
       |    1000 * (CAST(length(bin(cnt)) AS BIGINT) - (SELECT lt FROM tot)) AS lp FROM t2),
       |l3 AS MATERIALIZED (SELECT g,
       |    1000 * (CAST(length(bin(cnt)) AS BIGINT) - (SELECT lt FROM tot)) AS lp FROM t3),
       |dw AS MATERIALIZED (SELECT DISTINCT w FROM ws)""".stripMargin

  /** The oracle's recursive Viterbi walk over `dw`, parameterized by CTE
    * name and the three scored piece tables; `withPath` widens the state
    * with the winning-path string (tie CASE priority = the Spark
    * comparator's k ASC key). */
  private def oracleViterbiWalk(cte: String, lt1: String, lt2: String,
                                lt3: String, withPath: Boolean): String = {
    val neg = "CAST(-1000000000000000 AS BIGINT)"
    val big = "CAST(1000000000000000 AS BIGINT)"
    val cs1 = s"r.s1 + COALESCE(j1.lp, $neg)"
    val cs2 = s"CASE WHEN j2.g IS NOT NULL THEN r.s2 + j2.lp ELSE $neg END"
    val cs3 = s"CASE WHEN j3.g IS NOT NULL THEN r.s3 + j3.lp ELSE $neg END"
    val best = s"GREATEST($cs1, $cs2, $cs3)"
    val bestN = s"""LEAST(
       |      CASE WHEN ($cs1) = ($best) THEN r.n1 + 1 ELSE $big END,
       |      CASE WHEN ($cs2) = ($best) THEN r.n2 + 1 ELSE $big END,
       |      CASE WHEN ($cs3) = ($best) THEN r.n3 + 1 ELSE $big END)""".stripMargin
    val joins = s"""  FROM $cte r
       |  LEFT JOIN $lt1 j1 ON j1.g = substr(r.w, CAST(r.i + 1 AS INT), 1)
       |  LEFT JOIN $lt2 j2 ON r.i >= 1 AND j2.g = substr(r.w, CAST(r.i AS INT), 2)
       |  LEFT JOIN $lt3 j3 ON r.i >= 2 AND j3.g = substr(r.w, CAST(r.i - 1 AS INT), 3)
       |  WHERE r.i < length(r.w))""".stripMargin
    if (withPath)
      s"""$cte(w, i, s1, n1, p1, s2, n2, p2, s3, n3, p3) AS (
         |  SELECT w, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), '',
         |    $neg, CAST(0 AS BIGINT), '', $neg, CAST(0 AS BIGINT), '' FROM dw
         |  UNION ALL
         |  SELECT r.w, r.i + 1,
         |    $best,
         |    $bestN,
         |    CASE WHEN ($cs1) = ($best) AND r.n1 + 1 = ($bestN) THEN r.p1 || '1,'
         |         WHEN ($cs2) = ($best) AND r.n2 + 1 = ($bestN) THEN r.p2 || '2,'
         |         ELSE r.p3 || '3,' END,
         |    r.s1, r.n1, r.p1, r.s2, r.n2, r.p2
         |$joins""".stripMargin
    else
      s"""$cte(w, i, s1, n1, s2, n2, s3, n3) AS (
         |  SELECT w, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         |    $neg, CAST(0 AS BIGINT), $neg, CAST(0 AS BIGINT) FROM dw
         |  UNION ALL
         |  SELECT r.w, r.i + 1,
         |    $best,
         |    $bestN,
         |    r.s1, r.n1, r.s2, r.n2
         |$joins""".stripMargin
  }

  /** The E-step tail q319/q320's oracles share: winning paths, word
    * instance weights, the relational path explode (zipped unnest +
    * window offsets), usage counts, and the usage-mass bit length. */
  private def oracleUsageCtes: String =
    s"""fin AS (SELECT w, p1 AS path, s1 AS score0, n1 AS pieces0
       |  FROM walk WHERE i = length(w)),
       |cwt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM ws GROUP BY w),
       |ls0 AS (SELECT w, list_filter(string_split(path, ','), x -> x <> '') AS ls FROM fin),
       |lens AS (SELECT w, unnest(ls) AS kl,
       |    unnest(generate_series(1, len(ls))) AS j FROM ls0),
       |pos AS (SELECT w, CAST(kl AS INT) AS kli,
       |    1 + COALESCE(SUM(CAST(kl AS INT)) OVER (PARTITION BY w ORDER BY j
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM lens),
       |pieces AS (SELECT w, substr(w, CAST(off AS INT), kli) AS g FROM pos),
       |usg AS (SELECT p.g, CAST(SUM(c.cw) AS BIGINT) AS usage
       |  FROM pieces p JOIN cwt c ON c.w = p.w GROUP BY p.g),
       |um AS (SELECT CAST(length(bin(SUM(usage))) AS BIGINT) AS lu FROM usg)""".stripMargin

  private def q318Oracle: String = {
    s"""WITH RECURSIVE $unigramTrainCtes,
       |${oracleViterbiWalk("walk", "l1", "l2", "l3", withPath = false)},
       |gwalk(w, i, tok) AS (
       |  SELECT w, 1, CAST(0 AS BIGINT) FROM dw
       |  UNION ALL
       |  SELECT r.w,
       |    r.i + CASE WHEN m3.g IS NOT NULL THEN 3
       |               WHEN m2.g IS NOT NULL THEN 2 ELSE 1 END,
       |    r.tok + 1
       |  FROM gwalk r
       |  LEFT JOIN t3 m3 ON m3.g = substr(r.w, CAST(r.i AS INT), 3)
       |  LEFT JOIN t2 m2 ON m2.g = substr(r.w, CAST(r.i AS INT), 2)
       |  WHERE r.i <= length(r.w)),
       |vit AS (SELECT w, s1 AS score, n1 AS pieces FROM walk WHERE i = length(w)),
       |gp AS (SELECT w, MAX(tok) AS gpieces FROM gwalk GROUP BY w),
       |enc AS (SELECT ws.source, length(ws.w) AS nch, v.score, v.pieces, g.gpieces
       |  FROM ws JOIN vit v ON v.w = ws.w JOIN gp g ON g.w = ws.w),
       |agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
       |    CAST(SUM(nch) AS BIGINT) AS n_chars,
       |    CAST(SUM(gpieces) AS BIGINT) AS greedy_pieces,
       |    CAST(SUM(pieces) AS BIGINT) AS viterbi_pieces,
       |    CAST(SUM(score) AS BIGINT) AS score_e3
       |  FROM enc GROUP BY source)
       |SELECT source, n_words, n_chars, greedy_pieces, viterbi_pieces, score_e3,
       |  CAST((1000000 * greedy_pieces) // n_words AS BIGINT) AS greedy_fertility_e6,
       |  CAST((1000000 * viterbi_pieces) // n_words AS BIGINT) AS viterbi_fertility_e6
       |FROM agg ORDER BY source""".stripMargin
  }

  /** q319's oracle: the shared training CTEs, q318's walk widened with
    * the winning path (tie-break = max score, fewest pieces, SHORTEST
    * last piece — the CASE priority below mirrors the Spark comparator's
    * k ASC key), then a relational path explode (zipped unnest + window
    * offsets — never a lambda re-probing the word) into usage counts and
    * the floor-log2 re-score. */
  private def q319Oracle: String = {
    s"""WITH RECURSIVE $unigramTrainCtes,
       |${oracleViterbiWalk("walk", "l1", "l2", "l3", withPath = true)},
       |$oracleUsageCtes,
       |alls AS (SELECT g, 1 AS k, cnt FROM t1
       |  UNION ALL SELECT g, 2, cnt FROM t2
       |  UNION ALL SELECT g, 3, cnt FROM t3)
       |SELECT a.g, CAST(a.k AS INT) AS k, CAST(a.cnt AS BIGINT) AS cnt,
       |  CAST(1000 * (CAST(length(bin(a.cnt)) AS BIGINT) - (SELECT lt FROM tot)) AS BIGINT) AS lp0_e3,
       |  CAST(COALESCE(u.usage, 0) AS BIGINT) AS usage,
       |  CAST(CASE WHEN COALESCE(u.usage, 0) = 0 THEN 1 ELSE 0 END AS INT) AS pruned,
       |  CAST(CASE WHEN COALESCE(u.usage, 0) > 0
       |    THEN 1000 * (CAST(length(bin(u.usage)) AS BIGINT) - (SELECT lu FROM um))
       |    ELSE 0 END AS BIGINT) AS lp1_e3
       |FROM alls a LEFT JOIN usg u ON u.g = a.g
       |ORDER BY k, a.g""".stripMargin
  }

  /** q320's oracle: the path walk + usage chain (q319's), the round-2
    * piece tables — every character kept with a Laplace floor count of
    * 1, multi-char pieces only with usage > 0 — and a second score-only
    * walk under them, aggregated per source next to round 0's numbers. */
  private def q320Oracle: String = {
    s"""WITH RECURSIVE $unigramTrainCtes,
       |${oracleViterbiWalk("walk", "l1", "l2", "l3", withPath = true)},
       |$oracleUsageCtes,
       |l1b AS MATERIALIZED (SELECT t1.g,
       |    1000 * (CAST(length(bin(GREATEST(COALESCE(u.usage, 0), 1))) AS BIGINT)
       |      - (SELECT lu FROM um)) AS lp
       |  FROM t1 LEFT JOIN usg u ON u.g = t1.g),
       |l2b AS MATERIALIZED (SELECT t2.g,
       |    1000 * (CAST(length(bin(u.usage)) AS BIGINT) - (SELECT lu FROM um)) AS lp
       |  FROM t2 JOIN usg u ON u.g = t2.g),
       |l3b AS MATERIALIZED (SELECT t3.g,
       |    1000 * (CAST(length(bin(u.usage)) AS BIGINT) - (SELECT lu FROM um)) AS lp
       |  FROM t3 JOIN usg u ON u.g = t3.g),
       |${oracleViterbiWalk("walk2", "l1b", "l2b", "l3b", withPath = false)},
       |fin2 AS (SELECT w, s1 AS score1, n1 AS pieces1 FROM walk2 WHERE i = length(w)),
       |enc AS (SELECT ws.source, f.score0, f.pieces0, f2.score1, f2.pieces1
       |  FROM ws JOIN fin f ON f.w = ws.w JOIN fin2 f2 ON f2.w = ws.w),
       |agg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
       |    CAST(SUM(pieces0) AS BIGINT) AS pieces0,
       |    CAST(SUM(pieces1) AS BIGINT) AS pieces1,
       |    CAST(SUM(score0) AS BIGINT) AS score0_e3,
       |    CAST(SUM(score1) AS BIGINT) AS score1_e3
       |  FROM enc GROUP BY source)
       |SELECT source, n_words, pieces0, pieces1, score0_e3, score1_e3,
       |  CAST((1000000 * pieces0) // n_words AS BIGINT) AS fertility0_e6,
       |  CAST((1000000 * pieces1) // n_words AS BIGINT) AS fertility1_e6
       |FROM agg ORDER BY source""".stripMargin
  }

  /** q321's oracle: the FULL-REBUILD form — train the gram tables over
    * the whole corpus (base + delta in one pass) with the shared CTEs
    * and emit the kept vocabulary; per-gram additivity makes the
    * incremental construction identical, which is what the hash gate
    * proves. */
  private[graft] def q321Oracle: String =
    s"""WITH $unigramTrainCtes,
       |alls AS (
       |  SELECT t1.g, 1 AS k, t1.cnt, l1.lp FROM t1 JOIN l1 ON l1.g = t1.g
       |  UNION ALL SELECT t2.g, 2, t2.cnt, l2.lp FROM t2 JOIN l2 ON l2.g = t2.g
       |  UNION ALL SELECT t3.g, 3, t3.cnt, l3.lp FROM t3 JOIN l3 ON l3.g = t3.g)
       |SELECT g, CAST(k AS INT) AS k, CAST(cnt AS BIGINT) AS cnt,
       |  CAST(lp AS BIGINT) AS lp_e3
       |FROM alls ORDER BY k, g""".stripMargin

  val oracles: Map[String, String] = Map(
    "q321_unigram_incremental" -> q321Oracle,
    "q320_unigram_em_eval" -> q320Oracle,
    "q319_unigram_em" -> q319Oracle,
    "q318_unigram_viterbi" -> q318Oracle,
    "q296_code_switching" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |e AS (SELECT doc_id, lang, len(toks) // 16 AS nc, toks FROM t WHERE len(toks) // 16 >= 2),
        |ch AS (SELECT doc_id, lang, toks, unnest(generate_series(0, nc - 1)) AS ci FROM e),
        |h AS (SELECT doc_id, lang,
        |    CASE WHEN len(list_filter(list_slice(toks, ci * 16 + 1, ci * 16 + 16),
        |      t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and' OR t = 'to')) >= 2
        |    THEN 1 ELSE 0 END AS is_en
        |  FROM ch),
        |d AS (SELECT doc_id, lang, COUNT(*) AS chunks, SUM(is_en) AS enc FROM h GROUP BY 1, 2),
        |m AS (SELECT lang, CASE WHEN enc >= 1 AND chunks - enc >= 1
        |    AND 4 * least(enc, chunks - enc) >= chunks THEN 1 ELSE 0 END AS mixed FROM d)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(mixed) AS BIGINT) AS n_mixed,
        |  CAST((1000000 * SUM(mixed)) // COUNT(*) AS BIGINT) AS mixed_e6
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin,
    // q292: identical gram training; the greedy walk runs as a
    // recursive CTE over DISTINCT words (position jumps by longest
    // match via LEFT JOINs against the piece tables) instead of a
    // list_reduce fold. The fold form was WRONG under DuckDB 1.0.0:
    // a reduce lambda that probes a captured outer column (substr(w,
    // x.i, 3) with w from an unnest) misbinds the capture across
    // vectorized chunks — the same word returned 3 pieces on one row
    // and 5 on another (observed on sf0.01; minimal repro in the
    // round-13 notes). Pure-accumulator reduce lambdas ((a,b) -> a+b,
    // the other 42 oracle uses) are unaffected. The join walk is also
    // the better oracle shape: each distinct word is segmented once.
    "q292_wordpiece_encode" ->
      """WITH RECURSIVE wd AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents),
        |ws AS (SELECT source, w FROM wd WHERE length(w) >= 1),
        |g3 AS (SELECT unnest(list_transform(generate_series(1, length(w) - 2),
        |      i -> substr(w, CAST(i AS INT), 3))) AS g
        |  FROM ws WHERE length(w) >= 3),
        |t3 AS MATERIALIZED (SELECT g FROM (
        |  SELECT g, COUNT(*) AS cnt FROM g3 GROUP BY g
        |  ORDER BY cnt DESC, g ASC LIMIT 16)),
        |g2 AS (SELECT unnest(list_transform(generate_series(1, length(w) - 1),
        |      i -> substr(w, CAST(i AS INT), 2))) AS g
        |  FROM ws WHERE length(w) >= 2),
        |t2 AS MATERIALIZED (SELECT g FROM (
        |  SELECT g, COUNT(*) AS cnt FROM g2 GROUP BY g
        |  ORDER BY cnt DESC, g ASC LIMIT 16)),
        |dw AS MATERIALIZED (SELECT DISTINCT w FROM ws),
        |walk(w, i, tok) AS (
        |  SELECT w, 1, CAST(0 AS BIGINT) FROM dw
        |  UNION ALL
        |  SELECT r.w,
        |    r.i + CASE WHEN m3.g IS NOT NULL THEN 3
        |               WHEN m2.g IS NOT NULL THEN 2 ELSE 1 END,
        |    r.tok + 1
        |  FROM walk r
        |  LEFT JOIN t3 m3 ON m3.g = substr(r.w, r.i, 3)
        |  LEFT JOIN t2 m2 ON m2.g = substr(r.w, r.i, 2)
        |  WHERE r.i <= length(r.w)),
        |pieces AS (SELECT w, MAX(tok) AS pieces FROM walk GROUP BY w),
        |enc AS (SELECT ws.source, length(ws.w) AS nch, p.pieces
        |  FROM ws JOIN pieces p ON p.w = ws.w),
        |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
        |    CAST(SUM(nch) AS BIGINT) AS n_chars,
        |    CAST(SUM(pieces) AS BIGINT) AS n_pieces
        |  FROM enc GROUP BY source)
        |SELECT source, n_words, n_chars, n_pieces,
        |  CAST((1000000 * n_pieces) // n_words AS BIGINT) AS fertility_e6,
        |  CAST((1000000 * n_chars) // GREATEST(n_pieces, 1) AS BIGINT)
        |    AS chars_per_piece_e6
        |FROM g ORDER BY source""".stripMargin,
    // q290: identical prefix key (1-based inclusive list slice = Spark
    // slice(toks, 1, 4)), identical rollup and presentation cut
    "q290_template_census" ->
      """WITH t AS (SELECT source, lang, string_split(text, ' ') AS toks
        |    FROM documents),
        |p AS (SELECT source, lang,
        |    array_to_string(toks[1:4], ' ') AS template_key,
        |    CAST(len(toks) AS BIGINT) AS ntok
        |  FROM t WHERE len(toks) >= 4),
        |g AS (SELECT template_key, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(SUM(ntok) AS BIGINT) AS tokens
        |  FROM p GROUP BY template_key)
        |SELECT template_key, n_docs, n_sources, n_langs, tokens
        |FROM g WHERE n_docs >= 2
        |ORDER BY n_docs DESC, template_key ASC LIMIT 20""".stripMargin,
    // q283: a plain global row_number in the oracle engine (rank
    // two-phasing is a Spark scale concern); bin() is minimal-width
    // in both engines
    "q283_zipf_profile" ->
      """WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok
        |    FROM documents),
        |vc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM tk GROUP BY tok),
        |rk AS (SELECT cnt,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rank
        |  FROM vc),
        |tot AS (SELECT SUM(cnt) AS n_total FROM vc),
        |b AS (SELECT CAST(length(bin(rank)) AS INT) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_ranks,
        |    CAST(SUM(cnt) AS BIGINT) AS mass
        |  FROM rk GROUP BY 1),
        |c AS (SELECT bucket, n_ranks, mass,
        |    SUM(mass) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_mass
        |  FROM b)
        |SELECT bucket, n_ranks, mass,
        |  CAST((1000000 * mass) // n_total AS BIGINT) AS share_e6,
        |  CAST((1000000 * cum_mass) // n_total AS BIGINT) AS cum_share_e6
        |FROM c, tot ORDER BY bucket""".stripMargin,
    // q273: identical noise injection and rule chain; DuckDB's
    // regexp_replace needs the 'g' flag (Spark's is global by default)
    "q273_normalization_audit" ->
      """WITH raw AS (SELECT source,
        |    concat(text, ' Mixed', CAST(doc_id % 5 AS VARCHAR), 'CASE  ',
        |      repeat('!', CAST(1 + doc_id % 3 AS INT)), ' end', chr(9),
        |      'tab') AS raw
        |  FROM documents),
        |c AS (SELECT source, raw,
        |    lower(raw) AS s1,
        |    replace(lower(raw), chr(9), ' ') AS s2,
        |    regexp_replace(replace(lower(raw), chr(9), ' '),
        |      '[!]+', '!', 'g') AS s3,
        |    trim(regexp_replace(regexp_replace(replace(lower(raw), chr(9),
        |      ' '), '[!]+', '!', 'g'), '  +', ' ', 'g')) AS s4
        |  FROM raw),
        |i AS (SELECT source, raw, s1, s2, s3, s4,
        |    trim(regexp_replace(regexp_replace(replace(lower(s4), chr(9),
        |      ' '), '[!]+', '!', 'g'), '  +', ' ', 'g')) AS again
        |  FROM c),
        |g AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN s1 <> raw THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_case,
        |    CAST(SUM(CASE WHEN s2 <> s1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ctrl,
        |    CAST(SUM(CASE WHEN s3 <> s2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_punct,
        |    CAST(SUM(CASE WHEN s4 <> s3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_ws,
        |    CAST(SUM(length(raw)) AS BIGINT) AS chars_in,
        |    CAST(SUM(length(s4)) AS BIGINT) AS chars_out,
        |    CAST(SUM(CASE WHEN again <> s4 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_non_idem
        |  FROM i GROUP BY source)
        |SELECT source, n_docs, n_case, n_ctrl, n_punct, n_ws, chars_in,
        |  chars_out, n_non_idem,
        |  CAST((1000000 * (chars_in - chars_out)) // chars_in AS BIGINT)
        |    AS shrink_e6
        |FROM g ORDER BY source""".stripMargin,
    "q267_vocab_curve" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_instances FROM tok),
        |gc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
        |vr AS (SELECT w, c, row_number() OVER (ORDER BY c DESC, w ASC) AS rank
        |  FROM gc),
        |top AS (SELECT rank, c FROM vr WHERE rank <= 512),
        |cov AS (SELECT k, CAST(SUM(c) AS BIGINT) AS covered_instances
        |  FROM top, (SELECT unnest([64, 128, 256, 512]) AS k)
        |  WHERE rank <= k GROUP BY k)
        |SELECT CAST(k AS BIGINT) AS k, covered_instances, tt.n_instances,
        |  CAST((1000000 * (tt.n_instances - covered_instances))
        |    // tt.n_instances AS BIGINT) AS oov_instance_e6
        |FROM cov CROSS JOIN tt ORDER BY k""".stripMargin,
    // re-derives every shot boundary from character codes (luma =
    // ascii % 256, cut at |Δ| >= 8) — the demuxed planes must land on
    // exactly these verdicts
    "q260_video_scenes" ->
      """WITH d AS (SELECT doc_id, source, text, length(text) AS n
        |  FROM documents),
        |fr AS (SELECT doc_id, source, u.i AS i,
        |    ascii(substr(text, CAST(u.i AS INTEGER), 1)) % 256 AS luma
        |  FROM d, unnest(generate_series(1, n)) u(i)),
        |c AS (SELECT doc_id, source, i, luma,
        |    CASE WHEN lag(luma) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
        |      OR abs(luma - lag(luma) OVER (PARTITION BY doc_id ORDER BY i)) >= 8
        |      THEN 1 ELSE 0 END AS cut
        |  FROM fr),
        |sid AS (SELECT doc_id, source, i,
        |    SUM(cut) OVER (PARTITION BY doc_id ORDER BY i) AS scene
        |  FROM c),
        |scenes AS (SELECT doc_id, source, scene, COUNT(*) AS len
        |  FROM sid GROUP BY 1, 2, 3),
        |perscene AS (SELECT doc_id, COUNT(*) AS nsc, MAX(len) AS maxlen,
        |    SUM(len) AS nfr
        |  FROM scenes GROUP BY 1),
        |perdoc AS (SELECT d.doc_id, d.source,
        |    COALESCE(p.nsc, 0) AS nsc, COALESCE(p.maxlen, 0) AS maxlen,
        |    COALESCE(p.nfr, 0) AS nfr
        |  FROM d LEFT JOIN perscene p USING (doc_id))
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nfr) AS BIGINT) AS n_frames,
        |  CAST(SUM(nsc) AS BIGINT) AS n_scenes,
        |  CAST(MAX(maxlen) AS BIGINT) AS max_longest
        |FROM perdoc GROUP BY source ORDER BY source""".stripMargin,
    // re-derives each 8-char block's amplitude sum from the text alone
    // (amp = 0 for space, (ascii%32+1)*1000 otherwise) — the codec
    // round-trip on the Spark side must land on exactly these verdicts
    "q257_audio_segments" ->
      """WITH d AS (SELECT doc_id, source, text, length(text) AS n
        |  FROM documents),
        |b AS (SELECT doc_id, source, u.b AS b,
        |    CASE WHEN list_sum(list_transform(
        |        generate_series(u.b * 8 + 1, LEAST(n, u.b * 8 + 8)),
        |        i -> CASE WHEN substr(text, CAST(i AS INTEGER), 1) = ' ' THEN 0
        |          ELSE (ascii(substr(text, CAST(i AS INTEGER), 1)) % 32 + 1) * 1000
        |          END)) >= 104000 THEN 1 ELSE 0 END AS act
        |  FROM d, unnest(generate_series(0, (n + 7) // 8 - 1)) u(b)),
        |act AS (SELECT doc_id, source, b,
        |    b - row_number() OVER (PARTITION BY doc_id ORDER BY b) AS grp
        |  FROM b WHERE act = 1),
        |seg AS (SELECT doc_id, grp, COUNT(*) AS len
        |  FROM act GROUP BY doc_id, grp),
        |perdoc AS (SELECT d.doc_id, d.source, (d.n + 7) // 8 AS nb,
        |    COALESCE(a.nact, 0) AS nact,
        |    COALESCE(sg.nseg, 0) AS nseg, COALESCE(sg.maxlen, 0) AS maxlen
        |  FROM d
        |  LEFT JOIN (SELECT doc_id, COUNT(*) AS nact FROM act GROUP BY doc_id) a
        |    USING (doc_id)
        |  LEFT JOIN (SELECT doc_id, COUNT(*) AS nseg, MAX(len) AS maxlen
        |    FROM seg GROUP BY doc_id) sg USING (doc_id))
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nb) AS BIGINT) AS n_blocks,
        |  CAST(SUM(nact) AS BIGINT) AS n_active_blocks,
        |  CAST(SUM(nseg) AS BIGINT) AS n_segments,
        |  CAST(MAX(maxlen) AS BIGINT) AS max_longest
        |FROM perdoc GROUP BY source ORDER BY source""".stripMargin,
    "q245_ngram_diversity" ->
      """WITH t AS (SELECT source, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT source,
        |    unnest(list_transform(generate_series(1, len(toks) - 2),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS g
        |  FROM t WHERE len(toks) >= 3),
        |c AS (SELECT source, g, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM g GROUP BY source, g),
        |r AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(SUM(c) AS BIGINT) AS n_grams,
        |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
        |    CAST(MAX(c) AS BIGINT) AS top_count
        |  FROM c GROUP BY source)
        |SELECT source, n_types, n_grams, n_singletons, top_count,
        |  CAST((1000000 * n_types) // n_grams AS BIGINT) AS ttr_e6,
        |  CAST((1000000 * n_singletons) // n_grams AS BIGINT) AS singleton_e6,
        |  CAST((1000000 * top_count) // n_grams AS BIGINT) AS top_share_e6
        |FROM r ORDER BY source""".stripMargin,
    "q246_oov_rate" ->
      s"""WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |gc AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
         |vr AS (SELECT w, row_number() OVER (ORDER BY c DESC, w ASC) AS rn FROM gc),
         |vocab AS (SELECT w, 1 AS in_vocab FROM vr WHERE rn <= $oovK),
         |lw AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM tok GROUP BY lang, w),
         |j AS (SELECT lw.lang, lw.cnt, vocab.in_vocab
         |  FROM lw LEFT JOIN vocab USING (w)),
         |r AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_instances,
         |    CAST(SUM(CASE WHEN in_vocab IS NULL THEN cnt ELSE 0 END) AS BIGINT)
         |      AS n_oov_instances,
         |    CAST(COUNT(*) AS BIGINT) AS n_types,
         |    CAST(SUM(CASE WHEN in_vocab IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_oov_types
         |  FROM j GROUP BY lang)
         |SELECT lang, n_instances, n_oov_instances, n_types, n_oov_types,
         |  CAST((1000000 * n_oov_instances) // n_instances AS BIGINT)
         |    AS oov_instance_e6,
         |  CAST((1000000 * n_oov_types) // n_types AS BIGINT) AS oov_type_e6
         |FROM r ORDER BY lang""".stripMargin,
    "q241_tokenizer_fertility" -> q241Oracle,
    "q234_skipgram_pairs" -> q234Oracle,
    "q221_textrank" -> q221Oracle,
    "q131_regex_suite" ->
      """WITH x AS (SELECT lang,
        |    len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
        |    regexp_extract(text, '([a-z]+ing)', 1) AS first_ing,
        |    CAST(regexp_matches(text, '[A-Z][a-z]+') AS INTEGER) AS has_capitalized,
        |    length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_novowels,
        |    length(text) AS len
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_numbers) AS BIGINT) AS sum_numbers,
        |  CAST(COUNT(DISTINCT first_ing) AS BIGINT) AS n_distinct_ing,
        |  MIN(CASE WHEN first_ing <> '' THEN first_ing END) AS min_ing,
        |  CAST(SUM(has_capitalized) AS BIGINT) AS n_capitalized,
        |  CAST(SUM(len_novowels) AS BIGINT) AS sum_novowel_len,
        |  CAST(SUM(len) AS BIGINT) AS sum_len
        |FROM x GROUP BY lang ORDER BY lang""".stripMargin,
    "q127_array_suite" ->
      """WITH d AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
        |x AS (SELECT lang,
        |    len(toks) AS nt,
        |    len(list_distinct(toks)) AS nd,
        |    CAST(list_contains(toks, 'the') AS INTEGER) AS has_the,
        |    COALESCE(list_position(toks, 'the'), 0) AS pos_the,
        |    list_sort(toks)[1] AS first_sorted,
        |    list_reverse(toks)[1] AS last_tok,
        |    array_to_string(toks[2:4], ' ') AS mid3,
        |    list_max(toks) AS max_tok
        |  FROM d)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS sum_tokens,
        |  CAST(SUM(nd) AS BIGINT) AS sum_distinct,
        |  CAST(SUM(has_the) AS BIGINT) AS n_with_the,
        |  CAST(SUM(pos_the) AS BIGINT) AS sum_pos_the,
        |  MIN(first_sorted) AS min_first_sorted,
        |  MAX(max_tok) AS max_token,
        |  CAST(COUNT(DISTINCT mid3) AS BIGINT) AS n_distinct_mid3,
        |  CAST(COUNT(DISTINCT last_tok) AS BIGINT) AS n_distinct_last
        |FROM x GROUP BY lang ORDER BY lang""".stripMargin,
    "q104_phrase_search" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |p AS (SELECT doc_id, unnest(toks) AS tok,
        |    generate_subscripts(toks, 1) - 1 AS pos FROM t),
        |t0 AS (SELECT doc_id, pos FROM p WHERE tok = 'big'),
        |t1 AS (SELECT doc_id, pos - 1 AS pos FROM p WHERE tok = 'order'),
        |t2 AS (SELECT doc_id, pos - 2 AS pos FROM p WHERE tok = 'scan')
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_matches,
        |  CAST(MIN(pos) AS BIGINT) AS first_pos
        |FROM t0 JOIN t1 USING (doc_id, pos) JOIN t2 USING (doc_id, pos)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q98_bpe_train" -> q98Oracle,
    "q144_bpe_encode" -> q144Oracle,
    // identical 5-op double chain over exact counts; log-free lift
    "q163_pmi_collocations" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |u AS (SELECT unnest(toks) AS w FROM t),
        |cx AS (SELECT w, COUNT(*) AS c FROM u GROUP BY w),
        |nu AS (SELECT COUNT(*) AS n FROM u),
        |p AS (SELECT toks[i] AS x, toks[i + 1] AS y
        |  FROM t, unnest(generate_series(1, len(toks) - 1)) AS g(i)
        |  WHERE len(toks) >= 2),
        |cp AS (SELECT x, y, COUNT(*) AS c_pair FROM p GROUP BY x, y),
        |np AS (SELECT COUNT(*) AS n FROM p)
        |SELECT cp.x, cp.y, CAST(cp.c_pair AS BIGINT) AS c_pair,
        |  CAST(a.c AS BIGINT) AS c_x, CAST(b.c AS BIGINT) AS c_y,
        |  CAST(cp.c_pair AS DOUBLE) * CAST(nu.n AS DOUBLE)
        |    / CAST(a.c AS DOUBLE) * CAST(nu.n AS DOUBLE)
        |    / CAST(b.c AS DOUBLE) / CAST(np.n AS DOUBLE) AS lift
        |FROM cp
        |JOIN cx a ON a.w = cp.x
        |JOIN cx b ON b.w = cp.y
        |CROSS JOIN nu CROSS JOIN np
        |WHERE cp.c_pair >= 10
        |ORDER BY lift DESC, cp.x, cp.y LIMIT 20""".stripMargin,
    "q91_winnowing" ->
      """WITH h AS (SELECT doc_id, list_transform(generate_series(1, length(text) - 3),
        |    i -> md5(substr(text, i, 4))) AS h
        |  FROM documents WHERE length(text) >= 8),
        |s AS (SELECT doc_id, h, list_distinct(list_transform(
        |    generate_series(1, len(h) - 4), j -> list_min(h[j:j+4]))) AS sel
        |  FROM h)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(len(h) AS BIGINT) AS n_grams,
        |  CAST(len(sel) AS BIGINT) AS n_selected,
        |  md5(array_to_string(list_sort(sel), '')) AS fingerprint
        |FROM s ORDER BY doc_id""".stripMargin,
    "q73_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n FROM documents),
        |ix AS (SELECT doc_id, toks, unnest(generate_series(0, (n - 1) // 48)) AS i FROM t),
        |c AS (SELECT doc_id, i AS chunk_idx, toks[i * 48 + 1 : i * 48 + 64] AS chunk FROM ix)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
        |  CAST(len(chunk) AS INTEGER) AS chunk_tokens,
        |  md5(array_to_string(chunk, ' ')) AS chunk_hash
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q74_bpe_merges" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |p AS (SELECT unnest(list_transform(generate_series(1, length(w) - 1),
        |    i -> substr(w, i, 2))) AS pair
        |  FROM w WHERE length(w) >= 2)
        |SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM p GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 20""".stripMargin,
    // q60: same deterministic contamination, same three ordered
    // regexp_replace passes; DuckDB needs the 'g' flag (Spark's
    // regexp_replace is global by default)
    "q60_pii_scrub" ->
      """WITH raw AS (SELECT doc_id,
        |    concat(text, ' reach user', CAST(doc_id AS VARCHAR), '@mail',
        |      CAST(doc_id % 7 AS VARCHAR), '.example.com or ',
        |      CAST(10 + doc_id % 90 AS VARCHAR), '.', CAST(doc_id % 256 AS VARCHAR), '.',
        |      CAST((doc_id * 3) % 256 AS VARCHAR), '.', CAST((doc_id * 7) % 256 AS VARCHAR),
        |      ' ref ', lpad(CAST((doc_id * 991) % 100000000 AS VARCHAR), 8, '0')) AS raw
        |  FROM documents),
        |p1 AS (SELECT doc_id,
        |    len(regexp_extract_all(raw, '[A-Za-z0-9._-]+@[A-Za-z0-9.-]+[.][A-Za-z]+')) AS n_email,
        |    regexp_replace(raw, '[A-Za-z0-9._-]+@[A-Za-z0-9.-]+[.][A-Za-z]+', '<EMAIL>', 'g') AS pass1
        |  FROM raw),
        |p2 AS (SELECT doc_id, n_email,
        |    len(regexp_extract_all(pass1, '[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+')) AS n_ip,
        |    regexp_replace(pass1, '[0-9]+[.][0-9]+[.][0-9]+[.][0-9]+', '<IP>', 'g') AS pass2
        |  FROM p1),
        |p3 AS (SELECT doc_id, n_email, n_ip,
        |    len(regexp_extract_all(pass2, '[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+')) AS n_num,
        |    regexp_replace(pass2, '[0-9][0-9][0-9][0-9][0-9][0-9][0-9]+', '<NUM>', 'g') AS scrubbed
        |  FROM p2)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(n_email AS INTEGER) AS n_email, CAST(n_ip AS INTEGER) AS n_ip,
        |  CAST(n_num AS INTEGER) AS n_num,
        |  CAST(length(scrubbed) AS BIGINT) AS scrubbed_len,
        |  md5(scrubbed) AS scrubbed_md5
        |FROM p3 ORDER BY doc_id""".stripMargin,
    // q61: DuckDB lists are 1-indexed (toks[i..i+2] over series 1..len-2
    // ≡ Spark's 0-indexed toks[i-1..i+1] over the same series)
    "q61_repetition_ratio" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |g AS (SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(toks) - 2),
        |      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS gram
        |  FROM t),
        |c AS (SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY 1, 2)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(SUM(n) AS BIGINT) AS n_grams,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
        |  CAST(MAX(n) AS BIGINT) AS top_gram_n,
        |  1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dup_ratio,
        |  (1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)) <= 0.2 AS keep_doc
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q55: the hex→int bucket uses the strpos('0123456789abcdef', ...)
    // digit arithmetic (DuckDB has no conv()); md5 over the identical
    // concatenated key makes buckets engine-portable
    "q55_stratified_sample" ->
      """WITH d AS (SELECT doc_id, source,
        |    20 + (CAST(substr(source, 4) AS INTEGER) * 7) % 60 AS rate,
        |    ((strpos('0123456789abcdef', substr(md5(concat(CAST(doc_id AS VARCHAR), ':', source)), 1, 1)) - 1) * 16
        |     + (strpos('0123456789abcdef', substr(md5(concat(CAST(doc_id AS VARCHAR), ':', source)), 2, 1)) - 1)) % 100 AS bucket
        |  FROM documents)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_total,
        |  CAST(SUM(CASE WHEN bucket < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(COALESCE(MIN(CASE WHEN bucket < rate THEN doc_id END), -1) AS BIGINT) AS first_kept,
        |  CAST(COALESCE(MAX(CASE WHEN bucket < rate THEN doc_id END), -1) AS BIGINT) AS last_kept,
        |  CAST(MIN(rate) AS INTEGER) AS rate
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "q54_bpe_tokens" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+') AS toks
        |  FROM documents)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(len(list_filter(toks, t -> regexp_matches(substr(t, 1, 1), '[A-Za-z]'))) AS BIGINT) AS n_word,
        |  CAST(len(list_filter(toks, t -> regexp_matches(substr(t, 1, 1), '[0-9]'))) AS BIGINT) AS n_digit,
        |  CAST(len(toks)
        |    - len(list_filter(toks, t -> regexp_matches(substr(t, 1, 1), '[A-Za-z]')))
        |    - len(list_filter(toks, t -> regexp_matches(substr(t, 1, 1), '[0-9]'))) AS BIGINT) AS n_punct,
        |  CAST(COALESCE(list_sum(list_transform(
        |    list_filter(toks, t -> regexp_matches(substr(t, 1, 1), '[A-Za-z]')),
        |    t -> (length(t) + 3) // 4)), 0) AS BIGINT) AS n_subword_est
        |FROM t ORDER BY doc_id""".stripMargin,
    // q53: the ASCII guard makes DuckDB's VARCHAR substring slice the same
    // bytes Spark's binary substring does, so the digests match exactly
    "q53_frame_sample" ->
      """WITH m AS (SELECT doc_id, text FROM documents
        |  WHERE octet_length(encode(text)) = length(text) AND length(text) > 0),
        |f AS (SELECT doc_id,
        |    unnest(generate_series(0, CAST(ceil(length(text) / 256.0) AS INTEGER) - 1, 4)) AS i,
        |    text FROM m)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(i AS INTEGER) AS frame_idx,
        |  CAST(length(substring(text, CAST(i AS INTEGER) * 256 + 1, 256)) AS INTEGER) AS n_bytes,
        |  md5(substring(text, CAST(i AS INTEGER) * 256 + 1, 256)) AS frame_md5
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q48_string_suite" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS id,
        |  lower(n_name) AS lower_name,
        |  substr(n_name, 1, 3) AS prefix3,
        |  lpad(n_name, 12, '.') AS padded,
        |  rpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS key_padded,
        |  replace(n_name, 'A', '@') AS replaced,
        |  translate(n_name, 'AEIOU', 'aeiou') AS translated,
        |  reverse(n_name) AS reversed,
        |  repeat('-', CAST(n_nationkey % 5 AS INTEGER)) AS bar,
        |  CAST(length(trim(concat(' ', n_name, ' '))) AS INTEGER) AS trimmed_len
        |FROM nation ORDER BY id""".stripMargin,
    "q41_vocabulary" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |d AS (SELECT tok, doc_id, COUNT(*) AS n FROM t GROUP BY 1, 2)
        |SELECT tok, CAST(SUM(n) AS BIGINT) AS tf, CAST(COUNT(*) AS BIGINT) AS df
        |FROM d GROUP BY tok ORDER BY tf DESC, tok ASC LIMIT 20""".stripMargin,
    "q27_text_stats" ->
      """WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents),
        |b AS (SELECT doc_id, lang,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe,
        |    CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS avg_tok_len,
        |    CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stop_ratio,
        |    CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS alpha_ratio
        |  FROM t)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, n_tokens, n_bpe, avg_tok_len, stop_ratio, alpha_ratio,
        |  CASE WHEN stop_ratio >= 0.08 THEN 'en' ELSE 'other' END AS pred_lang,
        |  CAST((CASE WHEN n_tokens >= 20 THEN 1 ELSE 0 END) +
        |       (CASE WHEN stop_ratio >= 0.05 THEN 1 ELSE 0 END) +
        |       (CASE WHEN avg_tok_len BETWEEN 3 AND 8 THEN 1 ELSE 0 END) AS INTEGER) AS quality
        |FROM b ORDER BY doc_id""".stripMargin,
    "q29_multimodal_binary" ->
      """WITH p AS (SELECT doc_id, encode(text) AS payload FROM documents)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(octet_length(payload) AS BIGINT) AS n_bytes,
        |  md5(hex(payload)) AS checksum,
        |  substr(hex(payload), 1, 16) AS hex_prefix,
        |  CAST(64 + octet_length(payload) % 512 AS INTEGER) AS fake_width,
        |  CAST(64 + (octet_length(payload) * 7) % 512 AS INTEGER) AS fake_height,
        |  CAST(greatest(1, octet_length(payload) // 100) AS INTEGER) AS n_frames
        |FROM p ORDER BY doc_id""".stripMargin,
  )
}
