package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis building blocks for large-scale training-data pipelines:
 * tokenization, deterministic arithmetic hashing (engine-portable — the
 * same numbers are computable in any SQL engine, which is what the DuckDB
 * correctness oracle relies on), MinHash signatures, SimHash, language-ID
 * heuristics and quality scores.
 *
 * Everything is a `Column` expression built from Spark's codegen'd
 * higher-order functions (`transform`/`aggregate`/`filter`) — no UDFs, so
 * the whole pipeline stays inside whole-stage codegen and scales linearly
 * with executors. All hashes are plain integer arithmetic mod a prime, NOT
 * Spark's murmur3 `hash()`, so results are portable across engines and
 * stable across Spark versions.
 */
object TextOps {

  /** Modulus for token/shingle hashes (fits in 20 bits of slack below 2^31). */
  val TokenMod = 1000003L
  /** Modulus for MinHash permutations (2^31 - 1, prime). */
  val HashMod = 2147483647L
  /** SimHash fingerprint width. 63 bits: the full positive range of int64
    * (bit 63 would make prints negative, breaking `%`-based banding in both
    * Spark and DuckDB's overflow-checked BIGINT). Wide prints matter twice:
    * identical-print collisions are vanishingly rare at 10^9+ docs, and the
    * Hamming-LSH bands cut to 15-16 bits each (vs 12 on a 48-bit print) —
    * 16x fewer in-bucket collisions per band, which is what keeps hot
    * buckets subquadratic on real (token-correlated) corpora. */
  val SimHashBits = 63

  /** Default MinHash geometry: 16 hashes = 4 bands x 4 rows. */
  val NumHashes = 16
  val Bands = 4
  val RowsPerBand = NumHashes / Bands

  /** LCG-derived MinHash permutation coefficients (deterministic). */
  def hashA(j: Int): Long = (1103515245L * (j + 1) + 12345L) % HashMod
  def hashB(j: Int): Long = (12345L + 1013904223L * j) % HashMod

  /** Whitespace tokens, empties dropped. `array_remove` rather than a
    * `filter` lambda: higher-order functions are CodegenFallback in
    * Catalyst, and ONE lambda in a projection drops the WHOLE projection
    * out of whole-stage codegen — this keeps the tokenize→hash→fingerprint
    * pipeline inside one generated function. */
  def tokens(text: Column): Column =
    array_remove(split(text, " "), "")

  /** The GPT-2 byte-level BPE pre-tokenization pattern (Radford et al.
    * 2019, released in the public `gpt-2` repo's `encoder.py` and reused
    * verbatim by RoBERTa/GPT-3-lineage tokenizers): contraction
    * suffixes, space-prefixed letter runs, space-prefixed digit runs,
    * space-prefixed punctuation runs, then whitespace — where a
    * whitespace run followed by a non-space yields its LAST space to
    * the next token (the `\s+(?!\S)` lookahead). The `(?U)` flag makes
    * Java's `\s` Unicode-aware (NBSP, NEL…) — the reference Python
    * `regex` module's semantics; `\p{L}`/`\p{N}` are Unicode categories
    * in both engines. */
  val Gpt2PretokenRe: String =
    """(?U)'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  /** Pre-tokenize for byte-level BPE: the ordered pieces the GPT-2
    * pattern splits `text` into. A LOSSLESS partition of the string
    * (every character lands in exactly one piece — the property the
    * `tok_pretoken_lossless` gauge pins corpus-wide), so merges can
    * never cross a piece boundary — the pre-tokenizer is what makes
    * BPE training/encoding embarrassingly parallel at corpus scale.
    * One codegen'd `regexp_extract_all`; no UDF. */
  def pretokenizeGpt2(text: Column): Column =
    regexp_extract_all(text, lit(Gpt2PretokenRe), lit(0))

  private def bridged(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)

  /** Unicode NFC canonicalization (native codegen'd
    * [[graft.plans.NfcNormalizeExpr]]) — run BEFORE content hashing so
    * byte-level variants of identical text (precomposed vs combining
    * sequences) dedup together; already-normalized rows pass through with
    * zero allocation. */
  def nfc(text: Column): Column =
    bridged(graft.plans.NfcNormalizeExpr(expr(text)))

  /** Unicode NFKC compatibility normalization (native codegen'd
    * [[graft.plans.NfkcNormalizeExpr]]) — the SentencePiece-default
    * tokenizer prep: width/presentation variants (ligatures, fullwidth,
    * superscripts, squared units) fold to their plain equivalents. */
  def nfkc(text: Column): Column =
    bridged(graft.plans.NfkcNormalizeExpr(expr(text)))

  /** Accent-folded match key: lowercase then strip combining marks after
    * canonical decomposition (`strip_accents(lower(x))` semantics), via
    * the native [[graft.plans.AccentFoldExpr]]. */
  def accentFold(text: Column): Column =
    bridged(graft.plans.AccentFoldExpr(expr(text)))

  /** Polynomial rolling hash of a string: (acc*31 + codepoint) % P, via the
    * native codegen'd [[graft.plans.PolyHashExpr]]. */
  def polyHash(s: Column): Column =
    bridged(graft.plans.PolyHashExpr(expr(s), 31L, TokenMod))

  /** Higher-order-fold reference for [[polyHash]], pinned by the spec.
    * Guarded for the empty string — Spark's `sequence(1, 0)` is a DESCENDING
    * range, not an empty one. */
  private[graft] def polyHashHof(s: Column): Column =
    when(length(s) === 0, lit(0L)).otherwise(
      aggregate(
        sequence(lit(1), length(s)),
        lit(0L),
        (acc, i) => (acc * lit(31L) + ascii(substr(s, i, lit(1)))) % lit(TokenMod)))

  /** Hash every token: array<long>, each < TokenMod (native per-token loop). */
  def tokenHashes(toks: Column): Column =
    bridged(graft.plans.TokenHashesExpr(expr(toks), 31L, TokenMod, None))

  /** Polynomial rolling hash with multiplier `mult` mod [[HashMod]] —
    * independent of [[polyHash]]'s stream, used to widen token prints. */
  def polyHashWide(s: Column, mult: Long): Column =
    bridged(graft.plans.PolyHashExpr(expr(s), mult, HashMod))

  /** ~62-bit token prints: two independent 31-bit rolling hashes combined
    * as h31a * HashMod + h31b (max ≈ 4.6e18, inside int64 for Spark AND for
    * DuckDB's overflow-checked BIGINT arithmetic). Native one-pass loop. */
  def tokenHashesWide(toks: Column): Column =
    bridged(graft.plans.TokenHashesExpr(expr(toks), 31L, HashMod, Some(131L)))

  /** Higher-order-fold reference for [[tokenHashesWide]], pinned by the
    * spec (per-char `ascii(substr(...))` folds through interpreted
    * lambdas — slow, but the executable definition of the hash). */
  private[graft] def tokenHashesWideHof(toks: Column): Column = {
    def ph(s: Column, mult: Long): Column =
      when(length(s) === 0, lit(0L)).otherwise(
        aggregate(
          sequence(lit(1), length(s)),
          lit(0L),
          (acc, i) => (acc * lit(mult) + ascii(substr(s, i, lit(1)))) % lit(HashMod)))
    transform(toks, t => ph(t, 31L) * lit(HashMod) + ph(t, 131L))
  }

  /**
   * Word k-shingle hashes from token hashes: combine k consecutive token
   * hashes positionally, (h[i]*P^2 + h[i+1]*P + h[i+2]) % M for k=3.
   * Documents shorter than k tokens yield an empty array. Native one-pass
   * loop ([[graft.plans.ShingleHashesExpr]]): the lambda reference below
   * captures the OUTER `thash` column, so CollapseProject re-inlines the
   * caller's whole tokenize+hash subtree into every `get` — k
   * re-tokenizations per shingle when fed `tokenHashes(tokens(text))`
   * directly, the dominant cost of the contamination/repetition operators.
   */
  def shingleHashes(thash: Column, k: Int = 3): Column = {
    // sum-of-products bound: hashes < TokenMod ≈ 2^20, weights < HashMod <
    // 2^31 → each term < 2^51, so up to 2^12 terms fit in a long; 256 is
    // far past any useful window (MinHash shingles use 3, repeated-window
    // detection 20)
    require(k >= 1 && k <= 256, "shingle width 1..256 supported")
    bridged(graft.plans.ShingleHashesExpr(expr(thash),
      (0 until k).map(d => powMod(k - 1 - d)), HashMod))
  }

  /** Higher-order-lambda reference for [[shingleHashes]], pinned by the
    * spec (element-for-element, including the null-array → empty-array and
    * null-token → null-shingle edges). */
  private[graft] def shingleHashesHof(thash: Column, k: Int = 3): Column = {
    require(k >= 1 && k <= 256, "shingle width 1..256 supported")
    when(size(thash) >= k,
      transform(sequence(lit(0), size(thash) - k), i =>
        (0 until k).map(d =>
          get(thash, i + lit(d)) * lit(powMod(k - 1 - d))
        ).reduce(_ + _) % lit(HashMod)))
      .otherwise(array().cast("array<bigint>"))
  }

  /** TokenMod^e mod HashMod — the positional weights of [[shingleHashes]].
    * Products stay < HashMod^2 < 2^62, overflow-safe in long arithmetic. */
  private[graft] def powMod(e: Int): Long = {
    var acc = 1L
    var i = 0
    while (i < e) { acc = acc * (TokenMod % HashMod) % HashMod; i += 1 }
    acc
  }

  /** MinHash signature: array of NumHashes minima over the shingle set,
    * via the native codegen'd [[graft.plans.MinHashExpr]] (all permutation
    * minima in one traversal). */
  def minHashSignature(shingles: Column, numHashes: Int = NumHashes): Column =
    bridged(graft.plans.MinHashExpr(expr(shingles),
      (0 until numHashes).map(hashA), (0 until numHashes).map(hashB), HashMod))

  /** Column-expression reference for [[minHashSignature]], pinned by the
    * spec — numHashes interpreted `array_min(transform(...))` passes. */
  private[graft] def minHashSignatureHof(
      shingles: Column, numHashes: Int = NumHashes): Column =
    array((0 until numHashes).map { j =>
      array_min(transform(shingles, s =>
        (lit(hashA(j)) * s + lit(hashB(j))) % lit(HashMod)))
    }: _*)

  /** Hash one LSH band (rows [b*r, (b+1)*r) of the signature) to a bucket. */
  def bandHash(sig: Column, band: Int, rowsPerBand: Int = RowsPerBand): Column =
    (0 until rowsPerBand)
      .map(r => get(sig, lit(band * rowsPerBand + r)))
      .foldLeft(lit(0L): Column)((acc, v) => (acc * lit(31L) + v) % lit(HashMod))

  /**
   * SimHash over (wide) token hashes: for each of [[SimHashBits]] bits, sum
   * +1/-1 votes across tokens; the fingerprint sets the bit when the vote is
   * positive.
   *
   * ONE fold over the token array: the accumulator is the whole vote vector
   * (`array<bigint>` of length bits) and each token contributes all its bits
   * via one `zip_with` — not one aggregate pass per bit, so the token hashes
   * are computed once and the array is traversed once regardless of width.
   * The finish lambda folds the votes into the fingerprint (votes referenced
   * as a lambda variable: cheap, no re-aggregation).
   */
  def simHash(thash: Column, bits: Int = SimHashBits): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.plans.SimHashExpr(ColumnBridge.expression(thash), bits))
  }

  /** Higher-order-fold reference for [[simHash]] — Catalyst interprets
    * lambdas, so this is slow; it exists to PIN the native expression's
    * arithmetic (the spec compares them bit-for-bit). */
  private[graft] def simHashHof(thash: Column, bits: Int = SimHashBits): Column = {
    val zeros = array_repeat(lit(0L), bits)
    aggregate(
      thash,
      zeros,
      (acc, t) => zip_with(
        acc,
        array((0 until bits).map(b =>
          (shiftright(t, b) % lit(2L)) * lit(2L) - lit(1L)): _*),
        (a, v) => a + v),
      votes => (0 until bits).map(b =>
        when(get(votes, lit(b)) > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _))
  }

  /** One Hamming band of a SimHash print: band b = bits
    * [b*width, (b+1)*width) (the top band is naturally narrower when width
    * doesn't divide [[SimHashBits]] — uneven widths keep the guarantee, the
    * bands only need to PARTITION the bits). With bands = maxHamming + 1,
    * any pair within that Hamming distance shares at least one identical
    * band (pigeonhole) — the standard banding guarantee for Hamming LSH. */
  def simHashBand(print: Column, band: Int, width: Int = 16): Column =
    shiftright(print, band * width) % lit(1L << width)

  /** Hamming distance between two fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Jaccard similarity of two (deduplicated) shingle-hash arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = (size(a) + size(b) - size(array_intersect(a, b))).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Count of distinct common elements of two SORTED long arrays — the
    * native merge walk (see [[graft.plans.SortedIntersectCountExpr]]); the
    * similarity-join verify stage evaluates one of these per candidate
    * PAIR, so the zero-allocation form is the corpus-scale path. */
  def sortedIntersectCount(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.SortedIntersectCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Hash-set reference for [[sortedIntersectCount]] — pins the native
    * walk (the spec compares them exactly, duplicates included). */
  private[graft] def sortedIntersectCountRef(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("long")

  /** Language-ID stopword tables (tiny n-gram-free heuristic). */
  val StopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is")
  val StopwordsEs = Seq("el", "la", "de", "y", "que", "en", "es")
  val StopwordsDe = Seq("der", "die", "das", "und", "zu", "in", "ist")

  private def ratioIn(toks: Column, words: Seq[String]): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(words.map(lit): _*))).cast("double") /
        size(toks).cast("double"))

  /** Union of the per-language stopword tables (order pinned for the SQL
    * rendering). */
  val StopwordsAll: Seq[String] =
    (StopwordsEn ++ StopwordsEs ++ StopwordsDe).distinct

  /** Fraction of tokens that are known stopwords in ANY language table —
    * the "natural prose" signal of a C4/Gopher-style quality gate (word
    * salads and boilerplate have near-zero stopword mass). */
  def stopwordFrac(toks: Column): Column = ratioIn(toks, StopwordsAll)

  /**
   * Heuristic language ID: argmax of stopword ratios with a fixed tie-break
   * (en > es > de > unk); 'unk' when no stopwords hit at all.
   */
  def langId(toks: Column): Column = {
    val en = ratioIn(toks, StopwordsEn)
    val es = ratioIn(toks, StopwordsEs)
    val de = ratioIn(toks, StopwordsDe)
    when(en === 0 && es === 0 && de === 0, lit("unk"))
      .when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Punctuation character count (.,;:!?). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Mean token length (0.0 for empty docs). */
  def meanTokenLen(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))

  /** Whole-document fingerprint: rolling hash over the raw text. */
  def fingerprint(text: Column): Column = polyHash(text)

  /** 62-bit whole-document fingerprint (two independent wide rolling
    * hashes packed as `h31·HashMod + h131`) — the per-doc term of the
    * order-independent corpus release fingerprint (`bit_xor` aggregate):
    * collisions at 2⁻⁶² instead of [[fingerprint]]'s 20-bit slack. */
  def wideFingerprint(text: Column): Column =
    polyHashWide(text, 31L) * lit(HashMod) + polyHashWide(text, 131L)

  /**
   * Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003 —
   * the MOSS algorithm): over the k-gram hash stream, slide a window of
   * `w` consecutive hashes and select each window's minimum, ties to the
   * RIGHTMOST occurrence (the paper's robust winnowing — re-selecting the
   * same (pos, hash) across overlapping windows dedupes to one
   * fingerprint). Guarantees: any shared substring of length ≥ w+k−1
   * tokens shares at least one selected fingerprint (the detection floor),
   * and expected density is 2/(w+1) — the selected set is ~3× smaller than
   * the full shingle stream at w = 4, which is what makes fingerprint
   * joins cheap at corpus scale.
   *
   * Input: the [[shingleHashes]] stream. Output: `array<struct<pos:int,
   * fp:bigint>>`, position-sorted. Fewer than `w` shingles → empty (no
   * full window exists). Selection runs as the native
   * [[graft.plans.WinnowExpr]] — ONE compiled pass per row; the HOF
   * formulation ([[winnowHof]]) is CodegenFallback and re-interprets
   * O(n·w) lambda steps per document, and extraction is the hot stage of
   * the whole fingerprint family (index builds, in-session matches, the
   * streaming gate's per-batch projection). The spec pins the two
   * element-for-element.
   */
  def winnow(shingles: Column, w: Int = 4): Column = {
    require(w >= 1 && w <= 64, "winnow window 1..64 supported")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.plans.WinnowExpr(ColumnBridge.expression(shingles), w))
  }

  /** Higher-order reference for [[winnow]] — the executable statement of
    * the selection rule the native expression must reproduce exactly. */
  private[graft] def winnowHof(shingles: Column, w: Int = 4): Column = {
    require(w >= 1 && w <= 64, "winnow window 1..64 supported")
    val sel = transform(sequence(lit(0), size(shingles) - lit(w)), j =>
      aggregate(sequence(j, j + lit(w - 1)),
        struct(lit(-1).cast("int").as("pos"),
          lit(Long.MaxValue).as("fp")),
        (acc, i) => when(get(shingles, i) <= acc.getField("fp"),
            struct(i.cast("int").as("pos"), get(shingles, i).as("fp")))
          .otherwise(acc)))
    when(size(shingles) >= w, array_sort(array_distinct(sel)))
      .otherwise(array().cast("array<struct<pos:int,fp:bigint>>"))
  }
}

/**
 * DuckDB-dialect renderings of [[TextOps]] — ONE source of truth for the
 * constants, two renderings of the same arithmetic. Used to build
 * `SparkEntry.oracleSql` so the driver's DuckDB oracle computes bit-identical
 * numbers.
 */
object TextOpsSql {
  import TextOps._

  def tokens(text: String): String =
    s"list_filter(string_split($text, ' '), t -> t <> '')"

  def polyHash(s: String): String =
    s"(case when length($s) = 0 then 0 else list_reduce(" +
      s"list_transform(range(1, length($s)+1), i -> ascii(substr($s, i, 1))::BIGINT), " +
      s"(a, b) -> (a*31 + b) % $TokenMod) end)"

  def tokenHashes(toks: String): String =
    s"list_transform($toks, t -> ${polyHash("t")})"

  def polyHashWide(s: String, mult: Long): String =
    s"(case when length($s) = 0 then 0 else list_reduce(" +
      s"list_transform(range(1, length($s)+1), i -> ascii(substr($s, i, 1))::BIGINT), " +
      s"(a, b) -> (a*$mult + b) % $HashMod) end)"

  def tokenHashesWide(toks: String): String =
    s"list_transform($toks, t -> " +
      s"${polyHashWide("t", 31L)} * $HashMod + ${polyHashWide("t", 131L)})"

  /** Mirror of [[TextOps.wideFingerprint]]. */
  def wideFingerprint(text: String): String =
    s"(${polyHashWide(text, 31L)} * $HashMod + ${polyHashWide(text, 131L)})"

  def shingleHashes(thash: String, k: Int = 3): String = {
    // general positional-weight sum, same arithmetic as the Spark side for
    // every k (weights rendered as literals; *1 on the last term is a
    // no-op for the value)
    val combine = (0 until k)
      .map(d => s"$thash[i+${d + 1}]*${TextOps.powMod(k - 1 - d)}")
      .mkString("(", " + ", s") % $HashMod")
    s"(case when len($thash) >= $k then " +
      s"list_transform(range(0, len($thash)-$k+1), i -> $combine) " +
      s"else [] end)"
  }

  def minHashSignature(shingles: String, numHashes: Int = NumHashes): String =
    (0 until numHashes).map { j =>
      s"list_min(list_transform($shingles, s -> (${hashA(j)}*s + ${hashB(j)}) % $HashMod))"
    }.mkString("[", ", ", "]")

  def bandHash(sig: String, band: Int, rowsPerBand: Int = RowsPerBand): String =
    (0 until rowsPerBand)
      .map(r => s"$sig[${band * rowsPerBand + r + 1}]")
      .foldLeft("0")((acc, v) => s"(($acc)*31 + $v) % $HashMod")

  // The oracle rendering is per-bit list_sum passes (oracle performance is
  // irrelevant); integer addition is exact so any summation order matches
  // Spark's single sequential fold bit-for-bit.
  def simHash(thash: String, bits: Int = SimHashBits): String =
    (0 until bits).map { b =>
      s"(case when (case when len($thash) = 0 then 0 else list_reduce(" +
        s"list_transform($thash, t -> ((t >> $b) % 2) * 2 - 1), (a,b) -> a+b) end) > 0 " +
        s"then ${1L << b} else 0 end)"
    }.mkString("(", " + ", ")")

  def simHashBand(print: String, band: Int, width: Int = 16): String =
    s"(($print >> ${band * width}) % ${1L << width})"

  def hamming(a: String, b: String): String = s"bit_count(xor($a, $b))"

  def jaccard(a: String, b: String): String =
    s"(case when len($a) + len($b) - len(list_intersect($a, $b)) = 0 then 0.0 " +
      s"else len(list_intersect($a, $b))::DOUBLE / " +
      s"(len($a) + len($b) - len(list_intersect($a, $b)))::DOUBLE end)"

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  private def ratioIn(toks: String, words: Seq[String]): String =
    s"(case when len($toks) = 0 then 0.0 else " +
      s"len(list_filter($toks, t -> t in ${sqlList(words)}))::DOUBLE / len($toks)::DOUBLE end)"

  def langId(toks: String): String = {
    val en = ratioIn(toks, StopwordsEn)
    val es = ratioIn(toks, StopwordsEs)
    val de = ratioIn(toks, StopwordsDe)
    s"(case when $en = 0 and $es = 0 and $de = 0 then 'unk' " +
      s"when $en >= $es and $en >= $de then 'en' " +
      s"when $es >= $de then 'es' else 'de' end)"
  }

  def stopwordFrac(toks: String): String = ratioIn(toks, StopwordsAll)

  def punctCount(text: String): String =
    s"(length($text) - length(regexp_replace($text, '[.,;:!?]', '', 'g')))"

  def meanTokenLen(toks: String): String =
    s"(case when len($toks) = 0 then 0.0 else " +
      s"list_reduce(list_transform($toks, t -> length(t)::BIGINT), (a,b) -> a+b)::DOUBLE " +
      s"/ len($toks)::DOUBLE end)"

  /** Mirror of [[TextOps.winnow]], rendered over PACKED keys because
    * DuckDB's list_distinct cannot histogram struct lists: each (pos, fp)
    * packs as `fp·2^21 + (2^21−1−pos)` — fp-major with the position
    * REVERSED, so the window's `list_min` is the minimum fp with ties to
    * the RIGHTMOST position, exactly the Spark fold's rule. Decode with
    * [[winnowFp]]/[[winnowPos]]. Valid while the shingle stream is under
    * 2^21 elements — any oracle-scale document. fp < HashMod < 2^31 keeps
    * the product under 2^52, exact in BIGINT. */
  def winnow(shingles: String, w: Int = 4): String =
    s"(case when len($shingles) >= $w then " +
      s"list_sort(list_distinct(list_transform(range(len($shingles)-$w+1), j -> " +
      s"list_min(list_transform(range($w), d -> " +
      s"$shingles[j+d+1] * $WinnowPosSpan + ($WinnowPosSpan - 1 - (j+d))))))) " +
      s"else []::BIGINT[] end)"

  val WinnowPosSpan = 2097152L // 2^21

  def winnowFp(key: String): String = s"($key // $WinnowPosSpan)"
  def winnowPos(key: String): String =
    s"(${WinnowPosSpan - 1} - ($key % $WinnowPosSpan))"
}
