package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels for the dedup hot path.
  *
  * The declarative formulation of word-shingling —
  * `transform(sequence(...), i -> concat_ws(' ', slice(tokens, i, n)))`
  * over `filter(split(lower(text), regex))` — evaluates an interpreted
  * lambda, a regex matcher and two array allocations per shingle. On a
  * corpus-scale dedup pass that is the dominant CPU term. This kernel
  * does the same work in one pass over the string with zero regex and
  * one output allocation.
  *
  * Semantics contract (bit-identical to the declarative version and
  * the DuckDB oracle, which both engines' queries verify):
  * tokens are maximal runs of [a-z0-9] in the ALREADY-LOWERCASED
  * input — the caller passes `lower(text)` so lowercase semantics stay
  * Spark's own. Any non-[a-z0-9] character is a separator; in UTF-8
  * every byte of a non-ASCII code point is >= 0x80, so byte-level
  * run-scanning equals the regex `[^a-z0-9]+` split.
  */
object TextExpressions {

  /** Word n-gram shingle array: space-joined n-token windows, first-
    * occurrence-deduplicated when `dedup`; a text with fewer than n
    * tokens yields the single shingle of all its tokens joined.
    */
  case class WordShingles(child: Expression, n: Int, dedup: Boolean)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, "shingle width must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "word_shingles"

    override protected def nullSafeEval(v: Any): Any = {
      val out = TextExpressions.buildShingles(v.asInstanceOf[UTF8String].toString, n, dedup)
      val arr = new Array[Any](out.length)
      var i = 0
      while (i < out.length) { arr(i) = UTF8String.fromString(out(i)); i += 1 }
      new GenericArrayData(arr)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Shared one-pass shingle builder (see WordShingles for the
    * semantics contract).
    */
  private[functions] def buildShingles(s: String, n: Int, dedup: Boolean): Array[String] = {
    val len = s.length
    // token spans as (start, end) index pairs — one scan, no regex
    val starts = new java.util.ArrayList[Int]()
    val ends = new java.util.ArrayList[Int]()
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      val isTok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (isTok) {
        val start = i
        i += 1
        while (i < len && {
          val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        starts.add(start); ends.add(i)
      } else i += 1
    }
    val nTok = starts.size()
    val sb = new java.lang.StringBuilder(32)
    def joined(from: Int, until: Int): String = {
      sb.setLength(0)
      var j = from
      while (j < until) {
        if (j > from) sb.append(' ')
        sb.append(s, starts.get(j), ends.get(j))
        j += 1
      }
      sb.toString
    }
    if (nTok < n) Array(joined(0, nTok))
    else if (dedup) {
      val seen = new java.util.LinkedHashSet[String]()
      var k = 0
      while (k <= nTok - n) { seen.add(joined(k, k + n)); k += 1 }
      seen.toArray(new Array[String](seen.size()))
    } else {
      val arr = new Array[String](nTok - n + 1)
      var k = 0
      while (k <= nTok - n) { arr(k) = joined(k, k + n); k += 1 }
      arr
    }
  }

  /** Column API: `word_shingles(lower(text), n)`. The caller is
    * expected to pass the raw text column; lowering happens here so
    * the contract ("runs of [a-z0-9] of the lowercased text") is
    * self-contained.
    */
  def word_shingles(text: Column, n: Int, dedup: Boolean): Column =
    ColumnBridge.column(WordShingles(
      ColumnBridge.expression(org.apache.spark.sql.functions.lower(text)), n, dedup))

  /** BPE subword encoding: tokenize (same [a-z0-9]-run contract as
    * WordShingles), then for each token replay the merge list in rank
    * order — each rule as ONE leftmost non-overlapping pass over the
    * symbol array (exactly the `replace` semantics of the
    * double-space-separated declarative form and the DuckDB oracle,
    * including its no-rescan-after-replacement behavior) — and emit
    * the flat subword array. One pass, zero regex, no per-token
    * string-join/split round-trips: the declarative chain costs
    * O(merges) interpreted replaces over a rebuilt separator string
    * per token and dominated the encode query's CPU.
    */
  case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "bpe_encode"

    override protected def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val len = s.length
      val out = new java.util.ArrayList[Any]()
      var i = 0
      var syms = new java.util.ArrayList[String]()
      var next = new java.util.ArrayList[String]()
      while (i < len) {
        val c = s.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          val start = i
          i += 1
          while (i < len && {
            val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
          }) i += 1
          // one symbol per character, then replay the merges
          syms.clear()
          var j = start
          while (j < i) { syms.add(String.valueOf(s.charAt(j))); j += 1 }
          merges.foreach { case (a, b) =>
            if (syms.size > 1) {
              next.clear()
              var k = 0
              while (k < syms.size) {
                if (k + 1 < syms.size && syms.get(k) == a && syms.get(k + 1) == b) {
                  next.add(a + b); k += 2
                } else { next.add(syms.get(k)); k += 1 }
              }
              val t = syms; syms = next; next = t
            }
          }
          var m = 0
          while (m < syms.size) { out.add(UTF8String.fromString(syms.get(m))); m += 1 }
        } else i += 1
      }
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Column API: `bpe_encode(lower(text), merges)`. */
  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeExpr(
      ColumnBridge.expression(org.apache.spark.sql.functions.lower(text)), merges))

  /** Shingle hash array: the 60-bit MD5 prefix of every (non-
    * deduplicated) shingle, exactly
    * `conv(substring(md5(shingle), 1, 15), 16, 10)` — i.e. the first
    * 15 hex digits of the MD5 as a long — but computed in the same
    * pass that builds the shingle, with a thread-local MessageDigest.
    * MinHash needs only these hashes, never the shingle strings, so
    * this skips one string materialization + three expression layers
    * (md5/substring/conv) per shingle and the synchronized
    * MessageDigest provider lookup per call.
    */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1, "shingle width must be >= 1")
    override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
      containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "shingle_hashes"

    override protected def nullSafeEval(v: Any): Any = {
      val shingles = TextExpressions.buildShingles(
        v.asInstanceOf[UTF8String].toString, n, dedup = false)
      val md = ShingleHashes.digest.get()
      val out = new Array[Any](shingles.length)
      var i = 0
      while (i < out.length) {
        md.reset()
        val h = md.digest(shingles(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 15 hex digits = bytes 0..6 in full + the high nibble
        // of byte 7 → a 60-bit non-negative long
        var acc = 0L
        var j = 0
        while (j < 7) { acc = (acc << 8) | (h(j) & 0xffL); j += 1 }
        acc = (acc << 4) | ((h(7) & 0xf0L) >> 4)
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  object ShingleHashes {
    private[functions] val digest = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  }

  def shingle_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(
      ColumnBridge.expression(org.apache.spark.sql.functions.lower(text)), n))

  /** MOSS-style winnowing fingerprints in one pass: canonical form
    * (runs of [a-z0-9] of the lowercased input joined by single
    * spaces — identical to
    * `trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))`),
    * character `k`-gram md5 15-hex-prefix hashes, sliding-window
    * minima (window `w`, monotonic deque — O(grams) not O(grams·w)),
    * distinct + sorted.
    *
    * The declarative formulation (`transform(sequence, i ->
    * substring(norm, i, k))`) is O(L²) per document — Spark's
    * `substring` re-scans from the string start for code-point
    * positioning — which is why this is a kernel like its shingle
    * siblings above. Hashes stay fixed-width hex STRINGS so
    * lexicographic minima equal numeric minima and the DuckDB oracle
    * reproduces them verbatim.
    */
  case class WinnowHashes(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 2 && w >= 1, "need k >= 2, w >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "winnow_hashes"

    override protected def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      // canonical form: token runs joined by single spaces
      val norm = {
        val sb = new java.lang.StringBuilder(s.length)
        var i = 0
        var first = true
        while (i < s.length) {
          val c = s.charAt(i)
          if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
            val start = i
            i += 1
            while (i < s.length && {
              val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
            }) i += 1
            if (!first) sb.append(' ')
            sb.append(s, start, i)
            first = false
          } else i += 1
        }
        sb.toString
      }
      val md = ShingleHashes.digest.get()
      val hexChars = "0123456789abcdef".toCharArray
      val L  = norm.length
      val nG = math.max(L - k + 1, 1)
      val hashes = new Array[String](nG)
      var i = 0
      while (i < nG) {
        md.reset()
        val gram = norm.substring(i, math.min(i + k, L))
        val h = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val cs = new Array[Char](15)
        var j = 0
        while (j < 15) {
          val b = h(j / 2) & 0xff
          cs(j) = hexChars(if (j % 2 == 0) b >> 4 else b & 0xf)
          j += 1
        }
        hashes(i) = new String(cs)
        i += 1
      }
      // sliding-window minima via monotonic deque of indices
      val win = math.min(w, nG)
      val nW  = math.max(nG - w + 1, 1)
      val set = new java.util.TreeSet[String]()
      val dq  = new Array[Int](nG)
      var head = 0; var tail = 0 // [head, tail) holds candidate indices
      i = 0
      while (i < nG) {
        while (tail > head && hashes(dq(tail - 1)).compareTo(hashes(i)) >= 0) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - win) head += 1
        if (i >= win - 1 && (i - win + 1) < nW) set.add(hashes(dq(head)))
        i += 1
      }
      val out = new Array[Any](set.size())
      val it = set.iterator()
      i = 0
      while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def winnow_hashes(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowHashes(
      ColumnBridge.expression(org.apache.spark.sql.functions.lower(text)), k, w))

  /** Language-ID heuristic in one pass: tokenize (same byte-run
    * contract as the shingle kernels), count stopword hits per
    * lexicon, argmax with ties to the lexicographically larger
    * language code, "und" when nothing hits — exactly
    * `greatest(struct(hits, lang))` over the declarative formulation,
    * which evaluates (langs+1) interpreted filter/size HOF chains per
    * row.
    *
    * `lexicons` maps language code → stopword set; passed at
    * construction so the kernel stays generic (TextAnalysis supplies
    * its built-in table).
    */
  case class LangIdExpr(child: Expression, lexicons: Seq[(String, Seq[String])])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "lang_id"

    // token → indexes of lexicons containing it (a word can be a
    // stopword in several languages: "de", "la", "un", ...)
    @transient private lazy val langs: Array[String] =
      lexicons.map(_._1).sorted.toArray
    @transient private lazy val wordLangs: java.util.HashMap[String, Array[Int]] = {
      val byLang = lexicons.toMap
      val m = new java.util.HashMap[String, Array[Int]]()
      langs.zipWithIndex.foreach { case (l, li) =>
        byLang(l).foreach { wrd =>
          val prev = m.get(wrd)
          m.put(wrd, if (prev == null) Array(li) else prev :+ li)
        }
      }
      m
    }

    override protected def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val hits = new Array[Int](langs.length)
      val len = s.length
      var i = 0
      while (i < len) {
        val c = s.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          val start = i
          i += 1
          while (i < len && {
            val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
          }) i += 1
          val ls = wordLangs.get(s.substring(start, i))
          if (ls != null) {
            var j = 0
            while (j < ls.length) { hits(ls(j)) += 1; j += 1 }
          }
        } else i += 1
      }
      // argmax; ties → larger lang code (langs ascending, so >=)
      var best = -1
      var bestHits = 0
      var j = 0
      while (j < langs.length) {
        if (hits(j) > 0 && hits(j) >= bestHits) { best = j; bestHits = hits(j) }
        j += 1
      }
      UTF8String.fromString(if (best >= 0) langs(best) else "und")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def lang_id(text: Column, lexicons: Seq[(String, Seq[String])]): Column =
    ColumnBridge.column(LangIdExpr(
      ColumnBridge.expression(org.apache.spark.sql.functions.lower(text)), lexicons))

  /** The full token/quality stats bundle in ONE pass over (raw,
    * lowered) text: struct(n_tokens, n_subwords_est, q_chars,
    * q_avg_token_len, q_stopword_ratio, q_distinct_ratio,
    * q_punct_ratio) — bit-identical to TextAnalysis's declarative
    * column bundle, which walks 6 separate interpreted HOF chains
    * (tokens() recomputed per metric) per row.
    *
    * Parity notes: char counts are CODE POINTS (Spark `length`
    * semantics — raw and lowered lengths differ when lowercasing
    * expands, e.g. İ); the punct class mirrors Java regex
    * `[a-zA-Z0-9\s]` (ASCII whitespace incl. \x0B); subword cost
    * ceil(len/4) is the integer (len+3)/4.
    */
  case class TokenStatsExpr(raw: Expression, lowered: Expression,
                            enStopwords: Seq[String])
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def left: Expression = raw
    override def right: Expression = lowered
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_tokens", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_subwords_est", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("q_chars", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("q_avg_token_len", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("q_stopword_ratio", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("q_distinct_ratio", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("q_punct_ratio", org.apache.spark.sql.types.DoubleType)))
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "token_stats"

    @transient private lazy val stopSet: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      enStopwords.foreach(s.add)
      s
    }

    override protected def nullSafeEval(rawAny: Any, lowAny: Any): Any = {
      val rawS = rawAny.asInstanceOf[UTF8String].toString
      val lowS = lowAny.asInstanceOf[UTF8String].toString
      // raw-side: code-point length + punct count
      var rawCps = 0L
      var punct = 0L
      var i = 0
      while (i < rawS.length) {
        val cp = rawS.codePointAt(i)
        rawCps += 1
        val ok = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
          (cp >= '0' && cp <= '9') || cp == ' ' || cp == '\t' || cp == '\n' ||
          cp == 0x0B || cp == '\f' || cp == '\r'
        if (!ok) punct += 1
        i += Character.charCount(cp)
      }
      // lowered-side: one token scan feeds count/subwords/stopwords/distinct
      var nTok = 0L
      var subwords = 0L
      var stopHits = 0L
      val distinct = new java.util.HashSet[String]()
      i = 0
      while (i < lowS.length) {
        val c = lowS.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          val start = i
          i += 1
          while (i < lowS.length && {
            val d = lowS.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
          }) i += 1
          val tok = lowS.substring(start, i)
          nTok += 1
          subwords += (tok.length + 3) / 4
          if (stopSet.contains(tok)) stopHits += 1
          distinct.add(tok)
        } else i += 1
      }
      val tokD = math.max(nTok.toDouble, 1.0)
      org.apache.spark.sql.catalyst.InternalRow(
        nTok, subwords, rawCps,
        rawCps.toDouble / tokD,
        stopHits.toDouble / tokD,
        distinct.size.toDouble / tokD,
        punct.toDouble / math.max(rawCps.toDouble, 1.0))
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(raw = l, lowered = r)
  }

  def token_stats(text: Column, enStopwords: Seq[String]): Column =
    ColumnBridge.column(TokenStatsExpr(
      ColumnBridge.expression(text),
      ColumnBridge.expression(org.apache.spark.sql.functions.lower(text)),
      enStopwords))

  /** Gopher-style repetition statistics in ONE pass: struct(n_tokens,
    * dup_word_frac, dup_2gram_frac, dup_3gram_frac, top_word_frac).
    * The declarative formulation needs the token array THREE more
    * times (2-gram list, 3-gram list, per-distinct-token multiplicity
    * scan — the last is O(n²) per document, ruinous on a 10k-token web
    * page); this kernel keeps hashmap counts during the single token
    * scan, so cost is O(tokens) per row regardless of document length.
    *
    * Semantics contract (pinned against the declarative form by
    * TextPropertySpec and against DuckDB by the oracle row):
    * dup_word_frac = (n − n_distinct)/max(n,1); an n-gram list of a
    * doc with fewer than n tokens is EMPTY (no whole-text fallback —
    * unlike shingles, repetition over a padded singleton is
    * meaningless) and its dup fraction is 0; top_word_frac = max
    * single-token multiplicity / n, 0 when empty. All fractions are
    * exact-integer double divisions, so both engines agree bitwise.
    */
  case class RepetitionStatsExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_tokens", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("dup_word_frac", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("dup_2gram_frac", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("dup_3gram_frac", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("top_word_frac", org.apache.spark.sql.types.DoubleType)))
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "repetition_stats"

    override protected def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val counts = new java.util.HashMap[String, Int]()
      val g2 = new java.util.HashSet[String]()
      val g3 = new java.util.HashSet[String]()
      var nTok = 0L
      var prev1: String = null // token n-1
      var prev2: String = null // token n-2
      var maxCount = 0
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          val start = i
          i += 1
          while (i < s.length && {
            val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
          }) i += 1
          val tok = s.substring(start, i)
          nTok += 1
          val n = counts.merge(tok, 1, (a, b) => a + b)
          if (n > maxCount) maxCount = n
          if (prev1 != null) g2.add(prev1 + " " + tok)
          if (prev2 != null) g3.add(prev2 + " " + prev1 + " " + tok)
          prev2 = prev1
          prev1 = tok
        } else i += 1
      }
      val n2 = math.max(nTok - 1, 0L) // total 2-grams
      val n3 = math.max(nTok - 2, 0L)
      org.apache.spark.sql.catalyst.InternalRow(
        nTok,
        (nTok - counts.size).toDouble / math.max(nTok, 1L).toDouble,
        if (n2 > 0) (n2 - g2.size).toDouble / n2.toDouble else 0.0,
        if (n3 > 0) (n3 - g3.size).toDouble / n3.toDouble else 0.0,
        if (nTok > 0) maxCount.toDouble / nTok.toDouble else 0.0)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def repetition_stats(text: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(
      ColumnBridge.expression(org.apache.spark.sql.functions.lower(text))))

  /** SimHash fingerprint per document in one pass — SimHash is a
    * purely per-row computation (tokenize → tf → per-token md5 bit
    * votes → sign), but the declarative formulation pays TWO full
    * shuffles for it (explode + groupBy(id, token) for tf, then a
    * 64-aggregate groupBy(id) for the votes): at corpus scale that
    * moves the entire token stream through the cluster for a value
    * each row can compute locally. This kernel does tf in a local
    * hashmap and votes in a tight loop; output and semantics are
    * bit-identical (bit b of the md5 = bit (7−b%8) of byte b/8;
    * vote +tf/−tf; strictly-positive sum → '1').
    */
  case class SimHashExpr(child: Expression, bits: Int)
      extends UnaryExpression with CodegenFallback {
    require(bits % 4 == 0 && bits > 0 && bits <= 128, "bits must be multiple of 4, <= 128")
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "simhash"

    override protected def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      val tf = new java.util.HashMap[String, Long]()
      val len = s.length
      var i = 0
      while (i < len) {
        val c = s.charAt(i)
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          val start = i
          i += 1
          while (i < len && {
            val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
          }) i += 1
          tf.merge(s.substring(start, i), 1L, (a, b) => a + b)
        } else i += 1
      }
      val votes = new Array[Long](bits)
      val md = ShingleHashes.digest.get()
      val it = tf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        md.reset()
        val h = md.digest(e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val t = e.getValue
        var b = 0
        while (b < bits) {
          if (((h(b / 8) >> (7 - b % 8)) & 1) == 1) votes(b) += t else votes(b) -= t
          b += 1
        }
      }
      val cs = new Array[Char](bits)
      var b = 0
      while (b < bits) { cs(b) = if (votes(b) > 0) '1' else '0'; b += 1 }
      UTF8String.fromString(new String(cs))
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def simhash(text: Column, bits: Int): Column =
    ColumnBridge.column(SimHashExpr(
      ColumnBridge.expression(org.apache.spark.sql.functions.lower(text)), bits))

  private def litToInt(e: Expression): Int = e.eval() match {
    case i: Int  => i
    case l: Long => l.toInt
    case other   => throw new IllegalArgumentException(s"expected integer literal, got $other")
  }

  /** Register the text kernels for SQL use (sqlOverride users):
    * word_shingles(text[, n]) and shingle_hashes(text[, n]).
    * Idempotent.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val lower = (e: Expression) =>
      org.apache.spark.sql.catalyst.expressions.Lower(e)
    reg.createOrReplaceTempFunction("word_shingles",
      es => WordShingles(lower(es.head), es.lift(1).map(litToInt).getOrElse(3), dedup = true),
      "built-in")
    reg.createOrReplaceTempFunction("shingle_hashes",
      es => ShingleHashes(lower(es.head), es.lift(1).map(litToInt).getOrElse(3)),
      "built-in")
    reg.createOrReplaceTempFunction("winnow_hashes",
      es => WinnowHashes(lower(es.head),
        es.lift(1).map(litToInt).getOrElse(8), es.lift(2).map(litToInt).getOrElse(4)),
      "built-in")
  }
}
