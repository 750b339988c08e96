package graft.fts

/** Porter stemming algorithm (M.F. Porter, 1980, "An algorithm for
  * suffix stripping" — public domain algorithm), implemented from the
  * published rule tables.
  *
  * DuckDB's FTS extension applies this stemmer by default before
  * indexing; `FtsIndex.build(..., stem = true)` gives the same
  * behavior. The oracle-checked queries use the unstemmed tokenizer
  * (both sides identical), so stemming is an opt-in fidelity feature.
  */
object Porter {

  private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** Measure m of the [C](VC)^m[V] form of the stem. */
  private def measure(w: String): Int = {
    var m = 0; var i = 0; val n = w.length
    while (i < n && !isVowel(w, i)) i += 1 // leading consonants
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1 // vowel run
      if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean = w.indices.exists(isVowel(w, _))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      !isVowel(w, w.length - 1)

  /** *o — stem ends cvc where the last c is not w, x or y. */
  private def endsCvc(w: String): Boolean =
    w.length >= 3 && !isVowel(w, w.length - 3) && isVowel(w, w.length - 2) &&
      !isVowel(w, w.length - 1) && !"wxy".contains(w.charAt(w.length - 1))

  private def replaceSuffix(w: String, suffix: String, repl: String, minM: Int): Option[String] =
    if (w.endsWith(suffix)) {
      val stem = w.dropRight(suffix.length)
      if (measure(stem) > minM) Some(stem + repl) else Some(w)
    } else None

  def stem(word: String): String = {
    var w = word.toLowerCase
    if (w.length <= 2) return w

    // Step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // Step 1b
    var step1bFlag = false
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else if (w.endsWith("ed") && containsVowel(w.dropRight(2))) {
      w = w.dropRight(2); step1bFlag = true
    } else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) {
      w = w.dropRight(3); step1bFlag = true
    }
    if (step1bFlag) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
      else if (endsDoubleConsonant(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (measure(w) == 1 && endsCvc(w)) w = w + "e"
    }

    // Step 1c
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // Step 2 (m > 0)
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.collectFirst { case (s, r) if w.endsWith(s) => (s, r) }.foreach { case (s, r) =>
      w = replaceSuffix(w, s, r, 0).getOrElse(w)
    }

    // Step 3 (m > 0)
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.collectFirst { case (s, r) if w.endsWith(s) => (s, r) }.foreach { case (s, r) =>
      w = replaceSuffix(w, s, r, 0).getOrElse(w)
    }

    // Step 4 (m > 1)
    val step4 = Seq(
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    val s4 = step4.find(w.endsWith)
    s4 match {
      case Some("ent") if w.endsWith("ient") => // "ion" special-case ordering guard
        w = replaceSuffix(w, "ent", "", 1).getOrElse(w)
      case Some(s) =>
        if (s == "ou" && w.endsWith("ion")) () // handled below
        w = replaceSuffix(w, s, "", 1).getOrElse(w)
      case None =>
        if (w.endsWith("ion") && w.length > 3 && "st".contains(w.charAt(w.length - 4)))
          w = replaceSuffix(w, "ion", "", 1).getOrElse(w)
    }

    // Step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // Step 5b
    if (measure(w) > 1 && endsDoubleConsonant(w) && w.endsWith("l")) w = w.dropRight(1)

    w
  }
}
