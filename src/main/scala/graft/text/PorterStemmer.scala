package graft.text

/** English (Porter2 / Snowball) stemmer, implemented from the public
  * Snowball specification. The reference engine stems BM25 tokens with
  * rust-stemmers' English algorithm (reference: src/hybrid.rs:258-267),
  * which is this same Porter2 definition, so token equality classes — and
  * therefore BM25 tf/df statistics — line up.
  *
  * Pure function String => String; called from a UDF (tokenization is
  * inherently scalar string work — there is nothing for codegen to fuse).
  */
object PorterStemmer {

  private val vowels = "aeiouy".toSet
  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt".toSet

  private val exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // invariant forms
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptions2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring", "proceed",
    "exceed", "succeed")

  def stem(word0: String): String = {
    if (word0.length <= 2) return word0
    var w = word0
    if (w.startsWith("'")) w = w.substring(1)
    exceptions1.get(w) match {
      case Some(r) => return r
      case None    =>
    }
    if (w.length <= 2) return w

    // Mark consonant-y as 'Y' (start of word, or after a vowel).
    val sb = new StringBuilder(w)
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && vowels(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString

    val (r1, r2) = regions(w)

    w = step0(w)
    w = step1a(w)
    if (exceptions2(w)) return w.toLowerCase(java.util.Locale.ROOT)
    w = step1b(w, r1)
    w = step1c(w)
    w = step2(w, r1)
    w = step3(w, r1, r2)
    w = step4(w, r2)
    w = step5(w, r1, r2)
    w.toLowerCase(java.util.Locale.ROOT)
  }

  /** R1/R2 start offsets (Snowball definition, with the gener-/commun-/
    * arsen- prefix special case).
    */
  private def regions(w: String): (Int, Int) = {
    val r1 =
      if (w.startsWith("gener")) 5
      else if (w.startsWith("commun")) 6
      else if (w.startsWith("arsen")) 5
      else regionAfterVC(w, 0)
    val r2 = regionAfterVC(w, r1)
    (r1, r2)
  }

  /** First position after the first non-vowel following a vowel, at/after
    * `from`; w.length if none.
    */
  private def regionAfterVC(w: String, from: Int): Int = {
    var i = from
    while (i < w.length && !isVowel(w, i)) i += 1      // skip to vowel
    while (i < w.length && isVowel(w, i)) i += 1       // skip vowels
    if (i < w.length) i + 1 else w.length
  }

  @inline private def isVowel(w: String, i: Int): Boolean =
    vowels(w.charAt(i)) && w.charAt(i) != 'Y' // 'Y' is a consonant marker

  /** Short syllable: vowel + non-vowel(≠wxY) preceded by non-vowel, or a
    * word-initial vowel + non-vowel.
    */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w, 0) && !isVowel(w, 1)
    else if (n >= 3) {
      val c = w.charAt(n - 2)
      isVowel(w, n - 2) && !isVowel(w, n - 1) &&
        !"wxY".contains(w.charAt(n - 1)) && !isVowel(w, n - 3) && vowels.contains(c)
    } else false
  }

  private def isShortWord(w: String, r1: Int): Boolean =
    endsShortSyllable(w) && r1 >= w.length

  private def containsVowel(w: String, until: Int): Boolean =
    (0 until until).exists(isVowel(w, _))

  private def step0(w: String): String =
    if (w.endsWith("'s'")) w.dropRight(3)
    else if (w.endsWith("'s")) w.dropRight(2)
    else if (w.endsWith("'")) w.dropRight(1)
    else w

  private def step1a(w: String): String = {
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("us") || w.endsWith("ss")) w
    else if (w.endsWith("s")) {
      // delete if the preceding word part contains a vowel not immediately
      // before the s
      if (containsVowel(w, w.length - 2)) w.dropRight(1) else w
    } else w
  }

  private def step1b(w0: String, r1: Int): String = {
    var w = w0
    if (w.endsWith("eedly")) {
      if (w.length - 5 >= r1) w = w.dropRight(3)
      w
    } else if (w.endsWith("eed")) {
      if (w.length - 3 >= r1) w = w.dropRight(1)
      w
    } else {
      val suf = Seq("ingly", "edly", "ing", "ed").find(w.endsWith)
      suf match {
        case Some(s) if containsVowel(w, w.length - s.length) =>
          w = w.dropRight(s.length)
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w + "e"
          else if (w.length >= 2 && doubles(w.takeRight(2))) w.dropRight(1)
          else if (isShortWord(w, r1)) w + "e"
          else w
        case _ => w
      }
    }
  }

  private def step1c(w: String): String =
    if (w.length > 2 && (w.endsWith("y") || w.endsWith("Y")) &&
      !isVowel(w, w.length - 2))
      w.dropRight(1) + "i"
    else w

  // (suffix, replacement) in longest-match-first order; special-cased below:
  // ogi (requires preceding l), li (requires valid li-ending).
  private val step2Subs: Seq[(String, String)] = Seq(
    "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
    "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
    "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
    "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
    "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
    "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
    "bli" -> "ble", "ogi" -> "og", "li" -> "")

  private def step2(w: String, r1: Int): String =
    step2Subs.find { case (s, _) => w.endsWith(s) } match {
      case Some((s, rep)) if w.length - s.length >= r1 =>
        if (s == "ogi") {
          if (w.length > 3 && w.charAt(w.length - 4) == 'l')
            w.dropRight(s.length) + rep
          else w
        } else if (s == "li") {
          if (w.length > 2 && liEnding(w.charAt(w.length - 3)))
            w.dropRight(s.length) + rep
          else w
        } else w.dropRight(s.length) + rep
      case _ => w
    }

  private val step3Subs: Seq[(String, String)] = Seq(
    "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
    "icate" -> "ic", "iciti" -> "ic", "ical" -> "ic", "ness" -> "",
    "ful" -> "")

  private def step3(w: String, r1: Int, r2: Int): String = {
    if (w.endsWith("ative")) {
      return if (w.length - 5 >= r2) w.dropRight(5) else w
    }
    step3Subs.find { case (s, _) => w.endsWith(s) } match {
      case Some((s, rep)) if w.length - s.length >= r1 =>
        w.dropRight(s.length) + rep
      case _ => w
    }
  }

  private val step4Sufs: Seq[String] = Seq(
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ism",
    "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic")

  private def step4(w: String, r2: Int): String =
    step4Sufs.find(w.endsWith) match {
      case Some("ion") =>
        if (w.length - 3 >= r2 && w.length > 3 &&
          (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
          w.dropRight(3)
        else w
      case Some(s) if w.length - s.length >= r2 => w.dropRight(s.length)
      case _ => w
    }

  private def step5(w: String, r1: Int, r2: Int): String = {
    if (w.endsWith("e")) {
      if (w.length - 1 >= r2) w.dropRight(1)
      else if (w.length - 1 >= r1 && !endsShortSyllable(w.dropRight(1)))
        w.dropRight(1)
      else w
    } else if (w.endsWith("l")) {
      if (w.length - 1 >= r2 && w.length > 1 && w.charAt(w.length - 2) == 'l')
        w.dropRight(1)
      else w
    } else w
  }
}
