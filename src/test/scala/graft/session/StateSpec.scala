package graft.session

import org.scalatest.funsuite.AnyFunSuite
import graft.fts.Porter

class StateSpec extends AnyFunSuite {

  test("url state round-trips arbitrary payloads") {
    val payloads = Seq(
      """{"pipeline":[{"id":"p1","type":"source","table":"places_place"}],"search":"cafe"}""",
      "", "short", "ü†é unicode ♥", "x" * 10000)
    payloads.foreach { p =>
      val enc = UrlState.encode(p)
      assert(!enc.contains('+') && !enc.contains('/') && !enc.contains('=')) // url-safe
      assert(UrlState.decode(enc).contains(p))
    }
  }

  test("url state decode rejects corrupt input gracefully") {
    assert(UrlState.decode("not-base64!!!").isEmpty)
    assert(UrlState.decode("YWJjZA").isEmpty) // valid base64, not gzip
  }

  test("compression shrinks repetitive pipeline payloads") {
    val p = """{"id":"p1","type":"source","table":"places_place"},""" * 50
    assert(UrlState.encode(p).length < p.length / 2)
  }

  test("cell stringification: binary, null, nested, passthrough") {
    assert(RowShape.stringifyCell(null) == "")
    assert(RowShape.stringifyCell(Array[Byte](1, 2, 3)) == "<binary 3B>")
    assert(RowShape.stringifyCell("plain") == "plain")
    assert(RowShape.stringifyCell(BigInt("98765432109876543210")) == "98765432109876543210")
    assert(RowShape.stringifyCell(Seq(1, 2)) == "[1,2]")
    assert(RowShape.stringifyCell(12.5) == "12.5")
  }

  test("porter stemmer matches published vectors") {
    val vectors = Map(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file", "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "digitizer" -> "digit", "conformabli" -> "conform",
      "radicalli" -> "radic", "differentli" -> "differ",
      "vileli" -> "vile", "analogousli" -> "analog",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
      "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac",
      "adjustment" -> "adjust", "dependent" -> "depend",
      "adoption" -> "adopt", "homologou" -> "homolog",
      "communism" -> "commun", "activate" -> "activ",
      "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    val failures = vectors.collect {
      case (in, want) if Porter.stem(in) != want => s"$in: got ${Porter.stem(in)}, want $want"
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("stemmed FTS tokenization option") {
    // stemming folds inflections onto one index term
    assert(Porter.stem("running") == Porter.stem("runs"))
    assert(Porter.stem("connection") == Porter.stem("connections"))
  }
}
