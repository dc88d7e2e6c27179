package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The NFKC-fold kernel (VERDICT r15 #5) and the dedup class built on
  * it: every re-encoded-mirror class the byte-level normalizers miss.
  */
class UnicodeFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("nfkcFold: fullwidth, ligature, composed AND decomposed accents " +
      "all fold to the same ascii") {
    val cases = Seq(
      ("ｈｅｌｌｏ", "hello"), // fullwidth
      ("ﬁle", "file"),                        // fi ligature
      ("café", "cafe"),                       // composed e-acute
      ("café", "cafe"),                      // decomposed e + mark
      ("naïve", "naive"),                     // i-diaeresis
      ("½", "1⁄2"))                      // compat fraction -> 1⁄2
    val out = cases.toDF("s", "want")
      .select($"want", UnicodeFunctions.nfkcFold($"s").as("got"))
      .as[(String, String)].collect()
    out.foreach { case (want, got) =>
      // the fraction slash U+2044 is not a mark — it survives the fold
      // (and the aggressive class strips it downstream); everything
      // else must be plain ascii
      assert(got == want, s"fold gave ${got.codePoints().toArray.toSeq}")
    }
  }

  test("nfkcFold: pure ASCII (punct, digits, whitespace) is the identity") {
    val s = "Hello, World -- 42 lines\tof *plain* ascii!"
    val got = Seq(s).toDF("s").select(UnicodeFunctions.nfkcFold($"s"))
      .as[String].collect()(0)
    assert(got == s)
  }

  test("nfkcFold: null in, null out; SQL registration works") {
    val n = Seq(Tuple1(Option.empty[String])).toDF("s")
      .select(UnicodeFunctions.nfkcFold($"s")).collect()(0)
    assert(n.isNullAt(0))
    val viaSql = spark.sql("SELECT nfkc_fold('ﬁｎｅ') AS f")
      .as[String].collect()(0)
    assert(viaSql == "fine")
  }

  test("unicodeNormalize: mirror classes collapse onto the ascii " +
      "original's aggressive-normalize key") {
    val original = "Hello, World - 2024!"
    val mirrors = Seq(
      "Héllo, Wörld - 2024!",   // accents (fold to e/o)
      "Ｈｅｌｌｏ, World - 2024!", // fullwidth Hello
      "Hello　World　2024")        // ideographic spaces
    val want = Seq(original).toDF("t")
      .select(Dedup.aggressiveNormalize($"t")).as[String].collect()(0)
    val got = mirrors.toDF("t")
      .select(Dedup.unicodeNormalize($"t")).as[String].collect()
    got.foreach(g => assert(g == want, s"got '$g' want '$want'"))
  }
}
