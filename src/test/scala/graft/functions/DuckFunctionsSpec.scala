package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function unit tests (no Spark session). Expected values cross-
  * checked against the reference engine's behavior. */
class DuckFunctionsSpec extends AnyFunSuite {

  test("stripAccents removes combining marks") {
    assert(DuckFunctions.stripAccents("café étude") == "cafe etude")
    assert(DuckFunctions.stripAccents("naïve Ångström") == "naive Angstrom")
    assert(DuckFunctions.stripAccents(null) == null)
  }

  test("unicode codepoint") {
    assert(DuckFunctions.unicodeCodepoint("A") == 65)
    assert(DuckFunctions.unicodeCodepoint("€x") == 8364)
    assert(DuckFunctions.unicodeCodepoint("") == -1)
  }

  test("hamming counts differing positions") {
    assert(DuckFunctions.hamming("abcde", "abcdf") == 1L)
    assert(DuckFunctions.hamming("aaaa", "aaaa") == 0L)
    intercept[IllegalArgumentException](DuckFunctions.hamming("ab", "abc"))
  }

  test("jaccard over character sets (reference semantics)") {
    // verified against the oracle: jaccard('hello','world') = 2/7
    assert(math.abs(DuckFunctions.jaccardChars("hello", "world") - 2.0 / 7.0) < 1e-12)
    assert(DuckFunctions.jaccardChars("abc", "abd") == 0.5)
    assert(DuckFunctions.jaccardChars("", "") == 1.0)
  }

  test("jaro_winkler matches reference values") {
    // verified against the oracle: 0.9611…, 0.84
    assert(math.abs(DuckFunctions.jaroWinkler("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(DuckFunctions.jaroWinkler("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(DuckFunctions.jaroWinkler("same", "same") == 1.0)
  }

  test("strftime to Java pattern translation") {
    assert(DuckFunctions.strftimeToJava("%Y-%m-%d") == "yyyy-MM-dd")
    assert(DuckFunctions.strftimeToJava("%H:%M:%S") == "HH:mm:ss")
    assert(DuckFunctions.strftimeToJava("%Y/%m/%d %H:%M") == "yyyy/MM/dd HH:mm")
    assert(DuckFunctions.strftimeToJava("%a %B %d") == "EEE MMMM dd")
  }

  test("glob to regex") {
    assert(DuckFunctions.globToRegex("a*") == "^a.*$")
    assert(DuckFunctions.globToRegex("*.csv") == "^.*\\.csv$")
    assert("file1.csv".matches(DuckFunctions.globToRegex("file?.csv")))
    assert(!"file12.csv".matches(DuckFunctions.globToRegex("file?.csv")))
  }
}
