package graft.sources

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side pushdown evaluator semantics — no Spark session needed.
  * The dangerous direction is OVER-pruning: a file the evaluator
  * wrongly rejects is never read, so the engine's residual filter
  * cannot restore its rows.
  */
class CatalogFiltersSpec extends AnyFunSuite {
  // U+10000 (𐀀): UTF-16 compares via its 0xD800 high surrogate —
  // BELOW U+F900 (豈) — while its UTF-8 lead byte 0xF0 sorts ABOVE
  // U+F900's 0xEF. Spark's UTF8String comparison is the byte order,
  // so the evaluator must agree with it, not with String.compareTo.
  private val supp = new String(Character.toChars(0x10000)) + ".txt"

  test("string ranges compare in UTF-8 byte order, not UTF-16") {
    assert(CatalogFilters.keeps(GreaterThan("name", "豈"), supp, supp, 1L))
    assert(!CatalogFilters.keeps(LessThan("name", "豈"), supp, supp, 1L))
    // and a plain ASCII sanity pair
    assert(CatalogFilters.keeps(GreaterThan("name", "a.txt"), "b.txt", "", 1L))
    assert(!CatalogFilters.keeps(GreaterThan("name", "b.txt"), "a.txt", "", 1L))
  }

  test("unknown leaves stay UNKNOWN through Not (no wrong prune)") {
    // md5 is not a listing column: EqualTo on it is unevaluable, and
    // both the filter and its negation must keep the file
    assert(CatalogFilters.keeps(EqualTo("md5", "x"), "a", "a", 1L))
    assert(CatalogFilters.keeps(Not(EqualTo("md5", "x")), "a", "a", 1L))
    // Kleene And/Or: False AND Unknown = False; True OR Unknown = True
    assert(!CatalogFilters.keeps(
      And(EqualTo("name", "z"), EqualTo("md5", "x")), "a", "a", 1L))
    assert(CatalogFilters.keeps(
      Or(EqualTo("name", "a"), EqualTo("md5", "x")), "a", "a", 1L))
  }

  test("length and In/StartsWith families evaluate on metadata") {
    assert(CatalogFilters.keeps(GreaterThan("length", 10L), "f", "f", 11L))
    assert(!CatalogFilters.keeps(GreaterThan("length", 10L), "f", "f", 10L))
    assert(CatalogFilters.keeps(In("name", Array("a", "b")), "b", "", 1L))
    assert(!CatalogFilters.keeps(In("name", Array("a", "b")), "c", "", 1L))
    assert(CatalogFilters.keeps(StringStartsWith("name", "pr."), "pr.x", "", 1L))
    assert(!CatalogFilters.keeps(StringStartsWith("name", "pr."), "x.pr", "", 1L))
  }

  test("fractional numeric literals are UNKNOWN, never a truncated prune") {
    // length < 5.7 is TRUE for a length-5 file; a longValue() truncation
    // to length < 5 would prune it unrecoverably. The evaluator must
    // treat non-integral literals as unevaluable (keep-by-default).
    assert(CatalogFilters.keeps(LessThan("length", java.lang.Double.valueOf(5.7)), "f", "f", 5L))
    assert(CatalogFilters.keeps(GreaterThan("length", java.lang.Double.valueOf(4.3)), "f", "f", 5L))
    // ...and its negation stays unknown too (no wrong prune either way)
    assert(CatalogFilters.keeps(Not(LessThan("length", java.lang.Double.valueOf(5.7))), "f", "f", 5L))
    // integral-valued doubles still evaluate exactly
    assert(!CatalogFilters.keeps(LessThan("length", java.lang.Double.valueOf(5.0)), "f", "f", 5L))
    assert(CatalogFilters.keeps(LessThan("length", java.lang.Double.valueOf(6.0)), "f", "f", 5L))
  }
}
