package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HashFunctions._

/** Golden vectors computed with the reference's own Python logic
  * (src/etl/transform/inpe_focos_diario.py:155-163 —
  * json.dumps(payload, ensure_ascii=False) + md5). Byte-compatibility of the
  * canonical payload is risk #1 in SURVEY §7.4.
  */
class HashFunctionsSpec extends AnyFunSuite {

  test("pyFloatRepr6 matches Python repr after round(x, 6)") {
    assert(pyFloatRepr6(pyRound6(-12.3456789)) == "-12.345679")
    assert(pyFloatRepr6(pyRound6(0.0)) == "0.0")
    assert(pyFloatRepr6(pyRound6(180.0)) == "180.0")
    assert(pyFloatRepr6(pyRound6(-1e-6)) == "-1e-06")
    assert(pyFloatRepr6(pyRound6(0.1)) == "0.1")
    assert(pyFloatRepr6(pyRound6(-44.9999995)) == "-45.0")
    assert(pyFloatRepr6(pyRound6(5.0)) == "5.0")
    assert(pyFloatRepr6(pyRound6(-3.125)) == "-3.125")
    assert(pyFloatRepr6(pyRound6(89.9999994)) == "89.999999")
    assert(pyFloatRepr6(pyRound6(-179.9999996)) == "-180.0")
    assert(pyFloatRepr6(pyRound6(1.5e-5)) == "1.5e-05")
    assert(pyFloatRepr6(pyRound6(0.0001)) == "0.0001")
  }

  test("canonical payload byte-matches Python json.dumps") {
    assert(canonicalEventPayload("2024-01-15", -12.3456789, -55.0,
      "2024-01-15 12:34:00", "AQUA_M-T") ==
      """{"file_date": "2024-01-15", "lat": -12.345679, "lon": -55.0, "view_ts": "2024-01-15 12:34:00", "satelite": "AQUA_M-T"}""")
    assert(canonicalEventPayload("2024-01-15", 0.0, 180.0, null, null) ==
      """{"file_date": "2024-01-15", "lat": 0.0, "lon": 180.0, "view_ts": null, "satelite": null}""")
    assert(canonicalEventPayload("2024-06-01", -3.125, 10.5, "çãé", "SAT") ==
      """{"file_date": "2024-06-01", "lat": -3.125, "lon": 10.5, "view_ts": "çãé", "satelite": "SAT"}""")
  }

  test("event hash golden vectors") {
    assert(eventHash("2024-01-15", -12.3456789, -55.0, "2024-01-15 12:34:00",
      "AQUA_M-T") == "fd64a35c1072072dbadddfd29dec2136")
    assert(eventHash("2024-01-15", 0.0, 180.0, null, null) ==
      "4f8025502337f84cb105c57132118345")
    assert(eventHash("2024-02-29", -1e-6, 0.1, "x", "GOES-16") ==
      "f0a12ba45dff9f59902622ea77b43f95")
    assert(eventHash("2024-06-01", 5.0, -44.9999995, "2024-06-01", "NOAA-20") ==
      "aed35c4a60673a48fd3fc58ce6d4bc18")
    assert(eventHash("2024-06-01", -3.125, 10.5, "çãé", "SAT") ==
      "25409df508b5bdbdedbed0822ef64ae1")
    assert(eventHash("2024-12-31", 89.9999994, -179.9999996, "t", "s") ==
      "a93cb0b961353ffeba98c69f4801839c")
    // CPython golden vectors for the round-16 parity fixes, generated with
    // json.dumps + hashlib.md5 directly:
    // signed zero — round(-1e-7, 6) is -0.0 and renders "-0.0"
    assert(eventHash("2024-01-01", -1e-7, 55.5, null, "AQUA") ==
      "e5ffe47b7c556104289b1b3ec7b38e1e")
    // \b and \f use Python's SHORT escapes, and -0.0 passes through
    assert(eventHash("2024-01-01", -0.0, 0.0, "a\bb\fc", "S") ==
      "461c5b6a8d4b1f98e25abf0639d29012")
    // a null file_date null-propagates instead of NPEing the task
    assert(eventHash(null, 1.0, 2.0, "t", "s") == null)
  }

  test("simhash: near-identical token lists have small hamming distance") {
    val a = "the quick brown fox jumps over the lazy dog again and again".split(" ").toSeq
    val b = a.drop(1)
    val c = Seq("completely", "different", "tokens", "entirely", "unrelated")
    assert(hammingDistance64(simHash64(a), simHash64(b)) <= 16)
    assert(hammingDistance64(simHash64(a), simHash64(c)) > 16)
    assert(simHash64(a) == simHash64(a)) // deterministic
  }
}
