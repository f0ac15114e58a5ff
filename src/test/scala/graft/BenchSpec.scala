package graft

import org.scalatest.funsuite.AnyFunSuite

/** Dry tests of the bench harness's self-defense trigger (r17): the
  * adjudication re-run fires on committed-ruler inflation only — never
  * on sub-second jitter, never without a ruler — and the ruler reader
  * survives real committed records.
  */
class BenchSpec extends AnyFunSuite {

  test("adjudication trigger: ratio x floor x cap, largest inflation first") {
    val ruler = Map("a" -> 1.0, "b" -> 0.2, "c" -> 5.0, "d" -> 0.1)
    val current = Seq(
      "a" -> 3.5,  // > 3x ruler and > 1 s floor -> suspect (ratio 3.5)
      "b" -> 0.9,  // inflated 4.5x but under the 1 s floor -> no
      "c" -> 14.0, // 2.8x -> under the ratio -> no
      "d" -> 2.0,  // 20x -> suspect, ranks first
      "e" -> 50.0) // no committed ruler -> no
    assert(Bench.adjudicationSuspects(current, ruler) == Seq("d", "a"))
  }

  test("adjudication trigger caps the re-run set at MaxRerun, keeping the worst") {
    val ruler = (1 to 40).map(i => s"q$i" -> 0.5).toMap
    val current = (1 to 40).map(i => s"q$i" -> (1.0 + i.toDouble)) // all inflated
    val got = Bench.adjudicationSuspects(current, ruler)
    assert(got.size == Bench.MaxRerun)
    assert(got.head == "q40") // largest ratio first
  }

  test("committedRuler reads real committed records and takes per-query mins") {
    // the repo carries BENCH_LOCAL_r15 (clean) and r16 (driver-
    // contaminated: heavy_hitters at 24.95 where r15 reads sub-second);
    // the min across records is what makes the ruler usable
    val ruler = Bench.committedRuler(excludeRound = Some(99))
    assert(ruler.nonEmpty, "no committed BENCH_LOCAL records parsed")
    assert(ruler.get("heavy_hitters").exists(_ < 5.0),
      s"heavy_hitters ruler should come from the clean record: ${ruler.get("heavy_hitters")}")
  }
}
