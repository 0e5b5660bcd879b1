package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Gate ordering and auditability of the one-pass curation pipeline. */
class CurationSpec extends SparkSpecBase {
  import spark.implicits._

  test("curate applies gates in order and keeps the decision auditable") {
    val good = "the cat and the dog of a house with many windows and a door " * 4
    val docs = Seq(
      (1L, good),                       // keep (en, long enough, canonical)
      (2L, good),                       // exact dup of 1
      (3L, good + "extra tail words"),  // near dup of 1 (not exact)
      (4L, "der hund und die katze ist im haus " * 6), // lang=de -> dropped
      (5L, "ok")                        // en?, too short -> quality or lang
    ).toDF("doc_id", "text")

    val out = Curation.curate(docs, languages = Seq("en"), minQuality = 0.3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), Option(r.getAs[String]("reason")), Option(r.getAs[String]("split"))))
      .toMap

    assert(out(1L)._1 && out(1L)._2.isEmpty && out(1L)._3.nonEmpty)
    assert(out(2L) === ((false, Some("exact_dup"), None)))
    assert(out(3L) === ((false, Some("near_dup"), None)))
    assert(out(4L) === ((false, Some("lang"), None)))
    assert(!out(5L)._1 && Set("lang", "quality").contains(out(5L)._2.get))
    // every input doc has exactly one decision row
    assert(out.size == 5)
  }
}
