package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** q271's BPE trainer against a serial reference of the SAME documented
  * variant (argmax pair by (count DESC, a, b); merge application = one
  * left-to-right non-overlapping replace pass over the padded
  * sequence), on vocabularies crafted to hit the abutting-repeat cases
  * where replace semantics and canonical-BPE greedy rescan differ —
  * the reference encodes the documented behavior, so a divergence
  * here means the engine does not implement its own spec.
  */
class BpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** One left-to-right non-overlapping replace pass — string semantics,
    * exactly what Spark's and DuckDB's `replace` do on the padded form.
    */
  private def replacePass(seq: String, a: String, b: String): String = {
    val padded = " " + seq + " "
    val out = padded.replace(s" $a $b ", s" $a$b ")
    out.trim
  }

  private def referenceBpe(words: Map[String, Long],
      rounds: Int): Seq[(Long, String, String, Long)] = {
    var seqs = words.map { case (w, c) => w -> (w.mkString(" ") + " _", c) }
    (0 until rounds).map { i =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.values.foreach { case (seq, cnt) =>
        val syms = seq.split(" ")
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + cnt)
      }
      val ((a, b), c) = pc.toSeq
        .sortBy { case ((x, y), n) => (-n, x, y) }.head
      seqs = seqs.map { case (w, (seq, cnt)) =>
        w -> (replacePass(seq, a, b), cnt)
      }
      (i.toLong, a, b, c)
    }
  }

  private def trainOn(words: Map[String, Long], rounds: Int) = {
    import spark.implicits._
    operators.TextOps.bpeTrain(
      words.toSeq.toDF("w", "cnt"), rounds)
  }

  test("abutting-repeat vocabulary: engine == serial reference of the variant") {
    // 'xyxyxy' makes the (x, y) pair self-abutting after the first
    // merge decision; 'aaaa' is the same-symbol run; 'banana' chains
    // overlapping 'an a n'; weights force deterministic argmax order
    val words = Map("xyxyxy" -> 10L, "aaaa" -> 7L, "banana" -> 5L,
      "bananas" -> 3L, "xy" -> 2L)
    assert(trainOn(words, 6) === referenceBpe(words, 6))
  }

  test("fixture-shaped vocabulary: engine == serial reference, all rounds") {
    val words = Map("the" -> 50L, "then" -> 20L, "they" -> 18L,
      "there" -> 11L, "other" -> 9L, "these" -> 7L, "hat" -> 6L,
      "that" -> 13L, "than" -> 5L)
    assert(trainOn(words, 8) === referenceBpe(words, 8))
  }

  test("merge counts are non-increasing is NOT required, but determinism is") {
    // same input twice — bit-identical merge tables (no rand(), no
    // partition-order dependence in the argmax tie-break)
    val words = Map("abab" -> 4L, "abba" -> 4L, "baba" -> 4L)
    assert(trainOn(words, 4) === trainOn(words, 4))
  }
}
