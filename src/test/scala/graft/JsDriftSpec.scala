package graft

import graft.ops.Corpus

/** JS drift against a JVM replay of the same quantized-contribution spec,
  * plus the analytic bounds that pin the formula's shape.
  */
class JsDriftSpec extends SparkSuite {

  test("jsDrift matches a JVM replay; identical groups give js = 0") {
    import spark.implicits._
    val docs = Seq(
      ("a", "x x y z"), ("a", "y w"),
      ("b", "x q q q"), ("b", "z z w x"))
    val df = docs.toDF("src", "text")
    val got = Corpus.jsDrift(df, "src", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // replay: counts per (group, token), quantized present terms + tail
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val gt = docs.flatMap { case (g, t) => toks(t).map(g -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = gt.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val ng = gt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n = ct.values.sum
    for ((g, (gotNg, gotJs)) <- got) {
      assert(gotNg == ng(g))
      val present = gt.collect { case ((`g`, t), c) => (t, c) }
      val t12 = present.map { case (t, c) =>
        val p = c.toDouble / ng(g); val q = ct(t).toDouble / n
        val m = (p + q) / 2.0
        math.floor((0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m))
          * 1e12 + 0.5).toLong
      }.sum
      val qnum = present.map { case (t, _) => ct(t) }.sum
      val js = t12.toDouble / 1e12 +
        (0.5 * (1.0 - qnum.toDouble / n)) * math.log(2.0)
      assert(gotJs == math.floor(js * 1e6 + 0.5) / 1e6, s"group $g")
      assert(gotJs >= 0.0 && gotJs <= 0.6931472)
    }
    // a single-group corpus has p = q everywhere → js exactly 0
    val one = Corpus.jsDrift(Seq(("a", "x y z")).toDF("src", "text"),
      "src", "text").head()
    assert(one.getDouble(2) == 0.0)
  }
}
