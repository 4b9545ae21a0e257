package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity
import graft.streaming.Streaming

/** [[Streaming.knnGraphMaintain]] unit laws, beyond q144's oracle gate
  * (which pins streamed == full-recompute on the fixture corpus):
  * checkpointed re-runs with no new files must not move the graph, and a
  * late third batch must fold in WITHOUT the prior corpus re-pairing
  * (the whole point of the incremental path).
  */
class KnnStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(ids: Range): Seq[(Long, Seq[Float], Int)] = {
    val rnd = new scala.util.Random(7)
    // ids is consumed twice (rows + the unit-norm draw), so materialize
    ids.map { i =>
      val v = Array.fill(8)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(x => (x / n).toFloat).toSeq, i % 2)
    }
  }

  test("maintain: no-new-files re-run is a no-op; late batch folds to full recompute") {
    val stage = java.nio.file.Files.createTempDirectory("graft_knn_stream")
    val src = stage.resolve("src").toString
    val state = stage.resolve("state").toString
    val ckpt = stage.resolve("ckpt").toString
    val all = vecs(0 until 30)
    def write(slice: Seq[(Long, Seq[Float], Int)]): Unit =
      slice.toDF("vec_id", "embedding", "label").repartition(1)
        .write.mode("append").parquet(src)
    write(all.take(10)); write(all.slice(10, 20))
    val schema = spark.read.parquet(src).schema
    def run(): Unit = Streaming.knnGraphMaintain(spark, src, schema,
      "vec_id", "embedding", Seq("label"), k = 3, state, ckpt)
    def graph(): Set[(Long, Long, Long)] =
      Streaming.latestKnnGraph(spark, state, schema, "vec_id")
        .select("node", "rank", "nbr").as[(Long, Long, Long)]
        .collect().toSet
    run()
    val after2 = graph()
    run() // checkpoint has seen every file: graph must not move
    assert(graph() === after2, "no-new-files re-run moved the graph")
    write(all.slice(20, 30))
    run() // late third batch folds in
    val full = Similarity.knnGraph(
        all.toDF("vec_id", "embedding", "label"),
        col("vec_id"), col("embedding"), Seq(col("label")), k = 3)
      .select("node", "rank", "nbr").as[(Long, Long, Long)].collect().toSet
    assert(graph() === full,
      "streamed graph after late batch != full recompute")
    assert(after2 !== full, "late batch changed nothing — law vacuous")
  }
}
