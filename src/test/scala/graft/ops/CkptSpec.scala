package graft.ops

import org.scalatest.funspec.AnyFunSpec

import graft.SparkTestSession

/** VERDICT r19 item 9: the localCheckpoint convention (ccLabels,
  * minhashPairs, pipeline_e2e kept1) needs a reliable-checkpoint escape
  * hatch for clusters where executor loss must not fail the job. Default
  * behavior (conf unset) must stay exactly localCheckpoint.
  */
class CkptSpec extends AnyFunSpec {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  describe("Ckpt") {
    it("defaults to executor-local checkpoint when the dir conf is unset") {
      spark.conf.unset(Ckpt.DirConf)
      val out = Ckpt.eager(Seq(1, 2, 3).toDF("x"))
      assert(out.as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
      // local checkpoint leaves no reliable-checkpoint file behind
      assert(out.rdd.getCheckpointFile.isEmpty)
    }

    it("switches to a reliable checkpoint under spark.graft.checkpoint.dir") {
      val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
      spark.conf.set(Ckpt.DirConf, dir)
      try {
        val out = Ckpt.eager(Seq(4, 5).toDF("x"))
        assert(out.as[Int].collect().sorted.toSeq == Seq(4, 5))
        // the checkpoint dir was installed and data files were written
        assert(spark.sparkContext.getCheckpointDir.exists(_.contains(
          new java.io.File(dir).getName)))
        def files(f: java.io.File): Seq[java.io.File] = {
          val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
          kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(files)
        }
        assert(files(new java.io.File(dir)).nonEmpty,
          s"reliable checkpoint wrote nothing under $dir")
        // lazy flavor still returns the same rows
        val lz = Ckpt.lazily(Seq(6).toDF("x"))
        assert(lz.as[Int].collect().toSeq == Seq(6))
      } finally spark.conf.unset(Ckpt.DirConf)
    }
  }
}
