package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column

/** TEMP: stage-level timing of q32 simhash at sf0.1. */
object ProfileQ32 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def toks(c: Column): Column = split(c, " ")
    def md5Int(c: Column): Column =
      conv(substring(md5(c), 1, 8), 16, 10).cast(LongType)
    def shingles(c: Column): Column = {
      val t = toks(c)
      when(size(t) >= 3,
        array_distinct(transform(sequence(lit(0), size(t) - 3), i =>
          concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2),
            element_at(t, i + 3)))))
        .otherwise(array().cast(ArrayType(StringType)))
    }

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docsRaw = spark.read.parquet(s"$d/documents.parquet")

    time("shingles only") {
      docsRaw.select(col("doc_id"), shingles(col("text")).as("dt"))
        .select(sum(size(col("dt")))).collect()
    }
    time("shingles+md5") {
      docsRaw.select(col("doc_id"),
        transform(shingles(col("text")), t => md5Int(t)).as("hs"))
        .select(sum(size(col("hs")))).collect()
    }
    val pow2 = typedLit((0 until 32).map(p => 1L << p))
    val dt = shingles(col("text"))
    val counts = aggregate(
      transform(dt, t => md5Int(t)),
      array_repeat(lit(0L), 32),
      (acc, h) => zip_with(acc, pow2, (c, b) =>
        c + when(h.bitwiseAND(b) =!= 0L, 1L).otherwise(0L)))
    time("counts fold") {
      docsRaw.select(col("doc_id"), counts.as("cnt"))
        .select(sum(element_at(col("cnt"), 1))).collect()
    }
    val n = size(dt)
    val fp = aggregate(
      zip_with(counts, pow2, (c, b) => when(c * 2 > n, b).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
    val docs = docsRaw.select(col("doc_id"), fp.as("fp")).persist()
    time("fp materialize") { docs.count() }
    val bands = docs.select(col("doc_id"), col("fp"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("fp"), 8 * b).bitwiseAND(lit(255L)).as("key"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("fp"), col("bk.band").as("band"),
        col("bk.key").as("key"))
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.fp").as("fa"), col("b.fp").as("fb"))
      .distinct()
    time("cand join+distinct") { cand.count() }
    time("final hamming") {
      cand.select(col("da"), col("db"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).as("hamming"))
        .filter(col("hamming") <= 3).count()
    }
    spark.stop()
  }
}
