package graft

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** The typed Dataset surface: case-class Encoders, typed filter/map,
  * groupByKey + typed Aggregator, joinWith — proving the library's
  * frames round-trip through `as[T]` without schema drift. Typed
  * lambdas black-box Catalyst (no pushdown through them), so the
  * library keeps Column expressions on hot paths; this spec pins the
  * interop contract at the API boundary where type safety pays.
  */
class TypedApiSpec extends SparkSpec {
  import TypedApiSpec._
  import spark.implicits._

  private def payments: Dataset[Payment] = Seq(
    Payment(1L, "maria", 100.0, "regular"),
    Payment(2L, "jose", 250.0, "primera_cuota"),
    Payment(3L, "maria", 50.0, "regular"),
    Payment(4L, "ana", 75.0, "regular")).toDS()

  test("as[T] round-trips a DataFrame without schema drift") {
    val df = payments.toDF()
    val back = df.as[Payment]
    assert(back.collect().toSet == payments.collect().toSet)
    assert(back.schema == df.schema)
  }

  test("typed filter + map compose with Column-API stages") {
    val regulars = payments.filter(_.origen == "regular")
      .map(p => p.copy(monto = p.monto * 2))
      // back to Column API mid-pipeline: the supported interop direction
      .withColumn("flag", lit("x")).drop("flag").as[Payment]
    assert(regulars.collect().map(_.monto).sorted.toSeq == Seq(100.0, 150.0, 200.0))
  }

  test("groupByKey + typed Aggregator sums per student") {
    val total = new Aggregator[Payment, Double, Double] {
      def zero = 0.0
      def reduce(b: Double, p: Payment): Double = b + p.monto
      def merge(a: Double, b: Double): Double = a + b
      def finish(b: Double): Double = b
      def bufferEncoder = Encoders.scalaDouble
      def outputEncoder = Encoders.scalaDouble
    }.toColumn
    val got = payments.groupByKey(_.estudiante)
      .agg(total.name("total")).collect().toMap
    assert(got == Map("maria" -> 150.0, "jose" -> 250.0, "ana" -> 75.0))
  }

  test("joinWith keeps both sides as typed pairs") {
    val students = Seq(Student("maria", "PE"), Student("jose", "CO")).toDS()
    val pays = payments // bind once: column refs must come from THIS instance
    val joined: Dataset[(Payment, Student)] =
      pays.joinWith(students,
        pays("estudiante") === students("nombre"), "inner")
    val got = joined.collect()
    assert(got.length == 3) // maria x2 + jose x1; ana unmatched
    assert(got.forall { case (p, s) => p.estudiante == s.nombre })
  }

  test("typed mapGroups mirrors dedup keep-last semantics") {
    val last = payments.groupByKey(_.estudiante)
      .mapGroups((k, it) => it.maxBy(_.id))
    val viaColumns = graft.ops.Relational
      .dedupKeepLast(payments.toDF(), Seq("estudiante"), Seq(col("id")))
      .as[Payment]
    assert(last.collect().toSet == viaColumns.collect().toSet)
  }
}

object TypedApiSpec {
  case class Payment(id: Long, estudiante: String, monto: Double, origen: String)
  case class Student(nombre: String, pais: String)
}
