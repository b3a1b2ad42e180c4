package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine matches a hand-computed value") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))).toDF("a", "b")
    val got = df.select(VectorOps.cosineSim(col("a"), col("b")).as("c"))
      .collect()(0).getDouble(0)
    val expected = (3.0 + 4.0 + 3.0) / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - expected) < 1e-15)
  }

  test("native cosine is bit-identical to the higher-order-function fold") {
    val e = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = e.select(col("vec_id").as("ida"), col("v").as("va"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("v").as("vb")))
      .filter(col("ida") < col("idb"))
    val fold = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x) /
      (sqrt(aggregate(transform(col("va"), x => x * x), lit(0.0), (a, x) => a + x)) *
        sqrt(aggregate(transform(col("vb"), x => x * x), lit(0.0), (a, x) => a + x)))
    val diff = pairs
      .select((VectorOps.cosineSim(col("va"), col("vb")) - fold).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0, s"native vs fold diverged by $diff")
  }

  test("cosine_sim is SQL-callable after install") {
    VectorOps.install(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-15)
  }

  test("null inputs yield null, mismatched types fail analysis") {
    val r = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c")
      .collect()(0)
    assert(r.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT cosine_sim('not an array', array(1.0d))").collect()
    }
  }

  test("native md5 prefix equals the conv(substr(md5)) formulation") {
    val df = Tables.documents(spark, sf).select(col("text")).limit(200)
    val diff = df.select(
      (graft.functions.Hashing.hash56(col("text")) -
        conv(substring(md5(col("text")), 1, 14), 16, 10).cast("long")).as("d56"),
      (graft.functions.Hashing.hash48(col("text")) -
        conv(substring(md5(col("text")), 1, 12), 16, 10).cast("long")).as("d48"))
      .agg(max(abs(col("d56"))), max(abs(col("d48")))).collect()(0)
    assert(diff.getLong(0) == 0L && diff.getLong(1) == 0L)
  }

  test("q25 approx distinct is within 5% of exact") {
    // q25 now gates the bound itself: the *_ok booleans must all be
    // true, and the exact columns must match a direct computation.
    val rows = ops.Relational.q25(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Boolean]("parts_ok") && r.getAs[Boolean]("orders_ok")),
      rows.mkString("; "))
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_parts") == exact(r.getString(0)))
    }
  }
}
