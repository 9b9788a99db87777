package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** VARIANT surface pins: the parsed column is a real VariantType (not
  * a string fallback), nested paths extract typed values, missing
  * paths are null under try_variant_get, and schema_of_variant reads
  * the constructed shape.
  */
class VariantQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("parse_json yields VariantType; nested typed extraction works") {
    val df = spark.sql(
      """SELECT parse_json('{"a": 7, "b": {"c": [1,2,3]}, "s": "x"}') AS v""")
    assert(df.schema.head.dataType.typeName == "variant",
      s"expected variant, got ${df.schema.head.dataType}")
    val row = df.selectExpr(
      "variant_get(v, '$.a', 'bigint') AS a",
      "variant_get(v, '$.b.c[1]', 'bigint') AS c1",
      "variant_get(v, '$.s', 'string') AS s",
      "try_variant_get(v, '$.missing', 'string') AS m",
      "schema_of_variant(v) AS sch").head()
    assert(row.getLong(0) == 7L && row.getLong(1) == 2L)
    assert(row.getString(2) == "x" && row.isNullAt(3))
    assert(row.getString(4).startsWith("OBJECT<"))
  }

  test("q359 round-trip equals the direct aggregate at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val viaVariant = VariantQueries.q359VariantExtract(spark, dir)
    val direct = graft.core.Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(FLOOR(100 * value) AS BIGINT)")).as("sum_cents"),
        countDistinct($"user_id" % 7).as("n_shards"))
    val diff = viaVariant.exceptAll(direct)
      .unionAll(direct.exceptAll(viaVariant)).count()
    assert(diff == 0L, s"variant round-trip diverged on $diff rows")
  }
}
