package graft.catalog

import graft.SparkSpec
import graft.api.IngestError
import graft.core.{Tables, Types}
import org.apache.spark.sql.types._

class CatalogSpec extends SparkSpec {

  test("C1/C2/C3: list, exists, describe over registered tables") {
    Tables.registerAll(spark, sf)
    val names = Catalog.listTables(spark)
    assert(Tables.all.forall(names.contains))
    assert(Catalog.tableExists(spark, "lineitem"))
    assert(!Catalog.tableExists(spark, "nope"))
    intercept[IngestError.TableNotFound] { Catalog.describeTable(spark, "nope") }
    val cols = Catalog.describeTable(spark, "lineitem")
    assert(cols.map(_.name).take(3) == Seq("l_orderkey", "l_partkey", "l_suppkey"))
    assert(cols.find(_.name == "l_quantity").get.`type` == "Float64")
    assert(cols.find(_.name == "l_shipdate").get.`type` == "DateTime")
  }

  test("C4: health probe") {
    assert(Catalog.health(spark))
  }

  test("type mapping is the reference table both ways (main.py:250-256)") {
    assert(Types.toExternalName(LongType) == "Int64")
    assert(Types.toExternalName(DoubleType) == "Float64")
    assert(Types.toExternalName(BooleanType) == "UInt8")
    assert(Types.toExternalName(TimestampType) == "DateTime")
    assert(Types.toExternalName(StringType) == "String")
    assert(Types.fromExternalName("Int64") == LongType)
    assert(Types.fromExternalName("Float64") == DoubleType)
    assert(Types.fromExternalName("UInt8") == BooleanType)
    assert(Types.fromExternalName("DateTime") == TimestampType)
    assert(Types.fromExternalName("SomethingElse") == StringType)
  }

  test("catalog ops launch no Spark job (lightweight-metadata parity)") {
    Tables.registerAll(spark, sf)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    Catalog.describeTable(spark, "lineitem")
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before)
  }
}
