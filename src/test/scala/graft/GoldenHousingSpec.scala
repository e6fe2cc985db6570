package graft

import graft.operators.Cleaning

/** Golden end-to-end parity: the 78 raw rows stored in the reference's
  * housing.db (Austin, 2020-01-08) cleaned by our pipeline must match
  * the expected output computed with the reference's exact pandas
  * semantics (fixtures in src/test/resources, generation documented in
  * FIXTURES.md; casts are null-propagating — the documented deviation).
  */
class GoldenHousingSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def resource(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  test("housing.db 78 raw rows → 48 cleaned rows matching pandas-semantics golden") {
    val raw = spark.read
      .schema(Cleaning.rawSchema)
      .option("header", "true")
      .csv(resource("housing_raw.csv"))
    assert(raw.count() == 78)

    val cleaned = Cleaning.cleanListings(raw)
      .select(col("name"), col("unit"), col("sqft"), col("price"),
        col("bath").cast("double"), col("bed").cast("double"), col("zipcode"))
      .orderBy("name", "unit", "sqft", "price")
      .collect()

    val golden = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "name string, sqft int, price int, bath double, bed double, zipcode int, unit string"))
      .option("header", "true")
      .csv(resource("housing_clean_golden.csv"))
      .select(col("name"), col("unit"), col("sqft"), col("price"),
        col("bath"), col("bed"), col("zipcode"))
      .orderBy("name", "unit", "sqft", "price")
      .collect()

    assert(cleaned.length == 48, s"expected 48 cleaned rows, got ${cleaned.length}")
    assert(golden.length == 48)
    cleaned.zip(golden).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got == want, s"row $i mismatch:\n got  $got\n want $want")
    }
  }
}
