package graft

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions applies injections cleanly; SQL function path works") {
    // apply() must register both functions without throwing (the
    // spark.sql.extensions config path instantiates + applies exactly
    // this object at session build time)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)

    // end-to-end SQL path through the session registry
    graft.plans.GraftFunctions.register(spark)
    val r = spark.sql("SELECT simhash64('a b c') AS sh, rolling_hash('abc') AS rh").head()
    assert(r.getLong(0) != 0L)
    assert(r.getLong(1) ==
      "abc".getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31 + (b & 0xff)))
  }
}
