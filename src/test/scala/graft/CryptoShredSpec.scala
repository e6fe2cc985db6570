package graft

import graft.operators.CryptoShred
import org.apache.spark.sql.functions._

/** Crypto-shredding: GCM round-trip, per-subject key isolation, and
  * the key-deletion erasure semantics (shredded subjects decrypt to
  * NULL while everyone else still round-trips).
  */
class CryptoShredSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val data = Seq(
      (1L, "alice@example.com", "555-0101"),
      (2L, "bob@example.com", "555-0102"),
      (3L, "carol@example.com", "555-0103")
    ).toDF("user_id", "email", "phone")
    val keys = CryptoShred.deriveKeys(data, "user_id", masterSalt = "s3cr3t")
    (data, keys)
  }

  test("encrypt → decrypt round-trips every subject's columns exactly") {
    val (data, keys) = fixture
    val enc = CryptoShred.encrypt(data, keys, "user_id", Seq("email", "phone"))
    // ciphertext is not plaintext (and is binary)
    assert(enc.schema("email").dataType.typeName === "binary")
    val dec = CryptoShred.decrypt(enc, keys, "user_id", Seq("email", "phone"))
      .orderBy("user_id")
    assert(dec.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ===
      data.orderBy("user_id").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq)
  }

  test("shredding one subject's key makes ONLY that subject unreadable — data files untouched") {
    val (data, keys) = fixture
    val enc = CryptoShred.encrypt(data, keys, "user_id", Seq("email", "phone"))
      .cache() // the "immutable parquet": identical bytes before and after
    enc.count()
    val remaining = CryptoShred.shred(keys, "user_id", Seq(2L).toDF("user_id"))
    assert(remaining.count() === 2)
    val dec = CryptoShred.decrypt(enc, remaining, "user_id", Seq("email", "phone"))
      .orderBy("user_id").collect()
    assert(dec(0).getString(1) === "alice@example.com")
    assert(dec(1).isNullAt(1) && dec(1).isNullAt(2),
      "shredded subject must read as NULL")
    assert(dec(2).getString(1) === "carol@example.com")
    enc.unpersist()
  }

  test("keys are per-subject: one subject's key cannot decrypt another's ciphertext") {
    val (data, keys) = fixture
    val enc = CryptoShred.encrypt(data, keys, "user_id", Seq("email"))
    // swap everyone onto subject 1's key
    val k1 = keys.filter($"user_id" === 1L)
      .select($"__shred_key").head.getAs[Array[Byte]](0)
    val wrong = enc.withColumn("email",
      try_aes_decrypt($"email", lit(k1)).cast("string")).orderBy("user_id").collect()
    assert(wrong(0).getString(1) === "alice@example.com")
    assert(wrong(1).isNullAt(1) && wrong(2).isNullAt(1),
      "GCM auth must reject a foreign key with NULL, not garbage plaintext")
  }

  test("fail-closed: rows without a key are dropped by encrypt, not kept in plaintext") {
    val (data, keys) = fixture
    val partial = keys.filter($"user_id" =!= 3L)
    val enc = CryptoShred.encrypt(data, partial, "user_id", Seq("email"))
    assert(enc.count() === 2)
    assert(enc.filter($"user_id" === 3L).count() === 0)
  }
}
