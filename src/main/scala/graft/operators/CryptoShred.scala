package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.GraftFunctions.md5_fast

/** Crypto-shredding — the right-to-be-forgotten mechanism that scales
  * where physical deletion doesn't: every data subject's sensitive
  * columns are encrypted with that SUBJECT'S OWN key (Spark's native
  * codegen'd `aes_encrypt`/`try_aes_decrypt`, AES-GCM), and the key
  * table is the only mutable state. Forgetting a subject = deleting
  * one key row — the ciphertext scattered across years of immutable
  * parquet (and every backup of it) becomes permanently unreadable
  * without rewriting a single data file. Complements
  * `Sinks.deleteByKey` (physical erase, needs a rewrite of every
  * touched partition): shredding is O(1) per request, the erase
  * becomes an eventual compaction concern.
  *
  * Scale shape: encrypt/decrypt are scan-speed column expressions;
  * the key join is keyed on the subject (broadcast when the subject
  * universe fits, shuffle otherwise — same shapes as every dimension
  * join here). `try_aes_decrypt` turns a missing/wrong key into NULL,
  * not an exception, so a post-shred scan keeps running and the
  * shredded subject's fields read as absent — exactly the downstream
  * semantics a forgotten record should have.
  *
  * Key derivation here is deterministic (HKDF-like: md5 of subject +
  * master salt) so specs reproduce; production swaps `deriveKeys` for
  * a KMS-backed table — every other moving part (join shape, GCM
  * round-trip, shred semantics) is unchanged, which is the part the
  * engine owns.
  */
object CryptoShred {

  /** Per-subject 128-bit keys (deterministic derivation — see note
    * above; swap for KMS-issued keys in production). The key column
    * uses the __-prefixed internal-name convention (cf. Skew's
    * __salt) so a caller's own "key" column never collides with it. */
  def deriveKeys(subjects: DataFrame, subjectCol: String,
      masterSalt: String): DataFrame =
    subjects.select(col(subjectCol)).distinct()
      .select(col(subjectCol),
        unhex(md5_fast(concat(col(subjectCol).cast("string"),
          lit("#"), lit(masterSalt)))).as("__shred_key"))

  /** Encrypt `plainCols` of `df` with each row's subject key (inner
    * join: rows without a key are NOT silently kept in plaintext —
    * they're dropped, the fail-closed choice). */
  def encrypt(df: DataFrame, keys: DataFrame, subjectCol: String,
      plainCols: Seq[String]): DataFrame = {
    val out = df.join(keys, subjectCol)
    plainCols.foldLeft(out) { (acc, c) =>
      acc.withColumn(c, aes_encrypt(col(c).cast("string").cast("binary"), col("__shred_key")))
    }.drop("__shred_key")
  }

  /** Decrypt with whatever keys remain: shredded subjects' columns
    * come back NULL (left join + try_aes_decrypt — never throws). */
  def decrypt(df: DataFrame, keys: DataFrame, subjectCol: String,
      cipherCols: Seq[String]): DataFrame = {
    val out = df.join(keys, Seq(subjectCol), "left")
    cipherCols.foldLeft(out) { (acc, c) =>
      acc.withColumn(c,
        try_aes_decrypt(col(c), col("__shred_key")).cast("string"))
    }.drop("__shred_key")
  }

  /** Forget subjects: the entire erasure is this anti-join on the
    * KEY TABLE — the encrypted data files are never touched. */
  def shred(keys: DataFrame, subjectCol: String,
      forget: DataFrame): DataFrame =
    keys.join(forget.select(col(subjectCol)).distinct(),
      Seq(subjectCol), "left_anti")
}
