package graft.sources

import org.apache.hadoop.conf.Configuration

/** REAL encryption for the ENCRYPTION directive family — Parquet
  * Modular Encryption (the columnar analog of Data Pump's encrypted
  * dump files, reference directives.py:274-296; previously
  * accepted-and-ignored as a PhysicalSwitch).
  *
  * Mechanism: parquet-mr's `PropertiesDrivenCryptoFactory` encrypts
  * data pages and (by default) the footer with AES-GCM, wrapping the
  * per-file data keys through a pluggable [[GraftKms]]. All
  * configuration travels as DATASOURCE OPTIONS — Spark merges
  * reader/writer options into the per-query Hadoop conf
  * (`newHadoopConfWithOptions`), so jobs need no session-global
  * mutation and two jobs with different keys can run concurrently.
  *
  * Key material, in ENCRYPTION_MODE order of precedence:
  *  - PASSWORD mode (the Data Pump default when a password is given):
  *    the master key derives from ENCRYPTION_PASSWORD via
  *    PBKDF2-HMAC-SHA256 (65,536 rounds, fixed per-key salt) at the
  *    ENCRYPTION_ALGORITHM key length. Deterministic, so an import
  *    presenting the same password unwraps what the export wrapped.
  *  - TRANSPARENT/DUAL mode (the wallet analog): base64 master keys
  *    supplied out-of-band via the `graft.encryption.key.list` conf
  *    (e.g. `spark.hadoop.graft.encryption.key.list=k0:AAAA...`),
  *    never through the directive surface.
  *
  * Scale note: encryption is a per-page stream cipher in the writer
  * tasks — fully distributed, no driver involvement, no extra
  * shuffle; the cost rides the existing write stage like a codec.
  */
object ParquetCrypto {
  val FactoryClassKey = "parquet.crypto.factory.class"
  val FactoryClass = "org.apache.parquet.crypto.keytools.PropertiesDrivenCryptoFactory"
  val KmsClassKey = "parquet.encryption.kms.client.class"
  val UniformKeyKey = "parquet.encryption.uniform.key"
  val PlaintextFooterKey = "parquet.encryption.plaintext.footer"
  val DataKeyLengthKey = "parquet.encryption.data.key.length.bits"

  /** Graft-side key-material confs, read by [[GraftKms]]. */
  val PasswordConf = "graft.encryption.password"
  val KeyBitsConf = "graft.encryption.key.bits"
  val KeyListConf = "graft.encryption.key.list"

  /** The master-key id the uniform (whole-file) mode wraps under. */
  val MasterKeyId = "k0"

  /** AES128/AES192/AES256 → master/data key bits. */
  val algorithmBits: Map[String, Int] =
    Map("AES128" -> 128, "AES192" -> 192, "AES256" -> 256)

  /** PBKDF2-HMAC-SHA256 password derivation — deterministic per
    * (password, keyId, bits), so export and import agree with no key
    * exchange beyond the password itself. */
  def deriveKey(password: String, keyId: String, bits: Int): Array[Byte] = {
    val spec = new javax.crypto.spec.PBEKeySpec(
      password.toCharArray, s"graft-dp:$keyId".getBytes("UTF-8"), 65536, bits)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  /** The reader/writer options every encrypted job carries: factory +
    * KMS class. Key material and mode arrive via the directive
    * compiler's additional options. */
  def baseOptions: Seq[(String, String)] = Seq(
    FactoryClassKey -> FactoryClass,
    KmsClassKey -> classOf[GraftKms].getName)
}

/** In-process KMS for Parquet Modular Encryption: wraps/unwraps data
  * encryption keys with AES-GCM under master keys resolved from the
  * Hadoop conf ([[ParquetCrypto.KeyListConf]] wallet entries, or a
  * [[ParquetCrypto.PasswordConf]]-derived key). The class is
  * instantiated BY PARQUET via the `parquet.encryption.kms.client.class`
  * conf, once per task; in production the same interface fronts a real
  * KMS service — this implementation is the self-contained analog of
  * Data Pump's password/wallet encryption, with no external service.
  */
class GraftKms extends org.apache.parquet.crypto.keytools.KmsClient {
  private var conf: Configuration = _

  override def initialize(configuration: Configuration, kmsInstanceID: String,
      kmsInstanceURL: String, accessToken: String): Unit =
    conf = configuration

  private def walletKey(keyId: String): Option[Array[Byte]] =
    Option(conf.get(ParquetCrypto.KeyListConf)).flatMap { list =>
      list.split(",").map(_.trim).collectFirst {
        case e if e.startsWith(s"$keyId:") =>
          java.util.Base64.getDecoder.decode(e.substring(keyId.length + 1))
      }
    }

  /** Master key for WRAPPING: wallet entry, else password-derived at
    * the conf'd key length (the writer always carries KeyBitsConf —
    * the directive compiler sets it from ENCRYPTION_ALGORITHM). */
  private def masterKey(keyId: String, bits: Int): Array[Byte] =
    walletKey(keyId).orElse {
      Option(conf.get(ParquetCrypto.PasswordConf)).map { pw =>
        ParquetCrypto.deriveKey(pw, keyId, bits)
      }
    }.getOrElse(throw new org.apache.parquet.crypto.KeyAccessDeniedException(
      s"no key material for '$keyId': provide ENCRYPTION_PASSWORD or set " +
        s"${ParquetCrypto.KeyListConf} (wallet mode)"))

  private def cipher(mode: Int, key: Array[Byte],
      iv: Array[Byte]): javax.crypto.Cipher = {
    val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, iv))
    c
  }

  // One cached non-blocking CSPRNG for GCM IVs. getInstanceStrong
  // commonly maps to NativePRNGBlocking (/dev/random): on an
  // entropy-starved container a many-file export would stall inside
  // writer tasks with no diagnostic, and a fresh instance per wrap
  // multiplies the cost. A default SecureRandom is cryptographically
  // sufficient for IV generation.
  private val rng = new java.security.SecureRandom()

  // Wrapped-key blob format (ours to define — it travels inside the
  // parquet footer's key metadata): [1 byte master-key length in
  // BYTES][12-byte GCM IV][ciphertext]. The leading byte makes the
  // dump SELF-DESCRIBING: a fresh reader presenting only
  // factory+KMS+password can unwrap AES192/AES256 dumps without
  // knowing the ENCRYPTION_ALGORITHM the export used — the key
  // length is not secret (the algorithm name never was), only the
  // password is.
  override def wrapKey(keyBytes: Array[Byte],
      masterKeyIdentifier: String): String = {
    val bits = conf.getInt(ParquetCrypto.KeyBitsConf, 128)
    val mk = masterKey(masterKeyIdentifier, bits)
    val iv = new Array[Byte](12)
    rng.nextBytes(iv)
    val ct = cipher(javax.crypto.Cipher.ENCRYPT_MODE, mk, iv)
      .doFinal(keyBytes)
    java.util.Base64.getEncoder.encodeToString(
      Array(mk.length.toByte) ++ iv ++ ct)
  }

  override def unwrapKey(wrappedKey: String,
      masterKeyIdentifier: String): Array[Byte] = {
    val all = java.util.Base64.getDecoder.decode(wrappedKey)
    // self-describing blob: [len byte][IV][ct]. A LEGACY blob
    // (pre-length-byte dumps: [IV][ct]) whose first IV byte happens to
    // be 16/24/32 parses here too but fails the GCM tag — so a tag
    // failure falls through to the legacy parse instead of surfacing
    // as "wrong password" on an old dump.
    val mkLen = all(0) & 0xff
    if (mkLen == 16 || mkLen == 24 || mkLen == 32)
      try {
        val (iv, ct) = all.drop(1).splitAt(12)
        return cipher(javax.crypto.Cipher.DECRYPT_MODE,
          masterKey(masterKeyIdentifier, mkLen * 8), iv).doFinal(ct)
      } catch { case _: javax.crypto.AEADBadTagException => }
    // legacy format: key length comes from the reader's
    // ENCRYPTION_ALGORITHM conf (the pre-self-describing contract)
    val bits = conf.getInt(ParquetCrypto.KeyBitsConf, 128)
    val (iv, ct) = all.splitAt(12)
    try cipher(javax.crypto.Cipher.DECRYPT_MODE,
      masterKey(masterKeyIdentifier, bits), iv).doFinal(ct)
    catch {
      case e: javax.crypto.AEADBadTagException =>
        throw new org.apache.parquet.crypto.KeyAccessDeniedException(
          s"cannot unwrap key '$masterKeyIdentifier': wrong password/" +
            "master key, or a legacy [IV][ct] blob written under an " +
            s"ENCRYPTION_ALGORITHM other than AES$bits (set " +
            s"${ParquetCrypto.KeyBitsConf} to the export's key size)")
    }
  }
}
