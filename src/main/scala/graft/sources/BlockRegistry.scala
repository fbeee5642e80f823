package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** The remote block-registry seam — what the reference calls a
  * RemoteRefFactory (remote/remote.go, instantiated for GCS at
  * gcs.go:43-49): a content-addressed block CAS plus named root and lease
  * pointers. `RemoteSnapshotRepo` pushes/mounts snapshots exclusively
  * through this interface, so the GCS-protocol and S3-protocol registries
  * (and any future wire) are interchangeable — the same seam discipline
  * as `RemoteStore` one layer down.
  *
  * Layout contract (shared by every implementation so registries are
  * bucket-compatible with each other): `<prefix>CAS/<sha256hex>` content
  * blocks, `<prefix>root/<name>` replace-on-write base64url block-id
  * pointers, `<prefix>lease/<name>` = `<expiryEpochMs> <b64url(bid)>`. */
trait BlockRegistry {

  /** Replace-on-write named pointer (reference gcs.go:114-127 SetRoot). */
  def setRoot(name: String, bid: Array[Byte]): Unit

  def getRoot(name: String): Option[Array[Byte]]

  /** GC lease: (expiry, block id) (reference gcs.go:96-112 SetLease). */
  def setLease(name: String, expiryEpochMs: Long, bid: Array[Byte]): Unit

  def getLease(name: String): Option[(Long, Array[Byte])]

  /** CAS block upload (create-if-absent); true iff this call stored the
    * block (reference gcs.go:179-197 Push, DoesNotExist precondition). */
  def pushBlock(bidHex: String, body: Array[Byte]): Boolean

  /** Size of a stored block — the attrs probe before opening a reader. */
  def blockSize(bidHex: String): Long

  /** A generation/ETag-pinned ranged reader over a stored block: the pin
    * is captured here, so a block replaced under the open reader fails
    * with TornReadException instead of mixing generations. */
  def openBlock(bidHex: String): RemoteStore

  /** Pinned reader AND size from ONE metadata probe. The default pays
    * two round-trips; both bundled registries override it — every
    * manifest/shard read in mount and gc rides this, so the probe count
    * is the metadata cost of a mount. */
  def openBlockSized(bidHex: String): (RemoteStore, Long) =
    (openBlock(bidHex), blockSize(bidHex))

  // -- enumeration + removal: the GC surface (reference gcs.go root/lease
  //    listing + object delete, driven by core RunGC reachability) --

  /** All stored CAS block ids. */
  def listBlocks(): Seq[String]

  /** All named root pointers. */
  def listRoots(): Seq[String]

  /** All lease names. */
  def listLeases(): Seq[String]

  /** Remove a CAS block; idempotent. */
  def deleteBlock(bidHex: String): Unit

  /** Remove a lease; idempotent. */
  def deleteLease(name: String): Unit
}

/** S3-protocol registry — the same root/lease/CAS layout as
  * `GcsRefRegistry` on an S3-compatible bucket. The CAS precondition is
  * `If-None-Match: *` (the S3 spelling of GCS's DoesNotExist), the read
  * pin is the ETag captured at open (`If-Match` per ranged read). */
final class S3RefRegistry(endpoint: String, bucket: String,
    keyPrefix: String, region: String, creds: SigV4.Credentials)
    extends BlockRegistry {
  require(keyPrefix.isEmpty || keyPrefix.endsWith("/"),
    "prefix must end in /")

  private val casPrefix = keyPrefix + "CAS/"
  private val rootPrefix = keyPrefix + "root/"
  private val leasePrefix = keyPrefix + "lease/"

  def setRoot(name: String, bid: Array[Byte]): Unit =
    S3Store.put(endpoint, bucket, rootPrefix + name, region, creds,
      GcsAuth.b64url(bid).getBytes(UTF_8))

  def getRoot(name: String): Option[Array[Byte]] =
    S3Store.get(endpoint, bucket, rootPrefix + name, region, creds)
      .map(b => Base64.getUrlDecoder.decode(new String(b, UTF_8)))

  def setLease(name: String, expiryEpochMs: Long, bid: Array[Byte]): Unit =
    S3Store.put(endpoint, bucket, leasePrefix + name, region, creds,
      s"$expiryEpochMs ${GcsAuth.b64url(bid)}".getBytes(UTF_8))

  def getLease(name: String): Option[(Long, Array[Byte])] =
    S3Store.get(endpoint, bucket, leasePrefix + name, region, creds).map { b =>
      val Array(exp, bid) = new String(b, UTF_8).split(" ", 2)
      (exp.toLong, Base64.getUrlDecoder.decode(bid))
    }

  def pushBlock(bidHex: String, body: Array[Byte]): Boolean =
    S3Store.putIfAbsent(endpoint, bucket, casPrefix + bidHex, region, creds,
      body)

  def blockSize(bidHex: String): Long =
    S3Store.head(endpoint, bucket, casPrefix + bidHex, region, creds)._1

  def openBlock(bidHex: String): RemoteStore = openBlockSized(bidHex)._1

  override def openBlockSized(bidHex: String): (RemoteStore, Long) = {
    val key = casPrefix + bidHex
    val (size, etag) = S3Store.head(endpoint, bucket, key, region, creds)
    (new S3Store(endpoint, bucket, key, region, creds, etag), size)
  }

  private def listNames(prefix: String): Seq[String] =
    S3Store.list(endpoint, bucket, prefix, region, creds)
      .map(_._1.substring(prefix.length)).filter(_.nonEmpty)

  def listBlocks(): Seq[String] = listNames(casPrefix)
  def listRoots(): Seq[String] = listNames(rootPrefix)
  def listLeases(): Seq[String] = listNames(leasePrefix)

  def deleteBlock(bidHex: String): Unit =
    S3Store.delete(endpoint, bucket, casPrefix + bidHex, region, creds)

  def deleteLease(name: String): Unit =
    S3Store.delete(endpoint, bucket, leasePrefix + name, region, creds)
}

/** Serializable recipe for a `BlockRegistry` — what a Spark task needs to
  * build its own client executor-side (credentials and endpoints are
  * plain data; the live client holds sockets and token caches and never
  * crosses the wire). One `open()` per partition, so the OAuth2 token
  * exchange / connection setup amortizes over the partition's blocks. */
sealed trait RegistryConf extends Serializable {
  def open(): BlockRegistry
}

object RegistryConf {

  /** GCS-protocol registry recipe. The service-account private key rides
    * as PKCS#8 bytes (java PrivateKey objects are JVM-serializable but
    * the encoded form is the stable contract). */
  final case class Gcs(endpoint: String, bucket: String, keyPrefix: String,
      clientEmail: String, privateKeyPkcs8: Array[Byte], tokenUri: String)
      extends RegistryConf {
    def open(): BlockRegistry = {
      val kf = java.security.KeyFactory.getInstance("RSA")
      val key = kf.generatePrivate(
        new java.security.spec.PKCS8EncodedKeySpec(privateKeyPkcs8))
      new GcsRefRegistry(endpoint, bucket, keyPrefix,
        new GcsAuth.TokenProvider(
          GcsAuth.ServiceAccount(clientEmail, key, tokenUri)))
    }
  }

  def gcs(endpoint: String, bucket: String, keyPrefix: String,
      sa: GcsAuth.ServiceAccount): Gcs =
    Gcs(endpoint, bucket, keyPrefix, sa.clientEmail,
      sa.privateKey.getEncoded, sa.tokenUri)

  /** S3-protocol registry recipe. */
  final case class S3(endpoint: String, bucket: String, keyPrefix: String,
      region: String, accessKey: String, secretKey: String)
      extends RegistryConf {
    def open(): BlockRegistry =
      new S3RefRegistry(endpoint, bucket, keyPrefix, region,
        SigV4.Credentials(accessKey, secretKey))
  }
}
