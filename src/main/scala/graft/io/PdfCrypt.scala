package graft.io

/** Standard-security-handler decryption for [[PdfSource]]
  * (reference parity: pypdf's `_encryption` via `pdf_read_tool.py`).
  *
  * Supported: /Filter /Standard with V 1/2 (RC4, 40–128 bit key),
  * V 4 + /CFM /AESV2 (AES-128-CBC), revisions 2–4, and V 5 /
  * R 5–6 + /CFM /AESV3 (AES-256-CBC with the SHA-2 key derivation of
  * ISO 32000-2 §7.6.4 — the default for PDFs produced since ~2017).
  * The caller may supply a password: it is tried as the USER password
  * first and (V5 only) as the OWNER password second, matching pypdf's
  * order. A wrong password, or any unsupported scheme, makes
  * [[fromDict]] return None and the caller surfaces the file as
  * undecodable rather than emitting garbage.
  *
  * All primitives are JDK-provided (MD5/SHA-2 via MessageDigest, AES
  * via javax.crypto); RC4 is the 15-line KSA/PRGA spelled out below
  * because the JCE ARCFOUR provider can be disabled by security
  * policy.
  */
private[graft] object PdfCrypt {

  /** The spec's 32-byte password padding (7.6.3.3). */
  private val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  final case class Decryptor(fileKey: Array[Byte], aes: Boolean,
      v5: Boolean = false) {
    /** Decrypt one object's stream payload. V5 (AES-256) uses the file
      * key directly for every object (§7.6.4: no per-object
      * derivation); V≤4 derives the per-object key by the MD5 chain of
      * §7.6.2 algorithm 1.
      */
    def decrypt(objNum: Int, gen: Int, data: Array[Byte]): Option[Array[Byte]] = try {
      val objKey =
        if (v5) fileKey
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          md.update(fileKey)
          md.update(Array(
            (objNum & 0xff).toByte, ((objNum >> 8) & 0xff).toByte, ((objNum >> 16) & 0xff).toByte,
            (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
          if (aes) md.update("sAlT".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          md.digest().take(math.min(fileKey.length + 5, 16))
        }
      if (aes) {
        if (data.length < 16) return None
        val cipher = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
        cipher.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
          new javax.crypto.spec.IvParameterSpec(data.take(16)))
        Some(cipher.doFinal(data, 16, data.length - 16))
      } else Some(rc4(objKey, data))
    } catch { case _: Exception => None }
  }

  /** Build a decryptor from the /Encrypt dictionary and the first
    * file /ID element, verifying `password` (default empty) as the
    * user password — and, for V5, as the owner password second.
    */
  def fromDict(encryptDict: String, fileId: Array[Byte],
      password: String = ""): Option[Decryptor] = try {
    if (!encryptDict.contains("/Standard")) return None
    // scalar keys must come from the TOP-LEVEL dict: a V4 /CF crypt-
    // filter subdict carries its own /Length (in BYTES), and dict key
    // order is arbitrary — a whole-string regex can hit it first
    val top = stripNestedDicts(encryptDict)
    val v = intKey(top, "V").getOrElse(0)
    val r = intKey(top, "R").getOrElse(if (v == 1) 2 else 3)
    if (v == 5) return fromDictV5(encryptDict, top, r, password)
    if (v < 1 || v > 4 || r < 2 || r > 4) return None
    // the filter NAME lives inside the nested /CF dict — full-text check
    val aes = v == 4 && encryptDict.contains("/AESV2")
    if (v == 4 && !aes && !encryptDict.contains("/V2")) return None // e.g. AESV3
    val keyBytes =
      if (v == 1) 5
      else if (v == 4) 16 // AESV2 and 128-bit RC4 CFs are both 16-byte keys
      else math.max(5, math.min(16, intKey(top, "Length").getOrElse(40) / 8))
    val o = hexOrLiteral(top, "O").getOrElse(return None)
    val u = hexOrLiteral(top, "U").getOrElse(return None)
    val p = signedIntKey(top, "P").getOrElse(return None)

    // 7.6.3.3 algorithm 2: the (padded) user password seeds the key;
    // everything downstream of this hash is password-independent
    val pwBytes = password.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update((pwBytes ++ Pad).take(32))
    md.update(o.take(32))
    md.update(Array((p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte))
    md.update(fileId)
    // (R4 /EncryptMetadata false would add ffffffff here; omitted — the
    // common case encrypts metadata, and we only read content streams)
    var key = md.digest()
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        key = java.security.MessageDigest.getInstance("MD5").digest(key.take(keyBytes))
        i += 1
      }
    }
    val fileKey = key.take(keyBytes)

    // verify the empty user password against /U (algorithms 4/5)
    val ok =
      if (r == 2) java.util.Arrays.equals(rc4(fileKey, Pad), u.take(32))
      else {
        val md2 = java.security.MessageDigest.getInstance("MD5")
        md2.update(Pad)
        md2.update(fileId)
        var x = rc4(fileKey, md2.digest())
        var i = 1
        while (i <= 19) {
          x = rc4(fileKey.map(b => (b ^ i).toByte), x)
          i += 1
        }
        java.util.Arrays.equals(x, u.take(16))
      }
    if (ok) Some(Decryptor(fileKey, aes)) else None
  } catch { case _: Exception => None }

  /** V5 (AES-256): ISO 32000-2 §7.6.4. R5 validates with a single
    * SHA-256; R6 with the iterated hash of algorithm 2.B. The file key
    * never derives from the password — it is stored AES-wrapped in
    * /UE (user) or /OE (owner), so either password unwraps the SAME
    * key.
    */
  private def fromDictV5(fullDict: String, top: String, r: Int,
      password: String): Option[Decryptor] = {
    if (r != 5 && r != 6) return None
    if (!fullDict.contains("/AESV3")) return None
    val u = hexOrLiteral(top, "U").getOrElse(return None)
    val ue = hexOrLiteral(top, "UE").getOrElse(return None)
    val o = hexOrLiteral(top, "O").getOrElse(return None)
    val oe = hexOrLiteral(top, "OE").getOrElse(return None)
    if (u.length < 48 || o.length < 48 || ue.length < 32 || oe.length < 32) return None
    // §7.6.4.3.2: UTF-8, at most 127 bytes
    val pw = password.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(127)
    def sha256(parts: Array[Byte]*): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      parts.foreach(md.update)
      md.digest()
    }
    def passwordHash(salt: Array[Byte], udata: Array[Byte]): Array[Byte] =
      if (r == 6) hash2B(pw, salt, udata) else sha256(pw, salt, udata)

    // user password first (algorithm 11), then owner (algorithm 12)
    val userKey: Option[Array[Byte]] = {
      val vSalt = u.slice(32, 40)
      val kSalt = u.slice(40, 48)
      if (java.util.Arrays.equals(passwordHash(vSalt, Array.emptyByteArray), u.take(32)))
        Some(aesCbcNoPad(decrypt = true, passwordHash(kSalt, Array.emptyByteArray),
          new Array[Byte](16), ue.take(32)))
      else None
    }
    val fileKey = userKey.orElse {
      val vSalt = o.slice(32, 40)
      val kSalt = o.slice(40, 48)
      val udata = u.take(48)
      if (java.util.Arrays.equals(passwordHash(vSalt, udata), o.take(32)))
        Some(aesCbcNoPad(decrypt = true, passwordHash(kSalt, udata),
          new Array[Byte](16), oe.take(32)))
      else None
    }
    fileKey.map(k => Decryptor(k, aes = true, v5 = true))
  }

  /** §7.6.4.3.4 algorithm 2.B — the R6 iterated hash. At least 64
    * rounds; from round 64 on, stop once the last byte of the AES
    * output E is ≤ round − 32.
    */
  private[io] def hash2B(pw: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.update(pw); md.update(salt); md.update(udata)
      md.digest()
    }
    var round = 0
    var done = false
    while (!done) {
      round += 1
      val block = pw ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length)
        i += 1
      }
      val e = aesCbcNoPad(decrypt = false, k.take(16), k.slice(16, 32), k1)
      // first 16 bytes of E as a big-endian integer mod 3 — base 256 is
      // ≡ 1 (mod 3), so the digit sum mod 3 is the same number
      var sum = 0
      i = 0
      while (i < 16) { sum += e(i) & 0xff; i += 1 }
      val alg = (sum % 3) match {
        case 0 => "SHA-256"
        case 1 => "SHA-384"
        case _ => "SHA-512"
      }
      k = java.security.MessageDigest.getInstance(alg).digest(e)
      done = round >= 64 && (e(e.length - 1) & 0xff) <= round - 32
    }
    k.take(32)
  }

  private def aesCbcNoPad(decrypt: Boolean, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    cipher.init(
      if (decrypt) javax.crypto.Cipher.DECRYPT_MODE else javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    cipher.doFinal(data)
  }

  private[io] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + (s(i) & 0xff) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    i = 0
    while (i < data.length) {
      x = (x + 1) & 0xff
      y = (y + (s(x) & 0xff)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(i) = (data(i) ^ s(((s(x) & 0xff) + (s(y) & 0xff)) & 0xff)).toByte
      i += 1
    }
    out
  }

  /** The dict text with nested `<< … >>` blocks blanked out, so
    * regexes only see the outer dict's own keys.
    */
  private def stripNestedDicts(dict: String): String = {
    val sb = new StringBuilder(dict.length)
    var depth = 0
    var i = 0
    while (i < dict.length) {
      if (i + 1 < dict.length && dict.charAt(i) == '<' && dict.charAt(i + 1) == '<') {
        depth += 1
        sb.append(if (depth <= 1) "<<" else "  ")
        i += 2
      } else if (i + 1 < dict.length && dict.charAt(i) == '>' && dict.charAt(i + 1) == '>') {
        sb.append(if (depth <= 1) ">>" else "  ")
        depth -= 1
        i += 2
      } else {
        sb.append(if (depth <= 1) dict.charAt(i) else ' ')
        i += 1
      }
    }
    sb.toString
  }

  private def intKey(dict: String, key: String): Option[Int] =
    s"""/$key\\s+(\\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt)

  private def signedIntKey(dict: String, key: String): Option[Int] =
    s"""/$key\\s+(-?\\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt)

  /** /O and /U values: hex string `<...>` or literal `(...)` with PDF
    * escapes (literal form is what most writers emit).
    */
  private def hexOrLiteral(dict: String, key: String): Option[Array[Byte]] = {
    val hex = s"""/$key\\s*<([0-9A-Fa-f\\s]+)>""".r.findFirstMatchIn(dict)
      .map { m =>
        val h = m.group(1).filterNot(_.isWhitespace)
        val padded = if (h.length % 2 == 1) h + "0" else h
        padded.grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray
      }
    hex.orElse {
      s"""/$key\\s*\\(""".r.findFirstMatchIn(dict).map { m =>
        val out = new java.io.ByteArrayOutputStream(48)
        var i = m.end
        var depth = 1
        while (i < dict.length && depth > 0) {
          dict.charAt(i) match {
            case '\\' if i + 1 < dict.length =>
              dict.charAt(i + 1) match {
                case 'n' => out.write('\n'); i += 2
                case 'r' => out.write('\r'); i += 2
                case 't' => out.write('\t'); i += 2
                case 'b' => out.write('\b'); i += 2
                case 'f' => out.write('\f'); i += 2
                case d if d >= '0' && d <= '7' =>
                  val oct = dict.substring(i + 1, math.min(i + 4, dict.length))
                    .takeWhile(c => c >= '0' && c <= '7').take(3)
                  out.write(Integer.parseInt(oct, 8)); i += 1 + oct.length
                case other => out.write(other); i += 2
              }
            case '(' => depth += 1; out.write('('); i += 1
            case ')' =>
              depth -= 1
              if (depth > 0) out.write(')')
              i += 1
            case c => out.write(c); i += 1
          }
        }
        out.toByteArray
      }
    }
  }

}
