package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the password hash primitive (reference
  * UserManager.hashPassword/verifyPassword, yupana-core
  * auth/UserManager.scala:25-46 — bcrypt there, JDK PBKDF2 here; the
  * CONTRACT matched is salted + per-call-unique + verify-only). */
class PasswordHashSpec extends AnyFunSuite {

  test("hash is salted per call, verify round-trips, wrong password fails") {
    val h1 = UserRegistry.hashPassword("hunter-2")
    val h2 = UserRegistry.hashPassword("hunter-2")
    assert(h1 != h2, "two hashes of one password must differ (fresh salt per call)")
    assert(h1.startsWith("pbkdf2$"), h1)
    assert(UserRegistry.verifyPassword("hunter-2", h1))
    assert(UserRegistry.verifyPassword("hunter-2", h2))
    assert(!UserRegistry.verifyPassword("hunter-3", h1))
    assert(!UserRegistry.verifyPassword("", h1))
    // the empty password is a real credential (reference getOrElse(""))
    val he = UserRegistry.hashPassword("")
    assert(UserRegistry.verifyPassword("", he))
    assert(!UserRegistry.verifyPassword("x", he))
  }

  test("verify never throws on foreign or corrupted hash strings") {
    for (bad <- Seq("", "plaintext", "pbkdf2$", "pbkdf2$abc$?$?", "pbkdf2$12$!!$!!",
        "pbkdf2$999999999999999999$AA==$AA==", "bcrypt$2a$12$xyz"))
      assert(!UserRegistry.verifyPassword("pw", bad), s"'$bad' must verify nothing")
  }

  test("the hash string never contains the password and survives the snapshot escaping") {
    val pw = "tab\tand\nnewline-pw"
    val h = UserRegistry.hashPassword(pw)
    assert(!h.contains("\t") && !h.contains("\n"),
      "hash format must be snapshot-line-safe (base64 + digits + '$')")
    assert(!h.contains(pw))
    assert(UserRegistry.verifyPassword(pw, h))
  }
}
