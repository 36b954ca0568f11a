package graft.tools

import java.nio.file.{Files, Paths}

/** Second-JVM half of CrossProcessCommitSpec: exercises the
  * cross-process commit protocol's filesystem primitives from a SEPARATE
  * process (JDK-only — the protocol is pure NIO, so the racing process
  * needs no Spark).
  *
  * Modes:
  *   - `hold <metadataPath> <millis>`: claim the version (atomic
  *     tmp + createLink with the pid inside, the engine's primitive),
  *     hold it for `millis`, release. Prints CLAIMED / RELEASED; exits
  *     17 if the claim is already held.
  *   - `claimloop <metadataPath>`: claim + release in a tight loop until
  *     killed — the SIGKILL-at-claim-create scenario. Because the claim
  *     appears via hard link from a pid-bearing tmp file, a kill at ANY
  *     instant leaves either no claim or a claim with a parseable pid,
  *     never an empty one (round-14 directive #2).
  *   - `publish <metadataPath> <fromPath>`: atomically publish the bytes
  *     of `fromPath` as `metadataPath` via tmp + createLink — the other
  *     engine process's winning commit. Exits 17 on conflict.
  */
object CrossProcessCommit {

  /** The engine's claim primitive (IcebergLite.withVersionClaim →
    * claimWithPid): O_EXCL-create the claim already containing the pid. */
  private def claimWithPid(claim: java.nio.file.Path): Boolean = {
    val tmp = Files.createTempFile(claim.getParent, ".claim-", ".tmp")
    try {
      Files.writeString(tmp, s"pid=${ProcessHandle.current().pid()}\n")
      try { Files.createLink(claim, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "hold" :: mp :: millis :: Nil =>
      val claim = Paths.get(mp + ".claim")
      Files.createDirectories(claim.getParent)
      if (!claimWithPid(claim)) {
        System.err.println(s"claim already held: $claim"); sys.exit(17)
      }
      println("CLAIMED")
      Console.out.flush()
      Thread.sleep(millis.toLong)
      Files.deleteIfExists(claim)
      println("RELEASED")
    case "claimloop" :: mp :: Nil =>
      val claim = Paths.get(mp + ".claim")
      Files.createDirectories(claim.getParent)
      println("LOOPING")
      Console.out.flush()
      while (true) {
        claimWithPid(claim)
        Files.deleteIfExists(claim)
      }
    case "publish" :: mp :: from :: Nil =>
      val target = Paths.get(mp)
      Files.createDirectories(target.getParent)
      val tmp = Files.createTempFile(target.getParent, ".commit-", ".tmp")
      try {
        Files.write(tmp, Files.readAllBytes(Paths.get(from)))
        try Files.createLink(target, tmp)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          System.err.println(s"conflict: $target exists"); sys.exit(17) }
      } finally Files.deleteIfExists(tmp)
      println("PUBLISHED")
    case other =>
      System.err.println(s"usage: hold <mp> <ms> | publish <mp> <from>; got $other")
      sys.exit(2)
  }
}
